package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage: find records whose NAMES are within
  * a small edit distance — the "same real-world thing, slightly different
  * string" problem (vendor dedup, catalog merge). The composition mirrors
  * the Dedup module's composition-order contract:
  *
  *  1. CONTRACT through exact names first: the corpus pays one hash
  *     aggregate into (name, n, min key); all fuzzy work runs on the
  *     distinct-name relation, which is vocabulary-sized, not corpus-sized
  *     (a duplicate-heavy catalog would otherwise square inside every
  *     block — 2 000 parts over 64 names is already 468 k raw candidate
  *     pairs vs 64² contracted).
  *  2. BLOCK by cheap structural keys — first and last token (two blocking
  *     passes, unioned): a candidate pair must agree on at least one, which
  *     edit distance ≤ 2 on multi-word names nearly always preserves.
  *     Blocking bounds the pair join the same way LSH bands bound minhash.
  *  3. VERIFY with `levenshtein` (identical classic-DP integers in Spark
  *     and DuckDB) only inside blocks.
  *
  * Returns one row per matched DISTINCT-name pair with both group sizes,
  * each side's min-key representative record (`key_a`/`key_b` — the
  * canonical-ish exemplar a reviewer opens first), and the implied
  * record-pair count — the contracted relation a merge step consumes
  * (expanding to record pairs is one join back per side ON THE NAME,
  * exactly like Dedup's star expansion; materializing n_a·n_b rows is the
  * caller's deliberate choice, never this operator's default). */
object Linkage {

  def fuzzyNamePairs(records: DataFrame, keyCol: String, nameCol: String,
                     maxDist: Int = 2): DataFrame = {
    val names = records.groupBy(col(nameCol).as("nm"))
      .agg(count(lit(1)).as("n"), min(col(keyCol)).as("ek"))
    val toks = split(col("nm"), " ")
    val blocks = names
      .select(col("nm"), col("n"), col("ek"),
        explode(array(element_at(toks, 1), element_at(toks, -1))).as("bk"))
      .distinct()
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.bk") === col("b.bk") && col("a.nm") < col("b.nm"))
      .select(col("a.nm").as("name_a"), col("b.nm").as("name_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.ek").as("key_a"), col("b.ek").as("key_b"))
      .distinct() // a pair can share both first and last token
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_a"), col("n_b"), col("key_a"), col("key_b"),
        (col("n_a") * col("n_b")).as("n_record_pairs"))
  }
}
