package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a training-data pipeline runs before anything
  * else: benchmark-contamination detection, repetition (boilerplate)
  * filtering, and PII redaction. All stock Catalyst expressions; the only
  * shuffle is contamination's aggregation over matched shingles.
  */
object Curation {

  /** Benchmark contamination: every (corpus doc, benchmark doc) pair sharing
    * at least `minShared` distinct n-token shingles. The decontamination
    * step of a training pipeline — documents that leak an eval set must be
    * dropped before training.
    *
    * Scale shape: benchmark suites are tiny (thousands of docs) against a
    * 100 TB corpus, so the benchmark shingle set is BROADCAST and the
    * corpus-side explode never shuffles full documents — the only shuffled
    * relation is (doc_id, bench_id) matches, already filtered to shingle
    * hits. Both sides use distinct shingles, so each shared shingle value
    * counts exactly once.
    *
    * `excludeSameId` is for the self-join case only (the benchmark is a
    * subset of the corpus, as in the t_contamination query, where a doc
    * trivially "contaminates" itself). Leave it false when the benchmark is
    * a separate table: its ids are an independent namespace, and dropping
    * id-equal pairs there would silently unflag real leaks. */
  def contamination(docs: DataFrame, benchmark: DataFrame, minShared: Int,
                    n: Int = 3, textCol: String = "text",
                    excludeSameId: Boolean = false): DataFrame = {
    val corpusSh = docs.select(col("doc_id"),
      explode(Dedup.shingles(col(textCol), n)).as("s"))
    val benchSh = benchmark.select(col("doc_id").as("bench_id"),
      explode(Dedup.shingles(col(textCol), n)).as("s"))
    val joined = corpusSh.join(broadcast(benchSh), "s")
    val kept =
      if (excludeSameId) joined.filter(col("doc_id") =!= col("bench_id"))
      else joined
    kept.groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Doc-level contamination verdict — the relation the decontamination
    * filter actually consumes (an anti-join on doc_id): one row per
    * contaminated document, with how many benchmark docs it leaks
    * (`n_bench_hits`) and its strongest overlap (`max_shared`).
    *
    * Scale rationale (same output-compaction argument as
    * [[Dedup.simhashEdges]], applied to the decision relation): the pair
    * LISTING grows with true (doc, bench) pairs — 2.6 M rows at the round-7
    * 100× probe, quadratic within replica groups — while the verdict is
    * bounded by |docs|. The pair aggregation itself is unchanged (minShared
    * applies per benchmark doc, so the (doc, bench) agg must happen), but
    * everything after it — the shuffle into this agg's output, the write,
    * the downstream anti-join build side — carries ≤ one row per doc. */
  def contaminatedDocs(docs: DataFrame, benchmark: DataFrame, minShared: Int,
                       n: Int = 3, textCol: String = "text",
                       excludeSameId: Boolean = false): DataFrame =
    contamination(docs, benchmark, minShared, n, textCol, excludeSameId)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_hits"), max(col("n_shared")).as("max_shared"))

  /** The REMOVAL step that closes the decontamination pipeline: the corpus
    * with every [[contaminatedDocs]]-flagged doc dropped — detect-then-drop
    * end-to-end, the way [[graft.ops.Dedup.pipelineCanonical]] closes the
    * dedup pipeline. One left-anti equi-join on doc_id: the build side is
    * the verdict relation (≤ one fixed-width row per flagged doc, far
    * smaller than the corpus on any sane benchmark set), so AQE broadcasts
    * it and the corpus streams through unshuffled. Passes every input
    * column through unchanged — downstream stages see the same schema. */
  def decontaminated(docs: DataFrame, benchmark: DataFrame, minShared: Int,
                     n: Int = 3, textCol: String = "text",
                     excludeSameId: Boolean = false): DataFrame =
    docs.join(
      contaminatedDocs(docs, benchmark, minShared, n, textCol, excludeSameId)
        .select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** Tracking query parameters stripped by [[canonicalUrl]]: the
    * analytics/click-id params that vary per crawl visit without changing
    * the page — exactly the noise that splinters one page into thousands of
    * "distinct" URLs in a crawled corpus. */
  val TrackingParamRe: String = "utm_[A-Za-z0-9_]*|gclid|fbclid|ref"

  /** URL canonicalization key — the dedup key every crawled-corpus pipeline
    * groups on BEFORE content dedup (two crawl visits of one page are the
    * cheapest duplicates to kill: no shingling, no signatures, one narrow
    * projection + the exact-dedup groupBy).
    *
    * Normalization (in order): trim; drop the `#fragment`; drop the scheme
    * (http/https/ftp… all collapse — scheme variants of one page are
    * duplicates); lowercase the HOST only (DNS is case-insensitive, paths
    * are not) and strip a leading `www.`; remove tracking params
    * ([[TrackingParamRe]]) wherever they sit in the query string; collapse
    * trailing slashes; drop a dangling `?`. Deliberately preserved: ports
    * (`:8080` is a different origin), punycode hosts (`xn--…` must NOT be
    * decoded — a homograph-normalization pass is a security decision, not a
    * dedup key), path/query case, and non-tracking param order (reordering
    * params is rewriting semantics; leave it to the content-dedup stage).
    *
    * Pure codegen'd per-row expression chain (RE2-safe patterns — no
    * lookarounds/backrefs, so DuckDB reproduces it verbatim); no shuffle. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*", "")
    val noScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val host = regexp_replace(
      lower(regexp_extract(noScheme, "^[^/?]*", 0)), "^www\\.", "")
    val rest = regexp_replace(noScheme, "^[^/?]*", "")
    // tracking params: any `&p=v` occurrence, then a leading `?p=v&` (its
    // successor is promoted to first param), then a lone `?p=v` tail
    val t1 = regexp_replace(rest, s"&($TrackingParamRe)=[^&]*", "")
    val t2 = regexp_replace(t1, s"\\?($TrackingParamRe)=[^&]*&", "?")
    val t3 = regexp_replace(t2, s"\\?($TrackingParamRe)=[^&]*$$", "")
    val t4 = regexp_replace(t3, "/+$", "") // collapse trailing slashes
    concat(host, regexp_replace(t4, "\\?$", ""))
  }

  /** Container blocks whose CONTENT must go with the tags: script/style
    * bodies are code, not text, and comments can hide whole markup trees.
    * RE2-safe: inline `(?is)` flags + non-greedy `.*?` only — no
    * lookarounds (RE2 has none), so the non-greedy "up to the nearest
    * closer" semantics are identical in Java regex and DuckDB. An UNCLOSED
    * script/style block deliberately fails this pattern and falls through
    * to [[HtmlTagRe]] (tags stripped, body survives as text) — the
    * deterministic degradation both engines share, rather than eating the
    * rest of the document. */
  val HtmlBlockRe: String =
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->"

  /** Any remaining tag (open/close/self-closing/doctype). `[^>]` matches
    * newlines in both engines without a dotall flag, so multi-line tags
    * strip identically. */
  val HtmlTagRe: String = "<[^>]*>"

  /** HTML/markup boilerplate stripping — the curation stage every crawl
    * corpus hits BEFORE any text operator (C4/CCNet step 1): drop
    * script/style/comment blocks, strip all remaining tags (each replaced
    * by a space so `</p><p>` never glues words), decode the six dominant
    * character entities, collapse whitespace, and gate on text density.
    *
    * Entity decode runs AFTER tag stripping (decoding `&lt;` first would
    * fabricate tags out of escaped text) and decodes `&amp;` LAST — so
    * double-encoded `&amp;lt;` correctly yields the literal text `&lt;`,
    * not `<`. All six are literal `replace` calls, not regexes.
    *
    * The density gate is the boilerplate verdict: a page whose visible
    * text is under `minDensityPct`% of its raw length is chrome/nav/markup
    * shell, not content (the text-density heuristic behind boilerplate
    * removal since Kohlschütter's boilerpipe). INTEGER cross-multiplied —
    * `100·text_len ≥ pct·raw_len` — zero float divisions, the
    * gopherRules discipline.
    *
    * Pure codegen'd per-row projection chain — no shuffle, no UDF; every
    * pattern RE2-safe so DuckDB reproduces the operator verbatim.
    * Emits (doc_id, text, raw_len, text_len, is_content). */
  def stripMarkup(docs: DataFrame, rawCol: String = "html",
                  minDensityPct: Int = 20): DataFrame = {
    val noBlocks = regexp_replace(col(rawCol), HtmlBlockRe, " ")
    val noTags = regexp_replace(noBlocks, HtmlTagRe, " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, v)) => replace(c, lit(e), lit(v)) }
    val collapsed = trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
    docs.select(col("doc_id"), collapsed.as("text"),
        length(col(rawCol)).cast("long").as("raw_len"))
      .select(col("doc_id"), col("text"), col("raw_len"),
        length(col("text")).cast("long").as("text_len"))
      .withColumn("is_content",
        (col("text_len") * 100 >= col("raw_len") * minDensityPct)
          .cast("long"))
  }

  /** Repetition (boilerplate) statistics, Gopher-style: the fraction of
    * duplicated 2-grams and 3-grams per document. High ratios mark
    * templated/spammy text for the quality filter. Narrow projections — no
    * shuffle.
    *
    * Construction is `zip_with` over shifted slices (4 array slices per doc
    * total) rather than a per-position `slice`+`concat` transform (one
    * O(len) slice per position ⇒ O(len²) work and allocation churn), and
    * the gram counts are materialized in their own projection so each gram
    * array is built once — CollapseProject keeps a producer projection
    * intact when its outputs are non-trivial and referenced more than once.
    * Measured at sf0.1: 22.2 s → 2.3 s. */
  def repetitionStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = TextStats.tokens(col(textCol))
    val n = size(t)
    val g2 = zip_with(
      slice(t, lit(1), greatest(n - 1, lit(0))),
      slice(t, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    val g3 = zip_with(
      slice(g2, lit(1), greatest(n - 2, lit(0))),
      slice(t, lit(3), greatest(n - 2, lit(0))),
      (ab, c) => concat(ab, lit(" "), c))
    def ratio(total: Column, uniq: Column): Column =
      when(total > 0,
        round((total - uniq) * lit(1.0) / total, 4)).otherwise(lit(0.0))
    docs.select(col("doc_id"),
        size(g2).as("__n2"), size(array_distinct(g2)).as("__u2"),
        size(g3).as("__n3"), size(array_distinct(g3)).as("__u3"))
      .select(col("doc_id"),
        ratio(col("__n2"), col("__u2")).as("dup_2gram_ratio"),
        ratio(col("__n3"), col("__u3")).as("dup_3gram_ratio"))
  }

  /** Redaction patterns: RE2-safe syntax only (character classes, bounded
    * repetition, `\b` word boundaries — no lookarounds, no Java-only
    * syntax), so any engine in the pipeline reproduces them. Both Java
    * regex and RE2 resolve alternation leftmost-first, and the phone
    * alternatives are anchor-disjoint (`+` / `(` / digit), so the two
    * engines pick the same branch.
    *
    * PhoneRe is digit-count-bounded (≈7-16 digits) and deliberately does
    * NOT treat a bare space as a digit-group separator unless the match is
    * anchored by `+` or `(` — an unanchored space-joined digit pattern
    * masks year sequences ("2024 2025 2026") and numeric table rows in
    * training text (tested in CurationSpec). Four anchor-disjoint forms:
    * international (+CC ...), parenthesized area code, dash/dot-grouped,
    * and a contiguous 7-15 digit run. Dot grouping is allowed ONLY in the
    * strict NANP 3-3-4 shape ("555.123.4567"): a looser dotted form masks
    * dotted version strings ("10.15.73") and European dotted dates
    * ("12.04.2026") — both spec'd as negatives. Trade-offs: a
    * space-grouped national number with no anchor ("090 1234 5678") and a
    * non-NANP dotted number ("02.38.23.49.99") are missed — precision over
    * recall, because over-redaction silently corrupts training data while
    * a missed phone is caught by the contiguous/anchored forms in most
    * real corpora. */
  val EmailRe: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re: String = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val PhoneRe: String =
    "\\+[0-9]{1,3}[ .-]?\\(?([0-9][ .()-]{0,2}){5,12}[0-9]" + // +CC, any grouping
    "|\\(0?[0-9]{1,3}\\)[ .-]?([0-9][ .-]?){3,10}[0-9]" +     // (area) grouped
    "|\\b[0-9]{2,3}(-[0-9]{2,4}){2,3}\\b" +                   // 555-123-4567
    "|\\b[0-9]{3}\\.[0-9]{3}\\.[0-9]{4}\\b" +                 // 555.123.4567
    "|\\b[0-9]{7,15}\\b"                                      // contiguous run

  /** PII redaction: masks emails, IPv4 addresses, then phone-like digit
    * runs (in that order — emails/IPs contain digit runs a later phone pass
    * would mangle), with per-class match counts for audit. Each class is
    * counted on the text AS THE PASS SEES IT (post earlier redactions), so
    * every count equals the number of its mask tokens in the output — raw-
    * text counts would claim a <PHONE> for the digit run inside an already-
    * masked email. Pure per-row regex projection — no shuffle; the staged
    * projections keep each intermediate redaction computed once. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        size(regexp_extract_all(col(textCol), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        regexp_replace(col(textCol), EmailRe, "<EMAIL>").as("__t1"))
      .select(col("doc_id"), col("n_emails"),
        size(regexp_extract_all(col("__t1"), lit(Ipv4Re), lit(0)))
          .cast("long").as("n_ips"),
        regexp_replace(col("__t1"), Ipv4Re, "<IP>").as("__t2"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        size(regexp_extract_all(col("__t2"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        regexp_replace(col("__t2"), PhoneRe, "<PHONE>").as("redacted"))
}
