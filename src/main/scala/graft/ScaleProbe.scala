package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, EmbeddingSim, Forecast, Packing, Rollup}
import graft.ingest.Parse

/** Empirical scale probe: replicates the sf0.1 corpus N× (fresh ids, jittered
  * content so replicas aren't trivial dups) and times the operators whose
  * plans could hide super-linear behavior — near-dup joins, signature
  * builds, per-key windows. A healthy operator scales ≈ N×; a band/bucket
  * blow-up scales ≈ N². Usage: runMain graft.ScaleProbe [factor]
  */
object ScaleProbe {

  private def replicateDocs(docs: DataFrame, n: Int): DataFrame = {
    val base = docs.count()
    (0 until n).map { i =>
      // jitter: prefix a replica marker token so replicas are near- but
      // not exact dups of each other (keeps dedup joins honest)
      docs.select(
        (col("doc_id") + lit(i * base)).as("doc_id"),
        concat(lit(s"r$i "), col("text")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
  }

  private def replicateVecs(vecs: DataFrame, n: Int): DataFrame = {
    val base = vecs.count()
    (0 until n).map { i =>
      vecs.select((col("vec_id") + lit(i * base)).as("vec_id"),
        transform(col("embedding"), x => x + lit(i * 1e-4f)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  private def replicateEvents(ev: DataFrame, n: Int): DataFrame = {
    val base = ev.count()
    (0 until n).map { i =>
      ev.select((col("event_id") + lit(i * base)).as("event_id"),
        (col("user_id") + lit(i * 1000)).as("user_id"),
        col("ts"), col("ts_ns"), col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  private def time(label: String)(f: => Long): (String, Double, Long) = {
    val t0 = System.nanoTime()
    val rows = f
    (label, (System.nanoTime() - t0) / 1e9, rows)
  }

  /** Same between-measurement hygiene as Bench: drop cached relations and
    * operator-pinned persisted RDDs so a timing can't reuse a previous
    * timing's materialization (e.g. cc_canonical re-deriving the simhash
    * signature that simhash_pairs just persisted via CacheManager plan
    * matching) — every probe measures the operator COLD. The replica
    * corpora are re-cached afterwards since clearCache drops them too. */
  private def flush(spark: SparkSession, keep: Seq[DataFrame]): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    keep.foreach { df => df.cache(); df.count() }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val dir = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs1 = Tables.documents(spark, dir)
    val vecs1 = Tables.embeddings(spark, dir)
    val ev1 = Tables.events(spark, dir)
    val docsN = replicateDocs(docs1, factor).cache()
    val vecsN = replicateVecs(vecs1, factor).cache()
    val evN = replicateEvents(ev1, factor).cache()
    println(s"corpus: docs ${docsN.count()}, vecs ${vecsN.count()}, events ${evN.count()}")

    def suite(tag: String, docs: DataFrame, vecs: DataFrame, ev: DataFrame,
              keep: Seq[DataFrame]) = {
      val obs = Parse.eventsAsObservations(ev)
      val probes: Seq[() => (String, Double, Long)] = Seq(
        () => time(s"$tag/minhash_lsh")(Dedup.minhashLshPairs(docs).count()),
        () => time(s"$tag/simhash_pairs")(Dedup.simhashPairs(docs).count()),
        () => time(s"$tag/ngram_jaccard")(Dedup.ngramJaccardPairs(docs, "lang", 0.5).count()),
        () => time(s"$tag/emb_neardup")(EmbeddingSim.nearDupPairs(vecs, 0.45, planes = 4).count()),
        () => time(s"$tag/hourly_rollup")(Rollup.hourly(obs, Seq("value")).count()),
        () => time(s"$tag/forecast")(Forecast.linear(obs, 24, 12).count()),
        () => time(s"$tag/cc_canonical")(
          Dedup.canonicalize(docs, Dedup.simhashPairs(docs, maxHamming = 3)).count()),
        () => time(s"$tag/contamination")(
          Curation.contamination(docs, docs.filter(col("doc_id") % 97 === 0),
            minShared = 3, excludeSameId = true).count()),
        () => time(s"$tag/pack_sequences")(
          Packing.packSequences(docs, budget = 4096L).count()),
        () => time(s"$tag/kmeans_ivf")(
          EmbeddingSim.kmeansCentroids(vecs, k = 8, iters = 2).count()))
      probes.map { probe => val r = probe(); flush(spark, keep); r }
    }

    val cached = Seq(docsN, vecsN, evN)
    val r1 = suite("1x", docs1, vecs1, ev1, cached)
    val rN = suite(s"${factor}x", docsN, vecsN, evN, cached)
    println(f"${"operator"}%-16s ${"1x sec"}%8s ${factor + "x sec"}%8s ${"ratio"}%7s  rows@N")
    r1.zip(rN).foreach { case ((n1, t1, _), (_, tN, rowsN)) =>
      val op = n1.split('/')(1)
      println(f"$op%-16s $t1%8.1f $tN%8.1f ${tN / t1}%7.1f  $rowsN")
    }
    spark.stop()
  }
}
