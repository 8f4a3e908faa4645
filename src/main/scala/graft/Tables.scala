package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's synthetic parquet corpus (TESTDATA.md).
  *
  * Every loader takes the scale-factor directory so the same query code runs
  * unchanged at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, by
  * construction, on any partitioned parquet layout at cluster scale: nothing
  * here assumes single-file input.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet`'s `ts` lineage varies by driver generation: INT64
    * TIMESTAMP(NANOS) (rounds ≤9 — unreadable by Spark's parquet reader
    * natively, hence `nanosAsLong`) or TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (round 10+ — read as TIMESTAMP_NTZ).
    * `normalizeEventTs` maps every lineage to the same (µs TIMESTAMP `ts`,
    * LONG `ts_ns`) shape, so query code never sees the difference. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, dir, "events"))
  }

  /** ts → µs-timestamp normalization, shared by the batch loader and the
    * streaming ingest path (which reads the same parquet as a stream).
    * Handles every lineage the driver has generated so far:
    *  - INT64 TIMESTAMP(NANOS) read as long via `nanosAsLong` → truncate to µs;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ →
    *    reinterpret the wall clock as a UTC instant (sessions run in UTC, so
    *    this matches DuckDB's naive-TIMESTAMP reading of the same file);
    *  - plain TIMESTAMP → passthrough.
    * `ts_ns` preserves the finest available precision for tie-free ordering. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts_ns", col("ts"))
           .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampNTZType =>
        // NTZ→TZ cast reads the wall clock in the session timezone; every
        // graft session pins spark.sql.session.timeZone=UTC, so this is the
        // treat-as-UTC reinterpretation, byte-for-byte what DuckDB computes.
        raw.withColumn("ts", col("ts").cast(TimestampType))
           .withColumn("ts_ns", unix_micros(col("ts")) * 1000)
      case _ => raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
    }
  }
  /** Keyed on (path, root modification time) so an in-process rewrite of
    * the table invalidates the memo: HDFS/local dirs get a fresh modTime
    * when their direct children change. (A rewrite buried two levels deep
    * that adds no top-level entry would keep the stale memo — acceptable:
    * Spark's own FileIndex caching has the same granularity.) */
  private val rowCountCache = scala.collection.concurrent.TrieMap.empty[(String, Long), Long]

  /** Exact row count from parquet FOOTER metadata — no Spark job, no data
    * pages read: O(#files) driver-side footer reads, memoized per
    * (path, modTime). The cheap way to size corpus-dependent plan
    * parameters (e.g. the LSH plane count in `emb_neardup_auto`) without
    * paying a full corpus scan before the query even starts — at 100 TB a
    * `df.count()` pre-pass is a whole extra job; the footers are already
    * read during planning anyway.
    *
    * Recurses through partitioned / multi-part layouts
    * (`dir/day=.../part-*.parquet`), skipping Spark bookkeeping files
    * (`_SUCCESS`, `_metadata`, hidden `.`-files). A directory with zero
    * parquet files is an error: returning 0 would silently shrink every
    * metadata-derived plan parameter. */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val root = fs.getFileStatus(p)
    rowCountCache.getOrElseUpdate((path, root.getModificationTime), {
      val files =
        if (root.isDirectory) {
          val it = fs.listFiles(p, true)
          val buf = Seq.newBuilder[Path]
          while (it.hasNext) {
            val st = it.next()
            val name = st.getPath.getName
            if (st.isFile && name.endsWith(".parquet") &&
                !name.startsWith("_") && !name.startsWith("."))
              buf += st.getPath
          }
          val out = buf.result()
          require(out.nonEmpty, s"parquetRowCount: no parquet files under " +
            s"$path — refusing to return 0 and silently shrink plan sizing")
          out
        } else Seq(p)
      files.map { f =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try rd.getRecordCount finally rd.close()
      }.sum
    })
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
}
