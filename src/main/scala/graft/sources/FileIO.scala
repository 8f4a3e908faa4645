package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File sources/sinks (SURVEY.md §2.1 S5-S7): JSON-lines export of the
  * sequence dataset (reference: getSample.py:236-240 / train.py:38-50) and
  * CSV round-trips (crawl_data/weather_utils.py:115-139 — driver-side pandas
  * in the reference, a distributed writer here).
  *
  * Scale notes: `coalesceTo` mirrors the reference's `coalesce(1)` export
  * knob but defaults to 0 (= keep the natural partitioning): a single-file
  * export serializes the whole job through one task and is only for
  * small hand-off files. Readers take an explicit schema — schema
  * inference over 100 TB of JSON is a full extra scan.
  */
object FileIO {

  /** S5: JSON-lines sink. `coalesceTo = 0` keeps the input partitioning. */
  def writeJson(df: DataFrame, path: String, coalesceTo: Int = 0): Unit =
    (if (coalesceTo > 0) df.coalesce(coalesceTo) else df)
      .write.mode("overwrite").json(path)

  /** S6: JSON-lines source with a declared schema (no inference scan). */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S7: CSV sink with header. */
  def writeCsv(df: DataFrame, path: String, coalesceTo: Int = 0): Unit =
    (if (coalesceTo > 0) df.coalesce(coalesceTo) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S7: CSV source with header + declared schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC sink/source — same columnar guarantees as parquet through the
    * same DataSource API; declared schema on read. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-style partitioned parquet sink — the layout that makes
    * date/tenant predicates prune at the SOURCE (PartitionFilters skip
    * whole directories; at 100 TB this is the difference between scanning
    * a day and scanning the corpus). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
