package graft.serve

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Edge serialization (SURVEY.md §2.2 P13/P14): rows → JSON record strings
  * with null fields dropped — the reference does this driver-side in Python
  * per row (spark.py:333-357); here it is a distributed projection
  * (`to_json` omits nulls by default) so an HTTP layer only streams
  * strings. */
object Records {

  /** All columns of `df` as one JSON string per row, nulls omitted,
    * blacklisted payload keys removed if a payload map is present. */
  def toJsonRecords(df: DataFrame,
                    payloadBlacklist: Seq[String] = Seq("message", "error", "error_message")): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cleaned =
      if (df.columns.contains("payload"))
        df.withColumn("payload", map_filter(col("payload"),
          (k, _) => !k.isin(payloadBlacklist: _*)))
      else df
    cleaned.select(to_json(struct(cleaned.columns.map(col): _*)).as("j")).as[String]
  }
}
