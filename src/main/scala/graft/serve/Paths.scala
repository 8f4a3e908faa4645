package graft.serve

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}

/** Hot/cold dual-path source resolution (SURVEY.md §2.10 fallback row;
  * reference: prediction/preprocessing/spark.py:468-474): serve queries
  * from the streaming-materialized table when it exists, else fall back to
  * the batch snapshot — ONE plan-builder downstream, two sources. The
  * reference duplicates every query across both paths; here the fallback
  * is the only duplicated line in the system. */
object Paths {

  /** The materialized table if registered, else the batch fallback. */
  def hotOrCold(spark: SparkSession, hotTable: String,
                cold: => DataFrame): DataFrame =
    try spark.table(hotTable)
    catch { case _: AnalysisException => cold }
}
