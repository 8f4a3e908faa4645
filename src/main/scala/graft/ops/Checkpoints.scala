package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iteration-safe materialization for DataFrame fixpoint loops. */
object Checkpoints {

  /** `spark.sql.shuffle.partitions` as an Int, tolerant of the non-numeric
    * values the conf legitimately takes on some deployments ("auto" under
    * externally-managed AQE) — falls back to the cluster's default
    * parallelism instead of throwing NumberFormatException. Operators that
    * size their deterministic hash-bucket fan-out from this conf
    * (Packing, Sampling) must not crash on a valid session. */
  def shufflePartitions(spark: SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** Eagerly materialize `df` AND reset its statistics.
    *
    * `Dataset.localCheckpoint` truncates the logical plan but carries the
    * origin plan's ESTIMATED statistics across the checkpoint
    * (`LogicalRDD.fromDataset` keeps them for AQE). In an iterative loop
    * that estimate is itself a product of the previous round's carried
    * stats, so join-size estimates compound multiplicatively round over
    * round — by round 6 of the connected-components loop the sizeInBytes
    * BigIntegers are megabytes wide and JoinSelection's build-side
    * comparison multiplies them on the driver: measured 272 s for a round
    * whose stages all run in ~1 s (thread dump: `BigInteger.multiplyToomCook3`
    * on main). Rebuilding the frame from the checkpointed RDD resets the
    * leaf to default statistics, keeping every round's estimation O(1).
    *
    * The Row round-trip is one linear pass over a relation that is tiny
    * relative to the corpus (labels, centroids); a production pipeline
    * checkpointing to reliable storage (write/read parquet) resets stats
    * the same way. */
  def materialized(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    df.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }
}
