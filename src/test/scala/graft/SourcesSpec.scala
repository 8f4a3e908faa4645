package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse
import graft.ops.Sequences
import graft.sources.FileIO

class SourcesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).resolve("out").toString

  test("S5/S6: sequence dataset survives a JSON round-trip (arrays of structs)") {
    val obs = (0 until 30).map { i =>
      ("u", java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
        .plusSeconds(i * 300L)), i.toLong, i.toDouble, "c")
    }.toDF("location", "event_timestamp", "event_id", "value", "code")
    val seqs = Sequences.build(obs, seqLen = 24, forecastLen = 2,
      features = Seq("value", "code"))
    val path = tmp("graft-json")
    FileIO.writeJson(seqs, path, coalesceTo = 1)
    val back = FileIO.readJson(spark, path, seqs.schema)
    assert(back.count() === seqs.count())
    val row = back.orderBy("end_timestamp").head()
    val seq = row.getSeq[Row](row.fieldIndex("sequence"))
    assert(seq.length === 24)
    assert(seq.map(_.getAs[Double]("value")) === (0 until 24).map(_.toDouble))
  }

  test("S7: CSV round-trip preserves typed weather-shaped rows") {
    val df = Seq(
      ("locA", 21.5, 3, java.sql.Timestamp.valueOf("2024-03-05 12:00:00")),
      ("locB", -4.0, 95, java.sql.Timestamp.valueOf("2024-03-05 12:05:00")))
      .toDF("location", "temperature", "weathercode", "event_timestamp")
    val path = tmp("graft-csv")
    FileIO.writeCsv(df, path, coalesceTo = 1)
    val back = FileIO.readCsv(spark, path, df.schema).orderBy("location").collect()
    assert(back.length === 2)
    assert(back(0).getAs[Double]("temperature") === 21.5)
    assert(back(1).getAs[Int]("weathercode") === 95)
    assert(back(0).getAs[java.sql.Timestamp]("event_timestamp")
      === java.sql.Timestamp.valueOf("2024-03-05 12:00:00"))
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "k", "v")
    val path = tmp("graft-orc")
    FileIO.writeOrc(df, path)
    val back = FileIO.readOrc(spark, path, df.schema).filter(col("id") > 1)
    assert(back.count() === 2)
    assert(back.queryExecution.executedPlan.toString.contains("PushedFilters"))
  }

  test("partitioned parquet layout prunes partitions at the scan") {
    val df = Seq(
      ("2024-01-05", "a", 1.0), ("2024-01-05", "b", 2.0),
      ("2024-01-06", "a", 3.0), ("2024-01-07", "c", 4.0))
      .toDF("day", "k", "v")
    val path = tmp("graft-part")
    FileIO.writePartitioned(df, path, "day")
    val filtered = spark.read.parquet(path).filter(col("day") === "2024-01-05")
    assert(filtered.count() === 2)
    // The predicate lands in PartitionFilters (directory pruning at
    // planning time), not a post-scan row filter.
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"),
      s"expected a partition-pruned scan:\n$scan")
  }

  test("parquetRowCount matches count() on a 2-level partitioned multi-file table") {
    // Exercises the recursive footer walk: day=X/tenant=Y/part-*.parquet
    // (several part files per leaf via repartition) plus _SUCCESS markers
    // that must be skipped.
    val df = (0 until 200)
      .map(i => (f"2024-01-${i % 4 + 1}%02d", s"t${i % 3}", i.toLong))
      .toDF("day", "tenant", "v").repartition(4)
    val path = tmp("graft-partcount")
    FileIO.writePartitioned(df, path, "day", "tenant")
    assert(Tables.parquetRowCount(spark, path) === 200L)
    // The guard: a directory with no parquet files fails loudly — silently
    // returning 0 would shrink every metadata-derived plan parameter.
    val empty = tmp("graft-empty")
    new java.io.File(empty).mkdirs()
    intercept[IllegalArgumentException](Tables.parquetRowCount(spark, empty))
  }

  test("S1-shaped parse: fromKafka handles binary key/value columns") {
    val rows = java.util.List.of(
      Row("locA".getBytes("UTF-8"),
        """{"location_name":"locA","time":"2024-03-05T12:00:00Z","temperature":"7.25"}"""
          .getBytes("UTF-8"),
        java.sql.Timestamp.valueOf("2024-03-05 12:00:30")))
    val kafkaShaped = spark.createDataFrame(rows, StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("timestamp", TimestampType))))
    val parsed = Parse.fromKafka(kafkaShaped).collect()
    assert(parsed.length === 1)
    assert(parsed(0).getAs[String]("location") === "locA")
    assert(parsed(0).getAs[Double]("temperature") === 7.25)
    assert(parsed(0).getAs[java.sql.Timestamp]("event_timestamp")
      === java.sql.Timestamp.valueOf("2024-03-05 12:00:00"))
  }

  test("P13/P15: payload key blacklist via map_filter keeps typed extraction intact") {
    val df = Seq(("k1", """{"a":"1","message":"","error":"x","b":"2.5"}"""))
      .toDF("key", "value")
      .withColumn("payload", from_json(col("value"), Parse.PayloadSchema))
    val cleaned = df.select(map_filter(col("payload"),
      (k, _) => !k.isin("message", "error", "error_message")).as("payload"))
    val keys = cleaned.select(explode(map_keys(col("payload"))).as("k"))
      .collect().map(_.getString(0)).sorted
    assert(keys.toSeq === Seq("a", "b"))
    // P15 dynamic coercion at the edge: try_cast chain instead of driver code.
    val typed = cleaned.select(
      col("payload").getItem("a").cast("int").as("a"),
      col("payload").getItem("b").cast("double").as("b")).head()
    assert(typed.getInt(0) === 1 && typed.getDouble(1) === 2.5)
  }
}
