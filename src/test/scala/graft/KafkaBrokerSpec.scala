package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse

/** The "contract EXECUTED" counterpart to KafkaContractSpec's "contract
  * pinned": produce reference-shaped JSON messages to a REAL broker and
  * assert `fromKafka(format("kafka")…)` agrees with `fromJsonValue` on the
  * same rows.
  *
  * Gated, not skipped-by-default for convenience: this build environment
  * has zero Kafka artifacts (no kafka-clients, no spark-sql-kafka, no
  * embeddable server — verified against /opt/spark/jars and the offline
  * dependency cache), so an embedded broker cannot even be compiled
  * against, let alone started. The spec therefore touches Kafka only
  * through reflection (compiles everywhere) and cancels itself unless BOTH
  * hold:
  *   - `SPARK_GRAFT_KAFKA_BOOTSTRAP` names a reachable broker, and
  *   - the spark-sql-kafka connector is on the classpath (which transitively
  *     provides kafka-clients for the reflective producer).
  * Where both hold — any deployment with the standard connector jars — the
  * full wire round-trip runs: schema equality with the pinned
  * [[Parse.KafkaSourceSchema]], then value-level parity with the
  * literal-frame path every other spec uses. */
class KafkaBrokerSpec extends AnyFunSuite with SparkFixture {

  private def bootstrap = sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")

  private def connectorPresent: Boolean =
    try { Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"); true }
    catch { case _: Throwable => false }

  /** kafka-clients producer via reflection only — this file must compile in
    * environments (like this one) with no Kafka jars at all. */
  private def produce(servers: String, topic: String,
                      msgs: Seq[(String, String)]): Unit = {
    val props = new java.util.Properties()
    props.put("bootstrap.servers", servers)
    val ser = "org.apache.kafka.common.serialization.StringSerializer"
    props.put("key.serializer", ser)
    props.put("value.serializer", ser)
    val producerCls = Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
    val recordCls = Class.forName("org.apache.kafka.clients.producer.ProducerRecord")
    val producer = producerCls.getConstructor(classOf[java.util.Properties])
      .newInstance(props)
    val send = producerCls.getMethod("send", recordCls)
    val ctor = recordCls.getConstructor(
      classOf[String], classOf[Object], classOf[Object])
    try {
      msgs.foreach { case (k, v) =>
        send.invoke(producer, ctor.newInstance(topic, k, v).asInstanceOf[Object])
      }
      producerCls.getMethod("flush").invoke(producer)
    } finally producerCls.getMethod("close").invoke(producer)
  }

  test("fromKafka over a real broker matches fromJsonValue on the same rows") {
    assume(bootstrap.isDefined,
      "SPARK_GRAFT_KAFKA_BOOTSTRAP not set — no broker can bind in this environment")
    assume(connectorPresent, "spark-sql-kafka connector not on the classpath")
    val servers = bootstrap.get
    val topic = s"graft_contract_${System.nanoTime()}"
    // The reference producer's three message shapes (crawl_data/
    // producer_v2.py:197-205): full observation, API-error row, key-only
    // fallback row.
    val msgs = Seq(
      ("hanoi",
        """{"location_name":"hanoi","time":"2024-03-05T12:00:00Z","temperature":"21.5","weathercode":"3"}"""),
      ("hue", """{"message":"lỗi khi gọi api"}"""),
      ("danang", """{"temperature":"18.0"}"""))
    produce(servers, topic, msgs)

    val wire = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
    // 1. the connector's live schema IS the pinned contract
    assert(wire.schema === Parse.KafkaSourceSchema)

    // 2. value-level parity with the non-broker path on the same payloads
    val parsed = Parse.fromKafka(wire).collect()
      .map(r => r.getAs[String]("location") -> r).toMap
    assert(parsed.keySet === Set("hanoi", "danang")) // error row dropped
    assert(parsed("hanoi").getAs[Double]("temperature") === 21.5)
    assert(parsed("hanoi").getAs[Int]("weathercode") === 3)
    assert(parsed("hanoi").getAs[java.sql.Timestamp]("event_timestamp") ===
      java.sql.Timestamp.valueOf("2024-03-05 12:00:00"))
    // key-only row: location from the kafka key, event time from broker
    // ingest timestamp (exact value is broker-assigned — assert presence)
    assert(parsed("danang").getAs[Double]("temperature") === 18.0)
    assert(parsed("danang").getAs[java.sql.Timestamp]("event_timestamp") != null)
  }
}
