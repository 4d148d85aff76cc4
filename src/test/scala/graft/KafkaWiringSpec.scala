package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.Envelope
import graft.model.Schemas
import graft.streaming.CdcStream

/** Pin the Kafka source wiring without a broker (reference contract:
  * consumer/kafka_to_minio.py:15-24 — one consumer subscribed to all
  * three CDC topics, earliest offsets, bounded poll). `fromKafka` /
  * `fromKafkaRouted` compose exactly `kafkaSourceOptions` + `load()` +
  * `decodeKafka`; the two composable halves are driven here against
  * Kafka's fixed record schema, so the only untested hop is the broker
  * itself — a wiring regression (renamed option, dropped cast, lost
  * topic passthrough) fails this suite, not production.
  */
class KafkaWiringSpec extends SparkSpec {
  import spark.implicits._

  private val topics = Seq("banking.public.transactions",
    "banking.public.accounts", "banking.public.customers")

  test("source options: one subscription, earliest offsets, bounded poll") {
    assert(CdcStream.kafkaSourceOptions("broker-1:9092,broker-2:9092", topics,
      Some(50000L)) == Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> ("banking.public.transactions," +
        "banking.public.accounts,banking.public.customers"),
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "50000"))
    // unbounded form omits the trigger cap rather than writing a junk value
    assert(!CdcStream.kafkaSourceOptions("b:9092", topics, None)
      .contains("maxOffsetsPerTrigger"))
  }

  // Kafka's fixed source schema — what load() emits and decodeKafka consumes
  private def kafkaRecords(rows: (String, String)*) = {
    val schema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq.zipWithIndex.map {
        case ((topic, json), i) => org.apache.spark.sql.Row(
          s"k$i".getBytes("UTF-8"), json.getBytes("UTF-8"), topic,
          0, i.toLong, ts("2024-01-01 00:00:00"), 0)
      }), schema)
  }

  private val good =
    """{"payload":{"before":null,"after":{"id":7,"account_id":3,"txn_type":"TRANSFER","amount":412.55,"related_account_id":9,"status":"COMPLETED","created_at":"2026-08-12T09:15:02.123456Z"},"source":{"table":"transactions","lsn":12345,"ts_ms":1765530902123},"op":"c","ts_ms":1765530902500}}"""
  private val delete =
    """{"payload":{"before":{"id":8,"account_id":3,"txn_type":"DEPOSIT","amount":1.0,"related_account_id":null,"status":"COMPLETED","created_at":"2026-08-12T09:15:02Z"},"after":null,"source":{"table":"transactions","lsn":12346,"ts_ms":1765530903000},"op":"d","ts_ms":1765530903500}}"""
  private val malformed = """{"payload": {"after": {"id": 9,"""

  test("decode: binary value → envelope parse, deletes kept, malformed quarantined") {
    val raw = kafkaRecords(
      topics.head -> good, topics.head -> delete, topics.head -> malformed)
    val parsed = CdcStream.decodeKafka(raw, Schemas.transactions, routed = false)
    assert(!parsed.columns.contains("topic"),
      "unrouted decode must not carry the topic column")
    val (clean, bad) = Envelope.quarantine(parsed)
    assert(bad.count() == 1)
    val byOp = clean.collect().map(r => r.getAs[String]("op") -> r).toMap
    assert(byOp("c").getAs[Long]("id") == 7L &&
      byOp("c").getAs[Double]("amount") == 412.55)
    // delete keeps the before-image key — the tombstone-merge contract
    assert(byOp("d").getAs[Long]("id") == 8L)
  }

  test("routed decode: topic passthrough feeds routeToBronze's split") {
    val raw = kafkaRecords(
      topics(0) -> good, topics(1) -> delete)
    val parsed = CdcStream.decodeKafka(raw, Schemas.transactions, routed = true)
    assert(parsed.columns.contains("topic"))
    val (clean, _) = Envelope.quarantine(parsed)
    val got = clean.select(col("topic"), col("id")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(topics(0) -> 7L, topics(1) -> 8L), got.toString)
  }

  test("fromKafka wires the real kafka format") {
    // proves the options/decode spec'd above sit on the real
    // format("kafka") path, not a stub: with the connector on the
    // classpath the streaming plan builds; without it (this harness)
    // source resolution fails NAMING the kafka format
    try {
      val df = CdcStream.fromKafka(spark, "b:9092", topics,
        Schemas.transactions)
      assert(df.isStreaming, "fromKafka must produce a streaming plan")
    } catch {
      case e: Exception =>
        assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
    }
  }
}
