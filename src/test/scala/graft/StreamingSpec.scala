package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc.Envelope
import graft.model.Schemas
import graft.streaming.{CdcStream, StatefulOps}

/** End-to-end golden flow (SURVEY.md §5.3): Debezium-envelope JSON files →
  * streaming Bronze sink → streaming keyed upsert → SCD2 over two epochs.
  * Exercises checkpointing, exactly-once file sink, and replay idempotence.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(id: Int, balance: Double, opCode: String, tsStr: String, lsn: Long): String =
    s"""{"payload":{"before":null,"after":{"id":$id,"customer_id":1,"account_type":"SAVINGS","balance":$balance,"currency":"USD","created_at":"$tsStr"},"source":{"table":"accounts","lsn":$lsn,"ts_ms":$lsn},"op":"$opCode","ts_ms":$lsn}}"""

  test("file-source CDC stream lands date-partitioned Bronze exactly once") {
    val in = tmpDir("cdc-in"); val bronze = tmpDir("bronze"); val ckpt = tmpDir("ckpt")
    Files.writeString(Paths.get(s"$in/batch1.json"),
      Seq(
        envelope(1, 100.0, "c", "2024-01-01T10:00:00Z", 1),
        envelope(2, 50.0, "c", "2024-01-02T10:00:00Z", 2)).mkString("\n"))
    val parsed = CdcStream.fromJsonFiles(spark, in, Schemas.accounts)
      .drop(Envelope.CorruptCol)
    val q = CdcStream.toBronze(parsed, bronze, ckpt,
      trigger = Trigger.ProcessingTime(0))
    q.processAllAvailable()
    // second epoch: update account 1
    Files.writeString(Paths.get(s"$in/batch2.json"),
      envelope(1, 999.0, "u", "2024-01-03T10:00:00Z", 3))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(bronze)
    assert(out.count() == 3)
    // Hive-style ingest_date partitions exist
    assert(out.select("ingest_date").distinct().count() == 3)
    // restart with same checkpoint: no duplicates (exactly-once)
    val q2 = CdcStream.toBronze(
      CdcStream.fromJsonFiles(spark, in, Schemas.accounts).drop(Envelope.CorruptCol),
      bronze, ckpt, trigger = Trigger.ProcessingTime(0))
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(bronze).count() == 3)
  }

  test("streaming keyed upsert maintains latest-wins gold table across batches") {
    val in = tmpDir("ups-in"); val sink = tmpDir("gold") + "/fact"; val ckpt = tmpDir("ups-ckpt")
    Files.writeString(Paths.get(s"$in/b1.json"),
      Seq(
        envelope(1, 100.0, "c", "2024-01-01T10:00:00Z", 1),
        envelope(1, 150.0, "u", "2024-01-01T11:00:00Z", 2),
        envelope(2, 50.0, "c", "2024-01-01T10:30:00Z", 3)).mkString("\n"))
    val parsed = CdcStream.fromJsonFiles(spark, in, Schemas.accounts)
      .drop(Envelope.CorruptCol)
    val q = CdcStream.upsertStream(parsed, sink, ckpt,
      keys = Seq("id"), orderCol = "ts_ms", trigger = Trigger.ProcessingTime(0))
    q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.json"),
      envelope(2, 75.0, "u", "2024-01-01T12:00:00Z", 4))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(sink).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[Double]("balance")).toMap
    assert(out == Map(1 -> 150.0, 2 -> 75.0))
  }

  test("streaming SCD2 maintains versioned snapshot across micro-batches") {
    val in = tmpDir("scd-in"); val snap = tmpDir("scd") + "/dim"; val ckpt = tmpDir("scd-ckpt")
    Files.writeString(Paths.get(s"$in/b1.json"),
      Seq(
        envelope(1, 100.0, "c", "2024-01-01T10:00:00Z", 1),
        envelope(2, 50.0, "c", "2024-01-01T10:00:00Z", 2)).mkString("\n"))
    def start() = CdcStream.scd2Stream(
      CdcStream.fromJsonFiles(spark, in, Schemas.accounts, maxFilesPerTrigger = 1)
        .drop(Envelope.CorruptCol).drop("op", "ts_ms"),
      snap, ckpt,
      keys = Seq("id"), checkCols = Seq("customer_id", "account_type", "balance"),
      asOfCol = "created_at", orderCols = Seq("created_at"),
      trigger = Trigger.ProcessingTime(0))
    val q = start(); q.processAllAvailable()
    Files.writeString(Paths.get(s"$in/b2.json"),
      envelope(1, 999.0, "u", "2024-01-02T10:00:00Z", 3))
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(snap)
    assert(out.count() == 3)  // 2 current + 1 closed history row
    val current = out.filter(col("effective_to").isNull).collect()
      .map(r => r.getAs[Int]("id") -> r.getAs[Double]("balance")).toMap
    assert(current == Map(1 -> 999.0, 2 -> 50.0))
    val closed = out.filter(col("effective_to").isNotNull).head()
    assert(closed.getAs[Int]("id") == 1 && closed.getAs[Double]("balance") == 100.0)
  }

  test("dedupStream drops replays within the watermark window") {
    val in = tmpDir("dd-in")
    Files.writeString(Paths.get(s"$in/b1.json"),
      Seq(
        """{"id":1,"v":10.0,"ts":"2024-01-01T10:00:00Z"}""",
        """{"id":1,"v":10.0,"ts":"2024-01-01T10:00:30Z"}""",
        """{"id":2,"v":20.0,"ts":"2024-01-01T10:01:00Z"}""").mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).json(in)
    val q = CdcStream.dedupStream(stream, Seq("id"), "ts", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dd_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT id FROM dd_out").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("flatMapGroupsWithState keeps per-key latest and emits only changes") {
    val in = tmpDir("state-in")
    Files.writeString(Paths.get(s"$in/b1.json"),
      Seq(
        """{"key":1,"version":1,"value":10.0}""",
        """{"key":1,"version":2,"value":20.0}""",
        """{"key":2,"version":5,"value":50.0}""").mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("version", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = StatefulOps.latestByKeyDf(stream, "key", "version", "value")
      .writeStream.outputMode("append")
      .format("memory").queryName("state_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable()
    // batch 2: a replay (stale version 1) and a real update
    Files.writeString(Paths.get(s"$in/b2.json"),
      Seq(
        """{"key":1,"version":1,"value":10.0}""",
        """{"key":2,"version":6,"value":60.0}""").mkString("\n"))
    q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT * FROM state_out").collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("version"),
        r.getAs[String]("change"))).toSet
    // batch1 emits inserts with the per-batch winners; batch2: replay of
    // key 1 emits nothing, key 2 emits one update
    assert(out == Set((1L, 2L, "insert"), (2L, 5L, "insert"), (2L, 6L, "update")))
  }

  test("windowed aggregation with watermark over the events table (batch-check)") {
    // batch DataFrames accept the same plan: verifies shape + column names
    val agg = CdcStream.windowedAgg(
      Tables.events(spark, "/root/testdata/sf0.001"),
      "ts", "event_type", "value", windowDur = "1 hour")
    val rows = agg.collect()
    assert(rows.nonEmpty)
    assert(agg.columns.toSeq == Seq("window_start", "window_end", "event_type",
      "n_events", "total_value"))
  }

  test("streaming windowed agg emits finalized windows under watermark") {
    val in = tmpDir("win-in")
    Files.writeString(Paths.get(s"$in/e1.json"),
      Seq(
        """{"user_id":1,"event_type":"click","value":1.0,"ts":"2024-01-01T10:05:00Z"}""",
        """{"user_id":2,"event_type":"click","value":2.0,"ts":"2024-01-01T10:20:00Z"}""",
        """{"user_id":3,"event_type":"click","value":4.0,"ts":"2024-01-01T13:00:00Z"}""").mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType)))
    val stream = spark.readStream.schema(schema).json(in)
    val agg = CdcStream.windowedAgg(stream, "ts", "event_type", "value", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    q.processAllAvailable(); q.stop()
    // the 10:00 window is older than watermark (13:00 - 10min) → finalized
    val out = spark.sql("SELECT * FROM win_out").collect()
    assert(out.exists(r => r.getAs[Long]("n_events") == 2L))
  }
}
