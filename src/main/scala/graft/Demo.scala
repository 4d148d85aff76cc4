package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.cdc.Envelope
import graft.model.Schemas
import graft.streaming.CdcStream

/** Continuous end-to-end demo (SURVEY.md §7.6): the reference pipeline's
  * whole lifecycle — CDC envelopes land → streaming Bronze → keyed
  * base+delta gold (tombstones honored) → streaming SCD2 dim — as ONE
  * runnable program, including the mid-run restart every production
  * deployment eventually exercises: all three streams are STOPPED between
  * epochs and resume from their checkpoints, and the replayed/late events
  * in epoch 2 land exactly once in the merged views.
  *
  * Run: `sbt "runMain graft.Demo [workDir]"` — prints the accrued Bronze
  * log, the current-state gold table, and the SCD2 history. The same flow
  * is exercised in CI shape by DemoSpec.
  */
object Demo {

  /** The demo's output tables, for programmatic assertion (DemoSpec). */
  case class Result(bronze: DataFrame, current: DataFrame, history: DataFrame)

  private def env(id: Int, cust: Int, bal: Double, created: String, lsn: Long,
                  op: String = "c"): String =
    s"""{"payload":{"before":null,"after":{"id":$id,"customer_id":$cust,"account_type":"SAVINGS","balance":$bal,"currency":"USD","created_at":"$created"},"source":{"table":"accounts","lsn":$lsn,"ts_ms":$lsn},"op":"$op","ts_ms":$lsn}}"""

  private def delEnv(id: Int, created: String, lsn: Long): String =
    s"""{"payload":{"before":{"id":$id,"customer_id":1,"account_type":"SAVINGS","balance":0.0,"currency":"USD","created_at":"$created"},"after":null,"source":{"table":"accounts","lsn":$lsn,"ts_ms":$lsn},"op":"d","ts_ms":$lsn}}"""

  /** Drive the full flow in `workDir` (created if missing) and return the
    * three result tables. Idempotent per workDir ONLY for a fresh dir —
    * pass a new directory per invocation (the point of the demo is the
    * restart semantics, not re-runs over a dirty workspace).
    */
  def run(spark: SparkSession, workDir: String): Result = {
    val in = s"$workDir/landing"
    val bronze = s"$workDir/bronze/accounts"
    val delta = s"$workDir/gold/accounts_current"
    val scd2 = s"$workDir/gold/accounts_scd2"
    Files.createDirectories(Paths.get(in))

    // three independent checkpointed streams off one landing zone — the
    // medallion fan-out (raw log, merged current state, versioned dim)
    def startStreams() = {
      def parsed() = CdcStream.fromJsonFiles(spark, in, Schemas.accounts)
      def clean() = parsed()
        .filter(col(Envelope.CorruptCol).isNull).drop(Envelope.CorruptCol)
      Seq(
        CdcStream.toBronze(clean(), bronze, s"$workDir/ckpt/bronze",
          trigger = Trigger.ProcessingTime(0)),
        CdcStream.upsertStreamDelta(parsed().drop(Envelope.CorruptCol), delta,
          s"$workDir/ckpt/delta", keys = Seq("id"), orderCols = Seq("ts_ms"),
          opCol = Some("op"), maxDeltas = 2, trigger = Trigger.ProcessingTime(0)),
        CdcStream.scd2Stream(
          clean().filter(col("op") =!= "d").drop("op", "ts_ms"),
          scd2, s"$workDir/ckpt/scd2", keys = Seq("id"),
          checkCols = Seq("customer_id", "account_type", "balance"),
          asOfCol = "created_at", orderCols = Seq("created_at"),
          trigger = Trigger.ProcessingTime(0)))
    }

    // ── epoch 1: creates, one CDC replay, one corrupt line ──
    Files.writeString(Paths.get(s"$in/epoch1.json"), Seq(
      env(1, 1, 100.0, "2024-01-01T10:00:00Z", 1),
      env(1, 1, 100.0, "2024-01-01T10:00:00Z", 1), // replayed event
      env(2, 1, 50.0, "2024-01-01T11:00:00Z", 2),
      env(3, 2, 75.0, "2024-01-01T12:00:00Z", 3),
      """{"payload": {"after": {"id": broken""").mkString("\n"))
    val epoch1 = startStreams()
    epoch1.foreach(_.processAllAvailable())
    epoch1.foreach(_.stop()) // ← mid-run shutdown

    // ── epoch 2 lands while the pipeline is down; streams resume from
    //    their checkpoints and pick it up exactly once ──
    Files.writeString(Paths.get(s"$in/epoch2.json"), Seq(
      env(1, 1, 999.0, "2024-01-02T09:00:00Z", 4, op = "u"), // new SCD2 version
      delEnv(3, "2024-01-01T12:00:00Z", 5),                  // tombstone
      env(4, 2, 25.0, "2024-01-02T10:00:00Z", 6)).mkString("\n"))
    val epoch2 = startStreams()
    epoch2.foreach(_.processAllAvailable())
    epoch2.foreach(_.stop())

    val table = graft.gold.BaseDelta.Table(delta, Seq("id"), Seq("ts_ms"), Some("op"))
    Result(
      bronze = spark.read.parquet(bronze),
      current = graft.gold.BaseDelta.read(spark, table),
      history = spark.read.parquet(scd2))
  }

  def main(args: Array[String]): Unit = {
    val workDir = args.headOption.getOrElse(
      Scratch.dir("graft-demo"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = run(spark, workDir)
    println(s"=== graft.Demo @ $workDir ===")
    println(s"Bronze immutable log (${r.bronze.count()} rows; replay retained, corrupt quarantined):")
    r.bronze.orderBy("ts_ms").show(20, false)
    println("Gold current state (base+delta merge-on-read; replay collapsed, tombstone removed id 3):")
    r.current.orderBy("id").show(20, false)
    println("SCD2 account history (closed version of id 1 + four current rows):")
    r.history
      .withColumn("is_current", col("effective_to").isNull)
      .select("id", "customer_id", "balance", "effective_from", "effective_to", "is_current")
      .orderBy("id", "effective_from").show(20, false)
    spark.stop()
  }
}
