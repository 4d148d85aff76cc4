package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.gold.AnalystMarts

/** Incremental analyst marts: folding event micro-batches (out of order
  * in event time) must reproduce the batch recompute exactly, replays
  * must be no-ops, and the streaming composition must land the same
  * state through foreachBatch.
  */
class AnalystMartsSpec extends SparkSpec {
  import spark.implicits._

  // 3 users × interleaved days across two ISO weeks, values with exact
  // decimal behavior; event_id gives the batch split
  private def events() = Seq(
    (1L, 101L, "view", "2024-01-01 10:00:00", 10.5),
    (2L, 102L, "purchase", "2024-01-02 11:00:00", 99.99),
    (3L, 101L, "view", "2024-01-08 09:00:00", 1.25),
    (4L, 103L, "view", "2024-01-09 12:00:00", 7.0),
    (5L, 102L, "view", "2024-01-10 08:30:00", 3.5),
    (6L, 101L, "purchase", "2024-01-15 16:00:00", 49.95),
    (7L, 103L, "view", "2024-01-01 23:59:59", 2.0),
    (8L, 101L, "view", "2024-01-01 10:00:00", 10.5),
    (9L, 102L, "purchase", "2024-01-16 07:15:00", 150.0)
  ).toDF("event_id", "user_id", "event_type", "ts_s", "value")
    .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private def batchRetention(ev: DataFrame): DataFrame = {
    val cohort = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort_week"))
    ev.select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
      .distinct()
      .join(cohort, Seq("user_id"))
      .withColumn("week_offset",
        (datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  private def batchWau(ev: DataFrame): DataFrame =
    ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("window_end"))
      .distinct()
      .groupBy(col("window_end")).agg(countDistinct(col("user_id")).as("wau"))

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what: incremental readout differs from batch recompute\n" +
        s"inc:\n${a.collect().mkString("\n")}\nbatch:\n${b.collect().mkString("\n")}")
  }

  test("3 out-of-order folds reproduce the batch recompute; replay is a no-op") {
    val mart = AnalystMarts.Mart(tmpDir("mart-fold") + "/m")
    val ev = events()
    // event-time order deliberately scrambled across batches
    (0 to 2).foreach(i => AnalystMarts.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === i), mart, i.toLong))
    assertSame(AnalystMarts.retentionCohorts(spark, mart), batchRetention(ev),
      "retention")
    assertSame(AnalystMarts.rollingWau(spark, mart), batchWau(ev), "wau")
    val daily = AnalystMarts.dailyValueMart(spark, mart)
      .select("day", "event_type", "value_sum", "n_rows")
    val expectDaily = ev.withColumn("day", to_date(col("ts")))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("value_sum"),
        count(lit(1)).as("n_rows"))
    assertSame(daily, expectDaily, "daily value mart")
    // replayed micro-batch: BaseDelta overwrites its own delta, the agg
    // state sees its generation already committed — both no-ops
    AnalystMarts.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === 1), mart, 1L)
    assertSame(AnalystMarts.retentionCohorts(spark, mart), batchRetention(ev),
      "retention after replay")
    assertSame(AnalystMarts.dailyValueMart(spark, mart)
        .select("day", "event_type", "value_sum", "n_rows"),
      expectDaily, "daily mart after replay")
  }

  test("foreachBatch stream lands the same marts as the direct folds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mart = AnalystMarts.Mart(tmpDir("mart-stream") + "/m")
    val ms = MemoryStream[(Long, Long, String, String, Double)]
    val src = ms.toDF()
      .toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val q = AnalystMarts.refreshStream(src, mart,
      tmpDir("mart-ckpt"), trigger = Trigger.ProcessingTime(0))
    val rows = events().collect().map(r => (r.getLong(0), r.getLong(1),
      r.getString(2), r.getTimestamp(4).toString, r.getDouble(3)))
    // three micro-batches, event-time interleaved
    rows.grouped(3).foreach { g => ms.addData(g.toSeq); q.processAllAvailable() }
    q.stop()
    assertSame(AnalystMarts.retentionCohorts(spark, mart),
      batchRetention(events()), "streamed retention")
    assertSame(AnalystMarts.rollingWau(spark, mart), batchWau(events()),
      "streamed wau")
  }

  test("maintenance compaction between folds no longer desyncs the ledger (round-8 class bug)") {
    val mart = AnalystMarts.Mart(tmpDir("mart-compact") + "/m")
    val ev = events()
    AnalystMarts.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === 0), mart, 0L)
    // out-of-band maintenance: a compaction generation on the agg state
    // (identical contents). Under the round-8 generation-parity ledger
    // this made the NEXT fold look like a replay and silently drop it.
    graft.gold.Optimize.compactSnapshot(spark, mart.aggStatePath,
      targetBytes = 256L << 20)
    (1 to 2).foreach(i => AnalystMarts.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === i), mart, i.toLong))
    val daily = AnalystMarts.dailyValueMart(spark, mart)
      .select("day", "event_type", "value_sum", "n_rows")
    val expectDaily = ev.withColumn("day", to_date(col("ts")))
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("value_sum"),
        count(lit(1)).as("n_rows"))
    assertSame(daily, expectDaily,
      "daily mart after compaction-interleaved folds")
    // and a true replay still skips
    AnalystMarts.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === 1), mart, 1L)
    assertSame(AnalystMarts.dailyValueMart(spark, mart)
        .select("day", "event_type", "value_sum", "n_rows"),
      expectDaily, "daily mart after replay")
  }
}
