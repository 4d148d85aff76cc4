package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.DistinctMart

/** HLL distinct mart: batch-cut invariance is BIT-exact (union is
  * associative/deterministic), estimates track exact counts within the
  * sketch bound, range readout unions across days, replay is a no-op.
  */
class DistinctMartSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int): DataFrame =
    spark.range(n.toLong).select(
      col("id").as("event_id"),
      pmod(hash(col("id")), lit(500L)).as("user_id"),
      to_timestamp(lit("2024-01-01 00:00:00"))
        .plus(expr("make_interval(0,0,0,0, CAST(pmod(hash(id*3), 240) AS INT), 0,0)"))
        .as("ts"))

  test("folds in any cut equal the one-shot sketch; estimates near exact") {
    val ev = events(5000)
    val p1 = tmpDir("dm1") + "/s"
    (0 to 2).foreach(i => DistinctMart.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === i), p1, "user_id", "ts", i))
    val p2 = tmpDir("dm2") + "/s"
    DistinctMart.foldBatch(spark, ev, p2, "user_id", "ts", 0L)
    val daily1 = DistinctMart.dailyDistinct(spark, p1)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val daily2 = DistinctMart.dailyDistinct(spark, p2)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(daily1 == daily2, "fold must be batch-cut invariant")
    val exact = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    exact.foreach { case (d, n) =>
      val est = daily1(d)
      assert(math.abs(est - n) <= math.max(3, n * 0.05),
        s"day $d: estimate $est too far from exact $n")
    }
  }

  test("range readout unions across days; replay is a no-op") {
    val ev = events(5000)
    val p = tmpDir("dm3") + "/s"
    (0 to 2).foreach(i => DistinctMart.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === i), p, "user_id", "ts", i))
    val exactAll = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val est = DistinctMart.rangeDistinct(spark, p, "2024-01-01", "2024-01-31")
    assert(math.abs(est - exactAll) <= math.max(3, exactAll * 0.05),
      s"range estimate $est vs exact $exactAll")
    val before = DistinctMart.dailyDistinct(spark, p).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    DistinctMart.foldBatch(spark,
      ev.filter(pmod(col("event_id"), lit(3)) === 1), p, "user_id", "ts", 1L)
    val after = DistinctMart.dailyDistinct(spark, p).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(after == before, "replayed batch changed the sketches")
  }
}
