package graft

import org.apache.spark.sql.functions._
import graft.plans.QueryHistory

/** Runbook query-history readouts: exact discrete percentiles, decimal
  * totals, deterministic ranking, and the before/after regression
  * screen (reference readme.md:388-393's warehouse ops query).
  */
class QueryHistorySpec extends SparkSpec {
  import spark.implicits._

  private def runs(rows: (String, Double, String)*) =
    rows.toSeq.map { case (q, v, t) => (q, v, ts(t)) }
      .toDF("q", "sec", "run_ts")

  test("topQueries: totals, exact p50/p95, max, last run, rank order") {
    val log = runs(
      ("etl", 10.0, "2024-01-01 00:00:00"), ("etl", 20.0, "2024-01-02 00:00:00"),
      ("etl", 30.0, "2024-01-03 00:00:00"), ("etl", 40.0, "2024-01-04 00:00:00"),
      ("dash", 5.0, "2024-01-01 00:00:00"), ("dash", 5.0, "2024-01-05 00:00:00"),
      ("adhoc", 200.0, "2024-01-02 00:00:00"))
    val out = QueryHistory.topQueries(log, "q", "sec", "run_ts", topN = 2)
      .collect().map(r => r.getAs[String]("query_id") -> r).toMap
    // top-2 by total: adhoc (200) then etl (100); dash (10) excluded
    assert(out.keySet == Set("adhoc", "etl"))
    assert(out("adhoc").getAs[Int]("rank") == 1 &&
      out("etl").getAs[Int]("rank") == 2)
    val etl = out("etl")
    assert(etl.getAs[Long]("n_runs") == 4L)
    assert(etl.getAs[Double]("total_sec") == 100.0)
    // discrete percentiles: p50 of {10,20,30,40} = 20 (first value whose
    // cumulative share reaches 50%), p95 = 40
    assert(etl.getAs[Double]("p50_sec") == 20.0)
    assert(etl.getAs[Double]("p95_sec") == 40.0)
    assert(etl.getAs[Double]("max_sec") == 40.0)
    assert(etl.getAs[java.sql.Timestamp]("last_run")
      == ts("2024-01-04 00:00:00"))
  }

  test("regressions: per-query median shift across the cutoff, one-sided queries excluded") {
    val log = runs(
      // slowed 2×: median 10 → 20
      ("etl", 10.0, "2024-01-01 00:00:00"), ("etl", 10.0, "2024-01-02 00:00:00"),
      ("etl", 20.0, "2024-01-11 00:00:00"), ("etl", 20.0, "2024-01-12 00:00:00"),
      // steady: 5 → 6 (1.2×, under threshold)
      ("dash", 5.0, "2024-01-01 00:00:00"), ("dash", 6.0, "2024-01-11 00:00:00"),
      // only after the cutoff: no baseline, excluded
      ("fresh", 9.0, "2024-01-12 00:00:00"))
    val out = QueryHistory.regressions(log, "q", "sec", "run_ts",
        cutoff = lit("2024-01-10 00:00:00").cast("timestamp"),
        ratioThreshold = 1.5)
      .collect().map(r => r.getAs[String]("query_id") ->
        ((r.getAs[Double]("ratio"), r.getAs[Boolean]("regressed")))).toMap
    assert(out.keySet == Set("etl", "dash"), out.toString)
    assert(out("etl") == ((2.0, true)))
    assert(out("dash") == ((1.2, false)))
  }
}
