package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse query-history runbook readouts — the reference's ops
  * surface (readme.md:388-393: "top 10 queries by execution time", run
  * against Snowflake's QUERY_HISTORY view) re-expressed over any
  * (query id, duration, timestamp) run log: the engine's own
  * bench_latest-style records, a Spark event-log extract, or a
  * warehouse history export land in the same shape.
  *
  * Both readouts are histogram-based — a (query, duration) count table,
  * cardinality bounded by queries × distinct durations, never the run
  * count — with exact discrete percentiles by integer cross-compare
  * (TextAnalysis.percentilesExact's recipe): no global sort, no
  * per-query collect, engine-exact against a SQL oracle. Duration sums
  * go through DECIMAL so partition order cannot wiggle the totals.
  */
object QueryHistory {

  private def money(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Top-N queries by TOTAL execution time: one row per query with run
    * count, total/max seconds, exact p50/p95, and the last run
    * timestamp — ranked by total descending (query id tie-break).
    * Output: (query_id, n_runs, total_sec, p50_sec, p95_sec, max_sec,
    * last_run, rank).
    */
  def topQueries(runs: DataFrame, queryCol: String, durCol: String,
                 tsCol: String, topN: Int = 10): DataFrame = {
    val base = runs.groupBy(col(queryCol).as("query_id"))
      .agg(count(lit(1)).as("n_runs"),
        money(col(durCol)).as("total_sec"),
        max(col(durCol)).as("max_sec"),
        max(col(tsCol)).as("last_run"))
    val counts = runs.groupBy(col(queryCol).as("query_id"),
        col(durCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val pcts = cum
      .join(broadcast(base.select(col("query_id"), col("n_runs"))),
        Seq("query_id"))
      .select(col("query_id"), col("__v"), col("__cum"), col("n_runs"),
        explode(array(lit(50), lit(95))).as("pct"))
      .filter(col("__cum") * 100 >= col("pct").cast("long") * col("n_runs"))
      .groupBy(col("query_id"), col("pct"))
      .agg(min(col("__v")).as("__val"))
      .groupBy(col("query_id"))
      .pivot("pct", Seq(50, 95))
      .agg(first(col("__val")))
      .withColumnRenamed("50", "p50_sec")
      .withColumnRenamed("95", "p95_sec")
    val rw = Window.orderBy(col("total_sec").desc, col("query_id").asc)
    base.join(pcts, Seq("query_id"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= topN)
      .select(col("query_id"), col("n_runs"), col("total_sec"),
        col("p50_sec"), col("p95_sec"), col("max_sec"), col("last_run"),
        col("rank").cast("int").as("rank"))
  }

  /** Regression screen: per query, the exact MEDIAN duration before vs
    * after `cutoff`, the after/before ratio, and a flag at
    * `ratioThreshold` — "what got slower since the release" without
    * eyeballing dashboards. Queries present on only one side are
    * excluded (no baseline to regress from). Output: (query_id,
    * p50_before, p50_after, ratio, regressed).
    *
    * The global top-N rank window in [[topQueries]] and the per-side
    * median here both run over the bounded histogram, so the readout
    * costs one scan + two small aggregates at any log size.
    */
  def regressions(runs: DataFrame, queryCol: String, durCol: String,
                  tsCol: String, cutoff: Column,
                  ratioThreshold: Double = 1.5): DataFrame = {
    val epoch = runs.select(col(queryCol).as("query_id"),
      col(durCol).as("__v"),
      when(col(tsCol) < cutoff, lit("before")).otherwise(lit("after"))
        .as("__ep"))
    val counts = epoch.groupBy(col("query_id"), col("__ep"), col("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("query_id"), col("__ep"))
      .orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = epoch.groupBy(col("query_id"), col("__ep"))
      .agg(count(lit(1)).as("__n"))
    val med = counts.withColumn("__cum", sum(col("__c")).over(w))
      .join(broadcast(totals), Seq("query_id", "__ep"))
      .filter(col("__cum") * 2 >= col("__n"))
      .groupBy(col("query_id"), col("__ep"))
      .agg(min(col("__v")).as("__med"))
    val wide = med.groupBy(col("query_id"))
      .pivot("__ep", Seq("before", "after"))
      .agg(first(col("__med")))
    // floor-based 6-decimal round — reproducible across engines (the
    // repo-wide sumMoney/round6 discipline; bare round() half-modes differ)
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    wide.filter(col("before").isNotNull && col("after").isNotNull)
      .select(col("query_id"),
        col("before").as("p50_before"), col("after").as("p50_after"),
        round6(col("after") / col("before")).as("ratio"))
      .withColumn("regressed", col("ratio") >= ratioThreshold)
  }
}
