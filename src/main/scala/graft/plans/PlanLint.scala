package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Scale-antipattern linter over PHYSICAL plans — the PlanSpec guard
  * rails, packaged as a runtime guardrail a pipeline can enforce on its
  * own queries before launching them against 100 TB:
  *
  *  - `cartesian_product` — quadratic, unrunnable at scale;
  *  - `broadcast_nested_loop` — the planner's fallback when a join has
  *    no equi key (what [[RangeJoinRewrite]] exists to remove); fine
  *    for constant-sized sides, fatal for data-sized ones, so it is
  *    reported, not silently accepted;
  *  - `single_partition_exchange` — a global `Window.orderBy` or
  *    repartition(1) funneling the whole dataset through one task.
  *
  * Detection walks the executed-plan STRING rather than node classes:
  * AQE wraps subtrees in AdaptiveSparkPlan whose children change class
  * across Spark versions, while the rendered operator names are the
  * stable public surface (`explain` output) — and the same names appear
  * whether or not AQE has re-planned. Inspection only: no job runs.
  *
  * The rules are ADVISORY by design — a hit demands a justification,
  * not necessarily a fix. Two benign classes recur (see PLANLINT.md for
  * the full-registry audit): `single_partition_exchange` is also the
  * final stage of any global scalar aggregate (input = one partial row
  * per partition, not the dataset) and of windows over value-domain-
  * sized frames; `broadcast_nested_loop` is also how a
  * `crossJoin(broadcast(<1-row aggregate>))` plans. `assertScalable`'s
  * `allow` parameter is the mechanism for recording such justifications
  * in code.
  */
object PlanLint {

  val Rules: Seq[(String, String)] = Seq(
    ("cartesian_product", "CartesianProduct"),
    ("broadcast_nested_loop", "BroadcastNestedLoopJoin"),
    ("single_partition_exchange", "Exchange SinglePartition"))

  /** (rule, n_hits) for every rule — zeros included, so the report is
    * fixed-shape and a clean plan is visibly clean.
    */
  def counts(df: DataFrame): Seq[(String, Long)] = {
    val plan = df.queryExecution.executedPlan.toString
    Rules.map { case (rule, needle) =>
      rule -> plan.sliding(needle.length).count(_ == needle).toLong
    }
  }

  /** The report as a DataFrame: (query_label, rule, n_hits). */
  def report(spark: SparkSession,
             labeled: Seq[(String, DataFrame)]): DataFrame = {
    val rows = labeled.flatMap { case (label, df) =>
      counts(df).map { case (rule, n) => Row(label, rule, n) }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("query_label", StringType, nullable = false),
        StructField("rule", StringType, nullable = false),
        StructField("n_hits", LongType, nullable = false))))
  }

  /** Throw (listing every violated rule) unless the plan is clean;
    * `allow` whitelists rules whose hits are intentional — q219's
    * output-sized grid BNLJ, a 1-row × 1-row aggregate cross.
    */
  def assertScalable(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = counts(df).filter { case (rule, n) =>
      n > 0 && !allow.contains(rule) }
    require(bad.isEmpty,
      s"PlanLint: scale antipatterns in plan: ${bad.map { case (r, n) =>
        s"$r×$n" }.mkString(", ")} — fix the plan or allow() explicitly")
  }
}
