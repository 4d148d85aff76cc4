package graft

import org.apache.spark.sql.functions._
import graft.plans.ApproxDistinctRewrite

/** The COUNT(DISTINCT) → HLL++ acceleration rule: explicit per-query
  * application, session flag gating, error bound, and the pass-through
  * contract for everything the rule must not touch.
  */
class ApproxDistinctRuleSpec extends SparkSpec {
  import spark.implicits._

  private def data = spark.range(100000L)
    .select((col("id") % 5).as("g"), (col("id") % 9173L).as("v"),
      col("id").as("uid"))

  test("accelerate: plan carries HLL++, result within 3·rsd of exact, groups intact") {
    val q = data.groupBy("g").agg(countDistinct(col("v")).as("nd"),
      count(lit(1)).as("n"))
    val acc = ApproxDistinctRewrite.accelerate(q, rsd = 0.05)
    assert(acc.queryExecution.optimizedPlan.toString
      .contains("approx_count_distinct"), acc.queryExecution.optimizedPlan)
    val exact = q.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    val approx = acc.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2)))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (g, (nd, n)) =>
      val (end, en) = exact(g)
      assert(n == en, s"non-distinct count must stay exact for $g")
      assert(math.abs(nd - end) <= 0.15 * end,
        s"group $g: approx $nd vs exact $end")
    }
  }

  test("session flag gates the rewrite; exact when off, approximate when on") {
    graft.functions.GraftExtensions.register(spark)
    val q = () => data.agg(countDistinct(col("v")).as("nd"))
    try {
      spark.conf.set("spark.graft.approxDistinct", "true")
      assert(q().queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      spark.conf.set("spark.graft.approxDistinct", "false")
      assert(!q().queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(q().head().getLong(0) == 9173L) // exact again
    } finally spark.conf.unset("spark.graft.approxDistinct")
  }

  test("pass-through: multi-arg count distinct, sum distinct, filters preserved") {
    val q = data.groupBy("g").agg(
      countDistinct(col("v"), col("g")).as("nd2"),
      sum_distinct(col("v")).as("sd"),
      countDistinct(col("v")).as("nd"))
    val acc = ApproxDistinctRewrite.accelerate(q, rsd = 0.05)
    val p = acc.queryExecution.optimizedPlan.toString
    // single-arg rewritten; the others stay EXACT (the optimizer's own
    // Expand rewrite handles them, so assert on values, not plan text)
    assert(p.contains("approx_count_distinct"), p)
    val exact = data.groupBy("g").agg(
      countDistinct(col("v"), col("g")).as("nd2"),
      sum_distinct(col("v")).as("sd"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    acc.collect().foreach { r =>
      val (end2, esd) = exact(r.getLong(0))
      assert(r.getLong(1) == end2, s"2-arg count distinct must stay exact: $r")
      assert(r.getLong(2) == esd, s"sum distinct must stay exact: $r")
    }
    // conditional-distinct shape preserved through the rewrite
    val fa = ApproxDistinctRewrite.accelerate(
      data.groupBy("g").agg(countDistinct(when(col("uid") % 2 === 0, col("v")))
        .as("nd_even")), rsd = 0.05)
    val exactEven = data.groupBy("g")
      .agg(countDistinct(when(col("uid") % 2 === 0, col("v"))).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fa.collect().foreach { r =>
      val e = exactEven(r.getLong(0))
      assert(math.abs(r.getLong(1) - e) <= 0.15 * e, r.toString)
    }
  }
}
