package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in "query acceleration" optimizer rule: rewrite
  * `COUNT(DISTINCT x)` to the mergeable HyperLogLog++ aggregate when
  * `spark.graft.approxDistinct=true` — the engine's analog of the
  * warehouse acceleration the reference leans on for its analyst p95
  * (readme.md:153-155, Snowflake Query Acceleration 8 s → 1.2 s): a
  * sketch turns the exact-distinct shuffle of every (group, value) pair
  * into a map-side-mergeable fixed-size state, which is what makes
  * distinct counting flat at 100 TB.
  *
  * Strictly OPT-IN because it trades exactness for speed (default rsd
  * 5%, tunable via `spark.graft.approxDistinct.rsd`): the flag is read
  * per optimization, so a session can accelerate one dashboard query
  * and leave the ledger queries exact. Rewrites only single-argument
  * COUNT(DISTINCT x) — multi-argument forms and the other distinct
  * aggregates (SUM DISTINCT has no sketch) pass through untouched, as
  * does everything when the flag is unset. The aggregate's filter
  * clause and result id are preserved, so downstream references bind
  * unchanged.
  *
  * Wire-up: injected by [[graft.functions.GraftExtensions]] (config
  * `spark.sql.extensions`), added to `spark.experimental
  * .extraOptimizations` by `GraftExtensions.register`, or applied to a
  * single plan via [[ApproxDistinctRewrite.accelerate]].
  */
case class ApproxDistinctRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxDistinct").contains("true")
  // malformed rsd must not break the session's queries: fall back
  private def rsd: Double =
    spark.conf.getOption("spark.graft.approxDistinct.rsd")
      .flatMap(v => scala.util.Try(v.toDouble).toOption).getOrElse(0.05)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else ApproxDistinctRewrite.rewrite(plan, rsd)
}

object ApproxDistinctRewrite {

  /** The unconditional rewrite (flag handling lives in the rule). */
  def rewrite(plan: LogicalPlan, rsd: Double): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, _, _)
              if children.size == 1 =>
            AggregateExpression(
              HyperLogLogPlusPlus(children.head, relativeSD = rsd),
              ae.mode, isDistinct = false, ae.filter, ae.resultId)
        }
    }

  /** Apply the acceleration to ONE DataFrame explicitly — no session
    * config involved, so surrounding queries stay exact.
    */
  def accelerate(df: org.apache.spark.sql.DataFrame,
                 rsd: Double = 0.05): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(
      df.sparkSession, rewrite(df.queryExecution.analyzed, rsd))
}
