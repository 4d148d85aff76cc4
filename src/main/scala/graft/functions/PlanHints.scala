package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Shared plan-hint guards. */
object PlanHints {

  /** Default ceiling for a forced broadcast hint: past this, forcing the
    * build side onto the driver/executors risks OOM no matter what the
    * planner could learn at runtime, so the hint is omitted and AQE
    * decides from actual sizes.
    */
  val DefaultMaxBroadcastBytes: Long = 64L << 20

  /** Broadcast-hint `df` only while Catalyst's size estimate (plan
    * statistics: file sizes × filter selectivity — driver-side, no job)
    * stays under `maxBytes`. Estimates can overshoot on selective
    * filters; callers for whom that matters pass their own bound.
    */
  def broadcastIfSmall(df: DataFrame,
                       maxBytes: Long = DefaultMaxBroadcastBytes): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes) broadcast(df)
    else df
}
