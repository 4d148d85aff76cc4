package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the classic product-analytics operator over
  * an event stream (reference readme's "analyst query" tier): per key,
  * the earliest time each stage was reached IN ORDER, where stage i must
  * occur STRICTLY after the time stage i−1 was reached (a purchase
  * logged before the user's first view doesn't count as conversion).
  *
  * Scale shape: per stage, one filtered scan of the events (predicate
  * pushed to parquet), one hash join against the previous stage's
  * per-key frame (key-sized, shrinking monotonically), one min
  * aggregation. No windows, no per-key event sorting, no state — stage
  * count is the only multiplier, and each stage's join is on the key.
  *
  * Timestamps compare at microsecond precision (`unix_micros`) — the
  * exact unit Spark stores, so the DuckDB oracle (`epoch_us`) agrees on
  * every strict-inequality edge case.
  */
object Funnel {

  /** Per key: `t1..tN` (micros since epoch, null once the funnel broke)
    * and `stage_reached` (1-based count of stages completed in order).
    * Keys that never reached stage 1 are absent.
    */
  def funnel(df: DataFrame, keyCol: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val us = unix_micros(col(tsCol))
    val first = df.filter(col(typeCol) === stages.head)
      .groupBy(col(keyCol)).agg(min(us).as("t1"))
    val all = stages.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (stage, i)) =>
        val next = df.filter(col(typeCol) === stage)
          .join(prev.select(col(keyCol), col(s"t$i")), Seq(keyCol))
          .filter(us > col(s"t$i"))
          .groupBy(col(keyCol)).agg(min(us).as(s"t${i + 1}"))
        prev.join(next, Seq(keyCol), "left")
    }
    val reached = stages.indices.drop(1).foldLeft(lit(1)) {
      case (acc, i) => when(col(s"t${i + 1}").isNotNull, i + 1).otherwise(acc)
    }
    all.withColumn("stage_reached", reached.cast("int"))
  }
}
