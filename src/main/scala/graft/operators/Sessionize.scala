package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: group a key's events into sessions
  * separated by inactivity gaps — the batch counterpart of the streaming
  * `session_window` aggregation (q13), and the classic clickstream /
  * user-journey operator the reference's analyst layer implies
  * (readme.md:144-155 "analyst query" tier) but never ships.
  *
  * A new session starts at a key's first event and whenever the time since
  * the key's previous event exceeds `gapSeconds` (strictly greater —
  * an event exactly `gapSeconds` later still extends the session, matching
  * Structured Streaming's `session_window` inclusive-gap semantics).
  *
  * Scale shape: ONE shuffle on the key (the window partition), per-key
  * in-partition sort, two window passes over the same partitioning
  * (lag → boundary flag → running sum); Catalyst fuses them into a single
  * Window exec with one sort. No global sort, no driver state. Skew bound:
  * a hot key sorts only its own events — the same bound any per-key window
  * carries; keys are users/accounts, so per-key cardinality is naturally
  * bounded at 100 TB (a key with millions of events is an upstream bug, not
  * a plan hazard).
  */
object Sessionize {

  /** Annotate each row with `session_seq` (1-based index of the session
    * within its key) and `session_event_seq` (1-based index of the event
    * within its session). Ordering within a key is (tsCol, tieCols...) —
    * pass a unique tie-break column to make the assignment total and
    * engine-reproducible when timestamps collide.
    */
  def assign(df: DataFrame, keyCol: String, tsCol: String,
             gapSeconds: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be > 0, got $gapSeconds")
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // seconds since the key's previous event; first event → null
    val gap = unix_timestamp(col(tsCol)) -
      lag(unix_timestamp(col(tsCol)), 1).over(w)
    val isNew = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("__new", isNew)
      .withColumn("session_seq", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_event_seq", row_number().over(
        Window.partitionBy(col(keyCol), col("session_seq")).orderBy(order: _*)).cast("long"))
      .drop("__new")
  }

  /** Gaps-and-islands over a per-key DATE activity stream: consecutive
    * activity runs ("islands") where successive dates are at most
    * `maxGapDays` apart, summarized one row per island with the dormancy
    * gap that preceded it — the account-reactivation / churn-detection
    * readout of the reference's analyst tier (which days-apart SQL can
    * express but its dashboards never materialize). Ties on the same
    * date are safe: tied rows can only extend an island, never start
    * one, so the summary is total-order independent.
    *
    * Output per (key, island_seq): start_date, end_date, n_events,
    * span_days (inclusive), gap_before_days (days since the previous
    * island's end; NULL for the key's first island).
    *
    * Scale: ONE shuffle on the key shared by both window passes and the
    * rollup; the trailing gap_before window runs on the already-reduced
    * island frame (rows = islands, not events). Same skew bound as
    * [[assign]] — a key sorts only its own activity dates.
    */
  def islands(df: DataFrame, keyCol: String, dateCol: String,
              maxGapDays: Int): DataFrame = {
    require(maxGapDays > 0, s"maxGapDays must be > 0, got $maxGapDays")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol).asc)
    val prev = lag(col(dateCol), 1).over(w)
    val brk = when(prev.isNull || datediff(col(dateCol), prev) > maxGapDays, 1L)
      .otherwise(0L)
    val assigned = df.select(col(keyCol), col(dateCol))
      .withColumn("__brk", brk)
      .withColumn("island_seq", sum(col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islandsDf = assigned.groupBy(col(keyCol), col("island_seq"))
      .agg(min(col(dateCol)).as("start_date"),
        max(col(dateCol)).as("end_date"),
        count(lit(1)).as("n_events"),
        (datediff(max(col(dateCol)), min(col(dateCol))) + 1).as("span_days"))
    val wi = Window.partitionBy(col(keyCol)).orderBy(col("island_seq").asc)
    islandsDf.withColumn("gap_before_days",
      datediff(col("start_date"), lag(col("end_date"), 1).over(wi)))
  }

  /** Per-session rollup: event count, span, bounds. One additional hash
    * aggregation over the assigned frame (map-side combinable).
    */
  def summarize(df: DataFrame, keyCol: String, tsCol: String,
                gapSeconds: Long, tieCols: Seq[String] = Nil): DataFrame =
    assign(df, keyCol, tsCol, gapSeconds, tieCols)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (unix_timestamp(max(col(tsCol))) - unix_timestamp(min(col(tsCol))))
          .as("duration_sec"))

  /** First-order Markov transition matrix over an event stream: for every
    * ordered pair of CONSECUTIVE event types within a key, the transition
    * count `n`, the from-state total `n_from`, and the conditional
    * probability `p = P(to | from)` — the user-journey readout behind
    * "what do users do right after X" and the baseline model for
    * next-event prediction / anomalous-flow detection.
    *
    * Ordering within a key is (tsCol, tieCols...) — pass a unique
    * tie-break so consecutive-pair extraction is total and
    * engine-reproducible under timestamp collisions. `p` rounds to 6
    * decimals (one IEEE division) so the matrix is engine-exact.
    *
    * Scale shape: ONE shuffle on the key for the lag window (in-partition
    * sort only), then a map-side-combinable (from, to) count aggregation;
    * the `n_from` marginal is a window over the PAIR frame, whose
    * cardinality is |types|² — the matrix, not the stream. Nothing
    * event-volume-sized moves after the first shuffle.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, tsCol: String,
                       typeCol: String,
                       tieCols: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = col(tsCol) +: tieCols.map(col)
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val pairs = df
      .withColumn("__from", lag(col(typeCol), 1).over(w))
      .filter(col("__from").isNotNull)
      .groupBy(col("__from").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).cast("long").as("n"))
    val wf = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("n_from", sum(col("n")).over(wf))
      .withColumn("p",
        round(col("n").cast("double") / col("n_from").cast("double"), 6))
  }
}
