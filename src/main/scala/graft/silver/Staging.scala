package graft.silver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver-layer staging operators (SURVEY.md §2 rows 12-18).
  *
  * The reference dedups replayed CDC events latest-wins with
  * `row_number() OVER (PARTITION BY v:id ORDER BY v:created_at DESC)` then
  * `WHERE rn = 1` (stg_customers.sql:11-14,26; stg_accounts.sql:12-15,28).
  *
  * Scale notes: the window is a single hash-partition shuffle on the key —
  * the minimum possible for ordered latest-wins. Tie-break columns are
  * mandatory (CDC replays produce identical version timestamps; without a
  * total order the result is nondeterministic across runs/partitionings).
  */
object Staging {

  /** Latest-wins dedup: keep exactly one row per `keys`, the maximum by
    * `ordering` (e.g. version timestamp desc, then a unique id desc as
    * tie-break).
    */
  def dedupLatest(df: DataFrame, keys: Seq[String], ordering: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Hash-aggregate latest-wins dedup: `max_by(payload, ordering-struct)`
    * per key. Same result as `dedupLatest` when the ordering is
    * "greatest (orderCols) lexicographically wins", but as a hash
    * aggregation: partial (map-side) combine, NO sort — at scale this
    * replaces the window's sort-shuffle with a combiner shuffle whose
    * volume is one row per key per map partition. Prefer this form in
    * high-volume paths; the window form remains for arbitrary mixed-order
    * semantics.
    */
  def dedupLatestByMax(df: DataFrame, keys: Seq[String],
                       orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    val winner = max_by(
      struct(payload.map(col): _*),
      struct(orderCols.map(col): _*))
    df.groupBy(keys.map(col): _*)
      .agg(winner.as("__w"))
      .select(keys.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Typed extraction with cast-error quarantine (SURVEY.md §2 row R1:
    * "type casting errors logged and quarantined", readme.md:240-247).
    * Applies `casts` (column → target type); a row is quarantined when any
    * source value is present but its cast comes back null (the `try_cast`
    * failure signature). Returns (clean-with-casts, quarantined-originals).
    */
  def castOrQuarantine(df: DataFrame,
                       casts: Map[String, String]): (DataFrame, DataFrame) = {
    // try_cast, not cast: Spark 4 runs ANSI mode by default, where a
    // malformed cast throws instead of returning null
    val bad = casts.map { case (c, t) =>
      col(c).isNotNull && col(c).try_cast(t).isNull
    }.reduce(_ || _)
    // split on the ORIGINAL columns first, then apply the casts — casting
    // before filtering would make the predicate see the replaced columns
    val clean = casts.foldLeft(df.filter(!coalesce(bad, lit(false)))) {
      case (d, (c, t)) => d.withColumn(c, col(c).try_cast(t))
    }
    (clean, df.filter(coalesce(bad, lit(false))))
  }

  /** DECIMAL money-fidelity staging (reference postgres/schema.sql:17,27:
    * `balance/amount NUMERIC(18,2)`): the CDC wire format serializes money
    * as IEEE double (`decimal.handling.mode=double`,
    * generate_and_post_connector.py:29), which is exact for 2-dp values
    * but makes every downstream SUM order-dependent and drift-prone.
    * This restores the exact cents type at the silver boundary — amount
    * columns re-type to DECIMAL(18,2) (the source schema's type), rate
    * columns (discount/tax fractions) to DECIMAL(4,2) — so every
    * downstream join, per-line rounding step, and aggregation is
    * penny-exact and order-independent all the way to the fact table.
    *
    * Map-only (a cast per column, codegen'd, no shuffle). Overflow fails
    * loudly under Spark 4's ANSI mode instead of truncating — a value
    * that doesn't fit NUMERIC(18,2) is upstream corruption, not data.
    * For streams where malformed values are expected, run
    * [[castOrQuarantine]] with decimal targets instead.
    */
  def moneyStaging(df: DataFrame, amountCols: Seq[String],
                   rateCols: Seq[String] = Nil): DataFrame = {
    val a = amountCols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c).cast("decimal(18,2)")))
    rateCols.foldLeft(a)((d, c) => d.withColumn(c, col(c).cast("decimal(4,2)")))
  }

  /** Point-in-time snapshot from a CDC change log: the table state as of
    * `asOf` — latest surviving row per key among events with
    * `tsCol <= asOf`, with keys whose latest event is a delete
    * (`opCol == deleteOp`) absent. The batch counterpart of
    * [[graft.gold.BaseDelta.readAt]] when all you have is the raw
    * envelope log (the reference reconstructs this state implicitly by
    * replaying Debezium topics; here it is one declarative operator).
    *
    * Scale: the `asOf` predicate is pushed into the scan (Parquet
    * row-group stats prune whole date partitions of the log), then one
    * key-partition window — the same single-shuffle shape as
    * [[dedupLatest]]. The delete filter runs AFTER latest-wins election,
    * so a delete correctly shadows earlier upserts of its key.
    */
  def snapshotAsOf(changeLog: DataFrame, keys: Seq[String],
                   ordering: Seq[org.apache.spark.sql.Column],
                   tsCol: String, asOf: org.apache.spark.sql.Column,
                   opCol: String = "op", deleteOp: String = "d"): DataFrame =
    dedupLatest(changeLog.filter(col(tsCol) <= asOf), keys, ordering)
      .filter(col(opCol) =!= deleteOp)

  /** The reference's high-watermark incremental filter
    * (readme.md:144-151): keep only rows strictly newer than the sink's
    * current max. Batch form of a streaming watermark; the sink-side max is
    * read once (tiny agg) and pushed into the scan as a literal filter so
    * Parquet row-group stats prune (SURVEY.md §2 row 20).
    */
  def newerThanWatermark(incoming: DataFrame, existing: DataFrame, tsCol: String): DataFrame = {
    val hw = existing.agg(max(col(tsCol))).head().get(0)
    if (hw == null) incoming
    else incoming.filter(col(tsCol) > lit(hw))
  }
}
