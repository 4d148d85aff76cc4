package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type-2 merge, dbt-snapshot `check` strategy (SURVEY.md §2 rows
  * 22-24; banking_dbt/snapshots/customers_snapshot.sql:1-11).
  *
  * Semantics per batch, keyed by `key`, versioned on `checkCols`:
  *  - new key            → insert current row [asOf, null)
  *  - changed check-cols → close old current row at asOf, insert new current
  *  - unchanged          → keep as-is
  *  - key absent from batch → keep as-is (snapshots never delete)
  *
  * The comparison is null-safe (`<=>`), matching dbt's column-compare.
  *
  * Spark shape: snapshot is split into closed history (pass-through) and
  * current rows; current ⟗ batch on key (one shuffle each side, or
  * broadcast when the batch is small); three branches unioned. No
  * row-at-a-time logic — the whole merge is declarative DataFrame algebra,
  * so it scales as an ordinary shuffle join and survives AQE skew handling.
  */
object Scd2Merge {

  /** Columns the operator maintains. */
  val EffectiveFrom = "effective_from"
  val EffectiveTo = "effective_to"

  /** @param snapshot existing SCD2 table: key ++ payload ++ effective_from ++ effective_to
    *                 (effective_to IS NULL = current). Pass an empty frame
    *                 with the right schema for the first epoch.
    * @param batch    incoming rows: key ++ payload (must be 1 row per key —
    *                 pre-dedup with Staging.dedupLatest).
    * @param key      natural-key columns.
    * @param checkCols columns whose change creates a new version.
    * @param asOf     the batch's effective timestamp.
    */
  def apply(snapshot: DataFrame, batch: DataFrame, key: Seq[String],
            checkCols: Seq[String], asOf: java.sql.Timestamp): DataFrame = {
    val payloadCols = batch.columns.filterNot(key.contains).toSeq
    val closed = snapshot.filter(col(EffectiveTo).isNotNull)
    val current = snapshot.filter(col(EffectiveTo).isNull)

    // presence flags come from non-nullable markers added before the join,
    // not from key-null checks: the join is null-safe (<=>), so a
    // legitimately-null key column must not read as "row absent"
    val b = batch.select((key ++ payloadCols).map(c => col(c).as(s"b_$c")): _*)
      .withColumn("__in_batch", lit(true))
    val joinCond = key.map(k => col(k) <=> col(s"b_$k")).reduce(_ && _)
    val joined = current.withColumn("__in_current", lit(true))
      .join(b, joinCond, "full_outer")

    val changed: Column = checkCols
      .map(c => !(col(c) <=> col(s"b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val inBatch = col("__in_batch").isNotNull
    val inCurrent = col("__in_current").isNotNull

    val keep = key ++ payloadCols

    // 1. untouched current rows: unchanged, or key absent from batch
    val unchanged = joined.filter(inCurrent && (!inBatch || !changed))
      .select(keep.map(col) :+ col(EffectiveFrom) :+ col(EffectiveTo): _*)
    // 2. superseded current rows: close the interval at asOf
    val closedNow = joined.filter(inCurrent && inBatch && changed)
      .select(keep.map(col) :+ col(EffectiveFrom) :+ lit(asOf).cast("timestamp").as(EffectiveTo): _*)
    // 3. new versions: brand-new keys, or the replacement row for changed keys
    val opened = joined.filter(inBatch && (!inCurrent || changed))
      .select(keep.map(c => col(s"b_$c").as(c))
        :+ lit(asOf).cast("timestamp").as(EffectiveFrom)
        :+ lit(null).cast("timestamp").as(EffectiveTo): _*)

    closed.select((keep :+ EffectiveFrom :+ EffectiveTo).map(col): _*)
      .unionByName(unchanged).unionByName(closedNow).unionByName(opened)
  }

  /** Empty snapshot with the right schema for a batch (first epoch). */
  def emptySnapshot(batch: DataFrame): DataFrame =
    batch
      .withColumn(EffectiveFrom, lit(null).cast("timestamp"))
      .withColumn(EffectiveTo, lit(null).cast("timestamp"))
      .limit(0)

  /** Dimension projection over a snapshot (SURVEY.md §2 row 24,
    * dim_customers.sql:3-16): derive `is_current`.
    */
  def toDim(snapshot: DataFrame): DataFrame =
    snapshot.withColumn("is_current", col(EffectiveTo).isNull)

  /** Rebuild full SCD2 history from an ordered change log in one pass —
    * the batch-analytic equivalent of running the merge once per version:
    * effective_from = version ts, effective_to = next version's ts,
    * latest version current. One window shuffle on the key; used for
    * backfills (readme.md:176-181) where per-epoch merging would be O(E)
    * passes.
    */
  def fromChangeLog(log: DataFrame, key: Seq[String], tsCol: String,
                    tieBreak: Seq[String] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = (col(tsCol).asc +: tieBreak.map(col(_).asc)): Seq[Column]
    val w = Window.partitionBy(key.map(col): _*).orderBy(ord: _*)
    log
      .withColumn("version_n", row_number().over(w))
      .withColumn(EffectiveFrom, col(tsCol))
      .withColumn(EffectiveTo, lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col(EffectiveTo).isNull)
  }
}
