package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-embedded exactly-once ledger for SnapshotStore-backed
  * incremental sinks (AnalystMarts, DistinctMart, GapStream,
  * MomentsStream, DriftStream, scd2LogStream).
  *
  * Round 8 ledgered these sinks on GENERATION PARITY (batch b commits
  * generation b+1) — which desyncs the moment anything else publishes a
  * generation on the same path: an `Optimize.maybeCompact` rewrite, an
  * erasure correction, a manual repair. That is the same silent-skip
  * data-loss class the coordinator stream fixed with its `@sys.batch`
  * marker; here the marker is a constant `__last_batch` column stamped
  * on the state rows themselves, so ledger and state commit in ONE
  * atomic publish (a sidecar file could tear from the state between
  * crashes). Writers check [[applied]] and publish [[stamp]]ed frames;
  * every reader goes through [[readState]], which strips the column —
  * readouts and merges never see it.
  *
  * A compaction that republishes identical contents carries the column
  * (it is contents), so maintenance generations no longer break replay
  * skipping — the Optimize cadence now composes with EVERY sink, not
  * only the merge-idempotent ones. States written by pre-ledger code
  * (no column) report -1: replays refold once across the upgrade
  * boundary, never skip fresh batches.
  */
object StateLedger {

  val Col = "__last_batch"

  /** Highest batch id folded into the state at `path`; -1 when the
    * state predates the ledger (or is empty — zero rows cannot carry a
    * column); None when nothing is published.
    */
  def lastBatch(spark: SparkSession, path: String): Option[Long] =
    if (!SnapshotStore.exists(spark, path)) None
    else {
      val df = SnapshotStore.read(spark, path)
      if (!df.columns.contains(Col)) Some(-1L)
      else {
        val r = df.select(max(col(Col))).head()
        Some(if (r.isNullAt(0)) -1L else r.getLong(0))
      }
    }

  /** Replay check: batch `batchId`'s contribution is already in the
    * published state.
    */
  def applied(spark: SparkSession, path: String, batchId: Long): Boolean =
    lastBatch(spark, path).exists(_ >= batchId)

  /** Stamp the ledger column onto a state frame about to publish.
    * Callers fold strictly increasing batch ids (the [[applied]] gate),
    * so the constant stamp is the running maximum.
    */
  def stamp(df: DataFrame, batchId: Long): DataFrame =
    df.withColumn(Col, lit(batchId))

  /** The state without its ledger column — what merges and readouts
    * consume.
    */
  def strip(df: DataFrame): DataFrame =
    if (df.columns.contains(Col)) df.drop(Col) else df

  /** Read + strip in one step. */
  def readState(spark: SparkSession, path: String): DataFrame =
    strip(SnapshotStore.read(spark, path))
}
