package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.gold.SnapshotStore
import graft.silver.Quality

/** Streaming drift monitor: PSI of a live stream against a PERSISTED
  * reference histogram, folded one micro-batch at a time.
  *
  * The batch drift family (KS/PSI/MAD, silver.Quality) re-scans both
  * windows per evaluation; a monitor cannot. Here the reference
  * histogram ([[Quality.psiReferenceHist]] — frozen bin edges + per-bin
  * counts) is published ONCE, and each micro-batch folds its own
  * histogram delta (additive under fixed edges) into a persisted
  * current-window histogram: O(batch) work per trigger, and the PSI
  * readout joins two (groups × bins)-sized frames —
  * [[Quality.psiFromHists]] — with no corpus access at all. The same
  * exactly-once recipe as [[graft.gold.AnalystMarts]]: the state
  * snapshot's generation number is the batch ledger, so a replayed
  * micro-batch skips its fold.
  */
object DriftStream {

  /** Publish the reference histogram (frozen edges) for `ref`. Done once
    * per reference window; returns the generation.
    */
  def publishReference(ref: DataFrame, refHistPath: String, valueCol: String,
                       groupCol: String, bins: Int = 10): Long =
    SnapshotStore.publish(
      Quality.psiReferenceHist(ref, valueCol, groupCol, bins), refHistPath)

  /** Fold one micro-batch's histogram delta into the persisted
    * current-window histogram. O(batch) + O(groups × bins); idempotent
    * under replay of the same `batchId`.
    */
  def foldBatch(spark: SparkSession, batch: DataFrame, refHistPath: String,
                statePath: String, valueCol: String, groupCol: String,
                bins: Int = 10, batchId: Long = 0L): Unit = {
    val want = batchId + 1
    if (SnapshotStore.currentGen(spark, statePath).forall(_ < want)) {
      val refHist = SnapshotStore.read(spark, refHistPath)
      val delta = Quality.psiCurrentHist(batch, refHist, valueCol, groupCol,
        bins)
      val merged =
        if (SnapshotStore.exists(spark, statePath))
          SnapshotStore.read(spark, statePath)
            .unionByName(delta)
            .groupBy(org.apache.spark.sql.functions.col(groupCol),
              org.apache.spark.sql.functions.col("__bin"))
            .agg(org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("cur_n")).as("cur_n"))
        else delta
      val gen = SnapshotStore.publish(merged, statePath)
      require(gen == want,
        s"DriftStream.foldBatch: generation $gen after folding batch " +
          s"$batchId (expected $want) — single-writer contract violated")
    }
  }

  /** The drift monitor as a `foreachBatch` stream. */
  def psiStream(events: DataFrame, refHistPath: String, statePath: String,
                checkpoint: String, valueCol: String, groupCol: String,
                bins: Int = 10,
                trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldBatch(batch.sparkSession, batch.toDF(), refHistPath, statePath,
          valueCol, groupCol, bins, batchId)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Current PSI per group — two histogram-sized frames joined, no
    * corpus scan.
    */
  def readout(spark: SparkSession, refHistPath: String, statePath: String,
              groupCol: String, bins: Int = 10): DataFrame =
    Quality.psiFromHists(
      SnapshotStore.read(spark, refHistPath),
      SnapshotStore.read(spark, statePath), groupCol, bins)
}
