package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** Composed training-data cleaning pipeline over a document corpus:
  * exact dedup (keep first) → quality features → threshold filter →
  * language tagging. Each stage is one of the engine's operators; the
  * composition stays a single declarative plan, so Catalyst fuses the
  * per-row stages into one scan pass and the only shuffle is the dedup
  * window.
  *
  * This is the shape a 100 TB pre-training corpus pass takes: dedup
  * first (cuts volume before feature compute), then map-only scoring
  * and filtering.
  */
object CorpusPipeline {

  case class Thresholds(minTokens: Int = 30, maxStopwordRatio: Double = 0.9)

  def clean(docs: DataFrame, idCol: String, textCol: String,
            t: Thresholds = Thresholds()): DataFrame = {
    val canonical = Dedup.exactKeepFirst(docs, idCol, textCol)
    val scored = TextAnalysis.quality(canonical, textCol)
      .filter(col("n_tokens") >= t.minTokens &&
        col("stopword_ratio") <= t.maxStopwordRatio)
    TextAnalysis.langId(scored, textCol)
  }

  /** Streaming corpus assembly: documents arrive as a stream, pass the
    * quality gate map-side, and land in a BaseDelta table KEYED BY CONTENT
    * HASH — so exact duplicates collapse across micro-batches and across
    * the whole history of the stream, not just within a batch. First-seen
    * wins (max of −id = min id — the same canonical choice as
    * `Dedup.exactKeepFirst`), so replays and re-crawls are no-ops.
    * Per-trigger cost is O(batch) (BaseDelta append); the dedup itself is
    * merge-on-read + periodic compaction, never a stream-wide state store.
    */
  def streamAssemble(docs: DataFrame, sinkPath: String, checkpoint: String,
                     idCol: String, textCol: String,
                     t: Thresholds = Thresholds(), maxDeltas: Int = 16,
                     trigger: Trigger = Trigger.ProcessingTime("1 minute")): StreamingQuery = {
    val gated = TextAnalysis.quality(docs, textCol)
      .filter(col("n_tokens") >= t.minTokens &&
        col("stopword_ratio") <= t.maxStopwordRatio)
      .withColumn("content_hash", md5(Dedup.normText(col(textCol))))
      .withColumn("__first", -col(idCol))
    val table = graft.gold.BaseDelta.Table(sinkPath,
      keys = Seq("content_hash"), orderCols = Seq("__first"))
    gated.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.gold.BaseDelta.appendAndMaybeCompact(
          batch.sparkSession, table, batch.toDF(), batchId, maxDeltas)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
  }

  /** Read the streaming-assembled corpus back (one row per distinct
    * content, bookkeeping columns dropped).
    */
  def readAssembled(spark: org.apache.spark.sql.SparkSession, sinkPath: String): DataFrame =
    graft.gold.BaseDelta.read(spark,
        graft.gold.BaseDelta.Table(sinkPath, Seq("content_hash"), Seq("__first")))
      .drop("__first")

  /** Per-document disposition ledger for the assembly chain (the audit
    * artifact data governance asks for: every input document gets exactly
    * ONE disposition explaining why it is or isn't in the training set):
    *
    *   exact_dup    — not the canonical copy under exact dedup
    *   contaminated — canonical, but shares a word k-gram with `bench`
    *   rebalanced   — clean, but dropped by the temperature source mix
    *   kept         — survived every stage (= the q82 assembly output)
    *
    * Stages are the SAME operators the assembly runs (exactKeepFirst →
    * bloomDecontaminate → temperatureSample, same salt), so
    * `ledger.filter('kept')` is row-identical to the pipeline output by
    * construction. Scale shape: each stage reduces to an id-only marker
    * frame before the three key-joins back onto the corpus — text never
    * rides the ledger joins.
    */
  def dispositionLedger(corpus: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, sourceCol: String, k: Int = 5,
                        salt: String = "temp"): DataFrame = {
    val deduped = Dedup.exactKeepFirst(corpus, idCol, textCol)
    val clean = TextAnalysis.bloomDecontaminate(deduped, bench, idCol, textCol, k)
    val balanced = Sampling.temperatureSample(clean, idCol, sourceCol, salt)
    val canonIds = deduped.select(col(idCol)).withColumn("__canon", lit(true))
    val cleanIds = clean.select(col(idCol)).withColumn("__clean", lit(true))
    val keptIds = balanced.select(col(idCol)).withColumn("__kept", lit(true))
    corpus.select(col(idCol), col(sourceCol))
      .join(canonIds, Seq(idCol), "left")
      .join(cleanIds, Seq(idCol), "left")
      .join(keptIds, Seq(idCol), "left")
      .withColumn("disposition",
        when(col("__canon").isNull, "exact_dup")
          .when(col("__clean").isNull, "contaminated")
          .when(col("__kept").isNull, "rebalanced")
          .otherwise("kept"))
      .drop("__canon", "__clean", "__kept")
  }
}
