package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

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
}
