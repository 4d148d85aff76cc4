package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Record linkage: blocked fuzzy self-join on string similarity — the
  * entity-resolution primitive (near-identical customer names, merged
  * account records, vendor dedup).
  *
  * The all-pairs edit-distance join is O(n²·len²) and never viable at
  * scale; the standard shape is block-then-verify: candidates are
  * generated only WITHIN user-chosen blocks (a region, a zip prefix, a
  * phonetic key), then verified with the exact distance. Blocking is
  * part of the operator's CONTRACT, not a silent approximation — pairs
  * across blocks are out of scope by definition, which is what makes
  * the result oracle-checkable.
  *
  * Scale shape: one shuffle on the block key; within each block the
  * pair space is pruned by the length-difference bound (|len(a)−len(b)|
  * > maxDist ⇒ levenshtein > maxDist — a proven lossless filter) BEFORE
  * any distance is computed, and the O(len²) verify runs only on
  * survivors. Block granularity is the user's skew lever: pair cost is
  * Σ|block|², so blocks should be chosen ~thousands of rows, the same
  * sizing discipline as [[Dedup]]'s LSH buckets.
  */
object Linkage {

  /** All within-block pairs (id_a < id_b) whose `strCol` values are
    * within `maxDist` Levenshtein edits.
    */
  def fuzzyPairsBlocked(df: DataFrame, idCol: String, strCol: String,
                        blockCols: Seq[String], maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(blockCols.nonEmpty,
      "blockCols must be non-empty: unblocked fuzzy join is all-pairs")
    val a = df.select(blockCols.map(col) :+ col(idCol).as("id_a")
      :+ col(strCol).as("s_a"): _*)
    val b = df.select(blockCols.map(col) :+ col(idCol).as("id_b")
      :+ col(strCol).as("s_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      // thresholded (banded) Levenshtein: O(len·maxDist) per pair instead
      // of O(len²), returning -1 as soon as the band exceeds the bound —
      // the verify step is the hot loop, so the band matters at scale
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
