package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-shard assembly: assign documents to
  * fixed-token-budget packs (the "pack short documents into 4k-token
  * training sequences" step of a pre-training pipeline).
  *
  * Semantics: greedy CONTIGUOUS packing — documents are sharded by key,
  * ordered within the shard, and cut into bins where each bin's preceding
  * token total spans one `budget` window (`bin = pre_total ÷ budget`). A
  * document whose tokens straddle a boundary belongs to the bin its first
  * token falls in; real packers split or pad at that point, which is a
  * tokenizer-side concern — the assignment here is the distributable part.
  *
  * Scale shape: ONE window sort per shard, and shards are independent, so
  * parallelism = nShards regardless of corpus size; no global ordering
  * bottleneck (a single global cumulative sum would funnel the corpus
  * through one reducer — the classic anti-pattern this avoids by design).
  * Determinism: shard and order are pure functions of the key, so pack
  * membership is reproducible across runs and engines.
  */
object Packing {

  /** Deterministic shard of a document id: first 32 bits of md5 of the
    * id's string form (salted so it can't correlate with Sampling's
    * hash decisions over the same key), mod `nShards`. Works for ANY id
    * type — a raw `pmod(id, n)` would throw on string ids under ANSI mode
    * (or worse, null-cast them all into one shard) and inherits whatever
    * distribution the id space has; the hash spreads arbitrary keys
    * uniformly. md5 is a mixer here, not security.
    */
  def shardOf(id: Column, nShards: Int,
              salt: String = "pack-shard"): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long"), lit(nShards.toLong))

  /** Adds `shard`, `pre_tokens` (running total before this doc) and
    * `bin` (pack index within the shard) to `df`.
    */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    budget: Int, nShards: Int = 32): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("pre_tokens",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("pre_tokens") / lit(budget)).cast("long"))
  }

  /** Concat-and-chunk sequence packing — the pretraining data layout
    * that turns a variable-length document corpus into fixed
    * `capacity`-token context windows with ZERO padding waste: within
    * each shard ([[Sampling.trainingOrder]]'s salted-hash coordinate system),
    * documents concatenate in the deterministic pseudo-random order and
    * the token stream is cut every `capacity` tokens; a document
    * straddling a cut contributes one SEGMENT row per chunk it touches.
    *
    * Output: one row per (document, chunk) segment —
    * `(key, shard, pos, chunk, chunk_offset, seg_start, seg_len)`,
    * where `chunk` is the GLOBAL chunk ordinal (over the shard-
    * concatenated stream), `chunk_offset` the segment's first token
    * position within its chunk, `seg_start` its first token within the
    * document. Every chunk except each shard's last is exactly
    * `capacity` tokens of real data — the attention-mask boundaries are
    * the segment rows themselves.
    *
    * Scale: one shuffle (the shard window — each shard sorts ~1/nShards
    * of the corpus, the same no-global-sort shape as [[Sampling.trainingOrder]]);
    * the segment explode adds at most `ceil(len/capacity)` rows per
    * document. All coordinates are pure functions of (key, token count),
    * so the layout reproduces bit-identically across runs, retries, and
    * engines. Zero-length documents are dropped (they occupy no tokens).
    */
  def packSegments(df: DataFrame, keyCol: String, tokenLenCol: String,
                    capacity: Int, nShards: Int,
                    salt: String = "pack"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = shardOf(col(keyCol), nShards, salt + "-shard")
    val w = Window.partitionBy(col("shard"))
      .orderBy(Sampling.hashFraction(col(keyCol), salt + "-pos").asc, col(keyCol).asc)
    val cap = lit(capacity.toLong)
    df.filter(col(tokenLenCol) > 0)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("__end", sum(col(tokenLenCol).cast("long")).over(w))
      .withColumn("__start", col("__end") - col(tokenLenCol).cast("long"))
      // chunks covered: floor(start/cap) .. floor((end-1)/cap), inclusive
      // (len >= 1 makes the range non-empty); token totals stay far under
      // 2^53, so the floor-div through double is exact
      .withColumn("chunk", explode(sequence(
        floor(col("__start") / cap).cast("long"),
        floor((col("__end") - 1) / cap).cast("long"))))
      .withColumn("__cstart", col("chunk") * cap)
      .select(col(keyCol), col("shard"), col("pos"), col("chunk"),
        greatest(col("__start") - col("__cstart"), lit(0L)).as("chunk_offset"),
        greatest(col("__cstart") - col("__start"), lit(0L)).as("seg_start"),
        (least(col("__end"), col("__cstart") + cap) -
          greatest(col("__start"), col("__cstart"))).as("seg_len"))
  }

  /** Boundary-respecting greedy packing (next-fit, NO document splits):
    * the layout used when a document must never straddle a context
    * window (no cross-document attention contamination without masks).
    * Within each shard ([[Sampling.trainingOrder]]'s coordinate system) documents
    * are taken in the deterministic order and appended to the current
    * chunk while they fit; a document that would overflow STARTS a new
    * chunk. Exactly one row per document —
    * `(key, shard, pos, chunk, chunk_offset, tok_len)` — and waste is
    * bounded per chunk by the shard's longest document.
    *
    * Next-fit's running fill is history-dependent, so this is the
    * documented mapPartitions-as-last-resort case: no window/cumsum
    * expresses it. The scan is still scale-shaped — one narrow
    * projection shuffles on shard, each task streams its shards'
    * sorted rows with O(1) state, shard-parallel like every other
    * coordinate op here. Documents longer than `capacity` fail loudly
    * (pre-chunk them via TextAnalysis.chunk or use [[packSegments]],
    * which splits); zero-length documents are dropped.
    */
  def packNoSplit(df: DataFrame, keyCol: String, tokenLenCol: String,
                        capacity: Int, nShards: Int,
                        salt: String = "pack"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = shardOf(col(keyCol), nShards, salt + "-shard")
    val w = Window.partitionBy(col("shard"))
      .orderBy(Sampling.hashFraction(col(keyCol), salt + "-pos").asc, col(keyCol).asc)
    val keyField = df.schema(keyCol)
    val outSchema = StructType(Seq(keyField,
      StructField("shard", LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("chunk", LongType, nullable = false),
      StructField("chunk_offset", LongType, nullable = false),
      StructField("tok_len", LongType, nullable = false)))
    val cap = capacity.toLong
    df.filter(col(tokenLenCol) > 0)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(keyCol), col("shard"), col("pos"),
        col(tokenLenCol).cast("long").as("__len"))
      // whole shards per task, rows pre-sorted: the scan below is a
      // straight iterator pass with O(1) state, resetting on shard change
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .mapPartitions { rows =>
        var curShard = -1L
        var chunk = -1L
        var fill = cap // forces a fresh chunk on the first row
        rows.map { r =>
          val sh = r.getLong(1)
          val len = r.getLong(3)
          if (len > cap) throw new IllegalArgumentException(
            s"packNoSplit: document ${r.get(0)} has $len tokens > " +
              s"capacity $cap — pre-chunk it or use packSegments")
          if (sh != curShard) { curShard = sh; chunk = -1L; fill = cap }
          if (fill + len > cap) { chunk += 1L; fill = 0L }
          val off = fill
          fill += len
          Row(r.get(0), sh, r.getLong(2), chunk, off, len)
        }
      }(Encoders.row(outSchema))
  }

  /** Packing audit over [[packSegments]] output: per-shard chunk count,
    * token totals, straddle count (segments that continue a document
    * from a previous chunk), and the fill ratio — which is 1.0 on every
    * chunk except each shard's final partial one, by construction, so
    * `fill_ratio ≈ 1 - waste` and the only waste is nShards tails. One
    * hash aggregation, output bounded by nShards.
    */
  def packStats(segments: DataFrame, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    segments.groupBy(col("shard"))
      .agg(
        countDistinct(col("chunk")).as("n_chunks"),
        count(lit(1)).as("n_segments"),
        sum((col("seg_start") > 0).cast("long")).as("n_straddles"),
        sum(col("seg_len")).as("total_tokens"))
      .withColumn("fill_ratio",
        round(col("total_tokens").cast("double") /
          (col("n_chunks") * lit(capacity.toDouble)), 6))
  }

  /** Pack-level summary: documents and token mass per (shard, bin). */
  def packSummary(packed: DataFrame, tokenCol: String): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("total_tokens"))
}
