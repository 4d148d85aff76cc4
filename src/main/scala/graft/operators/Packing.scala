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
  def shardOf(id: Column, nShards: Int): Column =
    pmod(conv(substring(md5(concat(id.cast("string"), lit("pack-shard"))), 1, 8),
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

  /** Pack-level summary: documents and token mass per (shard, bin). */
  def packSummary(packed: DataFrame, tokenCol: String): DataFrame =
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("total_tokens"))
}
