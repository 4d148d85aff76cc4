package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines:
  * hash-based rates, stratified mixes, and train/val/test splits.
  *
  * Why hash-based instead of `df.sample()`: RNG sampling is not
  * reproducible across retries, partitionings, or engines — a failed task
  * re-draws different rows, and an audit query in another engine can't
  * reproduce the set. Here membership is a pure function of the key:
  * md5(key) → first 32 bits → fraction in [0,1), compared to the rate.
  * Same rows every run, every engine (the DuckDB oracle reproduces the
  * sample exactly), and survives speculative execution at 100 TB.
  *
  * All operators are map-only projections/filters — no shuffle, fully
  * codegen'd (md5 + substring + conv are built-ins), linear scale-out.
  * md5 is used as a mixer, not for security.
  */
object Sampling {

  /** Deterministic [0,1) fraction from a key: first 8 md5 hex digits as a
    * 32-bit integer over 2^32. Dyadic rational → exact in IEEE double, so
    * cross-engine comparisons are bit-stable. `salt` decorrelates
    * independent decisions over the same key — sampling and splitting MUST
    * use different salts, or sampling at 50% then splitting 90/10 would
    * put every surviving row in the first split (both predicates would
    * read the same hash).
    */
  def hashFraction(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0)

  /** Keep a deterministic `fraction` of rows by key. */
  def sample(df: DataFrame, keyCol: String, fraction: Double,
             salt: String = ""): DataFrame =
    df.filter(hashFraction(col(keyCol), salt) < fraction)

  /** Stratified sample: per-stratum keep rates (e.g. language balancing in
    * a corpus mix), `default` for unlisted strata. One scan, no shuffle —
    * the declarative form of "downsample en to 30%, keep de/fr".
    */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Double], default: Double = 0.0,
                 salt: String = ""): DataFrame = {
    val rate = fractions.foldLeft(lit(default)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit(f)).otherwise(acc)
    }
    df.filter(hashFraction(col(keyCol), salt) < rate)
  }

  /** Assign each row to a named split by cumulative fraction boundaries:
    * `splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)` puts the
    * hash-fraction ranges [0, .8) / [.8, .9) / [.9, 1.0) in those splits.
    * Deterministic: a document never migrates between splits across runs —
    * the leakage guarantee a training pipeline needs.
    */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Double)],
            outCol: String = "split", salt: String = "split"): DataFrame = {
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split fractions must sum to 1")
    val f = hashFraction(col(keyCol), salt)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
    val assign = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), acc) => when(f < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, assign)
  }

  /** Leakage-free split under NEAR-duplication: assign splits by the
    * near-dup CLUSTER id, not the document id — [[split]]'s per-key
    * guarantee stops leaking the moment two near-identical documents
    * carry different keys (the classic eval-contamination bug: a
    * paraphrase of a test doc lands in train). Feed it
    * `Dedup.resolveClusters` output; documents absent from `clusters`
    * (singletons — pair generation only emits connected docs) fall back
    * to their own id. Every member of a cluster hashes the same key, so
    * a cluster can never straddle splits.
    *
    * Scale shape: one left join against the (doc, cluster) frame, then
    * the same map-only hash assignment as [[split]].
    */
  def splitByCluster(df: DataFrame, keyCol: String, clusters: DataFrame,
                     splits: Seq[(String, Double)], outCol: String = "split",
                     salt: String = "split"): DataFrame = {
    val cl = clusters.select(col("id").as(keyCol), col("cluster_id").as("__cl"))
    val withKey = df.join(cl, Seq(keyCol), "left")
      .withColumn("cluster_id", coalesce(col("__cl"), col(keyCol)))
      .drop("__cl")
    split(withKey, "cluster_id", splits, outCol, salt)
  }

  /** Split-leakage audit: the near-dup pairs that STRADDLE a train/eval
    * split — the contamination [[splitByCluster]] exists to prevent,
    * measured directly so a naive per-doc split can be rejected with a
    * number instead of an argument. Feed it any pair frame
    * (`Dedup.ngramJaccard`, MinHash candidates, embedding near-dups) and
    * a (key, split) assignment; rows where the two sides landed in
    * different splits are eval docs whose near-copy is in train.
    *
    * Scale: two equi-joins of the (already reduced) pair frame against
    * an id→split frame — ids only, never text; the pair generator's own
    * caps bound the frame.
    */
  def splitLeakage(pairs: DataFrame, assignment: DataFrame, keyCol: String,
                   splitCol: String = "split", idA: String = "id_a",
                   idB: String = "id_b"): DataFrame = {
    val a = assignment.select(col(keyCol).as(idA), col(splitCol).as("split_a"))
    val b = assignment.select(col(keyCol).as(idB), col(splitCol).as("split_b"))
    pairs.join(a, Seq(idA)).join(b, Seq(idB))
      .filter(col("split_a") =!= col("split_b"))
  }

  /** Weighted corpus mixture: sample each source at its rate and union —
    * the "data mixing" step of corpus assembly. Sources must be
    * union-compatible by name.
    */
  def mixture(sources: Seq[(DataFrame, Double)], keyCol: String): DataFrame =
    sources.map { case (df, rate) => sample(df, keyCol, rate) }
      .reduce(_.unionByName(_))

  /** Fractional-epoch resampling: repeat (or thin) each stratum to a
    * target epoch count — the "wiki ×3.2, web ×0.6" data-mixing move of
    * LLM corpus recipes, where high-quality sources are seen several
    * times per training run and low-quality ones less than once.
    *
    * Each row emits `floor(w)` copies plus one more iff
    * `hashFraction(key, salt) < frac(w)` — so a stratum's expected
    * multiplicity is exactly `w`, the decision is per-KEY deterministic
    * (stable across runs, retries, partitionings, and engines), and
    * `w < 1` degenerates to plain deterministic subsampling. Output rows
    * carry `copy_seq` (1-based) so downstream shuffling/sharding can
    * treat copies as distinct examples.
    *
    * Scale shape: map-only — a rate lookup (a CASE over the stratum
    * literal) and a `sequence` explode whose amplification IS the target
    * epoch factor; no shuffle, no join, nothing driver-side.
    */
  def epochUpsample(df: DataFrame, keyCol: String, strataCol: String,
                    epochs: Map[String, Double], default: Double = 1.0,
                    salt: String = "epoch"): DataFrame = {
    require((epochs.values ++ Seq(default)).forall(w => w >= 0.0 && w <= 1000.0),
      "epoch weights must be in [0, 1000]")
    val w = epochs.foldLeft(lit(default)) { case (acc, (stratum, v)) =>
      when(col(strataCol) === stratum, lit(v)).otherwise(acc)
    }
    val nCopies = floor(w).cast("long") +
      when(hashFraction(col(keyCol), salt) < (w - floor(w)), 1L).otherwise(0L)
    df.withColumn("__nc", nCopies)
      .filter(col("__nc") > 0L)
      .withColumn("copy_seq", explode(sequence(lit(1L), col("__nc"))))
      .drop("__nc")
  }

  /** Exactly-n-per-stratum deterministic sample: rank rows within each
    * stratum by (hash(key), key) and keep the first `n` — the fixed-size
    * eval-split / few-shot-pool primitive, where a FRACTION won't do
    * because the consumer needs exactly n rows per language/source.
    *
    * Deterministic and engine-reproducible for the same reason as
    * [[hashFraction]]: rank order is a pure function of the key (hash
    * first, key as total-order tie-break), so retries, repartitioning,
    * and the DuckDB oracle all pick the identical rows.
    *
    * Scale shape: one shuffle on the stratum + a per-stratum window —
    * the standard top-n-per-group plan (`WindowGroupLimit` pushes the
    * rank filter into a per-partition streaming top-n before the final
    * sort at n this small). Skew bound: a mega-stratum sorts only its
    * own partition, and the pushed group-limit means each map task
    * retains at most n rows per stratum it sees.
    */
  /** Square-root temperature rebalancing of a multi-source corpus: each
    * stratum keeps rate √(n_min/n_s), so kept counts are ∝ √n_s — the
    * α = 0.5 point of the standard n^α temperature-mixing family, which
    * flattens source imbalance without discarding any small source (the
    * smallest stratum keeps 100%). Deterministic per key, like every
    * sampler here.
    *
    * α is pinned at 0.5 deliberately: √ of a count ratio is a correctly-
    * rounded IEEE operation, identical in any engine (the DuckDB oracle
    * reproduces the exact row set), while a general pow(x, α) is NOT
    * correctly rounded and may differ across libm implementations.
    *
    * Scale shape: one count aggregation (stratum-sized result) broadcast
    * back as a rate column; the keep decision is then a map-side filter —
    * the corpus itself never shuffles.
    */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).cast("double").as("__n"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("__n")).as("__nmin"))))
      .select(col(strataCol), sqrt(col("__nmin") / col("__n")).as("__rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashFraction(col(keyCol), salt) < col("__rate"))
      .drop("__rate")
  }

  /** Deterministic training-order assignment WITHOUT a global sort:
    * every row gets a `(shard, pos)` coordinate — shard = salted hash of
    * the key mod `nShards`, pos = rank within the shard by a second,
    * independent hash — and the global training order is defined as
    * round-robin across shards by position (read file `shard` at step
    * `pos`). This is how you shuffle a 100 TB corpus for training: a true
    * global ORDER BY needs a range exchange over everything and yields
    * one totally-ordered file set, while this shape sorts only within
    * shards (each ~1/nShards of the data, the write-side parallelism) and
    * is exactly reproducible across runs, retries, and engines, because
    * both coordinates are pure functions of the key.
    *
    * The two salts are independent, so shard assignment cannot correlate
    * with within-shard position (same reason [[hashFraction]] separates
    * sampling from splitting).
    */
  def trainingOrder(df: DataFrame, keyCol: String, nShards: Int,
                    salt: String = "order"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(
      conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt + "-shard"))),
        1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashFraction(col(keyCol), salt + "-pos").asc, col(keyCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** [[trainingOrder]] with a difficulty axis: within each shard, rows
    * order by `difficulty` first (curriculum learning's easy-to-hard
    * schedule), with the salted hash + key only breaking ties — so equal-
    * difficulty rows still interleave pseudo-randomly and the coordinate
    * stays a pure function of (difficulty, key). Same scale shape as
    * [[trainingOrder]]: shard-local sorts, no global range exchange.
    */
  def curriculumOrder(df: DataFrame, keyCol: String, difficulty: Column,
                      nShards: Int, salt: String = "order"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val shard = pmod(
      conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt + "-shard"))),
        1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
    val w = Window.partitionBy(col("shard"))
      .orderBy(difficulty.asc, hashFraction(col(keyCol), salt + "-pos").asc,
        col(keyCol).asc)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Equi-depth binning: per stratum, NTILE(nBins) over the
    * (metric, key) total order — bins within a stratum hold equal row
    * counts (±1), the curriculum-bucket / quality-tier assignment that
    * pairs with [[curriculumOrder]] (bins as coarse difficulty stages)
    * and [[TextAnalysis.calibrateScores]] (rank → discrete tier). The
    * key tie-break makes assignment engine-reproducible when metric
    * values collide.
    *
    * One shuffle on the stratum (the window partition) with an
    * in-partition sort — same shape and skew bound as [[sampleN]].
    */
  def equiDepthBins(df: DataFrame, keyCol: String, metricCol: String,
                    nBins: Int, strataCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(metricCol).asc, col(keyCol).asc)
    df.withColumn("bin", ntile(nBins).over(w))
  }

  def sampleN(df: DataFrame, keyCol: String, strataCol: String, n: Int,
              salt: String = "samplen"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n > 0, s"n must be positive, got $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashFraction(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Weight-proportional sample of k rows WITHOUT replacement — priority
    * sampling (Duffield–Lund–Thorup, JACM 2007): each row gets priority
    * w / u with u a per-key uniform, and the k highest priorities win.
    * Heavy rows are more likely to be picked, every row with w > 0 has
    * positive inclusion probability, and the scheme supports unbiased
    * subset-sum estimation downstream (estimate weight = max(w, τ) with τ
    * the (k+1)-th priority).
    *
    * Determinism/exactness: u is the md5 32-bit integer (+1, so u ∈
    * [1, 2^32] — never a zero divisor) and the priority is ONE division of
    * two exact integers. IEEE requires division to be correctly rounded,
    * so — unlike the `u^(1/w)` exponential-keys scheme, whose `pow`/`log`
    * are libm-dependent — the priority is bit-identical across engines,
    * runs, and retries, and the DuckDB oracle reproduces the exact sample.
    * Ties broken by key; rows with w ≤ 0 are excluded (zero weight = zero
    * inclusion probability; negative weights are meaningless here).
    *
    * Scale shape: map-side priority + distributed TakeOrdered (each task
    * keeps its local top-k, the driver merges k-sized heaps) — no global
    * sort, no shuffle of the corpus.
    */
  def prioritySample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, salt: String = "priority"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priorityCol(keyCol, weightCol, salt))
      .orderBy(col("priority").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Per-stratum [[prioritySample]]: k weight-proportional picks WITHOUT
    * replacement from every stratum (weighted corpus mixing with a hard
    * per-source quota). Same exact-integer-division priorities; the rank
    * filter rides a per-stratum window, so `WindowGroupLimit` pushes it
    * into per-partition streaming top-k — map tasks hold ≤ k rows per
    * stratum, the same shape as [[sampleN]].
    */
  def prioritySampleN(df: DataFrame, keyCol: String, weightCol: String,
                      strataCol: String, k: Int,
                      salt: String = "priority"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("priority").desc, col(keyCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priorityCol(keyCol, weightCol, salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  private def priorityCol(keyCol: String, weightCol: String,
                          salt: String): Column = {
    val u = conv(substring(md5(concat(col(keyCol).cast("string"), lit(salt))),
      1, 8), 16, 10).cast("long") + lit(1L)
    col(weightCol).cast("double") / u.cast("double")
  }

  /** Deterministic uniform negative sampling for contrastive training:
    * per anchor, up to `k` corpus rows drawn by the md5 recipe over
    * (anchor, draw-index) — reproducible across runs/retries/engines
    * like every sampler here, so the training set is an artifact, not an
    * accident of the RNG. Draw j maps to id `lo + md5₃₂(anchor:j:salt)
    * mod (hi−lo+1)` over a DENSE id range (the contract; sparse ranges
    * silently under-sample); self-draws are excluded and duplicate draws
    * collapse, so an anchor yields ≤ k negatives — the standard trade
    * for rejection-free O(anchors·k) cost. Complements
    * `Similarity.hardNegatives` (q92): that mines the most-confusable
    * negatives by cosine; this supplies the uniform background mix
    * contrastive batches also need.
    *
    * Shape: one map-only explode of anchors×k, one keyed join against
    * the corpus on the drawn id — no window, nothing corpus-squared.
    */
  def negativeSample(anchors: DataFrame, corpus: DataFrame,
                     anchorIdCol: String, corpusIdCol: String, k: Int,
                     lo: Long, hi: Long, salt: String = ""): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(hi >= lo, s"empty id range [$lo, $hi]")
    val range = hi - lo + 1
    val draws = anchors.select(col(anchorIdCol).as("anchor_id"))
      .withColumn("__j", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("neg_id", lit(lo) + pmod(
        conv(substring(md5(concat_ws(":",
          col("anchor_id").cast("string"), col("__j").cast("string"),
          lit(salt))), 1, 8), 16, 10).cast("long"),
        lit(range)))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("neg_id")).distinct()
    draws.join(corpus.withColumnRenamed(corpusIdCol, "neg_id"), Seq("neg_id"))
  }
}
