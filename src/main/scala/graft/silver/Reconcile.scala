package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Merkle-style table reconciliation — "are these two copies of the
  * table identical, and if not, exactly which rows differ?" asked the
  * way a 100 TB replica pair can afford: compare BUCKET DIGESTS first
  * (two linear scans collapsing map-side to `nBuckets` rows), then run
  * the row-level diff ONLY over the buckets whose digests disagree.
  * This is the anti-entropy shape every replicated store uses (Dynamo /
  * Cassandra Merkle trees), applied to lake tables: source-vs-lake
  * parity after a migration, replica drift after a botched backfill,
  * pre/post-upgrade invariance.
  *
  * Digest construction: per row, one 64-bit hash over ALL columns
  * (canonicalized — see [[rowDigest]]); per bucket, the SUM of row
  * hashes plus the row count. Sums are order-independent and
  * partial-aggregable, so the digest pass is one map-side-combinable
  * hash aggregation with no sort and no join. A single changed row
  * changes its bucket's sum with probability 1 − 2⁻⁶⁴; duplicate-row
  * multisets are distinguished by (sum, count) unless hashes collide.
  *
  * Cost: identical tables pay two scans + a `nBuckets`-row compare and
  * move NOTHING else; a table pair with d dirty buckets pays the keyed
  * full-outer diff over ~(n/nBuckets)·d rows. `nBuckets` trades digest
  * table size against dirty-bucket row volume — at 1000 executors and
  * 2²⁰ buckets, a one-row divergence re-joins ~n/2²⁰ rows, not n.
  */
object Reconcile {

  /** Canonical 64-bit row digest: xxhash64 over every column, with the
    * column list sorted for schema-order independence and top-level
    * float/double columns canonicalized BEFORE hashing — `nanvl` folds
    * every NaN payload to the canonical NaN and `+ 0.0` folds -0.0 to
    * 0.0 — so replicas storing -0.0 vs 0.0 (or different NaN bit
    * patterns), which compare EQUAL under `<=>`, also digest equal and
    * never flag a clean bucket dirty. (Floats hash through their double
    * widening, which is exact; nested struct fields are hashed as-is —
    * the diff stays correct either way, canonicalization only preserves
    * the digest-prune guarantee.)
    */
  private def rowDigest(df: DataFrame): Column = {
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val cols: Seq[Column] = df.columns.sorted.toSeq.map { name =>
      byName(name) match {
        case DoubleType | FloatType =>
          nanvl(col(name).cast("double"), lit(Double.NaN)) + lit(0.0d)
        case _ => col(name)
      }
    }
    xxhash64(cols: _*)
  }

  /** Per-bucket (bucket, n_rows, digest) summary of `df`, bucketed by a
    * hash of `keys` so the same key lands in the same bucket on both
    * sides regardless of physical layout.
    */
  def bucketDigest(df: DataFrame, keys: Seq[String], nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.groupBy(pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong))
        .as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        // DECIMAL(38,0) accumulation: exact and overflow-free (ANSI mode
        // would throw on a wrapped BIGINT sum long before 100 TB)
        sum(rowDigest(df).cast("decimal(38,0)")).as("digest"))
  }

  /** Buckets whose (count, digest) disagree between the two sides —
    * the `nBuckets`-row compare that decides whether any row work
    * happens at all. Missing buckets (rows only on one side) count as
    * disagreeing.
    */
  def dirtyBuckets(a: DataFrame, b: DataFrame, keys: Seq[String],
                   nBuckets: Int): DataFrame =
    bucketDigest(a, keys, nBuckets).withColumnRenamed("n_rows", "n_a")
      .withColumnRenamed("digest", "d_a")
      .join(bucketDigest(b, keys, nBuckets)
        .withColumnRenamed("n_rows", "n_b").withColumnRenamed("digest", "d_b"),
        Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) || !(col("d_a") <=> col("d_b")))
      .select(col("bucket"))

  /** Row-level reconciliation, digest-pruned: rows present or different
    * on either side, labeled `only_in_a` / `only_in_b` /
    * `differs_in_a` / `differs_in_b` (pre/post images of a keyed
    * mismatch). Identical tables return empty after the digest compare
    * alone; the keyed diff runs only over dirty buckets.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String],
           nBuckets: Int = 1 << 12): DataFrame = {
    val dirty = broadcast(dirtyBuckets(a, b, keys, nBuckets))
    def pruned(df: DataFrame) =
      df.withColumn("__bucket",
          pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)))
        .join(dirty.withColumnRenamed("bucket", "__bucket"), Seq("__bucket"),
          "left_semi")
        .drop("__bucket")
    val payload = a.columns.filterNot(keys.contains).toSeq
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"Reconcile.diff: schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val pa = pruned(a).select(keys.map(k => col(k).as(s"a_$k"))
      ++ payload.map(c => col(c).as(s"a_$c")) :+ lit(true).as("__in_a"): _*)
    val pb = pruned(b).select(keys.map(k => col(k).as(s"b_$k"))
      ++ payload.map(c => col(c).as(s"b_$c")) :+ lit(true).as("__in_b"): _*)
    val j = pa.join(pb,
      keys.map(k => col(s"a_$k") <=> col(s"b_$k")).reduce(_ && _), "full_outer")
    val inA = col("__in_a").isNotNull
    val inB = col("__in_b").isNotNull
    val same: Column = payload.map(c => col(s"a_$c") <=> col(s"b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    def image(side: String, tpe: String) =
      (keys ++ payload).map(c => col(s"${side}_$c").as(c)) :+
        lit(tpe).as("diff_type")
    j.filter(inA && !inB).select(image("a", "only_in_a"): _*)
      .unionByName(j.filter(inB && !inA).select(image("b", "only_in_b"): _*))
      .unionByName(j.filter(inA && inB && !same)
        .select(image("a", "differs_in_a"): _*))
      .unionByName(j.filter(inA && inB && !same)
        .select(image("b", "differs_in_b"): _*))
  }

  /** Column-level mismatch summary over a keyed table pair — the "which
    * columns drifted, and by how much" readout (the dbt-audit-helper
    * `compare_column_values` / Datafold diff-summary shape): one row per
    * payload column with, over keys present on BOTH sides, the count
    * that matches null-safely, the count that differs, and the match
    * rate; `n_only_a`/`n_only_b` repeat the key-presence context on
    * every row so the frame is self-describing.
    *
    * Scale shape: the per-column compare runs on the SAME digest-pruned
    * join as [[diff]] — rows in clean buckets are provably equal
    * column-by-column (their bucket digests agree), so they are counted
    * as matches arithmetically (`n_a − |dirty_a|`) without being
    * re-joined. Identical 100 TB replicas cost two digest scans and a
    * bucket compare; only divergent buckets pay the join. The final
    * pivot to long format is a `stack` over a handful of 1-row
    * aggregates — no second pass over data.
    */
  def columnStats(a: DataFrame, b: DataFrame, keys: Seq[String],
                  nBuckets: Int = 1 << 12): DataFrame = {
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"Reconcile.columnStats: schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val payload = a.columns.filterNot(keys.contains).toSeq
    val dirty = broadcast(dirtyBuckets(a, b, keys, nBuckets))
    def pruned(df: DataFrame) =
      df.withColumn("__bucket",
          pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)))
        .join(dirty.withColumnRenamed("bucket", "__bucket"), Seq("__bucket"),
          "left_semi")
        .drop("__bucket")
    val pa = pruned(a).select(keys.map(k => col(k).as(s"a_$k"))
      ++ payload.map(c => col(c).as(s"a_$c")) :+ lit(true).as("__in_a"): _*)
    val pb = pruned(b).select(keys.map(k => col(k).as(s"b_$k"))
      ++ payload.map(c => col(c).as(s"b_$c")) :+ lit(true).as("__in_b"): _*)
    val j = pa.join(pb,
      keys.map(k => col(s"a_$k") <=> col(s"b_$k")).reduce(_ && _), "full_outer")
    val inA = col("__in_a").isNotNull
    val inB = col("__in_b").isNotNull
    def cnt(c: Column) = coalesce(sum(c.cast("long")), lit(0L))
    val aggCols: Seq[Column] = Seq(
      cnt(inA && !inB).as("n_only_a"),
      cnt(!inA && inB).as("n_only_b"),
      cnt(inA && inB).as("common_dirty"),
      cnt(inA).as("dirty_a")) ++
      payload.map(c =>
        cnt(inA && inB && !(col(s"a_$c") <=> col(s"b_$c"))).as(s"d_$c"))
    val dirtyAgg = j.groupBy().agg(aggCols.head, aggCols.tail: _*)
    val totalA = broadcast(a.groupBy().agg(count(lit(1)).as("n_a")))
    // clean-bucket rows are common and equal by digest: matched for free
    val base = dirtyAgg.crossJoin(totalA)
      .withColumn("n_common",
        col("n_a") - col("dirty_a") + col("common_dirty"))
    val stackArgs = payload
      .map(c => s"'$c', CAST(d_$c AS BIGINT)").mkString(", ")
    base.selectExpr(
        s"stack(${payload.size}, $stackArgs) AS (column_name, n_differs)",
        "n_common", "n_only_a", "n_only_b")
      .select(col("column_name"), col("n_common"),
        (col("n_common") - col("n_differs")).as("n_match"),
        col("n_differs"), col("n_only_a"), col("n_only_b"),
        // no common keys = NOTHING compared: that must read as NULL,
        // never as a perfect match a >=0.99 gate would wave through
        round(when(col("n_common") === 0L, lit(null).cast("double"))
          .otherwise((col("n_common") - col("n_differs")).cast("double") /
            col("n_common").cast("double")), 6).as("match_rate"))
  }
}
