package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed range (point-in-interval) join.
  *
  * Spark's planner has no equi-key to hash on for
  * `points JOIN intervals ON p BETWEEN lo AND hi`, so it falls back to a
  * broadcast nested-loop join — or, when neither side fits in memory, a
  * cartesian product that is quadratic in the data and unrunnable at
  * 100 TB. The standard fix (used by every warehouse's range-join
  * optimization, e.g. the published interval-join designs in Flink and
  * the range-join hints in Photon/Databricks) is to discretize the
  * domain into fixed-width buckets:
  *
  *  - each point lands in exactly one bucket: `floor(p / width)`;
  *  - each interval is exploded into every bucket it overlaps
  *    (`sequence(floor(lo/w), floor(hi/w))`);
  *  - the join becomes a plain shuffled/broadcast HASH equi-join on the
  *    bucket id, with the exact `BETWEEN` kept as a residual predicate.
  *
  * Cost: the interval side is replicated by its average span/width
  * (caller picks `bucketWidth` ≈ the typical interval length, so the
  * replication factor is a small constant), and each point joins only
  * against intervals overlapping its own bucket — the quadratic
  * all-pairs comparison collapses to per-bucket locality. Both sides
  * shuffle by bucket, so the operator scales out with executors instead
  * of funneling through a nested loop.
  *
  * Skew: a single interval spanning `k` buckets produces `k` replicas —
  * bounded by `span / bucketWidth`, not by the corpus. Extremely long
  * intervals should be capped or handled by a coarser second tier
  * (documented contract: `require` guards a replication blow-up).
  *
  * Reference anchor: the reference's analyst queries band transactions
  * into time windows with BETWEEN predicates (readme.md's analyst-query
  * examples); this is the shape that keeps those joins off the
  * nested-loop path at scale.
  */
object RangeJoin {

  private val Bucket = "__rj_bucket"

  /** Join `points` (numeric column `pointCol`) to `intervals`
    * (`[loCol, hiCol]`, inclusive both ends — SQL BETWEEN semantics) as
    * an equi-join on domain buckets of `bucketWidth` plus the residual
    * range predicate. Columns of both inputs are preserved; empty
    * intervals (hi < lo) match nothing, exactly like BETWEEN.
    *
    * `maxBucketsPerInterval` guards runaway replication: an interval
    * spanning more than that many buckets fails fast (resize
    * `bucketWidth` rather than silently exploding the interval side).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 4096,
                      intervalHint: String = "merge"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!points.columns.contains(Bucket) && !intervals.columns.contains(Bucket))
    val p = points.withColumn(Bucket,
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val loB = floor(col(loCol).cast("double") / bucketWidth).cast("long")
    val hiB = floor(col(hiCol).cast("double") / bucketWidth).cast("long")
    val iv = intervals
      // hi < lo matches nothing under BETWEEN; dropping it here also keeps
      // sequence() from generating a *descending* bucket range
      .filter(col(hiCol) >= col(loCol))
      .withColumn(Bucket, explode(sequence(loB,
        // fail fast instead of materializing an unbounded replica set
        when(hiB - loB < lit(maxBucketsPerInterval.toLong), hiB)
          .otherwise(raise_error(concat(
            lit(s"range-join interval spans more than $maxBucketsPerInterval " +
              s"buckets at width $bucketWidth: lo="), col(loCol).cast("string"),
            lit(" hi="), col(hiCol).cast("string")))))))
    // PINNED sort-merge on the bucket join: the interval side just
    // exploded ×(span/width), and Generate is invisible to size
    // estimation — the planner can elect to BROADCAST a bucket-replica
    // relation that scales with the interval corpus (per-user windows,
    // per-rule bands derived from a fact table). Same cliff class as the
    // measured 4.2× fuzzy-join regression (Linkage.scala:181). A caller
    // whose interval side is contract-small (a fixed rulebook) can
    // opt back into broadcast via `intervalHint = "broadcast"`.
    p.join(iv.hint(intervalHint), Seq(Bucket))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(Bucket)
  }

  /** Interval–interval OVERLAP join: pairs (a, b) with
    * `a.lo <= b.hi AND b.lo <= a.hi` (inclusive ends — the session-stitch /
    * time-window-correlation predicate), as a hash equi-join on domain
    * buckets instead of the nested loop Spark plans for the bare
    * conjunction.
    *
    * Malformed rows with `hi < lo` are treated as EMPTY intervals and
    * excluded from both sides — even though a few of them (e.g. a=[5,3]
    * vs b=[0,10]) would satisfy the raw conjunction above. An inverted
    * interval overlaps nothing under interval semantics; callers who mean
    * the bare conjunction on unordered endpoint pairs should normalize
    * with least/greatest first.
    *
    * Both sides explode into the buckets they cover; a pair that overlaps
    * shares every bucket its overlap region touches, so to emit it ONCE
    * the residual keeps only the bucket containing the overlap START
    * (`greatest(a.lo, b.lo)`) — a canonical bucket both sides cover by
    * construction. No post-join distinct, so nothing corpus-sized
    * deduplicates.
    *
    * Column names of the two inputs must be disjoint (the join preserves
    * all of them). Replication bound and `maxBucketsPerInterval` guard as
    * in [[pointInInterval]].
    */
  def intervalOverlap(a: DataFrame, aLoCol: String, aHiCol: String,
                      b: DataFrame, bLoCol: String, bHiCol: String,
                      bucketWidth: Long,
                      maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty, s"input column names must be disjoint, shared: $shared")

    def buckets(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val loB = floor(col(loCol).cast("double") / bucketWidth).cast("long")
      val hiB = floor(col(hiCol).cast("double") / bucketWidth).cast("long")
      df.filter(col(hiCol) >= col(loCol))
        .withColumn(Bucket, explode(sequence(loB,
          when(hiB - loB < lit(maxBucketsPerInterval.toLong), hiB)
            .otherwise(raise_error(concat(
              lit(s"overlap-join interval spans more than $maxBucketsPerInterval " +
                s"buckets at width $bucketWidth: lo="), col(loCol).cast("string"),
              lit(" hi="), col(hiCol).cast("string")))))))
    }

    // PINNED sort-merge: BOTH sides are bucket-exploded interval corpora
    // (see pointInInterval's pin rationale) — neither is safe to elect
    // as a stats-blind broadcast build side.
    buckets(a, aLoCol, aHiCol).hint("merge")
      .join(buckets(b, bLoCol, bHiCol), Seq(Bucket))
      .where(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol) &&
        col(Bucket) === floor(greatest(col(aLoCol), col(bLoCol))
          .cast("double") / bucketWidth).cast("long"))
      .drop(Bucket)
  }

  /** Merge overlapping-or-touching CLOSED intervals per key — validity
    * windows fragmented by repeated upserts, coverage spans, blackout
    * windows — into their minimal disjoint cover, with the count of
    * source intervals each merged span absorbed. The gaps-and-islands
    * construction: ordered by (lo, hi), an island opens where `lo`
    * exceeds the running max of all earlier `hi` (touching endpoints
    * merge, since hi ≥ lo within a row); the result is invariant to
    * tie order among equal-`lo` rows because a row whose `lo` equals a
    * predecessor's can never open an island.
    *
    * Scale shape: ONE shuffle on the key serves both the two windows
    * and the final aggregation (same partitioning); per-key state is
    * the key's own interval count, and output is island-sized. No
    * join, no explode.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], loCol: String,
                     hiCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mergeIntervals needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(loCol).asc, col(hiCol).asc)
    val prevMax = max(col(hiCol))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1))
    df.filter(col(hiCol) >= col(loCol))
      .withColumn("__new",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy(keyCols.map(col) :+ col("__island"): _*)
      .agg(min(col(loCol)).as("merged_lo"), max(col(hiCol)).as("merged_hi"),
        count(lit(1)).as("n_merged"))
      .select(keyCols.map(col) :+ col("merged_lo") :+ col("merged_hi")
        :+ col("n_merged"): _*)
  }
}
