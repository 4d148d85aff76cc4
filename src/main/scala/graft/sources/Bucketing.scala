package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: pre-shuffle both sides of a hot join ONCE at
  * write time so every subsequent join / aggregation on the bucket key
  * runs exchange-free.
  *
  * This is the canonical 100 TB answer to "this join shuffles the fact
  * table every night": `df.write.bucketBy(n, key)` hash-partitions rows
  * into `n` buckets inside each output task file, records the layout in
  * the catalog, and the bucketed scan then reports
  * `HashPartitioning(key, n)` as its output partitioning — so a
  * same-key, same-bucket-count join needs NO Exchange on either side,
  * and a `groupBy(key)` (or any superset of the bucket key) aggregates
  * in place. The shuffle you'd pay per query is paid once, at layout
  * time, and amortized over every downstream read. (PlanSpec asserts the
  * join + aggregate plan over two bucketed tables contains zero
  * exchanges.)
  *
  * Bucket-count choice at scale: buckets are the unit of read
  * parallelism for bucketed scans, so size them like shuffle partitions
  * (data / ~128 MB), and keep both join sides at the SAME count —
  * mismatched counts force one side to re-shuffle (Spark can coalesce
  * `k·n → n` but not arbitrary ratios).
  *
  * Tables are registered as EXTERNAL (data at `path`), so dropping the
  * name never deletes data, and the same layout can be re-registered by
  * a later session. The write also `sortBy`s the bucket key inside each
  * bucket — parquet row-group stats then make key-range predicates
  * cheap, and a one-file-per-bucket layout lets the planner drop the
  * join sorts too.
  */
object Bucketing {

  /** Write `df` bucketed (and bucket-sorted) by `key` into `path`,
    * registered in the session catalog as `name`. Overwrites both the
    * registration and the data.
    */
  def writeBucketed(df: DataFrame, name: String, path: String, key: String,
                    numBuckets: Int): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(name)
  }

  /** The registered bucketed table (scans report the bucket layout as
    * their output partitioning).
    */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Equi-join two same-bucket-count tables on their bucket keys —
    * plain `join`, the layout does the work: zero exchanges when both
    * sides were written with the same `numBuckets`.
    *
    * The merge hint pins the plan both sides were laid out FOR: at scale
    * neither side of a bucketed-bucketed join fits a broadcast, so the
    * real plan is a sort-merge join whose exchanges the bucket layout
    * eliminates. Without the hint, a small test scale factor lets the
    * planner broadcast one side instead, which also runs exchange-free
    * but silently stops exercising the property the layout pays for.
    */
  def colocatedJoin(left: DataFrame, right: DataFrame,
                    leftKey: String, rightKey: String,
                    joinType: String = "inner"): DataFrame =
    left.hint("merge").join(right, col(leftKey) === col(rightKey), joinType)
}
