package graft.gold

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental upsert by unique key (SURVEY.md §2 row 25).
  *
  * The reference's fact table is dbt `materialized='incremental',
  * unique_key='transaction_id', incremental_strategy='merge'`
  * (banking_dbt/models/marts/fact_transactions.sql:1; readme.md:142-151) —
  * i.e. `MERGE INTO … WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT`, run
  * idempotently so replays are safe (readme.md:704-705).
  *
  * Parquet has no MERGE, so the operator is pure DataFrame algebra:
  * `existing ▷ incoming (anti) ∪ incoming` — one shuffle on the key (the
  * anti-join), incoming side broadcast when small. Persisting uses a
  * crash-safe write-tmp-then-rename swap (SURVEY.md §7.5 risk 3).
  */
object UpsertByKey {

  /** Merge `incoming` into `existing`: rows in both → incoming wins; the
    * incoming batch itself is first deduped latest-wins on `ordering` so a
    * replayed batch is idempotent.
    */
  def apply(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            ordering: Seq[Column]): DataFrame = {
    val deduped = graft.silver.Staging.dedupLatest(incoming, keys, ordering)
    existing.join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(deduped)
  }

  /** Fast-path merge for "greatest (orderCols) wins" semantics: the
    * incoming dedup is the hash-aggregate `dedupLatestByMax` (map-side
    * combine, no sort) instead of the window form.
    */
  def byMax(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
            orderCols: Seq[String]): DataFrame = {
    val deduped = graft.silver.Staging.dedupLatestByMax(incoming, keys, orderCols)
    existing.join(deduped.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(deduped, allowMissingColumns = false)
  }

  /** CDC-aware fast-path merge: `byMax` dedup (hash aggregation, no window
    * sort) plus tombstone semantics — a key whose latest event is op='d' is
    * removed, otherwise the latest after-image wins. Null-key rows (a
    * malformed envelope that lost even its before-image) are dropped rather
    * than merged as junk. This is the streaming-sink form of `applyCdc`.
    */
  def byMaxCdc(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
               orderCols: Seq[String], opCol: String = "op"): DataFrame = {
    val keyed = incoming.filter(keys.map(col(_).isNotNull).reduce(_ && _))
    val latest = graft.silver.Staging.dedupLatestByMax(keyed, keys, orderCols)
    val upserts = latest.filter(col(opCol) =!= "d" || col(opCol).isNull)
    existing.join(latest.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(upserts)
  }

  /** One micro-batch merge step shared by the streaming sinks: dedup the
    * batch latest-wins (hash aggregation) and merge into `existing`
    * (`None` = first write). With `opCol` set, tombstones delete and
    * null-key rows are dropped.
    */
  def mergeBatch(existing: Option[DataFrame], incoming: DataFrame,
                 keys: Seq[String], orderCols: Seq[String],
                 opCol: Option[String]): DataFrame =
    (existing, opCol) match {
      case (Some(ex), Some(op)) => byMaxCdc(ex, incoming, keys, orderCols, op)
      case (Some(ex), None)     => byMax(ex, incoming, keys, orderCols)
      case (None, opt) =>
        val keyed = if (opt.isDefined)
          incoming.filter(keys.map(col(_).isNotNull).reduce(_ && _))
        else incoming
        val deduped = graft.silver.Staging.dedupLatestByMax(keyed, keys, orderCols)
        opt match {
          case Some(op) => deduped.filter(col(op) =!= "d" || col(op).isNull)
          case None     => deduped
        }
    }

  /** CDC-aware merge: like `apply`, but the incoming batch carries a
    * Debezium op column; a key whose LATEST event is a delete (`op='d'`)
    * is removed from the result (tombstone), otherwise the latest
    * after-image wins. This implements the delete capture the reference
    * declares but drops (readme.md:69 vs kafka_to_minio.py:67-70).
    */
  def applyCdc(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
               ordering: Seq[Column], opCol: String = "op"): DataFrame = {
    val latest = graft.silver.Staging.dedupLatest(incoming, keys, ordering)
    val deletes = latest.filter(col(opCol) === "d").select(keys.map(col): _*)
    val upserts = latest.filter(col(opCol) =!= "d" || col(opCol).isNull)
    existing
      .join(latest.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(upserts.join(deletes, keys, "left_anti"))
  }

  /** Atomic swap-overwrite: write to `<path>.__tmp`, then rename over the
    * target. Readers see either the old or the new table, never a partial
    * write.
    *
    * Crash window: between `rename(target, old)` and `rename(tmp, target)`
    * the table exists only at `<path>.__old`. `recoverDangling` (called on
    * entry here and usable from readers) rolls that state back, so no run
    * can mistake it for a first write and discard the merged history.
    * Limitation: directory rename is atomic on HDFS/POSIX but not on object
    * stores (S3 renames are copy+delete) — there, select the pointer
    * protocol via `writeAtomic(df, path, objectStoreSafe = true)` (a
    * [[SnapshotStore]] table: commit is one tiny pointer PUT, read via
    * `SnapshotStore.read`), or use the partitioned sinks
    * (`PartitionedUpsert`), whose commit goes through Spark's output
    * committer instead of a rename swap.
    */
  def writeAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    recoverDangling(fs, path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    writeSwap(fs, tmp.toString, path)
  }

  /** Publish-protocol selector: rename swap (HDFS/POSIX) or the
    * object-store-safe pointer swap ([[SnapshotStore]] layout — readers
    * resolve through `SnapshotStore.read`, not a bare parquet path).
    */
  def writeAtomic(df: DataFrame, path: String, objectStoreSafe: Boolean): Unit =
    if (objectStoreSafe) { SnapshotStore.publish(df, path); () }
    else writeAtomic(df, path)

  /** Swap an already-written directory over the target — the rename tail
    * of `writeAtomic`, shared by layout migrations.
    */
  def writeSwap(fs: org.apache.hadoop.fs.FileSystem, tmpPath: String,
                path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(tmpPath)
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
  }

  /** Roll back a swap interrupted between its two renames: if the target is
    * missing but `<path>.__old` exists, rename it back. Also used by
    * `exists` so callers' first-write checks see the recovered table.
    */
  def recoverDangling(fs: org.apache.hadoop.fs.FileSystem, path: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    if (!fs.exists(target) && fs.exists(old)) fs.rename(old, target)
  }

  /** Existence check that first recovers any dangling swap. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverDangling(fs, path)
    fs.exists(new org.apache.hadoop.fs.Path(path))
  }

  /** Read-modify-swap convenience: upsert `incoming` into the Parquet table
    * at `path` (creating it if absent).
    */
  def intoParquet(spark: SparkSession, incoming: DataFrame, path: String,
                  keys: Seq[String], ordering: Seq[Column]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        apply(spark.read.parquet(path), incoming, keys, ordering)
      else graft.silver.Staging.dedupLatest(incoming, keys, ordering)
    // safe: the plan reads `path` while writing the tmp dir — the target is
    // only renamed away after the tmp write has fully materialized
    writeAtomic(merged, path)
  }
}
