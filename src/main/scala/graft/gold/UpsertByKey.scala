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
    */
  def writeAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    val target = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__tmp")
    val old = new org.apache.hadoop.fs.Path(path + ".__old")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    fs.delete(old, true)
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
