package graft.bronze

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout writers (SURVEY.md §4): the storage-side performance
  * levers the reference gets from Snowflake clustering, on Parquet.
  *
  * - `writeClustered`: the reference's `CLUSTER BY (transaction_date,
  *   account_id)` (readme.md:134-140) — Hive partition on the date +
  *   `sortWithinPartitions` on the cluster keys, so Parquet row-group
  *   min/max stats give the same ~70% pruning on key ranges; plus
  *   `maxRecordsPerFile` to bound file size.
  * - `writeBucketed` / `readBucketed`: hash-bucketed tables by join key;
  *   two tables bucketed the same way join with NO shuffle on either side
  *   (asserted in LayoutSpec) — the co-located-join prerequisite for
  *   repeated large-fact joins at 100 TB.
  */
object Layout {

  def writeClustered(df: DataFrame, path: String, partitionCol: String,
                     clusterCols: Seq[String],
                     maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(partitionCol))
      .sortWithinPartitions((partitionCol +: clusterCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Bucketed write goes through the session catalog (bucket metadata
    * lives in the metastore, not the files). `table` is created or
    * replaced at the warehouse location.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Small-file compaction planner — the bin-packing step behind
    * OPTIMIZE/rewrite jobs (Delta OPTIMIZE, Iceberg rewrite_data_files):
    * CDC sinks accrete thousands of small files per partition
    * (§2 row 5 writes one file per micro-batch), and read throughput at
    * 100 TB dies on file-open overhead long before bytes do.
    *
    * Files are assigned to rewrite bins in deterministic `fileIdCol`
    * order within each partition: bin k holds the files whose EXCLUSIVE
    * prefix size sum lies in [k·targetBytes, (k+1)·targetBytes) — the
    * ordered first-fit rule: every bin spans < targetBytes + one file
    * of prefix space, so no rewrite task reads unboundedly many bytes,
    * and every non-last bin in a partition totals more than
    * targetBytes − max(file size) (≈ targetBytes when files are small,
    * which is the compaction case). One shuffle on the partition
    * columns; the prefix sum is a
    * running window inside each partition, never a global sort. The
    * file-listing input is O(n_files) metadata (manifest or storage
    * listing), not data — the plan costs nothing next to the rewrite
    * it schedules.
    */
  def compactionPlan(files: DataFrame, partitionCols: Seq[String],
                     fileIdCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(col(fileIdCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // integer `div`, not float `/`: bin boundaries must be exact (a
    // double quotient can land an epsilon below the integer boundary)
    files.withColumn("cum_before",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
      .drop("cum_before")
  }
}
