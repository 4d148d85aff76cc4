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
}
