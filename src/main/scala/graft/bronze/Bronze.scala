package graft.bronze

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bronze layer: immutable raw CDC events as date-partitioned Parquet
  * (SURVEY.md §2 rows 5-8).
  *
  * The reference writes `{table}/date=YYYY-MM-DD/…` objects to MinIO
  * (consumer/kafka_to_minio.py:45-51) and bulk-loads them with
  * `COPY INTO … ON_ERROR='CONTINUE'` (minio_to_snowflake_dag.py:77-84).
  * In Spark the partitioned Parquet directory IS the raw table — no
  * separate load hop; partition discovery and pruning are native.
  *
  * Scale: Hive-style `ingest_date=` partitioning gives partition pruning on
  * date filters; `maxRecordsPerFile` bounds file size (the reference's
  * 50-row micro-files are an anti-pattern at scale — small-file explosion —
  * so we size for ~128 MB row groups instead and note the divergence).
  */
object Bronze {

  val PartitionCol = "ingest_date"

  /** Append a batch, stamping the ingest date partition from `tsCol`. */
  def append(df: DataFrame, path: String, tsCol: String = "ts",
             maxRecordsPerFile: Long = 1000000L): Unit =
    df.withColumn(PartitionCol, to_date(col(tsCol)))
      .write.mode(SaveMode.Append)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(PartitionCol)
      .parquet(path)

  /** Read the raw table back with partition discovery. */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Derive the Bronze projection of a stream without writing — raw
    * columns + the partition column (used by oracle-checked queries).
    */
  def project(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn(PartitionCol, to_date(col(tsCol)))
}
