package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (SURVEY.md §7.3): CDC-style
    * events → JSON props extraction → latest-wins dedup → dim join →
    * segment rollup. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val deduped = silver.Staging.dedupLatest(
      Tables.events(spark, d)
        .withColumn("prop_k", cdc.Envelope.jsonField(col("props"), "k", "int")),
      Seq("user_id", "event_type"),
      Seq(col("ts").desc, col("event_id").desc))
    deduped
      // customer is unbounded at scale — leave the join strategy to AQE
      .join(Tables.customer(spark, d), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_current"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        avg(col("prop_k")).as("avg_k"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
