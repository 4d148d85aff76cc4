package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic banking-domain generator (SURVEY.md §2 row 11).
  *
  * The reference uses a Faker loop (data-generator/fake_generator.py:16-28,
  * 61-104): N customers → 2 accounts each (SAVINGS/CHECKING, balance
  * 10–1000) → random transactions (DEPOSIT/WITHDRAWAL/TRANSFER, amount
  * 1–1000, transfers pick a distinct related account). This re-expresses
  * the same shape as seeded column expressions over `spark.range(n)` —
  * fully distributed (no driver-side loop), reproducible for a given seed,
  * and scalable to any row count: generation parallelizes across range
  * partitions.
  */
object Synthetic {

  private def prand(seedCol: org.apache.spark.sql.Column, salt: Int): org.apache.spark.sql.Column =
    abs(xxhash64(seedCol, lit(salt)))

  def customers(spark: SparkSession, n: Long, seed: Int = 42): DataFrame =
    spark.range(n).select(
      (col("id") + 1).cast("int").as("id"),
      concat(lit("first_"), col("id")).as("first_name"),
      concat(lit("last_"), pmod(prand(col("id"), seed), lit(997))).as("last_name"),
      concat(lit("user"), col("id"), lit("@example.com")).as("email"),
      to_timestamp(lit("2024-01-01 00:00:00")).plus(
        make_dt_interval(lit(0), lit(0), lit(0),
          pmod(prand(col("id"), seed + 1), lit(86400)).cast("double"))).as("created_at"))

  /** Two accounts per customer, alternating type, balance in [10, 1000). */
  def accounts(spark: SparkSession, nCustomers: Long, seed: Int = 42): DataFrame =
    spark.range(nCustomers * 2).select(
      (col("id") + 1).cast("int").as("id"),
      (col("id") / 2 + 1).cast("int").as("customer_id"),
      when(col("id") % 2 === 0, "SAVINGS").otherwise("CHECKING").as("account_type"),
      (lit(10.0) + pmod(prand(col("id"), seed + 2), lit(99000)) / 100.0).as("balance"),
      lit("USD").as("currency"),
      to_timestamp(lit("2024-01-01 12:00:00")).as("created_at"))

  /** Random transactions over `nAccounts`; TRANSFER rows get a distinct
    * related account, mirroring fake_generator's semantics.
    */
  def transactions(spark: SparkSession, n: Long, nAccounts: Long, seed: Int = 42): DataFrame = {
    val acct = pmod(prand(col("id"), seed + 3), lit(nAccounts)).cast("int") + 1
    val kind = pmod(prand(col("id"), seed + 4), lit(3))
    val related = pmod(prand(col("id"), seed + 5), lit(nAccounts - 1)).cast("int") + 1
    spark.range(n).select(
      (col("id") + 1).as("id"),
      acct.as("account_id"),
      when(kind === 0, "DEPOSIT").when(kind === 1, "WITHDRAWAL")
        .otherwise("TRANSFER").as("txn_type"),
      (lit(1.0) + pmod(prand(col("id"), seed + 6), lit(99900)) / 100.0).as("amount"),
      when(kind === 2,
        when(related >= acct, related + 1).otherwise(related))
        .otherwise(lit(null).cast("int")).as("related_account_id"),
      lit("COMPLETED").as("status"),
      to_timestamp(lit("2024-01-02 00:00:00")).plus(
        make_dt_interval(lit(0), lit(0), lit(0),
          pmod(prand(col("id"), seed + 7), lit(864000)).cast("double"))).as("created_at"))
  }

  /** Wrap rows of a generated table as Debezium-envelope JSON values — a
    * self-contained CDC stream source for tests/demos.
    */
  def asEnvelopes(df: DataFrame, table: String): DataFrame =
    df.select(
      to_json(struct(
        struct(
          struct(df.columns.map(col): _*).as("after"),
          struct(lit(table).as("table"), col("id").cast("long").as("lsn"),
            (col("id").cast("long") * 1000).as("ts_ms")).as("source"),
          lit("c").as("op"),
          (col("id").cast("long") * 1000 + 500).as("ts_ms")).as("payload")))
        .as("value"))
}
