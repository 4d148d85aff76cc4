package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for the banking domain and the Debezium change
  * envelope.
  *
  * Shapes derive from the reference's OLTP schema
  * (postgres/schema.sql:4-31) and its CDC envelope as consumed at
  * consumer/kafka_to_minio.py:63-70. Money is DOUBLE post-CDC because the
  * reference configures `decimal.handling.mode=double`
  * (kafka-debezium/generate_and_post_connector.py:29) and staging casts to
  * float (banking_dbt/models/staging/stg_accounts.sql:8).
  */
object Schemas {

  // --- OLTP entity schemas (postgres/schema.sql:4-31) ---

  val customers: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("created_at", TimestampType)))

  val accounts: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("customer_id", IntegerType),
    StructField("account_type", StringType),   // SAVINGS | CHECKING
    StructField("balance", DoubleType),
    StructField("currency", StringType),       // 3-char code, default USD
    StructField("created_at", TimestampType)))

  val transactions: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("account_id", IntegerType),
    StructField("txn_type", StringType),       // DEPOSIT | WITHDRAWAL | TRANSFER
    StructField("amount", DoubleType),
    StructField("related_account_id", IntegerType),
    StructField("status", StringType),
    StructField("created_at", TimestampType)))

  /** Debezium envelope for a given table payload. The reference disables
    * schemas on the wire (docker-compose.yml:46-49), so the value is bare
    * `{payload: {before, after, source, op, ts_ms}}` JSON.
    */
  def envelope(after: StructType): StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", after),
      StructField("after", after),
      StructField("source", StructType(Seq(
        StructField("table", StringType),
        StructField("lsn", LongType),
        StructField("ts_ms", LongType)))),
      StructField("op", StringType),           // c | u | d | r
      StructField("ts_ms", LongType))))))

  /** Driver testdata `events` table (TESTDATA.md / FIXTURES.md §B): the
    * CDC-like stream stand-in. `props` is a JSON string.
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
