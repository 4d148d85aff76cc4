package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc.Envelope
import graft.gold.{Marts, Scd2Merge, UpsertByKey}
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.silver.{Quality, Staging}

/** The driver-checked query registry: one entry per implemented operator of
  * SURVEY.md §2 (+ the §7.5 / north-star extension operators), each with a
  * DuckDB-ANSI oracle where SQL can express it.
  *
  * Oracle-parity rules (SURVEY.md §7.5 risk 4):
  *  - money/value sums go through DECIMAL so they are exact and
  *    order-independent in both engines, then cast back to DOUBLE so the
  *    result schema matches;
  *  - every window/top-k has a total order (explicit tie-break keys);
  *  - float vector math folds left-to-right in DOUBLE in both engines and
  *    is rounded before ranking.
  */
object Queries {

  /** name -> (query fn, optional DuckDB oracle SQL) */
  case class Q(name: String,
               fn: (SparkSession, String) => DataFrame,
               oracle: Option[String])

  private def dec2(c: Column): Column = c.cast("decimal(18,2)")
  private def dec6(c: Column): Column = c.cast("decimal(38,6)")
  /** Exact, order-independent sum of a 2-dp double, surfaced as double. */
  private def sumMoney(c: Column): Column = sum(dec2(c)).cast("double")

  // Watermark split used by the incremental-upsert query: mid-range of the
  // events table (all SFs span 2024-01-01 .. 2024-01-30).
  private val Split = "2024-01-16 00:00:00"

  val all: Seq[Q] = Seq(

    // ── §2.4 row 18: latest-wins CDC dedup (stg_customers.sql:11-14,26) ──
    Q("q01_dedup_latest",
      (s, d) => Staging.dedupLatest(
        Tables.events(s, d), Seq("user_id", "event_type"),
        Seq(col("ts").desc, col("event_id").desc))
        .select("user_id", "event_type", "event_id", "ts", "value"),
      Some("""
        SELECT user_id, event_type, event_id, ts, value FROM (
          SELECT user_id, event_type, event_id, ts, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1""")),

    // ── §2.2 rows 12-15: typed JSON extraction, rename, CASE, audit date ──
    Q("q02_envelope_extract",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        col("user_id").as("customer_id"),
        col("event_type").as("transaction_type"),
        col("ts").as("transaction_time"),
        col("value").as("amount"),
        Envelope.jsonField(col("props"), "k", "int").as("prop_k"),
        when(col("value") > 100, lit("HIGH")).otherwise(lit("LOW")).as("amount_band"),
        to_date(col("ts")).as("ingest_date")),
      Some("""
        SELECT event_id, user_id AS customer_id, event_type AS transaction_type,
               ts AS transaction_time, value AS amount,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
               CASE WHEN value > 100 THEN 'HIGH' ELSE 'LOW' END AS amount_band,
               CAST(ts AS DATE) AS ingest_date
        FROM events""")),

    // ── §2.3 row 17a: left equi-join fact enrichment (broadcast dim) ──
    Q("q03_fact_enrich",
      (s, d) => Marts.enrich(
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice").as("amount")),
        Tables.orders(s, d).select(
          col("o_orderkey").as("l_orderkey"),
          col("o_custkey").as("customer_id"),
          col("o_orderdate").as("order_date")),
        Seq("l_orderkey")),
      Some("""
        SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice AS amount,
               o.o_custkey AS customer_id, o.o_orderdate AS order_date
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey""")),

    // ── §2.6 rows 22-24: SCD2 history from a change log (backfill form) ──
    Q("q04_scd2_history",
      (s, d) => Scd2Merge.fromChangeLog(
        Tables.events(s, d), Seq("user_id"), "ts", Seq("event_id"))
        .select("user_id", "event_id", "value", "version_n",
          "effective_from", "effective_to", "is_current"),
      Some("""
        SELECT user_id, event_id, value,
               CAST(row_number() OVER w AS INTEGER) AS version_n,
               ts AS effective_from,
               lead(ts) OVER w AS effective_to,
               (lead(ts) OVER w) IS NULL AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""")),

    // ── §2.5 row 20 + §2.6 row 25: high-watermark + upsert-by-key ──
    Q("q05_upsert_incremental",
      (s, d) => {
        val ev = Tables.events(s, d)
        val keys = Seq("user_id", "event_type")
        val ord = Seq(col("ts").desc, col("event_id").desc)
        val existing = Staging.dedupLatest(
          ev.filter(col("ts") < lit(Split).cast("timestamp")), keys, ord)
        val incoming = ev.filter(col("ts") >= lit(Split).cast("timestamp"))
        UpsertByKey(existing, incoming, keys, ord)
          .select("user_id", "event_type", "event_id", "ts", "value")
      },
      Some(s"""
        WITH base AS (SELECT * FROM events WHERE ts < TIMESTAMP '$Split'),
        inc AS (SELECT * FROM events WHERE ts >= TIMESTAMP '$Split'),
        existing AS (
          SELECT user_id, event_type, event_id, ts, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn FROM base)
          WHERE rn = 1),
        incd AS (
          SELECT user_id, event_type, event_id, ts, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                      ORDER BY ts DESC, event_id DESC) AS rn FROM inc)
          WHERE rn = 1)
        SELECT e.* FROM existing e WHERE NOT EXISTS (
          SELECT 1 FROM incd i
          WHERE i.user_id = e.user_id AND i.event_type = e.event_type)
        UNION ALL SELECT * FROM incd""")),

    // ── §2.5 rows 19, 21: grouped aggregation (TPC-H Q1 shape) ──
    Q("q06_agg_pricing",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumMoney(col("l_quantity")).as("sum_qty"),
          sumMoney(col("l_extendedprice")).as("sum_base_price"),
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("n_rows")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // ── §2.8 row 30 / row 19: GROUP BY + HAVING uniqueness audit ──
    Q("q07_having_dupes",
      (s, d) => Quality.unique(
        Tables.events(s, d), Seq("user_id", "event_type")),
      Some("""
        SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_dupes
        FROM events GROUP BY user_id, event_type HAVING COUNT(*) > 1""")),

    // ── §2.3 R3/R4: anti-join (FK orphans) ──
    Q("q08_anti_orphans",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).select(col("o_custkey").as("c_custkey")).distinct(),
          Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment"),
      Some("""
        SELECT c_custkey, c_name, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // ── §2.8: the full DQ suite as one summary frame ──
    Q("q09_dq_suite",
      (s, d) => {
        val ev = Tables.events(s, d)
        Quality.summary(Seq(
          "dup_event_id" -> Quality.unique(ev, Seq("event_id")),
          "null_value" -> Quality.notNull(ev, "value"),
          "nonpositive_value" -> Quality.positive(ev, "value"),
          "bad_event_type" -> Quality.acceptedValues(ev, "event_type",
            Seq("click", "view", "purchase", "signup")),
          "orphan_user" -> Quality.relationships(
            ev, "user_id", Tables.customer(s, d), "c_custkey")))
      },
      Some("""
        SELECT 'dup_event_id' AS check_name, CAST((SELECT COUNT(*) FROM (
            SELECT event_id FROM events GROUP BY event_id HAVING COUNT(*) > 1)) AS BIGINT) AS n_violations
        UNION ALL SELECT 'null_value', CAST((SELECT COUNT(*) FROM events WHERE value IS NULL) AS BIGINT)
        UNION ALL SELECT 'nonpositive_value', CAST((SELECT COUNT(*) FROM events
            WHERE value <= 0 OR value IS NULL) AS BIGINT)
        UNION ALL SELECT 'bad_event_type', CAST((SELECT COUNT(*) FROM events
            WHERE event_type NOT IN ('click','view','purchase','signup')
               OR event_type IS NULL) AS BIGINT)
        UNION ALL SELECT 'orphan_user', CAST((SELECT COUNT(*) FROM events e
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT)""")),

    // ── §2.4: general ranking/analytic window (rank + running frame) ──
    Q("q10_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        Tables.orders(s, d).select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          row_number().over(w).as("order_seq"),
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_spend"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(row_number() OVER w AS INTEGER) AS order_seq,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")),

    // ── §2.3 R2 generalized: as-of (point-in-time) join ──
    Q("q11_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"),
            col("event_id").as("last_view_id"), col("ts").as("last_view_ts"))
        Marts.asOfJoin(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("last_view_id", "last_view_ts"))
          .select("event_id", "user_id", "ts", "value", "last_view_id", "last_view_ts")
      },
      Some("""
        WITH u AS (
          SELECT user_id, ts, 1 AS side, event_id, value,
                 NULL::BIGINT AS last_view_id, NULL::TIMESTAMP AS last_view_ts
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT user_id, ts, 0, NULL, NULL, event_id, ts
          FROM events WHERE event_type = 'view'),
        sw AS (
          SELECT side, event_id, user_id, ts, value,
                 last_value(last_view_id IGNORE NULLS) OVER w AS last_view_id,
                 last_value(last_view_ts IGNORE NULLS) OVER w AS last_view_ts
          FROM u
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, side ASC
                       ROWS UNBOUNDED PRECEDING))
        SELECT event_id, user_id, ts, value, last_view_id, last_view_ts
        FROM sw WHERE side = 1""")),

    // ── §2.7 extension: event-time tumbling window aggregation ──
    Q("q12_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("total_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("total_value")),
      Some("""
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""")),

    // ── §2.7 extension: session windows (30-minute gap) ──
    Q("q13_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), sumMoney(col("value")).as("total_value"))
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("n_events"), col("total_value")),
      Some("""
        WITH x AS (
          SELECT user_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)),
        y AS (
          SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC
                    ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM x)
        SELECT user_id, MIN(ts) AS session_start,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM y GROUP BY user_id, sess_id""")),

    // ── §2.3 R2 + §2.5: star-schema revenue rollup (chained broadcast joins) ──
    Q("q14_star_revenue",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(
          sum(dec6(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""
        SELECT c_mktsegment, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment, o_orderpriority"""))
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim.replaceAll("\\s+", " "))).toMap
}
