package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical-name → Parquet-path catalog (SURVEY.md §2 row 8: the reference's
  * dbt `sources.yaml` scan roots become a table registry here).
  *
  * Driver test tables live at `$dir/<name>.parquet` (TESTDATA.md). Reads are
  * plain `spark.read.parquet` so Catalyst gets full pushdown/pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Catalog cache: a loaded table is an immutable logical plan, so reuse
  // it per (session, path) — repeated `spark.read.parquet` calls otherwise
  // re-read footers and re-infer schema on every query invocation.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(spark), s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in three physical shapes across testdata
    * generations — Parquet TIMESTAMP(NANOS) (unreadable natively: read
    * nanos as long via `nanosAsLong` and convert with integer arithmetic;
    * double division would lose precision at 1e18 ns), plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (reads as
    * TIMESTAMP_NTZ), and UTC-adjusted TIMESTAMP. Normalize all three to
    * session-tz TimestampType so every downstream query sees one type.
    *
    * The NTZ→TZ cast reads the wall-clock through the SESSION time zone,
    * so UTC is pinned here, not assumed of the caller — an entry point
    * built without `spark.sql.session.timeZone=UTC` (e.g. a bare Bench
    * session on a non-UTC JVM) would otherwise shift instants and move
    * ts-literal filters like the q14 watermark split. Any OTHER physical
    * type fails loudly: a silent catch-all cast would interpret a future
    * testdata shape (String, or Integer-as-epoch-seconds) as wrong
    * instants with no error.
    */
  def events(s: SparkSession, d: String): DataFrame =
    cache.computeIfAbsent(
      (System.identityHashCode(s), s"$d/events.parquet#converted"),
      _ => {
        import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
        import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.conf.set("spark.sql.session.timeZone", "UTC")
        val raw = s.read.parquet(s"$d/events.parquet")
        raw.schema("ts").dataType match {
          case LongType      => raw.withColumn("ts",
            timestamp_micros(expr("ts DIV 1000")))
          case TimestampType => raw
          case TimestampNTZType => raw.withColumn("ts",
            col("ts").cast(TimestampType))
          case other => sys.error(
            s"Tables.events: unsupported physical type for events.ts: $other " +
              "— add an explicit instant-preserving conversion rather than " +
              "letting a blind cast guess")
        }
      })
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works too
    * (`events` goes through its nanos-aware reader).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
