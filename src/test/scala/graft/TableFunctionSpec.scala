package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions

/** The SQL-first TVF surface: each table function must expand to the
  * same result as the Scala operator it names — one implementation, two
  * surfaces (the reference's consumers are dbt/SQL users).
  */
class TableFunctionSpec extends SparkSpec {
  import spark.implicits._

  private def ev = Seq(
    (1L, 10L, "a", 1.0, ts("2024-01-01 00:00:00")),
    (1L, 11L, "a", 2.0, ts("2024-01-02 00:00:00")),
    (2L, 12L, "b", 3.0, ts("2024-01-01 12:00:00")),
    (2L, 13L, "b", 4.0, ts("2024-01-03 00:00:00")),
    (3L, 14L, "a", 5.0, ts("2024-01-02 00:00:00"))
  ).toDF("user_id", "event_id", "event_type", "value", "ts")

  test("scd2_from_changelog TVF matches the Scala operator") {
    GraftExtensions.register(spark)
    ev.createOrReplaceTempView("tvf_events")
    val viaSql = spark.sql(
      """SELECT user_id, event_id, version_n, is_current
        |FROM scd2_from_changelog('tvf_events', 'user_id', 'ts', 'event_id')
        |""".stripMargin).collect().toSet
    val viaApi = graft.gold.Scd2Merge.fromChangeLog(ev, Seq("user_id"),
        "ts", Seq("event_id"))
      .select("user_id", "event_id", "version_n", "is_current")
      .collect().toSet
    assert(viaSql == viaApi)
  }

  test("dedup_latest / upsert_by_key TVFs match the Scala operators") {
    GraftExtensions.register(spark)
    ev.createOrReplaceTempView("tvf_events")
    val dedupSql = spark.sql(
      """SELECT user_id, event_id FROM
        |dedup_latest('tvf_events', 'user_id', 'ts desc,event_id desc')
        |""".stripMargin).collect().toSet
    val dedupApi = graft.silver.Staging.dedupLatest(ev, Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id").collect().toSet
    assert(dedupSql == dedupApi)
    ev.filter($"event_id" <= 12L).createOrReplaceTempView("tvf_cur")
    ev.filter($"event_id" > 12L).createOrReplaceTempView("tvf_inc")
    val upSql = spark.sql(
      """SELECT user_id, event_id FROM
        |upsert_by_key('tvf_cur', 'tvf_inc', 'user_id', 'ts desc,event_id desc')
        |""".stripMargin).collect().toSet
    val upApi = graft.gold.UpsertByKey(
        ev.filter($"event_id" <= 12L), ev.filter($"event_id" > 12L),
        Seq("user_id"), Seq(col("ts").desc, col("event_id").desc))
      .select("user_id", "event_id").collect().toSet
    assert(upSql == upApi)
  }

  test("fk_orphans and minhash_lsh TVFs run from pure SQL") {
    GraftExtensions.register(spark)
    ev.createOrReplaceTempView("tvf_child")
    Seq(1L, 2L).toDF("user_id").createOrReplaceTempView("tvf_parent")
    val orphans = spark.sql(
      """SELECT DISTINCT user_id FROM
        |fk_orphans('tvf_child', 'user_id', 'tvf_parent', 'user_id')
        |""".stripMargin).as[Long].collect().toSet
    assert(orphans == Set(3L))
    Seq((1L, "the quick brown fox jumps over the lazy dog again and again"),
        (2L, "the quick brown fox jumps over the lazy dog again and again"),
        (3L, "completely different content with no overlap at all here"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
    val pairs = spark.sql(
      """SELECT id_a, id_b FROM
        |minhash_lsh('tvf_docs', 'doc_id', 'text', 16, 2, 0.25)
        |""".stripMargin).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
