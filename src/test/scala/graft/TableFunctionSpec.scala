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

  test("index-tier serving TVFs ≡ their Scala serve forms") {
    import graft.operators.{ClusterIndex, SearchIndex, VectorIndex}
    GraftExtensions.register(spark)
    // search + phrase over one small folded index
    val docs = Seq((1L, "bank account risk risk"), (2L, "data lake account"),
      (3L, "risk risk model"), (4L, "other words entirely")).toDF("doc_id", "text")
    val sst = SearchIndex.State(tmpDir("tvf-si") + "/s")
    SearchIndex.fold(spark, sst, docs, 0L, "doc_id", "text")
    val bm25Sql = spark.sql(
      s"SELECT * FROM search_bm25('${sst.root}', 'account,risk')").collect().toSet
    val bm25Api = SearchIndex.search(spark, sst, Seq("account", "risk"))
      .collect().toSet
    assert(bm25Sql == bm25Api && bm25Sql.nonEmpty)
    val phraseSql = spark.sql(
      s"SELECT * FROM phrase_search('${sst.root}', 'risk risk')").collect().toSet
    val phraseApi = SearchIndex.phraseSearch(spark, sst, Seq("risk", "risk"))
      .collect().toSet
    assert(phraseSql == phraseApi && phraseSql.nonEmpty)
    // vector top-k: nProbe ≤ 0 expands to the full probe (nCells)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val vst = VectorIndex.State(tmpDir("tvf-vi") + "/s")
    VectorIndex.fold(spark, vst, emb, 0L, "vec_id", "embedding", nCells = 4)
    emb.filter($"vec_id" < 5).createOrReplaceTempView("tvf_vq")
    val vSql = spark.sql(
      s"""SELECT * FROM vector_topk('${vst.root}', 'tvf_vq',
         |'vec_id', 'embedding', 3, 0)""".stripMargin).collect().toSet
    val vApi = VectorIndex.topK(spark, vst, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3,
      nProbe = VectorIndex.nCells(spark, vst)).collect().toSet
    assert(vSql == vApi && vSql.nonEmpty)
    // cluster assignments
    val cst = ClusterIndex.State(tmpDir("tvf-ci") + "/s")
    ClusterIndex.fold(spark, cst,
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "alpha beta gamma delta epsilon zeta"),
        (3L, "unrelated text right here")).toDF("doc_id", "text"),
      0L, "doc_id", "text")
    val cSql = spark.sql(
      s"SELECT * FROM cluster_assignments('${cst.root}')").collect().toSet
    val cApi = ClusterIndex.clusters(spark, cst).collect().toSet
    assert(cSql == cApi && cSql.size == 3)
  }

  test("governance TVFs: erase_subjects acks, materialize_erasures upgrades — the GDPR path from pure SQL") {
    import graft.gold.BaseDelta
    import graft.operators.SearchIndex
    val docs = Seq((1L, "bank account risk"), (2L, "data lake account"),
      (3L, "risk model words"), (4L, "other words entirely"))
      .toDF("doc_id", "text")
    val sst = SearchIndex.State(tmpDir("tvf-gov") + "/s")
    SearchIndex.fold(spark, sst, docs, 0L, "doc_id", "text")
    Seq(1L, 3L).toDF("doc_id").createOrReplaceTempView("tvf_subjects")
    // deferred ack from SQL: receipt rows say pending, serving excludes NOW
    val receipt = spark.sql(s"""
      SELECT * FROM erase_subjects('search', '${sst.root}',
        'tvf_subjects', true)""").collect()
    assert(receipt.map(r => (r.getAs[String]("artifact"),
      r.getAs[String]("status"), r.getAs[Long]("n_subject_rows"))).toSet
      == Set(("search_index", "pending", 2L)))
    assert(spark.sql(s"SELECT doc_id FROM search_bm25('${sst.root}', 'risk')")
      .collect().isEmpty, "'risk' only occurred in the erased docs")
    assert(BaseDelta.pendingTombstones(spark, sst.docstatsTable).nonEmpty)
    // upgrade from SQL: ledgers retire, bytes rewritten
    val mat = spark.sql(s"""
      SELECT * FROM materialize_erasures('search', '${sst.root}')""").collect()
    assert(mat.length == 3 && mat.forall(_.getAs[Boolean]("pending_cleared")))
    assert(mat.count(_.getAs[Boolean]("had_pending")) == 3)
    Seq(sst.postingsTable, sst.docstatsTable, sst.positionsTable).foreach(t =>
      assert(BaseDelta.pendingTombstones(spark, t).isEmpty))
    // post-upgrade serve equals the never-ingested corpus
    val want = {
      val ref = SearchIndex.State(tmpDir("tvf-gov-ref") + "/s")
      SearchIndex.fold(spark, ref,
        docs.filter($"doc_id".isin(2L, 4L)), 0L, "doc_id", "text")
      SearchIndex.search(spark, ref, Seq("account", "words")).collect().toSet
    }
    val got = spark.sql(
      s"SELECT * FROM search_bm25('${sst.root}', 'account,words')")
      .collect().toSet
    assert(got == want && got.nonEmpty)
    // a non-literal kind / unknown kind fails loudly
    intercept[Exception] {
      spark.sql(s"SELECT * FROM materialize_erasures('nope', '${sst.root}')")
        .collect()
    }
  }
}
