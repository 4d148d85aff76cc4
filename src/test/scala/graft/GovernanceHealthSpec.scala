package graft

import org.apache.spark.sql.functions._
import graft.operators.{ClusterIndex, ErasureSweep, SearchIndex, VectorIndex}

/** The governance-health mart (ErasureSweep.governanceHealth): the
  * deterministic receipt/ledger states ride q268's hard DuckDB oracle;
  * this spec pins what the oracle can't — the repair-marker LIFECYCLE
  * (budget-tripped erase marks → mart reads pending/repair →
  * repairStructural converges → mart reads clear/ok), whose counts
  * depend on cluster structure.
  */
class GovernanceHealthSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def martRow(df: org.apache.spark.sql.DataFrame,
                      component: String, item: String) =
    df.filter(col("component") === component && col("item") === item)
      .collect().map(r => (r.getAs[String]("status"),
        r.getAs[Long]("n_pending"), r.getAs[String]("action")))

  test("repair-marker lifecycle: budget-tripped erase -> pending/repair -> repairStructural -> clear/ok") {
    val st = Fixtures.cluster3Copy(spark, d)
    val ledger = tmpDir("gh-ledger") + "/r"
    // a sweep so the receipts component is populated too
    ErasureSweep.eraseDerivedLedgered(spark, ledger, 1L,
      Seq(3L).toDF("doc_id"), cluster = Seq(st), deferred = true)
    // budget-tripped logical erase: maxAffected = 0 forces relabel-now +
    // marked async structural repair. The subject must sit in a
    // NON-SINGLETON cluster (a singleton erase has nothing to re-pair),
    // so pick one from the index itself.
    val member = ClusterIndex.clustersNonSingleton(spark, st)
      .agg(min(col("id"))).collect().head.getLong(0)
    ClusterIndex.eraseLogical(spark, st, Seq(member).toDF("doc_id"),
      maxAffected = 0L)
    val before = ErasureSweep.governanceHealth(spark, ledger,
      cluster = Seq(st))
    val marked = martRow(before, "repair_marker", "marked_clusters")
    assert(marked.length == 1)
    assert(marked.head._1 == "pending" && marked.head._2 > 0 &&
      marked.head._3 == "repair", marked.head)
    // postings ledger must read pending too (3 subjects erased logically)
    val ledgerRows = martRow(before, "tombstone_ledger", "postings")
    assert(ledgerRows.head._1 == "pending" && ledgerRows.head._2 > 0,
      ledgerRows.head)

    assert(ClusterIndex.repairStructural(spark, st), "repair did not run")
    val after = ErasureSweep.governanceHealth(spark, ledger,
      cluster = Seq(st))
    val cleared = martRow(after, "repair_marker", "marked_clusters")
    assert(cleared.head == (("clear", 0L, "ok")), cleared.head)
  }

  test("mixed-artifact mart: receipt upgrade tracks materialization; fixed schema") {
    val sst = Fixtures.search3Copy(spark, d)
    val vst = Fixtures.vector3Copy(spark, d)
    val ledger = tmpDir("gh-ledger2") + "/r"
    ErasureSweep.eraseDerivedLedgered(spark, ledger, 1L,
      Seq(2L, 9L).toDF("id"), search = Seq(sst), vector = Seq(vst),
      deferred = true)
    val before = ErasureSweep.governanceHealth(spark, ledger,
      search = Seq(sst), vector = Seq(vst))
    assert(before.columns.toSeq == Seq("component", "artifact", "root",
      "item", "status", "n_pending", "action"))
    // root disambiguates same-type artifacts — the pane mart's key
    assert(before.filter(col("component") === "tombstone_ledger" &&
      col("root") =!= sst.root && col("root") =!= vst.root).count() == 0)
    // both receipts pending, all four ledger rows pending
    assert(before.filter(col("component") === "receipt" &&
      col("status") === "pending").count() == 2)
    assert(before.filter(col("component") === "tombstone_ledger" &&
      col("status") === "pending").count() == 4)
    // materialize ONLY the search tier: its receipt upgrades, vector stays
    Seq(sst.postingsTable, sst.docstatsTable, sst.positionsTable)
      .foreach(t => graft.gold.BaseDelta.materializeErasures(spark, t))
    val after = ErasureSweep.governanceHealth(spark, ledger,
      search = Seq(sst), vector = Seq(vst))
    val searchReceipt = after.filter(col("component") === "receipt" &&
      col("artifact") === "search_index").collect().head
    assert(searchReceipt.getAs[String]("status") == "materialized" &&
      searchReceipt.getAs[String]("action") == "ok")
    val vecReceipt = after.filter(col("component") === "receipt" &&
      col("artifact") === "vector_index").collect().head
    assert(vecReceipt.getAs[String]("status") == "pending")
    assert(after.filter(col("component") === "tombstone_ledger" &&
      col("artifact") === "search_index" &&
      col("status") === "clear").count() == 3)
  }

  test("lsh artifact: pane tracks both ledgers; receipt upgrades on materialization") {
    import graft.operators.LshVectorIndex
    val st = LshVectorIndex.State(tmpDir("gh-lsh") + "/s")
    LshVectorIndex.fold(spark,
      st, Tables.embeddings(spark, d).filter(col("vec_id") <= 40),
      0L, "vec_id", "embedding", numTables = 4, numPlanes = 4)
    val ledger = tmpDir("gh-ledger3") + "/r"
    ErasureSweep.eraseDerivedLedgered(spark, ledger, 1L,
      Seq(2L, 9L).toDF("id"), lsh = Seq(st), deferred = true)
    val before = ErasureSweep.governanceHealth(spark, ledger, lsh = Seq(st))
    assert(before.filter(col("component") === "receipt" &&
      col("artifact") === "lsh_vector_index" &&
      col("status") === "pending").count() == 1)
    // one ledger row per state table, both pending after the deferred ack
    assert(before.filter(col("component") === "tombstone_ledger" &&
      col("artifact") === "lsh_vector_index" &&
      col("status") === "pending")
      .select("item").collect().map(_.getString(0)).toSet ==
      Set("vectors", "bands"))
    Seq(st.vectorsTable, st.bandsTable)
      .foreach(t => graft.gold.BaseDelta.materializeErasures(spark, t))
    val after = ErasureSweep.governanceHealth(spark, ledger, lsh = Seq(st))
    val receipt = after.filter(col("component") === "receipt").collect().head
    assert(receipt.getAs[String]("status") == "materialized" &&
      receipt.getAs[String]("action") == "ok")
    assert(after.filter(col("component") === "tombstone_ledger" &&
      col("status") === "clear").count() == 2)
  }

  test("streaming pane: per-batch snapshots match a direct governanceHealth at every boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("gh-pane")
    val st = ClusterIndex.State(s"$root/cx")
    val pane = ErasureSweep.governancePaneTable(s"$root/pane")
    val ms = MemoryStream[(Long, String)]
    val q = graft.streaming.IndexStreams.clusterIndexStream(
      ms.toDF().toDF("doc_id", "text"), st, s"$root/ckpt", "doc_id", "text",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      tombstoneBudget = 1000L,
      pane = Some(graft.streaming.IndexStreams.PaneConfig(
        s"$root/pane", s"$root/receipts")))
    try {
      def docs(b: Int): Seq[(Long, String)] = (0 until 40).map { j =>
        val id = b.toLong * 40 + j
        // every 4th doc duplicates its predecessor batch's text → real
        // cross-batch cluster work for the fold
        val key = if (id % 4 == 0 && id >= 40) id - 40 else id
        (id, s"alpha $key beta ${key % 7} gamma ${key % 13} delta $key epsilon")
      }
      def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.select("component", "artifact", "root", "item", "status",
            "n_pending", "action")
          .collect().map(_.mkString("|")).toSet
      (0 until 4).foreach { b =>
        ms.addData(docs(b))
        q.processAllAvailable()
        if (b == 2) {
          // a mid-run budget-tripped logical erase: markers + pending
          // tombstones must show up in the NEXT batch's pane snapshot
          val member = ClusterIndex.clustersNonSingleton(spark, st)
            .agg(min(col("id"))).collect().head.getLong(0)
          ClusterIndex.eraseLogical(spark, st, Seq(member).toDF("doc_id"),
            maxAffected = 0L)
        }
        // boundary consistency: the pane's latest snapshot is EXACTLY the
        // pane-relevant state the ledgers report right now (the erase
        // between boundaries is intentionally invisible until the next
        // batch refresh — the pane is a per-batch view, not a live one)
        if (b != 2) {
          val latest = ErasureSweep.governancePaneLatest(spark, s"$root/pane")
          assert(latest.select(max(col("as_of_batch"))).head.getLong(0) == b.toLong)
          val direct = ErasureSweep.governanceHealth(spark, s"$root/receipts",
            cluster = Seq(st), tombstoneBudget = 1000L)
          assert(canon(latest) == canon(direct),
            s"pane != direct at batch $b")
        }
      }
      // batch 3's snapshot (after the erase) must carry the repair marker
      // and pending postings the direct view sees — converged again
      val hist = graft.gold.BaseDelta.read(spark, pane)
      assert(hist.select(countDistinct(col("as_of_batch"))).head.getLong(0) == 4L)
      // the batch-3 snapshot shows the erase's pending work OR its
      // completion (the sink's own repair/materialization may clear it
      // within the same batch) — either way it matches the direct view
      val latest = ErasureSweep.governancePaneLatest(spark, s"$root/pane")
      val direct = ErasureSweep.governanceHealth(spark, s"$root/receipts",
        cluster = Seq(st), tombstoneBudget = 1000L)
      assert(canon(latest) == canon(direct))
    } finally q.stop()
  }
}
