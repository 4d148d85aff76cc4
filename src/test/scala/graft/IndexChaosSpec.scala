package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.{Failure, Try}
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, CommitConflictException, SnapshotStore}
import graft.operators.{ClusterIndex, Dedup, SearchIndex, VectorIndex}

/** Randomized concurrency soak over the SEARCH-INDEX tier — the chaos
  * discipline applied one level up from BaseDelta: a seeded scheduler
  * interleaves the streaming fold (four state stores: postings,
  * docstats, positions, stats), a DEFERRED eraser (`eraseLogical`), an
  * EAGER eraser (`erase` — three-table rewrite + writer-safe vacuum
  * racing live folds), and a SERVING reader, then checks the final
  * index against the sequential model. The serving reader's invariant
  * is the erasure contract mid-race: a doc whose erasure was acked
  * before the query started must never appear in results, no matter
  * which maintenance was mid-flight. The final stats row must equal the
  * surviving corpus exactly — the lost-correction race (a fold's stats
  * merge computed from pre-correction stats overwriting an erasure's
  * n_docs fix) fails here.
  *
  * Key-space design (the StorageChaosSpec recipe): the appender owns
  * doc ids [0, 500) in disjoint per-batch ranges (append-only corpus),
  * the deferred eraser owns seed docs [10000, 10050), the eager eraser
  * [10050, 10100) — every acked erasure must be gone from search,
  * stats, and (post-materialization) the physical state.
  */
@Soak
class IndexChaosSpec extends SparkSpec {
  import spark.implicits._

  private val AppendBatches = 5

  private def appenderDocs(b: Int) =
    ((b - 1) * 100 until b * 100)
      .map(i => (i.toLong, s"alpha tok${i % 7} w${i % 13}"))
      .toDF("doc_id", "text")

  private def retryConflict[A](maxAttempts: Int)(body: => A): A = {
    var attempt = 0
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    out.get
  }

  /** Root under the given store scheme; `mock` registers the non-atomic
    * object-store FS + the conditional-PUT backend (the
    * CoordinatorChaosSpec recipe), so the same storms prove the index
    * tiers' maintenance protocols on a store whose renames can lie.
    */
  private def chaosRoot(prefix: String, store: String): String = {
    val p = tmpDir(prefix) + "/ix"
    if (store == "mock") {
      spark.sparkContext.hadoopConfiguration
        .set("fs.mock.impl", classOf[MockObjectStoreFileSystem].getName)
      graft.gold.CommitCas.register("mock", MockConditionalPut)
      s"mock:$p"
    } else p
  }

  for ((seed, store) <- Seq((55, "file"), (155, "mock")))
  test(s"index chaos seed=$seed on $store: serving honors acked erasures mid-race; stats survive concurrent corrections") {
    val rnd = new scala.util.Random(seed)
    val st = SearchIndex.State(chaosRoot("index-chaos", store))

    // batch 0 (pre-race): both erasers' seed ranges
    val seeds = (10000L until 10100L).map(i => (i, s"omega common s${i % 5}"))
      .toDF("doc_id", "text")
    SearchIndex.fold(spark, st, seeds, 0L, "doc_id", "text")

    val deferredPlan = Seq.fill(3)(
      Seq.fill(6)(10000L + rnd.nextInt(50)).distinct)
    val eagerPlan = Seq.fill(2)(
      Seq.fill(6)(10050L + rnd.nextInt(50)).distinct)
    val sleeps = Seq.fill(64)(rnd.nextInt(40)).iterator.buffered
    def jitter(): Unit = Thread.sleep(synchronized {
      if (sleeps.hasNext) sleeps.next().toLong else 5L })

    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    // every fold rides its own retry: a concurrent eager erase holds the
    // manifest CAS for whole-table rewrites, and the fold's per-table
    // applied-ledger makes the replay fold exactly the missing remainder
    val appender = () => (1 to AppendBatches).foreach { b =>
      jitter()
      retryConflict(20) { SearchIndex.fold(spark, st, appenderDocs(b),
        b.toLong, "doc_id", "text", maxDeltas = 2) }
    }
    val deferredEraser = () => deferredPlan.foreach { ids =>
      jitter()
      retryConflict(20) {
        SearchIndex.eraseLogical(spark, st, ids.toDF("doc_id")).collect()
      }
      ids.foreach(acked.add(_))
    }
    val eagerEraser = () => eagerPlan.foreach { ids =>
      jitter()
      retryConflict(20) {
        SearchIndex.erase(spark, st, ids.toDF("doc_id"))
      }
      ids.foreach(acked.add(_))
    }
    val searcher = () => (1 to 6).foreach { _ =>
      jitter()
      // snapshot the ack set BEFORE the query: anything acked by then
      // must be invisible no matter how the query interleaves with
      // in-flight maintenance
      val ackedBefore = acked.toArray.map(_.asInstanceOf[Long]).toSet
      val hits = retryConflict(10) {
        SearchIndex.conflictIfRetired(spark, st) {
          SearchIndex.search(spark, st, Seq("omega"))
            .select("doc_id").as[Long].collect().toSet
        }
      }
      val leaked = hits.intersect(ackedBefore)
      assert(leaked.isEmpty,
        s"acked-erased docs served mid-race: ${leaked.toSeq.sorted.take(5)}")
    }

    val bodies: Seq[() => Unit] =
      Seq(appender, deferredEraser, eagerEraser, searcher)
    val pool = Executors.newFixedThreadPool(bodies.size)
    val start = new CountDownLatch(1)
    val futures = bodies.map { b =>
      pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
        def call(): Try[Unit] = { start.await(); Try(b()) }
      })
    }
    start.countDown()
    val results = futures.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()

    results.collect { case Failure(e) => e }.foreach { e =>
      assert(e.isInstanceOf[CommitConflictException],
        s"non-typed leak: ${e.getClass.getName}: ${e.getMessage}")
    }
    assert(results.forall(_.isSuccess),
      "a worker exhausted conflict retries — protocol livelock")

    // sequential model
    val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet
    val omega = SearchIndex.search(spark, st, Seq("omega"))
      .select("doc_id").as[Long].collect().toSet
    assert(omega == (10000L until 10100L).toSet -- erased,
      s"seed-doc survivors wrong: ${omega.size} vs expected " +
        s"${100 - erased.size}")
    val alpha = SearchIndex.search(spark, st, Seq("alpha"))
      .select("doc_id").as[Long].collect().toSet
    assert(alpha == (0L until (AppendBatches * 100).toLong).toSet,
      s"appender docs wrong: got ${alpha.size}, lost folds?")

    // the lost-correction race: stats must equal the surviving corpus
    val stats = SnapshotStore.read(spark, st.statsPath)
      .select("n_docs").as[Long].collect()(0)
    val expectedDocs = AppendBatches * 100L + (100L - erased.size)
    assert(stats == expectedDocs,
      s"stats n_docs $stats != surviving corpus $expectedDocs — a " +
        "concurrent fold merge overwrote an erasure correction (or lost a fold)")

    // quiesced lifecycle close: deferred acks materialize, nothing changes
    Seq(st.postingsTable, st.docstatsTable, st.positionsTable).foreach { t =>
      BaseDelta.materializeErasures(spark, t)
      assert(BaseDelta.pendingTombstones(spark, t).isEmpty,
        s"ledgers still pending on ${t.path}")
    }
    assert(SearchIndex.search(spark, st, Seq("omega"))
      .select("doc_id").as[Long].collect().toSet == omega,
      "materialization changed the served view")
  }

  private def runWorkers(bodies: Seq[() => Unit]): Unit = {
    val pool = Executors.newFixedThreadPool(bodies.size)
    val start = new CountDownLatch(1)
    val futures = bodies.map { b =>
      pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
        def call(): Try[Unit] = { start.await(); Try(b()) }
      })
    }
    start.countDown()
    val results = futures.map(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    results.collect { case Failure(e) => e }.foreach { e =>
      assert(e.isInstanceOf[CommitConflictException],
        s"non-typed leak: ${e.getClass.getName}: ${e.getMessage}")
    }
    assert(results.forall(_.isSuccess),
      "a worker exhausted conflict retries — protocol livelock")
  }

  for ((seed, store) <- Seq((66, "file"), (166, "mock")))
  test(s"cluster chaos seed=$seed on $store: fold-vs-erase serializes on the clusters read-window CAS; final state equals the sequential recompute") {
    val rnd = new scala.util.Random(seed)
    val st = ClusterIndex.State(chaosRoot("cluster-chaos", store))
    // 10 groups of 4 byte-identical docs → ten 4-member clusters
    def groupText(g: Int) =
      s"omega group$g lorem ipsum dolor sit amet shared common tokens here"
    val seeds = (0 until 40).map(i => (10000L + i, groupText(i / 4)))
    ClusterIndex.fold(spark, st, seeds.toDF("doc_id", "text"), 0L,
      "doc_id", "text")

    // appender docs: a third JOIN a seed group's cluster (identical
    // text — the cross-pair whose stale super-node label the read-window
    // CAS must protect against a concurrent erase); the rest are
    // singletons with doc-unique trigrams
    def appendDocs(b: Int) = ((b - 1) * 30 until b * 30).map { i =>
      if (i % 3 == 0) (i.toLong, groupText(i % 10))
      else (i.toLong, s"solo w${i}a w${i}b w${i}c w${i}d w${i}e")
    }.toDF("doc_id", "text")

    val erasePlanA = Seq.fill(2)(
      Seq.fill(7)(10000L + rnd.nextInt(20)).distinct)
    val erasePlanB = Seq.fill(2)(
      Seq.fill(7)(10020L + rnd.nextInt(20)).distinct)
    val sleeps = Seq.fill(64)(rnd.nextInt(60)).iterator.buffered
    def jitter(): Unit = Thread.sleep(synchronized {
      if (sleeps.hasNext) sleeps.next().toLong else 5L })
    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    val appender = () => (1 to 4).foreach { b =>
      jitter()
      retryConflict(40) { ClusterIndex.fold(spark, st, appendDocs(b),
        b.toLong, "doc_id", "text", maxDeltas = 2) }
    }
    def eraser(plan: Seq[Seq[Long]]) = () => plan.foreach { ids =>
      jitter()
      retryConflict(40) {
        ClusterIndex.erase(spark, st, ids.toDF("doc_id"))
      }
      ids.foreach(acked.add(_))
    }
    val reader = () => (1 to 6).foreach { _ =>
      jitter()
      val ackedBefore = acked.toArray.map(_.asInstanceOf[Long]).toSet
      val present = retryConflict(20) {
        ClusterIndex.conflictIfRetired(spark, st) {
          ClusterIndex.clusters(spark, st)
            .select("id").as[Long].collect().toSet
        }
      }
      val leaked = present.intersect(ackedBefore)
      assert(leaked.isEmpty,
        s"acked-erased docs still clustered mid-race: ${leaked.toSeq.sorted.take(5)}")
    }

    runWorkers(Seq(appender, eraser(erasePlanA), eraser(erasePlanB), reader))

    // sequential model: the final corpus fully determines the expected
    // clustering (fold equivalence + erase re-clustering equivalence) —
    // any interleaving-dependent divergence fails here
    val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet
    val surviving = seeds.filterNot { case (id, _) => erased.contains(id) } ++
      (1 to 4).flatMap(b => ((b - 1) * 30 until b * 30).map { i =>
        if (i % 3 == 0) (i.toLong, groupText(i % 10))
        else (i.toLong, s"solo w${i}a w${i}b w${i}c w${i}d w${i}e")
      })
    val all = surviving.toDF("doc_id", "text")
    val comp = Dedup.resolveClusters(
      Dedup.ngramJaccard(all, "doc_id", "text", k = 3, threshold = 0.2))
    val expected = all.select(col("doc_id").as("id")).distinct()
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    val got = ClusterIndex.clusters(spark, st)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      s"final clusters diverge from the sequential recompute:\n got=" +
        got.exceptAll(expected).orderBy("id").collect().take(8).mkString(",") +
        "\n missing=" +
        expected.exceptAll(got).orderBy("id").collect().take(8).mkString(","))
    // erased docs' shingles are physically gone from the postings state
    val postIds = BaseDelta.read(spark, st.postingsTable,
        allowSchemaEvolution = true)
      .select("id").as[Long].distinct().collect().toSet
    assert(postIds.intersect(erased).isEmpty,
      "erased docs' postings survived the rewrite")
  }

  for ((seed, store) <- Seq((77, "file"), (177, "mock")))
  test(s"vector chaos seed=$seed on $store: serving honors acked erasures; eager rewrite + writer-safe vacuum under a live fold stream") {
    val rnd = new scala.util.Random(seed)
    val st = VectorIndex.State(chaosRoot("vector-chaos", store))
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(j => (math.sin(i * 31.0 + j * 7.0) + 1.5).toFloat)
    val seeds = (10000L until 10100L).map(i => (i, vec(i)))
    VectorIndex.fold(spark, st, seeds.toDF("vec_id", "embedding"), 0L,
      "vec_id", "embedding", nCells = 4)

    val eagerPlan = Seq.fill(2)(
      Seq.fill(8)(10000L + rnd.nextInt(50)).distinct)
    val deferredPlan = Seq.fill(3)(
      Seq.fill(8)(10050L + rnd.nextInt(50)).distinct)
    val sleeps = Seq.fill(64)(rnd.nextInt(40)).iterator.buffered
    def jitter(): Unit = Thread.sleep(synchronized {
      if (sleeps.hasNext) sleeps.next().toLong else 5L })
    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    val appender = () => (1 to 5).foreach { b =>
      jitter()
      retryConflict(30) { VectorIndex.fold(spark, st,
        ((b - 1) * 100 until b * 100).map(i => (i.toLong, vec(i.toLong)))
          .toDF("vec_id", "embedding"),
        b.toLong, "vec_id", "embedding", nCells = 4, maxDeltas = 2) }
    }
    val eagerEraser = () => eagerPlan.foreach { ids =>
      jitter()
      retryConflict(30) {
        VectorIndex.erase(spark, st, ids.toDF("vec_id"))
      }
      ids.foreach(acked.add(_))
    }
    val deferredEraser = () => deferredPlan.foreach { ids =>
      jitter()
      retryConflict(30) {
        VectorIndex.eraseLogical(spark, st, ids.toDF("vec_id")).collect()
      }
      ids.foreach(acked.add(_))
    }
    val queries = Seq((-1L, vec(10005L)), (-2L, vec(42L)), (-3L, vec(10077L)))
      .toDF("vec_id", "embedding")
    val searcher = () => (1 to 6).foreach { _ =>
      jitter()
      val ackedBefore = acked.toArray.map(_.asInstanceOf[Long]).toSet
      val hits = retryConflict(20) {
        VectorIndex.conflictIfRetired(spark, st) {
          VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
            k = 30, nProbe = 4)
            .select("neighbor_id").as[Long].collect().toSet
        }
      }
      val leaked = hits.intersect(ackedBefore)
      assert(leaked.isEmpty,
        s"acked-erased vectors served mid-race: ${leaked.toSeq.sorted.take(5)}")
    }

    runWorkers(Seq(appender, eagerEraser, deferredEraser, searcher))

    // final state: exactly the surviving corpus (deferred pending ids
    // already invisible to the merge-on-read view)
    val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet
    val expectedIds = (0L until 500L).toSet ++
      (10000L until 10100L).toSet -- erased
    val gotIds = BaseDelta.read(spark, st.postingsTable,
        allowSchemaEvolution = true)
      .select("id").as[Long].collect().toSet
    assert(gotIds == expectedIds,
      s"index ids diverge: extra=${(gotIds -- expectedIds).toSeq.sorted.take(5)}" +
        s" missing=${(expectedIds -- gotIds).toSeq.sorted.take(5)}")
    // quiesced lifecycle close: deferred acks materialize, view unchanged
    BaseDelta.materializeErasures(spark, st.postingsTable)
    assert(BaseDelta.pendingTombstones(spark, st.postingsTable).isEmpty,
      "postings ledger still pending after materialization")
    assert(BaseDelta.read(spark, st.postingsTable,
        allowSchemaEvolution = true)
      .select("id").as[Long].collect().toSet == expectedIds,
      "materialization changed the index contents")
  }

  test("sweep chaos seed=88: idempotent deferred sweeps race live folds on all three tiers") {
    import graft.operators.{ErasureSweep, Similarity}
    val rnd = new scala.util.Random(88)
    val sst = SearchIndex.State(tmpDir("sweep-chaos") + "/sx")
    val cst = ClusterIndex.State(tmpDir("sweep-chaos") + "/cx")
    val vst = VectorIndex.State(tmpDir("sweep-chaos") + "/vx")

    // shared SUBJECT seeds [10000, 10040), present in ALL THREE indexes
    // (the sweep's premise: one id space across derived artifacts)
    def groupText(g: Int) =
      s"omega group$g lorem ipsum dolor sit amet shared common here"
    def vec(i: Long): Array[Float] =
      Array.tabulate(8)(j => (math.sin(i * 31.0 + j * 7.0) + 1.5).toFloat)
    val seedDocs = (0 until 40).map(i => (10000L + i, groupText(i / 4)))
    SearchIndex.fold(spark, sst, seedDocs.toDF("doc_id", "text"), 0L,
      "doc_id", "text")
    ClusterIndex.fold(spark, cst, seedDocs.toDF("doc_id", "text"), 0L,
      "doc_id", "text")
    VectorIndex.fold(spark, vst,
      (10000L until 10040L).map(i => (i, vec(i))).toDF("vec_id", "embedding"),
      0L, "vec_id", "embedding", nCells = 4)

    def appendDocs(b: Int) = ((b - 1) * 30 until b * 30).map { i =>
      if (i % 4 == 0) (i.toLong, groupText(i % 10))
      else (i.toLong, s"solo w${i}a w${i}b w${i}c w${i}d w${i}e")
    }
    val sweepPlan = Seq.fill(3)(
      Seq.fill(9)(10000L + rnd.nextInt(40)).distinct)
    val sleeps = Seq.fill(96)(rnd.nextInt(50)).iterator.buffered
    def jitter(): Unit = Thread.sleep(synchronized {
      if (sleeps.hasNext) sleeps.next().toLong else 5L })
    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    val searchAppender = () => (1 to 3).foreach { b =>
      jitter()
      retryConflict(40) { SearchIndex.fold(spark, sst,
        appendDocs(b).toDF("doc_id", "text"), b.toLong, "doc_id", "text",
        maxDeltas = 2) }
    }
    val clusterAppender = () => (1 to 3).foreach { b =>
      jitter()
      retryConflict(40) { ClusterIndex.fold(spark, cst,
        appendDocs(b).toDF("doc_id", "text"), b.toLong, "doc_id", "text",
        maxDeltas = 2) }
    }
    val vectorAppender = () => (1 to 3).foreach { b =>
      jitter()
      retryConflict(40) { VectorIndex.fold(spark, vst,
        ((b - 1) * 30 until b * 30).map(i => (i.toLong, vec(i.toLong)))
          .toDF("vec_id", "embedding"),
        b.toLong, "vec_id", "embedding", nCells = 4, maxDeltas = 2) }
    }
    // the sweep worker: a cross-tier conflict (any tier's fold winning a
    // window) retries the WHOLE sweep — the documented idempotence
    // contract exercised under the race, not just after a crash
    val sweeper = () => sweepPlan.foreach { ids =>
      jitter()
      retryConflict(40) {
        ErasureSweep.eraseDerived(spark, ids.toDF("id"),
          search = Seq(sst), vector = Seq(vst), cluster = Seq(cst),
          deferred = true).collect()
      }
      ids.foreach(acked.add(_))
    }
    val reader = () => (1 to 5).foreach { _ =>
      jitter()
      val ackedBefore = acked.toArray.map(_.asInstanceOf[Long]).toSet
      val searchHits = retryConflict(20) {
        SearchIndex.conflictIfRetired(spark, sst) {
          SearchIndex.search(spark, sst, Seq("omega"))
            .select("doc_id").as[Long].collect().toSet
        }
      }
      assert(searchHits.intersect(ackedBefore).isEmpty,
        "swept docs served from the search index mid-race")
      val clustered = retryConflict(20) {
        ClusterIndex.conflictIfRetired(spark, cst) {
          ClusterIndex.clusters(spark, cst)
            .select("id").as[Long].collect().toSet
        }
      }
      assert(clustered.intersect(ackedBefore).isEmpty,
        "swept docs still clustered mid-race")
    }

    runWorkers(Seq(searchAppender, clusterAppender, vectorAppender,
      sweeper, reader))

    // ── per-tier sequential models over the surviving corpus ──
    val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet
    val seedSurvivors = seedDocs.filterNot { case (id, _) => erased(id) }
    // search: "omega" lives in the seed survivors AND the appended
    // group-joining docs (i % 4 == 0 share the seed groups' text)
    val appendedOmega = (0 until 90).filter(_ % 4 == 0).map(_.toLong).toSet
    assert(SearchIndex.search(spark, sst, Seq("omega"))
      .select("doc_id").as[Long].collect().toSet ==
      seedSurvivors.map(_._1).toSet ++ appendedOmega,
      "search tier diverged from the sequential model")
    // cluster: from-scratch recompute over every surviving doc
    val allDocs = (seedSurvivors ++ (1 to 3).flatMap(appendDocs))
      .toDF("doc_id", "text")
    val comp = Dedup.resolveClusters(
      Dedup.ngramJaccard(allDocs, "doc_id", "text", k = 3, threshold = 0.2))
    val expected = allDocs.select(col("doc_id").as("id")).distinct()
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    val gotClusters = ClusterIndex.clusters(spark, cst)
    assert(gotClusters.exceptAll(expected).isEmpty &&
      expected.exceptAll(gotClusters).isEmpty,
      "cluster tier diverged from the sequential recompute")
    // vector: full-probe top-k equals brute force over survivors
    val corpus = ((0L until 90L) ++ seedSurvivors.map(_._1))
      .map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val probes = corpus.filter($"vec_id" < 5)
    val gotV = VectorIndex.topK(spark, vst, probes, "vec_id", "embedding",
      k = 3, nProbe = VectorIndex.nCells(spark, vst))
    val expV = Similarity.bruteForceTopK(probes, corpus, "vec_id",
      "embedding", k = 3)
    assert(gotV.exceptAll(expV).isEmpty && expV.exceptAll(gotV).isEmpty,
      "vector tier diverged from brute force over survivors")
  }
}
