package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, CommitConflictException, Erasure, MultiSnapshot, SnapshotStore}
import graft.streaming.MultiTableStream

/** Concurrent-committer contention on the pointer stores — the one
  * transactional property the reference gets for free from Snowflake's
  * serialized DML (readme.md:93-97) and this engine must earn at the
  * protocol level: two writers racing one pointer must resolve to
  * either clean serialization (commuting members rebase) or a typed
  * clean failure, NEVER a torn, mixed, or silently lost commit — and
  * everything a loser staged must be reclaimable by vacuum.
  */
class CommitRaceSpec extends SparkSpec {
  import spark.implicits._

  private def tagged(tag: String, n: Int) =
    spark.range(n).select(col("id"), lit(tag).as("writer"))

  private def committedWriters(root: String, table: String): Set[String] =
    MultiSnapshot.read(spark, root, table)
      .select("writer").distinct().collect().map(_.getString(0)).toSet

  /** Run `bodies` concurrently from a common start barrier; returns each
    * body's Try.
    */
  private def race(bodies: Seq[() => Unit]): Seq[Try[Unit]] = {
    val pool = Executors.newFixedThreadPool(bodies.size)
    val start = new CountDownLatch(1)
    val futures = bodies.map { b =>
      pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
        def call(): Try[Unit] = { start.await(); Try(b()) }
      })
    }
    start.countDown()
    val out = futures.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    out
  }

  test("same-table race: one clean winner, typed loser, committed data never mixed") {
    for (round <- 1 to 3) {
      val root = tmpDir(s"race-same-$round") + "/r"
      MultiSnapshot.publish(spark, root, Map("t" -> tagged("seed", 2)))
      val results = race(Seq(
        () => { MultiSnapshot.publish(spark, root,
          Map("t" -> tagged("alpha", 50)), conflictRetries = 3); () },
        () => { MultiSnapshot.publish(spark, root,
          Map("t" -> tagged("beta", 50)), conflictRetries = 3); () }))
      val failures = results.collect { case Failure(e) => e }
      // every failure is the TYPED conflict, nothing else leaked out
      failures.foreach(e => assert(e.isInstanceOf[CommitConflictException],
        s"round $round: unexpected failure ${e}"))
      assert(results.exists(_.isSuccess), s"round $round: no writer won")
      // the committed generation is entirely ONE writer's rows — a torn
      // or co-staged dir would mix tags (the pre-reservation corruption)
      val writers = committedWriters(root, "t")
      assert(writers.size == 1 && Set("alpha", "beta").contains(writers.head),
        s"round $round: committed data mixed/torn: $writers")
      assert(MultiSnapshot.read(spark, root, "t").count() == 50)
      // serial case: if both succeeded, the loser..winner ordering was
      // clean (version advanced twice)
      if (failures.isEmpty)
        assert(MultiSnapshot.currentCommit(spark, root).get.version == 3L)
    }
  }

  test("disjoint-member race: both writers commit via rebase, no conflict") {
    for (round <- 1 to 3) {
      val root = tmpDir(s"race-disj-$round") + "/r"
      MultiSnapshot.publish(spark, root,
        Map("x" -> tagged("seed", 1), "y" -> tagged("seed", 1)))
      val results = race(Seq(
        () => { MultiSnapshot.publish(spark, root,
          Map("x" -> tagged("alpha", 10)), conflictRetries = 5); () },
        () => { MultiSnapshot.publish(spark, root,
          Map("y" -> tagged("beta", 20)), conflictRetries = 5); () }))
      results.foreach {
        case Failure(e) => fail(s"round $round: commuting writer failed: $e")
        case Success(_) => ()
      }
      // one consistent final commit carries BOTH advances
      assert(committedWriters(root, "x") == Set("alpha"))
      assert(committedWriters(root, "y") == Set("beta"))
      assert(MultiSnapshot.read(spark, root, "x").count() == 10)
      assert(MultiSnapshot.read(spark, root, "y").count() == 20)
      assert(MultiSnapshot.currentCommit(spark, root).get.version == 3L)
    }
  }

  test("three-way disjoint race: rebase chains land all three commits") {
    for (round <- 1 to 2) {
      val root = tmpDir(s"race-3w-$round") + "/r"
      MultiSnapshot.publish(spark, root, Map(
        "x" -> tagged("seed", 1), "y" -> tagged("seed", 1),
        "z" -> tagged("seed", 1)))
      val results = race(Seq(
        () => { MultiSnapshot.publish(spark, root,
          Map("x" -> tagged("alpha", 5)), conflictRetries = 8); () },
        () => { MultiSnapshot.publish(spark, root,
          Map("y" -> tagged("beta", 6)), conflictRetries = 8); () },
        () => { MultiSnapshot.publish(spark, root,
          Map("z" -> tagged("gamma", 7)), conflictRetries = 8); () }))
      results.foreach {
        case Failure(e) => fail(s"round $round: commuting writer failed: $e")
        case Success(_) => ()
      }
      // one final commit carries all three advances, versions strictly
      // serialized (2 seeds? no — seed v1, then three commits → v4)
      assert(MultiSnapshot.currentCommit(spark, root).get.version == 4L)
      assert(committedWriters(root, "x") == Set("alpha") &&
        committedWriters(root, "y") == Set("beta") &&
        committedWriters(root, "z") == Set("gamma"))
      assert(MultiSnapshot.read(spark, root, "x").count() == 5)
      assert(MultiSnapshot.read(spark, root, "y").count() == 6)
      assert(MultiSnapshot.read(spark, root, "z").count() == 7)
    }
  }

  test("conflictRetries = 0 refuses ANY interleaved commit (strict serialization)") {
    val root = tmpDir("race-strict") + "/r"
    MultiSnapshot.publish(spark, root, Map("x" -> tagged("seed", 1)))
    // simulate the interleave deterministically: stage-then-lose by
    // publishing from a stale observation — publish reads the commit at
    // entry, so advance the root from "elsewhere" between two calls is
    // not observable; instead race many rounds and require that any
    // failure is typed and any success is serial
    val results = race(Seq(
      () => { MultiSnapshot.publish(spark, root,
        Map("x" -> tagged("alpha", 5)), conflictRetries = 0); () },
      () => { MultiSnapshot.publish(spark, root,
        Map("y" -> tagged("beta", 5)), conflictRetries = 0); () }))
    results.foreach {
      case Failure(e) => assert(e.isInstanceOf[CommitConflictException])
      case Success(_) => ()
    }
    assert(results.exists(_.isSuccess))
  }

  test("vacuum reclaims a CAS loser's orphaned generations and markers") {
    val root = tmpDir("race-vac") + "/r"
    MultiSnapshot.publish(spark, root, Map("t" -> tagged("seed", 2)))
    // force losers until at least one conflict occurred
    var sawConflict = false
    var tries = 0
    while (!sawConflict && tries < 10) {
      tries += 1
      val results = race(Seq(
        () => { MultiSnapshot.publish(spark, root,
          Map("t" -> tagged("alpha", 10))); () },
        () => { MultiSnapshot.publish(spark, root,
          Map("t" -> tagged("beta", 10))); () }))
      sawConflict = results.exists(_.isFailure)
    }
    assume(sawConflict, "scheduler never produced a real race in 10 rounds")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    assert(before.count(_.startsWith("gen=")) > 1,
      s"expected a loser's orphan generation on disk, saw $before")
    val deleted = MultiSnapshot.vacuum(spark, root)
    assert(deleted.nonEmpty)
    val after = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/t"))
      .map(_.getPath.getName).toSet
    val cur = MultiSnapshot.currentCommit(spark, root).get.gens("t")
    assert(after.filter(_.startsWith("gen=")) == Set(s"gen=$cur"),
      s"vacuum left orphans: $after")
    assert(!after.exists(_.startsWith(".reserve.")),
      s"vacuum left reservation markers: $after")
    // the table still reads exactly the winner's rows
    assert(MultiSnapshot.read(spark, root, "t").count() == 10)
    assert(committedWriters(root, "t").size == 1)
  }

  // ── the realistic production collision: a streaming coordinator fold
  //    racing a coordinated ERASURE on the same root ──
  private def cdc(rows: (String, Int, Long, Double, Long)*) =
    rows.toSeq.map { case (r, a, t, am, q) =>
      (r, a, t, am, "c", q, ts(f"2024-01-${q % 27 + 1}%02d 00:00:00"))
    }.toDF("route", "account_id", "txn_id", "amount", "op", "seq", "ts")

  private val dimSpec = MultiTableStream.Scd2Dim("accounts", "acct",
    Seq("account_id"), Seq("amount"), "ts", tieBreak = Seq("seq"),
    opCol = Some("op"),
    project = _.select("account_id", "amount", "op", "seq", "ts"))
  private val factSpec = MultiTableStream.UpsertFact("txns", "txn",
    Seq("txn_id"), Seq("seq"), opCol = Some("op"),
    project = _.select("txn_id", "account_id", "amount", "op", "seq", "ts"))

  test("stream fold racing coordinated erasure: clean outcomes only, ledger intact, post-race state exact") {
    for (round <- 1 to 2) {
      val root = tmpDir(s"race-mts-$round") + "/r"
      MultiTableStream.foldBatch(spark, root,
        cdc(("acct", 1, -1L, 1.0, 1L), ("acct", 2, -1L, 2.0, 2L),
          ("txn", 1, 101L, 5.0, 3L), ("txn", 2, 102L, 6.0, 4L)),
        "route", Seq(dimSpec), Seq(factSpec), 0L)
      val results = race(Seq(
        () => MultiTableStream.foldBatch(spark, root,
          cdc(("txn", 1, 103L, 7.0, 5L)), "route", Seq(dimSpec),
          Seq(factSpec), 1L),
        () => { Erasure.eraseCoordinated(spark, root,
          Map("accounts" -> "account_id", "txns" -> "account_id"),
          Seq(2).toDF("account_id")); () }))
      // every failure is typed conflict; retry the failed role
      // sequentially (the documented recovery) and the final state must
      // be exact
      results.foreach {
        case Failure(e) =>
          assert(e.isInstanceOf[CommitConflictException],
            s"round $round: untyped failure $e")
        case Success(_) => ()
      }
      if (results(0).isFailure)
        MultiTableStream.foldBatch(spark, root,
          cdc(("txn", 1, 103L, 7.0, 5L)), "route", Seq(dimSpec),
          Seq(factSpec), 1L)
      if (results(1).isFailure)
        Erasure.eraseCoordinated(spark, root,
          Map("accounts" -> "account_id", "txns" -> "account_id"),
          Seq(2).toDF("account_id"))
      // batch 1 folded exactly once, subject 2 fully erased
      assert(MultiTableStream.lastFoldedBatch(spark, root).contains(1L))
      val t = MultiTableStream.readCommitted(spark, root)
      val txns = t("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      assert(txns.contains(103L), s"round $round: batch 1 lost: $txns")
      assert(!txns.contains(102L), s"round $round: erasure lost: $txns")
      assert(t("accounts").filter($"account_id" === 2).isEmpty)
      // a replay of batch 1 after all that is still a no-op
      val v = MultiSnapshot.currentCommit(spark, root).get.version
      MultiTableStream.foldBatch(spark, root,
        cdc(("txn", 1, 103L, 7.0, 5L)), "route", Seq(dimSpec),
        Seq(factSpec), 1L)
      assert(MultiSnapshot.currentCommit(spark, root).get.version == v)
    }
  }

  test("SnapshotStore: stale staged generation and lost CAS fail with the typed conflict; vacuum reclaims") {
    val path = tmpDir("race-ss") + "/t"
    SnapshotStore.publish(tagged("seed", 2), path)
    // writer B stages from the current state…
    val stagedGen = SnapshotStore.stage(tagged("beta", 5), path)
    // …then writer A publishes first (the race, serialized deterministically)
    SnapshotStore.publish(tagged("alpha", 7), path)
    val e = intercept[CommitConflictException](
      SnapshotStore.commit(spark, path, stagedGen))
    assert(e.getMessage.contains("concurrent publish won"))
    // readers see the winner, untouched (the winner's own stage of the
    // same generation number replaced the loser's stale bytes)
    assert(SnapshotStore.read(spark, path).select("writer").distinct()
      .collect().map(_.getString(0)).toSet == Set("alpha"))
    // a CRASHED stager's generation (staged above current, never
    // committed) is the orphan shape here; vacuum reclaims it
    val crashedGen = SnapshotStore.stage(tagged("crashed", 9), path)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(
      SnapshotStore.genPath(path, crashedGen))
    assert(f.exists(orphan))
    SnapshotStore.vacuum(spark, path)
    assert(!f.exists(orphan), "crashed stager's generation survived vacuum")
    assert(SnapshotStore.read(spark, path).count() == 7)
    // (same-table staging is collision-free here too: stage() RESERVES
    // its generation number via create-exclusive markers, so true-
    // concurrent stagers write disjoint dirs — the read-merge-publish
    // race itself is pinned by CommitStoreSpec's publishFrom test. The
    // commit point above is what this store guarantees: a stale writer
    // can never overwrite a committed generation silently.)
  }

  test("index fold racing a manual OPTIMIZE on the same state: clean outcomes, serving parity after redo") {
    // the verdict's named production collision: a streaming index
    // maintainer and a manual compaction racing one manifest pointer
    import graft.operators.{SearchIndex, TextAnalysis}
    val corpus = Seq(
      (1L, "bank account risk data bank"), (2L, "data data lake house"),
      (3L, "risk model bank"), (4L, "totally unrelated words here"),
      (5L, "account account account"))
    def docs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    for (round <- 1 to 2) {
      val st = SearchIndex.State(tmpDir(s"race-idx-$round") + "/s")
      SearchIndex.fold(spark, st, docs(corpus.take(3)), 0L, "doc_id", "text")
      val results = race(Seq(
        () => SearchIndex.fold(spark, st, docs(corpus.drop(3)), 1L,
          "doc_id", "text"),
        () => BaseDelta.compact(spark, st.postingsTable)))
      results.foreach {
        case Failure(e) => assert(e.isInstanceOf[CommitConflictException],
          s"round $round: untyped failure $e")
        case Success(_) => ()
      }
      // redo any loser sequentially (the documented recovery); the
      // crash-tail fold semantics make a partial batch-1 complete itself
      if (results(0).isFailure)
        SearchIndex.fold(spark, st, docs(corpus.drop(3)), 1L, "doc_id", "text")
      if (results(1).isFailure) BaseDelta.compact(spark, st.postingsTable)
      // serving parity with the from-scratch build, whatever interleaved
      val got = SearchIndex.search(spark, st, Seq("bank", "data", "account"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = TextAnalysis.bm25(docs(corpus), "doc_id", "text",
          Seq("bank", "data", "account"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"round $round: post-race serving diverged")
      // and a replay of batch 1 stays a no-op
      SearchIndex.fold(spark, st, docs(corpus.drop(3)), 1L, "doc_id", "text")
      assert(SearchIndex.search(spark, st, Seq("bank", "data", "account"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        == want, s"round $round: replay after race perturbed the index")
    }
  }

  test("BaseDelta manifest CAS loss is a typed clean failure") {
    val t = BaseDelta.Table(tmpDir("race-bd") + "/t", Seq("k"), Seq("v"), None)
    BaseDelta.append(spark, t, Seq((1, 1L)).toDF("k", "v"), 0L)
    BaseDelta.compact(spark, t) // manifest exists now
    val results = race(Seq(
      () => BaseDelta.append(spark, t, Seq((2, 2L)).toDF("k", "v"), 1L),
      () => BaseDelta.append(spark, t, Seq((3, 3L)).toDF("k", "v"), 2L)))
    // single-writer table: concurrent appends either serialize or fail
    // TYPED — never silently drop a manifest update
    results.foreach {
      case Failure(e) => assert(e.isInstanceOf[CommitConflictException],
        s"untyped failure $e")
      case Success(_) => ()
    }
    // THE lost-update pin: every append that RETURNED SUCCESS must be in
    // the committed manifest — the pre-fix writeManifest recomputed its
    // version from a fresh listing, so a stale-derived manifest could
    // commit under a higher version and silently drop the other
    // writer's delta without any rename collision
    val applied = BaseDelta.deltaBatches(spark, t).toSet
    results.zip(Seq(1L, 2L)).foreach { case (r, b) =>
      if (r.isSuccess)
        assert(applied.contains(b),
          s"append of batch $b returned success but the manifest lost it")
    }
    // re-drive any loser sequentially; both batches must then be present
    if (!applied.contains(1L))
      BaseDelta.append(spark, t, Seq((2, 2L)).toDF("k", "v"), 1L)
    if (!applied.contains(2L))
      BaseDelta.append(spark, t, Seq((3, 3L)).toDF("k", "v"), 2L)
    assert(BaseDelta.read(spark, t).select("k").collect()
      .map(_.getInt(0)).toSet == Set(1, 2, 3))
  }

  test("two concurrent logicalErase on one column: both acks survive in the union ledger") {
    for (round <- 1 to 2) {
      val t = BaseDelta.Table(tmpDir(s"race-er-$round") + "/t",
        Seq("id"), Seq("v"), None)
      BaseDelta.append(spark, t,
        (1L to 20L).map(i => (i, i)).toDF("id", "v"), 0L)
      val results = race(Seq(
        () => { BaseDelta.logicalErase(spark, t, "id",
          Seq(1L, 2L, 3L).toDF("id")); () },
        () => { BaseDelta.logicalErase(spark, t, "id",
          Seq(10L, 11L).toDF("id")); () }))
      // logicalErase retries its ledger publish internally (bounded) —
      // a surfaced failure here means the retry contract broke
      results.foreach {
        case Failure(e) => fail(s"round $round: eraser failed: $e")
        case Success(_) => ()
      }
      val visible = BaseDelta.read(spark, t)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(visible == (1L to 20L).toSet -- Set(1L, 2L, 3L, 10L, 11L),
        s"round $round: an acked erasure is still readable: $visible")
      // the ledger is the UNION — the pre-fix shared staging dir let the
      // loser's overwrite tear the winner's committed ids out
      val pending = BaseDelta.pendingTombstones(spark, t)("id")
        .collect().map(_.getLong(0)).toSet
      assert(pending == Set(1L, 2L, 3L, 10L, 11L),
        s"round $round: acked ids fell out of the ledger: $pending")
    }
  }

  test("full fold racing a fresh logicalErase: the newcomer's ack is never discarded") {
    for (round <- 1 to 3) {
      val t = BaseDelta.Table(tmpDir(s"race-fold-er-$round") + "/t",
        Seq("id"), Seq("v"), None)
      BaseDelta.append(spark, t,
        (1L to 20L).map(i => (i, i)).toDF("id", "v"), 0L)
      BaseDelta.logicalErase(spark, t, "id", Seq(1L, 2L).toDF("id"))
      val results = race(Seq(
        () => BaseDelta.compact(spark, t),
        () => { BaseDelta.logicalErase(spark, t, "id",
          Seq(5L).toDF("id")); () }))
      results.foreach {
        case Failure(e) => assert(e.isInstanceOf[CommitConflictException],
          s"round $round: untyped failure $e")
        case Success(_) => ()
      }
      if (results(0).isFailure) BaseDelta.compact(spark, t)
      assert(results(1).isSuccess, s"round $round: eraser failed")
      // the user-visible pin: everything acked is unreachable, whichever
      // way the fold and the erase interleaved
      val visible = BaseDelta.read(spark, t)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(visible == (1L to 20L).toSet -- Set(1L, 2L, 5L),
        s"round $round: an acked erasure resurfaced: $visible")
      // and the ledger-integrity pin: if id 5's row still exists
      // physically (the fold's ledger read predated its ack), the ledger
      // MUST still list it — the pre-fix blind clearTombstones wiped the
      // whole ledger after the fold, silently discarding the newcomer
      // and upgrading its receipt to 'materialized'
      val baseIds = spark.read
        .parquet(BaseDelta.currentBasePath(spark, t).get)
        .select("id").collect().map(_.getLong(0)).toSet
      if (baseIds.contains(5L))
        assert(BaseDelta.pendingTombstones(spark, t).get("id")
          .exists(_.collect().map(_.getLong(0)).toSet.contains(5L)),
          s"round $round: acked id 5 discarded from the ledger while its row persists")
      // a later full fold materializes whatever stayed pending
      BaseDelta.compact(spark, t, transform = Some(identity))
      assert(BaseDelta.pendingTombstones(spark, t).isEmpty,
        s"round $round: pending ids failed to materialize")
      assert(spark.read.parquet(BaseDelta.currentBasePath(spark, t).get)
        .select("id").collect().map(_.getLong(0)).toSet ==
        (1L to 20L).toSet -- Set(1L, 2L, 5L),
        s"round $round: physical rewrite incomplete")
    }
  }
}
