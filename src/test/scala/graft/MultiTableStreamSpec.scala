package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.{MultiSnapshot, Scd2Merge, UpsertByKey}
import graft.streaming.MultiTableStream
import graft.streaming.MultiTableStream.{Scd2Dim, UpsertFact}

/** Streaming multi-table atomic commit: a reader resolving the
  * coordinator must NEVER see a fact row whose account has no live dim
  * version — across every batch boundary, crash, and replay — and the
  * folded pair must equal the one-shot batch fold regardless of how the
  * stream cut the log.
  */
class MultiTableStreamSpec extends SparkSpec {
  import spark.implicits._

  // one routed CDC log: (route, account_id, txn_id, account_type, amount,
  // op, seq, ts). Per-key ordering holds (SURVEY §2 row 27); an account's
  // create always lands in the same-or-earlier batch as its first txn,
  // and a cascade delete arrives WITH its account's tombstone.
  private def cdc(rows: (String, Int, Long, String, Double, String, Long, String)*): DataFrame =
    rows.toSeq.map { case (r, a, t, at, am, op, q, s) =>
      (r, a, t, at, am, op, q, ts(s))
    }.toDF("route", "account_id", "txn_id", "account_type", "amount",
      "op", "seq", "ts")

  private val dimSpec = Scd2Dim("accounts", "acct", Seq("account_id"),
    Seq("account_type"), "ts", tieBreak = Seq("seq"), opCol = Some("op"),
    project = _.select("account_id", "account_type", "op", "seq", "ts"))
  private val factSpec = UpsertFact("txns", "txn", Seq("txn_id"),
    Seq("seq"), opCol = Some("op"),
    project = _.select("txn_id", "account_id", "amount", "op", "seq", "ts"))

  private def acct(a: Int, tpe: String, op: String, q: Long, s: String) =
    ("acct", a, -1L, tpe, 0.0, op, q, s)
  private def txn(t: Long, a: Int, am: Double, op: String, q: Long, s: String) =
    ("txn", a, t, null.asInstanceOf[String], am, op, q, s)

  private val batches: Seq[Seq[(String, Int, Long, String, Double, String, Long, String)]] = Seq(
    Seq( // b0: two accounts open, first transactions
      acct(1, "SAVINGS", "c", 1L, "2024-01-01 09:00:00"),
      acct(2, "CHECKING", "c", 2L, "2024-01-01 09:05:00"),
      txn(101L, 1, 50.0, "c", 3L, "2024-01-01 10:00:00"),
      txn(102L, 2, 75.0, "c", 4L, "2024-01-01 10:30:00")),
    Seq( // b1: acct 1 re-types (new SCD2 version); acct 3 opens WITH its
      //     first txn in the same batch; more fact traffic
      acct(1, "CHECKING", "u", 5L, "2024-01-02 09:00:00"),
      acct(3, "SAVINGS", "c", 6L, "2024-01-02 09:10:00"),
      txn(103L, 1, 20.0, "c", 7L, "2024-01-02 10:00:00"),
      txn(104L, 2, 33.0, "c", 8L, "2024-01-02 10:15:00"),
      txn(105L, 3, 12.0, "c", 9L, "2024-01-02 11:00:00")),
    Seq( // b2: acct 2 closes — tombstone + CASCADE tombstones for its
      //     txns (schema.sql's ON DELETE CASCADE arriving as CDC); a
      //     replayed/updated amount on txn 103
      acct(2, "CHECKING", "d", 10L, "2024-01-03 09:00:00"),
      txn(102L, 2, 75.0, "d", 11L, "2024-01-03 09:00:00"),
      txn(104L, 2, 33.0, "d", 12L, "2024-01-03 09:00:00"),
      txn(103L, 1, 21.5, "u", 13L, "2024-01-03 10:00:00")))

  private def foldAll(root: String, upTo: Int): Unit =
    (0 until upTo).foreach { i =>
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq(factSpec), i.toLong)
    }

  /** fact account_ids with no live current dim version — must ALWAYS be
    * empty when read through one coordinator resolve.
    */
  private def orphans(t: Map[String, DataFrame]): Seq[Int] =
    t("txns").join(Scd2Merge.liveFromLog(t("accounts"), "op")
        .select(col("account_id")),
      Seq("account_id"), "left_anti")
      .select("account_id").distinct().collect().map(_.getInt(0)).toSeq

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what\nleft:\n${a.collect().mkString("\n")}\nright:\n${b.collect().mkString("\n")}")

  test("no reader ever sees an orphan fact: FK invariant at every commit point") {
    val root = tmpDir("mts-fk") + "/r"
    for (i <- 1 to batches.size) {
      MultiTableStream.foldBatch(spark, root, cdc(batches(i - 1): _*),
        "route", Seq(dimSpec), Seq(factSpec), (i - 1).toLong)
      val t = MultiTableStream.readCommitted(spark, root)
      assert(orphans(t).isEmpty,
        s"orphan facts after commit $i: ${orphans(t)}")
      // dim invariant: exactly one current version per key
      assert(graft.silver.Quality.uniqueCurrent(t("accounts"),
        Seq("account_id")).isEmpty, s"duplicate current dim rows after commit $i")
      assert(MultiSnapshot.currentCommit(spark, root).get.version == i.toLong)
    }
    // final content checks: acct 2 and its txns are gone, 103 updated
    val t = MultiTableStream.readCommitted(spark, root)
    val liveAccts = Scd2Merge.liveFromLog(t("accounts"), "op")
      .select("account_id").collect().map(_.getInt(0)).toSet
    assert(liveAccts == Set(1, 3))
    val facts = t("txns").select("txn_id", "amount").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(facts == Map(101L -> 50.0, 103L -> 21.5, 105L -> 12.0), facts)
  }

  test("fold over batch cuts equals the one-shot fold of the full log") {
    val root = tmpDir("mts-cut") + "/r"
    foldAll(root, batches.size)
    val t = MultiTableStream.readCommitted(spark, root)
    val all = cdc(batches.flatten: _*)
    val oneDim = Scd2Merge.applyLog(
      Scd2Merge.emptyLogSnapshot(dimSpec.project(all.filter($"route" === "acct")
        .drop("route")), "ts"),
      dimSpec.project(all.filter($"route" === "acct").drop("route")),
      dimSpec.keys, dimSpec.checkCols, "ts", dimSpec.tieBreak, dimSpec.opCol)
    val oneFact = UpsertByKey.mergeBatch(None,
      factSpec.project(all.filter($"route" === "txn").drop("route")),
      factSpec.keys, factSpec.orderCols, factSpec.opCol)
    sameRows(t("accounts"), oneDim, "dim diverges from one-shot fold")
    sameRows(t("txns"), oneFact, "fact diverges from one-shot fold")
  }

  test("replayed and out-of-order batches are no-ops (version ledger)") {
    val root = tmpDir("mts-replay") + "/r"
    foldAll(root, batches.size)
    val before = MultiTableStream.readCommitted(spark, root)
    val dimBefore = before("accounts").collect().toSet
    val factBefore = before("txns").collect().toSet
    val vBefore = MultiSnapshot.currentCommit(spark, root).get.version
    // replay the LAST batch, then an OLD batch
    MultiTableStream.foldBatch(spark, root, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq(factSpec), 2L)
    MultiTableStream.foldBatch(spark, root, cdc(batches(0): _*), "route",
      Seq(dimSpec), Seq(factSpec), 0L)
    val after = MultiTableStream.readCommitted(spark, root)
    assert(MultiSnapshot.currentCommit(spark, root).get.version == vBefore)
    assert(after("accounts").collect().toSet == dimBefore)
    assert(after("txns").collect().toSet == factBefore)
  }

  test("crash after staging, before the pointer PUT: readers untouched, replay overwrites orphans") {
    val root = tmpDir("mts-crash") + "/r"
    foldAll(root, 1) // commit v1
    val t1 = MultiTableStream.readCommitted(spark, root)
    val dimV1 = t1("accounts").collect().toSet
    // simulate a crash mid-publish of batch 1: gen=2 dirs staged with
    // junk, coordinator never flipped
    Seq("accounts", "txns").foreach { tbl =>
      spark.range(3).select(lit("junk").as("garbage"))
        .write.mode("overwrite")
        .parquet(MultiSnapshot.genPath(root, tbl, 2L))
    }
    // a reader resolving the coordinator still sees v1, not the junk
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 1L)
    assert(MultiTableStream.readCommitted(spark, root)("accounts")
      .collect().toSet == dimV1)
    // the replayed batch overwrites the orphan staging dirs and commits
    MultiTableStream.foldBatch(spark, root, cdc(batches(1): _*), "route",
      Seq(dimSpec), Seq(factSpec), 1L)
    val t2 = MultiTableStream.readCommitted(spark, root)
    assert(orphans(t2).isEmpty)
    assert(!t2("accounts").columns.contains("garbage"))
    assert(Scd2Merge.liveFromLog(t2("accounts"), "op")
      .select("account_id").collect().map(_.getInt(0)).toSet == Set(1, 2, 3))
  }

  private val deltaFactSpec = MultiTableStream.DeltaFact("txns", "txn",
    Seq("txn_id"), Seq("seq"), opCol = Some("op"),
    project = _.select("txn_id", "account_id", "amount", "op", "seq", "ts"))

  test("DeltaFact: O(batch) staging, same committed view as the rewrite path") {
    val root = tmpDir("mts-df") + "/r"
    val rootUp = tmpDir("mts-df-up") + "/r"
    for (i <- batches.indices) {
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(deltaFactSpec))
      MultiTableStream.foldBatch(spark, rootUp, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq(factSpec), i.toLong)
      // FK invariant through the pointer-resolved view at every commit
      val t = MultiTableStream.readCommitted(spark, root,
        deltaFacts = Seq(deltaFactSpec))
      assert(orphans(t).isEmpty, s"orphan facts after commit ${i + 1}")
    }
    val viaDelta = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))
    val viaRewrite = MultiTableStream.readCommitted(spark, rootUp)
    sameRows(viaDelta("txns").select("txn_id", "account_id", "amount"),
      viaRewrite("txns").select("txn_id", "account_id", "amount"),
      "DeltaFact view diverges from the whole-table-rewrite view")
    // O(batch) shape: one delta dir per non-empty batch, no base rewrite
    val t = deltaFactSpec.deltaTable(root)
    assert(graft.gold.BaseDelta.deltaBatches(spark, t).toSet == Set(0L, 1L, 2L))
    assert(graft.gold.BaseDelta.currentBasePath(spark, t).isEmpty,
      "no compaction expected below maxDeltas")
  }

  test("DeltaFact: a staged-but-uncommitted delta is invisible to coordinator readers") {
    val root = tmpDir("mts-df-crash") + "/r"
    for (i <- 0 until 2)
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(deltaFactSpec))
    // simulate a crash AFTER the batch-2 delta staged, BEFORE the pointer
    // flip: exactly what foldBatch does up to the publish call
    graft.gold.BaseDelta.append(spark, deltaFactSpec.deltaTable(root),
      deltaFactSpec.project(cdc(batches(2): _*)
        .filter($"route" === "txn").drop("route")), 2L)
    val mid = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))
    val midIds = mid("txns").select("txn_id").collect().map(_.getLong(0)).toSet
    assert(midIds == Set(101L, 102L, 103L, 104L, 105L),
      s"uncommitted batch-2 delta leaked into the committed view: $midIds")
    assert(orphans(mid).isEmpty)
    // the replayed batch overwrites its own delta and flips the pointer
    MultiTableStream.foldBatch(spark, root, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq.empty, 2L, deltaFacts = Seq(deltaFactSpec))
    val t = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))
    assert(t("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 103L, 105L))
    assert(orphans(t).isEmpty)
  }

  test("DeltaFact: compaction cadence keeps the current commit readable") {
    val root = tmpDir("mts-df-compact") + "/r"
    val df2 = deltaFactSpec.copy(maxDeltas = 1) // compact after every 2nd batch
    for (i <- batches.indices)
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(df2))
    val t = MultiTableStream.readCommitted(spark, root, deltaFacts = Seq(df2))
    assert(t("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 103L, 105L))
    assert(orphans(t).isEmpty)
    // compaction actually ran (a base exists) and the floor never passed
    // the committed pointer
    val bt = df2.deltaTable(root)
    assert(graft.gold.BaseDelta.currentBasePath(spark, bt).isDefined)
    val c = graft.gold.MultiSnapshot.currentCommit(spark, root).get
    val ptr = graft.gold.MultiSnapshot.pointer(c, "txns").get
    assert(graft.gold.BaseDelta.timeTravelFloor(spark, bt).forall(_ <= ptr))
  }

  test("budget-tripped materialization: an over-budget deferred erasure materializes at the next fold") {
    import graft.gold.BaseDelta
    val root = tmpDir("mts-budget") + "/r"
    val rootRef = tmpDir("mts-budget-ref") + "/r" // never-erased reference
    for (i <- 0 until 2) {
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(deltaFactSpec))
      MultiTableStream.foldBatch(spark, rootRef, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(deltaFactSpec))
    }
    val t = deltaFactSpec.deltaTable(root)
    // deferred subject erasure on the delta member: ack now, backlog 1 > 0
    BaseDelta.logicalErase(spark, t, "account_id",
      Seq(2).toDF("account_id"), countRows = false)
    assert(BaseDelta.tombstoneBacklogOver(spark, t, 0L))
    // the next fold carries the auto-upgrade (budget 0 = materialize any
    // backlog); batch-2 rows of the erased subject stay suppressed — the
    // pending-window-replay contract — and the fold retires the ledger
    MultiTableStream.foldBatch(spark, root, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq.empty, 2L, deltaFacts = Seq(deltaFactSpec),
      tombstoneBudget = 0L)
    MultiTableStream.foldBatch(spark, rootRef, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq.empty, 2L, deltaFacts = Seq(deltaFactSpec))
    assert(BaseDelta.pendingTombstones(spark, t).isEmpty,
      "over-budget ledger survived the next fold")
    // committed view = the never-erased reference minus the subject
    val got = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))("txns")
      .select("txn_id", "account_id", "amount")
    val want = MultiTableStream.readCommitted(spark, rootRef,
      deltaFacts = Seq(deltaFactSpec))("txns")
      .filter($"account_id" =!= 2)
      .select("txn_id", "account_id", "amount")
    sameRows(got, want, "post-upgrade committed view diverges")
    // the upgrade folded THROUGH this batch's pointer: current commit
    // stays readable as-of, and no delta dir still holds subject bytes
    assert(graft.gold.BaseDelta.readAt(spark, t, 2L)
      .filter($"account_id" === 2).isEmpty)
    assert(BaseDelta.deltaBatches(spark, t).isEmpty,
      "full fold expected — ledger retirement needs kept == empty")
  }

  test("an erasure between micro-batches does not desync the exactly-once ledger") {
    val root = tmpDir("mts-erase-ledger") + "/r"
    foldAll(root, 2) // batches 0,1 committed (v1, v2)
    // out-of-band coordinated erasure: advances the coordinator VERSION
    // without consuming a batch id
    val receipts = graft.gold.Erasure.eraseCoordinated(spark, root,
      Map("accounts" -> "account_id", "txns" -> "account_id"),
      Seq(2).toDF("account_id"))
    assert(receipts.filter($"n_rows_erased" > 0).count() > 0)
    val vAfterErase = MultiSnapshot.currentCommit(spark, root).get.version
    assert(vAfterErase > 2L, "erasure should have advanced the version")
    assert(MultiTableStream.lastFoldedBatch(spark, root).contains(1L),
      "erasure must preserve the batch ledger marker")
    // the NEXT real micro-batch must fold, not be skipped as a replay
    MultiTableStream.foldBatch(spark, root, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq(factSpec), 2L)
    assert(MultiTableStream.lastFoldedBatch(spark, root).contains(2L))
    val t = MultiTableStream.readCommitted(spark, root)
    val facts = t("txns").select("txn_id", "amount").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // batch 2's update to txn 103 landed (the row the version-parity
    // ledger silently dropped); acct 2's rows were already erased and its
    // batch-2 tombstones are no-ops
    assert(facts == Map(101L -> 50.0, 103L -> 21.5, 105L -> 12.0), facts)
    assert(orphans(t).isEmpty)
    // and a true replay of batch 2 is still a no-op
    val vBefore = MultiSnapshot.currentCommit(spark, root).get.version
    MultiTableStream.foldBatch(spark, root, cdc(batches(2): _*), "route",
      Seq(dimSpec), Seq(factSpec), 2L)
    assert(MultiSnapshot.currentCommit(spark, root).get.version == vBefore)
  }

  test("post-flip compaction keeps the PREVIOUS commit's as-of point readable") {
    val root = tmpDir("mts-df-tt") + "/r"
    val df1 = deltaFactSpec.copy(maxDeltas = 1)
    for (i <- batches.indices)
      MultiTableStream.foldBatch(spark, root, cdc(batches(i): _*), "route",
        Seq(dimSpec), Seq.empty, i.toLong, deltaFacts = Seq(df1))
    val bt = df1.deltaTable(root)
    // compaction ran (a base exists), yet the floor stayed at the
    // PREVIOUS commit's pointer — not this batch's
    assert(graft.gold.BaseDelta.currentBasePath(spark, bt).isDefined)
    val prev = MultiSnapshot.commitAt(spark, root, 2L) // previous commit
    val prevPtr = MultiSnapshot.pointer(prev, "txns").get
    assert(prevPtr == 1L)
    assert(graft.gold.BaseDelta.timeTravelFloor(spark, bt).forall(_ <= prevPtr),
      s"floor ${graft.gold.BaseDelta.timeTravelFloor(spark, bt)} passed the previous pointer $prevPtr")
    // the previous commit's fact view resolves — exactly batches 0..1
    val asOf = graft.gold.BaseDelta.readAt(spark, bt, prevPtr)
    assert(asOf.select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 102L, 103L, 104L, 105L))
    // and the current commit still serves the post-tombstone state
    val cur = MultiTableStream.readCommitted(spark, root, deltaFacts = Seq(df1))
    assert(cur("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 103L, 105L))
  }

  private val fkGate = MultiTableStream.fkAudit("txns", "account_id",
    "accounts", "account_id", dimOpCol = Some("op"))

  test("publish gate: a poisoned batch is refused before the flip; a fixed replay publishes") {
    val root = tmpDir("mts-wap") + "/r"
    MultiTableStream.foldBatch(spark, root, cdc(batches(0): _*), "route",
      Seq(dimSpec), Seq(factSpec), 0L, audits = Seq(fkGate))
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 1L)
    // batch 1 poisoned: a txn references account 99 that no dim row creates
    val poisoned = batches(1) :+ txn(199L, 99, 5.0, "c", 99L, "2024-01-02 12:00:00")
    val e = intercept[MultiTableStream.AuditFailedException](
      MultiTableStream.foldBatch(spark, root, cdc(poisoned: _*), "route",
        Seq(dimSpec), Seq(factSpec), 1L, audits = Seq(fkGate)))
    assert(e.getMessage.contains("REFUSED") &&
      e.getMessage.contains("fk_txns_account_id_to_accounts"), e.getMessage)
    // readers keep the batch-0 commit, FK-clean
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 1L)
    val t1 = MultiTableStream.readCommitted(spark, root)
    assert(orphans(t1).isEmpty)
    assert(t1("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 102L))
    // a replay of the same poisoned batch re-audits and fails again
    intercept[MultiTableStream.AuditFailedException](
      MultiTableStream.foldBatch(spark, root, cdc(poisoned: _*), "route",
        Seq(dimSpec), Seq(factSpec), 1L, audits = Seq(fkGate)))
    // the FIXED batch (acct 99 created with its txn) publishes under the
    // same batch id
    val fixed = poisoned :+ acct(99, "SAVINGS", "c", 98L, "2024-01-02 11:59:00")
    MultiTableStream.foldBatch(spark, root, cdc(fixed: _*), "route",
      Seq(dimSpec), Seq(factSpec), 1L, audits = Seq(fkGate))
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 2L)
    val t2 = MultiTableStream.readCommitted(spark, root)
    assert(orphans(t2).isEmpty)
    assert(t2("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      .contains(199L))
  }

  test("publish gate on the DeltaFact path: staged delta stays invisible through a refusal") {
    val root = tmpDir("mts-wap-d") + "/r"
    MultiTableStream.foldBatch(spark, root, cdc(batches(0): _*), "route",
      Seq(dimSpec), Seq.empty, 0L, deltaFacts = Seq(deltaFactSpec),
      audits = Seq(fkGate))
    val poisoned = batches(1) :+ txn(199L, 99, 5.0, "c", 99L, "2024-01-02 12:00:00")
    intercept[MultiTableStream.AuditFailedException](
      MultiTableStream.foldBatch(spark, root, cdc(poisoned: _*), "route",
        Seq(dimSpec), Seq.empty, 1L, deltaFacts = Seq(deltaFactSpec),
        audits = Seq(fkGate)))
    // the batch-1 delta dir exists (staged) but coordinator readers
    // resolve pointer 0 — the poison is invisible
    val mid = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))
    assert(mid("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      == Set(101L, 102L))
    assert(orphans(mid).isEmpty)
    // the fixed batch overwrites ITS OWN staged delta and publishes
    val fixed = poisoned :+ acct(99, "SAVINGS", "c", 98L, "2024-01-02 11:59:00")
    MultiTableStream.foldBatch(spark, root, cdc(fixed: _*), "route",
      Seq(dimSpec), Seq.empty, 1L, deltaFacts = Seq(deltaFactSpec),
      audits = Seq(fkGate))
    val t = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(deltaFactSpec))
    assert(orphans(t).isEmpty)
    assert(t("txns").select("txn_id").collect().map(_.getLong(0)).toSet
      .contains(199L))
  }

  test("property: random CDC histories under random batch cuts never violate FK or uniqueness") {
    // seeded pseudo-random banking histories honoring the CDC delivery
    // contract (per-key ordering; cascade tombstones ride the same step
    // as their account's delete); every step gets a distinct ts
    def genHistory(seed: Int, steps: Int): Seq[Seq[(String, Int, Long, String, Double, String, Long, String)]] = {
      val rnd = new scala.util.Random(seed)
      var seq = 0L
      var nextTxn = 1000L
      val live = scala.collection.mutable.Set[Int]()
      val txnsOf = scala.collection.mutable.Map[Int, List[Long]]()
      (1 to steps).map { step =>
        val ts = f"2024-01-${(step % 27) + 1}%02d ${step % 24}%02d:00:00"
        val rows = scala.collection.mutable.ArrayBuffer[(String, Int, Long, String, Double, String, Long, String)]()
        // maybe create / update / delete one account
        rnd.nextInt(4) match {
          case 0 => // create (possibly re-create)
            val a = rnd.nextInt(8)
            if (!live(a)) { live += a; txnsOf(a) = Nil
              seq += 1; rows += acct(a, if (rnd.nextBoolean()) "SAVINGS" else "CHECKING", "c", seq, ts) }
          case 1 if live.nonEmpty => // type flip
            val a = live.toSeq(rnd.nextInt(live.size))
            seq += 1; rows += acct(a, if (rnd.nextBoolean()) "SAVINGS" else "CHECKING", "u", seq, ts)
          case 2 if live.nonEmpty => // delete + cascade
            val a = live.toSeq(rnd.nextInt(live.size))
            live -= a
            seq += 1; rows += acct(a, "CHECKING", "d", seq, ts)
            txnsOf(a).foreach { t => seq += 1; rows += txn(t, a, 0.0, "d", seq, ts) }
            txnsOf(a) = Nil
          case _ => ()
        }
        // a couple of txns on live accounts
        (0 until rnd.nextInt(3)).foreach { _ =>
          if (live.nonEmpty) {
            val a = live.toSeq(rnd.nextInt(live.size))
            nextTxn += 1; seq += 1
            txnsOf(a) = nextTxn :: txnsOf(a)
            rows += txn(nextTxn, a, rnd.nextInt(1000) / 10.0, "c", seq, ts)
          }
        }
        rows.toSeq
      }
    }
    for (seed <- Seq(7, 42, 99)) {
      val steps = genHistory(seed, 14)
      // two different batch cuts over the SAME history
      val cuts = Seq(Seq(4, 9), Seq(2, 7, 11))
      val finals = cuts.map { cut =>
        val root = tmpDir(s"mts-prop-$seed-${cut.mkString("_")}") + "/r"
        val bounds = (Seq(0) ++ cut ++ Seq(steps.length)).sliding(2).toSeq
        bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
          val rows = steps.slice(lo, hi).flatten
          MultiTableStream.foldBatch(spark, root, cdc(rows: _*), "route",
            Seq(dimSpec), Seq(factSpec), i.toLong)
          val t = MultiTableStream.readCommitted(spark, root)
          assert(orphans(t).isEmpty,
            s"seed $seed cut $cut commit ${i + 1}: orphans ${orphans(t)}")
          assert(graft.silver.Quality.uniqueCurrent(t("accounts"),
            Seq("account_id")).isEmpty,
            s"seed $seed cut $cut commit ${i + 1}: duplicate current dim rows")
        }
        val t = MultiTableStream.readCommitted(spark, root)
        (t("accounts").collect().toSet, t("txns").collect().toSet)
      }
      assert(finals.distinct.size == 1,
        s"seed $seed: different batch cuts reached different final states")
    }
  }

  test("schema evolution: upstream column adds and widenings fold without data loss") {
    val root = tmpDir("mts-evo") + "/r"
    val dimE = MultiTableStream.Scd2Dim("accounts", "acct", Seq("account_id"),
      Seq("account_type"), "ts", tieBreak = Seq("seq"),
      allowSchemaEvolution = true)
    val factE = MultiTableStream.UpsertFact("txns", "txn", Seq("txn_id"),
      Seq("seq"), allowSchemaEvolution = true)
    // epoch 0: original schema, amount is an INT
    val b0 = Seq(("acct", 1, -1L, "SAVINGS", 0, 1L, ts("2024-01-01 09:00:00")),
        ("txn", 1, 100L, null.asInstanceOf[String], 50, 2L, ts("2024-01-01 10:00:00")))
      .toDF("route", "account_id", "txn_id", "account_type", "amount", "seq", "ts")
    MultiTableStream.foldBatch(spark, root,
      b0.filter($"route" === "acct").select("route", "account_id",
        "account_type", "seq", "ts")
        .unionByName(b0.filter($"route" === "txn")
          .select("route", "txn_id", "account_id", "amount", "seq", "ts"),
          allowMissingColumns = true),
      "route",
      Seq(dimE.copy(project = _.select("account_id", "account_type", "seq", "ts"))),
      Seq(factE.copy(project = _.select("txn_id", "account_id", "amount", "seq", "ts"))),
      0L)
    // epoch 1: upstream ALTER TABLE — dim gains `branch`, fact's amount
    // widened to DOUBLE plus a new `channel` column
    val b1 = Seq(
        ("acct", 1, -1L, "CHECKING", 0.0, 3L, ts("2024-01-02 09:00:00"), "HQ", null.asInstanceOf[String]),
        ("txn", 1, 101L, null.asInstanceOf[String], 75.5, 4L, ts("2024-01-02 10:00:00"), null.asInstanceOf[String], "mobile"))
      .toDF("route", "account_id", "txn_id", "account_type", "amount",
        "seq", "ts", "branch", "channel")
    MultiTableStream.foldBatch(spark, root,
      b1.filter($"route" === "acct").select("route", "account_id",
        "account_type", "branch", "seq", "ts")
        .unionByName(b1.filter($"route" === "txn")
          .select("route", "txn_id", "account_id", "amount", "channel",
            "seq", "ts"), allowMissingColumns = true),
      "route",
      Seq(dimE.copy(project = _.select("account_id", "account_type",
        "branch", "seq", "ts"))),
      Seq(factE.copy(project = _.select("txn_id", "account_id", "amount",
        "channel", "seq", "ts"))),
      1L)
    val t = MultiTableStream.readCommitted(spark, root)
    // dim: two versions, old one reads null branch, new one HQ
    val dimRows = t("accounts").orderBy("effective_from").collect()
    assert(dimRows.length == 2)
    assert(dimRows(0).getAs[String]("account_type") == "SAVINGS"
      && dimRows(0).getAs[String]("branch") == null)
    assert(dimRows(1).getAs[String]("account_type") == "CHECKING"
      && dimRows(1).getAs[String]("branch") == "HQ")
    // fact: amount widened to double for BOTH rows, old channel null
    val facts = t("txns").collect()
      .map(r => r.getAs[Long]("txn_id") ->
        ((r.getAs[Double]("amount"), r.getAs[String]("channel")))).toMap
    assert(facts == Map(100L -> ((50.0, null)), 101L -> ((75.5, "mobile"))),
      facts.toString)
  }

  test("streaming end-to-end: MemoryStream triggers, checkpoint restart continues the ledger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("mts-stream") + "/r"
    val ckpt = tmpDir("mts-ckpt")

    def run(data: Seq[Seq[(String, Int, Long, String, Double, String, Long, String)]]): Unit = {
      val ms = MemoryStream[(String, Int, Long, String, Double, String, Long, String)]
      val src = ms.toDF().toDF("route", "account_id", "txn_id",
          "account_type", "amount", "op", "seq", "ts_s")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      val q = MultiTableStream.start(src, root, ckpt, "route",
        Seq(dimSpec), Seq(factSpec),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      data.foreach { b => ms.addData(b); q.processAllAvailable() }
      q.stop()
    }
    run(batches.take(2))
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 2L)
    assert(orphans(MultiTableStream.readCommitted(spark, root)).isEmpty)
    // restart from the SAME checkpoint with the remaining batch: the new
    // MemoryStream restarts batch ids at 0 under this checkpoint? No —
    // a fresh source under the old checkpoint replays ids; feed the
    // tail through a NEW checkpoint to exercise the explicit ledger
    // no-op instead: batch id 0 is already committed, so only the fold
    // ledger decides. Stream the full log again under a fresh
    // checkpoint: ids 0..2, ids 0-1 skip via the version ledger, id 2
    // commits.
    val ckpt2 = tmpDir("mts-ckpt2")
    val ms2 = MemoryStream[(String, Int, Long, String, Double, String, Long, String)]
    val src2 = ms2.toDF().toDF("route", "account_id", "txn_id",
        "account_type", "amount", "op", "seq", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val q2 = MultiTableStream.start(src2, root, ckpt2, "route",
      Seq(dimSpec), Seq(factSpec),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    batches.foreach { b => ms2.addData(b); q2.processAllAvailable() }
    q2.stop()
    assert(MultiSnapshot.currentCommit(spark, root).get.version == 3L)
    val t = MultiTableStream.readCommitted(spark, root)
    assert(orphans(t).isEmpty)
    // equals the pure-batch fold of the full log
    val all = cdc(batches.flatten: _*)
    sameRows(t("txns"), UpsertByKey.mergeBatch(None,
      factSpec.project(all.filter($"route" === "txn").drop("route")),
      factSpec.keys, factSpec.orderCols, factSpec.opCol),
      "streamed fact diverges from batch fold")
  }
}
