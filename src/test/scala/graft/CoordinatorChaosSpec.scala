package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.{Failure, Try}
import org.apache.spark.sql.functions._
import graft.gold.{CommitCas, CommitConflictException, Erasure, MultiSnapshot, Scd2Merge}
import graft.streaming.MultiTableStream

/** Randomized concurrency soak over the COORDINATOR tier — the
  * generalization of CommitRaceSpec's targeted fold-vs-erasure race the
  * same way StorageChaosSpec generalizes the BaseDelta races: a seeded
  * scheduler interleaves the streaming fold (SCD2 dim + upsert fact in
  * one atomic multi-table commit), two concurrent coordinated erasers,
  * and a snapshot READER for dozens of operations, then checks the final
  * state against the sequential model. The reader is the new surface
  * here: every `readCommitted` during the storm must be internally
  * consistent (one commit, never torn across tables), the batch ledger
  * it observes must be monotone, and SCD2/upsert uniqueness invariants
  * must hold mid-race — snapshot isolation, not just final-state
  * convergence.
  *
  * Key-space design keeps the oracle interleaving-independent (the
  * StorageChaosSpec recipe): the appender owns accounts [0, 20) and txns
  * [0, 120) (never erased — each must surface with its LATEST batch's
  * values), erasers own seed accounts [1000, 1020) (written once in
  * batch 0, never re-appended — every acked erasure must be absent from
  * BOTH tables no matter how it interleaved with folds). Workers retry
  * only on the typed CommitConflictException; any other throwable is a
  * protocol leak.
  *
  * Seed 77 runs on `file://`; seed 88 runs the identical storm through
  * [[MockObjectStoreFileSystem]] with [[MockConditionalPut]] registered —
  * the full coordinator protocol carried by a conditional-PUT backend on
  * a filesystem whose rename is deliberately non-atomic (the s3a shape,
  * the reference's MinIO substrate).
  */
@Soak
class CoordinatorChaosSpec extends SparkSpec {
  import spark.implicits._

  private val AppendBatches = 6
  private val ErasesPerEraser = 2

  private def cdcRows(rows: Seq[(String, Long, Long, Double, Long, String)]) =
    rows.map { case (r, a, t, am, q, d) => (r, a, t, am, "c", q, ts(d)) }
      .toDF("route", "account_id", "txn_id", "amount", "op", "seq", "ts")

  private val dimSpec = MultiTableStream.Scd2Dim("accounts", "acct",
    Seq("account_id"), Seq("amount"), "ts", tieBreak = Seq("seq"),
    opCol = Some("op"),
    project = _.select("account_id", "amount", "op", "seq", "ts"))
  private val factSpec = MultiTableStream.UpsertFact("txns", "txn",
    Seq("txn_id"), Seq("seq"), opCol = Some("op"),
    project = _.select("txn_id", "account_id", "amount", "op", "seq", "ts"))
  // O(batch) member for the delta-tier seed: maxDeltas = 2 forces the
  // in-fold bounded compaction to fire nearly every batch, so the
  // manifest-CAS machinery (the phantom-commit fix's home) rides the
  // same storm as the coordinator pointers
  private val deltaSpec = MultiTableStream.DeltaFact("dtxns", "dtxn",
    Seq("txn_id"), Seq("seq"), opCol = Some("op"), maxDeltas = 2,
    project = _.select("txn_id", "account_id", "amount", "op", "seq", "ts"))

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

  /** One batch: every touched account gets exactly one dim row (amount =
    * account*100 + batch) and each touched txn one fact row (seq =
    * batch), so latest-wins resolves per key to the highest touching
    * batch and the SCD2 current amount is that batch's formula.
    */
  private def batchRows(b: Int, rnd: scala.util.Random) = {
    val day = f"2024-02-${b + 1}%02d 00:00:00"
    val accts = (0L until 20L).filter(_ => rnd.nextBoolean())
      .map(a => ("acct", a, -1L, a * 100.0 + b, b.toLong, day))
    val txns = (0L until 120L).filter(_ => rnd.nextInt(3) == 0)
      .map(t => ("txn", t % 20, t, t + b / 10.0, b.toLong, day))
    (accts ++ txns, accts.map(_._2), txns.map(_._3))
  }

  for ((seed, store) <- Seq((77, "file"), (88, "mock"))) {
    test(s"coordinator chaos seed=$seed on $store: atomic multi-table commits, monotone ledger, no lost fold/erasure") {
      val conf = spark.sparkContext.hadoopConfiguration
      if (store == "mock") {
        conf.set("fs.mock.impl", classOf[MockObjectStoreFileSystem].getName)
        CommitCas.register("mock", MockConditionalPut)
      }
      try {
        val rnd = new scala.util.Random(seed)
        val root0 = tmpDir(s"coord-chaos-$seed") + "/r"
        val root = if (store == "mock") s"mock:$root0" else root0

        // batch 0 (pre-race): the erasers' exclusive account range, plus
        // one seed txn per seed account
        val seedRows = (1000L until 1020L).flatMap { a =>
          Seq(("acct", a, -1L, a + 0.5, 0L, "2024-01-01 00:00:00"),
            ("txn", a, a + 9000L, 1.0, 0L, "2024-01-01 00:00:00"))
        }
        MultiTableStream.foldBatch(spark, root, cdcRows(seedRows),
          "route", Seq(dimSpec), Seq(factSpec), 0L)

        // schedules drawn up-front from the one seeded generator
        val plans = (1 to AppendBatches).map(b => batchRows(b, rnd))
        val eraseTargets: Seq[Seq[Seq[Long]]] = Seq.fill(2)(
          Seq.fill(ErasesPerEraser)(
            Seq.fill(3)(1000L + rnd.nextInt(20)).distinct))
        val sleeps = Seq.fill(64)(rnd.nextInt(40)).iterator.buffered
        def jitter(): Unit = Thread.sleep(synchronized {
          if (sleeps.hasNext) sleeps.next().toLong else 5L })

        val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

        val appender = () => (1 to AppendBatches).foreach { b =>
          jitter()
          retryConflict(20) { MultiTableStream.foldBatch(spark, root,
            cdcRows(plans(b - 1)._1), "route", Seq(dimSpec), Seq(factSpec),
            b.toLong) }
        }
        val erasers = eraseTargets.map { plan => () =>
          plan.foreach { ids =>
            jitter()
            retryConflict(20) {
              Erasure.eraseCoordinated(spark, root,
                Map("accounts" -> "account_id", "txns" -> "account_id"),
                ids.toDF("account_id")).collect()
            }
            ids.foreach(acked.add(_))
          }
        }
        // the chaos reader: mid-race snapshot reads must come from ONE
        // commit (never torn), satisfy per-table uniqueness, and observe
        // a monotone batch ledger. A read pinned to a commit an erasure
        // just retired surfaces the TYPED conflict (via conflictIfRetired
        // — the documented reader contract) and re-resolves; any other
        // failure is a leak.
        val reader = () => {
          var lastLedger = -1L
          (1 to 6).foreach { _ =>
            jitter()
            val ledger = retryConflict(10) {
              val c = MultiSnapshot.currentCommit(spark, root).get
              MultiSnapshot.conflictIfRetired(spark, root, Some(c)) {
                val dim = MultiSnapshot.readPinned(spark, root, c, "accounts")
                val maxCur = dim.filter(col(Scd2Merge.EffectiveTo).isNull)
                  .groupBy("account_id").count()
                  .agg(max("count")).collect()(0).getLong(0)
                assert(maxCur == 1L,
                  s"seed $seed: an account held $maxCur current versions mid-race")
                val txns = MultiSnapshot.readPinned(spark, root, c, "txns")
                assert(txns.groupBy("txn_id").count()
                  .filter(col("count") > 1).isEmpty,
                  s"seed $seed: duplicate txn_id in a committed snapshot")
                MultiSnapshot.pointer(c, MultiTableStream.BatchLedger)
                  .getOrElse(-1L)
              }
            }
            assert(ledger >= lastLedger,
              s"seed $seed: ledger regressed $lastLedger -> $ledger")
            lastLedger = ledger
          }
        }

        val bodies: Seq[() => Unit] = Seq(appender) ++ erasers :+ reader
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
            s"seed $seed: non-typed leak: ${e.getClass.getName}: ${e.getMessage}")
        }
        assert(results.forall(_.isSuccess),
          s"seed $seed: a worker exhausted conflict retries — protocol livelock")

        // sequential model
        assert(MultiTableStream.lastFoldedBatch(spark, root)
          .contains(AppendBatches.toLong),
          s"seed $seed: ledger lost a fold")
        val latestAcct: Map[Long, Long] = plans.zipWithIndex
          .flatMap { case (p, i) => p._2.map(_ -> (i + 1).toLong) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        val latestTxn: Map[Long, Long] = plans.zipWithIndex
          .flatMap { case (p, i) => p._3.map(_ -> (i + 1).toLong) }
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet

        val t = MultiTableStream.readCommitted(spark, root)
        val curDim = t("accounts").filter(col(Scd2Merge.EffectiveTo).isNull)
          .select(col("account_id"), col("amount"))
          .as[(Long, Double)].collect().toMap
        latestAcct.foreach { case (a, b) =>
          assert(curDim.get(a).contains(a * 100.0 + b),
            s"seed $seed: account $a expected amount ${a * 100.0 + b} " +
              s"got ${curDim.get(a)} — lost or stale fold")
        }
        val gotTxn = t("txns").select(col("txn_id"), col("seq"))
          .as[(Long, Long)].collect().toMap
        latestTxn.foreach { case (id, b) =>
          assert(gotTxn.get(id).contains(b),
            s"seed $seed: txn $id expected seq=$b got ${gotTxn.get(id)}")
        }
        erased.foreach { a =>
          assert(!curDim.contains(a) &&
            t("accounts").filter(col("account_id") === a).isEmpty,
            s"seed $seed: acked-erased account $a still in the dim")
          assert(!gotTxn.contains(a + 9000L),
            s"seed $seed: acked-erased account $a's txn still readable")
        }
        (1000L until 1020L).filterNot(erased).foreach { a =>
          assert(curDim.get(a).contains(a + 0.5),
            s"seed $seed: untouched seed account $a wrong/missing: ${curDim.get(a)}")
        }

        // quiesced maintenance completes the lifecycle: vacuum reclaims
        // every loser/retired generation and the readable view is
        // unchanged
        MultiSnapshot.vacuum(spark, root)
        val after = MultiTableStream.readCommitted(spark, root)
        assert(after("accounts").filter(col(Scd2Merge.EffectiveTo).isNull)
          .select(col("account_id"), col("amount"))
          .as[(Long, Double)].collect().toMap == curDim,
          s"seed $seed: vacuum changed the committed dim view")
        assert(after("txns").select(col("txn_id"), col("seq"))
          .as[(Long, Long)].collect().toMap == gotTxn,
          s"seed $seed: vacuum changed the committed fact view")
      } finally {
        if (store == "mock") { CommitCas.deregister("mock"); () }
      }
    }
  }

  test("coordinator chaos seed=99 with a BaseDelta member: manifest CAS + mixed eager/deferred erasure under the storm") {
    val rnd = new scala.util.Random(99)
    val root = tmpDir("coord-chaos-99") + "/r"
    val dt = deltaSpec.deltaTable(root)

    // batch 0: seed accounts + one seed delta-fact row per account
    val seedRows = (1000L until 1020L).flatMap { a =>
      Seq(("acct", a, -1L, a + 0.5, 0L, "2024-01-01 00:00:00"),
        ("dtxn", a, a + 9500L, 1.0, 0L, "2024-01-01 00:00:00"))
    }
    MultiTableStream.foldBatch(spark, root, cdcRows(seedRows),
      "route", Seq(dimSpec), Seq.empty, 0L, deltaFacts = Seq(deltaSpec))

    val plans = (1 to AppendBatches).map { b =>
      val day = f"2024-02-${b + 1}%02d 00:00:00"
      val accts = (0L until 20L).filter(_ => rnd.nextBoolean())
        .map(a => ("acct", a, -1L, a * 100.0 + b, b.toLong, day))
      val dtxns = (0L until 120L).filter(_ => rnd.nextInt(3) == 0)
        .map(t => ("dtxn", t % 20, t, t + b.toDouble, b.toLong, day))
      (accts ++ dtxns, accts.map(_._2), dtxns.map(_._3))
    }
    val eraseTargets: Seq[Seq[Seq[Long]]] = Seq.fill(2)(
      Seq.fill(ErasesPerEraser)(
        Seq.fill(3)(1000L + rnd.nextInt(20)).distinct))
    val sleeps = Seq.fill(64)(rnd.nextInt(40)).iterator.buffered
    def jitter(): Unit = Thread.sleep(synchronized {
      if (sleeps.hasNext) sleeps.next().toLong else 5L })

    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

    val appender = () => (1 to AppendBatches).foreach { b =>
      jitter()
      retryConflict(20) { MultiTableStream.foldBatch(spark, root,
        cdcRows(plans(b - 1)._1), "route", Seq(dimSpec), Seq.empty,
        b.toLong, deltaFacts = Seq(deltaSpec)) }
    }
    // eraser 0 erases EAGERLY (BaseDelta compact+vacuum inside the
    // storm — physical destruction racing readers), eraser 1 DEFERRED
    // (tombstone-ledger ack; reads must anti-join immediately)
    val erasers = eraseTargets.zipWithIndex.map { case (plan, i) => () =>
      plan.foreach { ids =>
        jitter()
        retryConflict(20) {
          Erasure.eraseCoordinated(spark, root,
            Map("accounts" -> "account_id", "dtxns" -> "account_id"),
            ids.toDF("account_id"),
            deltaMembers = Map("dtxns" -> dt),
            deferred = i == 1).collect()
        }
        ids.foreach(acked.add(_))
      }
    }
    // composite reader recipe: OUTER root-tier guard (coordinator commit
    // advanced — erasure retired gen dirs), INNER table-tier guard (a
    // deferred ack advances only the delta table's ledger generation,
    // which the coordinator version cannot see)
    val reader = () => (1 to 6).foreach { _ =>
      jitter()
      retryConflict(10) {
        val observed = MultiSnapshot.currentCommit(spark, root)
        MultiSnapshot.conflictIfRetired(spark, root, observed) {
          graft.gold.BaseDelta.conflictIfRetired(spark, dt) {
            val t = MultiTableStream.readCommitted(spark, root, Seq(deltaSpec))
            assert(t("accounts").filter(col(Scd2Merge.EffectiveTo).isNull)
              .groupBy("account_id").count().filter(col("count") > 1).isEmpty,
              "seed 99: duplicate current account version mid-race")
            t.get("dtxns").foreach { d =>
              assert(d.groupBy("txn_id").count().filter(col("count") > 1).isEmpty,
                "seed 99: duplicate txn_id in a committed delta-fact view")
            }
          }
        }
      }
    }

    val bodies: Seq[() => Unit] = Seq(appender) ++ erasers :+ reader
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
        s"seed 99: non-typed leak: ${e.getClass.getName}: ${e.getMessage}")
    }
    assert(results.forall(_.isSuccess),
      "seed 99: a worker exhausted conflict retries — protocol livelock")

    assert(MultiTableStream.lastFoldedBatch(spark, root)
      .contains(AppendBatches.toLong), "seed 99: ledger lost a fold")
    val latestAcct: Map[Long, Long] = plans.zipWithIndex
      .flatMap { case (p, i) => p._2.map(_ -> (i + 1).toLong) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val latestDtxn: Map[Long, Long] = plans.zipWithIndex
      .flatMap { case (p, i) => p._3.map(_ -> (i + 1).toLong) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet

    val t = MultiTableStream.readCommitted(spark, root, Seq(deltaSpec))
    val curDim = t("accounts").filter(col(Scd2Merge.EffectiveTo).isNull)
      .select(col("account_id"), col("amount"))
      .as[(Long, Double)].collect().toMap
    latestAcct.foreach { case (a, b) =>
      assert(curDim.get(a).contains(a * 100.0 + b),
        s"seed 99: account $a expected ${a * 100.0 + b} got ${curDim.get(a)}")
    }
    val gotD = t("dtxns").select(col("txn_id"), col("seq"))
      .as[(Long, Long)].collect().toMap
    latestDtxn.foreach { case (id, b) =>
      assert(gotD.get(id).contains(b),
        s"seed 99: delta txn $id expected seq=$b got ${gotD.get(id)} — lost fold")
    }
    erased.foreach { a =>
      assert(t("accounts").filter(col("account_id") === a).isEmpty,
        s"seed 99: acked-erased account $a still in the dim")
      assert(!gotD.contains(a + 9500L),
        s"seed 99: acked-erased account $a's delta row still readable")
    }
    (1000L until 1020L).filterNot(erased).foreach { a =>
      assert(gotD.get(a + 9500L).contains(0L),
        s"seed 99: untouched seed delta row for $a wrong/missing")
    }

    // quiesced lifecycle close: every deferred ack materializes, the
    // readable view is unchanged
    graft.gold.BaseDelta.materializeErasures(spark, dt)
    assert(graft.gold.BaseDelta.pendingTombstones(spark, dt).isEmpty,
      "seed 99: ledgers still pending after a quiesced full fold")
    val after = MultiTableStream.readCommitted(spark, root, Seq(deltaSpec))
    assert(after("dtxns").select(col("txn_id"), col("seq"))
      .as[(Long, Long)].collect().toMap == gotD,
      "seed 99: materialization changed the committed delta-fact view")
  }
}
