package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, CommitCas, CommitConflictException, Erasure,
  SnapshotStore}
import graft.streaming.MultiTableStream
import graft.streaming.MultiTableStream.{DeltaFact, Scd2Dim}

/** Systematic crash-consistency sweep: every storage-tier protocol is run
  * once to RECORD its ordered mutating-filesystem-op trace, then re-run
  * from a fresh fixture with an injected crash at each DISTINCT protocol
  * step (first and last occurrence of each op signature), poisoned so
  * nothing after the crash point can mutate disk — the per-op crash
  * model (ops before the point landed; the point and everything after
  * did not; no catch/finally compensation runs).
  *
  * Three invariants at every crash point:
  *  1. the crashed call must not report success with a torn effect —
  *     success is only tolerated when the semantic post-state fully
  *     landed (a best-effort cleanup op after the commit point);
  *  2. a plain read after the crash (no recovery) serves a LEGAL state —
  *     the pre-op state, the post-op state, or an explicitly documented
  *     intermediate (the coordinated erasure's fact-before-dim ordering);
  *  3. re-invoking the operation (the documented crash-repair contract
  *     for every protocol here) converges to the no-crash result — and
  *     for physical-erasure protocols, a post-recovery full vacuum leaves
  *     NO subject payload bytes anywhere under the root (raw byte scan
  *     of every remaining file, parquet or torn).
  *
  * The sweep runs on the `faulty` scheme whose commit CAS is itself one
  * clocked op, so "crashed exactly instead of committing" is always one
  * of the tested points. Default run tests the capped point set; set
  * GRAFT_CRASH_SWEEP=full for the exhaustive every-distinct-step pass.
  */
class CrashSweepSpec extends SparkSpec {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
  CommitCas.register("faulty", FaultyConditionalPut)

  private val maxPoints =
    if (sys.env.get("GRAFT_CRASH_SWEEP").contains("full")) Int.MaxValue else 12

  // ── fixtures ───────────────────────────────────────────────────────
  // Payload strings are unique per row and structurally distinct
  // (SECRETxNNNz) so a raw byte scan for an erased subject's payload in
  // any surviving file is meaningful.
  private def docs(tag: String, ids: Seq[Int]): DataFrame =
    ids.map(i => (i.toLong, s"$tag-SECRETx${i}z", ts(f"2024-01-${i % 27 + 1}%02d 00:00:00")))
      .toDF("id", "v", "ts").coalesce(1)

  private def deltaTable(root: String) =
    BaseDelta.Table(root, Seq("id"), Seq("ts", "id"))

  private def secretsOf(ids: Seq[Int]): Seq[String] =
    ids.map(i => s"SECRETx${i}z")

  // ── harness ────────────────────────────────────────────────────────
  private case class Protocol(
      name: String,
      setup: String => Unit,
      op: String => Unit,
      recover: String => Unit,
      observe: String => Seq[String],
      // extra legal read-after-crash states beyond {pre, post}, keyed by
      // a builder over the fresh root (documented multi-commit
      // intermediates only)
      extraMid: Seq[String => Seq[String]] = Seq.empty,
      // payload strings that must not exist in ANY surviving byte on
      // disk after recovery + full vacuum (physical-erasure protocols)
      erasedPayloads: Seq[String] = Seq.empty,
      // full-reclamation pass run after recovery, before the byte scan
      finalVacuum: String => Unit = _ => ())

  private def canon(rows: Seq[String]): Seq[String] = rows.sorted

  private def retryTyped(n: Int)(body: => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        case _: CommitConflictException if attempt < n => attempt += 1
      }
    }
  }

  private def localDirOf(root: String): String =
    root.stripPrefix("faulty:").split('/').dropRight(1).mkString("/")

  private def freshRoot(name: String): String =
    s"faulty:${tmpDir(s"crash-$name")}/t"

  /** Raw byte scan: any file under the root's local dir containing any of
    * `payloads` as ASCII bytes. Conservative-sound (compression can hide
    * bytes, never invent them); parquet dictionary/plain pages keep
    * unique strings literal.
    */
  private def filesHolding(root: String, payloads: Seq[String]): Seq[String] = {
    val base = java.nio.file.Paths.get(root.stripPrefix("faulty:"))
    if (!java.nio.file.Files.exists(base)) return Seq.empty
    val needles = payloads.map(_.getBytes("UTF-8"))
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    val walk = java.nio.file.Files.walk(base)
    try walk.forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        if (needles.exists(n => indexOfBytes(bytes, n) >= 0))
          hits += p.toString
      }
    } finally walk.close()
    hits.toSeq
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private def sweep(p: Protocol): Unit = {
    // uncompressed parquet while sweeping: the physical byte scan for
    // erased payloads needs dictionary/plain pages to hold strings
    // literally (snappy back-references can hide a needle's tail)
    val codecKey = "spark.sql.parquet.compression.codec"
    val prevCodec = spark.conf.getOption(codecKey)
    spark.conf.set(codecKey, "uncompressed")
    try sweepBody(p)
    finally prevCodec match {
      case Some(c) => spark.conf.set(codecKey, c)
      case None => spark.conf.unset(codecKey)
    }
  }

  private def sweepBody(p: Protocol): Unit = {
    // baseline: pre-state and the no-crash post-state
    val r0 = freshRoot(p.name)
    p.setup(r0)
    val pre = canon(p.observe(r0))
    p.op(r0)
    val expected = canon(p.observe(r0))
    val extraLegal = p.extraMid.map { mk =>
      val r = freshRoot(p.name); canon(mk(r))
    }

    // record the mutating-op trace
    val r1 = freshRoot(p.name)
    p.setup(r1)
    val (recRes, ops) = FaultClock.record(localDirOf(r1))(p.op(r1))
    assert(recRes.isRight, s"${p.name}: record pass failed: $recRes")
    assert(canon(p.observe(r1)) == expected,
      s"${p.name}: record pass end state diverged from baseline")
    assert(ops.nonEmpty, s"${p.name}: no mutating ops recorded")

    // crash points: first and last occurrence of each distinct signature
    val bySig = ops.zipWithIndex.groupBy(_._1)
    val points0 = (bySig.values.map(_.head._2) ++ bySig.values.map(_.last._2))
      .toSeq.distinct.sorted.map(_ + 1) // 1-based op index
    val points =
      if (points0.size <= maxPoints) points0
      else { // even spread, always keeping the first and last point
        val step = (points0.size - 1).toDouble / (maxPoints - 1)
        (0 until maxPoints).map(i => points0((i * step).round.toInt)).distinct
      }

    var crashed = 0
    var unfired = 0
    points.foreach { k =>
      val r = freshRoot(p.name)
      p.setup(r)
      val (fired, out) = FaultClock.armed(localDirOf(r), k.toLong)(p.op(r))
      if (!fired) {
        // this run used fewer ops than the recorded trace — it completed
        // fault-free and must have produced the full effect
        assert(out.isRight && canon(p.observe(r)) == expected,
          s"${p.name}: unfired point $k left a diverged state")
        unfired += 1
      } else {
        crashed += 1
        val at = s"crash point $k/${ops.size} (${ops(k - 1)})"
        if (out.isRight)
          // tolerated only when the semantic effect fully landed before
          // the crash (a best-effort cleanup op after the commit point)
          assert(canon(p.observe(r)) == expected,
            s"${p.name}: $at — op reported SUCCESS but the state is torn")
        else {
          val mid = canon(p.observe(r))
          assert(mid == pre || mid == expected || extraLegal.contains(mid),
            s"${p.name}: $at — read-after-crash is a TORN state:\n" +
              s"  got:  $mid\n  pre:  $pre\n  post: $expected")
        }
        retryTyped(4)(p.recover(r))
        assert(canon(p.observe(r)) == expected,
          s"${p.name}: $at — recovery did not converge")
        if (p.erasedPayloads.nonEmpty) {
          p.finalVacuum(r)
          val leaked = filesHolding(r, p.erasedPayloads)
          assert(leaked.isEmpty,
            s"${p.name}: $at — erased subject bytes survived recovery + " +
              s"full vacuum in:\n  ${leaked.mkString("\n  ")}")
        }
      }
    }
    info(s"${p.name}: ${ops.size} mutating ops, ${bySig.size} distinct steps, " +
      s"${points.size} points tested ($crashed crashed, $unfired unfired)")
    assert(crashed > 0, s"${p.name}: no crash point ever fired")
  }

  // ── protocol table: storage tier ───────────────────────────────────

  private def obsSnapshot(root: String): Seq[String] =
    SnapshotStore.read(spark, root).collect().map(_.toString).toSeq

  private def obsDelta(root: String): Seq[String] =
    BaseDelta.read(spark, deltaTable(root)).collect().map(_.toString).toSeq

  test("crash sweep: snapshot publish (stage + pointer CAS)") {
    sweep(Protocol("snapshot-publish",
      setup = r => { SnapshotStore.publish(docs("a", 1 to 6), r); () },
      op = r => { SnapshotStore.publish(docs("b", 1 to 6), r); () },
      recover = r => { SnapshotStore.publish(docs("b", 1 to 6), r); () },
      observe = obsSnapshot))
  }

  test("crash sweep: snapshot vacuum (history reclamation)") {
    sweep(Protocol("snapshot-vacuum",
      setup = r => Seq("a", "b", "c").foreach(t =>
        SnapshotStore.publish(docs(t, 1 to 6), r)),
      op = r => { SnapshotStore.vacuum(spark, r); () },
      recover = r => { SnapshotStore.vacuum(spark, r); () },
      observe = obsSnapshot))
  }

  test("crash sweep: delta append (fresh delta + manifest CAS)") {
    sweep(Protocol("delta-append",
      setup = r => BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L),
      op = r => BaseDelta.append(spark, deltaTable(r), docs("b", 7 to 12), 1L),
      recover = r => BaseDelta.append(spark, deltaTable(r), docs("b", 7 to 12), 1L),
      observe = obsDelta))
  }

  test("crash sweep: delta compact (fold + generation swap)") {
    sweep(Protocol("delta-compact",
      setup = r => {
        BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L)
        BaseDelta.append(spark, deltaTable(r), docs("b", 4 to 9), 1L)
        BaseDelta.append(spark, deltaTable(r), docs("c", 7 to 12), 2L)
      },
      op = r => BaseDelta.compact(spark, deltaTable(r)),
      recover = r => BaseDelta.compact(spark, deltaTable(r)),
      observe = obsDelta))
  }

  test("crash sweep: logical erase (ledger read-merge-publish ack)") {
    val subjects = Seq(2, 3)
    sweep(Protocol("logical-erase",
      setup = r => {
        BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L)
        BaseDelta.compact(spark, deltaTable(r))
        BaseDelta.append(spark, deltaTable(r), docs("b", 4 to 9), 1L)
      },
      op = r => { BaseDelta.logicalErase(spark, deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id")); () },
      recover = r => { BaseDelta.logicalErase(spark, deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id")); () },
      observe = obsDelta))
  }

  test("crash sweep: materialize erasures (rewrite + ledger retire + vacuum) — no surviving subject bytes") {
    val subjects = Seq(2, 3, 8)
    def setup(r: String): Unit = {
      BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L)
      BaseDelta.compact(spark, deltaTable(r))
      BaseDelta.append(spark, deltaTable(r), docs("b", 4 to 9), 1L)
      BaseDelta.logicalErase(spark, deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id"))
      ()
    }
    sweep(Protocol("materialize-erasures",
      setup = setup,
      op = r => { BaseDelta.materializeErasures(spark, deltaTable(r)); () },
      // a crash between the fold commit and the ledger retire can leave
      // pendingTombstones empty-or-not; re-invoking materializeErasures
      // handles the pending case, and the explicit compact+vacuum pair
      // covers the already-retired one (materializeErasures early-outs
      // on an empty ledger without reclaiming the pre-erasure base)
      recover = r => {
        BaseDelta.materializeErasures(spark, deltaTable(r))
        BaseDelta.compact(spark, deltaTable(r))
        BaseDelta.vacuum(spark, deltaTable(r))
        ()
      },
      observe = obsDelta,
      erasedPayloads = secretsOf(subjects),
      finalVacuum = r => { BaseDelta.vacuum(spark, deltaTable(r)); () }))
  }

  // ── protocol table: coordinator tier ───────────────────────────────

  private val dimSpec = Scd2Dim("d", "dim", Seq("id"), Seq("v"), "ts",
    tieBreak = Seq("id"),
    project = _.select("id", "v", "ts"))
  private def factSpec = DeltaFact("f", "fact", Seq("id"), Seq("ts", "id"),
    maxDeltas = 2,
    project = _.select("id", "v", "ts"))

  private def routed(tag: String, dimIds: Seq[Int], factIds: Seq[Int]): DataFrame =
    docs(tag, dimIds).withColumn("route", lit("dim"))
      .unionByName(docs(tag, factIds).withColumn("route", lit("fact")))
      .coalesce(1)

  private def fold(r: String, tag: String, dimIds: Seq[Int], factIds: Seq[Int],
                   batch: Long): Unit =
    MultiTableStream.foldBatch(spark, r, routed(tag, dimIds, factIds),
      "route", Seq(dimSpec), Seq.empty, batch, deltaFacts = Seq(factSpec))

  private def obsCommitted(root: String): Seq[String] = {
    val t = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(factSpec))
    t.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      df.collect().map(r => s"$name:$r")
    }
  }

  test("crash sweep: coordinator foldBatch (dim stage + fact delta + atomic flip)") {
    sweep(Protocol("fold-batch",
      setup = r => fold(r, "a", Seq(1, 2), Seq(11, 12), 0L),
      op = r => fold(r, "b", Seq(2, 3), Seq(13, 14), 1L),
      recover = r => fold(r, "b", Seq(2, 3), Seq(13, 14), 1L),
      observe = obsCommitted))
  }

  test("crash sweep: coordinated erasure, eager — fact-first ordering, no surviving subject bytes") {
    val subjects = Seq(2, 12)
    def erase(r: String): Unit = {
      Erasure.eraseCoordinated(spark, r,
        Map("d" -> "id", "f" -> "id"),
        subjects.map(_.toLong).toDF("id"),
        deltaMembers = Map("f" -> factSpec.deltaTable(r)))
      ()
    }
    def setup(r: String): Unit = {
      fold(r, "a", Seq(1, 2), Seq(11, 12), 0L)
      fold(r, "b", Seq(2, 3), Seq(12, 13), 1L)
    }
    // documented legal intermediate: delta members (facts) erase BEFORE
    // the dims' atomic flip — fact rows gone, dim rows still present
    val factErasedMid: String => Seq[String] = { r =>
      setup(r)
      BaseDelta.logicalErase(spark, factSpec.deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id"))
      obsCommitted(r)
    }
    sweep(Protocol("erase-coordinated-eager",
      setup = setup,
      op = erase,
      recover = erase,
      observe = obsCommitted,
      extraMid = Seq(factErasedMid),
      erasedPayloads = secretsOf(subjects),
      finalVacuum = r => {
        BaseDelta.materializeErasures(spark, factSpec.deltaTable(r))
        BaseDelta.vacuum(spark, factSpec.deltaTable(r))
        graft.gold.MultiSnapshot.vacuum(spark, r)
        ()
      }))
  }

  test("crash sweep: coordinated erasure, deferred — immediate unreachability survives any crash point") {
    val subjects = Seq(2, 12)
    def erase(r: String): Unit = {
      Erasure.eraseCoordinated(spark, r,
        Map("d" -> "id", "f" -> "id"),
        subjects.map(_.toLong).toDF("id"),
        deltaMembers = Map("f" -> factSpec.deltaTable(r)),
        deferred = true)
      ()
    }
    def setup(r: String): Unit = {
      fold(r, "a", Seq(1, 2), Seq(11, 12), 0L)
      fold(r, "b", Seq(2, 3), Seq(12, 13), 1L)
    }
    val factErasedMid: String => Seq[String] = { r =>
      setup(r)
      BaseDelta.logicalErase(spark, factSpec.deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id"), countRows = false)
      obsCommitted(r)
    }
    sweep(Protocol("erase-coordinated-deferred",
      setup = setup,
      op = erase,
      recover = erase,
      observe = obsCommitted,
      extraMid = Seq(factErasedMid)))
  }
}
