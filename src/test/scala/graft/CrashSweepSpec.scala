package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, Erasure, SnapshotStore}
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
@Soak
class CrashSweepSpec extends CrashSweepHarness {
  import spark.implicits._

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

  // Both crash substrates: POSIX-atomic renames, and the mock object
  // store whose single-file renames decompose into crashable
  // copy+delete steps (a died-mid-rename writer leaves src AND dst).
  for (scheme <- Seq("faulty", "faultymock")) {

  // ── protocol table: storage tier ───────────────────────────────────

  def obsSnapshot(root: String): Seq[String] =
    SnapshotStore.read(spark, root).collect().map(_.toString).toSeq

  def obsDelta(root: String): Seq[String] =
    BaseDelta.read(spark, deltaTable(root)).collect().map(_.toString).toSeq

  test(s"crash sweep [$scheme]: snapshot publish (stage + pointer CAS)") {
    sweep(scheme)(Protocol("snapshot-publish",
      setup = r => { SnapshotStore.publish(docs("a", 1 to 6), r); () },
      op = r => { SnapshotStore.publish(docs("b", 1 to 6), r); () },
      recover = r => { SnapshotStore.publish(docs("b", 1 to 6), r); () },
      observe = obsSnapshot))
  }

  test(s"crash sweep [$scheme]: snapshot vacuum (history reclamation)") {
    sweep(scheme)(Protocol("snapshot-vacuum",
      setup = r => Seq("a", "b", "c").foreach(t =>
        SnapshotStore.publish(docs(t, 1 to 6), r)),
      op = r => { SnapshotStore.vacuum(spark, r); () },
      recover = r => { SnapshotStore.vacuum(spark, r); () },
      observe = obsSnapshot))
  }

  test(s"crash sweep [$scheme]: delta append (fresh delta + manifest CAS)") {
    sweep(scheme)(Protocol("delta-append",
      setup = r => BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L),
      op = r => BaseDelta.append(spark, deltaTable(r), docs("b", 7 to 12), 1L),
      recover = r => BaseDelta.append(spark, deltaTable(r), docs("b", 7 to 12), 1L),
      observe = obsDelta))
  }

  test(s"crash sweep [$scheme]: delta compact (fold + generation swap)") {
    sweep(scheme)(Protocol("delta-compact",
      setup = r => {
        BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L)
        BaseDelta.append(spark, deltaTable(r), docs("b", 4 to 9), 1L)
        BaseDelta.append(spark, deltaTable(r), docs("c", 7 to 12), 2L)
      },
      op = r => BaseDelta.compact(spark, deltaTable(r)),
      recover = r => BaseDelta.compact(spark, deltaTable(r)),
      observe = obsDelta))
  }

  test(s"crash sweep [$scheme]: logical erase (ledger read-merge-publish ack)") {
    val subjects = Seq(2, 3)
    sweep(scheme)(Protocol("logical-erase",
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

  test(s"crash sweep [$scheme]: materialize erasures (rewrite + ledger retire + vacuum) — no surviving subject bytes") {
    val subjects = Seq(2, 3, 8)
    def setup(r: String): Unit = {
      BaseDelta.append(spark, deltaTable(r), docs("a", 1 to 6), 0L)
      BaseDelta.compact(spark, deltaTable(r))
      BaseDelta.append(spark, deltaTable(r), docs("b", 4 to 9), 1L)
      BaseDelta.logicalErase(spark, deltaTable(r), "id",
        subjects.map(_.toLong).toDF("id"))
      ()
    }
    sweep(scheme)(Protocol("materialize-erasures",
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

  val dimSpec = Scd2Dim("d", "dim", Seq("id"), Seq("v"), "ts",
    tieBreak = Seq("id"),
    project = _.select("id", "v", "ts"))
  def factSpec = DeltaFact("f", "fact", Seq("id"), Seq("ts", "id"),
    maxDeltas = 2,
    project = _.select("id", "v", "ts"))

  def routed(tag: String, dimIds: Seq[Int], factIds: Seq[Int]): DataFrame =
    docs(tag, dimIds).withColumn("route", lit("dim"))
      .unionByName(docs(tag, factIds).withColumn("route", lit("fact")))
      .coalesce(1)

  def fold(r: String, tag: String, dimIds: Seq[Int], factIds: Seq[Int],
                   batch: Long): Unit =
    MultiTableStream.foldBatch(spark, r, routed(tag, dimIds, factIds),
      "route", Seq(dimSpec), Seq.empty, batch, deltaFacts = Seq(factSpec))

  def obsCommitted(root: String): Seq[String] = {
    val t = MultiTableStream.readCommitted(spark, root,
      deltaFacts = Seq(factSpec))
    t.toSeq.sortBy(_._1).flatMap { case (name, df) =>
      df.collect().map(r => s"$name:$r")
    }
  }

  test(s"crash sweep [$scheme]: coordinator foldBatch (dim stage + fact delta + atomic flip)") {
    sweep(scheme)(Protocol("fold-batch",
      setup = r => fold(r, "a", Seq(1, 2), Seq(11, 12), 0L),
      op = r => fold(r, "b", Seq(2, 3), Seq(13, 14), 1L),
      recover = r => fold(r, "b", Seq(2, 3), Seq(13, 14), 1L),
      observe = obsCommitted))
  }

  test(s"crash sweep [$scheme]: coordinated erasure, eager — fact-first ordering, no surviving subject bytes") {
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
    sweep(scheme)(Protocol("erase-coordinated-eager",
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

  test(s"crash sweep [$scheme]: coordinated erasure, deferred — immediate unreachability survives any crash point") {
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
    sweep(scheme)(Protocol("erase-coordinated-deferred",
      setup = setup,
      op = erase,
      recover = erase,
      observe = obsCommitted,
      extraMid = Seq(factErasedMid)))
  }
  }
}
