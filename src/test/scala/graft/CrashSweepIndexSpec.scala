package graft

import org.apache.spark.sql.DataFrame
import graft.operators.{ClusterIndex, ErasureSweep, LshVectorIndex, SearchIndex, VectorIndex}

/** Crash-point sweep over the INDEX tiers' maintenance protocols
  * (model and invariants: [[CrashSweepHarness]]). Index folds commit
  * several state tables sequentially under per-table replay ledgers, so
  * the documented contract is replay CONVERGENCE, not read-atomicity
  * across the tables — the strict mid-state membership check is off
  * (`checkMid = false`); the no-success-with-torn-effect and
  * recovery-converges invariants still hold at every point, as does the
  * serving-level check that an erased subject never reappears after a
  * crashed-and-replayed erase.
  */
@Soak
class CrashSweepIndexSpec extends CrashSweepHarness {
  import spark.implicits._

  // index protocols carry many more distinct steps than the storage tier
  // (4 state tables per fold); a tighter default cap keeps the CI run
  // bounded — commit-CAS points are always kept, and the full pass
  // (GRAFT_CRASH_SWEEP=full) still sweeps every distinct step
  override protected val maxPoints: Int =
    if (sys.env.get("GRAFT_CRASH_SWEEP").contains("full")) Int.MaxValue else 8

  // ── text fixtures (two shingle families + a bridge, the ClusterIndex
  //    merge/split shape) ─────────────────────────────────────────────
  private val famA = "alpha beta gamma delta epsilon zeta"
  private val famB = "one two three four five six"
  private val bridge = s"$famA $famB"

  private def textDocs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text").coalesce(1)

  private def vecs(ids: Seq[Int]): DataFrame =
    ids.map(i => (i.toLong,
        Array(0.13f * i + 0.07f, 1.0f + 0.31f * (i % 3), 0.5f * (i % 5),
          1.0f - 0.011f * i)))
      .toDF("vec_id", "embedding").coalesce(1)

  // ── search index ─────────────────────────────────────────────────────
  private def searchBatch0 = textDocs(
    (1L, "alpha beta retrieval engine"), (2L, "beta gamma ranking"),
    (3L, "one two scoring"), (4L, "alpha two mixed signals"))
  private def searchBatch1 = textDocs(
    (5L, "alpha fresh batch document"), (6L, "two more ranking text"))

  private def obsSearch(root: String): Seq[String] =
    SearchIndex.search(spark, SearchIndex.State(root),
      Seq("alpha", "two", "ranking")).collect().map(_.toString).toSeq

  test("crash sweep: search-index fold (postings/docstats/positions/stats ledgered commits)") {
    sweep(Protocol("search-fold",
      setup = r => SearchIndex.fold(spark, SearchIndex.State(r),
        searchBatch0, 0L, "doc_id", "text"),
      op = r => SearchIndex.fold(spark, SearchIndex.State(r),
        searchBatch1, 1L, "doc_id", "text"),
      recover = r => SearchIndex.fold(spark, SearchIndex.State(r),
        searchBatch1, 1L, "doc_id", "text"),
      observe = obsSearch,
      checkMid = false))
  }

  test("crash sweep: search-index eager erase (per-table compaction + stats correction)") {
    val subjects = Seq(2L, 5L).toDF("doc_id")
    def erase(r: String): Unit =
      SearchIndex.erase(spark, SearchIndex.State(r), subjects)
    sweep(Protocol("search-erase",
      setup = r => {
        SearchIndex.fold(spark, SearchIndex.State(r), searchBatch0, 0L,
          "doc_id", "text")
        SearchIndex.fold(spark, SearchIndex.State(r), searchBatch1, 1L,
          "doc_id", "text")
      },
      op = erase,
      recover = erase,
      observe = obsSearch,
      checkMid = false))
  }

  // ── cluster index ────────────────────────────────────────────────────
  private def clusterBatch0 = textDocs((10L, famA), (11L, famA + " extra"),
    (20L, famB), (21L, famB + " tail"), (40L, "lonely standalone text here"))
  private def clusterBatch1 = textDocs((30L, bridge))

  private def obsClusters(root: String): Seq[String] =
    ClusterIndex.clusters(spark, ClusterIndex.State(root))
      .collect().map(_.toString).toSeq

  test("crash sweep: cluster-index fold (bridge merge across postings + clusters commits)") {
    sweep(Protocol("cluster-fold",
      setup = r => ClusterIndex.fold(spark, ClusterIndex.State(r),
        clusterBatch0, 0L, "doc_id", "text"),
      op = r => ClusterIndex.fold(spark, ClusterIndex.State(r),
        clusterBatch1, 1L, "doc_id", "text"),
      recover = r => ClusterIndex.fold(spark, ClusterIndex.State(r),
        clusterBatch1, 1L, "doc_id", "text"),
      observe = obsClusters,
      checkMid = false))
  }

  test("crash sweep: cluster-index deferred erase (eager bridge-split re-pair + postings ledger)") {
    val subjects = Seq(30L).toDF("doc_id")
    def erase(r: String): Unit = {
      ClusterIndex.eraseLogical(spark, ClusterIndex.State(r), subjects)
      ()
    }
    sweep(Protocol("cluster-erase-logical",
      setup = r => {
        ClusterIndex.fold(spark, ClusterIndex.State(r), clusterBatch0, 0L,
          "doc_id", "text")
        ClusterIndex.fold(spark, ClusterIndex.State(r), clusterBatch1, 1L,
          "doc_id", "text")
      },
      op = erase,
      recover = erase,
      observe = obsClusters,
      checkMid = false))
  }

  // ── vector index ─────────────────────────────────────────────────────
  private def obsTopK(root: String): Seq[String] =
    VectorIndex.topK(spark, VectorIndex.State(root), vecs(Seq(0, 1, 2)),
      "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(_.toString).toSeq

  test("crash sweep: vector-index fold (centroid seed + cell postings commits)") {
    sweep(Protocol("vector-fold",
      setup = r => VectorIndex.fold(spark, VectorIndex.State(r),
        vecs(0 to 5), 0L, "vec_id", "embedding", nCells = 2),
      op = r => VectorIndex.fold(spark, VectorIndex.State(r),
        vecs(6 to 11), 1L, "vec_id", "embedding", nCells = 2),
      recover = r => VectorIndex.fold(spark, VectorIndex.State(r),
        vecs(6 to 11), 1L, "vec_id", "embedding", nCells = 2),
      observe = obsTopK,
      checkMid = false))
  }

  test("crash sweep: vector-index eager erase (postings compaction + writer-safe vacuum)") {
    val subjects = Seq(1L, 7L).toDF("vec_id")
    def erase(r: String): Unit =
      VectorIndex.erase(spark, VectorIndex.State(r), subjects)
    sweep(Protocol("vector-erase",
      setup = r => {
        VectorIndex.fold(spark, VectorIndex.State(r), vecs(0 to 5), 0L,
          "vec_id", "embedding", nCells = 2)
        VectorIndex.fold(spark, VectorIndex.State(r), vecs(6 to 11), 1L,
          "vec_id", "embedding", nCells = 2)
      },
      op = erase,
      recover = erase,
      observe = obsTopK,
      checkMid = false))
  }

  // ── lsh vector index (vectors-first / bands-last two-table fold) ─────
  private def obsLsh(root: String): Seq[String] =
    LshVectorIndex.topK(spark, LshVectorIndex.State(root),
      vecs(Seq(0, 1, 2)), "vec_id", "embedding", k = 3)
      .collect().map(_.toString).toSeq

  test("crash sweep: lsh-index fold (params freeze + vectors/bands ledgered appends)") {
    sweep(Protocol("lsh-fold",
      setup = r => LshVectorIndex.fold(spark, LshVectorIndex.State(r),
        vecs(0 to 5), 0L, "vec_id", "embedding", numTables = 4, numPlanes = 0),
      op = r => LshVectorIndex.fold(spark, LshVectorIndex.State(r),
        vecs(6 to 11), 1L, "vec_id", "embedding", numTables = 4, numPlanes = 0),
      recover = r => LshVectorIndex.fold(spark, LshVectorIndex.State(r),
        vecs(6 to 11), 1L, "vec_id", "embedding", numTables = 4, numPlanes = 0),
      observe = obsLsh,
      checkMid = false))
  }

  test("crash sweep: lsh-index eager erase (two filtered compactions + writer-safe vacuums)") {
    val subjects = Seq(1L, 7L).toDF("vec_id")
    def erase(r: String): Unit =
      LshVectorIndex.erase(spark, LshVectorIndex.State(r), subjects)
    sweep(Protocol("lsh-erase",
      setup = r => {
        LshVectorIndex.fold(spark, LshVectorIndex.State(r), vecs(0 to 5),
          0L, "vec_id", "embedding", numTables = 4, numPlanes = 0)
        LshVectorIndex.fold(spark, LshVectorIndex.State(r), vecs(6 to 11),
          1L, "vec_id", "embedding", numTables = 4, numPlanes = 0)
      },
      op = erase,
      recover = erase,
      observe = obsLsh,
      checkMid = false))
  }

  // ── managed vector index (quantizer generations) ─────────────────────
  private def managedSetup(r: String): VectorIndex.Managed = {
    val m = VectorIndex.Managed(r)
    VectorIndex.fold(spark, VectorIndex.active(spark, m), vecs(0 to 5), 0L,
      "vec_id", "embedding", nCells = 2)
    VectorIndex.fold(spark, VectorIndex.active(spark, m), vecs(6 to 11), 1L,
      "vec_id", "embedding", nCells = 2)
    m
  }

  /** Serving through the ACTIVE generation with a full probe — exact
    * brute-force equivalence regardless of which quantizer generation is
    * live, so a partially-published generation or a torn active pointer
    * shows up as divergence.
    */
  private def obsManaged(root: String): Seq[String] = {
    val m = VectorIndex.Managed(root)
    val act = VectorIndex.active(spark, m)
    VectorIndex.topK(spark, act, vecs(Seq(0, 4)), "vec_id", "embedding",
      k = 3, nProbe = VectorIndex.nCells(spark, act))
      .collect().map(_.toString).toSeq
  }

  test("crash sweep: managed quantizer refresh (stage next generation + pointer flip)") {
    sweep(Protocol("managed-refresh",
      setup = r => { managedSetup(r); () },
      op = r => { VectorIndex.refreshQuantizer(spark,
        VectorIndex.Managed(r), nCells = 3); () },
      // a crash before the pointer flip leaves gen-0 active (recovery
      // restages); after the flip, recovery builds one more generation —
      // either way the ACTIVE serving must equal brute force
      recover = r => { VectorIndex.refreshQuantizer(spark,
        VectorIndex.Managed(r), nCells = 3); () },
      observe = obsManaged,
      checkMid = false))
  }

  test("crash sweep: managed erasure (retired-generation destruction + active erase)") {
    val subjects = Seq(1L, 7L).toDF("vec_id")
    def erase(r: String): Unit = {
      VectorIndex.eraseManaged(spark, VectorIndex.Managed(r), subjects)
      ()
    }
    // observe includes whether the RETIRED gen-0 dir still exists: the
    // erasure contract destroys it, and a crashed-then-recovered erase
    // must converge to destroyed — while active serving excludes the
    // subjects exactly
    def observe(r: String): Seq[String] = {
      val retired = new org.apache.hadoop.fs.Path(
        VectorIndex.Managed(r).subState(0L).root)
      val hfs = retired.getFileSystem(spark.sparkContext.hadoopConfiguration)
      obsManaged(r) :+ s"retired-gen0-exists:${hfs.exists(retired)}"
    }
    sweep(Protocol("managed-erase",
      setup = r => {
        managedSetup(r)
        VectorIndex.refreshQuantizer(spark, VectorIndex.Managed(r),
          nCells = 3)
        ()
      },
      op = erase,
      recover = erase,
      observe = observe,
      checkMid = false))
  }

  // ── cross-artifact sweep + durable receipts ──────────────────────────
  test("crash sweep: cross-artifact erasure sweep with ledgered receipts (same-id replay converges)") {
    // one subject id living in all three tiers; the sweep erases it
    // everywhere and appends one receipts batch — a crash anywhere in the
    // chain is repaired by re-invoking under the SAME sweep id
    val subjects = Seq(20L).toDF("id")
    def states(r: String) = (SearchIndex.State(s"$r/search"),
      ClusterIndex.State(s"$r/cluster"), VectorIndex.State(s"$r/vector"),
      LshVectorIndex.State(s"$r/lsh"))
    def setup(r: String): Unit = {
      val (sst, cst, vst, lst) = states(r)
      SearchIndex.fold(spark, sst, clusterBatch0, 0L, "doc_id", "text")
      SearchIndex.fold(spark, sst, clusterBatch1, 1L, "doc_id", "text")
      ClusterIndex.fold(spark, cst, clusterBatch0, 0L, "doc_id", "text")
      ClusterIndex.fold(spark, cst, clusterBatch1, 1L, "doc_id", "text")
      VectorIndex.fold(spark, vst, vecs(Seq(10, 11, 20, 21, 30, 40)), 0L,
        "vec_id", "embedding", nCells = 2)
      LshVectorIndex.fold(spark, lst, vecs(Seq(10, 11, 20, 21, 30, 40)), 0L,
        "vec_id", "embedding", numTables = 4, numPlanes = 0)
    }
    def runSweep(r: String): Unit = {
      val (sst, cst, vst, lst) = states(r)
      ErasureSweep.eraseDerivedLedgered(spark, s"$r/receipts", 1L, subjects,
        search = Seq(sst), vector = Seq(vst), cluster = Seq(cst),
        lsh = Seq(lst))
      ()
    }
    def observe(r: String): Seq[String] = {
      val (sst, cst, vst, lst) = states(r)
      val serving =
        SearchIndex.search(spark, sst, Seq("alpha", "one", "lonely"))
          .collect().map(x => s"search:$x").toSeq ++
        ClusterIndex.clusters(spark, cst)
          .collect().map(x => s"cluster:$x").toSeq ++
        VectorIndex.topK(spark, vst, vecs(Seq(10, 30)), "vec_id",
          "embedding", k = 3, nProbe = 2)
          .collect().map(x => s"topk:$x").toSeq ++
        LshVectorIndex.topK(spark, lst, vecs(Seq(10, 30)), "vec_id",
          "embedding", k = 3)
          .collect().map(x => s"lshtopk:$x").toSeq
      val receipts =
        if (!SnapshotExists.receipts(spark, s"$r/receipts")) Seq.empty
        else ErasureSweep.receiptStatus(spark, s"$r/receipts",
            search = Seq(sst), vector = Seq(vst), cluster = Seq(cst),
            lsh = Seq(lst))
          .select("sweep_id", "artifact", "status", "current_status")
          .collect().map(x => s"receipt:$x").toSeq
      serving ++ receipts
    }
    sweep(Protocol("erase-sweep-ledgered",
      setup = setup,
      op = runSweep,
      recover = runSweep,
      observe = observe,
      checkMid = false))
  }
}

/** Tiny guard: the receipts ledger may not exist yet at a pre-op or
  * crashed-early observation point — probing its manifest beats letting
  * the observe pass throw.
  */
private object SnapshotExists {
  def receipts(spark: org.apache.spark.sql.SparkSession, root: String): Boolean =
    graft.gold.BaseDelta.readManifest(spark,
      ErasureSweep.receiptsTable(root)).nonEmpty
}
