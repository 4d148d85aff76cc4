package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{ClusterIndex, Dedup}

/** Incremental near-dup cluster maintenance: folding batches must
  * reproduce the full recompute exactly — including the bridge case
  * where a new doc merges two existing clusters — and replays must be
  * no-ops.
  */
class ClusterIndexSpec extends SparkSpec {
  import spark.implicits._

  // two 4-shingle families with zero overlap; the bridge doc contains
  // both texts, so J(bridge, A) = J(bridge, B) = 4/10 = 0.4 >= 0.2 while
  // J(A, B) = 0
  private val famA = "alpha beta gamma delta epsilon zeta"
  private val famB = "one two three four five six"
  private val bridge = s"$famA $famB"

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def fullRecompute(all: DataFrame): DataFrame = {
    val comp = Dedup.resolveClusters(
      Dedup.ngramJaccard(all, "doc_id", "text", k = 3, threshold = 0.2))
    all.select(col("doc_id").as("id")).distinct()
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what\nleft:\n${a.orderBy("id").collect().mkString("\n")}" +
        s"\nright:\n${b.orderBy("id").collect().mkString("\n")}")

  private def foldAll(batches: Seq[DataFrame]): ClusterIndex.State = {
    val st = ClusterIndex.State(tmpDir("clidx") + "/s")
    batches.zipWithIndex.foreach { case (b, i) =>
      ClusterIndex.fold(spark, st, b, i.toLong, "doc_id", "text")
    }
    st
  }

  test("bridge doc merges two existing clusters, old members remapped") {
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (21L, famB + " tail"), (40L, "lonely standalone text here"))
    val b2 = docs((30L, bridge))
    val st = foldAll(Seq(b1, b2))
    val out = ClusterIndex.clusters(spark, st)
    val byId = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(10L) == 10L && byId(11L) == 10L, "family A keeps min 10")
    assert(byId(20L) == 10L && byId(21L) == 10L,
      "family B must remap to the merged min — the bridge case")
    assert(byId(30L) == 10L)
    assert(byId(40L) == 40L, "singleton keeps its own id")
    sameRows(out, fullRecompute(b1.unionByName(b2)),
      "incremental diverges from full recompute")
  }

  test("any batch cut reproduces the full recompute") {
    val all = Seq(
      (1L, famA), (2L, famA + " x"), (3L, famB), (4L, famB + " y"),
      (5L, bridge), (6L, "totally different content words entirely"),
      (7L, "totally different content words entirely also"))
    val expected = fullRecompute(docs(all: _*))
    for (cut <- Seq(Seq(2, 5), Seq(3, 4), Seq(1, 6), Seq(4, 5))) {
      val batches = Seq(
        docs(all.take(cut(0)): _*),
        docs(all.slice(cut(0), cut(1)): _*),
        docs(all.drop(cut(1)): _*)).filter(!_.isEmpty)
      sameRows(ClusterIndex.clusters(spark, foldAll(batches)), expected,
        s"cut $cut diverges from full recompute")
    }
  }

  test("replaying a delivered batch is a no-op") {
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB))
    val b2 = docs((30L, bridge), (21L, famB + " tail"))
    val st = foldAll(Seq(b1, b2))
    val before = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    ClusterIndex.fold(spark, st, b2, 1L, "doc_id", "text")
    val after = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(after == before, "replayed batch changed the state")
  }

  test("at-least-once redelivery under a NEW batch id converges to the same state") {
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (40L, "lonely standalone text here"))
    val b2 = docs((21L, famB + " tail"))
    val st = foldAll(Seq(b1, b2))
    val before = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // resend a clustered doc, a cluster min, and a singleton as batch 2
    ClusterIndex.fold(spark, st,
      docs((11L, famA + " extra"), (20L, famB),
        (40L, "lonely standalone text here")),
      2L, "doc_id", "text")
    val after = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(after == before, s"redelivery changed the state:\n$before\n$after")
  }

  test("a later smaller id lowers the cluster label everywhere") {
    val st = foldAll(Seq(
      docs((10L, famA), (11L, famA + " extra")),
      docs((1L, famA + " small id"))))
    val byId = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId == Map(1L -> 1L, 10L -> 1L, 11L -> 1L),
      s"min label must propagate to old members: $byId")
  }

  test("non-singleton view emits exactly the ids the full pair set touches") {
    val b = docs((10L, famA), (11L, famA + " extra"),
      (40L, "lonely standalone text here"))
    val st = foldAll(Seq(b))
    val ns = ClusterIndex.clustersNonSingleton(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(ns == Set(10L -> 10L, 11L -> 10L))
  }

  test("erase: a bridge doc's removal SPLITS the cluster it merged; replays cannot resurrect") {
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (21L, famB + " tail"), (40L, "lonely standalone text here"))
    val b2 = docs((30L, bridge))
    val st = foldAll(Seq(b1, b2))
    // precondition: the bridge merged everything to min label 10
    assert(ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      .filterKeys(Set(20L, 21L).contains).values.toSet == Set(10L))
    ClusterIndex.erase(spark, st, Seq(30L).toDF("doc_id"))
    val out = ClusterIndex.clusters(spark, st)
    sameRows(out, fullRecompute(b1),
      "post-erasure clusters diverge from a recompute that never saw the bridge")
    val byId = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!byId.contains(30L), "erased doc still assigned")
    assert(byId(20L) == 20L && byId(21L) == 20L,
      s"family B must split back off the bridge-merged cluster: $byId")
    assert(byId(10L) == 10L && byId(11L) == 10L && byId(40L) == 40L)
    // a redelivered old batch id must not resurrect the erased doc
    ClusterIndex.fold(spark, st, b2, 1L, "doc_id", "text")
    sameRows(ClusterIndex.clusters(spark, st), fullRecompute(b1),
      "replayed fold resurrected the erased bridge")
    // and folding genuinely NEW data still works after an erasure
    ClusterIndex.fold(spark, st, docs((50L, famB + " fresh")), 2L,
      "doc_id", "text")
    sameRows(ClusterIndex.clusters(spark, st),
      fullRecompute(b1.unionByName(docs((50L, famB + " fresh")))),
      "post-erasure fold diverges from recompute")
  }

  test("over-budget deferred erase: relabel-only ack, stale-merged until repairStructural converges") {
    import graft.gold.BaseDelta
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (21L, famB + " tail"), (40L, "lonely standalone text here"))
    val b2 = docs((5L, bridge)) // the bridge IS the min id → it is the label
    val st = foldAll(Seq(b1, b2))
    assert(ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
      .filterKeys(Set(10L, 20L).contains).values.toSet == Set(5L))
    // budget 0: the ack takes the relabel-only fallback — no re-pair
    val receipt = ClusterIndex.eraseLogical(spark, st,
      Seq(5L).toDF("doc_id"), maxAffected = 0L).collect()
    assert(receipt.map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet == Set((5L, 1L, "pending_structural")), receipt.mkString(","))
    val byId = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unreachability and label hygiene are NOT stale: the erased doc is
    // gone as a member AND as a label (min surviving member takes over)
    assert(!byId.contains(5L), "erased doc still assigned")
    assert(!byId.values.toSet.contains(5L), "erased id survived as a label")
    // what IS stale (documented): the split is missed — both families
    // still share one cluster under the min-survivor label
    assert(Set(10L, 11L, 20L, 21L).map(byId) == Set(10L),
      s"fallback should leave the cluster stale-merged: $byId")
    assert(byId(40L) == 40L)
    assert(ClusterIndex.pendingRepairs(spark, st).isDefined,
      "over-budget erase must mark the repair")
    assert(BaseDelta.pendingTombstones(spark, st.postingsTable).nonEmpty,
      "postings ledger must be pending")
    // the async half: repair splits the families, equals the recompute
    // that never saw the bridge (the unbudgeted eager result)
    assert(ClusterIndex.repairStructural(spark, st))
    sameRows(ClusterIndex.clusters(spark, st), fullRecompute(b1),
      "post-repair clusters diverge from the eager-erase result")
    assert(ClusterIndex.pendingRepairs(spark, st).isEmpty)
    assert(!ClusterIndex.repairStructural(spark, st),
      "repair must be a no-op when nothing is marked")
    // later folds still converge
    ClusterIndex.fold(spark, st, docs((50L, famB + " fresh")), 2L,
      "doc_id", "text")
    sameRows(ClusterIndex.clusters(spark, st),
      fullRecompute(b1.unionByName(docs((50L, famB + " fresh")))),
      "post-repair fold diverges from recompute")
  }

  test("shuffle-semi-join fallback folds identically to the broadcast prefilter") {
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (21L, famB + " tail"), (40L, "lonely standalone text here"))
    val b2 = docs((30L, bridge), (41L, "other unrelated material words"))
    // maxBroadcastHashes = 0: every batch exceeds the cap, the prefilter
    // degrades to the shuffled semi-join on every fold
    val stShuffle = ClusterIndex.State(tmpDir("clidx-sh") + "/s")
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      ClusterIndex.fold(spark, stShuffle, b, i.toLong, "doc_id", "text",
        maxBroadcastHashes = 0L)
    }
    val stBcast = foldAll(Seq(b1, b2))
    sameRows(ClusterIndex.clusters(spark, stShuffle),
      ClusterIndex.clusters(spark, stBcast),
      "shuffle-prefilter fold diverges from the broadcast-prefilter fold")
    sameRows(ClusterIndex.clusters(spark, stShuffle),
      fullRecompute(b1.unionByName(b2)),
      "shuffle-prefilter fold diverges from the full recompute")
  }

  test("the prefilter switch actually changes the physical plan") {
    val st = foldAll(Seq(docs((10L, famA), (20L, famB))))
    val hashes = ClusterIndex.batchPostings(docs((30L, bridge)),
      "doc_id", "text").select(col("s")).distinct()
    val bcastPlan = ClusterIndex.prefilteredState(spark, st, hashes,
      useBroadcast = true).queryExecution.executedPlan.toString
    val shufPlan = ClusterIndex.prefilteredState(spark, st, hashes,
      useBroadcast = false).queryExecution.executedPlan.toString
    assert(bcastPlan.contains("BroadcastExchange"), bcastPlan.take(600))
    assert(!shufPlan.contains("BroadcastExchange"), shufPlan.take(600))
  }

  test("schema evolution: a newer engine's superset-schema delta reads, folds, and compacts") {
    import graft.gold.BaseDelta
    val b1 = docs((10L, famA), (11L, famA + " extra"), (20L, famB),
      (21L, famB + " tail"))
    val b2 = docs((30L, bridge))
    val st = foldAll(Seq(b1, b2))
    val before = ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a "newer engine" re-asserts the current labels in a batch-2 delta
    // that carries an extra provenance column — older deltas lack it
    val newer = ClusterIndex.clusters(spark, st)
      .withColumn("as_of", lit(2L))
      .withColumn("engine_ver", lit("v2"))
    BaseDelta.append(spark, st.clustersTable, newer, 2L)
    // mixed-schema state reads identically
    assert(ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == before)
    // fold replay of an applied batch across the mixed state: no-op
    ClusterIndex.fold(spark, st, b2, 1L, "doc_id", "text")
    assert(ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == before)
    // compaction folds the mixed schemas; the readout survives
    BaseDelta.compact(spark, st.clustersTable, allowSchemaEvolution = true)
    assert(ClusterIndex.clusters(spark, st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == before)
  }
}
