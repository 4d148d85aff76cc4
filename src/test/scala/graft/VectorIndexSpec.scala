package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, VectorIndex}

/** Incremental IVF vector index: folded state serves exactly what the
  * recompute-based path serves — full probe ≡ brute force under any
  * fold cut, partial probe keeps recall, replays are no-ops, and the
  * corpus postings never shuffle for scoring.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what\nleft:\n${a.orderBy("query_id", "rank").collect().take(10).mkString("\n")}" +
        s"\nright:\n${b.orderBy("query_id", "rank").collect().take(10).mkString("\n")}")

  private def foldCuts(cuts: Seq[Long]): VectorIndex.State = {
    val st = VectorIndex.State(tmpDir("vidx") + "/s")
    val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue)).sliding(2).toSeq
    bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      VectorIndex.fold(spark, st,
        emb.filter($"vec_id" >= lo && $"vec_id" < hi), i.toLong,
        "vec_id", "embedding", nCells = 8)
    }
    st
  }

  test("full probe over any fold cut equals brute-force top-k") {
    val queries = emb.filter($"vec_id" < 10)
    val expected = Similarity.bruteForceTopK(queries, emb, "vec_id",
      "embedding", k = 5)
    for (cuts <- Seq(Seq(40L, 80L), Seq(10L, 90L))) {
      val st = foldCuts(cuts)
      val got = VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
        k = 5, nProbe = VectorIndex.nCells(spark, st))
      sameRows(got, expected, s"cut $cuts diverges from brute force")
    }
  }

  test("partial probe keeps recall on real embeddings") {
    val st = foldCuts(Seq(60L))
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
        k = 5, nProbe = 4)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall too low: $recall")
  }

  test("replayed batch id is a no-op; quantizer publishes exactly once") {
    val st = VectorIndex.State(tmpDir("vidx-replay") + "/s")
    val b0 = emb.filter($"vec_id" < 50); val b1 = emb.filter($"vec_id" >= 50)
    VectorIndex.fold(spark, st, b0, 0L, "vec_id", "embedding", nCells = 8)
    val centsAfter0 = graft.gold.SnapshotStore.read(spark, st.centroidsPath)
      .collect().map(_.toString).sorted.toSeq
    VectorIndex.fold(spark, st, b1, 1L, "vec_id", "embedding", nCells = 8)
    val queries = emb.filter($"vec_id" < 5)
    val before = VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
      k = 3, nProbe = 8).collect().toSet
    // replay both batches — postings overwrite in place, centroids stay
    VectorIndex.fold(spark, st, b0, 0L, "vec_id", "embedding", nCells = 8)
    VectorIndex.fold(spark, st, b1, 1L, "vec_id", "embedding", nCells = 8)
    assert(graft.gold.SnapshotStore.currentGen(spark, st.centroidsPath)
      .contains(1L), "quantizer must freeze at generation 1")
    assert(graft.gold.SnapshotStore.read(spark, st.centroidsPath)
      .collect().map(_.toString).sorted.toSeq == centsAfter0)
    assert(VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
      k = 3, nProbe = 8).collect().toSet == before)
  }

  test("an empty batch is a no-op: no empty quantizer, no unreadable delta") {
    val st = VectorIndex.State(tmpDir("vidx-empty") + "/s")
    VectorIndex.fold(spark, st, emb.filter($"vec_id" < 0), 0L,
      "vec_id", "embedding", nCells = 8)
    assert(!graft.gold.SnapshotStore.exists(spark, st.centroidsPath),
      "empty first batch must not freeze a quantizer")
    VectorIndex.fold(spark, st, emb, 1L, "vec_id", "embedding", nCells = 8)
    VectorIndex.fold(spark, st, emb.filter($"vec_id" < 0), 2L,
      "vec_id", "embedding", nCells = 8)
    val queries = emb.filter($"vec_id" < 5)
    sameRows(
      VectorIndex.topK(spark, st, queries, "vec_id", "embedding", k = 3,
        nProbe = VectorIndex.nCells(spark, st)),
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 3),
      "empty folds perturbed the index")
  }

  test("PQ-ADC serve from persisted codes: full probe + wide shortlist is exact; tight budget keeps recall") {
    val st = VectorIndex.State(tmpDir("vidx-pq") + "/s")
    Seq(emb.filter($"vec_id" < 40), emb.filter($"vec_id" >= 40))
      .zipWithIndex.foreach { case (b, i) =>
        VectorIndex.fold(spark, st, b, i.toLong, "vec_id", "embedding",
          nCells = 8, pqM = 4, pqK = 16)
      }
    // postings carry codes
    assert(graft.gold.BaseDelta.read(spark, st.postingsTable)
      .columns.contains("codes"))
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
    // shortlist ≥ corpus: rerank sees everything probed — exact
    val wide = VectorIndex.topKAdc(spark, st, queries, "vec_id", "embedding",
      k = 5, nProbe = VectorIndex.nCells(spark, st), shortlist = 100000,
      pqM = 4, pqK = 16)
    sameRows(wide, exact, "wide-shortlist ADC rerank diverges from exact")
    // tight budget: approximate, but recall holds
    val tight = VectorIndex.topKAdc(spark, st, queries, "vec_id", "embedding",
        k = 5, nProbe = 4, shortlist = 32, pqM = 4, pqK = 16)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exactSet = exact.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exactSet intersect tight).size.toDouble / exactSet.size
    assert(recall >= 0.5, s"ADC recall too low: $recall")
  }

  test("erase: serving equals an index that never folded the ids; replays cannot resurrect") {
    val st = VectorIndex.State(tmpDir("vidx-erase") + "/s")
    val b0 = emb.filter($"vec_id" < 50); val b1 = emb.filter($"vec_id" >= 50)
    VectorIndex.fold(spark, st, b0, 0L, "vec_id", "embedding", nCells = 8)
    VectorIndex.fold(spark, st, b1, 1L, "vec_id", "embedding", nCells = 8)
    VectorIndex.erase(spark, st,
      emb.filter($"vec_id" >= 30 && $"vec_id" < 60).select($"vec_id"))
    val queries = emb.filter($"vec_id" < 10)
    val surviving = emb.filter($"vec_id" < 30 || $"vec_id" >= 60)
    val expected = Similarity.bruteForceTopK(queries, surviving,
      "vec_id", "embedding", k = 5)
    sameRows(VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
        k = 5, nProbe = VectorIndex.nCells(spark, st)),
      expected, "post-erasure serve diverges from the surviving corpus")
    // a redelivered old batch id must not resurrect erased vectors
    VectorIndex.fold(spark, st, b0, 0L, "vec_id", "embedding", nCells = 8)
    VectorIndex.fold(spark, st, b1, 1L, "vec_id", "embedding", nCells = 8)
    sameRows(VectorIndex.topK(spark, st, queries, "vec_id", "embedding",
        k = 5, nProbe = VectorIndex.nCells(spark, st)),
      expected, "replayed folds resurrected erased vectors")
  }

  test("scoring plan: queries broadcast, postings never shuffle for the join") {
    val st = foldCuts(Seq(60L))
    val plan = VectorIndex.topK(spark, st, emb.filter($"vec_id" < 5),
      "vec_id", "embedding", k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan.take(800))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(800))
  }
}
