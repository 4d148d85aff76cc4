package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.BaseDelta
import graft.operators.{LshVectorIndex, Similarity}

/** Persisted hyperplane-LSH vector index: data-independent routing means
  * the folded state serves exactly what the recompute path serves under
  * any fold cut, `numPlanes = 0` is brute force by construction, the
  * frozen hyperplane family fails loudly on mismatch, a crash between
  * the two appends converges on replay, and erasure (physical and
  * logical) removes subjects from serving without touching the family.
  */
class LshVectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  private def sameRows(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what\nleft:\n${a.orderBy("query_id", "rank").collect().take(10).mkString("\n")}" +
        s"\nright:\n${b.orderBy("query_id", "rank").collect().take(10).mkString("\n")}")

  private def foldCuts(cuts: Seq[Long], planes: Int): LshVectorIndex.State = {
    val st = LshVectorIndex.State(tmpDir("lshidx") + "/s")
    val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue)).sliding(2).toSeq
    bounds.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      LshVectorIndex.fold(spark, st,
        emb.filter($"vec_id" >= lo && $"vec_id" < hi), i.toLong,
        "vec_id", "embedding", numTables = 4, numPlanes = planes)
    }
    st
  }

  test("numPlanes = 0 over any fold cut equals brute-force top-k") {
    val queries = emb.filter($"vec_id" < 10)
    val expected = Similarity.bruteForceTopK(queries, emb, "vec_id",
      "embedding", k = 5)
    for (cuts <- Seq(Seq(40L, 80L), Seq(10L, 90L))) {
      val st = foldCuts(cuts, planes = 0)
      val got = LshVectorIndex.topK(spark, st, queries, "vec_id",
        "embedding", k = 5)
      sameRows(got, expected, s"cut $cuts diverges from brute force")
    }
  }

  test("folded serve equals the recompute lshTopK under the same family") {
    val st = foldCuts(Seq(60L), planes = 6)
    val queries = emb.filter($"vec_id" < 10)
    val folded = LshVectorIndex.topK(spark, st, queries, "vec_id",
      "embedding", k = 5)
    val recompute = Similarity.lshTopK(queries, emb, "vec_id", "embedding",
      k = 5, numTables = 4, numPlanes = 6)
    sameRows(folded, recompute, "persisted index diverges from recompute")
  }

  test("planted identical twins are served at rank 1 under real planes") {
    val st = LshVectorIndex.State(tmpDir("lshidx-twin") + "/s")
    val twins = emb.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    LshVectorIndex.fold(spark, st, emb, 0L, "vec_id", "embedding",
      numTables = 8, numPlanes = 8)
    LshVectorIndex.fold(spark, st, twins, 1L, "vec_id", "embedding",
      numTables = 8, numPlanes = 8)
    val got = LshVectorIndex.topK(spark, st, emb.filter($"vec_id" < 10),
      "vec_id", "embedding", k = 3)
    val twinRank = got.filter($"neighbor_id" === $"query_id" + 1000000L)
      .select("query_id", "rank").as[(Long, Int)].collect().toMap
    (0L until 10L).foreach { q =>
      assert(twinRank.get(q).contains(1),
        s"query $q: identical twin must collide in every table and rank 1")
    }
  }

  test("the hyperplane family freezes at first fold; mismatch is loud") {
    val st = foldCuts(Seq(60L), planes = 6)
    assert(LshVectorIndex.params(spark, st).contains((4, 6)))
    val e = intercept[IllegalArgumentException] {
      LshVectorIndex.fold(spark, st, emb.limit(1), 99L, "vec_id",
        "embedding", numTables = 4, numPlanes = 8)
    }
    assert(e.getMessage.contains("froze"), e.getMessage)
  }

  test("crash between the two appends converges on replay") {
    // emulate the torn fold: vectors landed, the bands append never ran
    val full = foldCuts(Seq(60L), planes = 6)
    val torn = LshVectorIndex.State(tmpDir("lshidx-torn") + "/s")
    LshVectorIndex.fold(spark, torn, emb.filter($"vec_id" < 60), 0L,
      "vec_id", "embedding", numTables = 4, numPlanes = 6)
    val b1 = emb.filter($"vec_id" >= 60)
    BaseDelta.appendAndMaybeCompact(spark, torn.vectorsTable,
      b1.select($"vec_id".as("id"), $"embedding".as("vec")), 1L, 64)
    // replay of batch 1 completes ONLY the missing bands side
    LshVectorIndex.fold(spark, torn, b1, 1L, "vec_id", "embedding",
      numTables = 4, numPlanes = 6)
    val queries = emb.filter($"vec_id" < 10)
    sameRows(
      LshVectorIndex.topK(spark, torn, queries, "vec_id", "embedding", k = 5),
      LshVectorIndex.topK(spark, full, queries, "vec_id", "embedding", k = 5),
      "torn fold + replay diverges from the clean two-fold index")
    // and a full replay of both batches is a no-op
    LshVectorIndex.fold(spark, torn, emb.filter($"vec_id" < 60), 0L,
      "vec_id", "embedding", numTables = 4, numPlanes = 6)
    assert(BaseDelta.read(spark, torn.vectorsTable).count() == emb.count())
  }

  test("physical erase removes subjects from both tables; family survives") {
    val st = foldCuts(Seq(60L), planes = 0)
    val victims = Seq(3L, 7L, 11L).toDF("vec_id")
    LshVectorIndex.erase(spark, st, victims)
    assert(BaseDelta.read(spark, st.vectorsTable)
      .filter($"id".isin(3L, 7L, 11L)).isEmpty)
    assert(BaseDelta.read(spark, st.bandsTable)
      .filter($"id".isin(3L, 7L, 11L)).isEmpty)
    assert(LshVectorIndex.params(spark, st).contains((4, 0)))
    // serving now equals brute force over the surviving corpus
    val kept = emb.filter(!$"vec_id".isin(3L, 7L, 11L))
    val queries = emb.filter($"vec_id" < 10 && !$"vec_id".isin(3L, 7L))
    sameRows(
      LshVectorIndex.topK(spark, st, queries, "vec_id", "embedding", k = 5),
      Similarity.bruteForceTopK(queries, kept, "vec_id", "embedding", k = 5),
      "post-erasure serve must match brute force over the survivors")
  }

  test("logical erase hides subjects immediately with one id-level receipt") {
    val st = foldCuts(Seq(60L), planes = 0)
    val receipt = LshVectorIndex.eraseLogical(spark, st, Seq(5L).toDF("vec_id"))
      .collect()
    assert(receipt.length == 1 && receipt.head.getAs[Long]("n_rows_erased") == 1L,
      receipt.mkString(","))
    val queries = emb.filter($"vec_id" < 3)
    sameRows(
      LshVectorIndex.topK(spark, st, queries, "vec_id", "embedding", k = 5),
      Similarity.bruteForceTopK(queries, emb.filter($"vec_id" =!= 5L),
        "vec_id", "embedding", k = 5),
      "acked subject must vanish from serving before materialization")
  }

  test("an empty batch is a no-op: no frozen params, no unreadable delta") {
    val st = LshVectorIndex.State(tmpDir("lshidx-empty") + "/s")
    LshVectorIndex.fold(spark, st, emb.filter($"vec_id" < 0), 0L,
      "vec_id", "embedding", numTables = 4, numPlanes = 6)
    assert(LshVectorIndex.params(spark, st).isEmpty)
    LshVectorIndex.fold(spark, st, emb, 1L, "vec_id", "embedding",
      numTables = 4, numPlanes = 6)
    assert(LshVectorIndex.topK(spark, st, emb.filter($"vec_id" < 3),
      "vec_id", "embedding", k = 3).count() == 9)
  }
}
