package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.gold.Marts
import graft.operators.Dedup

/** Operators checked against naive reference implementations on generated
  * inputs — validates the scale-shaped plans (bucket-collect pairs, window
  * sweeps) compute the same answers as the obvious O(n²) forms.
  */
class ReferenceSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1000L + i)))

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
  private val docGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  test("ngramJaccard matches a naive all-pairs computation") {
    samples(docGen, 5).foreach { docs =>
      def shingleSet(t: String): Set[String] =
        t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      val naive = (for {
        (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
        sa = shingleSet(ta); sb = shingleSet(tb)
        inter = (sa & sb).size if inter > 0
        j = inter.toDouble / (sa ++ sb).size if j >= 0.2
      } yield ((ia, ib), j)).toMap
      val got = Dedup.ngramJaccard(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = 3, threshold = 0.2).collect()
        .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
          r.getAs[Double]("jaccard"))).toMap
      assert(got.keySet == naive.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - naive(k)) < 1e-12) }
    }
  }

  private val asOfGen: Gen[(List[(Long, Int, Int)], List[(Int, Int, Double)])] =
    for {
      lefts <- Gen.listOfN(15, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 20)))
      rights <- Gen.listOfN(10, Gen.zip(Gen.choose(1, 3), Gen.choose(0, 20),
        Gen.choose(1, 99).map(_.toDouble)))
    } yield (
      lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      rights.distinctBy(r => (r._1, r._2)))  // unique (key, ts) right rows

  test("asOfJoin matches a naive latest-at-or-before lookup") {
    samples(asOfGen, 6).foreach { case (lefts, rights) =>
      val leftDf = lefts.map { case (id, k, t) => (id, k, ts(f"2024-01-01 00:${t}%02d:00")) }
        .toDF("lid", "k", "ts")
      val rightDf = rights.map { case (k, t, v) => (k, ts(f"2024-01-01 00:${t}%02d:00"), v) }
        .toDF("k", "rts", "rate")
      val got = Marts.asOfJoin(leftDf, rightDf, Seq("k"), "ts", "rts", Seq("rate"))
        .collect().map(r => r.getAs[Long]("lid") ->
          (if (r.isNullAt(r.fieldIndex("rate"))) None else Some(r.getAs[Double]("rate")))).toMap
      val naive = lefts.map { case (id, k, t) =>
        id -> rights.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == naive)
    }
  }

  test("minHash est_jaccard is exact 1.0 for identical shingle sets") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),
      (3L, "z1 z2 z3 z4 z5 z6")).toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      bands = 8, rowsPerBand = 4, minEstJaccard = 0.0).collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(!pairs.contains((1L, 3L)))
  }
}
