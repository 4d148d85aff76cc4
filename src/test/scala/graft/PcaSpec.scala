package graft

import org.apache.spark.sql.functions._
import graft.functions.Pca

/** Distributed Gramian + driver-side eigensolve + map-only projection. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gramian matches a hand-computed upper triangle in micro-units") {
    val df = Seq(
      Tuple1(Array(1.0f, 2.0f)),
      Tuple1(Array(3.0f, -1.0f))).toDF("v")
    val g = Pca.gramian(df, "v", 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // G = [[1+9, 2-3], [., 4+1]] = [[10, -1], [., 5]] in units of 1e-6
    assert(g == Map((0, 0) -> 10000000L, (0, 1) -> -1000000L, (1, 1) -> 5000000L))
  }

  test("gramian is invariant to partitioning (order-independent integer sums)") {
    val vs = (1 to 97).map(i => Tuple1(Array(
      (math.sin(i * 0.7) * 1.3).toFloat, (math.cos(i * 1.1) * 0.8).toFloat,
      (math.sin(i * 2.3) * 0.2).toFloat)))
    val a = Pca.gramian(vs.toDF("v").repartition(1), "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = Pca.gramian(vs.toDF("v").repartition(7), "v", 3).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("eigenSym recovers a known spectrum with orthonormal vectors") {
    // A = V diag(5, 2, 1) V^T for a hand-built orthonormal V
    val s2 = math.sqrt(2) / 2
    val v = Array(
      Array(s2, s2, 0.0),
      Array(-s2, s2, 0.0),
      Array(0.0, 0.0, 1.0))
    val lam = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => v(k)(i) * lam(k) * v(k)(j)).sum)
    val (values, vectors) = Pca.eigenSym(a)
    assert(values.zip(lam).forall { case (g, w) => math.abs(g - w) < 1e-9 })
    // A x = λ x for each returned vector
    for (c <- 0 until 3) {
      val x = vectors(c)
      val ax = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * x(j)).sum)
      assert((0 until 3).forall(i => math.abs(ax(i) - values(c) * x(i)) < 1e-9))
    }
    // orthonormal rows
    for (c1 <- 0 until 3; c2 <- c1 until 3) {
      val dot = (0 until 3).map(i => vectors(c1)(i) * vectors(c2)(i)).sum
      assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9)
    }
  }

  test("fit + project: per-component variance matches the eigenvalues, components decorrelate") {
    // anisotropic synthetic cloud: var along axis0 ≫ axis1 ≫ axis2
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextGaussian() * 4.0
      val b = rnd.nextGaussian() * 1.5
      val c = rnd.nextGaussian() * 0.3
      // rotate so components are NOT axis-aligned
      Tuple1(Array((0.8 * a + 0.6 * b).toFloat, (-0.6 * a + 0.8 * b).toFloat,
        (c + 0.1 * a).toFloat))
    }
    val df = rows.toDF("v")
    val model = Pca.fit(df, "v", d = 3, k = 3)
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) > model.eigenvalues(2))
    val proj = Pca.project(df, "v", model).select(col("pca")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = proj.length.toDouble
    for (c <- 0 until 3) {
      val mean = proj.map(_(c)).sum / n
      // projection of centered data: mean ≈ 0
      assert(math.abs(mean) < 1e-6, s"component $c mean $mean")
      val ss = proj.map(p => (p(c) - mean) * (p(c) - mean)).sum
      // eigenvalue of the scatter matrix IS the summed square along the
      // component (up to micro-unit rounding of the Gramian)
      assert(math.abs(ss - model.eigenvalues(c)) / model.eigenvalues(c) < 1e-2,
        s"component $c: ss=$ss eig=${model.eigenvalues(c)}")
    }
    // cross-component covariance ≈ 0
    val cov01 = proj.map(p => p(0) * p(1)).sum / n
    assert(math.abs(cov01) < 0.15, s"cov01=$cov01")
  }

  test("project is map-only: no exchange in the plan") {
    val df = (1 to 10).map(i => Tuple1(Array(i.toFloat, (i * 2).toFloat)))
      .toDF("v")
    val model = Pca.Model(Array(0.0, 0.0), Array(1.0, 0.5),
      Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val p = Pca.project(df, "v", model).queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
