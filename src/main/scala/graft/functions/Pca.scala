package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column, one pass + a driver-side
  * d×d eigendecomposition.
  *
  * The scale insight (the classic tall-skinny design, e.g. Spark MLlib's
  * own `RowMatrix.computeGramianMatrix`): for n vectors of width d with
  * n ≫ d, the covariance eigenproblem only needs the d×d Gramian
  * Σ x xᵀ and the d-vector column sums — both are one associative,
  * map-side-combinable aggregation over the corpus (each task combines
  * locally into a fixed d(d+1)/2 buffer; the shuffle carries one buffer
  * per task). The O(d³) eigensolve happens once on the driver where
  * d ≤ a few thousand, and the projection back over the corpus is a
  * map-only matmul against a broadcast literal. Nothing corpus-sized is
  * collected, sorted, or joined.
  *
  * Cross-engine exactness discipline (q91's oracle): every component is
  * snapped to integer micro-units `m = floor(x·10⁶ + 0.5)`, every
  * product term to `floor((mᵢ·mⱼ + 500000)/10⁶)` — integer arithmetic
  * whose sums are order-independent, so Spark's partition-parallel
  * aggregation and DuckDB's serial one agree bit-for-bit. (A double
  * accumulator would depend on partition count.) Term magnitude for
  * unit-scale embeddings is ~10⁶, so the Long sum overflows only past
  * ~10¹² rows — documented bound, far beyond the 10⁸-vector corpora the
  * operator targets per group.
  */
object Pca {

  /** One-pass Gramian + column-sum accumulator in micro-units.
    * Buffer layout: [n, sum_micro(0..d-1), gram_micro upper triangle
    * row-major (i ≤ j)].
    */
  private[graft] class GramianAgg(d: Int)
      extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {
    private val tri = d * (d + 1) / 2
    override def zero: Array[Long] = new Array[Long](1 + d + tri)
    override def reduce(buf: Array[Long], v: Seq[Float]): Array[Long] = {
      if (v != null) {
        require(v.length == d, s"gramian(d=$d) got a ${v.length}-wide vector")
        val m = new Array[Long](d)
        var i = 0
        while (i < d) {
          m(i) = math.floor(v(i).toDouble * 1e6 + 0.5).toLong; i += 1
        }
        buf(0) += 1L
        i = 0
        var k = 1 + d
        while (i < d) {
          buf(1 + i) += m(i)
          var j = i
          while (j < d) {
            buf(k) += math.floor((m(i) * m(j) + 500000L) / 1e6).toLong
            k += 1; j += 1
          }
          i += 1
        }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** Corpus Gramian as rows (i, j, g_micro) for the upper triangle
    * (i ≤ j), g in 10⁻⁶ units. One aggregation; the explode at the end
    * runs over the single d(d+1)/2-slot result row, never the corpus.
    */
  def gramian(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new GramianAgg(d), ExpressionEncoder[Seq[Float]]())
    val buf = df.select(agg(col(vecCol)).as("buf"))
    // index math mirrors GramianAgg's row-major upper-triangle layout:
    // slot k (0-based within the triangle) ↔ (i, j); enumerate (i, j)
    // driver-side (d² is tiny) and join positions — no per-row compute
    val pairs = (for { i <- 0 until d; j <- i until d } yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
    val idx = spark.createDataset(pairs).toDF("k", "i", "j")
    buf.select(posexplode(slice(col("buf"), 1 + d + 1, d * (d + 1) / 2)))
      .toDF("k", "g_micro")
      .join(broadcast(idx), Seq("k"))
      .select(col("i"), col("j"), col("g_micro"))
  }

  /** Fitted model: component c is `components(c)` (unit length, rows of
    * Vᵀ), eigenvalues in descending order are the per-component variances
    * ·n of the CENTERED data.
    */
  case class Model(mean: Array[Double], eigenvalues: Array[Double],
                   components: Array[Array[Double]])

  /** Fit top-`k` principal components of `df(vecCol)` (width `d`) in one
    * distributed pass + a driver-side Jacobi eigensolve of the d×d
    * centered scatter matrix.
    */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): Model = {
    require(k >= 1 && k <= d)
    val spark = df.sparkSession
    import spark.implicits._
    val agg = udaf(new GramianAgg(d), ExpressionEncoder[Seq[Float]]())
    val buf = df.select(agg(col(vecCol)).as("buf"))
      .as[Seq[Long]].head().toArray
    val n = buf(0).toDouble
    require(n >= 2, s"pca needs at least 2 vectors, got $n")
    val mean = Array.tabulate(d)(i => buf(1 + i) / 1e6 / n)
    // centered scatter S = G - n·μμᵀ (micro-unit G back to doubles)
    val s = Array.ofDim[Double](d, d)
    var kk = 1 + d
    for (i <- 0 until d; j <- i until d) {
      val g = buf(kk) / 1e6
      val c = g - n * mean(i) * mean(j)
      s(i)(j) = c; s(j)(i) = c
      kk += 1
    }
    val (values, vectors) = eigenSym(s)
    Model(mean, values.take(k), vectors.take(k))
  }

  /** Map-only projection of `vecCol` onto the model's components:
    * out(c) = Σᵢ (x(i) − μ(i))·V(c)(i), built from broadcast literal
    * arrays + codegen'd `zip_with`/`aggregate` — no UDF, no shuffle.
    */
  def project(df: DataFrame, vecCol: String, model: Model,
              outCol: String = "pca"): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      typedLit(model.mean.toSeq), (x, m) => x - m)
    val comps = model.components.map { v =>
      aggregate(zip_with(centered, typedLit(v.toSeq), (x, c) => x * c),
        lit(0.0), (acc, e) => acc + e)
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — O(d³) per
    * sweep, converges quadratically; plenty for the d ≤ a few thousand
    * widths embeddings use. Returns (eigenvalues desc, matching unit
    * eigenvectors as rows).
    */
  private[graft] def eigenSym(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-12 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < maxSweeps) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        // standard symmetric Jacobi rotation annihilating a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        // sign(0) must be +1 here: equal diagonal entries (θ = 0) need the
        // full 45° rotation, and math.signum's 0 would zero it out
        val sg = if (theta >= 0.0) 1.0 else -1.0
        val t = sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (i <- 0 until d) {
          val aip = a(i)(p); val aiq = a(i)(q)
          a(i)(p) = c * aip - s * aiq
          a(i)(q) = s * aip + c * aiq
        }
        for (i <- 0 until d) {
          val api = a(p)(i); val aqi = a(q)(i)
          a(p)(i) = c * api - s * aqi
          a(q)(i) = s * api + c * aqi
        }
        for (i <- 0 until d) {
          val vip = v(i)(p); val viq = v(i)(q)
          v(i)(p) = c * vip - s * viq
          v(i)(q) = s * vip + c * viq
        }
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map(i => Array.tabulate(d)(r => v(r)(i))).toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
