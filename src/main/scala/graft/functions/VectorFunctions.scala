package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** Vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Two tiers (SURVEY.md §7.4):
  *  - `*_hof` variants compose built-in higher-order functions
  *    (`zip_with` + `aggregate`) — declarative, oracle-friendly
  *    (deterministic left-fold in DOUBLE, bitwise-reproducible in DuckDB's
  *    `list_reduce` too).
  *  - `CosineSimilarity` is a native Catalyst Expression evaluating a tight
  *    primitive loop per row — no per-element Catalyst dispatch, no boxed
  *    intermediates; this is the hot-path form for 100 TB brute-force
  *    scoring. (CodegenFallback: the fallback call is one virtual call per
  *    row; the O(dim) inner loop is plain JVM code.)
  */
object VectorFunctions {

  /** Deterministic left-fold dot product in double precision. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (normHof(a) * normHof(b))

  // Spark 4: Column↔Expression bridging is private[sql] — see ColumnBridge
  private def ex(c: Column) = org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)
  private def co(e: Expression) = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Native fast path. */
  def cosine(a: Column, b: Column): Column = co(CosineSimilarity(ex(a), ex(b)))

  def dot(a: Column, b: Column): Column = co(DotProduct(ex(a), ex(b)))

  /** Per-vector symmetric int8 quantization — the 4× storage/bandwidth cut
    * for embedding columns at 100 TB (scan less, score more per byte):
    * scale = max|x|/127, q_i = floor(x_i·127/max|x| + 0.5) ∈ [-127, 127].
    * `floor(+0.5)` instead of `round()` because engines disagree on
    * rounding modes; floor is bit-identical everywhere, which keeps the
    * DuckDB oracle exact. Returns struct<scale: double, qvec: array<int>>.
    *
    * Native expression, not HOFs: the declarative form (`transform`
    * referencing an `array_max(transform(…))`) re-evaluates the max per
    * element — O(d²) per row, measured ~10× slower at 64 dims.
    */
  def quantizeInt8(vec: Column): Column = co(QuantizeInt8(ex(vec)))

  /** Reconstruct approximate float values from an int8 quantized vector. */
  def dequantizeInt8(qvec: Column, scale: Column): Column =
    transform(qvec, q => (q.cast("double") * scale).cast("float"))

  /** Matryoshka truncation: keep the first `m` dims and L2-renormalize —
    * the standard cheap-retrieval trick for MRL-trained embeddings (score
    * at m dims, rerank at full width; m/d of the scan bytes). Map-only,
    * declarative (slice + one fold); per-component output rounded to
    * `roundTo` decimals so downstream cosines are engine-reproducible.
    * A zero-norm prefix returns the zero vector rather than NaN.
    */
  def matryoshka(vec: Column, m: Int, roundTo: Int = 6): Column = {
    val pre = slice(vec, 1, m)
    val n = normHof(pre)
    transform(pre, x =>
      round(when(n === 0.0, lit(0.0)).otherwise(x.cast("double") / n), roundTo))
  }
}

/** cos(a,b) over two float arrays; null if either input is null or lengths
  * differ. Accumulates in double, index order — same result as the HOF
  * left-fold form. Implements doGenCode so the scoring loop participates
  * in whole-stage codegen (no per-row virtual dispatch in the ANN path).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val dn = ctx.freshName("dn")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = (double) $a.getFloat($i);
            double $yi = (double) $b.getFloat($i);
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          double $dn = Math.sqrt($nx) * Math.sqrt($ny);
          if ($dn == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $dn; }
        }"""
    })
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val d = math.sqrt(nx) * math.sqrt(ny)
    if (d == 0.0) null else dot / d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_similarity needs two array<float> args, got ${left.dataType} / ${right.dataType}")
    }
  }
}

/** Static kernel for QuantizeInt8 (callable from generated code). */
object VectorKernels {
  def quantizeInt8(v: ArrayData): InternalRow = {
    val n = v.numElements()
    var am = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(v.getFloat(i).toDouble)
      if (a > am) am = a
      i += 1
    }
    val q = new Array[Int](n)
    if (am > 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(v.getFloat(i).toDouble * 127.0 / am + 0.5).toInt
        i += 1
      }
    }
    InternalRow(am / 127.0,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(q))
  }
}

/** array<float> → struct<scale: double, qvec: array<int>> symmetric int8
  * quantization in one pass (see VectorFunctions.quantizeInt8).
  */
case class QuantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qvec", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullSafeEval(input: Any): Any =
    VectorKernels.quantizeInt8(input.asInstanceOf[ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VectorKernels.quantizeInt8($a);")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 needs array<float>, got $other")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $dot;
        }"""
    })
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
