package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** A frozen batch of seed/centroid vectors riding codegen'd probe
  * expressions as ONE reference object — the Bloom/CMS probe shape for
  * vector elections. The alternative (a `least(...)` chain of one
  * cosine sub-expression per seed, or a crossJoin + window argmax)
  * is codegen-hostile: past ~100 seeds the generated method blows the
  * JVM's 64 KB limit and Spark silently falls back to INTERPRETED
  * evaluation ("Expr codegen error and falling back to interpreter
  * mode" — observed live at 1M×128 candidates, a ~10× scan slowdown),
  * and the crossJoin shape shuffles n·k rows through a window. Here the
  * seed matrix is flattened once driver-side (contiguous floats + per-
  * seed norms precomputed in the SAME accumulation order as
  * [[CosineSimilarity]], so probe values are bit-identical to the
  * expression-chain forms they replace) and each probe is one tight
  * compiled loop per row — map-side, zero shuffle, any seed count.
  */
final class SeedSet(seeds: Array[Array[Float]]) extends Serializable {
  val k: Int = seeds.length
  val dim: Int = if (k == 0) 0 else seeds(0).length
  require(seeds.forall(_.length == dim),
    s"SeedSet: ragged seed dims (expected $dim)")
  val flat: Array[Float] = {
    val f = new Array[Float](k * dim)
    var j = 0
    while (j < k) {
      System.arraycopy(seeds(j), 0, f, j * dim, dim); j += 1
    }
    f
  }
  /** sqrt(Σ s_i²) per seed, accumulated dim-order like CosineSimilarity. */
  val norm: Array[Double] = {
    val n = new Array[Double](k)
    var j = 0
    while (j < k) {
      var acc = 0.0; var i = 0
      while (i < dim) {
        val x = flat(j * dim + i).toDouble; acc += x * x; i += 1
      }
      n(j) = Math.sqrt(acc); j += 1
    }
    n
  }
}

object SeedKernels {
  /** min over seeds of (1 − cosine(v, seed)). Pairs with a zero norm (or
    * a dim mismatch) are SKIPPED — parity with the null-skipping
    * `least(1 − cosine, …)` chain this replaces; if every pair skips
    * (zero-norm v), returns 1.0 (an unattributable vector reads as far,
    * where the chain read null — no zero vectors exist in any caller).
    */
  def nearestDist(v: ArrayData, s: SeedSet): Double = {
    val j = nearestIdx(v, s)
    if (j < 0) return 1.0
    // recompute the winner's cosine (one extra dot over dim floats —
    // negligible next to the k-seed scan) with the exact op order of
    // CosineSimilarity, so values are bit-identical to the old chain
    val n = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    val dn = Math.sqrt(nv) * s.norm(j)
    var dot = 0.0
    var d = 0
    val off = j * s.dim
    while (d < n) { dot += v.getFloat(d).toDouble * s.flat(off + d); d += 1 }
    1.0 - dot / dn
  }

  /** argmax-cosine seed index, ties to the LOWEST index (the
    * `orderBy(sim desc, cell_id asc)` total order of `assignCells`);
    * −1 when every pair skips (zero-norm vector or dim mismatch).
    */
  def nearestIdx(v: ArrayData, s: SeedSet): Int = {
    val n = v.numElements()
    var nv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    val sv = Math.sqrt(nv)
    var best = Double.NegativeInfinity
    var bestIdx = -1
    if (n == s.dim && sv != 0.0) {
      var j = 0
      while (j < s.k) {
        val dn = sv * s.norm(j)
        if (dn != 0.0) {
          var dot = 0.0
          var d = 0
          val off = j * s.dim
          while (d < n) {
            dot += v.getFloat(d).toDouble * s.flat(off + d); d += 1
          }
          val cos = dot / dn
          if (cos > best) { best = cos; bestIdx = j }
        }
        j += 1
      }
    }
    bestIdx
  }
}

/** 1 − max-cosine(v, seeds): distance to the nearest seed, as one
  * codegen'd probe (see [[SeedSet]]). null vector ⇒ null.
  */
case class NearestSeedDist(child: Expression, seeds: SeedSet)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    SeedKernels.nearestDist(input.asInstanceOf[ArrayData], seeds)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seedSet", seeds, "graft.functions.SeedSet")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SeedKernels.nearestDist($v, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** argmax-cosine seed index (ties to the lowest index, −1 if nothing
  * comparable) — the map-only replacement for a crossJoin + window
  * argmax assignment when only the winning cell id is needed.
  */
case class NearestSeedIdx(child: Expression, seeds: SeedSet)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      SeedKernels.nearestIdx(input.asInstanceOf[ArrayData], seeds))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("seedSet", seeds, "graft.functions.SeedSet")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SeedKernels.nearestIdx($v, $ref);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SeedFunctions {
  private def ex(c: Column) = org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)
  private def co(e: Expression) = org.apache.spark.sql.graftbridge.ColumnBridge.column(e)

  /** Column surface: distance (1 − cosine) to the nearest of `seeds`. */
  def nearestSeedDist(vec: Column, seeds: Array[Array[Float]]): Column =
    co(NearestSeedDist(ex(vec), new SeedSet(seeds)))

  /** Column surface: index of the max-cosine seed (ties → lowest). */
  def nearestSeedIdx(vec: Column, seeds: Array[Array[Float]]): Column =
    co(NearestSeedIdx(ex(vec), new SeedSet(seeds)))
}
