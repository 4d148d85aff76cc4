package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{DataType, LongType}

/** Distributed count–min sketch over 64-bit hashes — the frequency
  * analog of [[BloomFunctions]]: the stream aggregates into a fixed
  * `depth × width` counter table (merge = elementwise add, associative
  * and commutative, so partial aggregation applies), and a codegen'd
  * probe reads the min-of-rows estimate against a reference-object
  * `long[]` with zero shuffle.
  *
  * The estimate NEVER undercounts (every row's counter received every
  * occurrence; collisions only add), so `estimate(h) >= minCount` is a
  * LOSSLESS prefilter for "tokens with true count >= minCount": an exact
  * count over the survivors equals the exact count over everything —
  * the same exactness-preserving dance as the Bloom decontamination
  * prefilter. At 100 TB that is the difference between hash-aggregating
  * trillions of distinct tail tokens (map-side combine degenerates when
  * the group count exceeds task memory — every tail token rides the
  * shuffle) and aggregating only the heavy candidates that survive a
  * map-side probe.
  *
  * Error bound (standard CMS): overestimate <= 2N/width with probability
  * >= 1 − 2^−depth per query, N = stream length. Size width so that
  * 2N/width is far below minCount and the candidate set stays near-exact.
  */
object CountMinFunctions {

  val DefaultWidth: Int = 1 << 16
  val DefaultDepth: Int = 4

  private def co(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)

  /** Aggregate column building the counter table: one `array<bigint>` row
    * of `depth * width` counters. `df.agg(cmsAgg(1 << 16, 4)(col("h")))`.
    */
  def cmsAgg(width: Int = DefaultWidth,
             depth: Int = DefaultDepth): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new CountMinAgg(width, depth), ExpressionEncoder[Long]())

  /** Build the sketch and collect it to the driver — bounded at
    * `depth * width * 8` bytes by construction (2 MiB at the defaults).
    */
  def build(hashes: org.apache.spark.sql.DataFrame, hashCol: String,
            width: Int = DefaultWidth, depth: Int = DefaultDepth): Array[Long] = {
    val row = hashes.agg(cmsAgg(width, depth)(
      org.apache.spark.sql.functions.col(hashCol))).head()
    if (row.isNullAt(0)) new Array[Long](width * depth)
    else row.getSeq[Long](0).toArray
  }

  /** Codegen'd frequency estimate of a 64-bit hash column: min over the
    * sketch's depth rows. `width` is recovered from `counts.length / depth`.
    */
  def estimate(hash: Column, counts: Array[Long], depth: Int = DefaultDepth): Column =
    co(CountMinEstimate(ex(hash), counts, depth))
}

object CountMinKernels {

  /** Kirsch–Mitzenmacher double hashing, one slot per depth row:
    * row r probes `(h + r·h2) & (width−1)` in its own width-sized bank.
    */
  @inline private def h2of(h: Long): Long = HashFunctions.splitmix64(h) | 1L

  def add(counts: Array[Long], depth: Int, h: Long): Unit = {
    val width = counts.length / depth
    val mask = (width - 1).toLong
    val h2 = h2of(h)
    var r = 0
    while (r < depth) {
      counts(r * width + ((h + r * h2) & mask).toInt) += 1L
      r += 1
    }
  }

  def estimate(counts: Array[Long], depth: Int, h: Long): Long = {
    val width = counts.length / depth
    val mask = (width - 1).toLong
    val h2 = h2of(h)
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = counts(r * width + ((h + r * h2) & mask).toInt)
      if (c < min) min = c
      r += 1
    }
    min
  }

  def plus(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }
}

/** Typed aggregator: 64-bit hashes → CMS counter table (`depth * width`
  * longs, row-major by depth).
  */
class CountMinAgg(width: Int, depth: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(width >= 64 && (width & (width - 1)) == 0,
    s"width must be a power of two >= 64, got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
  override def zero: Array[Long] = new Array[Long](width * depth)
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    CountMinKernels.add(buf, depth, h); buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CountMinKernels.plus(a, b)
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** `counts` rides the expression as a reference object — serialized once
  * per task with the generated code, never a join side.
  */
case class CountMinEstimate(child: Expression, counts: Array[Long], depth: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      CountMinKernels.estimate(counts, depth, input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countsRef = ctx.addReferenceObj("cmsCounts", counts, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.CountMinKernels.estimate($countsRef, $depth, $h);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
