package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Distributed Bloom filter over 64-bit hashes — the broadcast prefilter
  * that makes benchmark decontamination (and any membership-against-a-
  * small-set operator) map-side at corpus scale: the set side aggregates
  * into a fixed-size bitset (partial aggregation applies — merge is
  * bitwise OR, associative and commutative), the probe side tests each
  * hash in generated code against a reference-object `long[]` with zero
  * shuffle. False positives only ADD candidates that an exact confirm
  * join rejects; false negatives are impossible, so an exact operator
  * wrapped around the filter stays exact.
  *
  * This is the explicit form of the runtime-filter pattern (Spark's own
  * InjectRuntimeFilter / `BloomFilterMightContain` does the same dance
  * for join pruning): we surface it as an operator primitive because the
  * decontamination set (an eval benchmark) is known small while the
  * corpus posting list is the dominant shuffle at 100 TB.
  *
  * Sizing: `numBits` must be a power of two (probe uses a mask, not a
  * mod). With k hashes and n distinct set hashes, fp ≈ (1 − e^(−kn/m))^k;
  * the default 2²³ bits (1 MiB) with k = 4 holds fp < 1% up to ~850k set
  * hashes — far beyond any benchmark suite, and one broadcast MiB per
  * executor either way.
  */
object BloomFunctions {

  val DefaultNumBits: Int = 1 << 23
  val DefaultNumHashes: Int = 4

  private def co(e: Expression): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(e)
  private def ex(c: Column): Expression =
    org.apache.spark.sql.graftbridge.ColumnBridge.expr(c)

  /** Aggregate column building the bitset: one `array<bigint>` row of
    * `numBits / 64` words. `df.agg(bloomAgg(1 << 23, 4)(col("h")))`.
    */
  def bloomAgg(numBits: Int = DefaultNumBits,
               numHashes: Int = DefaultNumHashes): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BloomAgg(numBits, numHashes), ExpressionEncoder[Long]())

  /** Build the bitset and collect it to the driver — bounded at
    * `numBits / 8` bytes by construction (the one legitimate collect:
    * same shape as Spark's own `DataFrameStatFunctions.bloomFilter`).
    */
  def build(hashes: org.apache.spark.sql.DataFrame, hashCol: String,
            numBits: Int = DefaultNumBits,
            numHashes: Int = DefaultNumHashes): Array[Long] = {
    val row = hashes.agg(bloomAgg(numBits, numHashes)(
      org.apache.spark.sql.functions.col(hashCol))).head()
    // an empty set side aggregates to null (no rows) → all-zero filter
    if (row.isNullAt(0)) new Array[Long](numBits / 64)
    else row.getSeq[Long](0).toArray
  }

  /** Codegen'd membership probe of a 64-bit hash column. */
  def mightContain(hash: Column, bits: Array[Long], numHashes: Int = DefaultNumHashes): Column =
    co(BloomContains(ex(hash), bits, numHashes))
}

object BloomKernels {

  /** Kirsch–Mitzenmacher double hashing: probe index i is
    * `h1 + i·h2 (mod m)`, h2 forced odd so the stride is coprime with the
    * power-of-two m and the k probes never collapse onto one slot.
    */
  @inline private def h2of(h: Long): Long = HashFunctions.splitmix64(h) | 1L

  def set(bits: Array[Long], numHashes: Int, h: Long): Unit = {
    val mask = bits.length.toLong * 64L - 1L
    val h2 = h2of(h)
    var i = 0
    while (i < numHashes) {
      val idx = (h + i * h2) & mask
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L).toInt)
      i += 1
    }
  }

  def probe(bits: Array[Long], numHashes: Int, h: Long): Boolean = {
    val mask = bits.length.toLong * 64L - 1L
    val h2 = h2of(h)
    var i = 0
    while (i < numHashes) {
      val idx = (h + i * h2) & mask
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  def or(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}

/** Typed aggregator: 64-bit hashes → Bloom bitset (`numBits / 64` longs). */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
    s"numBits must be a power of two >= 64, got $numBits")
  override def zero: Array[Long] = new Array[Long](numBits / 64)
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    BloomKernels.set(buf, numHashes, h); buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    BloomKernels.or(a, b)
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** `bits` rides the expression as a reference object — serialized once per
  * task with the generated code, never a join side. Marked non-foldable
  * implicitly (non-literal), deterministic, null ⇒ null.
  */
case class BloomContains(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      BloomKernels.probe(bits, numHashes, input.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.BloomKernels.probe($bitsRef, $numHashes, $h);")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
