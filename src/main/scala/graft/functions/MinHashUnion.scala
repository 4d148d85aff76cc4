package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` merging MinHash signatures element-wise-min — the
  * group-level sketch. Because a MinHash slot is the min over a shingle
  * set, the element-wise min of two signatures IS the signature of the
  * UNION of their shingle sets (no approximation on top of MinHash
  * itself). That makes corpus-level similarity cheap: aggregate one
  * 32-slot signature per group (source, domain, day…), then estimate
  * Jaccard between groups as the fraction of agreeing slots — without
  * ever joining the underlying documents.
  *
  * Scale shape: partial aggregation applies (merge is associative and
  * commutative), so each map task combines locally and the shuffle
  * carries one fixed-size array per group per task.
  */
class MinHashUnion(numHashes: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
  override def reduce(buf: Array[Long], sig: Seq[Long]): Array[Long] = {
    if (sig != null) {
      // a wrong-width signature is a caller bug (e.g. 64-slot signatures
      // into column(32)) — silently skipping it would yield an empty-set
      // signature that estJaccard reads as spuriously similar
      require(sig.length == numHashes,
        s"minhash_union(numHashes=$numHashes) got a ${sig.length}-slot signature")
      var i = 0
      while (i < numHashes) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
    }
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object MinHashUnion {
  /** Untyped-DataFrame form: `df.groupBy(g).agg(MinHashUnion.column(32)(col("sig")))`. */
  def column(numHashes: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new MinHashUnion(numHashes), ExpressionEncoder[Seq[Long]]())

  /** Estimated Jaccard between two signatures: fraction of agreeing slots.
    * Null when either side is the empty-set signature (untouched
    * Long.MaxValue slots — a group whose docs produced no shingles):
    * Jaccard against an empty set is undefined, and counting MaxValue
    * agreement would report unrelated empty corpora as identical.
    */
  def estJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val est =
      size(filter(zip_with(a, b, (x, y) => x === y), c => c)).cast("double") / size(a)
    when(element_at(a, 1) === Long.MaxValue || element_at(b, 1) === Long.MaxValue,
      lit(null).cast("double")).otherwise(est)
  }
}
