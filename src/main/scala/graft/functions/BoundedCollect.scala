package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a hard per-group element cap — the memory guard for
  * within-bucket candidate-pair generation (Dedup.bucketPairs).
  *
  * Semantics: groups with ≤ `cap` non-null values yield exactly
  * `collect_list`'s result (order unspecified, callers normalize with
  * `sort_array`); a group that exceeds the cap yields NULL. The buffer
  * never holds more than `cap` elements no matter how large the group is —
  * past the cap, elements are counted but not stored — so a pathological
  * hot bucket (a stopword shingle shared by millions of documents at
  * corpus scale) costs O(cap) executor memory instead of O(|bucket|).
  *
  * This is a document-frequency prune expressed as an aggregate: a bucket
  * key carried by more than `cap` rows identifies a feature too common to
  * signal similarity, so the whole bucket is dropped (NULL), not sampled —
  * sampling would produce a biased, run-dependent pair set.
  *
  * Plan shape: a `TypedImperativeAggregate`, so it aggregates via
  * ObjectHashAggregate exactly like `collect_list` — partial map-side
  * buffers, one shuffle on the group key, no sort.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollectList.Buffer]
  with UnaryLike[Expression] {

  require(cap >= 1, s"bounded_collect_list cap must be >= 1, got $cap")

  override def prettyName: String = "bounded_collect_list"
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): BoundedCollectList.Buffer =
    new BoundedCollectList.Buffer(0L, new ArrayBuffer[Any])

  override def update(buf: BoundedCollectList.Buffer, input: InternalRow): BoundedCollectList.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.total += 1
      if (buf.items.length < cap) buf.items += InternalRow.copyValue(v)
    }
    buf
  }

  override def merge(a: BoundedCollectList.Buffer, b: BoundedCollectList.Buffer): BoundedCollectList.Buffer = {
    a.total += b.total
    val it = b.items.iterator
    while (a.items.length < cap && it.hasNext) a.items += it.next()
    a
  }

  override def eval(buf: BoundedCollectList.Buffer): Any =
    if (buf.total > cap) null else new GenericArrayData(buf.items.toArray)

  @transient private lazy val serProjection =
    UnsafeProjection.create(Array[DataType](
      LongType, ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: BoundedCollectList.Buffer): Array[Byte] =
    serProjection.apply(InternalRow(
      buf.total, new GenericArrayData(buf.items.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): BoundedCollectList.Buffer = {
    val row = new UnsafeRow(2)
    row.pointTo(bytes, bytes.length)
    val buf = new BoundedCollectList.Buffer(row.getLong(0), new ArrayBuffer[Any])
    row.getArray(1).foreach(child.dataType,
      (_, v: Any) => buf.items += InternalRow.copyValue(v))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(c: Expression): BoundedCollectList =
    copy(child = c)
}

object BoundedCollectList {
  /** (total seen, first ≤cap stored) — total keeps counting past the cap so
    * eval can distinguish "exactly cap" from "overflowed".
    */
  final class Buffer(var total: Long, val items: ArrayBuffer[Any])

  /** Column form: `groupBy(k).agg(boundedCollectList(col, cap))`. */
  def column(e: Column, cap: Int): Column = {
    val bridge = org.apache.spark.sql.graftbridge.ColumnBridge
    bridge.column(BoundedCollectList(bridge.expr(e), cap).toAggregateExpression())
  }
}
