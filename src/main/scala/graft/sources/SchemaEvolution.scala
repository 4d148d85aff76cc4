package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution union — read N epochs of an evolving table as ONE
  * frame (the lakehouse `mergeSchema` semantic, made explicit and
  * checkable): columns are aligned BY NAME across epochs, columns an
  * epoch lacks read as typed nulls, and numeric types widen to the
  * least common supertype (integral chain byte→short→int→long; any
  * fractional mix → double, never float, so no silent precision cliff).
  * Genuinely incompatible columns (string vs numeric, array vs scalar)
  * fail LOUDLY with the column name — schema drift a union cannot
  * represent is a pipeline bug, not something to coerce.
  *
  * Scale shape: pure metadata work on the driver (schemas, not data)
  * followed by per-epoch `select` projections and `unionByName` — the
  * union is a plan combinator, zero shuffle; each epoch's casts are
  * codegen'd map work. Column order is first-appearance order, so the
  * output schema is a pure function of the input schema sequence
  * (replayable).
  */
object SchemaEvolution {

  private def rank(t: DataType): Option[Int] = t match {
    case ByteType => Some(1); case ShortType => Some(2)
    case IntegerType => Some(3); case LongType => Some(4)
    case FloatType => Some(5); case DoubleType => Some(6)
    case _ => None
  }

  // exact decimal digits an integral type can need — for lossless
  // integral→decimal widening
  private def integralDigits(t: DataType): Option[Int] = t match {
    case ByteType => Some(3); case ShortType => Some(5)
    case IntegerType => Some(10); case LongType => Some(20)
    case _ => None
  }

  /** Least common supertype of two column types, or a loud failure. */
  def widen(name: String, a: DataType, b: DataType): DataType =
    if (a == b) a
    else ((a, b) match {
      // decimal precision evolution (the standard money-column widening:
      // decimal(10,2) → decimal(12,2)) is lossless when integer-digit and
      // scale headroom both grow to cover each side
      case (da: DecimalType, db: DecimalType) =>
        val scale = da.scale max db.scale
        val intDigits = (da.precision - da.scale) max (db.precision - db.scale)
        Some(DecimalType((intDigits + scale) min DecimalType.MAX_PRECISION,
          scale))
      case (d: DecimalType, o) if integralDigits(o).isDefined =>
        Some(widenDecInt(d, integralDigits(o).get))
      case (o, d: DecimalType) if integralDigits(o).isDefined =>
        Some(widenDecInt(d, integralDigits(o).get))
      case (_: DecimalType, FloatType | DoubleType) => Some(DoubleType)
      case (FloatType | DoubleType, _: DecimalType) => Some(DoubleType)
      case _ => None
    }).orElse((rank(a), rank(b)) match {
      case (Some(ra), Some(rb)) =>
        val widest = if (ra >= rb) a else b
        // any fractional mix widens to double: long→float would silently
        // drop integer precision, float→double never loses anything
        Some(if (widest == FloatType || (ra max rb) >= 5) DoubleType
        else widest)
      case _ => None
    }).getOrElse(
      throw new IllegalArgumentException(
        s"SchemaEvolution: column '$name' is $a in one epoch and $b in " +
          "another — not union-compatible; fix the source, don't coerce"))

  private def widenDecInt(d: DecimalType, intDigits: Int): DataType =
    DecimalType(
      (((d.precision - d.scale) max intDigits) + d.scale)
        min DecimalType.MAX_PRECISION,
      d.scale)

  /** The evolved target schema of several frames: name → widened type,
    * first-appearance column order (a pure function of the input schema
    * sequence — replayable).
    */
  def evolvedSchema(dfs: Seq[DataFrame]): Seq[(String, DataType)] = {
    require(dfs.nonEmpty, "evolvedSchema needs at least one frame")
    val target = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    dfs.foreach(_.schema.fields.foreach { f =>
      target.update(f.name,
        target.get(f.name).map(widen(f.name, _, f.dataType))
          .getOrElse(f.dataType))
    })
    target.toSeq
  }

  /** Project `df` onto the target schema: missing columns read as typed
    * nulls, present columns cast to the widened type. Metadata +
    * codegen'd map work only.
    */
  def alignTo(df: DataFrame, target: Seq[(String, DataType)]): DataFrame = {
    val have = df.columns.toSet
    df.select(target.map { case (n, t) =>
      if (have(n)) col(n).cast(t).as(n) else lit(null).cast(t).as(n)
    }: _*)
  }

  /** Union all epochs under the evolved schema. */
  def unionEvolved(dfs: Seq[DataFrame]): DataFrame = {
    val target = evolvedSchema(dfs)
    dfs.map(alignTo(_, target)).reduce(_.unionByName(_))
  }
}
