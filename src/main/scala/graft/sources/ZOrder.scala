package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on TWO dimensions
  * at once so parquet min/max stats prune scans filtered on EITHER — the
  * multi-dimensional generalization of "sort by the filter column".
  *
  * A single-dim sort gives perfect pruning on that column and none on
  * any other: each file spans ~1/k of the sort key but the FULL range of
  * every other column. Interleaving the bits of two 16-bit range-ranks
  * (the Morton code) puts rows that are close in BOTH dimensions into
  * the same files, so each of k files covers ~1/√k of each dimension —
  * and a predicate on either column (or a box on both) skips most
  * row-groups via exactly the footer stats the layout tightened.
  * (OperatorsSpec measures this: per-file normalized spans ~0.3 in BOTH
  * dims for a 16-file z-layout, vs ~1.0 in the off dimension for a
  * plain sort.)
  *
  * Scale shape: the z-value is a pure map-side expression (ten bitwise
  * ops per dimension, whole-stage-codegen'd); the layout itself is one
  * range exchange on the z-value — the same shuffle a plain
  * sort-by-write pays — then in-partition sorts. Bounds come from a
  * one-row stats aggregate the caller broadcasts (never collected per
  * row). The curve order is a pure function of (value, bounds), so the
  * layout is deterministic and the z-value column is cross-engine-exact
  * (integer bit ops + dyadic-rational ranks; DuckDB oracle q78).
  */
object ZOrder {

  /** 16-bit range rank of `v` within [lo, hi]: 0 at lo, 65535 at hi,
    * clamped (values outside the bounds saturate; a degenerate lo=hi
    * range ranks everything 0).
    */
  def rank16(v: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L)).otherwise(
      least(greatest(
        floor((v - lo) / (hi - lo) * lit(65535.0)).cast("long"),
        lit(0L)), lit(65535L)))

  /** Spread the low 16 bits of `x` to even positions (Morton spread):
    * bit i of x lands at bit 2i. The classic mask-doubling sequence —
    * four shift/or/and steps, no loop.
    */
  def spread16(x: Column): Column = {
    val a = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two dimensions: bits of `a`'s rank at odd
    * positions, `b`'s at even. Bounds are Columns so callers feed them
    * from a broadcast one-row stats frame (never driver-collected).
    */
  def zValue(a: Column, aLo: Column, aHi: Column,
             b: Column, bLo: Column, bHi: Column): Column =
    shiftleft(spread16(rank16(a, aLo, aHi)), 1)
      .bitwiseOR(spread16(rank16(b, bLo, bHi)))

  /** Re-cluster `df` along the Morton curve into `numFiles` range
    * partitions, each internally z-sorted — write the result and every
    * file's min/max footer stats are tight in both dimensions.
    */
  def layout(df: DataFrame, z: Column, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Zone-map pruning effectiveness of a physical layout — the number
    * an OPTIMIZE/Z-order decision should be made on, measured instead of
    * assumed. Rows are laid out in `orderCol` order and cut into
    * simulated files of `rowsPerFile`; each file's (min, max) of
    * `valueCol` is its zone map, and a range predicate [lo, hi] scans a
    * file iff the zone overlaps it — exactly how Parquet row-group
    * pruning reads footer stats. Output is one row per layout:
    * (layout, n_files, n_scanned, rows_scanned, rows_matched) —
    * `n_scanned/n_files` is the survival rate a bad layout shows as ~1.0
    * and a clustered one as ~range/domain.
    *
    * Scale note: the exact file position is a range-partitioned sort
    * consumed once via `zipWithIndex` (the [[graft.gold.Marts.assignSurrogates]]
    * pattern) — a distributed rank, never a single-partition window, so
    * the audit runs at any sample size. Against a real WRITTEN table the
    * same readout comes from the files themselves
    * ([[graft.gold.Optimize.fileZoneStats]] reads per-file min/max with
    * one metadata-sized aggregation).
    */
  def pruningStats(df: DataFrame, layoutLabel: String, orderCols: Seq[Column],
                   valueCol: Column, rowsPerFile: Int,
                   lo: Column, hi: Column): DataFrame = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive, got $rowsPerFile")
    require(orderCols.nonEmpty, "need at least one layout order column")
    val spark = df.sparkSession
    val withV = df.withColumn("__v", valueCol)
    val sorted = withV
      .repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val vIdx = sorted.schema.fieldIndex("__v")
    val vField = sorted.schema(vIdx)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(vIdx), i)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(vField,
      org.apache.spark.sql.types.StructField("__rn",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val files = spark.createDataFrame(indexed, schema)
      .withColumn("__file", expr(s"__rn div ${rowsPerFile}L"))
      .groupBy(col("__file"))
      .agg(min(col("__v")).as("zmin"), max(col("__v")).as("zmax"),
        count(lit(1)).cast("long").as("n_rows"),
        sum(when(col("__v").between(lo, hi), 1L).otherwise(0L)).as("n_match"))
    files.agg(
        count(lit(1)).cast("long").as("n_files"),
        sum(when(col("zmax") >= lo && col("zmin") <= hi, 1L).otherwise(0L))
          .as("n_scanned"),
        sum(when(col("zmax") >= lo && col("zmin") <= hi, col("n_rows"))
          .otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matched"))
      .select(lit(layoutLabel).as("layout"), col("n_files"),
        col("n_scanned"), col("rows_scanned"), col("rows_matched"))
  }
}
