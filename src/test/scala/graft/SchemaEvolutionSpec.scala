package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.SchemaEvolution

/** Schema-evolution union: by-name alignment, typed nulls, numeric
  * widening rules, and the loud-failure contract for drift a union
  * cannot represent.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("epochs align by name; absent columns read as typed nulls; order is first-appearance") {
    val v1 = Seq((1L, 10)).toDF("id", "a")
    val v2 = Seq((2L, "x")).toDF("id", "b")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.columns.toSeq == Seq("id", "a", "b"))
    val rows = out.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows == Set((1L, Some(10), None), (2L, None, Some("x"))), rows)
  }

  test("widening: integral chain takes the larger; any fractional mix → double, never float") {
    assert(SchemaEvolution.widen("c", IntegerType, LongType) == LongType)
    assert(SchemaEvolution.widen("c", ShortType, ByteType) == ShortType)
    assert(SchemaEvolution.widen("c", FloatType, DoubleType) == DoubleType)
    assert(SchemaEvolution.widen("c", LongType, FloatType) == DoubleType)
    assert(SchemaEvolution.widen("c", IntegerType, DoubleType) == DoubleType)
    val v1 = Seq((1, 1.5f)).toDF("id", "v")
    val v2 = Seq((2L, 2.5)).toDF("id", "v")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.schema("id").dataType == LongType)
    assert(out.schema("v").dataType == DoubleType)
    assert(out.collect().map(_.getDouble(1)).toSet == Set(1.5, 2.5))
  }

  test("decimal evolution widens losslessly instead of failing") {
    assert(SchemaEvolution.widen("c", DecimalType(10, 2), DecimalType(12, 2))
      == DecimalType(12, 2))
    assert(SchemaEvolution.widen("c", DecimalType(10, 2), DecimalType(8, 4))
      == DecimalType(12, 4))                        // 8 int digits + 4 scale
    assert(SchemaEvolution.widen("c", DecimalType(10, 2), LongType)
      == DecimalType(22, 2))                        // 20 int digits + 2 scale
    assert(SchemaEvolution.widen("c", IntegerType, DecimalType(6, 2))
      == DecimalType(12, 2))                        // 10 int digits + 2 scale
    assert(SchemaEvolution.widen("c", DecimalType(10, 2), DoubleType)
      == DoubleType)
    val v1 = spark.sql("SELECT CAST(1.25 AS DECIMAL(10,2)) AS amount")
    val v2 = spark.sql("SELECT CAST(9.5 AS DECIMAL(12,2)) AS amount")
    val out = SchemaEvolution.unionEvolved(Seq(v1, v2))
    assert(out.schema("amount").dataType == DecimalType(12, 2))
    assert(out.collect().map(_.getDecimal(0).doubleValue()).toSet
      == Set(1.25, 9.5))
  }

  test("incompatible drift fails loudly with the column name") {
    val v1 = Seq((1L, "s")).toDF("id", "c")
    val v2 = Seq((2L, 3)).toDF("id", "c")
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.unionEvolved(Seq(v1, v2))
    }
    assert(e.getMessage.contains("'c'"), e.getMessage)
  }

  test("single epoch is the identity; a long evolution chain stays one union plan") {
    val v1 = Seq((1L, "a")).toDF("id", "t")
    assert(SchemaEvolution.unionEvolved(Seq(v1)).collect().toSeq
      == v1.collect().toSeq)
    val epochs = (0 until 6).map(i =>
      Seq((i.toLong, i)).toDF("id", s"c$i"))
    val out = SchemaEvolution.unionEvolved(epochs)
    assert(out.columns.toSeq == "id" +: (0 until 6).map(i => s"c$i"))
    assert(out.count() == 6)
    // every non-id cell is null except the epoch's own column
    assert(out.selectExpr(
      "sum(" + (0 until 6).map(i => s"if(c$i is null, 0, 1)").mkString("+") + ") s")
      .head().getLong(0) == 6L)
  }
}
