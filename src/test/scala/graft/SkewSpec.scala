package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join, including left-preserved orphans") {
    // 1000 rows of one hot key + a tail
    val skewed = ((1 to 1000).map(i => (1, i.toDouble)) ++
      Seq((2, 5.0), (3, 7.0), (99, 1.0))).toDF("k", "v")
    val small = Seq((1, "hot"), (2, "a"), (3, "b")).toDF("k", "name")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getDouble(1),
        Option(r.getAs[String]("name")))).sortBy(x => (x._1, x._2)).toSeq

    val plainInner = skewed.join(small, Seq("k"), "inner")
    assert(canon(Skew.saltedJoin(skewed, small, Seq("k"), 8)) == canon(plainInner))
    val plainLeft = skewed.join(small, Seq("k"), "left")
    assert(canon(Skew.saltedJoin(skewed, small, Seq("k"), 8, "left")) == canon(plainLeft))
  }

  test("saltedAggregate equals the direct aggregation") {
    val df = ((1 to 500).map(i => (1, i.toDouble)) ++
      (1 to 10).map(i => (2, i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k").agg(sum($"v").as("total"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toSeq
    val salted = Skew.saltedAggregate(df, Seq("k"), Map("total" -> $"v"), 8)
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Double]("total"),
        r.getAs[Long]("n_rows"))).sortBy(_._1).toSeq
    assert(salted == direct)
  }
}
