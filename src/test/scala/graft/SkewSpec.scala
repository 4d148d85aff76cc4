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

  test("skewReport: hand-computed shares, uniform key reads 1x, hot key surfaces first") {
    // 80 rows of key "hot", 10 each of "a" and "b": total 100, 3 distinct
    val df = (Seq.fill(80)("hot") ++ Seq.fill(10)("a") ++ Seq.fill(10)("b"))
      .toDF("k")
    val out = Skew.skewReport(df, "k", topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.head == (("hot", 80L, 0.8, 2.4)), out.head)   // 0.8 share, 2.4x uniform
    assert(out.length == 2)
    assert(out(1)._2 == 10L && out(1)._1 == "a")             // tie broken by key asc
    // perfectly uniform key: every skew_x is exactly 1.0
    val uni = (1 to 4).flatMap(k => Seq.fill(25)(s"k$k")).toDF("k")
    assert(Skew.skewReport(uni, "k").collect().forall(_.getDouble(3) == 1.0))
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
