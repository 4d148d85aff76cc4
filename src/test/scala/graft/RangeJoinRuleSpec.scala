package graft

import org.apache.spark.sql.functions._

/** The band-join → bucketed equi-join optimizer rule: flag-off keeps the
  * nested-loop plan, flag-on removes it with bit-identical results, and
  * the scope guards (equi-keyed joins, non-numeric bands) hold.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = spark.range(2000L)
    .select(col("id").as("pid"), (col("id") % 977L).cast("double").as("p"))
  private def intervals = spark.range(300L)
    .select(col("id").as("iid"),
      ((col("id") * 13L) % 900L).cast("double").as("lo"))
    .withColumn("hi", col("lo") + (col("iid") % 40L).cast("double"))

  private def bandJoin = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"))

  test("flag off: nested loop; flag on: hash equi-join, identical rows") {
    graft.functions.GraftExtensions.register(spark)
    spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
    val before = bandJoin
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val exact = before.collect().map(r =>
      (r.getLong(0), r.getLong(2))).toSet
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val after = bandJoin
      val p = after.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"), p.take(800))
      assert(p.contains("__graft_bucket"), p.take(800))
      val accel = after.collect().map(r =>
        (r.getLong(0), r.getLong(2))).toSet
      assert(accel == exact,
        s"missing=${(exact -- accel).take(5)} extra=${(accel -- exact).take(5)}")
      // schema unchanged: the bucket plumbing never leaks into the output
      assert(after.columns.toSeq == before.columns.toSeq)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("interval side on the LEFT rewrites too; strict bounds respected") {
    graft.functions.GraftExtensions.register(spark)
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val flipped = intervals.join(points,
        col("p") > col("lo") && col("p") < col("hi"))
      val p = flipped.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
      spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
      val exact = flipped.collect()
        .map(r => (r.getAs[Long]("iid"), r.getAs[Long]("pid"))).toSet
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val accel = flipped.collect()
        .map(r => (r.getAs[Long]("iid"), r.getAs[Long]("pid"))).toSet
      assert(accel == exact)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("malformed bucket-width config disables the rule instead of breaking the session") {
    graft.functions.GraftExtensions.register(spark)
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "20s")
      // every query must still optimize and run; the band join just stays BNLJ
      assert(bandJoin.count() > 0)
      assert(bandJoin.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      // unrelated queries are untouched too
      assert(points.groupBy().count().head().getLong(0) == 2000L)
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("inverted bands (lo > hi) match nothing and never generate descending bucket ranges") {
    graft.functions.GraftExtensions.register(spark)
    // the whole interval side is inverted: an unguarded sequence(loB, hiB)
    // would default to step -1 and explode a huge DESCENDING range per row
    val inverted = spark.range(50L).select(col("id").as("iid"),
      (lit(1.0e7) + col("id").cast("double")).as("lo"),
      (col("id") % 40L).cast("double").as("hi"))
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val j = points.join(inverted,
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(j.queryExecution.executedPlan.toString.contains("__graft_bucket"))
      assert(j.count() == 0L) // BETWEEN semantics: empty interval matches nothing
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }

  test("an interval spanning more than the cap fails fast with a resize hint") {
    graft.functions.GraftExtensions.register(spark)
    val wide = Seq((1L, 0.0, 1.0e9)).toDF("iid", "lo", "hi")
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      spark.conf.set("spark.graft.rangeJoin.maxBucketsPerInterval", "1024")
      val j = points.join(wide,
        col("p") >= col("lo") && col("p") <= col("hi"))
      assert(j.queryExecution.executedPlan.toString.contains("__graft_bucket"))
      val e = intercept[Exception](j.count())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m =>
        m != null && m.contains("range-join rewrite")), e.toString)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
      spark.conf.unset("spark.graft.rangeJoin.maxBucketsPerInterval")
    }
  }

  test("property: random widths and interval shapes stay bit-identical to the nested loop") {
    graft.functions.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 4) {
      val span = rnd.nextInt(60) + 1
      val w = Seq(7.0, 32.0, 101.0, 13.0)(trial - 1)
      val pts = spark.range(800L).select(col("id").as("pid"),
        ((col("id") * (trial + 2)) % 701L).cast("double").as("p"))
      val ivs = spark.range(120L).select(col("id").as("iid"),
          ((col("id") * 29L + trial) % 680L).cast("double").as("lo"))
        .withColumn("hi", col("lo") + (col("iid") % span).cast("double")
          - lit(if (trial == 3) 5.0 else 0.0)) // trial 3 mixes inverted bands in
      def j = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      val exact = j.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      try {
        spark.conf.set("spark.graft.rangeJoin.bucketWidth", w.toString)
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("__graft_bucket"), s"trial $trial: rule didn't fire")
        val accel = j.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        assert(accel == exact,
          s"trial $trial w=$w span<$span: missing=${(exact -- accel).take(3)} " +
            s"extra=${(accel -- exact).take(3)}")
      } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
    }
  }

  test("equi-keyed band joins are left alone — the planner already has a hash key") {
    graft.functions.GraftExtensions.register(spark)
    try {
      spark.conf.set("spark.graft.rangeJoin.bucketWidth", "32")
      val keyed = points.withColumn("k", col("pid") % 7)
        .join(intervals.withColumn("k", col("iid") % 7), Seq("k"))
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      val p = keyed.queryExecution.executedPlan.toString
      assert(!p.contains("__graft_bucket"), p.take(800))
    } finally spark.conf.unset("spark.graft.rangeJoin.bucketWidth")
  }
}
