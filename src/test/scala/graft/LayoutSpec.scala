package graft

import org.apache.spark.sql.functions._
import graft.bronze.Layout
import graft.functions.GraftExtensions
import graft.gold.UpsertByKey

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("clustered write partitions by date and prunes on partition filters") {
    val path = tmpDir("clustered") + "/fact"
    val df = Seq(
      ("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0),
      ("2024-01-02", 1, 30.0), ("2024-01-03", 3, 40.0))
      .toDF("dt", "account_id", "amount")
    Layout.writeClustered(df, path, "dt", Seq("account_id"))
    val back = spark.read.parquet(path)
    assert(back.count() == 4)
    val pruned = back.filter($"dt" === "2024-01-02")
    assert(pruned.count() == 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(dt"), scan)
  }

  test("same-bucketed tables join without a shuffle on either side") {
    val facts = (1 to 1000).map(i => (i.toLong % 50, i.toDouble)).toDF("k", "v")
    val dims = (0L until 50L).map(i => (i, s"name_$i")).toDF("k", "name")
    Layout.writeBucketed(facts, "bkt_facts", 8, Seq("k"))
    Layout.writeBucketed(dims, "bkt_dims", 8, Seq("k"))
    // force a non-broadcast join so the assertion actually proves bucket
    // co-location rather than broadcast avoidance
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.readBucketed(spark, "bkt_facts")
        .join(Layout.readBucketed(spark, "bkt_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("CDC-aware upsert applies tombstones for keys whose latest op is delete") {
    val existing = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "ver")
    val incoming = Seq(
      (1L, "a2", 2, "u"),
      (2L, null.asInstanceOf[String], 2, "d"),          // delete key 2
      (3L, "c2", 2, "d"), (3L, "c3", 3, "u"),           // deleted then re-upserted
      (4L, "new", 1, "c"))
      .toDF("id", "v", "ver", "op")
    val out = UpsertByKey.applyCdc(
      existing.withColumn("op", lit("c")), incoming, Seq("id"), Seq($"ver".desc))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(out == Map(1L -> "a2", 3L -> "c3", 4L -> "new"))
  }

  test("SQL registration exposes native functions to spark.sql") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)),
                               array(cast(1.0 as float), cast(0.0 as float))) AS c,
             norm_text('  A   B  ') AS n,
             size(word_shingles('a b c d', 3)) AS s,
             simhash64(array('x','y')) AS h""").head()
    assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    assert(r.getAs[String]("n") == "a b")
    assert(r.getAs[Int]("s") == 2)
    assert(r.schema("h").dataType.typeName == "long")
  }

  test("compactionPlan bins files first-fit in order, per partition") {
    val files = Seq(
      // partition p1: sizes 60,60,60 at target 100 → bins 0,0,1
      ("p1", 1L, 60L), ("p1", 2L, 60L), ("p1", 3L, 60L),
      // partition p2: an oversize file occupies its own span and pushes
      // the next file into the following bin
      ("p2", 1L, 250L), ("p2", 2L, 10L), ("p2", 3L, 10L),
      // partition p3 independent of the others
      ("p3", 1L, 10L))
      .toDF("part", "file_id", "bytes")
    val out = Layout.compactionPlan(files, Seq("part"), "file_id", "bytes",
        targetBytes = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(out == Set(
      ("p1", 1L, 0L), ("p1", 2L, 0L), ("p1", 3L, 1L),
      ("p2", 1L, 0L), ("p2", 2L, 2L), ("p2", 3L, 2L),
      ("p3", 1L, 0L)), out)
  }

  test("compactionPlan bin totals stay within the first-fit bounds") {
    // sizes 7..19, target 64: every non-last bin totals > 64 − 19 = 45
    // (the first-fit lower bound) and spans < 64 + 19 of prefix space
    val files = (1L to 97L).map(i => ("p", i, 7L + (i % 13)))
      .toDF("part", "file_id", "bytes")
    val bins = Layout.compactionPlan(files, Seq("part"), "file_id", "bytes",
        targetBytes = 64L)
      .groupBy("part", "bin").agg(sum("bytes").as("sz"))
      .orderBy(col("bin")).collect()
    val lastBin = bins.map(_.getLong(1)).max
    bins.foreach { r =>
      if (r.getLong(1) != lastBin)
        assert(r.getLong(2) > 64L - 19L, s"bin ${r.getLong(1)} under bound")
      assert(r.getLong(2) < 64L + 19L, s"bin ${r.getLong(1)} over bound")
    }
  }
}
