package graft

import org.apache.spark.sql.functions._
import graft.silver.Reconcile

/** Merkle-style reconciliation: identical tables produce an empty diff
  * from the digest compare alone, planted divergences come back exactly
  * labeled, and the digest-pruned diff equals the unpruned diff.
  */
class ReconcileSpec extends SparkSpec {
  import spark.implicits._

  private def base() = spark.range(1000L)
    .select(col("id"),
      pmod(col("id"), lit(7)).as("grp"),
      (col("id") * 3 % 101).cast("double").as("amt"))

  test("identical tables: zero dirty buckets, empty diff") {
    assert(Reconcile.dirtyBuckets(base(), base(), Seq("id"), 64).isEmpty)
    assert(Reconcile.diff(base(), base(), Seq("id"), 64).isEmpty)
  }

  test("planted divergences are labeled exactly") {
    val a = base()
    val b = base().filter(col("id") =!= 7L)                    // drop one
      .withColumn("amt",
        when(col("id") === 13L, col("amt") + 1.0).otherwise(col("amt")))
      .unionByName(Seq((5000L, 0L, 9.0)).toDF("id", "grp", "amt")) // add one
    val out = Reconcile.diff(a, b, Seq("id"), 64)
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(out == Set((7L, "only_in_a"), (5000L, "only_in_b"),
      (13L, "differs_in_a"), (13L, "differs_in_b")), s"got $out")
  }

  test("digest pruning changes nothing: nBuckets=1 (no pruning) == nBuckets=512") {
    val a = base()
    val b = base().withColumn("amt",
      when(pmod(col("id"), lit(97)) === 0, col("amt") * 2).otherwise(col("amt")))
    val full = Reconcile.diff(a, b, Seq("id"), 1)
    val pruned = Reconcile.diff(a, b, Seq("id"), 512)
    assert(full.exceptAll(pruned).isEmpty && pruned.exceptAll(full).isEmpty)
    // and the dirty set really is small: <= one bucket per changed row
    val dirty = Reconcile.dirtyBuckets(a, b, Seq("id"), 512).count()
    assert(dirty <= 11 && dirty > 0, s"dirty buckets: $dirty")
  }

  test("null keys and null payloads reconcile null-safe") {
    val a = Seq((Some(1L), Some("x")), (None, Some("y")))
      .toDF("id", "tag")
    val b = Seq((Some(1L), Option.empty[String]), (None, Some("y")))
      .toDF("id", "tag")
    val out = Reconcile.diff(a, b, Seq("id"), 8)
      .collect().map(r => (Option(r.get(0)), r.getString(2))).toSet
    // null-keyed rows match null-safe and are equal → silent; id 1 differs
    assert(out == Set((Some(1L), "differs_in_a"), (Some(1L), "differs_in_b")),
      s"got $out")
  }

  test("columnStats: per-column counts; clean buckets counted arithmetically") {
    val a = base()
    val b = base().filter(col("id") =!= 7L)                    // 7 only in a
      .withColumn("amt",
        when(col("id") === 13L, col("amt") + 1.0).otherwise(col("amt")))
      .withColumn("grp",
        when(col("id").isin(20L, 21L), col("grp") + 1L).otherwise(col("grp")))
      .unionByName(Seq((5000L, 0L, 9.0)).toDF("id", "grp", "amt"))
    val out = Reconcile.columnStats(a, b, Seq("id"), nBuckets = 64)
      .collect().map(r => r.getAs[String]("column_name") ->
        ((r.getAs[Long]("n_common"), r.getAs[Long]("n_match"),
          r.getAs[Long]("n_differs"),
          r.getAs[Long]("n_only_a"), r.getAs[Long]("n_only_b")))).toMap
    assert(out("amt") == ((999L, 998L, 1L, 1L, 1L)), s"got $out")
    assert(out("grp") == ((999L, 997L, 2L, 1L, 1L)), s"got $out")
    // pruning invariance: nBuckets=1 (nothing pruned) == nBuckets=64
    val full = Reconcile.columnStats(a, b, Seq("id"), nBuckets = 1)
    assert(full.exceptAll(Reconcile.columnStats(a, b, Seq("id"), 64)).isEmpty)
  }

  test("columnStats: fully disjoint key sets read NULL match_rate, not 1.0") {
    val a = base()
    val b = base().withColumn("id", col("id") + 100000L)
    val stats = Reconcile.columnStats(a, b, Seq("id"), 64).collect()
    assert(stats.forall(r => r.getAs[Long]("n_common") == 0L
      && r.isNullAt(r.fieldIndex("match_rate"))), stats.mkString("; "))
  }

  test("columnStats: identical tables are a full match from digests alone") {
    val stats = Reconcile.columnStats(base(), base(), Seq("id"), 64).collect()
    assert(stats.length == 2)
    assert(stats.forall(r => r.getAs[Long]("n_common") == 1000L
      && r.getAs[Long]("n_differs") == 0L
      && r.getAs[Double]("match_rate") == 1.0), stats.mkString("; "))
  }

  test("-0.0 vs 0.0 replicas digest equal: zero dirty buckets, empty diff") {
    import spark.implicits._
    // the two sides compare EQUAL under <=> (Spark normalizes signed
    // zero in comparisons) — the digest must agree too, or every run
    // re-joins these buckets forever
    val a = Seq((1L, 0.0), (2L, -0.0), (3L, Double.NaN)).toDF("id", "v")
    val b = Seq((1L, -0.0), (2L, 0.0), (3L, Double.NaN)).toDF("id", "v")
    assert(Reconcile.dirtyBuckets(a, b, Seq("id"), 64).count() == 0L)
    assert(Reconcile.diff(a, b, Seq("id"), 64).isEmpty)
  }
}
