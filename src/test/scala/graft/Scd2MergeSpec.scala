package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.gold.Scd2Merge

/** SCD2 check-strategy merge semantics (FIXTURES.md §A.4): the dbt-snapshot
  * behavior of customers_snapshot.sql / accounts_snapshot.sql, including
  * the readme's edge cases (readme.md:271-272).
  */
class Scd2MergeSpec extends SparkSpec {
  import spark.implicits._

  private def batch(rows: (Int, String, Double)*): DataFrame =
    rows.toSeq.toDF("account_id", "account_type", "balance")

  private val key = Seq("account_id")
  private val checkCols = Seq("account_type", "balance")

  test("epoch 1: all keys inserted as current") {
    val s1 = Scd2Merge(Scd2Merge.emptySnapshot(batch()), batch(
      (1, "SAVINGS", 100.0), (2, "CHECKING", 50.0)), key, checkCols, ts("2024-01-01 00:00:00"))
    assert(s1.count() == 2)
    assert(s1.filter($"effective_to".isNull).count() == 2)
    assert(s1.filter($"effective_from" === ts("2024-01-01 00:00:00")).count() == 2)
  }

  test("epoch 2: changed check-col closes old version and opens new") {
    val t1 = ts("2024-01-01 00:00:00"); val t2 = ts("2024-01-02 00:00:00")
    val s1 = Scd2Merge(Scd2Merge.emptySnapshot(batch()), batch(
      (1, "SAVINGS", 100.0), (2, "CHECKING", 50.0)), key, checkCols, t1)
    val s2 = Scd2Merge(s1, batch((1, "SAVINGS", 999.0), (2, "CHECKING", 50.0)), key, checkCols, t2)
    assert(s2.count() == 3)
    val k1 = s2.filter($"account_id" === 1).collect()
    assert(k1.length == 2)
    val closed = k1.find(_.getAs[java.sql.Timestamp]("effective_to") != null).get
    assert(closed.getAs[Double]("balance") == 100.0)
    assert(closed.getAs[java.sql.Timestamp]("effective_to") == t2)
    val current = k1.find(_.getAs[java.sql.Timestamp]("effective_to") == null).get
    assert(current.getAs[Double]("balance") == 999.0)
    assert(current.getAs[java.sql.Timestamp]("effective_from") == t2)
    // unchanged key 2 kept as-is, one current row
    assert(s2.filter($"account_id" === 2).count() == 1)
  }

  test("keys absent from the batch are untouched; new keys insert") {
    val t1 = ts("2024-01-01 00:00:00"); val t2 = ts("2024-01-02 00:00:00")
    val s1 = Scd2Merge(Scd2Merge.emptySnapshot(batch()), batch((1, "SAVINGS", 100.0)), key, checkCols, t1)
    val s2 = Scd2Merge(s1, batch((3, "CHECKING", 7.0)), key, checkCols, t2)
    assert(s2.count() == 2)
    assert(s2.filter($"account_id" === 1 && $"effective_to".isNull &&
      $"effective_from" === t1).count() == 1)
    assert(s2.filter($"account_id" === 3 && $"effective_to".isNull).count() == 1)
  }

  test("null-safe compare: null -> value and value -> null both version") {
    val t1 = ts("2024-01-01 00:00:00"); val t2 = ts("2024-01-02 00:00:00")
    val b1 = Seq((1, null.asInstanceOf[String], 1.0), (2, "X", 2.0))
      .toDF("account_id", "account_type", "balance")
    val b2 = Seq((1, "Y", 1.0), (2, null.asInstanceOf[String], 2.0))
      .toDF("account_id", "account_type", "balance")
    val s2 = Scd2Merge(
      Scd2Merge(Scd2Merge.emptySnapshot(b1), b1, key, checkCols, t1),
      b2, key, checkCols, t2)
    assert(s2.count() == 4)
    assert(s2.filter($"effective_to".isNull).count() == 2)
  }

  test("idempotence: re-applying the same batch creates no new versions") {
    val t1 = ts("2024-01-01 00:00:00"); val t2 = ts("2024-01-02 00:00:00")
    val b = batch((1, "SAVINGS", 100.0), (2, "CHECKING", 50.0))
    val s1 = Scd2Merge(Scd2Merge.emptySnapshot(b), b, key, checkCols, t1)
    val s2 = Scd2Merge(s1, b, key, checkCols, t2)
    assert(s2.count() == s1.count())
    assert(s2.filter($"effective_to".isNotNull).count() == 0)
  }

  test("invariants over random epochs: one current row per key, intervals nested in order") {
    val rnd = new scala.util.Random(42)
    var snap = Scd2Merge.emptySnapshot(batch())
    for (epoch <- 1 to 5) {
      val rows = (1 to 10).filter(_ => rnd.nextBoolean()).map { id =>
        (id, if (rnd.nextBoolean()) "SAVINGS" else "CHECKING", rnd.nextInt(3) * 100.0)
      }
      if (rows.nonEmpty)
        snap = Scd2Merge(snap, batch(rows: _*), key, checkCols,
          ts(f"2024-01-$epoch%02d 00:00:00"))
    }
    val rows = snap.collect()
    val byKey = rows.groupBy(_.getAs[Int]("account_id"))
    byKey.foreach { case (_, vs) =>
      assert(vs.count(_.getAs[java.sql.Timestamp]("effective_to") == null) == 1)
      val sorted = vs.sortBy(_.getAs[java.sql.Timestamp]("effective_from").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("effective_to") ==
            b.getAs[java.sql.Timestamp]("effective_from"),
            "intervals must be contiguous")
        case _ =>
      }
    }
    // dim projection flags exactly the open rows
    val dim = Scd2Merge.toDim(snap)
    assert(dim.filter($"is_current").count() == byKey.size)
  }

  test("fromChangeLog rebuild matches per-epoch merging on distinct-change logs") {
    val log = Seq(
      (1, ts("2024-01-01 00:00:00"), 10.0),
      (1, ts("2024-01-02 00:00:00"), 20.0),
      (2, ts("2024-01-01 12:00:00"), 5.0))
      .toDF("account_id", "ts", "balance")
    val hist = Scd2Merge.fromChangeLog(log, Seq("account_id"), "ts")
    assert(hist.count() == 3)
    assert(hist.filter($"is_current").count() == 2)
    val v1 = hist.filter($"account_id" === 1 && $"version_n" === 1).head()
    assert(v1.getAs[java.sql.Timestamp]("effective_to") == ts("2024-01-02 00:00:00"))
  }
}
