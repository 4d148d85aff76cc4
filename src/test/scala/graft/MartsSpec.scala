package graft

import org.apache.spark.sql.functions._
import graft.gold.Marts

class MartsSpec extends SparkSpec {
  import spark.implicits._

  test("enrich keeps orphans with null dim columns; enrichCurrent drops them") {
    val fact = Seq((1L, 10), (2L, 99)).toDF("txn_id", "account_id")
    val dim = Seq((10, "alice", true), (11, "bob", false))
      .toDF("account_id", "owner", "is_current")
    val e = Marts.enrich(fact, dim, Seq("account_id")).collect()
    assert(e.length == 2)
    assert(e.find(_.getAs[Long]("txn_id") == 2L).get.isNullAt(2))
    val c = Marts.enrichCurrent(fact, dim, Seq("account_id")).collect()
    assert(c.length == 1 && c.head.getAs[String]("owner") == "alice")
  }

  test("asOfJoin attaches the latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 100, ts("2024-01-01 10:00:00")),
      (2L, 100, ts("2024-01-01 12:00:00")),
      (3L, 100, ts("2024-01-01 08:00:00")),  // before any right row
      (4L, 200, ts("2024-01-01 12:00:00")))  // exactly-simultaneous right row
      .toDF("txn_id", "account_id", "ts")
    val right = Seq(
      (100, ts("2024-01-01 09:00:00"), 1.0),
      (100, ts("2024-01-01 11:00:00"), 2.0),
      (200, ts("2024-01-01 12:00:00"), 9.0))
      .toDF("account_id", "rts", "rate")
    val out = Marts.asOfJoin(left, right, Seq("account_id"), "ts", "rts", Seq("rate"))
      .collect().map(r => r.getAs[Long]("txn_id") ->
        (if (r.isNullAt(r.fieldIndex("rate"))) None else Some(r.getAs[Double]("rate")))).toMap
    assert(out == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> Some(9.0)))
  }

  test("dailySnapshot: last event per day wins, quiet days forward-fill, keys start at first activity") {
    val log = Seq(
      ("u1", 1L, ts("2024-01-01 09:00:00"), 10.0),
      ("u1", 2L, ts("2024-01-01 18:00:00"), 20.0),  // later same day wins
      ("u1", 3L, ts("2024-01-03 12:00:00"), 30.0),  // day 2 quiet → fill 20
      ("u2", 4L, ts("2024-01-02 08:00:00"), 99.0),  // starts day 2
      ("u3", 5L, ts("2024-02-01 08:00:00"), 7.0))   // born after end: no rows
      .toDF("user_id", "event_id", "ts", "value")
    val out = Marts.dailySnapshot(log, Seq("user_id"), "ts",
        Seq("event_id"), Seq("value"), lit(java.sql.Date.valueOf("2024-01-04")))
      .collect()
      .map(r => (r.getAs[String]("user_id"),
        r.getAs[java.sql.Date]("snapshot_date").toString) -> r.getAs[Double]("value"))
      .toMap
    assert(out == Map(
      ("u1", "2024-01-01") -> 20.0, ("u1", "2024-01-02") -> 20.0,
      ("u1", "2024-01-03") -> 30.0, ("u1", "2024-01-04") -> 30.0,
      ("u2", "2024-01-02") -> 99.0, ("u2", "2024-01-03") -> 99.0,
      ("u2", "2024-01-04") -> 99.0))
  }

  test("accumulatingSnapshot: first-ts per milestone, null until reached, negatives preserved") {
    val ev = Seq(
      ("u1", "signup", ts("2024-01-01 00:00:00")),
      ("u1", "view", ts("2024-01-01 00:00:10")),
      ("u1", "view", ts("2024-01-02 00:00:00")),   // later view ignored (first wins)
      ("u1", "purchase", ts("2024-01-01 00:01:10")),
      ("u2", "view", ts("2024-01-01 00:00:05")),   // out of order: view before signup
      ("u2", "signup", ts("2024-01-01 00:00:20"))
    ).toDF("user_id", "event_type", "ts")
    val out = Marts.accumulatingSnapshot(ev, "user_id", "event_type", "ts",
        Seq("signup", "view", "purchase"))
      .collect().map(r => r.getAs[String]("user_id") -> r).toMap
    val u1 = out("u1")
    assert(u1.getAs[Long]("signup_to_view_s") == 10L)
    assert(u1.getAs[Long]("view_to_purchase_s") == 60L)
    val u2 = out("u2")
    assert(u2.getAs[Long]("signup_to_view_s") == -15L)  // out-of-order kept
    assert(u2.isNullAt(u2.fieldIndex("purchase_at")))   // never purchased
    assert(u2.isNullAt(u2.fieldIndex("view_to_purchase_s")))
  }

  test("rfm: boundary-scored quintiles, recency inverted, ties share a class") {
    // 5 users with strictly increasing F and M, and decreasing recency
    val ev = (1 to 5).flatMap { u =>
      (1 to u).map(i => (s"u$u", ts(f"2024-01-${u}%02d 12:00:00"), u * 10.0 + i))
    }.toDF("user_id", "ts", "value")
    val out = Marts.rfm(ev, "user_id", "ts", "value",
        lit(java.sql.Date.valueOf("2024-01-10")))
      .collect().map(r => r.getAs[String]("user_id") ->
        (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))).toMap
    // u5: most recent (r=5), most frequent (f=5), most monetary (m=5)
    assert(out("u5") == ((5, 5, 5)), out)
    assert(out("u1") == ((1, 1, 1)), out)
    // monotone scores along the constructed order
    val fs = (1 to 5).map(u => out(s"u$u")._2)
    assert(fs == fs.sorted, fs)
    // all-tied metric: every key lands in ONE class (no rank tie-break)
    val tied = (1 to 4).map(u => (s"t$u", ts("2024-01-05 12:00:00"), 7.0))
      .toDF("user_id", "ts", "value")
    val tout = Marts.rfm(tied, "user_id", "ts", "value",
        lit(java.sql.Date.valueOf("2024-01-10")))
      .collect().map(r => (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"),
        r.getAs[Int]("m_score"))).toSet
    assert(tout.size == 1, tout)
  }

  test("IncrementalAgg: any fold order equals full recompute; empty delta is a no-op") {
    import graft.gold.IncrementalAgg
    val rows = (1 to 200).map(i => (s"k${i % 7}", i.toDouble / 3))
    val df = rows.toDF("k", "v")
    val m = IncrementalAgg.Measures(Seq("v"))
    val full = IncrementalAgg.partial(df, Seq("k"), m)
    def canon(x: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.readout(x, Seq("k"), m).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getDouble(5))).sortBy(_._1).toSeq
    val Seq(b0, b1, b2) = (0 to 2).map(i =>
      IncrementalAgg.partial(
        df.filter((hash($"v") % 3 + 3) % 3 === i), Seq("k"), m))
    val orderA = IncrementalAgg.merge(
      IncrementalAgg.merge(b0, b1, Seq("k"), m), b2, Seq("k"), m)
    val orderB = IncrementalAgg.merge(
      IncrementalAgg.merge(b2, b1, Seq("k"), m), b0, Seq("k"), m)
    assert(canon(orderA) == canon(full))
    assert(canon(orderB) == canon(full))
    // empty delta: state unchanged; disjoint new key: unioned in
    val empty = IncrementalAgg.partial(df.filter(lit(false)), Seq("k"), m)
    assert(canon(IncrementalAgg.merge(full, empty, Seq("k"), m)) == canon(full))
    val newKey = IncrementalAgg.partial(
      Seq(("brand_new", 5.0)).toDF("k", "v"), Seq("k"), m)
    val merged = canon(IncrementalAgg.merge(full, newKey, Seq("k"), m))
    assert(merged.length == canon(full).length + 1)
    assert(merged.exists(_._1 == "brand_new"))
  }

  test("asOfJoin tie-break picks the greatest right row among equal timestamps") {
    val left = Seq((1L, 100, ts("2024-01-01 12:00:00"))).toDF("txn_id", "account_id", "ts")
    val right = Seq(
      (100, ts("2024-01-01 10:00:00"), 1.0, 7L),
      (100, ts("2024-01-01 10:00:00"), 2.0, 9L),   // same ts: higher seq wins
      (100, ts("2024-01-01 10:00:00"), 3.0, 8L))
      .toDF("account_id", "rts", "rate", "seq")
    val out = Marts.asOfJoin(left, right, Seq("account_id"), "ts", "rts",
      Seq("rate", "seq"), rightTieBreak = Seq("seq")).head()
    assert(out.getAs[Double]("rate") == 2.0)
    assert(out.getAs[Long]("seq") == 9L)
  }

  test("assignSurrogates: existing keys keep theirs, new keys dense from max+1") {
    val existing = Seq(("a", 3L), ("c", 1L), ("d", 7L)).toDF("bk", "sk")
    val incoming = Seq("a", "b", "e", "b", "c").toDF("bk")
    val out = Marts.assignSurrogates(existing, incoming, "bk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "c" -> 1L, "d" -> 7L,
      "b" -> 8L, "e" -> 9L), out)
    // replay-stability: the same (existing, incoming) assigns identically
    val again = Marts.assignSurrogates(existing, incoming, "bk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == out)
    // empty dimension bootstrap: keys start at 1
    val boot = Marts.assignSurrogates(
        existing.filter(lit(false)), incoming, "bk")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(boot == Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "e" -> 4L), boot)
  }
}
