package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.silver.Quality

/** Distribution-drift operators (KS, PSI), n-gram novelty, and the
  * plan-walk lineage extractor.
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("ksDrift: hand-computed ECDF gap, zero for identical sides, null for one-sided") {
    val rows =
      Seq(1, 2, 3, 4).map(v => ("g", v.toDouble, false)) ++
      Seq(3, 4, 5, 6).map(v => ("g", v.toDouble, true)) ++
      // identical distributions on both sides
      Seq(1, 2).flatMap(v => Seq(("same", v.toDouble, false), ("same", v.toDouble, true))) ++
      // right side absent entirely
      Seq(("onesided", 9.0, false))
    val df = rows.toDF("g", "v", "r")
    val out = Quality.ksDrift(df, "v", "g", col("r")).collect()
      .map(x => x.getAs[String]("g") ->
        Option(x.getAs[java.lang.Double]("ks"))).toMap
    // ECDF gaps at v=1..6: .25, .5, .5, .5, .25, 0 → sup = 0.5
    assert(out("g").contains(0.5), out.toString)
    assert(out("same").contains(0.0))
    assert(out("onesided").isEmpty, "one-sided group must yield null, not /0")
  }

  test("psiDrift: zero for identical sides and degenerate ranges, positive under shift") {
    val rows =
      (1 to 50).flatMap(i => Seq(("same", (i % 10).toDouble, false),
        ("same", (i % 10).toDouble, true))) ++
      // all left mass low, all right mass high
      (1 to 50).map(i => ("shift", (i % 5).toDouble, false)) ++
      (1 to 50).map(i => ("shift", (i % 5 + 20).toDouble, true)) ++
      // degenerate: a constant column cannot drift
      Seq(("const", 7.0, false), ("const", 7.0, true))
    val df = rows.toDF("g", "v", "r")
    val out = Quality.psiDrift(df, "v", "g", col("r")).collect()
      .map(x => x.getAs[String]("g") -> x.getAs[Double]("psi")).toMap
    assert(out("same") == 0.0, out.toString)
    assert(out("const") == 0.0)
    assert(out("shift") > 1.0, s"disjoint supports should score high: $out")
  }

  test("ngramNovelty: unseen shingle fraction against the reference slice") {
    val docs = Seq(
      ("r1", "a b c d", true),
      ("c1", "a b c d", false),     // fully covered → 0
      ("c2", "x y z w", false),     // fully novel → 1
      ("c3", "a b c x y", false),   // "a b c" seen; "b c x","c x y" novel
      ("c4", "a b", false)          // too short for k=3 → absent
    ).toDF("doc_id", "text", "ref")
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", col("ref"), k = 3)
      .collect().map(r => r.getAs[String]("id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
          r.getAs[Double]("novelty"))).toMap
    assert(out.keySet == Set("c1", "c2", "c3"))
    assert(out("c1") == ((2L, 0L, 0.0)))
    assert(out("c2") == ((2L, 2L, 1.0)))
    assert(out("c3") == ((3L, 2L, 0.666667)))
  }

  test("madAnomalies: robust to the outlier that inflates a z-score, MAD=0 flags any deviation") {
    val rows =
      // median 5, MAD 2 → fence 6: only the 995-dev outlier flags
      ((1 to 9).map(v => ("spread", v.toLong)) :+ (("spread", 1000L))) ++
      // constant group with one deviator: MAD 0 → any deviation flags
      (Seq(10L, 10L, 10L, 10L, 100L).map(v => ("const", v)))
    val df = rows.toDF("g", "cents")
    val out = Quality.madAnomalies(df, "cents", "g", k = 3)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("cents"),
        r.getAs[Long]("med"), r.getAs[Long]("mad"))).toSet
    assert(out == Set(("spread", 1000L, 5L, 2L), ("const", 100L, 10L, 0L)), out)
  }

  test("linearAttribution: in-window clicks share credit equally, stale and touchless excluded") {
    val ev = Seq(
      ("u1", "2024-01-10 10:00:00", 1L, "click"),
      ("u1", "2024-01-10 11:00:00", 2L, "click"),
      ("u1", "2024-01-01 00:00:00", 3L, "click"),   // outside the 1-day window
      ("u1", "2024-01-10 12:00:00", 4L, "purchase"),
      ("u2", "2024-01-10 12:00:00", 5L, "purchase") // no clicks at all
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.linearAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "click", "purchase", windowSec = 24 * 3600)
      .collect().map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("touch_id"),
        r.getAs[Long]("n_touches"), r.getAs[Double]("credit"))).toSet
    assert(out == Set((4L, 1L, 2L, 0.5), (4L, 2L, 2L, 0.5)), out)
  }

  test("positionAttribution: 40/20/40 U-shape with exact degenerate journeys") {
    val ev = Seq(
      // u1: 4 clicks -> 0.4 / 0.1 / 0.1 / 0.4
      ("u1", "2024-01-10 08:00:00", 1L, "click"),
      ("u1", "2024-01-10 09:00:00", 2L, "click"),
      ("u1", "2024-01-10 10:00:00", 3L, "click"),
      ("u1", "2024-01-10 11:00:00", 4L, "click"),
      ("u1", "2024-01-10 12:00:00", 5L, "purchase"),
      // u2: 1 click -> 1.0
      ("u2", "2024-01-10 11:00:00", 6L, "click"),
      ("u2", "2024-01-10 12:00:00", 7L, "purchase"),
      // u3: 2 clicks -> 0.5 / 0.5
      ("u3", "2024-01-10 10:00:00", 8L, "click"),
      ("u3", "2024-01-10 11:00:00", 9L, "click"),
      ("u3", "2024-01-10 12:00:00", 10L, "purchase")
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.positionAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "click", "purchase",
        windowSec = 24 * 3600, endPct = 40)
      .collect().map(r => (r.getAs[Long]("touch_id"), r.getAs[Long]("pos"),
        r.getAs[Double]("credit"))).toSet
    assert(out == Set(
      (1L, 1L, 0.4), (2L, 2L, 0.1), (3L, 3L, 0.1), (4L, 4L, 0.4),
      (6L, 1L, 1.0),
      (8L, 1L, 0.5), (9L, 2L, 0.5)), out)
    // per-conversion credit mass is always 1.0 (rounded)
    val mass = graft.gold.Marts.positionAttribution(ev, "user_id", "ts",
        "event_id", "event_type", "click", "purchase", 24 * 3600)
      .groupBy("conv_id").agg(round(sum(col("credit")), 4).as("m"))
      .collect().map(_.getAs[Double]("m"))
    assert(mass.forall(_ == 1.0), mass.mkString(","))
  }

  test("ewmaDaily: dyadic weights, gap days excluded by normalization") {
    val ev = (Seq.fill(8)("2024-01-01") ++ Seq.fill(4)("2024-01-02") ++
      Seq.fill(2)("2024-01-04"))                       // day 3 missing
      .map(dd => ("s", s"$dd 10:00:00"))
      .toDF("event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = Quality.ewmaDaily(ev, "event_type", "ts",
        lookback = 10, halfLifeDays = 1)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Double]("ewma")).toMap
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out("2024-01-01") == 8.0, out)              // only itself
    assert(out("2024-01-02") == r6((4.0 + 0.5 * 8) / 1.5), out)
    // day 4: ages 0,2,3 present → (2 + 4/4 + 8/8) / (1 + 1/4 + 1/8)
    assert(out("2024-01-04") == math.floor((2 + 1.0 + 1.0) / 1.375 * 1e6 + 0.5) / 1e6,
      out)
  }

  test("dateSpine + gapFillDaily: ISO weekday arithmetic, zero-filled gaps") {
    val spine = graft.gold.Marts.dateSpine(spark, "2024-01-01", "2024-01-14")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Int]("iso_dow"), r.getAs[java.sql.Date]("week_start").toString,
          r.getAs[Boolean]("is_weekend"), r.getAs[Boolean]("is_month_end"))))
      .toMap
    assert(spine.size == 14)
    assert(spine("2024-01-01") == ((1, "2024-01-01", false, false))) // Monday
    assert(spine("2024-01-06") == ((6, "2024-01-01", true, false)))  // Saturday
    assert(spine("2024-01-07") == ((7, "2024-01-01", true, false)))  // Sunday
    assert(spine("2024-01-08") == ((1, "2024-01-08", false, false))) // next Monday
    val jan31 = graft.gold.Marts.dateSpine(spark, "2024-01-31", "2024-01-31")
      .collect()(0)
    assert(jan31.getAs[Boolean]("is_month_end"))
    val ev = Seq(("2024-01-02 10:00:00"), ("2024-01-02 11:00:00"))
      .toDF("ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val filled = graft.gold.Marts.gapFillDaily(spark, ev, "ts",
        "2024-01-01", "2024-01-03")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("n_rows")).toMap
    assert(filled == Map("2024-01-01" -> 0L, "2024-01-02" -> 2L,
      "2024-01-03" -> 0L), filled)
  }

  test("locfDaily: carries last observation forward, null before first, per-day last wins") {
    val ev = Seq(
      ("u1", "2024-01-02 10:00:00", 1L, 5.0),
      ("u1", "2024-01-02 11:00:00", 2L, 7.0),   // later same day wins
      ("u1", "2024-01-04 09:00:00", 3L, 9.0),
      ("u2", "2024-01-03 09:00:00", 4L, 1.0))
      .toDF("u", "ts_s", "eid", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.locfDaily(spark, ev, "u", "ts", "eid", "v",
        "2024-01-01", "2024-01-05")
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString) ->
        ((r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out.size == 10)                        // 2 keys × 5 days
    assert(out(("u1", "2024-01-01")) == ((false, None)), out)
    assert(out(("u1", "2024-01-02")) == ((true, Some(7.0))), out)
    assert(out(("u1", "2024-01-03")) == ((false, Some(7.0))), out)
    assert(out(("u1", "2024-01-04")) == ((true, Some(9.0))), out)
    assert(out(("u1", "2024-01-05")) == ((false, Some(9.0))), out)
    assert(out(("u2", "2024-01-02")) == ((false, None)), out)
    assert(out(("u2", "2024-01-05")) == ((false, Some(1.0))), out)
  }

  test("nearestJoin: picks the closer side, ties prefer earlier, matchless lefts survive") {
    val left = Seq(("u", 10L, "2024-01-10 12:00:00"),
      ("u", 11L, "2024-01-20 12:00:00"),        // nothing within ±1h
      ("v", 12L, "2024-01-10 06:00:00"))
      .toDF("k", "lid", "ts_s")
      .withColumn("lts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq(("u", 1L, "2024-01-10 11:10:00"),   // 50 min before
      ("u", 2L, "2024-01-10 12:30:00"),                 // 30 min after -> wins
      ("u", 3L, "2024-01-10 11:30:00"),                 // 30 min before -> tie, earlier
      ("v", 4L, "2024-01-10 06:00:00"))                 // exact
      .toDF("k", "rid", "ts_s")
      .withColumn("rts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.nearestJoin(left, right, "k",
        "lts", "lid", "rts", "rid", tolSec = 3600L)
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(2)), Option(r.get(3))))).toMap
    // 30-min tie between rid 2 (after) and rid 3 (before): earlier wins
    assert(out(10L) == ((Some(3L), Some(-1800000000L))), out)
    assert(out(11L) == ((None, None)), out)              // matchless kept
    assert(out(12L) == ((Some(4L), Some(0L))), out)      // exact, same key only
  }

  test("locfDaily: pre-spine observations carry IN as the opening balance, unobserved") {
    val ev = Seq(
      ("u1", "2023-12-28 10:00:00", 1L, 42.0),     // before the spine
      ("u1", "2024-01-03 10:00:00", 2L, 50.0))
      .toDF("u", "ts_s", "eid", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.locfDaily(spark, ev, "u", "ts", "eid", "v",
        "2024-01-01", "2024-01-04")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getBoolean(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    // the December balance opens the window on day 1 — carried, not observed
    assert(out("2024-01-01") == ((false, Some(42.0))), out)
    assert(out("2024-01-02") == ((false, Some(42.0))), out)
    assert(out("2024-01-03") == ((true, Some(50.0))), out)
    assert(out("2024-01-04") == ((false, Some(50.0))), out)
  }

  test("locfDaily: null-ts events are ignored, never become the carried baseline") {
    // u1's ONLY event has a null ts: clamped to the spine start it would
    // junk-fill the whole series; it must read as "no observation yet"
    val ev = Seq(("u1", null.asInstanceOf[String], 1L, 99.0),
      ("u2", "2024-01-02 10:00:00", 2L, 5.0),
      ("u2", null.asInstanceOf[String], 3L, 77.0))
      .toDF("u", "ts_s", "eid", "v")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.locfDaily(spark, ev, "u", "ts", "eid", "v",
        "2024-01-01", "2024-01-03")
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString) ->
        ((r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out.size == 6, out)
    assert(out(("u1", "2024-01-01")) == ((false, None)), out)
    assert(out(("u1", "2024-01-03")) == ((false, None)), out)
    assert(out(("u2", "2024-01-01")) == ((false, None)), out)
    assert(out(("u2", "2024-01-02")) == ((true, Some(5.0))), out)
    assert(out(("u2", "2024-01-03")) == ((false, Some(5.0))), out)
  }

  test("nearestJoin: l_id values colliding across keys never collapse rows") {
    val left = Seq(("a", 1L, "2024-01-10 12:00:00"),
      ("b", 1L, "2024-01-10 12:00:00"))             // same l_id, different key
      .toDF("k", "lid", "ts_s")
      .withColumn("lts", col("ts_s").cast("timestamp")).drop("ts_s")
    val right = Seq(("a", 7L, "2024-01-10 12:05:00"),
      ("b", 8L, "2024-01-10 12:10:00"))
      .toDF("k", "rid", "ts_s")
      .withColumn("rts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.nearestJoin(left, right, "k",
        "lts", "lid", "rts", "rid", tolSec = 3600L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toSet
    assert(out == Set(("a", 7L), ("b", 8L)), out)   // both rows survive
  }

  test("topPaths: (ts,id) order, maxLen truncation, deterministic top-k tie-break") {
    val ev = (Seq(
      ("a", 1, "view"), ("a", 2, "click"), ("a", 3, "buy"),
      ("b", 4, "view"), ("b", 5, "click"), ("b", 6, "buy"),
      ("c", 7, "view"), ("c", 8, "click"),
      ("d", 9, "signup"))
      .map { case (u, i, t) =>
        (u, s"2024-01-10 0$i:00:00", i.toLong, t) })
      .toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    val out = graft.gold.Marts.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxLen = 8, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("view>click>buy", 2L), ("view>click", 1L),
      ("signup", 1L)), out.mkString(","))
    // truncation: maxLen=2 folds the 3-step journeys into the 2-step path
    val trunc = graft.gold.Marts.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxLen = 2, k = 1).collect()
    assert(trunc.length == 1 &&
      trunc(0).getString(0) == "view>click" && trunc(0).getLong(1) == 3L)
  }

  test("mutualInfo: ln(2) nats for a determined pair, exactly zero for independence") {
    val dep = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b")).toDF("x", "y")
    val depOut = Quality.mutualInfo(dep, "x", "y").head()
    assert(depOut.getAs[Long]("n_rows") == 4L)
    assert(depOut.getAs[Double]("mi") == 0.693148, depOut.toString) // 2·round6(ln2/2)
    val ind = Seq(("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")).toDF("x", "y")
    assert(Quality.mutualInfo(ind, "x", "y").head().getAs[Double]("mi") == 0.0)
  }

  test("pageRankInt: hand-computed 3-round ranks on a path graph, hub dominates") {
    // undirected path a—b—c as 4 directed edges; hand-traced integer rounds
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"))
      .toDF("src", "dst")
    val out = graft.operators.GraphOps.pageRankInt(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("p")).toMap
    assert(out == Map("a" -> 629187L, "b" -> 1741625L, "c" -> 629187L), out)
    // star: the center out-ranks every leaf
    val star = Seq("b", "c", "d").flatMap(l => Seq(("a", l), (l, "a")))
      .toDF("src", "dst")
    val sr = graft.operators.GraphOps.pageRankInt(star, "src", "dst", iters = 3)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("p")).toMap
    assert(sr("a") > sr("b") && sr("b") == sr("c") && sr("c") == sr("d"), sr)
  }

  test("triangles: K4 has 4, each node in 3; stars have none; edge form irrelevant") {
    import graft.operators.GraphOps
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in C(3,2)=3
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a != b } yield (a, b))
      .toDF("u", "v")
    val out = GraphOps.triangles(k4, "u", "v")
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[Long]("n_triangles"))
      .toMap
    assert(out == Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L), out)
    // star graph: wedges everywhere, no closing edge → empty result
    val star = (2 to 6).map(l => (1, l)).toDF("u", "v")
    assert(GraphOps.triangles(star, "u", "v").isEmpty)
    // duplicate edges, reversed edges, and self-loops do not change counts
    val messy = Seq((1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1))
      .toDF("u", "v")
    val m = GraphOps.triangles(messy, "u", "v")
      .collect().map(r => r.getAs[Int]("id") -> r.getAs[Long]("n_triangles"))
      .toMap
    assert(m == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), m)
  }

  test("ancestors: full closure on a tree, maxDepth truncates, cycles terminate") {
    import graft.operators.GraphOps
    val tree = Seq((2, 1), (3, 1), (4, 2), (5, 2), (6, 4)).toDF("c", "p")
    val out = GraphOps.ancestors(tree, "c", "p", maxDepth = 8)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set((2, 1, 1L), (3, 1, 1L), (4, 2, 1L), (4, 1, 2L),
      (5, 2, 1L), (5, 1, 2L), (6, 4, 1L), (6, 2, 2L), (6, 1, 3L)), out)
    // a 10-deep chain truncated at depth 4: every dist ≤ 4
    val chain = (2 to 10).map(k => (k, k - 1)).toDF("c", "p")
    val tr = GraphOps.ancestors(chain, "c", "p", maxDepth = 4)
      .collect().map(_.getLong(2))
    assert(tr.nonEmpty && tr.max == 4L && tr.count(_ == 4L) == 6, tr.max)
    // a cycle neither hangs nor exceeds maxDepth
    val cyc = Seq((1, 2), (2, 1)).toDF("c", "p")
    val cy = GraphOps.ancestors(cyc, "c", "p", maxDepth = 4).collect()
    assert(cy.nonEmpty && cy.map(_.getLong(2)).max <= 4L)
  }

  test("cusumDaily: slow 5-under-target leak accumulates to an alarm no daily screen fires") {
    // target 100, h 30: days at 95 are individually unremarkable but the
    // negative CUSUM climbs 5/day and alarms on day 7
    val daily = (1 to 10).map(i =>
      ("s", f"2024-01-$i%02d", 95L)).toDF("k", "day_s", "n")
      .withColumn("day", col("day_s").cast("date")).drop("day_s")
    val out = Quality.cusumDaily(daily, "k", "day", "n",
        target = 100L, h = 30L)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        ((r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"),
          r.getAs[Boolean]("alarm")))).toMap
    assert(out("2024-01-06") == ((0L, 30L, false)), out)
    assert(out("2024-01-07") == ((0L, 35L, true)), out)
    assert(out("2024-01-10") == ((0L, 50L, true)), out)
    // a recovery resets the chart: spike back above target shrinks S⁻
    val rec = daily.unionByName(Seq(("s", "2024-01-11", 150L))
      .toDF("k", "day_s", "n")
      .withColumn("day", col("day_s").cast("date")).drop("day_s"))
    val r11 = Quality.cusumDaily(rec, "k", "day", "n", 100L, 30L)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        r.getAs[Long]("s_neg")).toMap
    assert(r11("2024-01-11") == 0L, r11)
  }

  test("weekOverWeekResidual: calendar-exact day-7 baseline, null when absent") {
    val ev = Seq(
      ("s", "2024-01-01 10:00:00"), ("s", "2024-01-01 11:00:00"),
      ("s", "2024-01-08 10:00:00"), ("s", "2024-01-08 11:00:00"),
      ("s", "2024-01-08 12:00:00"),
      ("s", "2024-01-02 10:00:00")
    ).toDF("event_type", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
    val out = Quality.weekOverWeekResidual(ev, "event_type", "ts")
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (Option(r.getAs[java.lang.Long]("n_week_ago")),
          Option(r.getAs[java.lang.Long]("delta")))).toMap
    assert(out("2024-01-08") == ((Some(2L), Some(1L))), out)
    assert(out("2024-01-01") == ((None, None)))
    assert(out("2024-01-02") == ((None, None)))
  }

  test("weightOfEvidence: symmetric hand case, empty-safe smoothing") {
    val df = (0 to 9).map(v => (v.toDouble, v >= 5)).toDF("v", "good")
    val out = Quality.weightOfEvidence(df, "v", col("good"), bins = 5)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n_good"), r.getAs[Long]("n_bad"),
          r.getAs[Double]("woe"))).toMap
    assert(out(0) == ((0L, 2L, -1.098612)), out)   // ln(0.1/0.3)
    assert(out(2) == ((1L, 1L, 0.0)))              // balanced bin
    assert(out(4) == ((2L, 0L, 1.098612)))         // mirror of bin 0
  }

  test("novelty probe over a persisted index equals the full recompute") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val idx = tmpDir("novidx") + "/idx"
    TextAnalysis.ngramNoveltyIndex(
      docs.filter(col("source") =!= "src0"), "text", k = 3, idx)
    val probe = TextAnalysis.ngramNoveltyProbe(
        docs.filter(col("source") === "src0"), "doc_id", "text", idx, k = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap
    val full = TextAnalysis.ngramNovelty(docs, "doc_id", "text",
        col("source") =!= "src0", k = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"))).toMap
    assert(probe == full && probe.nonEmpty, s"${probe.size} vs ${full.size}")
  }

  test("lineage: analyzed-plan walk maps file leaves back to catalog tables") {
    val d = "/root/testdata/sf0.001"
    assert(Lineage.sourceTables(
      Queries.queries("q01_dedup_latest")(spark, d)) == Seq("events"))
    assert(Lineage.sourceTables(
      Queries.queries("q14_star_revenue")(spark, d)) ==
      Seq("customer", "lineitem", "orders"))
    val edges = Lineage.edges(spark, d,
      Seq("q06_agg_pricing", "q03_fact_enrich"))
      .as[(String, String)].collect().toSeq
    assert(edges == Seq(
      "q06_agg_pricing" -> "lineitem",
      "q03_fact_enrich" -> "lineitem",
      "q03_fact_enrich" -> "orders"))
  }
}
