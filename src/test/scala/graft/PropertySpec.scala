package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.gold.{Scd2Merge, UpsertByKey}
import graft.silver.Staging

/** Property-based invariants (SURVEY.md §5.5): SCD2 structural invariants
  * under arbitrary epoch sequences; upsert and dedup idempotence /
  * determinism under replays and reorderings. (scalatest + scalacheck Gen
  * sampled with fixed seeds — the scalatestplus bridge isn't available in
  * the offline cache.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val epochsGen: Gen[List[List[(Int, String, Double)]]] =
    Gen.listOfN(4, Gen.listOf(for {
      id <- Gen.choose(1, 6)
      tpe <- Gen.oneOf("SAVINGS", "CHECKING")
      bal <- Gen.choose(0, 3).map(_ * 100.0)
    } yield (id, tpe, bal)))

  test("SCD2: <=1 current row per key and contiguous intervals, for any epoch sequence") {
    samples(epochsGen, 8).foreach { epochs =>
      var snap = Scd2Merge.emptySnapshot(
        Seq.empty[(Int, String, Double)].toDF("id", "account_type", "balance"))
      epochs.zipWithIndex.foreach { case (rows, i) =>
        if (rows.nonEmpty) {
          val batch = Staging.dedupLatest(
            rows.toDF("id", "account_type", "balance"),
            Seq("id"), Seq($"balance".desc, $"account_type".desc))
          snap = Scd2Merge(snap, batch, Seq("id"),
            Seq("account_type", "balance"), ts(f"2024-01-${i + 1}%02d 00:00:00"))
        }
      }
      val rows = snap.collect()
      rows.groupBy(_.getAs[Int]("id")).foreach { case (_, vs) =>
        assert(vs.count(_.getAs[java.sql.Timestamp]("effective_to") == null) == 1)
        vs.sortBy(_.getAs[java.sql.Timestamp]("effective_from").getTime)
          .sliding(2).foreach {
            case Array(a, b) =>
              assert(a.getAs[java.sql.Timestamp]("effective_to") ==
                b.getAs[java.sql.Timestamp]("effective_from"))
            case _ =>
          }
      }
    }
  }

  private val batchGen: Gen[List[(Long, Int, Double)]] =
    Gen.listOf(for {
      id <- Gen.choose(1L, 8L)
      ver <- Gen.choose(1, 5)
      v <- Gen.choose(0, 100).map(_.toDouble)
    } yield (id, ver, v))

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(x => x).toSeq

  test("upsert: replaying any batch is a no-op; result independent of input order") {
    val rnd = new scala.util.Random(7)
    samples(Gen.zip(batchGen, batchGen), 8).foreach { case (b1, b2) =>
      if (b1.nonEmpty || b2.nonEmpty) {
        val ord = Seq($"ver".desc, $"v".desc)
        val base = Seq.empty[(Long, Int, Double)].toDF("id", "ver", "v")
        def df(b: List[(Long, Int, Double)]) = b.toDF("id", "ver", "v")
        val once = UpsertByKey(UpsertByKey(base, df(b1), Seq("id"), ord),
          df(b2), Seq("id"), ord)
        val onceRows = canon(once)
        assert(canon(UpsertByKey(once, df(b2), Seq("id"), ord)) == onceRows)
        val shuffled = UpsertByKey(UpsertByKey(base,
          df(rnd.shuffle(b1)), Seq("id"), ord),
          df(rnd.shuffle(b2)), Seq("id"), ord)
        assert(canon(shuffled) == onceRows)
      }
    }
  }

  test("dedupLatestByMax (hash-agg) equals dedupLatest (window) for desc ordering") {
    samples(batchGen, 8).foreach { b =>
      if (b.nonEmpty) {
        val df = b.toDF("id", "ver", "v")
        val win = Staging.dedupLatest(df, Seq("id"), Seq($"ver".desc, $"v".desc))
        val agg = Staging.dedupLatestByMax(df, Seq("id"), Seq("ver", "v"))
        assert(canon(agg.select("id", "ver", "v")) == canon(win.select("id", "ver", "v")))
      }
    }
  }

  test("dedupLatest is deterministic under repartitioning") {
    samples(batchGen, 8).foreach { b =>
      if (b.nonEmpty) {
        val df = b.toDF("id", "ver", "v")
        val a = Staging.dedupLatest(df.repartition(1), Seq("id"), Seq($"ver".desc, $"v".desc))
        val c = Staging.dedupLatest(df.repartition(7), Seq("id"), Seq($"ver".desc, $"v".desc))
        assert(canon(a) == canon(c))
      }
    }
  }

  test("chunking reconstructs the token stream for any doc and chunk geometry") {
    val geomGen = for {
      nToks <- Gen.choose(1, 40)
      chunk <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, chunk - 1)
    } yield (nToks, chunk, overlap)
    samples(geomGen, 25).foreach { case (n, c, o) =>
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val out = graft.operators.TextAnalysis.chunk(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", c, o)
        .orderBy("chunk_id").collect()
      // dropping each successor chunk's `overlap` leading tokens and
      // concatenating must reproduce the original token stream exactly
      val stitched = out.zipWithIndex.flatMap { case (r, i) =>
        val toks = r.getAs[String]("chunk_text").split(" ").toSeq
        if (i == 0) toks else toks.drop(o)
      }.toSeq
      assert(stitched == (1 to n).map(i => s"w$i"),
        s"n=$n chunk=$c overlap=$o → $stitched")
      // declared sizes match the text
      out.foreach(r => assert(
        r.getAs[String]("chunk_text").split(" ").length == r.getAs[Int]("n_chunk_tokens")))
    }
  }

  test("sequence packing: exact tiling for any corpus and capacity") {
    val geomGen = for {
      nDocs <- Gen.choose(1, 60)
      cap <- Gen.choose(2, 50)
      shards <- Gen.choose(1, 5)
      lens <- Gen.listOfN(nDocs, Gen.choose(0, 120))
    } yield (cap, shards, lens)
    samples(geomGen, 20).foreach { case (cap, shards, lens) =>
      val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l.toLong) }
        .toDF("doc_id", "tok_len")
      val segs = graft.operators.Packing.packSegments(
        df, "doc_id", "tok_len", cap, shards).collect()
      // per-document: segment lengths sum to the doc's token count, and
      // segments tile the doc contiguously from token 0
      val byDoc = segs.groupBy(_.getAs[Long]("doc_id"))
      val expected = lens.zipWithIndex.filter(_._1 > 0)
      assert(byDoc.keySet == expected.map(_._2.toLong).toSet)
      expected.foreach { case (l, id) =>
        val rows = byDoc(id.toLong).sortBy(_.getAs[Long]("chunk"))
        assert(rows.map(_.getAs[Long]("seg_len")).sum == l.toLong,
          s"doc $id len $l cap $cap")
        val starts = rows.map(_.getAs[Long]("seg_start"))
        val tiled = rows.map(_.getAs[Long]("seg_len")).scanLeft(0L)(_ + _).init
        assert(starts.toSeq == tiled.toSeq, s"doc $id segments not contiguous")
      }
      // per-chunk: every chunk is exactly `cap` tokens except each
      // shard's LAST chunk, and chunk offsets tile each chunk
      segs.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk")))
        .foreach { case ((sh, ch), rows) =>
          val fill = rows.map(_.getAs[Long]("seg_len")).sum
          val lastChunk = segs.filter(_.getAs[Long]("shard") == sh)
            .map(_.getAs[Long]("chunk")).max
          assert(fill == cap.toLong || (ch == lastChunk && fill < cap),
            s"shard $sh chunk $ch fill $fill cap $cap")
          val sorted = rows.sortBy(_.getAs[Long]("chunk_offset"))
          val tiled = sorted.map(_.getAs[Long]("seg_len")).scanLeft(0L)(_ + _).init
          assert(sorted.map(_.getAs[Long]("chunk_offset")).toSeq == tiled.toSeq,
            s"shard $sh chunk $ch offsets don't tile")
        }
      // determinism under repartitioning
      val again = graft.operators.Packing.packSegments(
        df.repartition(7), "doc_id", "tok_len", cap, shards).collect()
      assert(again.map(_.toString).sorted.toSeq ==
        segs.map(_.toString).sorted.toSeq)
    }
  }

  test("no-split packing matches a sequential next-fit reference; never splits or overflows") {
    val geomGen = for {
      nDocs <- Gen.choose(1, 60)
      cap <- Gen.choose(5, 60)
      shards <- Gen.choose(1, 5)
      lens <- Gen.listOfN(nDocs, Gen.choose(0, 60))
    } yield (cap, shards, lens.map(math.min(_, cap))) // contract: len <= cap
    samples(geomGen, 15).foreach { case (cap, shards, lens) =>
      val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l.toLong) }
        .toDF("doc_id", "tok_len")
      val got = graft.operators.Packing.packNoSplit(
          df, "doc_id", "tok_len", cap, shards)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
          r.getAs[Long]("pos"), r.getAs[Long]("chunk"),
          r.getAs[Long]("chunk_offset"), r.getAs[Long]("tok_len")))
      // reference: sequential next-fit over the engine's own (shard, pos)
      // order — the scan semantics, re-derived independently
      val expected = got.map(t => (t._2, t._3) -> t).toMap // keyed coords
      got.groupBy(_._2).foreach { case (sh, rows) =>
        var chunk = -1L; var fill = cap.toLong
        rows.sortBy(_._3).foreach { case (id, _, pos, gotChunk, gotOff, len) =>
          if (fill + len > cap) { chunk += 1; fill = 0 }
          assert(gotChunk == chunk && gotOff == fill,
            s"doc $id shard $sh pos $pos: got ($gotChunk,$gotOff) want ($chunk,$fill)")
          fill += len
          assert(fill <= cap, s"chunk overflow on doc $id")
        }
      }
      // exactly one row per positive-length doc; pos is 1..n per shard
      assert(got.length == lens.count(_ > 0))
      got.groupBy(_._2).foreach { case (_, rows) =>
        assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
      }
      assert(expected.size == got.length) // (shard,pos) unique
      // oversized doc fails loudly
      if (lens.nonEmpty) {
        val bad = Seq((999L, cap + 1L)).toDF("doc_id", "tok_len")
        val e = intercept[org.apache.spark.SparkException] {
          graft.operators.Packing.packNoSplit(
            bad, "doc_id", "tok_len", cap, shards).collect()
        }
        assert(e.getMessage != null)
      }
    }
  }

  test("cluster resolution matches reference union-find on random graphs") {
    val graphGen = Gen.listOf(for {
      a <- Gen.choose(1L, 20L)
      b <- Gen.choose(1L, 20L)
      if a != b
    } yield (math.min(a, b), math.max(a, b)))
    samples(graphGen, 12).foreach { edges =>
      if (edges.nonEmpty) {
        // reference: driver-side union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(k => k -> find(k)).toMap
        val got = graft.operators.Dedup.resolveClusters(edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cluster_id")).toMap
        assert(got == expected, s"edges=$edges")
      }
    }
  }

  test("bigram NLL is invariant under repartitioning (DECIMAL term sums)") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "b c d"), (3L, "a a a a"), (4L, "c d a b c"))
      .toDF("doc_id", "text")
    val one = graft.operators.TextAnalysis.bigramNll(docs.repartition(1), "doc_id", "text")
    val many = graft.operators.TextAnalysis.bigramNll(docs.repartition(7), "doc_id", "text")
    assert(one.collect().map(_.toString).sorted.toSeq ==
      many.collect().map(_.toString).sorted.toSeq)
  }

  private val corpusGen: Gen[List[(Long, List[String])]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n,
      Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))))
  } yield docs.zipWithIndex.map { case (tk, i) => (i.toLong, tk) }

  test("window-dup stats match a driver-side reference on random tiny-vocab corpora") {
    val (k, minDf) = (3, 2)
    samples(corpusGen, 6).foreach { corpus =>
      val eligible = corpus.filter(_._2.size >= k)
      if (eligible.nonEmpty) {
        val wins = eligible.map { case (id, tk) =>
          id -> tk.sliding(k).map(_.mkString(" ")).toList }
        val docFreq = wins.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
          .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
        val expected = wins.map { case (id, ws) =>
          val nDup = ws.count(w => docFreq(w) >= minDf)
          id -> ((ws.size.toLong, nDup.toLong, nDup.toDouble / ws.size))
        }.toMap
        val got = graft.operators.Dedup.windowDupStats(
            corpus.map { case (id, tk) => (id, tk.mkString(" ")) }.toDF("doc_id", "text"),
            "doc_id", "text", k = k, minDocFreq = minDf)
          .collect().map(r => r.getAs[Long]("doc_id") ->
            ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
              r.getAs[Double]("dup_fraction")))).toMap
        assert(got == expected, s"corpus=$corpus")
      }
    }
  }

  test("sessionize matches a fold-based reference on random event streams") {
    val gen: Gen[List[(Int, Int)]] = Gen.nonEmptyListOf(for {
      user <- Gen.choose(1, 4)
      t <- Gen.choose(0, 5000)
    } yield (user, t))
    samples(gen, 6).foreach { raw =>
      // unique (user, ts) pairs so (ts, event_id) ordering is unambiguous
      // regardless of generator duplicates; event_id = index
      val rows = raw.distinct.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, u, new java.sql.Timestamp(1700000000000L + t * 1000L))
      }
      val gap = 600L
      val expected = rows.groupBy(_._2).flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._3.getTime, e._1))
        var seq = 0L
        var prev = Long.MinValue
        sorted.map { e =>
          val t = e._3.getTime / 1000L
          if (prev == Long.MinValue || t - prev > gap) seq += 1
          prev = t
          e._1 -> seq
        }
      }
      val got = graft.operators.Sessionize.assign(
          rows.toDF("event_id", "user_id", "ts"), "user_id", "ts", gap, Seq("event_id"))
        .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq"))
        .toMap
      assert(got == expected, s"rows=$rows")
    }
  }

  test("epoch upsample: per-key copy counts obey the floor/ceil law and repartition-invariance") {
    val gen: Gen[(List[Int], Double)] = for {
      ids <- Gen.nonEmptyListOf(Gen.choose(1, 500))
      w <- Gen.oneOf(0.3, 1.0, 1.7, 2.0, 3.4)
    } yield (ids, w)
    samples(gen, 6).foreach { case (ids0, w) =>
      val ids = ids0.distinct
      val df = ids.map(i => (i.toLong, "s")).toDF("id", "src")
      val counts = graft.operators.Sampling.epochUpsample(df, "id", "src", Map(), default = w)
        .groupBy($"id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
      val lo = math.floor(w).toLong
      ids.foreach { i =>
        val n = counts.getOrElse(i.toLong, 0L)
        assert(n == lo || n == lo + 1, s"id=$i n=$n w=$w")
      }
      // deterministic under repartitioning
      val again = graft.operators.Sampling.epochUpsample(
          df.repartition(7), "id", "src", Map(), default = w)
        .groupBy($"id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
      assert(again == counts.filter(_._2 > 0))
    }
  }

  test("tfidf cosine pairs match a brute-force reference on random corpora") {
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e")
    val gen: Gen[List[String]] =
      Gen.listOfN(6, Gen.listOfN(8, wordGen).map(_.mkString(" ")))
    samples(gen, 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val k = 3
      // reference: trigram tf vectors, milli-unit weights, exact cosine
      val tf = docs.map { case (id, t) =>
        val toks = t.split("\\s+").toSeq
        id -> toks.sliding(k).map(_.mkString(" ")).toSeq
          .groupBy(identity).map { case (g, xs) => g -> xs.size.toLong }
      }.toMap
      val nd = tf.count(_._2.nonEmpty).toDouble
      val dfreq = tf.values.flatMap(_.keys).groupBy(identity)
        .map { case (t, xs) => t -> xs.size }
      val w = tf.map { case (id, m) =>
        id -> m.map { case (t, c) =>
          t -> math.floor(c * math.log(nd / dfreq(t)) * 1e3 + 0.5).toLong }
      }
      val nsq = w.map { case (id, m) => id -> m.values.map(x => x * x).sum }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        if nsq(a) > 0 && nsq(b) > 0
        dot = w(a).keySet.intersect(w(b).keySet).toSeq
          .map(t => w(a)(t) * w(b)(t)).sum
        cos = math.floor(dot.toDouble /
          (math.sqrt(nsq(a).toDouble) * math.sqrt(nsq(b).toDouble)) * 1e6 + 0.5) / 1e6
        if cos >= 0.1
      } yield (a, b) -> cos).toMap
      val got = graft.operators.Dedup.tfidfCosinePairs(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = k, minCosine = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == expected, s"texts=$texts")
    }
  }

  test("corpus-stats percentiles match a sort-based reference on random groups") {
    val gen: Gen[List[(String, Int)]] = Gen.nonEmptyListOf(for {
      grp <- Gen.oneOf("g1", "g2", "g3")
      len <- Gen.choose(1, 20)
    } yield (grp, len))
    samples(gen, 6).foreach { rows =>
      val expected = rows.groupBy(_._1).map { case (grp, xs) =>
        val lens = xs.map(_._2).sorted
        def pick(p: Double) = lens(math.ceil(p * lens.size).toInt - 1)
        grp -> ((lens.size.toLong, lens.map(_.toLong).sum,
          lens.sum.toDouble / lens.size, pick(0.5), pick(0.9)))
      }
      val got = graft.operators.TextAnalysis.corpusStats(
          rows.map { case (g, n) => (g, Seq.fill(n)("w").mkString(" ")) }
            .toDF("source", "text"),
          "source", "text")
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
            r.getAs[Double]("mean_tokens"),
            r.getAs[Int]("p50_tokens"), r.getAs[Int]("p90_tokens")))).toMap
      assert(got == expected, s"rows=$rows")
    }
  }
}
