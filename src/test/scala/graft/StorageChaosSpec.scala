package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import scala.util.{Failure, Try}
import org.apache.spark.sql.functions._
import graft.gold.{BaseDelta, CommitConflictException}

/** Randomized concurrency soak over one BaseDelta table — the
  * generalization of CommitRaceSpec's TARGETED races: a deterministic
  * random scheduler interleaves a sequential appender, two concurrent
  * erasers, and two concurrent compactors for dozens of operations, then
  * checks the final state against the sequential model. The targeted
  * specs pin each discovered race (shared staging, stale-read erasure,
  * fold-vs-OPTIMIZE, tombstone retirement); this suite hunts for the
  * UNDISCOVERED ones — any interleaving that loses an append, loses an
  * acked erasure, mixes commits, or leaks a non-typed exception fails
  * here, and the failing seed replays exactly (no RNG state outside the
  * seeded generator, no time-based scheduling decisions).
  *
  * Key-space design keeps the oracle interleaving-independent: the
  * appender owns keys [0, 100) (never erased — every one must surface
  * with its LATEST batch's value), erasers own seed keys [1000, 1100)
  * (written once, before the race, never re-appended — every acked
  * erasure must be absent no matter when any compaction materialized
  * it). Workers retry ONLY on the typed CommitConflictException; any
  * other throwable is a protocol leak and fails the test.
  */
@Soak
class StorageChaosSpec extends SparkSpec {
  import spark.implicits._

  private val AppendBatches = 8
  private val ErasesPerEraser = 3

  private def appenderRows(batch: Int, rnd: scala.util.Random) = {
    // each batch rewrites a random ~half of the appender key space at
    // seq=batch; latest-wins resolves per key to the highest batch that
    // touched it
    val keys = (0 until 100).filter(_ => rnd.nextBoolean())
    keys.map(k => (k.toLong, batch.toLong, s"b$batch")).toDF("id", "seq", "tag")
  }

  private def retryConflict[A](maxAttempts: Int)(body: => A): A = {
    var attempt = 0
    var out: Option[A] = None
    while (out.isEmpty) {
      try out = Some(body)
      catch {
        case e: CommitConflictException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    out.get
  }

  for (seed <- Seq(101, 202)) {
    test(s"chaos soak seed=$seed: no lost appends, no lost acked erasures, typed failures only") {
      // to trace the publish/retire/manifest sequence on a failure,
      // rerun with -Dgraft.debug.snapshot=1 (or setProperty here)
      val rnd = new scala.util.Random(seed)
      val t = BaseDelta.Table(tmpDir(s"chaos-$seed") + "/t",
        keys = Seq("id"), orderCols = Seq("seq"))

      // pre-race seed batch: the erasers' exclusive key range
      val seedKeys = (1000L until 1100L).map(k => (k, -1L, "seed")).toDF("id", "seq", "tag")
      BaseDelta.append(spark, t, seedKeys, batchId = 0L)

      // each worker's op schedule is drawn up-front from the one seeded
      // generator, so the schedule (not thread timing) is reproducible;
      // thread timing then explores interleavings around it
      val eraseTargets: Seq[Seq[Seq[Long]]] = Seq.fill(2)(
        Seq.fill(ErasesPerEraser)(
          Seq.fill(4)(1000L + rnd.nextInt(100)).distinct))
      val appendPlans = (1 to AppendBatches).map(b => appenderRows(b, rnd))
      val sleeps = Seq.fill(64)(rnd.nextInt(30)).iterator.buffered
      def jitter(): Unit = Thread.sleep(synchronized {
        if (sleeps.hasNext) sleeps.next().toLong else 5L })

      val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()

      val appender = () => (1 to AppendBatches).foreach { b =>
        jitter()
        retryConflict(20) { BaseDelta.append(spark, t, appendPlans(b - 1), b.toLong) }
      }
      val erasers = eraseTargets.zipWithIndex.map { case (plan, i) => () =>
        plan.foreach { ids =>
          jitter()
          // logicalErase retries its ledger publish internally; outer
          // retry covers exhaustion under heavy contention. countRows
          // exercises both receipt forms across the two erasers.
          retryConflict(5) {
            BaseDelta.logicalErase(spark, t, "id", ids.toDF("id"),
              countRows = i == 0).collect()
          }
          ids.foreach(acked.add(_))
        }
      }
      val compactors = (0 until 2).map { _ => () =>
        (1 to 3).foreach { _ =>
          jitter()
          // maintenance is best-effort: losing the manifest CAS to the
          // appender or the other compactor just skips this cycle
          try BaseDelta.compact(spark, t)
          catch { case _: CommitConflictException => () }
        }
      }

      val bodies: Seq[() => Unit] = Seq(appender) ++ erasers ++ compactors
      val pool = Executors.newFixedThreadPool(bodies.size)
      val start = new CountDownLatch(1)
      val futures = bodies.map { b =>
        pool.submit(new java.util.concurrent.Callable[Try[Unit]] {
          def call(): Try[Unit] = { start.await(); Try(b()) }
        })
      }
      start.countDown()
      val results = futures.map(_.get(180, TimeUnit.SECONDS))
      pool.shutdown()

      // a worker that exhausted retries surfaces the TYPED conflict (an
      // honest loud stop); anything else leaking is a protocol bug
      results.collect { case Failure(e) => e }.foreach { e =>
        assert(e.isInstanceOf[CommitConflictException],
          s"seed $seed: non-typed leak: $e")
      }
      assert(results.forall(_.isSuccess),
        s"seed $seed: a worker exhausted conflict retries at this " +
          "contention level — protocol livelock")

      // sequential model: appender keys resolve latest-wins over the
      // batches that actually committed (all of them — appends retried
      // to success); erased seed keys are gone regardless of when (or
      // whether) any compaction materialized them
      val expectedAppender: Map[Long, Long] = (1 to AppendBatches)
        .flatMap(b => appendPlans(b - 1).select("id").as[Long].collect()
          .map(_ -> b.toLong))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
      val erased = acked.toArray.map(_.asInstanceOf[Long]).toSet

      val got = BaseDelta.read(spark, t)
        .select(col("id"), col("seq")).as[(Long, Long)].collect().toMap
      // debug dump on lost-erasure detection (kept cheap; prints only on bug)
      erased.filter(got.contains).foreach { k =>
        println(s"=== chaos debug seed=$seed lost-erased key $k ===")
        val pend = BaseDelta.pendingTombstones(spark, t)
        println(s"pending ledgers: ${pend.map { case (c, df) =>
          c -> df.as[Long].collect().sorted.mkString("[", ",", "]") }}")
        val f = new org.apache.hadoop.fs.Path(t.path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def ls(p: String): Seq[String] = {
          val pp = new org.apache.hadoop.fs.Path(p)
          if (!f.exists(pp)) Seq(s"$p: MISSING")
          else f.listStatus(pp).map(_.getPath.toUri.getPath.replace(t.path, "")).toSeq
        }
        println(s"tombstones tree: ${ls(t.path + "/_tombstones/id")}")
        ls(t.path + "/_tombstones/id").filter(_.contains("gen="))
          .foreach(g => println(s"  $g -> ${ls(t.path + "/_tombstones/id" + g.drop(g.indexOf("/gen=")))}"))
        println(s"root: ${ls(t.path)}")
        println(s"manifest: ${ls(t.manifestRoot)}")
        ls(t.manifestRoot).filter(_.contains("/v0")).sorted.lastOption.foreach { mf =>
          val p = new org.apache.hadoop.fs.Path(t.path + mf)
          val in = f.open(p)
          val bytes = new Array[Byte](4096)
          val n = in.read(bytes); in.close()
          println(s"manifest content: ${new String(bytes, 0, n)}")
        }
        (1 to 8).foreach { g =>
          val bp = t.path + s"/base_g$g"
          if (f.exists(new org.apache.hadoop.fs.Path(bp))) {
            val c = spark.read.parquet(bp).filter(col("id") === k).count()
            if (c > 0) println(s"  key $k in base_g$g x$c")
          }
        }
        ls(t.deltaRoot).foreach { d =>
          val dp = t.path + d
          val c = spark.read.parquet(dp).filter(col("id") === k).count()
          if (c > 0) println(s"  key $k in $d x$c")
        }
      }
      expectedAppender.foreach { case (k, maxB) =>
        assert(got.get(k).contains(maxB),
          s"seed $seed: appender key $k expected seq=$maxB got ${got.get(k)} — lost append")
      }
      erased.foreach { k =>
        assert(!got.contains(k),
          s"seed $seed: acked-erased key $k still readable — lost erasure")
      }
      (1000L until 1100L).filterNot(erased).foreach { k =>
        assert(got.get(k).contains(-1L),
          s"seed $seed: untouched seed key $k wrong/missing: ${got.get(k)}")
      }

      // quiesced maintenance completes the lifecycle: a full fold
      // materializes every pending ledger and the view is unchanged
      BaseDelta.materializeErasures(spark, t)
      assert(BaseDelta.pendingTombstones(spark, t).isEmpty,
        s"seed $seed: ledgers still pending after a quiesced full fold")
      val after = BaseDelta.read(spark, t)
        .select(col("id"), col("seq")).as[(Long, Long)].collect().toMap
      assert(after == got,
        s"seed $seed: materialization changed the readable view")
    }
  }
}
