package graft

import graft.gold.{CommitCas, CommitConflictException}

/** Shared crash-sweep machinery (see [[CrashSweepSpec]] for the model):
  * record a protocol's mutating-op trace on the `faulty` scheme, then
  * crash at the first and last occurrence of every distinct op signature
  * and assert (1) no success-with-torn-effect, (2) reads after the crash
  * serve a legal state, (3) re-invoking converges to the no-crash result
  * (+ an optional raw byte scan for erased payloads).
  */
trait CrashSweepHarness extends SparkSpec {

  spark.sparkContext.hadoopConfiguration
    .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)
  spark.sparkContext.hadoopConfiguration
    .set("fs.faultymock.impl", classOf[FaultyMockFileSystem].getName)
  CommitCas.register("faulty", FaultyConditionalPut)
  CommitCas.register("faultymock", FaultyConditionalPut)

  protected val maxPoints: Int =
    if (sys.env.get("GRAFT_CRASH_SWEEP").contains("full")) Int.MaxValue else 12

  protected case class Protocol(
      name: String,
      setup: String => Unit,
      op: String => Unit,
      recover: String => Unit,
      observe: String => Seq[String],
      // extra legal read-after-crash states beyond {pre, post}, keyed by
      // a builder over a fresh root (documented multi-commit
      // intermediates only)
      extraMid: Seq[String => Seq[String]] = Seq.empty,
      // multi-table protocols whose per-table commits are documented as
      // replay-converged rather than read-atomic skip the strict
      // mid-state membership check (invariants 1 and 3 still hold)
      checkMid: Boolean = true,
      // payload strings that must not exist in ANY surviving byte on
      // disk after recovery + full vacuum (physical-erasure protocols)
      erasedPayloads: Seq[String] = Seq.empty,
      // full-reclamation pass run after recovery, before the byte scan
      finalVacuum: String => Unit = _ => ())

  protected def canon(rows: Seq[String]): Seq[String] = rows.sorted

  /** Wait for every Spark job to settle, then stand the clock down. A
    * failed job's sibling tasks are killed asynchronously; one still
    * running could complete a mutating filesystem op unpoisoned the
    * instant the clock turned OFF, producing flaky torn states in
    * multi-task protocols.
    */
  protected def quiesceAndDisarm(): Unit = {
    val tracker = spark.sparkContext.statusTracker
    val deadline = System.nanoTime() + 10000000000L
    while (tracker.getActiveJobIds().nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(10)
    FaultClock.disarm()
  }

  protected def retryTyped(n: Int)(body: => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { body; done = true }
      catch {
        case _: CommitConflictException if attempt < n => attempt += 1
      }
    }
  }

  protected def stripScheme(root: String): String =
    root.substring(root.indexOf(':') + 1)

  protected def localDirOf(root: String): String =
    stripScheme(root).split('/').dropRight(1).mkString("/")

  protected def freshRoot(name: String, scheme: String): String =
    s"$scheme:${tmpDir(s"crash-$name")}/t"

  /** Raw byte scan: any file under the root's local dir containing any of
    * `payloads` as ASCII bytes. Conservative-sound (compression can hide
    * bytes, never invent them); parquet dictionary/plain pages keep
    * unique strings literal under the sweep's uncompressed codec.
    */
  protected def filesHolding(root: String, payloads: Seq[String]): Seq[String] = {
    val base = java.nio.file.Paths.get(stripScheme(root))
    if (!java.nio.file.Files.exists(base)) return Seq.empty
    val needles = payloads.map(_.getBytes("UTF-8"))
    val hits = scala.collection.mutable.ArrayBuffer[String]()
    val walk = java.nio.file.Files.walk(base)
    try walk.forEach { p =>
      if (java.nio.file.Files.isRegularFile(p)) {
        val bytes = java.nio.file.Files.readAllBytes(p)
        if (needles.exists(n => indexOfBytes(bytes, n) >= 0))
          hits += p.toString
      }
    } finally walk.close()
    hits.toSeq
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Curried form for scheme-parameterized test tables. */
  protected def sweep(scheme: String)(p: Protocol): Unit = sweep(p, scheme)

  protected def sweep(p: Protocol, scheme: String = "faulty"): Unit = {
    // uncompressed parquet while sweeping: the physical byte scan for
    // erased payloads needs dictionary/plain pages to hold strings
    // literally (snappy back-references can hide a needle's tail)
    val codecKey = "spark.sql.parquet.compression.codec"
    val prevCodec = spark.conf.getOption(codecKey)
    spark.conf.set(codecKey, "uncompressed")
    try sweepBody(p, scheme)
    finally prevCodec match {
      case Some(c) => spark.conf.set(codecKey, c)
      case None => spark.conf.unset(codecKey)
    }
  }

  private def sweepBody(p: Protocol, scheme: String): Unit = {
    // baseline: pre-state and the no-crash post-state
    val r0 = freshRoot(p.name, scheme)
    p.setup(r0)
    val pre = canon(p.observe(r0))
    p.op(r0)
    val expected = canon(p.observe(r0))
    val extraLegal = p.extraMid.map { mk =>
      val r = freshRoot(p.name, scheme); canon(mk(r))
    }

    // record the mutating-op trace
    val r1 = freshRoot(p.name, scheme)
    p.setup(r1)
    val (recRes, ops) = FaultClock.record(localDirOf(r1))(p.op(r1))
    assert(recRes.isRight, s"${p.name}: record pass failed: $recRes")
    assert(canon(p.observe(r1)) == expected,
      s"${p.name}: record pass end state diverged from baseline")
    assert(ops.nonEmpty, s"${p.name}: no mutating ops recorded")

    // crash points: first and last occurrence of each distinct signature
    val bySig = ops.zipWithIndex.groupBy(_._1)
    val points0 = (bySig.values.map(_.head._2) ++ bySig.values.map(_.last._2))
      .toSeq.distinct.sorted.map(_ + 1) // 1-based op index
    val points =
      if (points0.size <= maxPoints) points0
      else {
        // commit-CAS points are the highest-value crashes ("crashed
        // exactly instead of committing") — always keep them; spread the
        // remaining budget evenly across the other steps
        val priority = points0.filter(k => ops(k - 1).startsWith("condput"))
        val rest = points0.filterNot(priority.contains)
        val budget = math.max(0, maxPoints - priority.size)
        val sampled =
          if (budget == 0 || rest.isEmpty) Seq.empty
          else if (rest.size <= budget) rest
          else {
            val step = (rest.size - 1).toDouble / math.max(1, budget - 1)
            (0 until budget).map(i => rest((i * step).round.toInt)).distinct
          }
        (priority ++ sampled).distinct.sorted
      }

    var crashed = 0
    var unfired = 0
    points.foreach { k =>
      val r = freshRoot(p.name, scheme)
      p.setup(r)
      // the clock stays armed past a body throw: Spark kills sibling
      // tasks of a failed job asynchronously, and a straggler must keep
      // hitting poison while we observe the torn state (observe only
      // reads; reads are never clocked). We quiesce active jobs and
      // disarm only when about to run recovery, which mutates.
      val (fired, out) = FaultClock.armed(localDirOf(r), k.toLong)(p.op(r))
      try {
        if (!fired) {
          // this run used fewer ops than the recorded trace — it completed
          // fault-free and must have produced the full effect
          quiesceAndDisarm()
          assert(out.isRight && canon(p.observe(r)) == expected,
            s"${p.name}: unfired point $k left a diverged state")
          unfired += 1
        } else {
          crashed += 1
          val at = s"crash point $k/${ops.size} (${ops(k - 1)})"
          if (out.isRight) {
            // tolerated only when the semantic effect fully landed before
            // the crash (a best-effort cleanup op after the commit point)
            val got = canon(p.observe(r))
            quiesceAndDisarm()
            assert(got == expected,
              s"${p.name}: $at — op reported SUCCESS but the state is torn")
          } else if (p.checkMid) {
            val mid = canon(p.observe(r))
            quiesceAndDisarm()
            assert(mid == pre || mid == expected || extraLegal.contains(mid),
              s"${p.name}: $at — read-after-crash is a TORN state:\n" +
                s"  got:  $mid\n  pre:  $pre\n  post: $expected")
          } else quiesceAndDisarm()
          retryTyped(4)(p.recover(r))
          assert(canon(p.observe(r)) == expected,
            s"${p.name}: $at — recovery did not converge")
          if (p.erasedPayloads.nonEmpty) {
            p.finalVacuum(r)
            val leaked = filesHolding(r, p.erasedPayloads)
            assert(leaked.isEmpty,
              s"${p.name}: $at — erased subject bytes survived recovery + " +
                s"full vacuum in:\n  ${leaked.mkString("\n  ")}")
          }
        }
      } finally FaultClock.disarm()
    }
    info(s"${p.name}: ${ops.size} mutating ops, ${bySig.size} distinct steps, " +
      s"${points.size} points tested ($crashed crashed, $unfired unfired)")
    assert(crashed > 0, s"${p.name}: no crash point ever fired")
  }
}
