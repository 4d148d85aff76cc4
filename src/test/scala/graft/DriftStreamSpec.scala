package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.silver.Quality
import graft.streaming.DriftStream

/** Streaming PSI against a persisted reference histogram: folding
  * micro-batches must equal the batch recompute with the same frozen
  * edges, replays must be no-ops, and the readout must never scan the
  * reference corpus.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  // reference: two groups, values 0..99; current: group "a" drifts up
  // (clamps into the top bin), "b" stays put, "c" has no reference
  private def refDf() = (0 until 200).map(i =>
    (if (i % 2 == 0) "a" else "b", (i % 100).toDouble))
    .toDF("g", "value")

  private def curBatches(): Seq[DataFrame] = Seq(
    (0 until 60).map(i => ("a", 80.0 + (i % 60))).toDF("g", "value"),
    (0 until 50).map(i => ("b", (i % 100).toDouble)).toDF("g", "value"),
    (0 until 30).map(i => ("c", 5.0 + i)).toDF("g", "value")
  )

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit =
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"$what differs:\ninc:\n${a.collect().mkString("\n")}\n" +
        s"batch:\n${b.collect().mkString("\n")}")

  test("3 folded batches equal the batch recompute; replay is a no-op") {
    val root = tmpDir("drift-fold")
    val (refPath, statePath) = (s"$root/ref", s"$root/state")
    DriftStream.publishReference(refDf(), refPath, "value", "g")
    val batches = curBatches()
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftStream.foldBatch(spark, b, refPath, statePath, "value", "g",
        batchId = i.toLong)
    }
    val inc = DriftStream.readout(spark, refPath, statePath, "g")
    val batch = Quality.psiAgainstReference(refDf(),
      batches.reduce(_.unionByName(_)), "value", "g")
    assertSame(inc, batch, "psi readout")
    // the SAME persisted state serves the binned-KS alarm
    assertSame(DriftStream.ksReadout(spark, refPath, statePath, "g"),
      Quality.ksAgainstReference(refDf(), batches.reduce(_.unionByName(_)),
        "value", "g"),
      "ks readout")
    // group with no reference is absent; drifted group carries the mass
    val byG = inc.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(!byG.contains("c"), "no-reference group must be dropped")
    assert(byG("a") > byG("b"),
      s"drifted group must out-score the stable one: $byG")
    // replay of batch 1: generation ledger says already folded
    DriftStream.foldBatch(spark, batches(1), refPath, statePath, "value", "g",
      batchId = 1L)
    assertSame(DriftStream.readout(spark, refPath, statePath, "g"), batch,
      "psi readout after replay")
  }

  test("categorical TVD: folded batches equal the batch recompute, new category carries its share") {
    val root = tmpDir("drift-cat")
    val (refPath, statePath) = (s"$root/ref", s"$root/state")
    // reference mix: g1 = {x: 60, y: 40}; g2 = {x: 50, y: 50}
    val ref = ((1 to 60).map(_ => ("g1", "x")) ++ (1 to 40).map(_ => ("g1", "y")) ++
      (1 to 50).map(_ => ("g2", "x")) ++ (1 to 50).map(_ => ("g2", "y")))
      .toDF("g", "c")
    DriftStream.publishCatReference(ref, refPath, "c", "g")
    // current: g1 ships a NEW category z; g2 keeps its mix exactly
    val batches = Seq(
      ((1 to 30).map(_ => ("g1", "x")) ++ (1 to 10).map(_ => ("g2", "x"))).toDF("g", "c"),
      ((1 to 20).map(_ => ("g1", "z")) ++ (1 to 10).map(_ => ("g2", "y"))).toDF("g", "c"))
    batches.zipWithIndex.foreach { case (b, i) =>
      DriftStream.foldCatBatch(spark, b, statePath, "c", "g", i.toLong)
    }
    val inc = DriftStream.tvdReadout(spark, refPath, statePath, "c", "g")
    assertSame(inc,
      Quality.tvdAgainstReference(ref, batches.reduce(_.unionByName(_)), "c", "g"),
      "tvd readout")
    val byG = inc.collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // g1: ref (.6,.4,0) vs cur (.6,0,.4) -> TVD = .4; g2: identical mix -> 0
    assert(math.abs(byG("g1") - 0.4) < 1e-9, s"g1 tvd: ${byG("g1")}")
    assert(byG("g2") == 0.0, s"g2 tvd: ${byG("g2")}")
    // replay is a no-op
    DriftStream.foldCatBatch(spark, batches(1), statePath, "c", "g", 1L)
    assertSame(DriftStream.tvdReadout(spark, refPath, statePath, "c", "g"),
      inc, "tvd after replay")
  }

  test("foreachBatch stream lands the same PSI as direct folds") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("drift-stream")
    val (refPath, statePath) = (s"$root/ref", s"$root/state")
    DriftStream.publishReference(refDf(), refPath, "value", "g")
    val ms = MemoryStream[(String, Double)]
    val q = DriftStream.psiStream(ms.toDF().toDF("g", "value"), refPath,
      statePath, tmpDir("drift-ckpt"), "value", "g",
      trigger = Trigger.ProcessingTime(0))
    curBatches().foreach { b =>
      ms.addData(b.as[(String, Double)].collect().toSeq)
      q.processAllAvailable()
    }
    q.stop()
    assertSame(DriftStream.readout(spark, refPath, statePath, "g"),
      Quality.psiAgainstReference(refDf(),
        curBatches().reduce(_.unionByName(_)), "value", "g"),
      "streamed psi readout")
  }
}
