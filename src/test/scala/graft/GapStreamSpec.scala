package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.GapStream
import graft.silver.Quality

/** Streaming gap monitor: fold-in-any-order ≡ batch audit, replay
  * no-op, run-sized state that SHRINKS when late arrivals plug holes.
  */
class GapStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ledger(rows: (String, Long)*) =
    rows.toSeq.toDF("k", "seq")

  test("out-of-order folds ≡ batch sequenceGaps over the accumulated ledger") {
    val st = tmpDir("gapstate") + "/s"
    val b1 = ledger(("a", 1L), ("a", 2L), ("b", 10L))
    val b2 = ledger(("a", 7L), ("b", 12L))          // out of order vs b3
    val b3 = ledger(("a", 4L), ("a", 5L), ("b", 11L))
    GapStream.foldBatch(spark, b1, st, Seq("k"), "seq", batchId = 0L)
    GapStream.foldBatch(spark, b2, st, Seq("k"), "seq", batchId = 1L)
    GapStream.foldBatch(spark, b3, st, Seq("k"), "seq", batchId = 2L)
    val stream = GapStream.readout(spark, st, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val batch = Quality.sequenceGaps(
        b1.unionByName(b2).unionByName(b3), Seq("k"), "seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(stream == batch, s"stream=$stream batch=$batch")
    assert(stream == Set(("a", 3L, 3L, 1L), ("a", 6L, 6L, 1L)), stream)
  }

  test("replayed batch is a no-op; duplicates never create ranges") {
    val st = tmpDir("gapstate") + "/s"
    val b1 = ledger(("a", 1L), ("a", 3L), ("a", 3L))
    GapStream.foldBatch(spark, b1, st, Seq("k"), "seq", batchId = 0L)
    val s1 = graft.gold.SnapshotStore.read(spark, st).collect().toSet
    GapStream.foldBatch(spark, b1, st, Seq("k"), "seq", batchId = 0L)
    assert(graft.gold.SnapshotStore.read(spark, st).collect().toSet == s1)
    assert(s1.size == 2) // runs [1,1] and [3,3]
  }

  test("state is run-sized and shrinks when a late arrival plugs the hole") {
    val st = tmpDir("gapstate") + "/s"
    GapStream.foldBatch(spark,
      ledger(("a", 1L), ("a", 2L), ("a", 4L), ("a", 5L), ("a", 7L)),
      st, Seq("k"), "seq", batchId = 0L)
    assert(graft.gold.SnapshotStore.read(spark, st).count() == 3) // 3 runs
    assert(GapStream.readout(spark, st, Seq("k")).count() == 2)
    // seq 3 and 6 arrive late → single run [1,7], zero gaps
    GapStream.foldBatch(spark, ledger(("a", 3L), ("a", 6L)),
      st, Seq("k"), "seq", batchId = 1L)
    val state = graft.gold.SnapshotStore.read(spark, st)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(state.toSeq == Seq(("a", 1L, 7L)), state.mkString(","))
    assert(GapStream.readout(spark, st, Seq("k")).isEmpty)
  }

  test("foreachBatch stream end to end: gaps match the delivered ledger") {
    val st = tmpDir("gapstate") + "/s"
    val ck = tmpDir("gapck")
    val ms = MemoryStream[(String, Long)](spark)
    val q = GapStream.gapStream(
      ms.toDF().toDF("k", "seq"), st, ck, Seq("k"), "seq",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    ms.addData(("a", 1L), ("a", 2L), ("a", 9L))
    q.processAllAvailable(); q.stop()
    val gaps = GapStream.readout(spark, st, Seq("k"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gaps.toSeq == Seq((3L, 8L, 6L)), gaps.mkString(","))
  }
}
