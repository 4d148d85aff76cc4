package graft

import org.apache.spark.sql.functions._
import graft.streaming.MomentsStream
import graft.silver.Quality

/** Streaming correlation monitor: folded moments read out EXACTLY the
  * batch matrix; replays are no-ops; null rows follow listwise deletion
  * per batch exactly as the batch form does globally.
  */
class MomentsStreamSpec extends SparkSpec {

  private def data = spark.range(9000L)
    .select(col("id"),
      (col("id") % 97L).cast("double").as("x"),
      ((col("id") % 97L) * 2).cast("double").as("y"),
      ((col("id") * 31L) % 113L).cast("double").as("z"))

  test("3-batch fold readout equals the batch corrMatrix bit-for-bit") {
    val st = tmpDir("moments") + "/s"
    val cols = Seq("x", "y", "z")
    (0 to 2).foreach(i => MomentsStream.foldBatch(spark,
      data.filter(pmod(col("id"), lit(3)) === i), st, cols, i.toLong))
    val stream = MomentsStream.readout(spark, st, cols)
    val batch = Quality.corrMatrix(data, cols)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      s"stream:\n${stream.collect().mkString("\n")}\n" +
        s"batch:\n${batch.collect().mkString("\n")}")
    val perfect = stream.collect()
      .find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    assert(perfect.getDouble(3) == 1.0)
  }

  test("replayed batch is a no-op") {
    val st = tmpDir("moments") + "/s"
    val cols = Seq("x", "y")
    MomentsStream.foldBatch(spark, data, st, cols, 0L)
    val before = MomentsStream.readout(spark, st, cols).collect().toSeq
    MomentsStream.foldBatch(spark, data, st, cols, 0L)
    assert(MomentsStream.readout(spark, st, cols).collect().toSeq == before)
  }
}
