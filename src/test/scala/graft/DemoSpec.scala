package graft

import org.apache.spark.sql.functions._

/** CI-shape exercise of the runnable end-to-end demo (SURVEY.md §7.6):
  * `Demo.run` is the same code `sbt "runMain graft.Demo"` executes — the
  * spec pins the cross-epoch restart semantics the demo exists to show.
  */
class DemoSpec extends SparkSpec {

  test("Demo.run: restartable medallion flow accrues bronze, merged gold, SCD2 history") {
    val r = Demo.run(spark, tmpDir("demo"))

    // Bronze is the immutable log: 7 clean envelopes (the replay lands —
    // raw keeps everything), the corrupt line quarantined out
    assert(r.bronze.count() == 7)
    assert(r.bronze.select("ingest_date").distinct().count() == 2)

    // current state: replay collapsed, id 1 updated across the restart,
    // id 3 tombstoned away, id 4 created in epoch 2
    val current = r.current.collect()
      .map(row => row.getAs[Int]("id") -> row.getAs[Double]("balance")).toMap
    assert(current == Map(1 -> 999.0, 2 -> 50.0, 4 -> 25.0))

    // SCD2: id 1 has a closed 100.0 version and a current 999.0 version;
    // everything else one current row each
    val hist = r.history
    assert(hist.count() == 5)
    val id1 = hist.filter(col("id") === 1).collect()
    assert(id1.length == 2)
    val closed = id1.find(_.getAs[java.sql.Timestamp]("effective_to") != null).get
    assert(closed.getAs[Double]("balance") == 100.0)
    val open = id1.find(_.getAs[java.sql.Timestamp]("effective_to") == null).get
    assert(open.getAs[Double]("balance") == 999.0)
    assert(hist.filter(col("effective_to").isNull).count() == 4)
  }
}
