package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job time attribution inside a query — optimization-round measurement
  * tool (not part of the driver contract). A query like q268 runs dozens of
  * Spark actions (fixture copies, sweeps, materializations, pane counts);
  * the bench only reports the total. This main runs each named query under a
  * SparkListener and prints, per query, total wall time plus per-job wall time
  * keyed by the action's call site — which line of which operator paid.
  *
  * Usage: runMain graft.Prof <sfDir> <q1,q2,...> [runs]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (callSite, startedNs) per jobId; finished jobs accumulate into rows
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        starts.put(js.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) rows.add((s._1, (System.nanoTime() - s._2) / 1e9))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // same warmup as Bench so first-run init doesn't pollute attribution
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.count()
      } catch { case _: Throwable => }
    }

    val qmap = Queries.queries
    names.foreach { name =>
      (1 to runs).foreach { r =>
        rows.clear()
        val t0 = System.nanoTime()
        val n = try qmap(name)(spark, sfDir).count()
                catch { case e: Throwable =>
                  println(s"!! $name failed: ${e.getMessage}"); -1L }
        val total = (System.nanoTime() - t0) / 1e9
        // drain any async listener stragglers
        Thread.sleep(200)
        import scala.jdk.CollectionConverters._
        val bySite = rows.asScala.toSeq.groupBy(_._1)
          .map { case (k, v) => (k, v.map(_._2).sum, v.size) }
          .toSeq.sortBy(-_._2)
        val jobSum = bySite.map(_._2).sum
        println(f"\n### $name run$r total=$total%.2f s rows=$n jobs_sum=$jobSum%.2f s gap=${total - jobSum}%.2f s")
        bySite.take(30).foreach { case (site, t, c) =>
          println(f"  $t%8.3f s  x$c%-4d $site")
        }
      }
    }
    spark.stop()
  }
}
