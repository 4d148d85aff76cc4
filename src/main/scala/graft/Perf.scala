package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark entry point for plan iteration (not part of the
  * driver contract). Usage: runMain graft.Perf <sfDir> <what>
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "all"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PERF $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val docs = Tables.documents(spark, d)
    if (what == "all" || what == "shingles")
      time("shingles-only") {
        docs.select(operators.Dedup.shingles(col("text"), 3).as("sh"))
          .select(sum(size(col("sh")))).head().getLong(0)
      }
    if (what == "all" || what == "minhash")
      time("minhash-sig-only") {
        docs.select(graft.functions.HashFunctions.minhash(
          operators.Dedup.shingles(col("text"), 3), 32).as("sig"))
          .select(sum(size(col("sig")))).head().getLong(0)
      }
    if (what == "all" || what == "q21")
      time("q21-full")(operators.Dedup.minHashLsh(docs, "doc_id", "text",
        bands = 16, rowsPerBand = 2, minEstJaccard = 0.25).count())
    if (what == "all" || what == "q23")
      time("q23-full")(operators.Dedup.ngramJaccard(docs, "doc_id", "text",
        k = 3, threshold = 0.01).count())
    if (what == "q19") {
      val q = Queries.queries("q19_token_counts")
      time("docs-count-only")(docs.count())
      time("q19-run1")(q(spark, d).count())
      time("q19-run2")(q(spark, d).count())
      time("q19-bpe-only")(docs.select(
        regexp_count(col("text"), lit(operators.TextAnalysis.BpePattern)).as("n"))
        .agg(sum(col("n"))).head().getLong(0))
    }
    spark.stop()
  }
}
