package graft

import org.apache.spark.sql.SparkSession

/** The mechanical scale adjudication (round-12 verdict #1): for the
  * pair-OUTPUT-bound operators, measure wall time AND output rows at two
  * scale factors and print the ratio table — so "the sf1 outlier is
  * output growth, not the engine" is a pinned measurement
  * (`time_ratio <= c * output_ratio`), not prose. Output: one JSON line
  * per query + a summary line; the committed table lives in SCALE.md.
  *
  * Usage: runMain graft.ScaleAudit <sfDirA> <sfDirB> [q1,q2,...]
  */
object ScaleAudit {

  /** Pair/output-bound registry queries whose result size scales with
    * the TRUE duplicate/similarity population, not the corpus.
    */
  val PairBound: Seq[String] = Seq(
    "q21_minhash_lsh", "q22_simhash", "q23_ngram_jaccard",
    "q99_tfidf_cosine", "q103_containment", "q108_cluster_split",
    "q125_minhash_probe", "q141_fuzzy_global", "q190_incremental_clusters",
    "q262_sql_tvf_clusters", "q264_cluster_erase", "q25_embedding_neardup")

  def main(args: Array[String]): Unit = {
    val (a, b) = (args(0), args(1))
    val names = args.drop(2).headOption
      .map(_.split(",").map(_.trim).toSeq).getOrElse(PairBound)
      .filter(SparkEntry.queries.contains)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def measure(name: String, dir: String): (Long, Double) = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        (n, (System.nanoTime() - t0) / 1e9)
      }
      (runs.last._1, runs.map(_._2).min) // rows identical; best-of-2 time
    }

    def ms(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    names.foreach { name =>
      val (rowsA, secA) = measure(name, a)
      val (rowsB, secB) = measure(name, b)
      val outR = if (rowsA > 0) rowsB.toDouble / rowsA else Double.NaN
      val timeR = if (secA > 0) secB / secA else Double.NaN
      println(s"""{"query":"$name","rows_a":$rowsA,"rows_b":$rowsB,""" +
        s""""sec_a":${ms(secA)},"sec_b":${ms(secB)},""" +
        s""""output_ratio":${ms(outR)},"time_ratio":${ms(timeR)}}""")
      System.out.flush()
    }
    spark.stop()
  }
}
