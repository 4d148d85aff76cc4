package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway optimization-round probe: times fuzzyPairsGlobal's internal
  * stages one by one with the noop sink (guide §1.4). Not part of the
  * driver contract.
  */
object ProbeQ141 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val q = 3; val maxDist = 1; val prefixLen = q * maxDist + 1
    val maxGramBucket = 4096
    val base = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("__id"), col("c_name").as("__s"))
    val grams = base.select(col("__id"),
        explode(expr(
          s"transform(sequence(0, greatest(length(__s) - $q, 0)), " +
          s"i -> struct(i AS pos, substring(__s, i + 1, $q) AS g))")).as("__e"))
      .select(col("__id"), col("__e.pos").as("__pos"), col("__e.g").as("__g"))
    t("1 grams")(grams)
    val gramDf = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    t("2 gramDf")(gramDf)
    val keptGrams = grams.join(gramDf.filter(col("__df") <= maxGramBucket),
      Seq("__g"))
    t("3 keptGrams")(keptGrams)
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__df").asc, col("__g").asc, col("__pos").asc)
    val prefix = keptGrams
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") <= prefixLen)
      .select(col("__g"), col("__id").as("__pid"), col("__pos").as("__ppos"))
    t("4 prefix(window)")(prefix)
    val gramPairs = prefix
      .select(col("__g"), col("__pid"),
        explode(sequence(col("__ppos") - maxDist, col("__ppos") + maxDist))
          .as("__pos"))
      .hint("merge")
      .join(keptGrams.select(col("__g"), col("__id").as("__aid"), col("__pos")),
        Seq("__g", "__pos"))
      .filter(col("__pid") =!= col("__aid"))
      .select(least(col("__pid"), col("__aid")).as("id_a"),
        greatest(col("__pid"), col("__aid")).as("id_b"))
    t("5 gramPairs(join)")(gramPairs)
    val dist = gramPairs.distinct()
    t("6 distinct")(dist)
    val sa = base.select(col("__id").as("id_a"), col("__s").as("s_a"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("s_b"))
    val joined = dist.join(sa, "id_a").join(sb, "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
    t("7 joinback")(joined)
    val verified = joined
      .withColumn("dist", operators.Linkage.levWithin(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
    t("8 verify")(verified)
    println("pairs=" + verified.count())
    spark.stop()
  }
}

object ProbeQ141Counts {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = 3; val maxDist = 1; val prefixLen = q * maxDist + 1
    val maxGramBucket = 4096
    val base = spark.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey").as("__id"), col("c_name").as("__s"))
    val grams = base.select(col("__id"),
        explode(expr(
          s"transform(sequence(0, greatest(length(__s) - $q, 0)), " +
          s"i -> struct(i AS pos, substring(__s, i + 1, $q) AS g))")).as("__e"))
      .select(col("__id"), col("__e.pos").as("__pos"), col("__e.g").as("__g"))
    val gramDf = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val keptGrams = grams.join(gramDf.filter(col("__df") <= maxGramBucket),
      Seq("__g"))
    println("n_base=" + base.count())
    println("n_grams=" + grams.count())
    println("n_distinct_grams=" + gramDf.count())
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__df").asc, col("__g").asc, col("__pos").asc)
    val prefix = keptGrams
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") <= prefixLen)
      .select(col("__g"), col("__id").as("__pid"), col("__pos").as("__ppos"))
    val exploded = prefix
      .select(col("__g"), col("__pid"),
        explode(sequence(col("__ppos") - maxDist, col("__ppos") + maxDist))
          .as("__pos"))
    println("n_prefix_exploded=" + exploded.count())
    val gramPairs = exploded
      .hint("merge")
      .join(keptGrams.select(col("__g"), col("__id").as("__aid"), col("__pos")),
        Seq("__g", "__pos"))
      .filter(col("__pid") =!= col("__aid"))
    println("n_raw_pairs=" + gramPairs.count())
    println("n_distinct_pairs=" + gramPairs
      .select(least(col("__pid"), col("__aid")).as("id_a"),
        greatest(col("__pid"), col("__aid")).as("id_b")).distinct().count())
    spark.stop()
  }
}
