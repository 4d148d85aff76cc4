package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = Queries.queries(name)(spark, sfDir).count()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
