package graft

import org.apache.spark.sql.functions._
import graft.functions.{SeedFunctions, VectorFunctions}

/** The SeedSet probe expressions must be BIT-IDENTICAL to the
  * expression-chain forms they replaced — the elections' determinism
  * (and the spec'd recall baselines) ride on it.
  */
class SeedFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int) = spark.range(n).select(col("id"),
    array((0 until dim).map(d =>
      (pmod(xxhash64(col("id"), lit(d)), lit(1000L)).cast("double") / 500.0
        - 1.0).cast("float")): _*).as("vec"))

  private val seeds: Array[Array[Float]] =
    (0 until 37).map(j => Array.tabulate(8)(d =>
      ((j * 31 + d * 7) % 13 - 6).toFloat)).toArray

  test("nearestSeedDist == least(1 - cosine(v, seed_j)) bit-for-bit") {
    val v = vecs(2000, 8)
    val chain = seeds.map(s => lit(1.0) -
      VectorFunctions.cosine(col("vec"), typedLit(s.toSeq))).reduce(least(_, _))
    val diff = v.select(
        SeedFunctions.nearestSeedDist(col("vec"), seeds).as("a"),
        chain.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("nearestSeedIdx == argmax-cosine with lowest-index ties") {
    val v = vecs(2000, 8)
    // oracle via explode + window (the assignCells shape)
    val seedDf = seeds.zipWithIndex.map { case (s, i) => (i, s.toSeq) }
      .toSeq.toDF("sid", "seed")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("cos").desc, col("sid").asc)
    val oracle = v.crossJoin(broadcast(seedDf))
      .withColumn("cos", VectorFunctions.cosine(col("vec"),
        col("seed").cast("array<float>")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("sid"))
    val got = v.select(col("id"),
      SeedFunctions.nearestSeedIdx(col("vec"), seeds).as("sid2"))
    assert(got.join(oracle, Seq("id"))
      .filter(col("sid") =!= col("sid2")).count() == 0L)
  }

  test("edge cases: zero-norm vector, dim mismatch, zero-norm seed skipped") {
    val z = Seq((1L, Array(0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Array(1f, 2f))).toDF("id", "vec")
    val got = z.select(col("id"),
      SeedFunctions.nearestSeedIdx(col("vec"), seeds).as("i"),
      SeedFunctions.nearestSeedDist(col("vec"), seeds).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((-1, 1.0)))  // zero norm: unattributable
    assert(got(2L) == ((-1, 1.0)))  // dim mismatch
    val withZeroSeed = seeds :+ Array.fill(8)(0f)
    val v = vecs(100, 8)
    val agree = v.select(
        SeedFunctions.nearestSeedIdx(col("vec"), seeds).as("a"),
        SeedFunctions.nearestSeedIdx(col("vec"), withZeroSeed).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(agree == 0L)  // a zero-norm seed never wins
  }
}
