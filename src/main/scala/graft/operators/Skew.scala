package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (SURVEY.md §4; the reference's
  * per-account Kafka keying concentrates whales onto single partitions —
  * the classic banking skew).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * utilities cover the two cases AQE doesn't: broadcast-incompatible
  * dimension joins against a skewed fact, and single-key aggregation
  * hotspots.
  *
  * - `saltedJoin`: fact rows get a uniform salt in [0, n); the (small)
  *   build side is replicated n× with every salt value; the join key
  *   becomes (key, salt), spreading each hot key over n tasks.
  * - `saltedAggregate`: two-phase aggregation — partial aggregate on
  *   (key, salt), then final merge on key. Turns a single hot reducer
  *   into n partials + one tiny merge.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Equi-join `skewed ⋈ small` on `keys`, spreading each key over
    * `saltFactor` tasks. Join type inner or left (left preserves skewed
    * rows). The salt is derived from a uniform random draw seeded per row
    * by Spark — correctness does not depend on the salt value, only
    * distribution does.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType), "inner or left only")
    val salted = skewed.withColumn(SaltCol,
      (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn(SaltCol,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Two-phase sum/count aggregation over possibly-skewed `keys`:
    * partial on (keys, salt) then final on keys. `measures` maps output
    * column name → input column to sum. Also emits `n_rows`.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      measures: Map[String, Column],
                      saltFactor: Int): DataFrame = {
    val salted = df.withColumn(SaltCol, (rand(42) * saltFactor).cast("int"))
    val partialAggs = measures.toSeq.map { case (name, c) => sum(c).as(name) } :+
      count(lit(1)).as("n_rows")
    val partial = salted.groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = measures.keys.toSeq.map(n => sum(col(n)).as(n)) :+
      sum(col("n_rows")).as("n_rows")
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Key-skew report for a prospective join/aggregation key: the topK
    * heaviest values with row count, share of the table, and the ratio to
    * a perfectly uniform key (share × distinct-count) — the number that
    * says "this key is 40× hotter than uniform, salt it". The detect
    * stage that decides whether [[saltedJoin]]/[[saltedAggregate]] (or a
    * `maxBlock` cut) is needed BEFORE the shuffle stalls at 3 am.
    *
    * Shape: one map-side-combinable count agg (keys only shuffle), the
    * two scalar totals ride a 1-row broadcast, topK is a distributed
    * TakeOrdered. share and skew are divisions of exact integers —
    * correctly rounded, engine-exact.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__distinct"))
    counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("n"),
        (col("n").cast("double") / col("__total")).as("share"),
        (col("n").cast("double") * col("__distinct") / col("__total"))
          .as("skew_x"))
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(topK)
  }
}
