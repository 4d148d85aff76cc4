package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.PlanLint

/** The plan linter: clean plans report zeros, each antipattern is
  * caught by name, and assertScalable throws unless explicitly allowed.
  */
class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq((1L, "a"), (2L, "b")).toDF("k", "t")
  private def fact = spark.range(1000L).select(
    (col("id") % 2 + 1).as("k"), col("id").as("v"))

  test("clean broadcast-join plan reports zero hits and passes assertScalable") {
    val q = fact.join(broadcast(dim), Seq("k")).groupBy("t").count()
    assert(PlanLint.counts(q).forall(_._2 == 0L), PlanLint.counts(q))
    PlanLint.assertScalable(q) // must not throw
  }

  test("cartesian, nested-loop, and single-partition shapes are each caught") {
    val cart = fact.crossJoin(spark.range(10L).toDF("j"))
    assert(PlanLint.counts(cart)
      .exists(c => c._1 != "single_partition_exchange" && c._2 > 0),
      PlanLint.counts(cart))
    val bnlj = fact.join(dim.withColumnRenamed("k", "dk"),
      col("v") > col("dk"))
    assert(PlanLint.counts(bnlj)
      .find(_._1 == "broadcast_nested_loop").get._2 > 0)
    val globalWin = fact.withColumn("rk",
      row_number().over(Window.orderBy(col("v"))))
    assert(PlanLint.counts(globalWin)
      .find(_._1 == "single_partition_exchange").get._2 > 0)
    val e = intercept[IllegalArgumentException] {
      PlanLint.assertScalable(globalWin)
    }
    assert(e.getMessage.contains("single_partition_exchange"), e.getMessage)
    // explicit allow-list lets an intentional hit through
    PlanLint.assertScalable(globalWin, allow = Set("single_partition_exchange"))
  }

  test("report frame is fixed-shape per labeled query") {
    val rep = PlanLint.report(spark, Seq(
      "clean" -> fact.join(broadcast(dim), Seq("k")),
      "dirty" -> fact.crossJoin(spark.range(3L).toDF("j"))))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rep.length == 2 * PlanLint.RuleNames.length)
    assert(rep.filter(_._1 == "clean").forall(_._3 == 0L), rep.mkString(","))
    assert(rep.filter(_._1 == "dirty").map(_._3).sum > 0)
  }

  test("broadcast_of_generate: a broadcast whose subtree explodes is caught; pinned merge is clean") {
    // the q141 shape in miniature: an exploded relation joined back to a
    // fact — with a broadcast hint on the exploded side the rule fires
    val exploded = dim.select(col("k"),
      explode(split(lit("a b c d e f"), " ")).as("g"))
    val hit = fact.join(broadcast(exploded), Seq("k"))
    assert(PlanLint.counts(hit)
      .find(_._1 == "broadcast_of_generate").get._2 > 0,
      hit.queryExecution.executedPlan.toString)
    assert(PlanLint.overBudget("scratch_bog", hit)
      .exists(_._1 == "broadcast_of_generate"))
    // the FIX shape: pin sort-merge — no broadcast of the exploded side
    val pinned = fact.join(exploded.hint("merge"), Seq("k"))
    assert(PlanLint.counts(pinned)
      .find(_._1 == "broadcast_of_generate").get._2 == 0L,
      pinned.queryExecution.executedPlan.toString)
    // a broadcast with no Generate below stays clean under the new rule
    val plain = fact.join(broadcast(dim), Seq("k"))
    assert(PlanLint.counts(plain)
      .find(_._1 == "broadcast_of_generate").get._2 == 0L)
  }
}
