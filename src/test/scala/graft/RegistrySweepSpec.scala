package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanLint

/** The PLANLINT.md audit as an enforced gate: every registered query's
  * physical plan is linted against the adjudicated budget
  * ([[PlanLint.RegistryBudget]]) at sf0.001 — a NEW cartesian / BNLJ /
  * single-partition hit (or one above its cap) fails `sbt test` instead
  * of waiting for a human to re-read the doc next round.
  */
class RegistrySweepSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("whole-registry sweep: no plan exceeds its adjudicated lint budget") {
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    Queries.all.foreach { q =>
      try {
        val over = PlanLint.overBudget(q.name, q.fn(spark, sfDir))
        if (over.nonEmpty)
          failures += s"${q.name}: " + over.map { case (r, n, cap) =>
            s"$r=$n (cap $cap)" }.mkString(", ")
      } catch {
        case e: Exception =>
          failures += s"${q.name}: BUILD_FAILED " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty,
      "plan-lint regressions — fix the plan or, if the hit is one of " +
        "PLANLINT.md's justified classes, raise its RegistryBudget entry " +
        "with a justification:\n" + failures.mkString("\n"))
  }

  test("budget never lists a query the registry no longer has") {
    val names = Queries.all.map(_.name).toSet
    val stale = PlanLint.RegistryBudget.keySet.diff(names)
    assert(stale.isEmpty, s"stale budget adjudications: $stale")
  }

  test("an injected cartesian in a scratch query fails the budget check") {
    import spark.implicits._
    val scratch = spark.range(100L).toDF("a")
      .crossJoin(spark.range(100L).toDF("b"))
    val over = PlanLint.overBudget("scratch_cartesian", scratch)
    assert(over.nonEmpty && over.exists(o =>
      o._1 == "cartesian_product" || o._1 == "broadcast_nested_loop"), over)
    // and an unlisted query with a BNLJ fails too
    val bnlj = spark.range(100L).toDF("x")
      .join(Seq((1L, 2L)).toDF("lo", "hi"),
        col("x") >= col("lo") && col("x") <= col("hi"))
    assert(PlanLint.overBudget("scratch_band", bnlj)
      .exists(_._1 == "broadcast_nested_loop"))
  }
}
