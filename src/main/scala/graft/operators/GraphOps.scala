package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the iterative-plan family beside
  * [[Dedup.resolveClusters]] (components): here, influence/centrality.
  *
  * The reference has no graph tier; this serves the training-data use it
  * enables — on the near-dup candidate graph, high-centrality nodes are
  * boilerplate hubs (one template near-duplicating hundreds of pages),
  * the thing to inspect (or drop whole) before per-pair dedup spends its
  * budget there.
  */
object GraphOps {

  /** Fixed-iteration PageRank in integer micro-units — deterministic and
    * engine-exact by construction: rank starts at 1_000_000 (1.0), each
    * round a node emits `p DIV out_degree` along every out-edge (integer
    * floor division) and collects
    * `150_000 + (damp · inflow) DIV 100` — no float sum whose order
    * could differ between engines or between task schedules. Dangling
    * mass is NOT redistributed (the variant every fixed-point SQL
    * formulation uses); ranks are comparable, not normalized to 1.
    *
    * Fixed iterations (not convergence) keep the result a pure function
    * of (edges, iters) — replayable, and expressible as `iters` chained
    * CTEs in any SQL engine for cross-checking. 3–5 iterations already
    * separate hubs from leaves, which is all the boilerplate screen
    * needs.
    *
    * Scale shape: per iteration ONE edge-key join (edges ⋈ ranks, both
    * partitioned by src) and ONE hash aggregation on dst — the textbook
    * message-passing round; the rank frame is node-sized, degrees are
    * computed once. Plans stay shallow (the loop builds `iters` joins,
    * bounded by the parameter, so no checkpointing is needed at small
    * fixed depths).
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 3, dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 10,
      s"iters must be in [1,10] (fixed-depth plan), got $iters")
    require(dampPct >= 1 && dampPct <= 99, s"dampPct must be in [1,99], got $dampPct")
    val base = (1000000L * (100 - dampPct)) / 100  // 150_000 at damp 85
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    var p = nodes.withColumn("p", lit(1000000L))
    for (_ <- 1 to iters) {
      val inflow = e.join(deg, Seq("src"))
        .join(p.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id"), expr("p DIV deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      p = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampPct * coalesce(__in, 0L)) DIV 100"))
            .as("p"))
    }
    p
  }
}
