package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Scale-antipattern linter over PHYSICAL plans — the PlanSpec guard
  * rails, packaged as a runtime guardrail a pipeline can enforce on its
  * own queries before launching them against 100 TB:
  *
  *  - `cartesian_product` — quadratic, unrunnable at scale;
  *  - `broadcast_nested_loop` — the planner's fallback when a join has
  *    no equi key (what [[RangeJoinRewrite]] exists to remove); fine
  *    for constant-sized sides, fatal for data-sized ones, so it is
  *    reported, not silently accepted;
  *  - `single_partition_exchange` — a global `Window.orderBy` or
  *    repartition(1) funneling the whole dataset through one task.
  *
  * Detection walks the executed-plan STRING rather than node classes:
  * AQE wraps subtrees in AdaptiveSparkPlan whose children change class
  * across Spark versions, while the rendered operator names are the
  * stable public surface (`explain` output) — and the same names appear
  * whether or not AQE has re-planned. Inspection only: no job runs.
  *
  * The rules are ADVISORY by design — a hit demands a justification,
  * not necessarily a fix. Two benign classes recur (see PLANLINT.md for
  * the full-registry audit): `single_partition_exchange` is also the
  * final stage of any global scalar aggregate (input = one partial row
  * per partition, not the dataset) and of windows over value-domain-
  * sized frames; `broadcast_nested_loop` is also how a
  * `crossJoin(broadcast(<1-row aggregate>))` plans. `assertScalable`'s
  * `allow` parameter is the mechanism for recording such justifications
  * in code.
  */
object PlanLint {

  val Rules: Seq[(String, String)] = Seq(
    ("cartesian_product", "CartesianProduct"),
    ("broadcast_nested_loop", "BroadcastNestedLoopJoin"),
    ("single_partition_exchange", "Exchange SinglePartition"))

  /** All rule names, string-matched AND tree-walked. */
  val RuleNames: Seq[String] = Rules.map(_._1) :+ "broadcast_of_generate"

  /** (rule, n_hits) for every rule — zeros included, so the report is
    * fixed-shape and a clean plan is visibly clean.
    */
  def counts(df: DataFrame): Seq[(String, Long)] = {
    val plan = df.queryExecution.executedPlan.toString
    Rules.map { case (rule, needle) =>
      rule -> plan.sliding(needle.length).count(_ == needle).toLong
    } :+ ("broadcast_of_generate" -> broadcastOfGenerate(df))
  }

  /** The q141 scale-cliff class, as a rule: a broadcast join whose
    * build side contains a Generate (explode/posexplode) reachable
    * WITHOUT crossing an aggregation or limit. Size estimation through
    * Generate is structurally blind — Catalyst propagates the CHILD's
    * row count through an operator that multiplies rows by array
    * length — so an exploded relation that scales with the corpus can
    * look "small enough to broadcast" at plan time (measured live: a
    * 4.2× wall-clock cliff at sf1 when the exploded (gram, position)
    * prefix relation got shipped; fatal at 100 TB). A hit demands
    * either a pinned shuffle strategy (`.hint("merge")` /
    * `.hint("shuffle_hash")` — the Linkage.scala:181 fix) or a
    * RegistryBudget adjudication that the exploded side is parameter-
    * sized by construction (literal percentile/bin/salt/date spines),
    * never corpus-sized.
    *
    * The walk STOPS at aggregates and limits: a groupBy collapses the
    * explosion and re-grounds cardinality at the group count behind a
    * real shuffle whose bytes AQE measures directly — a broadcast of an
    * aggregated candidate/stats frame is a size question (the existing
    * maxBucket/Σdf² operator caps), not the structural stats-blindness
    * this rule exists for. Tree-walked, not string-matched: containment
    * and path conditions aren't expressible on the flat render.
    */
  def broadcastOfGenerate(df: DataFrame): Long = {
    import org.apache.spark.sql.catalyst.optimizer.BuildLeft
    import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
    // detection anchors on the broadcast JOIN's build side, not the
    // BroadcastExchange node: under AQE the lint runs on the pre-
    // EnsureRequirements inputPlan, where the join is already elected
    // but the exchange not yet inserted
    def walk(p: SparkPlan): Iterator[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
      case r: ReusedExchangeExec => Iterator(r) ++ walk(r.child)
      case other => Iterator(other) ++ other.children.iterator.flatMap(walk)
    }
    def unAggGenerate(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => unAggGenerate(a.inputPlan)
      case r: ReusedExchangeExec => unAggGenerate(r.child)
      case _: GenerateExec => true
      case _: BaseAggregateExec => false
      case l if l.nodeName.contains("Limit") => false
      case other => other.children.exists(unAggGenerate)
    }
    walk(df.queryExecution.executedPlan).count {
      case b: BroadcastHashJoinExec =>
        unAggGenerate(if (b.buildSide == BuildLeft) b.left else b.right)
      case b: BroadcastNestedLoopJoinExec =>
        unAggGenerate(if (b.buildSide == BuildLeft) b.left else b.right)
      case _ => false
    }.toLong
  }

  /** The report as a DataFrame: (query_label, rule, n_hits). */
  def report(spark: SparkSession,
             labeled: Seq[(String, DataFrame)]): DataFrame = {
    val rows = labeled.flatMap { case (label, df) =>
      counts(df).map { case (rule, n) => Row(label, rule, n) }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("query_label", StringType, nullable = false),
        StructField("rule", StringType, nullable = false),
        StructField("n_hits", LongType, nullable = false))))
  }

  /** Throw (listing every violated rule) unless the plan is clean;
    * `allow` whitelists rules whose hits are intentional — q219's
    * output-sized grid BNLJ, a 1-row × 1-row aggregate cross.
    */
  def assertScalable(df: DataFrame, allow: Set[String] = Set.empty): Unit = {
    val bad = counts(df).filter { case (rule, n) =>
      n > 0 && !allow.contains(rule) }
    require(bad.isEmpty,
      s"PlanLint: scale antipatterns in plan: ${bad.map { case (r, n) =>
        s"$r×$n" }.mkString(", ")} — fix the plan or allow() explicitly")
  }

  /** Hits exceeding a query's adjudicated budget: (rule, n_hits, cap).
    * Queries absent from the budget have cap 0 for every rule — any hit
    * on them is a regression.
    */
  def overBudget(name: String, df: DataFrame): Seq[(String, Long, Long)] = {
    val caps = RegistryBudget.getOrElse(name, Map.empty)
    counts(df).flatMap { case (rule, n) =>
      val cap = caps.getOrElse(rule, 0L)
      if (n > cap) Some((rule, n, cap)) else None
    }
  }

  /** Adjudicated allow-list for the whole query registry — the
    * PLANLINT.md audit AS CODE, enforced by RegistrySweepSpec so a new
    * cartesian/BNLJ/single-partition hit fails `sbt test` instead of
    * waiting for a human to re-read the doc. Every entry is one of the
    * four justified classes (see PLANLINT.md):
    *
    *  1. 1-row broadcast cross (`broadcast_nested_loop`):
    *     `crossJoin(broadcast(<one-row aggregate>))` — constant build
    *     side by construction (stats/extremes/totals folded map-side);
    *  2. global scalar aggregate final stage
    *     (`single_partition_exchange`): input is one PARTIAL row per
    *     partition, never the dataset;
    *  3. value-domain-sized window frames (`single_partition_exchange`):
    *     cumulative walks over (value)/(day) histograms, bounded by the
    *     metric domain;
    *  4. output-sized grid (q219's BNLJ): keys × broadcast day spine —
    *     exactly the emitted rows.
    *
    * Caps are MAXIMA from the adjudicated sf0.001 sweep; dropping below
    * budget is fine, exceeding it (or any hit on an unlisted query)
    * fails the sweep.
    */
  val RegistryBudget: Map[String, Map[String, Long]] = Map(
    "q09_dq_suite" -> Map("single_partition_exchange" -> 3L),
    "q102_chi2_tokens" -> Map("broadcast_nested_loop" -> 2L, "single_partition_exchange" -> 1L),
    "q105_js_divergence" -> Map("broadcast_nested_loop" -> 2L),
    // round 8: q106's oracle-visible conservation readout crosses two
    // 1-row aggregates (class 1) whose final stages are global scalar
    // aggs (class 2)
    "q106_tokenize_pack" -> Map("broadcast_nested_loop" -> 1L,
      "single_partition_exchange" -> 2L),
    "q111_ab_test" -> Map("broadcast_nested_loop" -> 1L),
    // round 12 (broadcast_of_generate adjudications — class 5, bounded
    // replication): q87's build side is the contract-small dim replicated
    // ×saltFactor by a LITERAL sequence explode — the deliberate skew
    // pattern, bounded by |dim|×salts, worst-case estimate error = the
    // salt factor itself; q219/q238 broadcast day spines exploded from
    // min/max date aggregates — bounded by the calendar domain, never
    // the corpus
    "q87_salted_join" -> Map("broadcast_of_generate" -> 1L),
    "q112_event_lift" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    // round 11: the oracle-visible invariant form composes the ANN
    // serve (query-batch×corpus cross + nCells-row centroid crosses,
    // classes 1/4) with q24's exact brute force AND three 1-row
    // summary crosses (class 1); the global scalar aggs are class 2
    // round 13: +8 BNLs from refineIters=2 — each Lloyd pass assigns the
    // corpus against a BROADCAST nCells-row (16) centroid frame, the
    // same class-4 bounded-replication cross as the serve path; the
    // refinement is what holds recall@5 ≥ 0.7 at sf0.1/sf1 (q115's own
    // hard law column), so the plan trade is deliberate
    "q115_ivf_pq_rerank" -> Map("broadcast_nested_loop" -> 16L,
      "single_partition_exchange" -> 3L),
    "q118_trim_outliers" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 2L),
    "q120_budget_select" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 2L),
    "q127_column_profile" -> Map("single_partition_exchange" -> 1L),
    "q138_skew_report" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q139_disposition_ledger" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q143_fk_inference" -> Map("single_partition_exchange" -> 4L),
    "q149_pruning_stats" -> Map("single_partition_exchange" -> 2L),
    "q150_surrogate_keys" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q15_zscore_anomaly" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q166_mutual_info" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 2L),
    "q171_woe_bins" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 2L),
    "q174_user_growth" -> Map("single_partition_exchange" -> 1L),
    "q202_search_index" -> Map("broadcast_nested_loop" -> 1L),
    "q203_column_diff" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 2L),
    "q215_corr_matrix" -> Map("single_partition_exchange" -> 1L),
    "q219_locf" -> Map("broadcast_nested_loop" -> 1L,
      "broadcast_of_generate" -> 1L),
    "q225_quantile_normalize" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 3L),
    "q238_twab" -> Map("broadcast_nested_loop" -> 1L,
      "broadcast_of_generate" -> 1L),
    "q241_topk_others" -> Map("single_partition_exchange" -> 1L),
    "q24_cosine_topk" -> Map("broadcast_nested_loop" -> 1L),
    // round 8: post-erasure search shares q202's class-1 hit — the
    // 1-row corpus-stats broadcast cross every BM25 score rides
    "q246_index_erasure" -> Map("broadcast_nested_loop" -> 1L),
    // round 8: the incremental IVF serve routes queries via the
    // parameter-sized (nCells-row) centroid broadcast cross (class 1 —
    // q29's exact shape over persisted state)
    "q244_vector_index" -> Map("broadcast_nested_loop" -> 1L),
    // round 9: the refreshed-index serve is q244's exact plan shape over
    // the gen-2 sub-index — same class-1 nCells-row centroid broadcast
    "q250_vector_index_refresh" -> Map("broadcast_nested_loop" -> 1L),
    // round 9: deferred-erasure search shares q202/q246's class-1 hit —
    // the 1-row corpus-stats broadcast cross
    "q251_deferred_erasure" -> Map("broadcast_nested_loop" -> 1L),
    // round 10: the TVF serve surfaces expand to the IDENTICAL plans as
    // their Scala forms — q259 carries q202's 1-row corpus-stats cross,
    // q261 carries q244's nCells-row centroid broadcast cross
    "q259_sql_tvf_search" -> Map("broadcast_nested_loop" -> 1L),
    // round 11: the SQL GDPR-path serve is q251/q259's exact shape —
    // the 1-row corpus-stats broadcast cross every BM25 score rides
    "q267_sql_erase_subjects" -> Map("broadcast_nested_loop" -> 1L),
    "q261_sql_tvf_vector" -> Map("broadcast_nested_loop" -> 1L),
    // round 11: q29's invariant form — same composition as q115 above
    "q29_ann_ivf" -> Map("broadcast_nested_loop" -> 8L,
      "single_partition_exchange" -> 3L),
    // round 11: q100's oracle-visible summary is one global scalar agg
    // over the segmented corpus (class 2)
    "q100_bpe_train" -> Map("single_partition_exchange" -> 1L),
    "q53_group_minhash" -> Map("broadcast_nested_loop" -> 1L),
    "q56_tfidf" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q58_bigram_nll" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q66_semdedup" -> Map("broadcast_nested_loop" -> 2L),
    "q67_importance_weights" -> Map("broadcast_nested_loop" -> 3L, "single_partition_exchange" -> 3L),
    "q71_collocations" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q75_bm25" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q78_zorder_key" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q81_temperature_sample" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q82_assembly_v2" -> Map("broadcast_nested_loop" -> 1L, "single_partition_exchange" -> 1L),
    "q85_semantic_decontam" -> Map("broadcast_nested_loop" -> 1L),
    "q86_hybrid_rrf" -> Map("broadcast_nested_loop" -> 2L, "single_partition_exchange" -> 2L),
    "q91_gramian" -> Map("single_partition_exchange" -> 1L),
    "q92_hard_negatives" -> Map("broadcast_nested_loop" -> 1L),
    "q97_pq_adc" -> Map("broadcast_nested_loop" -> 1L),
    "q99_tfidf_cosine" -> Map("broadcast_nested_loop" -> 4L, "single_partition_exchange" -> 4L))
}
