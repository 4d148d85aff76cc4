package graft

/** Plan-shape regression guards: the scale properties the operators rely on
  * (broadcast dims, pruned scans, pushed filters, no accidental cartesian
  * products) asserted against the optimized physical plans.
  */
class PlanSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    Queries.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("fact enrichment broadcasts the dimension side") {
    val p = plan("q03_fact_enrich")
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("star rollup uses broadcast joins, not cartesian products") {
    // q14 carries NO broadcast() hint (customer is unbounded at scale —
    // 15M rows at TPC-H sf100 would OOM the driver); the broadcast here is
    // the planner's own size-based choice, which flips to shuffle join
    // when the dim outgrows the threshold
    val p = plan("q14_star_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("scans are column-pruned and filters pushed to parquet") {
    val p = plan("q06_agg_pricing")
    // Q1-shape reads exactly the 5 needed columns
    val scanCols = ("FileScan parquet \\[([^\\]]*)\\]".r).findFirstMatchIn(p).get.group(1)
    assert(scanCols.split(",").map(_.takeWhile(_ != '#')).toSeq ==
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus"),
      scanCols)
    val topk = plan("q24_cosine_topk")
    assert(topk.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,20)]"), topk)
  }

  test("brute-force ANN broadcasts the query side, never shuffles the corpus for scoring") {
    val p = plan("q24_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the only exchange is the per-query top-k window partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("LSH dedup: band rows carry ids only, signatures join back per side") {
    val p = plan("q21_minhash_lsh")
    // the banding aggregate must NOT carry the 32-slot signature through
    // the bucket shuffle — that duplicates it bands× and OOMs at 10M docs
    // (Perf scalellm); instead candidates join the signature table back,
    // re-running the cheap codegen'd sketch per join side (3 scans)
    assert(!p.matches("(?s).*bounded_collect_list\\(struct\\([^)]*sig.*"), p)
    assert(p.contains("bounded_collect_list"), p)  // …and the guard IS in the plan
    // 3 LSH-side scans + 1 for the oracle-visible exact planted-pair
    // ground truth (round 11's invariant form)
    assert("Scan parquet".r.findAllIn(p).size == 4, p)
  }

  test("latest-wins dedup is a single shuffle on the key") {
    val p = plan("q01_dedup_latest")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("sampling is a map-only pruned scan (no shuffle, two columns read)") {
    val p = plan("q46_stratified_sample")
    assert(!p.contains("Exchange"), p)
    val scanCols = ("FileScan parquet \\[([^\\]]*)\\]".r).findFirstMatchIn(p).get.group(1)
    assert(scanCols.split(",").map(_.takeWhile(_ != '#')).toSeq == Seq("doc_id", "lang"),
      scanCols)
  }

  test("repetition metrics are two hash aggregations with map-side combine") {
    val p = plan("q47_repetition")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("int8 quantization is a shuffle-free map stage") {
    val p = plan("q50_embedding_quantize")
    assert(!p.contains("Exchange"), p)
  }

  test("sequence packing runs on ONE shuffle: shard partitioning feeds both the window and the summary") {
    val p = plan("q51_sequence_packing")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("enrich drops the broadcast hint when the dim's size estimate is large") {
    import org.apache.spark.sql.functions._
    val fact = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
    // 10M × 8B ≈ 80MB estimated — over the guard, must NOT force broadcast
    val bigDim = spark.range(10000000L).select(col("id").as("k"), col("id").as("d"))
    val p = graft.gold.Marts.enrich(fact, bigDim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"), p.take(800))
    // and a genuinely small dim still gets the hint
    val smallDim = spark.range(10).select(col("id").as("k"), col("id").as("d"))
    val ps = graft.gold.Marts.enrich(fact, smallDim, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(ps.contains("BroadcastHashJoin"), ps.take(800))
  }

  test("exact-dedup winner election shuffles (hash,id) only; rows semi-join back") {
    val docs = Tables.documents(spark, d)
    val p = graft.operators.Dedup.exactKeepFirst(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // winners = min(id) per content hash — no full-row min_by struct ever
    // rides the shuffle; full rows rejoin via a semi join on the id
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("min_by"), p)
    assert(p.contains("min(doc_id"), p)
  }

  test("MinHash-union aggregator gets partial (map-side) aggregation") {
    val p = plan("q53_group_minhash")
    // partial + final ObjectHashAggregate around the group exchange, and
    // the self-join of the tiny per-source frame broadcasts
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 4, p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("window-dup audit: hashed windows as keys, hash aggs only, pruned scans") {
    val p = plan("q59_window_dedup")
    // windows are hashed to 64 bits BEFORE any exchange — the window text
    // itself never rides a shuffle — and every aggregation is hash-based
    assert(p.contains("xxhash64"), p.take(800))
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
    val scans = "FileScan parquet \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(scans.nonEmpty &&
      scans.forall(_.split(",").map(_.takeWhile(_ != '#')).toSet ==
        Set("doc_id", "text")), scans.mkString("; "))
  }

  test("source-overlap matrix: postings join on shingle hashes, no cartesian") {
    val p = plan("q60_source_overlap")
    assert(p.contains("xxhash64"), p.take(800))
    assert(!p.contains("CartesianProduct"), p)
    val scans = "FileScan parquet \\[([^\\]]*)\\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(scans.nonEmpty &&
      scans.forall(_.split(",").map(_.takeWhile(_ != '#')).toSet ==
        Set("source", "text")), scans.mkString("; "))
  }

  test("cluster representatives: hash aggregations only — no sort agg, no window") {
    val docs = Tables.documents(spark, d)
    val clusters = spark.range(10)
      .selectExpr("id", "id % 3 as cluster_id").toDF("id", "cluster_id")
    val scored = docs.selectExpr("doc_id", "n_chars as score")
    val p = graft.operators.Dedup
      .clusterRepresentatives(clusters, scored, "doc_id", "score")
      .queryExecution.executedPlan.toString
    // a max_by(id, struct(score, -id)) single-agg form would sneak a
    // SortAggregate in (struct buffers aren't hash-aggregable) — the
    // two-phase election must keep every aggregate hash-based
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("bloom decontaminate probes map-side: the filter sits in the scan stage, under every exchange") {
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val here = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // pre-execution: the initial plan
        case other                    => other
      }
      here +: here.children.flatMap(walk)
    }
    val root = Queries.queries("q69_bloom_decontaminate")(spark, d)
      .queryExecution.executedPlan
    val all = walk(root)
    val probes = all.collect {
      case f: FilterExec
        if f.condition.find(_.isInstanceOf[graft.functions.BloomContains]).isDefined => f
    }
    assert(probes.nonEmpty, s"no Bloom probe filter in the plan:\n$root")
    // the whole point of the prefilter: clean postings die BEFORE the
    // shuffle, so no exchange may sit between the probe and its scan
    probes.foreach { f =>
      assert(!walk(f).tail.exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"Bloom probe has an exchange below it — it is not map-side:\n$f")
    }
  }

  test("vocabulary and collocations: hash aggs only, distributed top-k (no global sort)") {
    val v = plan("q70_vocab")
    assert(v.contains("TakeOrderedAndProject"), v)
    assert(v.contains("HashAggregate"), v)
    assert(!v.contains("SortAggregate"), v)
    val c = plan("q71_collocations")
    assert(c.contains("TakeOrderedAndProject"), c)
    assert(!c.contains("SortAggregate"), c)
    assert(!c.contains("CartesianProduct"), c)
  }

  test("sampleN pushes the rank cut into a per-partition group limit") {
    val p = plan("q72_sample_n")
    // WindowGroupLimit = map tasks keep at most n rows per stratum before
    // the shuffle; without it every row of a mega-stratum hits one reducer
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("prioritySampleN pushes the rank cut into a per-partition group limit") {
    val p = plan("q144_priority_sample_n")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("bm25 never explodes postings: no Generate, no hash-partitioned exchange") {
    val p = plan("q75_bm25")
    // term frequencies are in-scan array folds; the only aggregation is
    // the one-row corpus stats pass (SinglePartition + its broadcast) —
    // document text never rides a shuffle
    assert(!p.contains("Generate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("bucketed join + bucket-key aggregation run with ZERO exchanges") {
    val p = plan("q73_bucketed_join")
    // the layout's whole value: sort-merge join AND group-by on the
    // bucket key with no shuffle and no broadcast — the exchange was
    // paid once at write time
    assert(p.contains("SortMergeJoin"), p)
    assert(p.contains("Bucketed: true"), p)
    assert(!p.contains("Exchange"), p)
    // the sorts the planner keeps are within-partition, not global
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p)
  }

  test("semantic decontamination: anti broadcast-NLJ, corpus never shuffles") {
    val p = plan("q85_semantic_decontam")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight, LeftAnti"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hybrid RRF fusion runs on top-N frames: TakeOrdered, no global sort of the corpus") {
    val p = plan("q86_hybrid_rrf")
    assert(p.contains("TakeOrderedAndProject"), p)
    // every Sort the planner keeps is within-partition (the rank windows
    // over ≤ n rows and the join's local sorts), never a global range sort
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p)
  }

  test("range join plans as a PINNED shuffled equi-join on buckets, never a nested loop") {
    val p = plan("q90_range_join")
    // the whole point of the bucketization: the non-equi BETWEEN predicate
    // rides an equi-join instead of BNLJ/cartesian, which are quadratic at
    // 100 TB. Round 12: the bucket join is PINNED sort-merge — the
    // exploded interval side scales with the interval corpus and Generate
    // hides that from size estimation, so a broadcast election here is the
    // Linkage.scala:181 cliff class (flagged by PlanLint
    // broadcast_of_generate)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("interval-overlap join is also a pinned bucket equi-join, never a nested loop") {
    val p = plan("q96_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin"), p)
  }

  test("sessionize: the lag/flag/sum windows and the rollup share ONE key shuffle") {
    val p = plan("q93_sessionize")
    // everything partitions by user_id: the window chain and the final
    // (user_id, session_seq) hash agg reuse the same exchange — a second
    // hashpartitioning would mean the rollup re-shuffles the whole frame
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p) // no global sort
  }

  test("heavy hitters: the CMS probe filter sits under the aggregation exchange") {
    val p = Queries.queries("q94_heavy_hitters")(spark, d)
      .queryExecution.executedPlan
    def walk(x: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = x.children ++ (x match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case _ => Seq.empty
      })
      x +: kids.flatMap(walk)
    }
    // find the probe filter node; no Exchange may appear BELOW it — the
    // tail-token kill must happen map-side, inside the scan stage
    val nodes = walk(p)
    val probeFilters = nodes.collect {
      case f: org.apache.spark.sql.execution.FilterExec
        if f.condition.toString.contains("CountMinEstimate") ||
           f.condition.toString.contains("cmsCounts") ||
           f.condition.toString.toLowerCase.contains("countmin") => f
    }
    assert(probeFilters.nonEmpty,
      s"no CMS probe filter found in:\n${p.toString.take(2000)}")
    probeFilters.foreach { f =>
      val below = walk(f).drop(1)
      assert(!below.exists(_.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]),
        "CMS probe runs above an exchange — the prefilter lost its point")
    }
  }

  test("pq adc scoring: corpus never shuffles — broadcast LUTs, one window exchange") {
    val p = plan("q97_pq_adc")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    // the only hash exchange is the per-anchor top-k window partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("tfidf cosine: inverted-index hash joins only — no cartesian, no nested loop") {
    val p = plan("q99_tfidf_cosine")
    assert(!p.contains("CartesianProduct"), p)
    // the only NLJ shape is the 1-row corpus-count crossJoin, instantiated
    // once per reference of the weight frame (norms ×2 + both dot sides);
    // each is 1-row-broadcast × posting-frame, and the expensive posting
    // aggregation underneath dedupes via ReusedExchange at execution
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 4, p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("literal blocklist screen is a map-only scan (zero exchanges)") {
    val p = plan("q101_blocklist")
    assert(!p.contains("Exchange"), p)
  }

  test("chi-square tokens: distributed TakeOrdered, no global sort") {
    val p = plan("q102_chi2_tokens")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p)
  }

  test("priority sample: map + distributed TakeOrdered, zero exchanges, no global sort") {
    val p = plan("q132_priority_sample")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p)
  }

  test("jaro linkage: one block-key join per side, no BNLJ or cartesian") {
    val p = plan("q131_jaro_linkage")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("unblocked fuzzy join: gram equi-joins only, no BNLJ or cartesian") {
    val p = plan("q141_fuzzy_global")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("compression ratio rollup: one aggregation exchange, nothing else") {
    val p = plan("q104_compression_ratio")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Generate"), p) // per-doc kernel, no explode anywhere
  }

  test("join blocklist: phrase frames broadcast; corpus shuffles only for the final agg") {
    val p = plan("q107_blocklist_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("funnel: no windows, no global sort — filtered scans, key joins, min aggs only") {
    val p = plan("q109_funnel")
    assert(!p.contains("Window"), p)
    assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("retention cohorts and event lift: hash joins and aggs, nothing quadratic") {
    Seq("q110_retention_cohorts", "q112_event_lift").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.matches("(?s).*Sort \\[[^\\]]*\\], true,.*"), s"$q: $p")
    }
  }

  test("composed IVF+PQ: all scoring joins broadcast, corpus never shuffles for scoring") {
    val p = plan("q115_ivf_pq_rerank")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // cell routing + ADC LUT join + shortlist re-rank all ride broadcasts
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("fuzzy linkage: maxBlock semi-join prune below the self-join, nothing quadratic") {
    val p = plan("q79_fuzzy_pairs")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the block-size df-cut must reach the plan as a semi-join against the
    // surviving block keys — that is what bounds Σ|block|² by construction
    assert(p.contains("LeftSemi"), p)
    // the banded verify runs as the native codegen'd expression, not a UDF
    assert(p.toLowerCase.contains("levwithin"), p)
  }

  test("retention curve: one aggregation pass, grid unpivot above it") {
    val p = plan("q98_retention_curve")
    // one exchange for the group-by; the explode (Generate) must sit ABOVE
    // the aggregation — a corpus-side explode would multiply the scan by
    // the grid size
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    val genIdx = p.indexOf("Generate")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(genIdx >= 0 && aggIdx > genIdx,
      s"explode should be above the final aggregate (gen=$genIdx agg=$aggIdx)")
  }

  test("compaction plan is one partition-key exchange, no global sort") {
    val p = plan("q145_compaction_plan")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("rank agreement reuses one group-key exchange across all windows and the agg") {
    val p = plan("q146_score_agreement")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("k-anonymity is a single quasi-identifier exchange; the hash is map-side") {
    val p = plan("q147_k_anonymity")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("gini and daily trend stay on two keyed exchanges, never a single partition") {
    for (q <- Seq("q151_gini", "q152_daily_trend")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, s"$q\n$p")
      assert(!p.contains("Exchange SinglePartition"), q)
      assert(!p.contains("Exchange rangepartitioning"), q)
    }
  }

  test("surrogate assignment: precomputed rank scan, 1-row broadcast for the max") {
    // the anti-join + range shuffle live inside the single-evaluation
    // zipWithIndex RDD (one shared shuffle, so counts and numbering
    // cannot diverge); the visible plan is the rank scan + broadcast max
    val p = plan("q150_surrogate_keys")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // no window rank anywhere (the only SinglePartition exchange allowed
    // is the 1-row max(sk) global aggregate)
    assert(!p.contains("Window"), p)
  }

  test("drift stats ride histogram shapes: keyed exchanges, no single partition") {
    for (q <- Seq("q159_ks_drift", "q160_psi_drift")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), q)
      assert(!p.contains("BroadcastNestedLoopJoin"), q)
    }
  }

  test("ngram novelty: hash-keyed anti-join, no cartesian") {
    val p = plan("q161_ngram_novelty")
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("per-group top-k pushes the rank filter into WindowGroupLimit") {
    val p = plan("q167_topk_per_group")
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("surrogate bootstrap: no window rank, dense 1..N numbering in key order") {
    // empty dimension, every key new — the worst case for the old
    // single-partition Window.orderBy rank. The rank now rides a
    // range-partitioned sort consumed once via zipWithIndex, so the
    // plan must carry NO window (global or otherwise) and no
    // single-partition exchange; correctness of the numbering is the
    // behavioral pin (dense 1..N in business-key order).
    val c = spark.read.parquet(s"$d/customer.parquet").select("c_custkey")
    val existing = c.filter(org.apache.spark.sql.functions.lit(false))
      .withColumn("sk", org.apache.spark.sql.functions.lit(0L))
    val out = graft.gold.Marts.assignSurrogates(existing, c, "c_custkey")
    val p = out.queryExecution.executedPlan.toString
    // no window rank anywhere; the only SinglePartition exchange is the
    // 1-row max(sk) global aggregate feeding the broadcast
    assert(!p.contains("Window"), p)
    val rows = out.orderBy("c_custkey").collect()
    val keys = rows.map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "output keys not in key order")
    val sks = rows.map(_.getLong(1)).toSeq
    assert(sks == (1L to rows.length.toLong),
      "bootstrap numbering is not dense 1..N in key order")
  }
}
