package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Record linkage: blocked fuzzy self-join on string similarity — the
  * entity-resolution primitive (near-identical customer names, merged
  * account records, vendor dedup).
  *
  * The all-pairs edit-distance join is O(n²·len²) and never viable at
  * scale; the standard shape is block-then-verify: candidates are
  * generated only WITHIN user-chosen blocks (a region, a zip prefix, a
  * phonetic key), then verified with the exact distance. Blocking is
  * part of the operator's CONTRACT, not a silent approximation — pairs
  * across blocks are out of scope by definition, which is what makes
  * the result oracle-checkable.
  *
  * Scale shape: one shuffle on the block key; within each block the
  * pair space is pruned by the length-difference bound (|len(a)−len(b)|
  * > maxDist ⇒ levenshtein > maxDist — a proven lossless filter) BEFORE
  * any distance is computed, and the O(len²) verify runs only on
  * survivors. Block granularity is the user's skew lever: pair cost is
  * Σ|block|², so blocks should be chosen ~thousands of rows, the same
  * sizing discipline as [[Dedup]]'s LSH buckets — and, exactly like
  * those buckets, blocks larger than `maxBlock` are dropped WHOLE
  * (document-frequency prune): a block the size of a whole region
  * carries no linkage signal, only quadratic pair cost. The drop is
  * observable via the `audit` hook (`dropped_blocks`/`total_blocks`),
  * so a mis-sized block key fails loudly in monitoring rather than
  * silently stalling the cluster.
  */
object Linkage {

  /** Default block-size cut. Blocks are USER-CHOSEN keys sized
    * ~thousands (unlike [[Dedup.DefaultMaxBucket]]'s feature buckets at
    * 256), so the default admits well-sized blocks and only cuts the
    * pathological tail: 4096² / 2 ≈ 8.4M pairs is the most one surviving
    * block may fan out — bounded work per block, no matter how skewed
    * the key. The pre-join size scan shuffles block KEYS only (map-side
    * combined counts), never rows.
    */
  val DefaultMaxBlock: Int = 4096

  /** All within-block pairs (id_a < id_b) whose `strCol` values are
    * within `maxDist` Levenshtein edits. Blocks with more than
    * `maxBlock` members are dropped whole (see object scaladoc); below
    * the cap the result is identical to the uncapped join.
    *
    * Audit caveat: when EVERY block is dropped or singleton, AQE's
    * empty-relation propagation can collapse the plan before the
    * CollectMetrics node reports, so the Observation reads as an empty
    * map — treat "result empty + audit empty" as the all-dropped signal
    * (the mixed case always reports real counts; OperatorsSpec pins it).
    */
  def fuzzyPairsBlocked(df: DataFrame, idCol: String, strCol: String,
                        blockCols: Seq[String], maxDist: Int,
                        maxBlock: Int = DefaultMaxBlock,
                        audit: Option[Observation] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    blockedCandidates(df, idCol, strCol, blockCols, maxBlock, audit)
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      // thresholded (banded) Levenshtein with common-affix stripping:
      // O(stripped·maxDist) per pair, -1 as soon as the band exceeds the
      // bound. The verify is the hot loop of the whole operator — real
      // linkage keys (entity names, URLs, SKUs) share long literal
      // prefixes, and edits to a shared affix contribute nothing to the
      // distance, so stripping first shrinks the DP to the part that can
      // actually differ (3.6× on the TPC-H name corpus, see q79)
      .withColumn("dist", levWithin(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** All within-block pairs (id_a < id_b) with Jaro-Winkler similarity
    * ≥ `minSim` — the scoring linkage companion to [[fuzzyPairsBlocked]]:
    * Levenshtein counts edits (good for typo bounds), Jaro-Winkler
    * rewards shared prefixes and tolerates transpositions (the classic
    * person/entity-name matcher). Same blocked + capped candidate shape;
    * the per-pair prefilter here is a LENGTH-RATIO prune: m ≤ min(|a|,|b|)
    * bounds jaro ≤ (2 + min/max)/3, and the Winkler bonus lifts that by at
    * most 0.4·(1−jaro), so jw ≤ 0.6·(2+r)/3 + 0.4 with r = min/max —
    * pairs whose ratio bound already misses `minSim` never reach the
    * O(|a|·|b|) match scan. Lossless, like the length-difference bound on
    * the Levenshtein path.
    *
    * Output `jw` is rounded to 6 decimals and the threshold compares the
    * ROUNDED value, so accept/reject decisions are reproducible across
    * engines (the kernel itself matches DuckDB's `jaro_winkler_similarity`
    * — same matching window, transposition count, 0.7 boost threshold,
    * 4-char/0.1 prefix bonus; spec-pinned on the textbook vectors).
    */
  def fuzzyPairsJaro(df: DataFrame, idCol: String, strCol: String,
                     blockCols: Seq[String], minSim: Double,
                     maxBlock: Int = DefaultMaxBlock,
                     audit: Option[Observation] = None): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0,
      s"minSim must be in (0, 1], got $minSim")
    val lenA = length(col("s_a")).cast("double")
    val lenB = length(col("s_b")).cast("double")
    val ratio = least(lenA, lenB) / greatest(lenA, lenB)
    val jwUpper = lit(0.6) * (lit(2.0) + ratio) / lit(3.0) + lit(0.4)
    blockedCandidates(df, idCol, strCol, blockCols, maxBlock, audit)
      .filter(jwUpper >= minSim - 1e-9)
      .withColumn("jw", round(jaroWinkler(col("s_a"), col("s_b")), 6))
      .filter(col("jw") >= minSim)
      .select(col("id_a"), col("id_b"), col("jw"))
  }

  /** UNBLOCKED edit-distance self-join: all pairs (id_a < id_b) with
    * `levenshtein ≤ maxDist`, NO user block key — the EDJoin-family shape
    * (Xiao et al., VLDB'08) for when no natural blocking key exists.
    * Never all-pairs:
    *
    *  1. positional q-grams per string (one gram at pos 0 for strings
    *     shorter than q);
    *  2. global document frequency per gram (one keys-only agg);
    *  3. each string keeps its `q·maxDist + 1` RAREST grams as its prefix
    *     (global (df, gram, pos) order). ≤ maxDist edits destroy at most
    *     q·maxDist grams, so at least one prefix gram of a SURVIVES
    *     (shifted ≤ maxDist positions) in any b within the distance —
    *     joining prefix-side grams against all-side grams with
    *     |Δpos| ≤ maxDist therefore generates every qualifying pair;
    *  4. survivors verify with the banded [[levWithin]].
    *
    * Rare-first prefixes are what tame template corpora: shared
    * boilerplate ("Customer#0…") has huge df and never enters a prefix,
    * so join buckets stay rare-gram-sized. The backstop for corpora where
    * even the rarest grams are hot is `maxGramBucket`: grams above it are
    * excluded from the join WHOLE — that (unlike every other cut here) can
    * lose pairs, so it is audited (`dropped_grams`/`total_grams`), a loud
    * cap, not a silent one.
    *
    * `maxDist = 1` CAP SEMANTICS: that case routes to an exact FastSS
    * deletion-neighborhood plan (below), where `maxGramBucket` caps
    * DELETION-KEY buckets rather than q-gram buckets. The recall shape
    * near the cap differs: an ed-1 pair typically shares exactly ONE
    * deletion key, so a dropped hot bucket loses its pairs outright,
    * whereas the gram path's `q·maxDist + 1` rare prefix grams give
    * per-pair redundancy. Both paths audit drops through the same
    * `dropped_grams`/`total_grams` metrics (deletion keys count as
    * "grams" there), and the deletion path's buckets are near-uniform by
    * construction (keys are length-specific substrings, not shared
    * boilerplate), so the cap binds far later — but callers sizing
    * `maxGramBucket` for recall near the cap should know the parameter
    * guards a different distribution on this path.
    *
    * Scale shape: gram explode (O(len) rows per string) → gram-key df agg
    * → per-id rank window (id shuffle) → rare-gram join (fan-out bounded
    * by Σ prefix_df ≤ cap·prefix size) → distinct id pairs → strings join
    * back per side (text never rides the gram join) → banded verify.
    */
  def fuzzyPairsGlobal(df: DataFrame, idCol: String, strCol: String,
                       maxDist: Int, q: Int = 2,
                       maxGramBucket: Int = 4096,
                       audit: Option[Observation] = None,
                       auditShort: Option[Observation] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    require(maxGramBucket >= 1, s"maxGramBucket must be >= 1, got $maxGramBucket")
    if (maxDist == 1)
      return fuzzyPairsDeletion1(
        df.select(col(idCol).as("__id"), col(strCol).as("__s")),
        maxGramBucket, audit, auditShort)
    val prefixLen = q * maxDist + 1
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
    val grams = base.select(col("__id"),
        explode(expr(
          s"transform(sequence(0, greatest(length(__s) - $q, 0)), " +
          s"i -> struct(i AS pos, substring(__s, i + 1, $q) AS g))")).as("__e"))
      .select(col("__id"), col("__e.pos").as("__pos"), col("__e.g").as("__g"))
    val gramDf = grams.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val audited = audit match {
      case Some(obs) => gramDf.observe(obs,
        sum(when(col("__df") > maxGramBucket, 1L).otherwise(0L)).as("dropped_grams"),
        count(lit(1)).as("total_grams"))
      case None => gramDf
    }
    val keptGrams = grams.join(audited.filter(col("__df") <= maxGramBucket),
      Seq("__g"))
    val rankW = Window.partitionBy(col("__id"))
      .orderBy(col("__df").asc, col("__g").asc, col("__pos").asc)
    val prefix = keptGrams
      .withColumn("__rk", row_number().over(rankW))
      .filter(col("__rk") <= prefixLen)
      .select(col("__g"), col("__id").as("__pid"), col("__pos").as("__ppos"))
    // the ±maxDist position window rides the JOIN KEY: the prefix side
    // (strings × prefixLen rows, the small side) explodes to its 2k+1
    // admissible positions so the join is an exact (gram, pos) equi-join —
    // fan-out per key is df(gram, pos), not df(gram); on corpora whose
    // rare grams concentrate at a few template positions this is the
    // difference between the position filter pruning AFTER the shuffle
    // and never shuffling the pruned rows at all
    val gramPairs = prefix
      .select(col("__g"), col("__pid"),
        explode(sequence(col("__ppos") - maxDist, col("__ppos") + maxDist))
          .as("__pos"))
      // PINNED sort-merge: both sides are corpus-sized (strings ×
      // prefix/gram fan-out) and the explode defeats size estimation, so
      // the optimizer can elect to BROADCAST the exploded prefix side —
      // measured at sf1 that one choice made the whole operator 4.2×
      // slower (320 s vs 76 s, same 19.4M-pair output): 32 copies of a
      // multi-million-row hashed relation where a partitioned join
      // spreads the hot-gram fan-out instead. Never broadcast a side
      // that scales with the corpus.
      .hint("merge")
      .join(keptGrams.select(col("__g"), col("__id").as("__aid"), col("__pos")),
        Seq("__g", "__pos"))
      .filter(col("__pid") =!= col("__aid"))
      .select(least(col("__pid"), col("__aid")).as("id_a"),
        greatest(col("__pid"), col("__aid")).as("id_b"))
    // Short-string branch: the gram-survival argument needs at least
    // q·maxDist + 1 grams AND both strings at least q long — below that a
    // single edit can destroy every gram (q=2, k=1: "ab" vs "ac" share
    // nothing). Any qualifying partner of a short string is itself within
    // maxDist of short, so the whole population is length-bounded by
    // construction; pairs come from an exact-length-class join exploded
    // over the ±maxDist window, each class capped at `maxGramBucket`
    // members (dropped whole + audited — same loud-cap discipline).
    val shortMax = q * (maxDist + 1) - 1
    val candidates = if (maxDist == 0) gramPairs else {
      val shorts = base
        .withColumn("__len", length(col("__s")))
        .filter(col("__len") <= shortMax + maxDist)
        .select(col("__id"), col("__len"))
      val classSizes = shorts.groupBy(col("__len")).agg(count(lit(1)).as("__cn"))
      val auditedCls = auditShort match {
        case Some(obs) => classSizes.observe(obs,
          sum(when(col("__cn") > maxGramBucket, 1L).otherwise(0L))
            .as("dropped_classes"),
          count(lit(1)).as("total_classes"),
          sum(col("__cn")).as("short_strings"))
        case None => classSizes
      }
      val keptShorts = shorts.join(
        auditedCls.filter(col("__cn") <= maxGramBucket).select(col("__len")),
        Seq("__len"), "left_semi")
      val targets = keptShorts.select(col("__id").as("__aid"),
          explode(sequence(col("__len") - maxDist, col("__len") + maxDist))
            .as("__len"))
      // PINNED sort-merge, same rationale as the gram join above: the
      // short-string population is corpus-scaling (every string under
      // ~q·(k+1) chars) and the ±maxDist explode hides its size from the
      // optimizer — never broadcast a side that scales with the corpus
      val shortPairs = keptShorts.select(col("__id").as("__pid"), col("__len"))
        .hint("merge")
        .join(targets, Seq("__len"))
        .filter(col("__pid") =!= col("__aid"))
        .select(least(col("__pid"), col("__aid")).as("id_a"),
          greatest(col("__pid"), col("__aid")).as("id_b"))
      gramPairs.unionByName(shortPairs)
    }
    val sa = base.select(col("__id").as("id_a"), col("__s").as("s_a"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("s_b"))
    candidates.distinct()
      .join(sa, "id_a").join(sb, "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .withColumn("dist", levWithin(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** maxDist = 1 candidate generation via DELETION NEIGHBORHOODS
    * (FastSS, Bocek et al. 2007): ed(a, b) ≤ 1 ⇒ a and b share a member
    * of {s} ∪ single-deletions(s) — delete the edited position from
    * whichever side carries it (substitution: delete it from both;
    * insert/delete: the shorter string IS a deletion variant of the
    * longer, and every string is its own zeroth variant). Exact — no
    * false negatives — and on template corpora it replaces the rare-gram
    * prefix filter, which collapses there: measured on the TPC-H name
    * corpus (15k rows, only 1,009 distinct 3-grams, every gram df in the
    * hundreds), the gram join fanned out 18.5M raw / 8.4M distinct
    * candidates for 252k true pairs; deletion keys are shared only by
    * strings within ed ≤ 2 of each other, so the candidate set is
    * near-output-sized. Keys per string = len + 1 — CHEAPER to generate
    * than the gram path's grams + df-agg + per-id rank window, at every
    * scale (this is why the k = 1 fast path is unconditional; k ≥ 2
    * deletion neighborhoods would need C(len, k) keys per string and
    * stay on the gram path).
    *
    * Same loud-cap discipline and Observation metric names as the gram
    * path: key buckets above `maxGramBucket` drop WHOLE (a bucket that
    * hot is a near-dup mega-family whose pairs are output-sized anyway)
    * and are audited as `dropped_grams`/`total_grams`. Keys ride as
    * 64-bit hashes: a collision can only MERGE buckets (extra
    * candidates, removed by the exact verify), never split one.
    */
  private def fuzzyPairsDeletion1(base: DataFrame, maxGramBucket: Int,
                                  audit: Option[Observation],
                                  auditShort: Option[Observation]): DataFrame = {
    // distinct per (id, key): repeated characters yield duplicate variants
    val keys0 = base.select(col("__id"),
        explode(array_union(array(col("__s")), expr(
          "transform(sequence(1, length(__s)), i -> " +
          "concat(substring(__s, 1, i - 1), substring(__s, i + 1, length(__s))))")))
          .as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__kh"))
      .distinct()
    // the deletion path has no short-string cut — keep the hook
    // resolvable for callers that passed it (all-zero report)
    val keys = auditShort match {
      case Some(obs) => keys0.observe(obs,
        sum(lit(0L)).as("dropped_classes"),
        sum(lit(0L)).as("total_classes"),
        sum(lit(0L)).as("short_strings"))
      case None => keys0
    }
    val keyDf = keys.groupBy(col("__kh")).agg(count(lit(1)).as("__df"))
    val audited = audit match {
      case Some(obs) => keyDf.observe(obs,
        sum(when(col("__df") > maxGramBucket, 1L).otherwise(0L))
          .as("dropped_grams"),
        count(lit(1)).as("total_grams"))
      case None => keyDf
    }
    val kept = keys.join(audited.filter(col("__df") <= maxGramBucket),
      Seq("__kh")).select(col("__kh"), col("__id"))
    // PINNED sort-merge, same rationale as the gram join: both sides are
    // corpus-scaling and the explode defeats size estimation — never
    // broadcast a side that scales with the corpus
    val candidates = kept.hint("merge")
      .join(kept.select(col("__kh"), col("__id").as("__aid")), Seq("__kh"))
      .filter(col("__id") =!= col("__aid"))
      .select(least(col("__id"), col("__aid")).as("id_a"),
        greatest(col("__id"), col("__aid")).as("id_b"))
      .distinct()
    val sa = base.select(col("__id").as("id_a"), col("__s").as("s_a"))
    val sb = base.select(col("__id").as("id_b"), col("__s").as("s_b"))
    candidates
      .join(sa, "id_a").join(sb, "id_b")
      .filter(abs(length(col("s_a")) - length(col("s_b"))) <= 1)
      .withColumn("dist", levWithin(col("s_a"), col("s_b"), 1))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Shared block-then-pair scaffold: size-scan the block keys (keys only
    * move), drop singleton and over-`maxBlock` blocks whole (audited),
    * semi-join the survivors back, self-join within blocks. Returns the
    * raw (id_a < id_b, s_a, s_b) candidate frame; callers add their
    * verify predicate.
    */
  private def blockedCandidates(df: DataFrame, idCol: String, strCol: String,
                                blockCols: Seq[String], maxBlock: Int,
                                audit: Option[Observation]): DataFrame = {
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    require(blockCols.nonEmpty,
      "blockCols must be non-empty: unblocked fuzzy join is all-pairs")
    // block-size scan: count per block key (keys only move — map-side
    // combine), keep blocks with 2..maxBlock members. Singleton blocks
    // can't pair and oversized blocks are template artifacts; both are
    // cut BEFORE the self-join so Σ|block|² is bounded by construction.
    val sizes = df.groupBy(blockCols.map(col): _*)
      .agg(count(lit(1)).as("__bn"))
    val observed = audit match {
      case Some(obs) => sizes.observe(obs,
        sum(when(col("__bn") > maxBlock, 1L).otherwise(0L)).as("dropped_blocks"),
        count(lit(1)).as("total_blocks"))
      case None => sizes
    }
    val keep = observed
      .filter(col("__bn") > 1 && col("__bn") <= maxBlock)
      .select(blockCols.map(col): _*)
    val pruned = df.join(keep, blockCols, "left_semi")
    val a = pruned.select(blockCols.map(col) :+ col(idCol).as("id_a")
      :+ col(strCol).as("s_a"): _*)
    val b = pruned.select(blockCols.map(col) :+ col(idCol).as("id_b")
      :+ col(strCol).as("s_b"): _*)
    a.join(b, blockCols).filter(col("id_a") < col("id_b"))
  }

  /** `levenshtein(a, b) <= k ? dist : -1`, exact codepoint semantics
    * (same contract as Spark's 3-arg `levenshtein`), evaluated as:
    * length-difference early exit → strip common prefix/suffix →
    * banded DP over the stripped cores.
    */
  def levWithin(a: Column, b: Column, k: Int): Column = {
    val br = org.apache.spark.sql.graftbridge.ColumnBridge
    br.column(LevWithin(br.expr(a), br.expr(b), k))
  }

  /** Jaro-Winkler similarity in [0, 1] — Spark has no built-in, so this is
    * a native codegen'd Expression (see [[JaroWinkler]]).
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    val br = org.apache.spark.sql.graftbridge.ColumnBridge
    br.column(JaroWinkler(br.expr(a), br.expr(b)))
  }

  /** Survivorship: ONE golden record per cluster from the duplicate
    * records entity resolution grouped — the master-data step AFTER
    * clustering (the reference's customer-dim world calls this the
    * "golden customer"). Rule: per COLUMN, the value from the most
    * recent record (by `orderCols` desc, a total order) in which that
    * column is NON-NULL — so a recent record with a missing phone does
    * not erase the phone a slightly older record carried; per-column
    * recency beats whole-record recency, which is the point of
    * survivorship over plain latest-wins dedup.
    *
    * One shuffle on the cluster: the ranked window, the per-column
    * `first(ignoreNulls)` fills, and the group count all share its
    * partitioning; output is cluster-sized.
    */
  def goldenRecord(records: DataFrame, clusterCol: String,
                   orderCols: Seq[String],
                   valueCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty && valueCols.nonEmpty,
      "goldenRecord needs order and value columns")
    val w = Window.partitionBy(col(clusterCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val filled = valueCols.foldLeft(records)((d, c) =>
      d.withColumn(s"golden_$c", first(col(c), ignoreNulls = true).over(wAll)))
    filled
      .withColumn("n_records", count(lit(1)).over(wAll).cast("long"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(clusterCol) +: col("n_records")
        +: valueCols.map(c => col(s"golden_$c")): _*)
  }
}

/** Codepoint-exact thresholded Levenshtein (distance if ≤ k, else -1). */
case class LevWithin(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lev_within needs (string, string), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    LinkKernels.levWithin(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.operators.LinkKernels.levWithin($a, $b, $k);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Codepoint-exact Jaro-Winkler similarity (textbook parameters: matching
  * window ⌊max/2⌋−1, transpositions = mismatched-match-positions / 2,
  * prefix bonus p=0.1 over ≤4 shared leading codepoints, applied only when
  * jaro > 0.7 — the same contract as DuckDB's `jaro_winkler_similarity`,
  * which keeps the linkage queries oracle-exact).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler needs (string, string), got (${left.dataType}, ${right.dataType})")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    LinkKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.operators.LinkKernels.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object LinkKernels {

  /** Levenshtein distance over CODEPOINTS if ≤ k, else -1.
    *
    * Edits inside a shared prefix/suffix never help: any optimal
    * alignment can be rewritten to match shared affixes position-for-
    * position, so lev(a, b) = lev(core_a, core_b) after stripping — the
    * classic trim used by every production edit-distance kernel. The
    * banded DP then touches O(|core|·k) cells instead of O(|a|·|b|).
    */
  /** Codepoint array of a UTF8String. ASCII fast path: one byte per char
    * (numBytes == numChars) means the bytes ARE the codepoints — no String
    * materialization, no stream. The verify kernels call this twice per
    * pair, so on ASCII-heavy linkage corpora (names, SKUs, URLs) this is
    * the difference between an allocation-bound and a compute-bound scan.
    */
  private def codepoints(u: UTF8String): Array[Int] = {
    val nb = u.numBytes()
    if (nb == u.numChars()) {
      val a = new Array[Int](nb)
      var i = 0
      while (i < nb) { a(i) = u.getByte(i) & 0xff; i += 1 }
      a
    } else u.toString.codePoints().toArray
  }

  def levWithin(ua: UTF8String, ub: UTF8String, k: Int): Int = {
    // fast path: byte-identical
    if (ua.equals(ub)) return 0
    if (k <= 0) return -1
    val a = codepoints(ua)
    val b = codepoints(ub)
    var lo = 0
    var aHi = a.length
    var bHi = b.length
    if (math.abs(aHi - bHi) > k) return -1
    while (lo < aHi && lo < bHi && a(lo) == b(lo)) lo += 1
    while (aHi > lo && bHi > lo && a(aHi - 1) == b(bHi - 1)) { aHi -= 1; bHi -= 1 }
    val n = aHi - lo   // core lengths after stripping
    val m = bHi - lo
    if (n == 0) return if (m <= k) m else -1
    if (m == 0) return if (n <= k) n else -1
    // banded DP: row = position in a-core, cells within |i-j| <= k
    val prev = new Array[Int](m + 1)
    val curr = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else Int.MaxValue >> 1; j += 1 }
    var i = 1
    while (i <= n) {
      val jMin = math.max(1, i - k)
      val jMax = math.min(m, i + k)
      curr(jMin - 1) = Int.MaxValue >> 1
      if (i <= k) curr(0) = i
      var best = Int.MaxValue >> 1
      j = jMin
      while (j <= jMax) {
        val cost = if (a(lo + i - 1) == b(lo + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        curr(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > k) return -1       // the whole band exceeded the bound
      // sentinel one past the band: row i+1's band extends one cell right,
      // and that prev cell would otherwise be stale from an older row
      if (jMax + 1 <= m) curr(jMax + 1) = Int.MaxValue >> 1
      System.arraycopy(curr, 0, prev, 0, m + 1)
      i += 1
    }
    if (prev(m) <= k) prev(m) else -1
  }

  /** Jaro-Winkler similarity over CODEPOINTS (see [[graft.operators.JaroWinkler]]).
    * Empty-vs-empty is 1.0, empty-vs-nonempty 0.0 (DuckDB agrees).
    */
  def jaroWinkler(ua: UTF8String, ub: UTF8String): Double = {
    if (ua.equals(ub)) return 1.0
    val a = codepoints(ua)
    val b = codepoints(ub)
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val aMatched = new Array[Boolean](n)
    val bMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val jLo = math.max(0, i - window)
      val jHi = math.min(m - 1, i + window)
      var j = jLo
      var found = false
      while (!found && j <= jHi) {
        if (!bMatched(j) && a(i) == b(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in order; each is a
    // permutation of the other, t = mismatched positions / 2
    var mismatched = 0
    var bi = 0
    i = 0
    while (i < n) {
      if (aMatched(i)) {
        while (!bMatched(bi)) bi += 1
        if (a(i) != b(bi)) mismatched += 1
        bi += 1
      }
      i += 1
    }
    val t = mismatched / 2
    val md = matches.toDouble
    val jaro = (md / n + md / m + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    while (prefix < math.min(4, math.min(n, m)) && a(prefix) == b(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
