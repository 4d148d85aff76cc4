package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All are per-row scalar pipelines over built-in (codegen'd) functions —
  * embarrassingly parallel, no shuffle, so they scale linearly with input
  * splits at 100 TB. Every derivation is expressible in ANSI SQL for the
  * DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** BPE-ish tokenizer: letter runs, digit runs, or single punctuation —
    * the standard pre-tokenization split. Regex kept RE2-compatible so the
    * DuckDB oracle matches byte-for-byte.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Small fixed stopword list (public, language-agnostic subset). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be")

  /** Per-language marker-token profiles for n-gram-free heuristic language
    * ID: score = count of profile hits in the token set; argmax wins,
    * deterministic tie-break by language code order.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "and", "is", "of", "to", "in", "that"),
    "es" -> Seq("el", "la", "los", "las", "que", "es", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta", "men"))

  /** Count how many tokens of `toks` are in `vocab` — one-pass native
    * counter (same semantics as `size(filter(toks, isin(vocab)))`).
    */
  private def hitCount(toks: Column, vocab: Seq[String]): Column =
    graft.functions.HashFunctions.tokenSetCounts(toks, Seq(vocab))(0)

  /** Heuristic language ID: (doc_id-preserving) adds `lang_pred` plus the
    * per-language scores. Greatest-score-wins with lexicographic tie-break
    * (first profile in order wins ties).
    */
  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // all profile scores from ONE token pass (native bitmask counter)
    val allScores = graft.functions.HashFunctions.tokenSetCounts(
      toks, LangProfiles.map(_._2))
    val scored = LangProfiles.zipWithIndex.foldLeft(
      df.withColumn("__scores", allScores)) { case (d, ((lang, _), i)) =>
      d.withColumn(s"score_$lang", col("__scores")(i))
    }.drop("__scores")
    // argmax via chained CASE: strictly-greater beats, ties keep earlier
    val pred = LangProfiles.tail.foldLeft(
      (lit(LangProfiles.head._1), col(s"score_${LangProfiles.head._1}"))) {
      case ((bestLang, bestScore), (lang, _)) =>
        val s = col(s"score_$lang")
        (when(s > bestScore, lit(lang)).otherwise(bestLang),
         when(s > bestScore, s).otherwise(bestScore))
    }._1
    scored.withColumn("lang_pred", pred)
  }

  /** Quality metrics: char/token counts, mean token length, stopword
    * ratio, punctuation ratio, uppercase ratio — the standard cheap
    * document-quality features.
    */
  def quality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_unique_tokens", size(array_distinct(toks)))
      // sum of token lengths == non-whitespace chars of the lowered text:
      // one codegen'd regex pass instead of an interpreted aggregate() HOF
      // over the token array (same value; lower() can change char counts on
      // special code points, so it must run before the length)
      .withColumn("mean_token_len",
        length(regexp_replace(lower(trim(t)), "\\s+", "")).cast("double")
          / size(toks))
      .withColumn("stopword_ratio",
        hitCount(toks, Stopwords).cast("double") / size(toks))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))).cast("double")
          / length(t))
      .withColumn("upper_ratio",
        (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double")
          / length(t))
  }

  /** Repetition metrics (the Gopher/RefinedWeb-style intra-document
    * repetition filters): duplicate-token ratio and the char mass of the
    * heaviest single token. Highly repetitive documents (boilerplate,
    * keyword stuffing, degenerate generations) score high and get
    * filtered before training.
    *
    * Shape: explode tokens → count per (doc, token) → per-doc aggregate.
    * Two hash-aggregate shuffles with map-side combine — the inverted-index
    * build shape, linear in corpus token count, no per-row quadratic work.
    */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val perTok = df
      .select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("chars", col("cnt") * length(col("tok")))
    perTok.groupBy(col(idCol)).agg(
      sum(col("cnt")).as("n_tokens"),
      count(lit(1)).as("n_distinct_tokens"),
      (max(col("chars")).cast("double") / sum(col("chars")).cast("double"))
        .as("top_token_char_ratio"))
      .withColumn("dup_token_ratio",
        (col("n_tokens") - col("n_distinct_tokens")).cast("double") / col("n_tokens"))
  }

  /** PII scrubbing: redact emails and international-format phone numbers
    * with a placeholder token. Patterns are RE2-compatible (no backrefs /
    * lookaround) so the DuckDB oracle applies byte-identical replacement;
    * map-only, codegen'd, linear.
    */
  /** Gopher-style document quality-rule bundle (Rae et al. 2021 §A1.1 —
    * the repetition/length/stopword gates every web-corpus pipeline runs
    * before training): per doc, word count bounds, mean word length
    * bounds, a stopword-presence floor, and a top-token dominance
    * ceiling, plus the overall AND. Emits the stats alongside the flags
    * so threshold tuning reads the same frame the filter does.
    *
    * Engine-exact thresholds: every rule compares INTEGER cross-products
    * (`top_tf · 100 <= pct · n_words`, `Σlen · 10 <> deci · n_words`) —
    * no float division anywhere near a boundary, so Spark and the DuckDB
    * oracle agree on every edge case bit-for-bit. The reported
    * fractional stats are display-only (rounded to 6 decimals).
    *
    * Scale shape: one explode → (doc, token) hash agg → (doc) hash agg —
    * the q56/q58 inverted-index cost, linear in corpus tokens, no
    * windows, nothing driver-side.
    *
    * Bounds are deci-units/percent so they stay integers: `meanLen`
    * bounds in tenths of a character, fractions in whole percent.
    */
  def qualityRules(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 10, maxWords: Int = 1000000,
                   minMeanLenDeci: Int = 20, maxMeanLenDeci: Int = 100,
                   minStopPct: Int = 1, maxTopTokenPct: Int = 20,
                   stopwords: Seq[String] = Stopwords): DataFrame = {
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    tf.groupBy(col(idCol))
      .agg(
        sum(col("__tf")).as("n_words"),
        max(col("__tf")).as("__top_tf"),
        sum(col("__tf") * length(col("__w"))).as("__sum_len"),
        sum(when(col("__w").isin(stopwords: _*), col("__tf"))
          .otherwise(lit(0L))).as("__n_stop"))
      .select(
        col(idCol),
        col("n_words"),
        round6(col("__sum_len").cast("double") / col("n_words")).as("mean_word_len"),
        round6(col("__top_tf").cast("double") / col("n_words")).as("top_token_frac"),
        round6(col("__n_stop").cast("double") / col("n_words")).as("stopword_frac"),
        (col("n_words") >= minWords && col("n_words") <= maxWords).as("pass_words"),
        (col("__sum_len") * 10 >= lit(minMeanLenDeci.toLong) * col("n_words") &&
          col("__sum_len") * 10 <= lit(maxMeanLenDeci.toLong) * col("n_words"))
          .as("pass_mean_len"),
        (col("__n_stop") * 100 >= lit(minStopPct.toLong) * col("n_words"))
          .as("pass_stopwords"),
        (col("__top_tf") * 100 <= lit(maxTopTokenPct.toLong) * col("n_words"))
          .as("pass_top_token"))
      .withColumn("pass",
        col("pass_words") && col("pass_mean_len") &&
          col("pass_stopwords") && col("pass_top_token"))
  }

  /** Exact distribution-tail trim WITHOUT a global sort: drop the lowest
    * `lowPct`% and highest `highPct`% of rows by an integer `metricCol`,
    * with VALUE-based cuts derived from a cumulative histogram over the
    * metric's DISTINCT values. A row-rank trim (`row_number` over the
    * corpus) would funnel 100 TB through one sort task; the histogram
    * shuffles only (value, count) pairs — cardinality bounded by the
    * metric's domain (a length in chars/tokens: ≤ ~10⁶ values no matter
    * how many rows), and the tiny cumulative window runs over that
    * bounded frame (the `centroids` pattern).
    *
    * Cut semantics (deterministic, engine-exact, all integer): with n
    * total rows, a row is dropped as low-tail iff cumCount(<= its value)
    * · 100 <= lowPct · n, and as high-tail iff cumCount(>= its value) ·
    * 100 <= highPct · n. Whole value-classes drop together — ties never
    * split across the cut, so the result is independent of row order and
    * identical in any engine.
    */
  def trimOutliers(df: DataFrame, metricCol: String,
                   lowPct: Int = 1, highPct: Int = 1): DataFrame = {
    require(lowPct >= 0 && highPct >= 0 && lowPct + highPct < 100,
      s"invalid trim percents ($lowPct, $highPct)")
    val counts = df.groupBy(col(metricCol)).agg(count(lit(1)).as("__c"))
    // unpartitioned windows over DISTINCT metric values only — bounded by
    // the value domain, never the corpus (see scaladoc)
    val wAsc = org.apache.spark.sql.expressions.Window
      .orderBy(col(metricCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wDesc = org.apache.spark.sql.expressions.Window
      .orderBy(col(metricCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts
      .withColumn("__cumLo", sum(col("__c")).over(wAsc))
      .withColumn("__cumHi", sum(col("__c")).over(wDesc))
    val tot = cum.groupBy()
      .agg(sum(col("__c")).as("__n")) // 1-row frame, broadcast below
    val keep = cum.crossJoin(broadcast(tot))
      .filter(col("__cumLo") * 100 > lit(lowPct.toLong) * col("__n") &&
        col("__cumHi") * 100 > lit(highPct.toLong) * col("__n"))
      .select(col(metricCol))
    df.join(broadcast(keep), Seq(metricCol), "left_semi")
  }

  /** Per-group winsorization: clamp `metricCol` into the group's
    * [PERCENTILE_DISC(lowPct), PERCENTILE_DISC(highPct)] band instead of
    * dropping tail rows — the complement of [[trimOutliers]]: row count is
    * preserved, extremes are capped to actual domain values (the standard
    * robust-mean preprocessing for heavy-tailed quality metrics before
    * averaging or OLS).
    *
    * Both boundaries are discrete percentiles decided by the all-integer
    * comparison `cum·100 >= p·n` (the [[percentilesExact]] construction),
    * so every engine agrees at all boundary cases and the clamped value is
    * always a value the group actually contains.
    *
    * Row preservation holds for nullable inputs too: the bounds join is a
    * LEFT join (a null group has no boundary row, but its rows survive
    * with a null clamp), and a null metric stays null rather than being
    * clamped to the group's low bound (Spark's `greatest`/`least` skip
    * NULLs, so an unguarded clamp would invent a value).
    *
    * Scale shape: one (group, value) histogram agg (bounded by the metric
    * domain × groups, never the corpus), per-group cumulative windows over
    * that bounded frame, then ONE broadcast join of the 2-column boundary
    * frame back onto the corpus — the corpus is scanned once and never
    * shuffles.
    */
  def winsorize(df: DataFrame, metricCol: String, groupCol: String,
                lowPct: Int = 5, highPct: Int = 95): DataFrame = {
    require(lowPct >= 1 && highPct <= 100 && lowPct < highPct,
      s"invalid winsor percents ($lowPct, $highPct)")
    val b = percentilesExact(df, metricCol, groupCol, Seq(lowPct, highPct))
    val bounds = b
      .groupBy(col(groupCol))
      .agg(min(when(col("pct") === lowPct, col("value"))).as("__lo"),
        min(when(col("pct") === highPct, col("value"))).as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol), "left")
      .withColumn(metricCol + "_w",
        when(col(metricCol).isNotNull && col("__lo").isNotNull,
          least(greatest(col(metricCol), col("__lo")), col("__hi")))
          .otherwise(col(metricCol)))
      .drop("__lo", "__hi")
  }

  /** Exact per-group discrete percentiles WITHOUT a global sort: for each
    * group and each requested percent `p`, the smallest value whose
    * within-group cumulative count reaches `p`% of the group — i.e.
    * `PERCENTILE_DISC(p/100)`, decided by the all-integer comparison
    * `cum(v) · 100 >= p · n` (no float quantile positions, so every
    * engine lands on the same value at boundaries; `cum >= ceil(p·n/100)`
    * ⟺ `cum·100 >= p·n` for integer cum). The p50/p95/p99 corpus-health
    * readout every ingest run wants, exact rather than sketched.
    *
    * Scale shape (the [[trimOutliers]] histogram pattern): one
    * (group, value) count agg, a per-group cumulative window over
    * DISTINCT values only (bounded by the metric domain, never the
    * corpus), a broadcast of per-group totals, then a hash-agg `min` per
    * (group, pct). The corpus is scanned once and never shuffled.
    */
  def percentilesExact(df: DataFrame, valueCol: String, groupCol: String,
                       pcts: Seq[Int] = Seq(50, 95, 99)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100]: $pcts")
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val totals = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    cum.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col(valueCol), col("__cum"), col("__n"),
        explode(array(pcts.map(lit): _*)).as("pct"))
      .filter(col("__cum") * 100 >= col("pct").cast("long") * col("__n"))
      .groupBy(col(groupCol), col("pct"))
      .agg(min(col(valueCol)).as("value"))
  }

  /** Per-group ECDF score calibration: each row's score maps to its
    * within-group cumulative fraction `P(score' <= score)` — the rank
    * normalization that makes quality scores COMPARABLE across sources
    * whose raw scales aren't (a 0.7 from one scorer may mean "top decile"
    * in src0 and "median" in src3; after calibration a single corpus-wide
    * threshold means the same thing everywhere). Ties share one ECDF
    * value (the class's upper cumulative bound), so the output is
    * row-order independent and engine-exact; the fraction rounds to 6
    * decimals.
    *
    * Same scale shape as [[trimOutliers]]: a (group, value) histogram —
    * cardinality bounded by the metric domain × groups, never the corpus
    * — cumulative windows over that bounded frame, one broadcast join
    * back. The corpus itself never shuffles.
    */
  def calibrateScores(df: DataFrame, scoreCol: String,
                      groupCol: String): DataFrame = {
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val counts = df.groupBy(col(groupCol), col(scoreCol))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = counts.withColumn("__cum", sum(col("__c")).over(w))
    val totals = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val ecdf = cum.join(broadcast(totals), Seq(groupCol))
      .select(col(groupCol), col(scoreCol),
        round6(col("__cum").cast("double") / col("__n")).as("ecdf"))
    df.join(broadcast(ecdf), Seq(groupCol, scoreCol))
  }

  /** Robust per-group feature scaling — `(v − median) / IQR` with the
    * type-1 exact percentiles of [[percentilesExact]]: the
    * outlier-immune normalization (a single fat-finger amount moves a
    * mean/std z-score corpus-wide, it cannot move the quartiles) used
    * before thresholds are shared across heterogeneous groups.
    * Constant-valued groups (IQR = 0) scale to null — a feature with no
    * spread has no scale, and ±∞/NaN must not reach a training file.
    * Null metric values pass through with null `scaled` and do not
    * shift the quartiles.
    *
    * Scale shape: the quartile frame rides the (group, value) histogram
    * (bounded by the value domain, never corpus rows) and comes back as
    * ONE broadcast group-sized join; the corpus itself never shuffles —
    * same machinery as [[calibrateScores]].
    */
  def robustScale(df: DataFrame, valueCol: String,
                  groupCol: String): DataFrame = {
    val q = percentilesExact(df.filter(col(valueCol).isNotNull), valueCol,
      groupCol, Seq(25, 50, 75))
    val wide = q.groupBy(col(groupCol)).agg(
      max(when(col("pct") === 25, col("value"))).as("__p25"),
      max(when(col("pct") === 50, col("value"))).as("__p50"),
      max(when(col("pct") === 75, col("value"))).as("__p75"))
    df.join(broadcast(wide), Seq(groupCol), "left")
      .withColumn("scaled",
        when(col("__p75") > col("__p25"),
          round((col(valueCol).cast("double") - col("__p50").cast("double")) /
            (col("__p75").cast("double") - col("__p25").cast("double")), 6)))
      .drop("__p25", "__p50", "__p75")
  }

  /** Quantile normalization: map each group's value distribution onto
    * the POOLED distribution — v ↦ the smallest pooled value whose ECDF
    * reaches v's within-group ECDF. The batch-effect corrector (its
    * microarray-era name) for score columns whose per-source scales
    * drift: after normalization, "top decile" means the same value in
    * every source, so one corpus-wide threshold is fair — the
    * value-space counterpart of [[calibrateScores]]'s rank-space
    * output.
    *
    * Engine-exact: both ECDFs use the round6 tie-sharing recipe; the
    * inverse lookup is a single ordered walk over the UNION of the two
    * probability frames (first non-null pooled value at probability ≥
    * p, tie-ordered (prob, pooled-after-group, value) — a total order,
    * so both engines pick the same quantile).
    *
    * Scale shape: everything after the two histogram aggregations rides
    * value-domain-sized frames (like every percentile operator here,
    * the corpus never shuffles); the walk's window is global but over
    * the value domain ∪ group×value domain — histogram rows, not
    * corpus rows.
    */
  def quantileNormalize(df: DataFrame, valueCol: String,
                        groupCol: String): DataFrame = {
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val W = org.apache.spark.sql.expressions.Window
    val base = df.filter(col(valueCol).isNotNull)
    val vType = base.schema(valueCol).dataType.catalogString
    val kType = base.schema(groupCol).dataType.catalogString

    val gw = W.partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(W.unboundedPreceding, 0)
    val gTot = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val gEcdf = base.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(gw))
      .join(broadcast(gTot), Seq(groupCol))
      .select(col(groupCol), col(valueCol),
        round6(col("__cum").cast("double") / col("__n")).as("__prob"))

    val pw = W.orderBy(col(valueCol).asc)
      .rowsBetween(W.unboundedPreceding, 0)
    val pTot = broadcast(base.groupBy().agg(count(lit(1)).as("__n")))
    val pEcdf = base.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(pw))
      .crossJoin(pTot)
      .select(col(valueCol).as("__x"),
        round6(col("__cum").cast("double") / col("__n")).as("__prob"))

    val tg = gEcdf.select(col(groupCol), col(valueCol), col("__prob"),
      lit(null).cast(vType).as("__x"), lit(0).as("__pooled"))
    val tp = pEcdf.select(lit(null).cast(kType).as(groupCol),
      lit(null).cast(vType).as(valueCol), col("__prob"), col("__x"),
      lit(1).as("__pooled"))
    val uw = W.orderBy(col("__prob").asc, col("__pooled").asc,
        col("__x").asc_nulls_first)
      .rowsBetween(W.currentRow, W.unboundedFollowing)
    tg.unionByName(tp)
      .withColumn("normalized", first(col("__x"), ignoreNulls = true).over(uw))
      .filter(col("__pooled") === 0)
      .select(col(groupCol), col(valueCol), col("normalized"))
  }

  /** Exact phrase matching via positional postings — the retrieval
    * primitive BM25's bag-of-words scoring cannot express ("machine
    * learning" ≠ documents containing both words somewhere). Each
    * document explodes to (id, pos, token) postings PRUNED to the
    * phrase's terms at the scan (an `isin` filter the optimizer pushes
    * below the explode's generator input is not possible, but the
    * post-explode filter drops everything else before any shuffle);
    * term i's postings shift to `start = pos − i`, and a phrase
    * occurrence is one (id, start) key present in every term's frame —
    * k−1 hash equi-joins over postings-sized data, never document
    * text. Repeated terms in the phrase work by construction (each
    * position must independently match).
    *
    * Output: (id, n_occurrences) for documents containing the phrase
    * at least once; overlapping occurrences count separately.
    */
  def phraseMatch(df: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val posts = df.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
      .filter(col("__tok").isin(phrase.distinct: _*))
    val frames = phrase.zipWithIndex.map { case (t, i) =>
      posts.filter(col("__tok") === t)
        .select(col(idCol), (col("__pos") - i).as("__start"))
    }
    // PINNED sort-merge on the positional-intersection joins: each frame
    // is ONE TERM's positional postings — corpus-scaling for a frequent
    // term, and the posexplode below it hides that from size estimation,
    // so the planner can elect to broadcast a posting list that is
    // gigabytes at corpus scale (the Linkage.scala:181 cliff class).
    frames.reduce((a, b) => a.hint("merge").join(b, Seq(idCol, "__start")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** Per-group median imputation — nulls filled with the group's exact
    * type-1 median (the outlier-immune choice; a mean imputer inherits
    * every fat-finger value), originals preserved beside the fill and
    * flagged. Groups that are ALL null stay null — inventing a value
    * where no evidence exists is how silent bias enters a training set.
    * Same broadcast-histogram shape as [[robustScale]].
    */
  def imputeMedian(df: DataFrame, valueCol: String,
                   groupCol: String): DataFrame = {
    val med = percentilesExact(df.filter(col(valueCol).isNotNull), valueCol,
        groupCol, Seq(50))
      .select(col(groupCol), col("value").as("__med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .withColumn("was_null", col(valueCol).isNull)
      .withColumn("imputed", coalesce(col(valueCol), col("__med")))
      .drop("__med")
  }

  /** Deterministic per-group mode — the most frequent value with the
    * (count desc, value asc) total order, so ties resolve identically
    * in any engine and on any schedule; the categorical companion of
    * [[imputeMedian]] (mode is the only sane categorical fill). Nulls
    * are not candidates. One (group, value) count aggregation + a
    * WindowGroupLimit rank — map-bounded per group.
    */
  def modeBy(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("__c").desc, col(valueCol).asc)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(groupCol), col(valueCol).as("mode"),
        col("__c").cast("long").as("n_mode"))
  }

  /** Weighted type-1 median per group: the smallest value whose
    * cumulative WEIGHT reaches half the group's total — "the price at
    * which half the QUANTITY trades", which an unweighted median gets
    * wrong whenever line sizes vary. Integer weights keep the
    * cumulative compare exact (`2·cum ≥ total`, no division); same
    * (group, value)-histogram shape as [[percentilesExact]].
    */
  def weightedMedian(df: DataFrame, valueCol: String, weightCol: String,
                     groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val base = df.filter(col(valueCol).isNotNull &&
      col(weightCol).isNotNull && col(weightCol).cast("long") > 0)
    val tot = base.groupBy(col(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("__tot"))
    base.groupBy(col(groupCol), col(valueCol))
      .agg(sum(col(weightCol).cast("long")).as("__w"))
      .withColumn("__cum", sum(col("__w")).over(w))
      .join(broadcast(tot), Seq(groupCol))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as("weighted_median"),
        max(col("__tot")).as("total_weight"))
  }

  /** Greedy budgeted corpus selection: keep the highest-`scoreCol` rows
    * whose cumulative `costCol` stays within `budgetPct`% of the total —
    * "take the best docs up to N tokens", the final cut every
    * fixed-token-budget training run makes. Selection is by WHOLE score
    * class (distinct score value): classes admit in descending score
    * order while the running cost fits, and the boundary class that
    * would overflow is excluded entirely — deterministic, row-order
    * independent, and identical in any engine (all-integer compares when
    * `costCol` is integral). Per-row tie-breaking inside a class would
    * need a global row order — exactly the 100 TB sort this avoids; make
    * classes finer (e.g. a composite score) if the boundary matters.
    *
    * Scale shape: one (score, Σcost) histogram, a cumulative window over
    * its distinct values (bounded by the score domain), a 1-row total,
    * and a broadcast semi-join back — the corpus never shuffles.
    */
  def selectByBudgetPct(df: DataFrame, scoreCol: String, costCol: String,
                        budgetPct: Int): DataFrame = {
    require(budgetPct >= 0 && budgetPct <= 100, s"budgetPct $budgetPct not in [0,100]")
    val byScore = df.groupBy(col(scoreCol)).agg(sum(col(costCol)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(scoreCol).desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = byScore.withColumn("__cum", sum(col("__c")).over(w))
    val tot = df.groupBy().agg(sum(col(costCol)).as("__tot"))
    val keep = cum.crossJoin(broadcast(tot))
      .filter(col("__cum") * 100 <= lit(budgetPct.toLong) * col("__tot"))
      .select(col(scoreCol))
    df.join(broadcast(keep), Seq(scoreCol), "left_semi")
  }

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+[0-9]{1,3} [0-9]{3}-[0-9]{3}-[0-9]{4}"
  def redactPii(text: Column, token: String = "[PII]"): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, token),
      PhonePattern, token)

  /** Count of PII matches (pre-redaction audit metric). */
  def piiCount(text: Column): Column =
    regexp_count(text, lit(EmailPattern)) + regexp_count(text, lit(PhonePattern))

  /** Token counts under both tokenizers. `regexp_count` instead of
    * `size(regexp_extract_all(…))` — counts matches without materializing
    * the token array (same result, no per-row allocation).
    */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_ws_tokens", size(tokens(col(textCol))))
      .withColumn("n_bpe_tokens", regexp_count(col(textCol), lit(BpePattern)))

  /** Polynomial rolling-hash fingerprint over whitespace tokens:
    * h = fold(h * 31 + tokenValue) mod p, tokenValue = length + 7 ·
    * ascii(first char). Pure integer arithmetic with an explicit modulus so
    * the DuckDB oracle (list_reduce) reproduces it exactly.
    */
  val FingerprintMod = 1000000007L
  def fingerprint(text: Column): Column = {
    val tokVal = (t: Column) => length(t) + lit(7) * ascii(substring(t, 1, 1))
    aggregate(tokens(text), lit(0L),
      (acc, t) => (acc * 31L + tokVal(t).cast("long")) % FingerprintMod)
  }

  /** Fixed-token-window chunking with overlap — the "split documents into
    * model-context-sized pieces" step of RAG / pre-training prep. Chunk c
    * starts at token c·(chunkTokens − overlap); chunks are emitted while
    * their start lies before `n − overlap` (plus always one chunk), so
    * every token is covered and no chunk is a suffix of the previous one.
    * Map-only (tokenize + sequence-explode + slice): no shuffle, linear
    * scale-out, chunk count per doc = ⌈(n − overlap)/stride⌉.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunkTokens=$chunkTokens")
    val stride = chunkTokens - overlap
    df.filter(length(trim(col(textCol))) > 0)
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L),
        greatest(ceil((col("__n") - lit(overlap.toLong)).cast("double") / stride)
          .cast("long") - 1, lit(0L)))))
      .withColumn("chunk_text", concat_ws(" ",
        slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens))))
      .withColumn("n_chunk_tokens",
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_id") * stride).cast("int"))
      .drop("__toks", "__n")
  }

  /** Benchmark decontamination: drop every corpus doc sharing at least one
    * word k-shingle with the benchmark set — the standard "remove eval-set
    * contamination from training data" sweep.
    *
    * Scale shape: corpus postings shuffle on 64-bit shingle hashes (8×
    * smaller than strings; a collision only flags an extra doc, the safe
    * direction for decontamination); the benchmark side is aggregated to
    * distinct hashes first, so it is typically small enough that AQE
    * broadcasts the semi-join build side. Cost is one pass over each side
    * plus an id-level anti-join — no pairwise work anywhere.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                    textCol: String, k: Int = 5): DataFrame = {
    val shingleHashes =
      explode(transform(Dedup.shingles(col(textCol), k), s => xxhash64(s))).as("__sh")
    // benchmark side needs ONLY its text — demanding idCol there would
    // reject a raw eval set that has no such column
    val benchHashes = benchmark.select(shingleHashes).distinct()
    val dirtyIds = corpus.select(col(idCol), shingleHashes)
      .join(benchHashes, Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(dirtyIds, Seq(idCol), "left_anti")
  }

  /** Report form of [[decontaminate]]: every corpus doc with its distinct
    * k-shingle count, the number of those shared with the benchmark set,
    * and a 0/1 contamination flag — the "audit before you drop" pass that
    * sizes the blast radius of a decontamination sweep (and, aggregated,
    * gives the benchmark-overlap rate per source). Same hashed-shingle
    * semi-join shape and collision direction as the dropping form; one
    * extra per-doc hash aggregation, still nothing pairwise.
    */
  def decontaminateReport(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                          textCol: String, k: Int = 5): DataFrame = {
    val shingleHashes =
      explode(transform(Dedup.shingles(col(textCol), k), s => xxhash64(s))).as("__sh")
    val benchHashes = benchmark.select(shingleHashes).distinct()
    // shingles() is already the DISTINCT shingle set per doc, so the count
    // of surviving postings is the distinct contaminated-shingle count
    val hits = corpus.select(col(idCol), shingleHashes)
      .join(benchHashes, Seq("__sh"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated"))
    corpus
      .select(col(idCol),
        size(Dedup.shingles(col(textCol), k)).cast("long").as("n_shingles"))
      .join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("contaminated", (col("n_contaminated") > 0).cast("int"))
  }

  /** [[decontaminate]] with a broadcast Bloom prefilter — the 100 TB form.
    *
    * The exact form's corpus postings list (one row per doc per shingle)
    * is the dominant shuffle at scale even though the semi-join build side
    * is tiny. Here the benchmark's shingle hashes aggregate into a
    * fixed-size Bloom bitset (partial aggregation, one ~MiB array on the
    * driver) that rides the probe expression as a reference object, so
    * ~every clean posting dies INSIDE the scan stage — map-side, before
    * the exchange — and only Bloom survivors (true hits + fp·|postings|
    * false alarms) shuffle into the exact semi-join confirm. False
    * negatives are impossible, so the result is row-identical to
    * [[decontaminate]]; the confirm join rejects the false positives.
    *
    * This is Spark's own runtime-filter move (InjectRuntimeFilter /
    * BloomFilterMightContain) surfaced as an operator primitive, because
    * the optimizer's version only fires on equi-join shapes it can prove,
    * and we know the set side is benchmark-small by construction.
    */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                         textCol: String, k: Int = 5,
                         numBits: Int = BloomFunctions.DefaultNumBits,
                         numHashes: Int = BloomFunctions.DefaultNumHashes): DataFrame = {
    val shingleHashes =
      explode(transform(Dedup.shingles(col(textCol), k), s => xxhash64(s))).as("__sh")
    val benchHashes = benchmark.select(shingleHashes).distinct()
    val bits = BloomFunctions.build(benchHashes, "__sh", numBits, numHashes)
    val dirtyIds = corpus.select(col(idCol), shingleHashes)
      .filter(BloomFunctions.mightContain(col("__sh"), bits, numHashes))
      .join(benchHashes, Seq("__sh"), "left_semi")
      .select(col(idCol)).distinct()
    corpus.join(dirtyIds, Seq(idCol), "left_anti")
  }

  /** Cross-engine-exact 6-decimal rounding: `floor(x·10⁶ + 0.5)/10⁶`
    * computed in plain IEEE doubles is bit-identical in any engine
    * (Spark's `round` converts the double to exact BigDecimal HALF_UP
    * while DuckDB rounds the scaled double — they disagree on half-ulp
    * boundaries, observed as a 1e-6 diff at sf0.1).
    */
  private def round6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-doc bigram-LM negative log-likelihood — the perplexity-style
    * quality score: train add-one-smoothed bigram statistics on the corpus
    * itself, score each doc by −mean ln P(w₂|w₁) over its bigram
    * occurrences (docs with <2 tokens drop out). High nll = improbable
    * token transitions = gibberish/boilerplate candidates.
    *
    * Float discipline for the oracle: each term is rounded to 6 decimals
    * and summed as DECIMAL (exact, order-independent — a double sum would
    * depend on partition order), then one double division + final round.
    *
    * Scale shape: two corpus-count aggregations (map-side combinable) +
    * two joins on token/bigram keys + one per-doc aggregation; vocabulary
    * size rides in as a broadcast scalar. Nothing driver-side, nothing
    * pairwise.
    *
    * `hashedKeys` replaces the bigram/unigram STRING join keys with their
    * 64-bit xxhash64 — the 100 TB path: the count-aggregation and join
    * shuffles carry 8-byte keys instead of arbitrary-length text (measured
    * ~2× shuffle-byte cut at 2M docs). A key collision would merge two
    * counts (odds ~|vocab|²/2⁶⁴ — vanishing, but nonzero, which is why the
    * exact string path stays the default and the oracle-checked form);
    * OperatorsSpec asserts both paths agree on the harness corpus.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
                hashedKeys: Boolean = false): DataFrame = {
    val toks = tokens(col(textCol))
    // bigram OCCURRENCES (with multiplicity — unlike the shingle SET).
    // Docs with <2 tokens are filtered BEFORE the index sequence is built:
    // sequence(1, n−1) with n=1 is the DESCENDING [1,0], whose element_at
    // lookups throw under ANSI mode.
    val key = (c: Column) => if (hashedKeys) xxhash64(c) else c
    val big = df.select(col(idCol), toks.as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__tk")) - 1),
        i => concat_ws(" ",
          element_at(col("__tk"), i), element_at(col("__tk"), i + 1)))).as("__bgs"))
      .select(col(idCol), key(col("__bgs")).as("bg"),
        key(split(col("__bgs"), " ", 2)(0)).as("w1"))
    val bcnt = big.groupBy(col("bg")).agg(count(lit(1)).as("b"))
    val ucnt = df.select(explode(toks).as("__w0"))
      .select(key(col("__w0")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("u"))
    val vocab = ucnt.agg(count(lit(1)).as("v"))
    big
      .join(bcnt, Seq("bg"))
      .join(ucnt.withColumnRenamed("w", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("t", round6(log((col("b") + lit(1.0)) / (col("u") + col("v"))))
        .cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round6(-(sum(col("t")).cast("double") / count(lit(1)))).as("nll"))
  }

  /** Data-selection importance weights (the DSIR recipe): score every
    * corpus doc by how much its unigram distribution looks like a target
    * domain — score(d) = Σ_w count_d(w) · ln(p_target(w) / p_raw(w)) with
    * add-one smoothing over the joint vocabulary. High scores mark docs
    * worth up-sampling when assembling a domain-tuned training mix; the
    * caller follows with `Sampling` (top-k, or rate ∝ score rank).
    *
    * Float discipline (same recipe as [[bigramNll]]): the per-word log
    * ratio rounds to 6 decimals and becomes DECIMAL(18,6); per-doc sums
    * multiply by exact occurrence counts and accumulate as DECIMAL —
    * order-independent, so the score is bit-identical across engines and
    * partitionings.
    *
    * Scale shape: two corpus-count aggregations (map-side combinable) +
    * one full-outer word-stats join + one join of per-(doc, word) postings
    * against the |vocab|-sized stats table on the word key + one per-doc
    * aggregation — all linear, nothing pairwise, nothing driver-side; the
    * three scalar totals ride in as broadcast one-row joins.
    */
  def importanceWeights(corpus: DataFrame, target: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // token OCCURRENCES (with multiplicity), not distinct sets: the DSIR
    // feature is the unigram count vector
    val rawPost = corpus.select(col(idCol), explode(toks).as("w"))
    val tgtPost = target.select(explode(toks).as("w"))
    val cr = rawPost.groupBy(col("w")).agg(count(lit(1)).as("cr"))
    val ct = tgtPost.groupBy(col("w")).agg(count(lit(1)).as("ct"))
    val word = cr.join(ct, Seq("w"), "full_outer").na.fill(0L, Seq("cr", "ct"))
    val nr = rawPost.agg(count(lit(1)).as("nr"))
    val nt = tgtPost.agg(count(lit(1)).as("nt"))
    val v = word.agg(count(lit(1)).as("v"))
    val term = word
      .crossJoin(broadcast(nr)).crossJoin(broadcast(nt)).crossJoin(broadcast(v))
      .withColumn("t",
        round6(log(((col("ct") + lit(1.0)) / (col("nt") + col("v"))) /
                   ((col("cr") + lit(1.0)) / (col("nr") + col("v")))))
          .cast("decimal(18,6)"))
      .select(col("w"), col("t"))
    rawPost.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .join(term, Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("t")).cast("double").as("score"))
  }

  /** Per-group corpus profile: doc count, total/mean token count, and
    * discrete token-count percentiles (the value at rank ⌈p·n⌉ — a real
    * member of the distribution, no interpolation). Interpolated
    * percentiles are deliberately avoided: Spark and DuckDB build the
    * interpolation from different expression trees, so the last ulp can
    * differ, while the discrete form is integer-exact in any engine.
    *
    * Scale shape: one hash aggregation to a (group, token-count)
    * histogram — linear, map-side combinable — then the cumulative sum
    * and rank selection run over histogram rows only (bounded by the
    * number of distinct document lengths per group, NOT by corpus size),
    * so the window sort never sees more than ~max-doc-length rows per
    * group. No corpus-wide sort anywhere.
    */
  def corpusStats(df: DataFrame, groupCol: String, textCol: String,
                  percentiles: Seq[(String, Double)] =
                    Seq("p50_tokens" -> 0.5, "p90_tokens" -> 0.9)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(percentiles.nonEmpty && percentiles.forall { case (_, p) => p > 0 && p <= 1 },
      s"percentiles must lie in (0, 1], got $percentiles")
    val hist = df
      .select(col(groupCol).as("grp"), size(tokens(col(textCol))).as("n_tok"))
      .groupBy(col("grp"), col("n_tok")).agg(count(lit(1)).as("__c"))
    val cum = hist.withColumn("__cum",
      sum(col("__c")).over(Window.partitionBy(col("grp")).orderBy(col("n_tok"))))
    val sizes = hist.groupBy(col("grp")).agg(
      sum(col("__c")).as("n_docs"),
      sum(col("n_tok").cast("long") * col("__c")).as("total_tokens"))
    val pickCols = percentiles.map { case (name, p) =>
      min(when(col("__cum") >= ceil(lit(p) * col("n_docs")), col("n_tok"))).as(name)
    }
    cum.join(sizes, Seq("grp"))
      .groupBy(col("grp"), col("n_docs"), col("total_tokens"))
      .agg(pickCols.head, pickCols.tail: _*)
      .withColumn("mean_tokens",
        col("total_tokens").cast("double") / col("n_docs"))
      .select(col("grp").as(groupCol) +: col("n_docs") +: col("total_tokens") +:
        col("mean_tokens") +: percentiles.map(p => col(p._1)): _*)
  }

  /** Per-doc top-k tokens by tf·idf (idf = ln(N/df), N = docs with ≥1
    * token). Scores are rounded to 6 decimals BEFORE ranking so order is
    * reproducible across engines; ties break by token.
    *
    * Scale shape: tf is a map-side-combinable hash agg; df aggregates the
    * (already tiny) per-doc term rows; N rides in as a broadcast scalar;
    * the final window partitions by doc — no unpartitioned window, no
    * driver-side vocabulary.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String, topK: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val tf = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(col(idCol)).distinct()
      .agg(count(lit(1)).cast("double").as("__n"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round6(col("tf") * log(col("__n") / col("df"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("token"), col("score"), col("rank"))
  }

  /** Corpus vocabulary: the `topK` most frequent tokens with counts,
    * keeping only tokens seen at least `minCount` times — the tokenizer-
    * training / vocab-pruning primitive.
    *
    * Scale shape: explode → map-side-combinable hash aggregation on the
    * token (vocabulary-sized, not corpus-sized, after partial agg), then
    * a distributed TakeOrdered for the top-k — no global sort, no
    * single-partition window, nothing driver-side beyond the k rows.
    * Ordering is total (count desc, token asc) so the cut is
    * deterministic and cross-engine-stable.
    */
  def vocabulary(df: DataFrame, textCol: String,
                 minCount: Long = 2L, topK: Int = 1000): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)

  /** Pairwise Jensen–Shannon divergence between the unigram distributions
    * of corpus groups (sources) — the distribution-level drift monitor
    * that complements the set-level overlap matrix (`Dedup.groupOverlap`):
    * two sources can share every token yet have wildly different usage.
    * JSD ∈ [0, 1] in bits; 0 = identical distributions, 1 = disjoint
    * support. Symmetric, always finite (unlike KL).
    *
    * JSD(P,Q) = Σ_t ½·p·log₂(p/m) + ½·q·log₂(q/m), m = (p+q)/2, with
    * 0·log(·) = 0. Per-term contributions round to 6 decimals and
    * accumulate as DECIMAL — order-independent and engine-exact (ln and
    * IEEE division agree across engines; the q56/q67 precedent).
    *
    * Scale shape: one (group, token) count aggregation; a (token × group)
    * scaffold fills absent cells with 0 (vocab·|groups| rows — groups are
    * few); the pair frame self-joins the scaffold on the token, so
    * per-token fan-out is bounded by |groups|², never the corpus — the
    * groupOverlap bound. Output is the |groups|²/2-row matrix.
    */
  def jsDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val counts = df.select(col(groupCol).as("grp"),
        explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("grp"), col("token")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("grp")).agg(sum(col("n")).as("tot"))
    // complete (token, grp) grid so absent tokens carry p = 0
    val grid = counts.select(col("token")).distinct()
      .crossJoin(broadcast(totals))
      .join(counts, Seq("token", "grp"), "left")
      .withColumn("p", coalesce(col("n"), lit(0L)).cast("double") / col("tot"))
      .select(col("token"), col("grp"), col("p"))
    val ln2 = math.log(2.0)
    val a = grid.select(col("token"), col("grp").as("grp_a"), col("p").as("pa"))
    val b = grid.select(col("token"), col("grp").as("grp_b"), col("p").as("pb"))
    val half = (p: Column, m: Column) =>
      when(p > 0.0, p * log(p / m) / lit(ln2) * 0.5).otherwise(lit(0.0))
    a.join(b, Seq("token")).filter(col("grp_a") < col("grp_b"))
      .withColumn("m", (col("pa") + col("pb")) / 2.0)
      .withColumn("__term",
        round6(half(col("pa"), col("m")) + half(col("pb"), col("m")))
          .cast("decimal(28,6)"))
      .groupBy(col("grp_a"), col("grp_b"))
      .agg(sum(col("__term")).cast("double").as("jsd_bits"))
  }

  /** Compression-ratio quality proxy: deflate(text).length / text.length —
    * the CCNet/RefinedWeb-family repetitiveness signal. Templated,
    * keyword-stuffed, or degenerate text compresses far below natural
    * prose, and the signal needs no token model, no vocabulary, and no
    * language assumption. Map-only codegen'd kernel (one deflate per row,
    * JDK zlib — no native deps); empty text scores 1.0. No SQL oracle
    * (DuckDB has no deflate) — behavior pinned by spec: repetitive ≪
    * diverse, bounds, determinism.
    */
  def compressionRatio(text: Column): Column = {
    val ex = org.apache.spark.sql.graftbridge.ColumnBridge.expr(text)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(DeflateRatio(ex))
  }

  /** Boolean inflate(deflate(text)) == text — the lossless-codec law
    * behind [[compressionRatio]], emitted in-query so the oracle can pin
    * it TRUE per row (q220/q106 pattern). Map-only codegen'd kernel.
    */
  def compressionRoundTrip(text: Column): Column = {
    val ex = org.apache.spark.sql.graftbridge.ColumnBridge.expr(text)
    org.apache.spark.sql.graftbridge.ColumnBridge.column(DeflateRoundTrip(ex))
  }

  /** Join-based blocklist matching — [[blocklistScreen]]'s scale path for
    * LARGE phrase lists (expression trees grow linearly with phrases; a
    * 100k-phrase list needs a join, not literals). Phrases are grouped by
    * word count L; for each L the corpus explodes token-aligned L-gram
    * hashes ONCE and inner-joins the (tiny, broadcast) phrase-hash frame.
    * Matching is token-aligned (a phrase can't match inside a longer
    * word — stricter than [[blocklistScreen]]'s substring arithmetic).
    *
    * Scale shape: Σ_L one explode + one broadcast join per distinct
    * phrase length (usually 1–3 lengths), then one per-doc aggregation;
    * the corpus shuffles once (the final group-by), phrase frames never
    * exceed the blocklist size.
    */
  def blocklistScreenJoin(df: DataFrame, idCol: String, textCol: String,
                          phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist must be non-empty")
    val norm = phrases.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
      .filter(_.nonEmpty).distinct
    require(norm.nonEmpty, "blocklist phrases must be non-blank")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = tokens(col(textCol))
    val byLen = norm.groupBy(_.split(" ").length)
    val hitFrames = byLen.toSeq.map { case (l, ps) =>
      // size guard first: sequence(1, n) with n <= 0 DESCENDS in Spark —
      // it would fabricate out-of-range grams, not an empty list
      val grams = df.filter(size(toks) >= l)
        .select(col(idCol), explode(transform(
          sequence(lit(1), size(toks) - (l - 1)),
          i => xxhash64(concat_ws(" ",
            (0 until l).map(j => element_at(toks, i + j)): _*)))).as("__g"))
      val phraseHashes = ps.toDF("__p").select(xxhash64(col("__p")).as("__g"))
      grams.join(broadcast(phraseHashes), Seq("__g"))
        .select(col(idCol))
    }
    val hits = hitFrames.reduce(_.unionByName(_))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_blocked"))
    df.select(col(idCol)).join(hits, Seq(idCol), "left")
      .withColumn("n_blocked", coalesce(col("n_blocked"), lit(0L)))
      .withColumn("clean", col("n_blocked") === 0L)
  }

  /** Token–label chi-square association: for every token, the χ² statistic
    * of its presence/absence contingency against a label column — the
    * feature-selection / SHORTCUT-LEAKAGE detector for labeled corpora
    * (a token with huge χ² against the label is either a great feature or
    * a leak, e.g. the label name embedded in the text).
    *
    * χ²_t = Σ_label [ (c_tl − E₁)²/E₁ + ((n_l − c_tl) − E₀)²/E₀ ] with
    * E₁ = df_t·n_l/N, E₀ = (N − df_t)·n_l/N; cells with zero expectation
    * contribute 0 (the standard convention — happens only when a token is
    * in every/no doc or a label is empty). Per-cell terms round to 6
    * decimals and accumulate as DECIMAL, so the statistic is
    * order-independent and engine-exact.
    *
    * Scale shape: distinct (doc, token) postings → one join against the
    * doc's label (projected, not the text) → a (token, label) count
    * aggregation; the absent cells come from a token×label scaffold
    * (|tokens|·|labels| rows — labels are few) left-joined against the
    * counts. Label marginals are a broadcast 1-row/label frame. Top-k by
    * (χ², token) via distributed TakeOrdered — no global sort.
    *
    * `minDf` is the scale lever (sklearn's `min_df`, the standard
    * feature-selection floor): a web corpus's distinct-token tail is
    * mostly hapax noise (ids, typos) whose χ² is statistically
    * meaningless anyway; dropping df < minDf tokens shrinks the scaffold
    * from |tokens|·|labels| to |recurring tokens|·|labels| — measured
    * 131 s → 31 s at 10M docs / 9.5M distinct tokens / 16 labels with
    * minDf=2 (Perf scalellm-r4d).
    */
  def chiSquareTokens(df: DataFrame, idCol: String, textCol: String,
                      labelCol: String, topK: Int = 100,
                      minDf: Long = 1L): DataFrame = {
    val round6 = (c: Column) => floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
    val post = df.select(col(idCol).as("__d"), col(labelCol).as("__l"),
        explode(array_distinct(tokens(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
    val ctl = post.groupBy(col("token"), col("__l")).agg(count(lit(1)).as("c"))
    val nl = df.groupBy(col(labelCol).as("__l")).agg(count(lit(1)).as("n_l"))
    val nTot = nl.agg(sum(col("n_l")).cast("double").as("n_all"))
    val dft = ctl.groupBy(col("token")).agg(sum(col("c")).as("df_t"))
      .filter(col("df_t") >= minDf)
    val scaffold = dft.crossJoin(broadcast(nl)).crossJoin(broadcast(nTot))
    val cells = scaffold.join(ctl, Seq("token", "__l"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val e1 = col("df_t") * col("n_l") / col("n_all")
    val e0 = (col("n_all") - col("df_t")) * col("n_l") / col("n_all")
    val term = (o: Column, e: Column) =>
      when(e > 0.0, round6((o - e) * (o - e) / e)).otherwise(lit(0.0))
        .cast("decimal(28,6)")
    cells
      .withColumn("__t1", term(col("c").cast("double"), e1))
      .withColumn("__t0", term((col("n_l") - col("c")).cast("double"), e0))
      .groupBy(col("token"))
      .agg(first(col("df_t")).as("df_t"),
        (sum(col("__t1")) + sum(col("__t0"))).cast("double").as("chi2"))
      .orderBy(col("chi2").desc, col("token").asc)
      .limit(topK)
  }

  /** Phrase-blocklist screening — the bad-content filter step of a corpus
    * pipeline (profanity/PII-phrase/spam-template lists): per doc, the
    * number of (non-overlapping, case-insensitive, whitespace-normalized)
    * occurrences of each blocklist phrase, a total, and a `clean` flag.
    *
    * Counting is replace-length arithmetic —
    * `(len(text) − len(replace(text, phrase))) / len(phrase)` — one
    * codegen'd scalar chain per phrase, no regex compilation, identical
    * semantics in any SQL engine. Map-only: the blocklist rides the
    * expression tree (phrases are literals), nothing joins, nothing
    * shuffles; at 100 TB this is a pure scan-stage filter like the PII
    * redaction pass (q48). For blocklists beyond a few hundred phrases,
    * switch to the shingle-hash semi-join shape ([[decontaminate]]) —
    * expression-tree size grows linearly with the phrase count.
    */
  def blocklistScreen(df: DataFrame, idCol: String, textCol: String,
                      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "blocklist must be non-empty")
    require(phrases.forall(_.trim.nonEmpty), "blocklist phrases must be non-blank")
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val hits = phrases.map { p =>
      val np = p.trim.toLowerCase.replaceAll("\\s+", " ")
      ((length(norm) - length(replace(norm, lit(np)))) / np.length).cast("long")
    }
    val total = hits.reduce(_ + _)
    df.select(col(idCol), total.as("n_blocked"), (total === 0L).as("clean"))
  }

  /** Filter-threshold retention sweep: for each group and each threshold
    * in the grid, the fraction of rows whose `score` is >= the threshold —
    * the calibration curve a pipeline owner reads before picking a quality
    * cutoff ("0.3 keeps 82% of web but only 41% of forums").
    *
    * Scale shape: ONE map-side-combinable hash aggregation computes every
    * threshold's count as a separate conditional-sum column (the grid is a
    * fixed small literal — no corpus-side explode, no join); the unpivot
    * back to (group, threshold) rows happens on the group-sized result.
    */
  def retentionCurve(df: DataFrame, groupCol: String, score: Column,
                     thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "threshold grid must be non-empty")
    val cnts = thresholds.zipWithIndex.map { case (t, i) =>
      sum(when(score >= t, 1L).otherwise(0L)).as(s"__c$i")
    }
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_total"), cnts: _*)
    val pairs = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"__c$i").as("n_retained"))
    }
    g.select(col(groupCol), col("n_total"), explode(array(pairs: _*)).as("__p"))
      .select(col(groupCol), col("__p.threshold").as("threshold"),
        col("n_total"), col("__p.n_retained").as("n_retained"))
      .withColumn("retention", col("n_retained").cast("double") / col("n_total"))
  }

  /** Heavy hitters: tokens with true count >= `minCount`, top-k by count
    * — [[vocabulary]]'s output, computed the way a 100 TB corpus needs.
    * A count–min sketch over the full token stream (one fixed-size
    * mergeable aggregation — [[graft.functions.CountMinFunctions]]) rides
    * a codegen'd probe back over the stream, and only tokens whose
    * ESTIMATE reaches `minCount` enter the exact count. CMS never
    * undercounts, so the prefilter is lossless: output is byte-identical
    * to the exact form (the DuckDB oracle checks against plain SQL).
    *
    * Why it matters at scale: a web corpus has billions of distinct tail
    * tokens (typos, ids, urls). The exact plan's map-side combine
    * degenerates — the hash table exceeds task memory and the whole tail
    * spills into the shuffle. The probe kills tail tokens inside the scan
    * stage (estimate < minCount), so the aggregation only ever sees heavy
    * candidates: shuffle volume drops from |distinct tokens| to
    * |candidates| ≈ |true heavy hitters| + collision noise (bounded by
    * 2N/width per the CMS guarantee — size `width` so 2N/width << minCount).
    *
    * Defaults are tuned for the PREFILTER role, not point estimation:
    * depth 2 (a false admit only adds a candidate the exact count
    * rejects — correctness never depends on depth) and a wide table
    * (2^20) to keep collision noise down. Measured at 10M docs / 9.5M
    * distinct tokens (Perf scalellm-r4c): depth 2 / 2^21 runs 8.8 s vs
    * 14.6 s exact — the depth-4 default of a generic estimator costs
    * double the update work for prefiltering that gains nothing from it.
    */
  def heavyHitters(df: DataFrame, textCol: String,
                   minCount: Long = 2L, topK: Int = 1000,
                   width: Int = 1 << 20,
                   depth: Int = 2): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = df.select(explode(tokens(col(textCol))).as("token"))
      .filter(length(col("token")) > 0)
    val sketch = graft.functions.CountMinFunctions.build(
      toks.select(xxhash64(col("token")).as("h")), "h", width, depth)
    toks.filter(graft.functions.CountMinFunctions.estimate(
        xxhash64(col("token")), sketch, depth) >= minCount)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(topK)
  }

  /** Feature-hashing bucket of a token: first 32 md5 bits (salted) mod
    * `dim` — the hashing-trick index (Weinberger et al.'s feature
    * hashing / the fastText input layer) that maps an unbounded token
    * space onto a fixed-width weight vector with no vocabulary dictionary
    * to build, broadcast, or keep consistent across batches.
    */
  def featureHash(token: Column, dim: Int, salt: String = "fh"): Column = {
    require(dim > 0, s"dim must be positive, got $dim")
    pmod(conv(substring(md5(concat(token, lit(salt))), 1, 8), 16, 10)
      .cast("long"), lit(dim.toLong))
  }

  /** Linear text-classifier scoring over a hashed bag of words: each
    * token occurrence maps to a bucket in a `dim`-wide weight vector and
    * the doc's score is the sum of its bucket weights — the
    * fastText/Vowpal-Wabbit-shaped quality/topic filter, scorable at
    * corpus scale with one explode and one hash aggregation (map-side
    * combinable; no vocabulary join, no model table shuffle).
    *
    * Weights here are a deterministic hash of the bucket index (uniform
    * in [-1, 1) — exactly representable doubles, so cross-engine-exact);
    * a trained model swaps in a real `weightOf` without touching the
    * plan shape, riding the expression as a broadcast array. Per-token
    * weights round to 6 decimals and accumulate as DECIMAL, so the score
    * is order-independent and bit-identical across engines.
    */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
                        dim: Int = 1 << 20, salt: String = "hlm"): DataFrame = {
    val post = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket", featureHash(col("tok"), dim, salt))
    val weight = conv(substring(md5(concat(lit("w"),
        col("bucket").cast("string"))), 1, 8), 16, 10)
      .cast("long") / lit(4294967296.0) * lit(2.0) - lit(1.0)
    post.withColumn("t", round6(weight).cast("decimal(18,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("t")).cast("double").as("score"))
  }

  /** BM25 relevance of every document against a bag of query terms:
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))` with the
    * classic `idf = ln((N − df + ½)/(df + ½) + 1)` — the retrieval
    * scorer to [[tfIdfTopTerms]]'s term extractor (RAG retrieval / CC
    * query-relevance mining over a corpus).
    *
    * Scale shape: NO posting explode anywhere. Per-doc term frequencies
    * and the doc length are array-fold expressions inside the scan
    * (query-sized work per row), so the corpus pass is ONE single-row
    * aggregate (N, Σdl, per-term document frequencies together), and
    * scoring is a map-only pass against that broadcast row — the
    * document text never shuffles. Per-term scores round to 6 decimals
    * and accumulate as DECIMAL (order-independent, cross-engine-exact;
    * ln and IEEE division agree across engines, established by
    * q56/q58/q67). Docs matching no term are dropped, and docs with
    * zero tokens count toward neither N nor avgdl — identical semantics
    * to the posting-list formulation the oracle runs.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val terms = queryTerms.distinct
    val tk = tokens(col(textCol))
    // after trim, split on \s+ emits an empty token ONLY for empty text,
    // so the non-empty token count needs no per-token filter pass
    val dl = when(length(trim(col(textCol))) === 0, lit(0L))
      .otherwise(size(tk).cast("long"))
    // all K term frequencies in ONE native pass over the token array
    // (each query term is its own single-word vocabulary)
    val withTf = df.select(col(idCol), dl.as("dl"),
        graft.functions.HashFunctions.tokenSetCounts(tk, terms.map(Seq(_))).as("tfs"))
      .filter(col("dl") > 0)
    val stats = withTf.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl")
        +: terms.indices.map(i =>
          sum((element_at(col("tfs"), i + 1) > 0).cast("long"))
            .cast("double").as(s"df_$i")): _*)
    val termScores = terms.indices.map { i =>
      val tf = element_at(col("tfs"), i + 1).cast("double")
      val dfd = col(s"df_$i")
      val idf = log((col("n_docs") - dfd + lit(0.5)) / (dfd + lit(0.5)) + lit(1.0))
      when(tf > 0, round6(
        (idf * (tf * lit(k1 + 1.0))) /
          (tf + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
        .cast("decimal(18,6)"))
    }
    val zero = lit(0).cast("decimal(18,6)")
    withTf.crossJoin(broadcast(stats))
      .withColumn("n_terms",
        terms.indices.map(i => (element_at(col("tfs"), i + 1) > 0).cast("long"))
          .reduce(_ + _))
      .filter(col("n_terms") > 0)
      .withColumn("score",
        termScores.map(coalesce(_, zero)).reduce(_ + _).cast("double"))
      .select(col(idCol), col("n_terms"), col("score"))
  }

  /** Bigram collocations by pointwise mutual information:
    * `pmi = ln(n(ab)·N / (n(a·)·n(·b)))` over adjacent token pairs, where
    * n(a·) / n(·b) count the bigram POSITIONS with that left / right word
    * (so the marginals sum to N exactly and PMI is a true log-ratio of
    * empirical probabilities). Pairs below `minCount` are dropped before
    * scoring — the standard noise floor, and it also bounds the scored
    * frame to the distinct-bigram vocabulary.
    *
    * Scale shape: one explode pass → three hash aggregations (bigram,
    * left-marginal, right-marginal — each map-side-combinable), two
    * equi-joins on single-word keys (vocabulary-sized build sides that
    * AQE broadcasts), one scalar N broadcast. PMI is rounded to 6
    * decimals before the deterministic (pmi desc, bigram asc) top-k cut,
    * which is a distributed TakeOrdered.
    */
  def collocations(df: DataFrame, textCol: String,
                   minCount: Long = 5L, topK: Int = 1000): DataFrame = {
    // docs with <2 tokens are filtered BEFORE the index sequence is
    // built: sequence(1, n−1) with n=1 is the DESCENDING [1,0], whose
    // element_at lookups throw under ANSI mode (same guard as bigramNll)
    val bigrams = df.select(tokens(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= 2)
      .select(explode(transform(
        sequence(lit(1), size(col("__tk")) - 1),
        i => struct(element_at(col("__tk"), i).as("w1"),
          element_at(col("__tk"), i + 1).as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .filter(length(col("w1")) > 0 && length(col("w2")) > 0)
    val pairCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_ab"))
    val leftCounts = pairCounts.groupBy(col("w1")).agg(sum(col("n_ab")).as("n_a"))
    val rightCounts = pairCounts.groupBy(col("w2")).agg(sum(col("n_ab")).as("n_b"))
    val total = pairCounts.agg(sum(col("n_ab")).cast("double").as("__n"))
    pairCounts.filter(col("n_ab") >= minCount)
      .join(leftCounts, Seq("w1"))
      .join(rightCounts, Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("pmi", round6(log(
        col("n_ab").cast("double") * col("__n") /
          (col("n_a").cast("double") * col("n_b").cast("double")))))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("n_ab"), col("pmi"))
  }

  /** Per-document n-gram novelty against a reference corpus: the fraction
    * of each candidate document's DISTINCT word k-shingles that appear in
    * no reference document. The "how much of this crawl is actually new
    * text?" readout that gates incremental corpus ingestion — near-zero
    * novelty means the batch is boilerplate or already-held content, a
    * novelty spike means a genuinely new source (or a template change
    * worth inspecting).
    *
    * Output: (id, n_shingles, n_novel, novelty ∈ [0,1]); candidate docs
    * with no shingles (shorter than k words) are absent, matching the
    * [[graft.operators.Dedup.ngramJaccard]] convention.
    *
    * Scale shape: shingles hash to 64 bits at the source, so the
    * reference set and the anti-join ship longs, never text (the q55/q59
    * no-collision equivalence: a collision can only HIDE one shingle's
    * novelty with probability ~|shingles|²/2⁶⁴). Both sides reduce to
    * DISTINCT (id, hash) / (hash) postings before joining — the
    * anti-join rides the hash partitioning, the corpus never reshuffles
    * as text, and per-doc ratios fall out of one hash aggregation.
    */
  /** Persist the reference side of [[ngramNovelty]] as a reusable index:
    * the DISTINCT 64-bit shingle hashes of the reference corpus
    * (~8 bytes per distinct shingle — a small fraction of corpus bytes).
    * Build once per reference snapshot; every incoming batch then probes
    * via [[ngramNoveltyProbe]] WITHOUT re-shingling the reference — the
    * same batch-sized-vs-corpus-sized steady-state split as the MinHash
    * probe (`minHashSigs`/`minHashProbe`) and the exact-dedup index.
    */
  def ngramNoveltyIndex(ref: DataFrame, textCol: String, k: Int = 3,
                        path: String): Unit =
    ref.select(Dedup.shingles(col(textCol), k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(explode(col("__sh")).as("__s"))
      .select(xxhash64(col("__s")).as("h")).distinct()
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)

  /** Probe a persisted [[ngramNoveltyIndex]] with a new batch: identical
    * output contract to [[ngramNovelty]] restricted to the batch docs,
    * at O(batch shingles + index) cost per ingestion instead of
    * re-shingling the whole reference corpus every time.
    */
  def ngramNoveltyProbe(batch: DataFrame, idCol: String, textCol: String,
                        indexPath: String, k: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    val ref = spark.read.parquet(indexPath).select(col("h").as("__h"))
    val cand = batch
      .select(col(idCol).as("id"), Dedup.shingles(col(textCol), k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), explode(col("__sh")).as("__s"))
      .withColumn("__h", xxhash64(col("__s")))
      .select(col("id"), col("__h")).distinct()
    val totals = cand.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val novel = cand.join(ref, Seq("__h"), "left_anti")
      .groupBy(col("id")).agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq("id"), "left")
      .na.fill(0L, Seq("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
  }

  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   isRef: Column, k: Int = 3): DataFrame = {
    val tagged = df.withColumn("__ref", isRef)
      .select(col(idCol).as("id"), col("__ref"),
        Dedup.shingles(col(textCol), k).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col("id"), col("__ref"),
        explode(col("__sh")).as("__s"))
      .withColumn("__h", xxhash64(col("__s")))
    val cand = tagged.filter(!col("__ref")).select(col("id"), col("__h")).distinct()
    val ref = tagged.filter(col("__ref")).select(col("__h")).distinct()
    val totals = cand.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val novel = cand.join(ref, Seq("__h"), "left_anti")
      .groupBy(col("id")).agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq("id"), "left")
      .na.fill(0L, Seq("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_shingles").cast("double"), 6))
  }
}

object TextKernels {
  /** deflate(utf8 bytes).length / byteLength; 1.0 for empty input.
    * A fresh Deflater per call — cheap relative to the compression
    * itself, and thread-safe under whole-stage codegen by construction.
    */
  def deflateRatio(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](raw.length + 64)
      var out = 0L
      while (!d.finished()) out += d.deflate(buf)
      out.toDouble / raw.length
    } finally d.end()
  }

  /** The compression law behind [[deflateRatio]], checkable in-query:
    * inflate(deflate(bytes)) must reproduce the input byte-for-byte
    * (deflate is lossless; a codec or buffer bug breaks this first).
    * True on empty input. Same thread-safety shape as [[deflateRatio]].
    */
  def deflateRoundTrip(s: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val raw = s.getBytes
    if (raw.length == 0) return true
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    val compressed = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        compressed.write(buf, 0, n)
      }
    } finally d.end()
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(compressed.toByteArray)
      val back = new Array[Byte](raw.length)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(back, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return false // truncated stream
        off += n
      }
      if (off != raw.length || !inf.finished()) return false
      java.util.Arrays.equals(back, raw)
    } catch {
      case _: java.util.zip.DataFormatException => false
    } finally inf.end()
  }
}

/** string → double deflate compression ratio (see TextAnalysis.compressionRatio). */
case class DeflateRatio(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    TextKernels.deflateRatio(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.operators.TextKernels.deflateRatio($s);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): DeflateRatio = copy(child = c)
}

/** string → boolean inflate(deflate(x)) == x (see TextKernels.deflateRoundTrip). */
case class DeflateRoundTrip(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types._
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    TextKernels.deflateRoundTrip(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.operators.TextKernels.deflateRoundTrip($s);")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): DeflateRoundTrip = copy(child = c)
}
