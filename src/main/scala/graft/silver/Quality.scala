package graft.silver

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality check operators (SURVEY.md §2.8).
  *
  * The reference's declared dbt test surface (readme.md:189-224) — each
  * check compiles to a query that must return zero rows. Here each is a
  * first-class operator returning the *violations* DataFrame, so a test is
  * `assert(check.isEmpty)` and production can route violations to a
  * quarantine sink.
  *
  * Scale: every check is a single scan + (for key checks) one hash
  * aggregation or broadcast-able anti-join — nothing quadratic, and filters
  * are Catalyst-pushed into the Parquet scan.
  */
object Quality {

  /** dbt `unique`: rows whose key occurs more than once. */
  def unique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_dupes"))
      .filter(col("n_dupes") > 1)

  /** dbt `not_null`: rows with a NULL in `column`. */
  def notNull(df: DataFrame, column: String): DataFrame =
    df.filter(col(column).isNull)

  /** dbt custom `positive_amount` (mirrors CHECK amount > 0,
    * postgres/schema.sql:27): non-positive or null amounts.
    */
  def positive(df: DataFrame, column: String): DataFrame =
    df.filter(col(column) <= 0 || col(column).isNull)

  /** dbt `accepted_values`: rows outside the allowed set. */
  def acceptedValues(df: DataFrame, column: String, allowed: Seq[String]): DataFrame =
    df.filter(!col(column).isin(allowed: _*) || col(column).isNull)

  /** dbt `relationships` (FK): child rows whose key has no parent
    * (readme.md:204-208). Anti-join; parent side is distinct-projected so a
    * small dimension broadcasts.
    */
  def relationships(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String): DataFrame =
    child.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** `assert_unique_current_records` (readme.md:218-224): more than one
    * current SCD2 row per key.
    */
  def uniqueCurrent(dim: DataFrame, keys: Seq[String], effectiveTo: String = "effective_to"): DataFrame =
    unique(dim.filter(col(effectiveTo).isNull), keys)

  /** Generic predicate check: rows violating `invariant`. */
  def expect(df: DataFrame, invariant: Column): DataFrame =
    df.filter(!coalesce(invariant, lit(false)))

  /** Aggregate reconciliation with z-score anomaly detection
    * (readme.md:250-252): groups whose aggregated `measure` deviates more
    * than `k` sample standard deviations from the mean of group totals.
    */
  def zscoreAnomalies(df: DataFrame, groupKeys: Seq[String], measure: String, k: Double = 3.0): DataFrame = {
    val totals = df.groupBy(groupKeys.map(col): _*)
      .agg(sum(col(measure)).as("group_total"))
    val stats = totals.agg(
      avg(col("group_total")).as("mu"),
      stddev_samp(col("group_total")).as("sigma"))
    totals.crossJoin(broadcast(stats))
      .withColumn("zscore", abs(col("group_total") - col("mu")) / col("sigma"))
      .filter(col("zscore") > k)
      .drop("mu", "sigma")
  }

  /** One-pass column profile: (col_name, n_rows, n_null, n_distinct) per
    * profiled column — the "what landed" readout after every ingest
    * batch, and the input to null-rate / cardinality drift alerts
    * between snapshots.
    *
    * Scale: ONE aggregation over one scan. The multi-column exact
    * `count(distinct)` plans as Spark's Expand (one input row fans to
    * one row per distinct-aggregate before partial aggregation) — cost
    * grows with the profiled column count, so profile the columns you
    * alert on, not `SELECT *`; swap exact distinct for
    * `approx_count_distinct` upstream if a sketch suffices (q83's
    * trade).
    */
  def profile(df: DataFrame, columns: Seq[String] = Nil): DataFrame = {
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cs.nonEmpty, "profile needs at least one column")
    val aggs = cs.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
      count_distinct(col(c)).as(s"__nd_$c"))) :+ count(lit(1)).as("__total")
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.map(c => struct(
        lit(c).as("col_name"),
        col("__total").as("n_rows"),
        col(s"__nn_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }

  /** Per-key rolling anomaly detection: flag a value that deviates more
    * than `k` standard deviations from the key's OWN preceding `window`
    * values (frame excludes the current row, so a spike can't mask
    * itself) — the per-account velocity/fraud screen the reference's
    * z-score reconciliation (readme.md:250-252) does only at
    * whole-group grain. Returns the flagged rows with their rolling
    * stats; rows whose history has fewer than `minPrior` points are
    * never flagged (no basis).
    *
    * Cross-engine exactness: amounts become exact cents (DECIMAL→LONG),
    * the window aggregates are integer SUM/SUM-of-squares/COUNT, and
    * mean/variance derive from those integers with one double division
    * each — every engine lands on identical bits, no streaming-variance
    * accumulation-order hazard. Ordering is (tsCol, tieCol) total order.
    *
    * Scale: one key-partition shuffle + in-partition sort shared by the
    * three window aggregates (Catalyst fuses them into one Window exec);
    * the same shape and skew bound as any per-key window.
    */
  def rollingAnomalies(df: DataFrame, keyCol: String, tsCol: String,
                       tieCol: String, valueCol: String,
                       window: Int = 7, k: Double = 3.0,
                       minPrior: Int = 3): DataFrame = {
    require(window >= 2 && minPrior >= 2 && minPrior <= window,
      s"need 2 <= minPrior <= window, got window=$window minPrior=$minPrior")
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-window, -1)
    val base = df.withColumn("__c", cents)
      .withColumn("__n", count(col("__c")).over(w))
      .withColumn("__s", sum(col("__c")).over(w))
      .withColumn("__q", sum(col("__c") * col("__c")).over(w))
    val nD = col("__n").cast("double")
    val mean = col("__s").cast("double") / nD
    val variance = (col("__n") * col("__q") - col("__s") * col("__s"))
      .cast("double") / (nD * (nD - lit(1.0)))
    val std = sqrt(variance)
    base
      .withColumn("roll_mean", mean / 100.0)
      .withColumn("roll_std", std / 100.0)
      // NULL when σ=0 (ANSI double division throws on /0; the flat-history
      // flag below still fires — NULL zscore + flagged row IS the signal)
      .withColumn("zscore",
        when(std =!= 0, (col("__c").cast("double") - mean) / std))
      .filter(col("__n") >= minPrior &&
        ((std > 0 && abs(col("__c").cast("double") - mean) > lit(k) * std) ||
          // flat history (σ=0): ANY deviation is anomalous (z → ±Inf)
          (std === 0 && col("__c").cast("double") =!= mean)))
      .drop("__c", "__n", "__s", "__q")
  }

  /** Benford first-significant-digit audit — the classic forensic
    * check for fabricated or double-posted monetary amounts (a natural
    * fit for the reference's banking transaction stream): per group, the
    * distribution of the leading digit of |amount| vs Benford's law
    * `P(d) = log10(1 + 1/d)`, with the per-digit chi-squared
    * contribution so callers can threshold `sum(chi2)` per group.
    *
    * Only rows with |amount| >= 1 participate (the leading digit of a
    * sub-unit amount is a scale artifact, not a signal).
    *
    * Scale: one scan + one (group, digit) hash aggregation; the
    * cumulative window runs over at most 9 rows per group. Expected
    * probabilities are compile-time literals, so the whole expression
    * stays inside whole-stage codegen.
    */
  def benford(df: DataFrame, amountCol: String, groupKeys: Seq[String] = Nil): DataFrame = {
    val gcols = groupKeys.map(col)
    val digit = substring(floor(abs(col(amountCol))).cast("bigint").cast("string"), 1, 1)
      .cast("int")
    val counts = df.filter(abs(col(amountCol)) >= 1)
      .select(gcols :+ digit.as("digit"): _*)
      .groupBy(gcols :+ col("digit"): _*)
      .agg(count(lit(1)).as("n"))
    val expected = (2 to 9).foldLeft(
      when(col("digit") === 1, lit(math.log10(2.0)))) { (acc, d) =>
      acc.when(col("digit") === d, lit(math.log10(1.0 + 1.0 / d)))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(gcols: _*)
    val withTotal = counts.withColumn("__total", sum(col("n")).over(w))
    val nD = col("n").cast("double")
    val totD = col("__total").cast("double")
    val dev = nD - col("expected_pct") * totD
    withTotal
      .withColumn("observed_pct", nD / totD)
      .withColumn("expected_pct", expected)
      .withColumn("chi2", dev * dev / (col("expected_pct") * totD))
      .drop("__total")
  }

  /** Run a suite of named checks and return one row per check:
    * (check_name, n_violations). The dbt `dbt test` summary as a DataFrame.
    */
  def summary(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, df) =>
      df.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    }.reduce(_ unionByName _)

  /** One-scan summary for row-level predicate checks: each named predicate
    * describes a VIOLATION; all counts come from a single aggregate over
    * one pass of `df`. At scale this replaces N full scans with one —
    * use for not_null/positive/accepted-values-style checks; key-based
    * checks (unique, relationships) still need their own shuffle and go
    * through `summary`.
    */
  def summaryOnePass(df: DataFrame, violations: Seq[(String, Column)]): DataFrame = {
    val aggs = violations.map { case (name, cond) =>
      sum(when(coalesce(cond, lit(false)), 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(map(
      violations.flatMap { case (name, _) =>
        Seq(lit(name), coalesce(col(name), lit(0L))) }: _*))
      .as(Seq("check_name", "n_violations")))
  }

  /** Value-containment profile of a candidate foreign-key edge: how much
    * of `child.childCol`'s distinct value set appears in
    * `parent.parentCol` — the schema-discovery primitive that PROPOSES
    * `relationships` tests for undocumented sources (containment 1.0 =
    * candidate FK; < 1.0 quantifies the orphan rate at distinct-value
    * granularity).
    *
    * Both sides reduce to DISTINCT non-null values before the join, so
    * the probe is dictionary-sized regardless of table volume; the
    * fraction is a division of two exact integers (engine-exact). Returns
    * one row: (edge, n_child_distinct, n_matched, containment, is_fk).
    */
  def containmentProfile(child: DataFrame, childCol: String,
                         parent: DataFrame, parentCol: String,
                         edge: String): DataFrame = {
    val c = child.select(col(childCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull).distinct()
    val p = parent.select(col(parentCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull).distinct()
      .withColumn("__hit", lit(1L))
    c.join(p, Seq("__v"), "left")
      .agg(count(lit(1)).as("n_child_distinct"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_matched"))
      .select(lit(edge).as("edge"), col("n_child_distinct"), col("n_matched"),
        (col("n_matched").cast("double") / col("n_child_distinct"))
          .as("containment"),
        (col("n_matched") === col("n_child_distinct")).as("is_fk"))
  }

  /** SCD2 history validity audit: per key ordered by `fromCol` (plus
    * `orderCols` tie-breaks), flag every row whose interval breaks the
    * chain contract — the check that catches a botched merge BEFORE a
    * point-in-time join silently double-counts:
    *
    *   negative_span             — effective_to < effective_from
    *   zero_span                 — effective_to = effective_from
    *     (same-instant churn; legal in some models, surfaced so the
    *     caller decides)
    *   open_interval_before_last — a NULL effective_to (a "current" row)
    *     with a later version after it (covers duplicate-current too)
    *   overlap                   — previous effective_to > this
    *     effective_from
    *   gap                       — previous effective_to < this
    *     effective_from (violation under the contiguous-history contract)
    *
    * Returns only violating rows (key, effective_from, violation); empty
    * = valid history. One key-partitioned window — the same shuffle the
    * SCD2 merge itself paid.
    */
  def scd2Audit(dim: DataFrame, keys: Seq[String], fromCol: String,
                toCol: String, orderCols: Seq[String] = Seq.empty): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(fromCol).asc +: col(toCol).asc_nulls_last +:
        orderCols.map(col(_).asc)): _*)
    dim
      .withColumn("__prev_to", lag(col(toCol), 1).over(w))
      .withColumn("__has_prev", lag(lit(1), 1).over(w))
      .withColumn("violation",
        when(col(toCol).isNotNull && col(toCol) < col(fromCol), "negative_span")
          .when(col(toCol).isNotNull && col(toCol) === col(fromCol), "zero_span")
          .when(col("__has_prev").isNotNull && col("__prev_to").isNull,
            "open_interval_before_last")
          .when(col("__prev_to") > col(fromCol), "overlap")
          .when(col("__prev_to") < col(fromCol), "gap"))
      .filter(col("violation").isNotNull)
      .select((keys.map(col) :+ col(fromCol) :+ col("violation")): _*)
  }

  /** Spearman rank correlation between two quality signals, per group —
    * "do my two scoring functions agree, per source?" is the standard
    * sanity check before gating a corpus on either (a filter whose two
    * proxies disagree is measuring noise).
    *
    * Exactness: average ranks (standard tie treatment) are computed as
    * INTEGER doubled ranks — 2·avgrank = rank_asc + (n+1) − rank_desc,
    * all from RANK() windows, so the rank frame is exact in both engines.
    * The Pearson formula then runs over exact BIGINT sums and converts to
    * DOUBLE only for the final quotient, which is bit-deterministic given
    * identical integer inputs. Degenerate groups (either signal constant)
    * return NULL rather than 0/0.
    *
    * Scale: one shuffle on `groupCol`; the four rank windows all share
    * that partitioning (re-sorts within partitions, no extra exchange),
    * and the moment sums are one map-side-combinable hash agg. The
    * BIGINT moments hold while n·(2n)² < 2⁶³ per group — n ≲ 10⁸ rows
    * per group; above that, sample per group first (rank correlation
    * stabilizes long before 10⁸ points).
    */
  def rankAgreement(df: DataFrame, groupCol: String,
                    xCol: String, yCol: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val g = W.partitionBy(col(groupCol))
    def doubledRank(c: String): Column =
      rank().over(g.orderBy(col(c).asc)) +
        (count(lit(1)).over(g) + 1) -
        rank().over(g.orderBy(col(c).desc))
    val ranked = df
      .withColumn("__rx", doubledRank(xCol).cast("long"))
      .withColumn("__ry", doubledRank(yCol).cast("long"))
    val m = ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("long").as("n_rows"),
      sum(col("__rx")).as("sx"), sum(col("__ry")).as("sy"),
      sum(col("__rx") * col("__ry")).as("sxy"),
      sum(col("__rx") * col("__rx")).as("sxx"),
      sum(col("__ry") * col("__ry")).as("syy"))
    val n = col("n_rows")
    val cov = (n * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (n * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col(groupCol), n.as("n_rows"),
      when(vx > 0 && vy > 0, round(cov / (sqrt(vx) * sqrt(vy)), 6))
        .as("spearman_rho"))
  }

  /** Pairwise Pearson correlation matrix over `cols`, long format
    * (col_x, col_y, n_rows, corr) for x < y — the feature-redundancy /
    * multicollinearity profiler beside [[rankAgreement]]'s
    * per-group rank form. Listwise deletion: rows with a null in ANY
    * profiled column are excluded, so every pair sees the same n (the
    * matrix stays positive semi-definite).
    *
    * Engine-exactness: all moments (Σx, Σx², Σxy) accumulate in
    * DECIMAL(18,6)-derived decimals — exact and order-independent; the
    * correlation itself is a fixed IEEE op tree over the decimal→double
    * conversions (correctly rounded in any engine), rounded to 6
    * decimals. Constant columns return NULL, not 0/0. ANSI mode makes
    * decimal overflow loud; headroom is |v| < 10¹² and n·v² < 10²⁶.
    *
    * Scale shape: ONE full-scan hash aggregation (map-side combinable)
    * producing a single row of k + k(k−1)/2 moments; the long-format
    * pivot is k(k−1)/2 selects over that 1-row frame — nothing after
    * the scan is data-sized.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame =
    corrFromMoments(corrMoments(df, cols), cols)

  private def corrPairs(cols: Seq[String]): Seq[(String, String)] =
    for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))

  /** The 1-row decimal moment frame behind [[corrMatrix]] — n, Σx, Σx²
    * per column, Σxy per pair. Every entry is ADDITIVE, which is what
    * makes the correlation monitor incremental: fold per-batch moment
    * rows by elementwise sum (see `streaming.MomentsStream`) and the
    * readout is EXACTLY the batch matrix over the accumulated rows.
    */
  def corrMoments(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.distinct.size == cols.size,
      s"corrMatrix needs >= 2 distinct columns, got $cols")
    def d6(c: String) = col(c).cast("decimal(18,6)")
    val aggCols: Seq[Column] =
      Seq(count(lit(1)).cast("long").as("__n")) ++
        cols.flatMap(c => Seq(sum(d6(c)).as(s"__s_$c"),
          sum(d6(c) * d6(c)).as(s"__ss_$c"))) ++
        corrPairs(cols).map { case (a, b) =>
          sum(d6(a) * d6(b)).as(s"__sp_${a}__$b") }
    df.na.drop(cols).groupBy().agg(aggCols.head, aggCols.tail: _*)
  }

  /** Long-format correlation readout from a moment frame. */
  def corrFromMoments(m: DataFrame, cols: Seq[String]): DataFrame = {
    // one explode over the 1-row aggregate — NOT a union of per-pair
    // selects, which would re-plan (and re-scan) the aggregate per pair
    val pairStructs = corrPairs(cols).map { case (a, b) =>
      val n = col("__n").cast("double")
      def dd(name: String) = col(name).cast("double")
      val cv = n * dd(s"__sp_${a}__$b") - dd(s"__s_$a") * dd(s"__s_$b")
      val va = n * dd(s"__ss_$a") - dd(s"__s_$a") * dd(s"__s_$a")
      val vb = n * dd(s"__ss_$b") - dd(s"__s_$b") * dd(s"__s_$b")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        when(va > 0 && vb > 0, round(cv / (sqrt(va) * sqrt(vb)), 6))
          .as("corr"))
    }
    m.select(col("__n"), explode(array(pairStructs: _*)).as("__p"))
      .select(col("__p.col_x"), col("__p.col_y"),
        col("__n").as("n_rows"), col("__p.corr"))
  }

  /** Ledger-continuity audit: gaps in a per-key monotone sequence —
    * missing statement numbers, skipped journal lines, dropped CDC
    * sequence ids. For each adjacent pair in key-ordered sequence
    * values with `next − prev > 1`, one output row naming the missing
    * range. Duplicate sequence values are NOT gaps (lag sees a 0/"-1"
    * step) — audit those with [[unique]]; null sequence values are
    * excluded up front.
    *
    * One lag window per key — a single shuffle, output bounded by the
    * number of gaps, never the ledger size.
    */
  def sequenceGaps(df: DataFrame, keyCols: Seq[String],
                   seqCol: String): DataFrame = {
    require(keyCols.nonEmpty, "sequenceGaps needs at least one key column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).asc)
    df.filter(col(seqCol).isNotNull)
      .withColumn("__prev", lag(col(seqCol), 1).over(w))
      .filter(col(seqCol) - col("__prev") > 1)
      .select(keyCols.map(col)
        :+ (col("__prev") + 1).as("gap_start")
        :+ (col(seqCol) - 1).as("gap_end")
        :+ (col(seqCol) - col("__prev") - 1).as("n_missing"): _*)
  }

  /** Functional-dependency violation audit: keys of `lhs` that map to
    * MORE than one distinct `rhs` value — "every account has exactly
    * one branch", "a nation key determines its region" made checkable.
    * The generalization of [[unique]] the declared-test surface lacks;
    * complements the FK *inference* pass (q143) by auditing the
    * attribute dependencies inference can't see. Null `rhs` values
    * assert nothing (distinct-count semantics) — a group of {A, null}
    * is consistent.
    *
    * One hash aggregation with a distinct-count on the determinant
    * tuple; output only the violating groups.
    */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdViolations needs at least one determinant column")
    df.groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_rows"),
        countDistinct(col(rhs)).cast("long").as("n_distinct"))
      .filter(col("n_distinct") > 1)
  }

  /** k-anonymity audit + keyed pseudonymization — the governance pass a
    * training corpus carrying user-derived rows needs before export: the
    * direct identifier is replaced by a salted SHA-256 pseudonym (stable
    * across runs for the same salt, unlinkable without it), and every
    * row is labeled with its quasi-identifier group size so rows whose
    * combination of quasi-identifiers is shared by fewer than k records
    * (re-identifiable by linkage) can be suppressed or generalized.
    *
    * Returns every row with (pseud_id, quasi..., group_n, suppressed);
    * the export filter is `!suppressed`, the audit metric is
    * `avg(suppressed)`. One shuffle on the quasi-identifier tuple (the
    * group-size window); the hash is map-side. The quasi columns should
    * already be generalized (banded/bucketed) by the caller — raw
    * high-cardinality quasi-identifiers make every group size 1.
    */
  def kAnonymity(df: DataFrame, idCol: String, quasiCols: Seq[String],
                 k: Int, salt: String): DataFrame = {
    val g = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    df.withColumn("pseud_id",
        sha2(concat_ws("|", lit(salt), col(idCol).cast("string")), 256))
      .withColumn("group_n", count(lit(1)).over(g).cast("long"))
      .withColumn("suppressed", col("group_n") < k)
      .select((col("pseud_id") +: quasiCols.map(col) :+
        col("group_n") :+ col("suppressed")): _*)
  }

  /** l-diversity audit — the companion check [[kAnonymity]] cannot make:
    * a quasi-identifier group can be large (k-anonymous) yet still leak
    * the SENSITIVE attribute if every member shares one value (the
    * homogeneity attack). Per quasi-identifier group: size, number of
    * distinct sensitive values, and whether it meets the `l` floor; the
    * export rule is "suppress or generalize groups where NOT diverse".
    * Null sensitive values are not counted as a diversity value
    * (standard distinct semantics — an absent attribute discloses
    * nothing).
    *
    * One hash aggregation on the quasi tuple with a distinct-count —
    * partial-aggregable, no window, no join; group-count output, not
    * row count.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("group_n"),
        countDistinct(col(sensitiveCol)).cast("long").as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** Gini concentration of an exact-cents measure per group — the
    * inequality readout behind both banking forensics ("is one customer
    * moving most of the money in this segment?") and corpus governance
    * ("is one source contributing most of the training tokens?"). 0 =
    * perfectly even, →1 = one key holds everything.
    *
    * Exactness: the standard rank formula
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over values sorted ascending —
    * all moments are BIGINT over integer cents (tied values contribute
    * a rank-run sum that is order-independent, and the (value, key)
    * tie-break makes the rank frame itself engine-identical anyway);
    * one double division at the end, rounded. Negative totals (possible
    * with signed balances) return NULL — Gini is undefined there.
    *
    * Scale: one shuffle on the group key; the rank window and the moment
    * agg share it. Same BIGINT headroom note as [[rankAgreement]].
    */
  def gini(df: DataFrame, groupCol: String, keyCol: String,
           centsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(centsCol).asc, col(keyCol).asc)
    val m = df
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(groupCol)).agg(
        count(lit(1)).cast("long").as("n_keys"),
        sum(col(centsCol)).as("total_cents"),
        sum(col("__i") * col(centsCol)).as("six"))
    m.select(col(groupCol), col("n_keys"), col("total_cents"),
      when(col("total_cents") > 0,
        round((lit(2) * col("six") - (col("n_keys") + 1) * col("total_cents"))
          .cast("double") /
          (col("n_keys") * col("total_cents")).cast("double"), 6))
        .as("gini"))
  }

  /** Per-stream daily-volume trend: OLS slope/intercept of events-per-day
    * against the day index since the stream's first day — the drift
    * detector behind "this topic's volume is decaying / ramping" alerts,
    * and the shape a metrics warehouse fits per series at refresh time.
    *
    * Day counts and day indices are exact integers, so the OLS moments
    * (Σx, Σy, Σxy, Σx²) are exact BIGINTs; slope and intercept are then
    * single double quotients (rounded), deterministic across engines.
    * Days with zero events contribute nothing to the fit (the fit is
    * over OBSERVED days — callers wanting zero-filled days can scaffold
    * with [[graft.gold.Marts.dailySnapshot]] semantics first).
    *
    * Scale: events collapse to (stream, day) counts in one
    * map-side-combinable agg before anything else; the fit runs on
    * day-cardinality rows. Two shuffles on the stream key, both over
    * the collapsed frame.
    */
  def dailyTrend(df: DataFrame, streamCol: String, tsCol: String): DataFrame = {
    val daily = df
      .groupBy(col(streamCol), to_date(col(tsCol)).as("__day"))
      .agg(count(lit(1)).cast("long").as("__y"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(streamCol))
    val xy = daily
      .withColumn("__x",
        datediff(col("__day"), min(col("__day")).over(w)).cast("long"))
    val m = xy.groupBy(col(streamCol)).agg(
      count(lit(1)).cast("long").as("n_days"),
      sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
      sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"))
    val n = col("n_days")
    val det = (n * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")).cast("double") / det
    m.select(col(streamCol), n.as("n_days"),
      when(det > 0, round(slope, 6)).as("slope"),
      when(det > 0,
        round((col("sy").cast("double") - slope * col("sx").cast("double")) /
          n.cast("double"), 6)).as("intercept"))
  }

  /** Event-time lateness profile — the measurement that sizes a
    * watermark. For each event, lateness = how far its event time sits
    * behind the maximum event time already seen in arrival order within
    * its stream (0 for in-order arrivals); the per-stream readout is the
    * out-of-order rate, the worst case, and the exact p99 — "set
    * `withWatermark` to the p99 and you drop 1% of late data" becomes a
    * measured statement instead of a guess.
    *
    * Exact p99 without a global sort: lateness values collapse to a
    * (stream, lateness) histogram, a running-count window over that
    * (small) histogram finds the smallest value covering 99% — the
    * `percentilesExact` construction. Scale: one shuffle on the stream
    * key for the arrival-order window (the same partitioning the
    * histogram agg then reuses), histogram cardinality is bounded by
    * distinct lateness seconds, not event volume.
    */
  def latenessProfile(df: DataFrame, streamCol: String, arrivalCol: String,
                      tsCol: String, pct: Int = 99): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val seen = W.partitionBy(col(streamCol)).orderBy(col(arrivalCol))
      .rowsBetween(W.unboundedPreceding, -1)
    val late = df
      .withColumn("__late_s",
        greatest(lit(0L),
          unix_timestamp(max(col(tsCol)).over(seen)) -
            unix_timestamp(col(tsCol))))
    val hist = late.groupBy(col(streamCol), col("__late_s"))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val cum = W.partitionBy(col(streamCol)).orderBy(col("__late_s").asc)
      .rowsBetween(W.unboundedPreceding, 0)
    val whole = W.partitionBy(col(streamCol))
    hist
      .withColumn("cm", sum(col("cnt")).over(cum))
      .withColumn("n_events", sum(col("cnt")).over(whole))
      .withColumn("n_late",
        sum(when(col("__late_s") > 0, col("cnt")).otherwise(0L)).over(whole))
      .withColumn("max_late_s", max(col("__late_s")).over(whole))
      .filter(col("cm") * 100 >= lit(pct) * col("n_events"))
      .groupBy(col(streamCol), col("n_events"), col("n_late"),
        col("max_late_s"))
      .agg(min(col("__late_s")).as("p_late_s"))
      .select(col(streamCol), col("n_events").cast("long"),
        col("n_late").cast("long"), col("max_late_s").cast("long"),
        col("p_late_s").cast("long"))
  }

  /** Per-group Wilson score interval for a boolean rate — the readout
    * q111's z-test feeds: instead of "is B better than A", "how sure are
    * we about THIS group's rate" (small-n safe where the normal interval
    * `p ± z·√(p(1−p)/n)` collapses or escapes [0,1]).
    *
    * Engine determinism: counts are exact integers; the closed form is a
    * fixed tree of IEEE operations (each correctly rounded, evaluated in
    * the same order by both engines — `z²` is computed as `z·z` from the
    * same literal, never a pre-rounded decimal constant), and the three
    * outputs round to 6 decimals. One map-side-combinable aggregation;
    * output cardinality = groups.
    */
  def wilsonCi(df: DataFrame, groupCol: String, success: Column,
               z: Double = 1.96): DataFrame = {
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).cast("long").as("n"),
      sum(when(success, 1L).otherwise(0L)).cast("long").as("k"))
    val n = col("n").cast("double")
    val k = col("k").cast("double")
    val z2 = lit(z) * lit(z)
    val phat = k / n
    val denom = lit(1.0) + z2 / n
    val center = (phat + z2 / (lit(2.0) * n)) / denom
    val half = (lit(z) *
      sqrt(phat * (lit(1.0) - phat) / n + z2 / (lit(4.0) * n * n))) / denom
    agg.select(col(groupCol), col("n"), col("k"),
      round(phat, 6).as("p_hat"),
      round(center - half, 6).as("ci_lo"),
      round(center + half, 6).as("ci_hi"))
  }

  /** Period-over-period volume growth per stream: counts per calendar
    * period (ISO week via `date_trunc`), each period compared to the
    * stream's PREVIOUS OBSERVED period (lag, not calendar-adjacent — a
    * silent week shows up as a large drop in the next observed one, which
    * is the alert you want). `growth_pct` is null for a stream's first
    * period and when the previous period is empty.
    *
    * Scale shape: events collapse to (stream, period) counts FIRST
    * (map-side combinable), so the lag window rides period cardinality —
    * bounded by the calendar × streams, never event volume.
    *
    * Null timestamps collapse to a null week; the lag window orders that
    * row LAST explicitly (Spark windows default NULLS FIRST, DuckDB's
    * NULLS LAST) so both engines chain prev_n identically even when a
    * stream carries unparseable timestamps.
    */
  def periodGrowth(df: DataFrame, streamCol: String,
                   tsCol: String): DataFrame = {
    val weekly = df
      .groupBy(col(streamCol),
        date_trunc("week", col(tsCol)).cast("date").as("week_start"))
      .agg(count(lit(1)).cast("long").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(streamCol)).orderBy(col("week_start").asc_nulls_last)
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("delta", col("n") - col("prev_n"))
      .withColumn("growth_pct",
        when(col("prev_n") > 0,
          round((col("n") - col("prev_n")).cast("double") * lit(100.0) /
            col("prev_n").cast("double"), 6)))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per group: the max
    * absolute gap between the empirical CDFs of `valueCol` on the two
    * sides of `isRight` (reference vs current corpus snapshot, before vs
    * after a pipeline change). The standard "did this column's
    * distribution move?" alarm for training-data refreshes — sensitive
    * anywhere the CDFs separate, unlike mean/variance checks.
    *
    * Scale shape (the [[graft.operators.TextAnalysis.percentilesExact]]
    * histogram pattern): one (group, value) aggregation counting each
    * side — bounded by the metric domain × groups, never the corpus —
    * then per-group cumulative windows over distinct values and a
    * broadcast of per-group side totals. The corpus is scanned once and
    * never shuffles. Each candidate gap is rounded to 6 decimals BEFORE
    * the max so both engines pick the same supremum; groups missing a
    * side report a null statistic rather than a division by zero.
    */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              isRight: Column): DataFrame = {
    val tagged = df.filter(col(valueCol).isNotNull)
      .withColumn("__r", isRight)
    val c = tagged.groupBy(col(groupCol), col(valueCol))
      .agg(sum(when(col("__r"), 0L).otherwise(1L)).as("__ca"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("__cb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = c.withColumn("__cumA", sum(col("__ca")).over(w))
      .withColumn("__cumB", sum(col("__cb")).over(w))
    // side totals fold out of the histogram — re-aggregating the corpus
    // for them would double the scan count for no information
    val tot = c.groupBy(col(groupCol))
      .agg(sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"))
    cum.join(broadcast(tot), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(when(col("n_a") > 0 && col("n_b") > 0,
          round(abs(col("__cumA").cast("double") / col("n_a").cast("double") -
            col("__cumB").cast("double") / col("n_b").cast("double")), 6)))
          .as("ks"))
  }

  /** Population Stability Index per group: bin `valueCol` into `bins`
    * equal-width buckets over the group's combined [min, max], compare
    * the two sides' bin shares with `Σ (p_a − p_b)·ln(p_a/p_b)`. The
    * banking-world drift score (rule of thumb: <0.1 stable, >0.25 act) —
    * complements [[ksDrift]]: PSI localizes WHERE mass moved, KS is
    * assumption-free about binning.
    *
    * Engine parity: bin ids come from one fixed op tree
    * `floor((v−mn)·bins/(mx−mn))` capped at bins−1 (identical IEEE ops
    * both sides); bin shares are Laplace-smoothed (+1 per bin) so empty
    * bins contribute finite terms; each ln term rounds to 6 decimals and
    * accumulates in DECIMAL — order-independent, like the q58 NLL sum.
    *
    * Scale shape: one pass to (group, bin, side) counts (map-side
    * combinable, output ≤ groups × bins), a broadcast of per-group
    * extremes/totals, and a bins-sized scaffold join so empty bins
    * surface. A degenerate group (mx == mn) lands everything in bin 0 on
    * both sides → PSI 0, not a division error.
    */
  def psiDrift(df: DataFrame, valueCol: String, groupCol: String,
               isRight: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val v = col(valueCol).cast("double")
    val tagged = df.filter(col(valueCol).isNotNull).withColumn("__r", isRight)
    val ext = tagged.groupBy(col(groupCol))
      .agg(min(v).as("__mn"), max(v).as("__mx"),
        sum(when(col("__r"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("n_b"))
    val binned = tagged.join(broadcast(ext), Seq(groupCol))
      .withColumn("__bin",
        when(col("__mx") > col("__mn"),
          least(lit(bins - 1),
            floor((v - col("__mn")) * lit(bins) / (col("__mx") - col("__mn")))
              .cast("int")))
          .otherwise(lit(0)))
    val counts = binned.groupBy(col(groupCol), col("__bin"))
      .agg(sum(when(col("__r"), 0L).otherwise(1L)).as("__ca"),
        sum(when(col("__r"), 1L).otherwise(0L)).as("__cb"))
    val scaffold = ext.select(col(groupCol), col("n_a"), col("n_b"),
      explode(sequence(lit(0), lit(bins - 1))).as("__bin"))
    val pa = (col("__ca") + lit(1.0)) / (col("n_a") + lit(bins).cast("double"))
    val pb = (col("__cb") + lit(1.0)) / (col("n_b") + lit(bins).cast("double"))
    scaffold.join(counts, Seq(groupCol, "__bin"), "left")
      .na.fill(0L, Seq("__ca", "__cb"))
      .withColumn("__t",
        round6((pa - pb) * log(pa / pb)).cast("decimal(18,6)"))
      .groupBy(col(groupCol))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("__t")).cast("double").as("psi"))
  }

  /** Reference histogram for PERSISTED-reference PSI (the streaming
    * form): per group, bin edges FROZEN from the reference window's
    * min/max plus per-bin reference counts. Freezing the edges is what
    * [[psiDrift]] (which derives them from the combined data) cannot
    * give a stream: with fixed edges, the current-window histogram is
    * ADDITIVE — two batches' histograms sum bin-wise — so a drift
    * monitor folds each micro-batch in O(batch) and reads PSI in
    * O(groups × bins) against this one persisted frame, never
    * re-scanning the reference corpus (the q172 novelty-probe pattern
    * applied to drift). Output: one row per (group, bin):
    * (group, __bin, ref_n, n_ref, __mn, __mx).
    */
  def psiReferenceHist(ref: DataFrame, valueCol: String, groupCol: String,
                       bins: Int = 10): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    val v = col(valueCol).cast("double")
    val t = ref.filter(col(valueCol).isNotNull)
    val ext = t.groupBy(col(groupCol))
      .agg(min(v).as("__mn"), max(v).as("__mx"),
        count(lit(1)).as("n_ref"))
    val binned = t.join(broadcast(ext), Seq(groupCol))
      .withColumn("__bin", refBin(v, bins))
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("ref_n"))
    ext.select(col(groupCol), col("n_ref"), col("__mn"), col("__mx"),
        explode(sequence(lit(0), lit(bins - 1))).as("__bin"))
      .join(binned, Seq(groupCol, "__bin"), "left")
      .na.fill(0L, Seq("ref_n"))
  }

  /** Bin index against frozen reference edges; out-of-range current
    * values clamp into the edge bins (the reference window never saw
    * them, but they still carry drift mass).
    */
  private def refBin(v: Column, bins: Int): Column =
    when(col("__mx") > col("__mn"),
      greatest(lit(0), least(lit(bins - 1),
        floor((v - col("__mn")) * lit(bins) / (col("__mx") - col("__mn")))
          .cast("int"))))
      .otherwise(lit(0))

  /** Histogram of a current batch/window against the reference's frozen
    * edges — the additive per-batch delta of the streaming fold. Groups
    * absent from the reference are dropped (PSI is only defined against
    * a reference distribution). Output: (group, __bin, cur_n).
    */
  def psiCurrentHist(cur: DataFrame, refHist: DataFrame, valueCol: String,
                     groupCol: String, bins: Int = 10): DataFrame = {
    val v = col(valueCol).cast("double")
    val edges = refHist.select(col(groupCol), col("__mn"), col("__mx"))
      .distinct()
    cur.filter(col(valueCol).isNotNull)
      .join(broadcast(edges), Seq(groupCol))
      .withColumn("__bin", refBin(v, bins))
      .groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("cur_n"))
  }

  /** PSI readout from the two histograms — O(groups × bins), no corpus
    * access. Same smoothing, per-term round6, and exact decimal sum as
    * [[psiDrift]], so the result is cross-engine-exact.
    */
  def psiFromHists(refHist: DataFrame, curHist: DataFrame, groupCol: String,
                   bins: Int = 10): DataFrame = {
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val nCur = curHist.groupBy(col(groupCol))
      .agg(sum(col("cur_n")).as("n_cur"))
    val pr = (col("ref_n") + lit(1.0)) / (col("n_ref") + lit(bins).cast("double"))
    val pc = (col("cur_n") + lit(1.0)) / (col("n_cur") + lit(bins).cast("double"))
    refHist.join(curHist, Seq(groupCol, "__bin"), "left")
      .na.fill(0L, Seq("cur_n"))
      .join(broadcast(nCur), Seq(groupCol), "left")
      .na.fill(0L, Seq("n_cur"))
      .withColumn("__t", round6((pr - pc) * log(pr / pc)).cast("decimal(18,6)"))
      .groupBy(col(groupCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        sum(col("__t")).cast("double").as("psi"))
  }

  /** Batch form of the persisted-reference readout: PSI of `cur` vs
    * `ref` with edges frozen from `ref` — what the streaming fold
    * converges to after any batch split (the equivalence DriftStreamSpec
    * pins).
    */
  def psiAgainstReference(ref: DataFrame, cur: DataFrame, valueCol: String,
                          groupCol: String, bins: Int = 10): DataFrame = {
    val rh = psiReferenceHist(ref, valueCol, groupCol, bins)
    psiFromHists(rh, psiCurrentHist(cur, rh, valueCol, groupCol, bins),
      groupCol, bins)
  }

  /** Binned two-sample KS from the same persisted histograms: max gap
    * between the binned ECDFs — [[ksDrift]]'s alarm served by the
    * streaming monitor's state (exact KS needs the full value-level
    * ECDF, which a fold cannot keep bounded; the binned form
    * under-estimates the true statistic by at most the in-bin mass, the
    * standard monitoring trade). Gaps round to 6 dp BEFORE the max (the
    * q159 discipline) so both engines elect the same supremum; an empty
    * current window reads NULL, not a division error. O(groups × bins).
    */
  def ksFromHists(refHist: DataFrame, curHist: DataFrame,
                  groupCol: String): DataFrame = {
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("__bin").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val nCur = curHist.groupBy(col(groupCol))
      .agg(sum(col("cur_n")).as("n_cur"))
    refHist.join(curHist, Seq(groupCol, "__bin"), "left")
      .na.fill(0L, Seq("cur_n"))
      .join(broadcast(nCur), Seq(groupCol), "left")
      .na.fill(0L, Seq("n_cur"))
      .withColumn("__cra", sum(col("ref_n")).over(w))
      .withColumn("__crb", sum(col("cur_n")).over(w))
      .withColumn("__gap",
        round6(abs(col("__cra").cast("double") / col("n_ref")
          - col("__crb").cast("double") / col("n_cur"))))
      .groupBy(col(groupCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        when(max(col("n_cur")) > 0, max(col("__gap"))).otherwise(lit(null))
          .cast("double").as("ks"))
  }

  /** Batch form of the binned-KS readout (the DriftStreamSpec
    * equivalence target).
    */
  def ksAgainstReference(ref: DataFrame, cur: DataFrame, valueCol: String,
                         groupCol: String, bins: Int = 10): DataFrame = {
    val rh = psiReferenceHist(ref, valueCol, groupCol, bins)
    ksFromHists(rh, psiCurrentHist(cur, rh, valueCol, groupCol, bins),
      groupCol)
  }

  /** Reference category counts for CATEGORICAL drift — the discrete
    * sibling of [[psiReferenceHist]]: per (group, category) reference
    * counts plus the group total. No edges to freeze (categories are
    * their own bins), so the current-window counts are additive as-is.
    * Output: (group, cat, ref_n, n_ref).
    */
  def catReferenceHist(ref: DataFrame, catCol: String,
                       groupCol: String): DataFrame = {
    val counts = ref.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("ref_n"))
    val tot = counts.groupBy(col(groupCol)).agg(sum(col("ref_n")).as("n_ref"))
    counts.join(broadcast(tot), Seq(groupCol))
  }

  /** Current-window category counts: (group, cat, cur_n). */
  def catCurrentHist(cur: DataFrame, catCol: String,
                     groupCol: String): DataFrame =
    cur.filter(col(catCol).isNotNull)
      .groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("cur_n"))

  /** Total-variation distance between reference and current category
    * mixes, per group: TVD = ½ Σ|p_ref − p_cur| over the UNION of
    * categories (a category the reference never saw carries its whole
    * current share — exactly the "new enum value shipped" alarm) — the
    * L1 drift readout for columns where equal-width bins make no sense.
    * Terms round6→DECIMAL before the sum (order-independent,
    * engine-exact); groups absent from the reference are dropped; an
    * empty current window reads NULL. O(groups × categories).
    */
  def tvdFromHists(refHist: DataFrame, curHist: DataFrame, catCol: String,
                   groupCol: String): DataFrame = {
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val nCur = curHist.groupBy(col(groupCol))
      .agg(sum(col("cur_n")).as("n_cur"))
    val nRef = refHist.select(col(groupCol), col("n_ref")).distinct()
    refHist.drop("n_ref")
      .join(curHist, Seq(groupCol, catCol), "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .join(broadcast(nRef), Seq(groupCol))
      .join(broadcast(nCur), Seq(groupCol), "left")
      .na.fill(0L, Seq("n_cur"))
      .withColumn("__t",
        round6(abs(col("ref_n").cast("double") / col("n_ref")
          - col("cur_n").cast("double") / col("n_cur")))
          .cast("decimal(18,6)"))
      .groupBy(col(groupCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        when(max(col("n_cur")) > 0,
          sum(col("__t")).cast("double") / lit(2))
          .otherwise(lit(null)).cast("double").as("tvd"))
  }

  /** Batch form of the categorical-drift readout. */
  def tvdAgainstReference(ref: DataFrame, cur: DataFrame, catCol: String,
                          groupCol: String): DataFrame =
    tvdFromHists(catReferenceHist(ref, catCol, groupCol),
      catCurrentHist(cur, catCol, groupCol), catCol, groupCol)

  /** Median-absolute-deviation anomaly screen: rows whose deviation from
    * their group's median exceeds `k`× the group's MAD — the heavy-tail-
    * robust complement of [[zscoreAnomalies]] (one fat outlier inflates a
    * mean/σ enough to hide a second one; medians don't move). Intended
    * for an INTEGER measure (exact cents) so every comparison is
    * integer-exact across engines.
    *
    * Flagged rows come back with `med`, `mad`, `dev` appended. A
    * degenerate group (MAD 0: over half its values identical) flags ANY
    * deviating row — same contract as `rollingAnomalies`' σ=0 branch:
    * a constant stream deviating at all IS the anomaly.
    *
    * Scale shape: ONE corpus aggregation builds the (group, value)
    * histogram; the median falls out of it, and the DEVIATION histogram
    * is a map-only transform of the same frame (|v − med| carries its
    * value's count), so the MAD never touches the corpus again. The
    * second and last corpus scan emits the flagged rows through two
    * broadcast joins. All percentile decisions use the integer
    * `cum·2 ≥ n` compare ([[graft.operators.TextAnalysis.percentilesExact]]'s
    * PERCENTILE_DISC construction), windows ride distinct values only.
    */
  def madAnomalies(df: DataFrame, valueCol: String, groupCol: String,
                   k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // PERCENTILE_DISC(50) off a weighted histogram: smallest value whose
    // cumulative weight reaches half the group total (cum·2 ≥ n ⟺
    // cum·100 ≥ 50·n for integer cum)
    def p50(hist: DataFrame, valCol: String, outCol: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol)).orderBy(col(valCol).asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
      val tot = hist.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
      cum.join(broadcast(tot), Seq(groupCol))
        .filter(col("__cum") * 2 >= col("__n"))
        .groupBy(col(groupCol)).agg(min(col(valCol)).as(outCol))
    }
    // Nulls are excluded up front (same discipline as ksDrift): Spark
    // sorts them NULLS FIRST where DuckDB sorts NULLS LAST, so a null
    // value inside the histogram would shift every cumulative total —
    // and a null can never be an anomaly verdict anyway.
    val dfv = df.filter(col(valueCol).isNotNull)
    val hist = dfv.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__c"))
    val med = p50(hist, valueCol, "med")
    val devHist = hist.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col(valueCol) - col("med")).as("__dev"),
        col("__c"))
      .groupBy(col(groupCol), col("__dev")).agg(sum(col("__c")).as("__c"))
    val mad = p50(devHist, "__dev", "mad")
    dfv.join(broadcast(med), Seq(groupCol))
      .withColumn("dev", abs(col(valueCol) - col("med")))
      .join(broadcast(mad), Seq(groupCol))
      .filter(col("dev") > lit(k) * col("mad"))
  }

  /** Same-weekday volume residual: each (stream, day)'s event count vs
    * the SAME stream exactly 7 calendar days earlier — the daily-
    * seasonality complement of [[periodGrowth]] (which compares adjacent
    * OBSERVED weeks): Monday compares to Monday, so weekday shape never
    * pollutes the residual. Implemented as a calendar-exact self-join on
    * `day − 7` (NOT `lag(7)` over observed rows, which silently compares
    * wrong days the moment a day is missing); days with no
    * week-ago partner keep a null baseline.
    *
    * Scale shape: events collapse to (stream, day) counts first
    * (map-side combinable), the self-join rides that calendar-bounded
    * frame — cost is day-cardinality, never event volume.
    */
  def weekOverWeekResidual(df: DataFrame, streamCol: String,
                           tsCol: String): DataFrame = {
    val daily = df.groupBy(col(streamCol),
        to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val weekAgo = daily.select(col(streamCol),
      date_add(col("day"), 7).as("day"), col("n").as("n_week_ago"))
    daily.join(weekAgo, Seq(streamCol, "day"), "left")
      .withColumn("delta", col("n") - col("n_week_ago"))
      .withColumn("pct",
        when(col("n_week_ago") > 0,
          round((col("n") - col("n_week_ago")).cast("double") * lit(100.0) /
            col("n_week_ago").cast("double"), 6)))
  }

  /** Truncated half-life (EWMA) smoothing of per-stream daily volume —
    * the denoised baseline the ops dashboard plots beside
    * [[weekOverWeekResidual]]'s raw deltas: each day's smoothed value is
    * the weight-normalized sum of the last `lookback` days' counts with
    * weight `2^(−⌊age/halfLifeDays⌋)` (step-wise half-life). Days
    * missing inside the window simply contribute nothing — the
    * normalization by the PRESENT weights keeps gaps from reading as
    * zero-traffic.
    *
    * Engine-exact by numeric construction: weights are powers of two
    * (dyadic, exactly representable), counts are integers, so every
    * product and the two sums are EXACT in double in any addition order
    * — no float-order divergence across engines or task schedules; one
    * rounded division at the end. This is why the decay is a half-life
    * and not a free α: 0.9^k differs in final ulps between libm
    * implementations, 2^−k never does.
    *
    * Scale shape: events collapse to (stream, day) counts first; the
    * lookback self-join and the normalization ride that calendar-sized
    * frame — cost is day-cardinality × lookback, never event volume.
    */
  def ewmaDaily(df: DataFrame, streamCol: String, tsCol: String,
                lookback: Int = 10, halfLifeDays: Int = 1): DataFrame = {
    // 62, not 64: weight 2^-k is built by shiftleft(1L, k) and k can
    // reach lookback-1; shiftleft(1L, 63) is Long.MinValue — a NEGATIVE
    // weight — so the shift exponent must stay <= 62
    require(lookback >= 1 && lookback <= 62,
      s"lookback must be in [1,62], got $lookback")
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1, got $halfLifeDays")
    val daily = df.groupBy(col(streamCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val past = daily.select(col(streamCol), col("day").as("__pday"),
      col("n").as("__pn"))
    val age = datediff(col("day"), col("__pday"))
    // 2^−⌊age/h⌋ via an integer shift, not pow(): libm pow is licensed
    // 1 ulp of error, a bit shift + one division is exact by definition
    val w = col("__w")
    daily.select(col(streamCol), col("day"), col("n"))
      .join(past, Seq(streamCol))
      .filter(col("__pday") <= col("day") &&
        col("__pday") >= date_sub(col("day"), lookback - 1))
      .withColumn("__k", floor(age / lit(halfLifeDays)).cast("int"))
      .withColumn("__w", expr("1.0d / cast(shiftleft(1L, __k) as double)"))
      .groupBy(col(streamCol), col("day"), col("n"))
      .agg(round(sum(w * col("__pn").cast("double")) / sum(w), 6).as("ewma"))
  }

  /** Two-sided CUSUM change-point alarm over a per-stream daily series —
    * the drift detector that catches SLOW leaks the per-day screens
    * (z-score, MAD, week-over-week) cannot: ten consecutive days each
    * 5% under target never trips a daily threshold, but their CUSUM
    * climbs linearly. Computed by the running-extremum identity (no
    * recursion, pure windows):
    * `S⁺_t = cum_t − min(0, min_{i≤t} cum_i)` and
    * `S⁻_t = max(0, max_{i≤t} cum_i) − cum_t`, where
    * `cum_t = Σ (n_i − target)` — ALL integer arithmetic, so the chart
    * is engine-exact by construction. Alarm when either side exceeds
    * `h`.
    *
    * Takes the (stream, day, n) frame directly so callers choose the
    * gap policy — compose with [[graft.gold.Marts.gapFillDaily]] when
    * absent days must read 0 (they usually should: silence IS the
    * leak). One stream-keyed shuffle serves all three windows.
    */
  def cusumDaily(daily: DataFrame, streamCol: String, dayCol: String,
                 nCol: String, target: Long, h: Long): DataFrame = {
    require(h > 0, s"alarm threshold h must be positive, got $h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(streamCol)).orderBy(col(dayCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    daily
      .withColumn("__cum",
        sum(col(nCol).cast("long") - lit(target)).over(w))
      .withColumn("s_pos",
        col("__cum") - least(lit(0L), min(col("__cum")).over(w)))
      .withColumn("s_neg",
        greatest(lit(0L), max(col("__cum")).over(w)) - col("__cum"))
      .withColumn("alarm", col("s_pos") > h || col("s_neg") > h)
      .drop("__cum")
  }

  /** Weight-of-evidence scorecard binning: `valueCol` split into `bins`
    * equal-width buckets over its full range, each bin scored
    * `ln((good_i/G)/(bad_i/B))` with +1 Laplace smoothing (so empty
    * cells stay finite), plus the bin's information-value term — the
    * classic credit-scorecard feature transform and its predictive-power
    * readout (rule of thumb: total IV < 0.02 useless, > 0.5 suspicious).
    * Shares [[psiDrift]]'s engine-parity machinery: one fixed IEEE op
    * tree for bin ids, ln terms round6→DECIMAL.
    *
    * Output: one row per bin (bin, n_good, n_bad, woe, iv_term),
    * including empty bins (both counts 0 → woe 0 under smoothing).
    *
    * Scale shape: one corpus aggregation to (bin, label) counts (≤ bins
    * cells), a 1-row extremes/totals broadcast, and a bins-sized
    * scaffold — everything after the scan is constant-sized.
    */
  def weightOfEvidence(df: DataFrame, valueCol: String, goodLabel: Column,
                       bins: Int = 5): DataFrame = {
    require(bins >= 2, s"need at least 2 bins, got $bins")
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val v = col(valueCol).cast("double")
    val tagged = df.filter(col(valueCol).isNotNull).withColumn("__g", goodLabel)
    val ext = tagged.agg(min(v).as("__mn"), max(v).as("__mx"),
      sum(when(col("__g"), 1L).otherwise(0L)).as("__ng"),
      sum(when(col("__g"), 0L).otherwise(1L)).as("__nb"))
    val binned = tagged.crossJoin(broadcast(ext))
      .withColumn("bin",
        when(col("__mx") > col("__mn"),
          least(lit(bins - 1),
            floor((v - col("__mn")) * lit(bins) / (col("__mx") - col("__mn")))
              .cast("int")))
          .otherwise(lit(0)))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(when(col("__g"), 1L).otherwise(0L)).as("n_good"),
        sum(when(col("__g"), 0L).otherwise(1L)).as("n_bad"))
    val scaffold = ext.select(col("__ng"), col("__nb"),
      explode(sequence(lit(0), lit(bins - 1))).as("bin"))
    val pg = (col("n_good") + lit(1.0)) / (col("__ng") + lit(bins).cast("double"))
    val pb = (col("n_bad") + lit(1.0)) / (col("__nb") + lit(bins).cast("double"))
    scaffold.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n_good", "n_bad"))
      .withColumn("woe", round6(log(pg / pb)))
      .withColumn("iv_term", round6((pg - pb) * log(pg / pb)))
      .select(col("bin"), col("n_good"), col("n_bad"), col("woe"), col("iv_term"))
  }

  /** Mutual information between two categorical columns, in nats — the
    * column-dependency profiler: near-zero means independent, high means
    * one column largely determines the other (a denormalization artifact
    * to prune, or a label-leaking feature to catch before training —
    * the continuous-association complement of `chiSquareTokens`'s
    * significance test). Null pairs are excluded. Output: one row
    * (n_rows, mi).
    *
    * Scale shape: ONE corpus aggregation builds the (x, y) contingency
    * frame; both marginals and the grand total fold out of it (no
    * re-scan), join fan-out is bounded by the category-pair count, and
    * per-cell terms round to 6 decimals into DECIMAL before the
    * order-independent sum (the q58/q105 ln discipline). A cell's term
    * uses one fixed IEEE op tree `p_xy · ln(p_xy / (p_x·p_y))`, so both
    * engines compute identical cells.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    def round6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    val joint = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol), col(yCol)).agg(count(lit(1)).as("__nxy"))
    val tot = joint.agg(sum(col("__nxy")).as("__n"))
    val mx = joint.groupBy(col(xCol)).agg(sum(col("__nxy")).as("__nx"))
    val my = joint.groupBy(col(yCol)).agg(sum(col("__nxy")).as("__ny"))
    val n = col("__n").cast("double")
    val pxy = col("__nxy").cast("double") / n
    val px = col("__nx").cast("double") / n
    val py = col("__ny").cast("double") / n
    joint.join(broadcast(mx), Seq(xCol)).join(broadcast(my), Seq(yCol))
      .crossJoin(broadcast(tot))
      .withColumn("__t", round6(pxy * log(pxy / (px * py)))
        .cast("decimal(18,6)"))
      .agg(max(col("__n")).cast("long").as("n_rows"),
        sum(col("__t")).cast("double").as("mi"))
  }
}
