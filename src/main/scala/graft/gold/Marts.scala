package graft.gold

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gold-layer star-schema operators (SURVEY.md §2 rows 17a, R2, 24).
  *
  * The reference's fact enriches transactions with the owning customer via
  * a LEFT JOIN to accounts (fact_transactions.sql:13-15); the readme's
  * richer variant inner-joins both dims filtered to current SCD2 rows
  * (readme.md:585-595).
  *
  * Scale: dimension sides are broadcast — the fact never shuffles for the
  * join. The as-of (point-in-time) lookup avoids a non-equi join blow-up by
  * being a union + window "last known version" sweep: one shuffle on the
  * key, O(n log n), instead of a broadcast-nested-loop range join.
  */
object Marts {

  /** Max estimated dim size that still gets a forced broadcast hint. Above
    * this, the hint is omitted and the planner/AQE chooses from runtime
    * sizes — a forced broadcast of an unbounded dim (15M customers at
    * TPC-H sf100) would OOM the driver no matter what the planner knows.
    */
  val MaxBroadcastBytes: Long = graft.functions.PlanHints.DefaultMaxBroadcastBytes

  private def hinted(dim: DataFrame, maxBytes: Long): DataFrame =
    graft.functions.PlanHints.broadcastIfSmall(dim, maxBytes)

  /** Left equi-join fact enrichment (row 17a): orphan facts survive with
    * null dim columns. A small `dim` is broadcast (size-guarded — see
    * `MaxBroadcastBytes`); a large one joins however AQE decides.
    */
  def enrich(fact: DataFrame, dim: DataFrame, key: Seq[String],
             maxBroadcastBytes: Long = MaxBroadcastBytes): DataFrame =
    fact.join(hinted(dim, maxBroadcastBytes), key, "left")

  /** Readme-variant fact (R2): inner joins to current dim rows only. */
  def enrichCurrent(fact: DataFrame, dim: DataFrame, key: Seq[String],
                    isCurrent: String = "is_current",
                    maxBroadcastBytes: Long = MaxBroadcastBytes): DataFrame =
    fact.join(hinted(dim.filter(col(isCurrent)), maxBroadcastBytes), key, "inner")

  /** As-of join: for each left row, attach the latest right row with
    * `right.ts <= left.ts` for the same key. Implemented as
    * union-sort-sweep: tag both sides, window `last(value, ignoreNulls)`
    * ordered by (ts, side) per key — right rows at equal ts sort before
    * left rows so an exactly-simultaneous version is visible.
    *
    * @param valueCols right-side columns to carry (must not collide with left)
    */
  /** @param rightTieBreak extra right-side ordering columns: when several
    *   right rows share (key, ts), the greatest by these columns wins —
    *   without them that choice is partition-order-dependent.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: Seq[String],
               leftTs: String, rightTs: String,
               valueCols: Seq[String],
               rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val l = left.withColumn("__side", lit(1)).withColumn("__ts", col(leftTs))
    val r = right.select(
      (key.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side"))
        ++ valueCols.map(col): _*)
    val lAligned = l.select(
      (l.columns.filterNot(c => valueCols.contains(c)).map(col).toSeq
        ++ valueCols.map(c => lit(null).cast(r.schema(c).dataType).as(c))): _*)
    val unioned = lAligned.unionByName(
      r.select(lAligned.columns.map(c =>
        if (r.columns.contains(c)) col(c)
        else lit(null).cast(lAligned.schema(c).dataType).as(c)): _*))
    require(rightTieBreak.forall(valueCols.contains),
      "rightTieBreak columns must be carried in valueCols")
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy((col("__ts").asc +: col("__side").asc +:
        rightTieBreak.map(col(_).asc_nulls_first)): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val swept = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    swept.filter(col("__side") === 1).drop("__side", "__ts")
  }

  /** Periodic (daily) snapshot fact from a change log: for every key and
    * every calendar day from the key's first event through `endDate`, the
    * value in effect at end-of-day — the key's last event that day, or
    * the previous day's state forward-filled across quiet days. The
    * standard balance-snapshot / state-history table a warehouse derives
    * from CDC (the per-day generalization of [[graft.silver.Staging.snapshotAsOf]],
    * which answers one T; this materializes ALL of them).
    *
    * Output: keys..., snapshot_date, valueCols... (forward-filled),
    * one row per (key, day) from the key's first event day to `endDate`.
    *
    * Scale: events first reduce to one row per (key, active day) — a hash
    * agg election, corpus-sized input but key·activeday output — then the
    * calendar scaffold is keys × days (bounded by key count and the date
    * range, independent of event volume), and the forward fill is one
    * window over the scaffold partitioned by key. Two shuffles total
    * (election, scaffold window), both on the key.
    */
  def dailySnapshot(log: DataFrame, keys: Seq[String], tsCol: String,
                    tieCols: Seq[String], valueCols: Seq[String],
                    endDate: Column): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val day = to_date(col(tsCol)).as("__day")
    // last event per (key, day): max_by hash-agg election (no sort)
    val ord = struct((col(tsCol) +: tieCols.map(col)): _*)
    val dayState = log.select(
        (keys.map(col) :+ day :+ ord.as("__ord")) ++ valueCols.map(col): _*)
      .groupBy((keys :+ "__day").map(col): _*)
      .agg(max_by(struct(valueCols.map(col): _*), col("__ord")).as("__v"))
      .select((keys :+ "__day").map(col) ++
        valueCols.map(c => col(s"__v.$c").as(c)): _*)
    // scaffold: each key's days from its first event day to endDate
    val spans = dayState.groupBy(keys.map(col): _*)
      .agg(min(col("__day")).as("__first"))
      // keys born after endDate have no snapshot rows (sequence would
      // throw on an inverted range)
      .filter(col("__first") <= endDate)
      .select((keys.map(col) :+ explode(sequence(col("__first"), endDate,
        expr("interval 1 day"))).as("snapshot_date")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("snapshot_date").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    // spans derives from dayState — alias both sides so the self-join
    // lineage resolves unambiguously
    val joined = spans.as("sp").join(dayState.as("ds"),
      keys.map(k => col(s"sp.$k") === col(s"ds.$k"))
        .reduce(_ && _) && col("sp.snapshot_date") === col("ds.__day"),
      "left")
      .select((keys.map(k => col(s"sp.$k")) :+ col("sp.snapshot_date")) ++
        valueCols.map(c => col(s"ds.$c")): _*)
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Accumulating snapshot fact (the Kimball lifecycle table): ONE row per
    * key with the FIRST timestamp of each named milestone (`<m>_at`, null
    * until the milestone happens) and the elapsed seconds between
    * consecutive milestones (`<a>_to_<b>_s`, null while either end is
    * missing). The signup→activation→purchase funnel table a warehouse
    * keeps updating in place as each entity progresses.
    *
    * Scale: ONE hash aggregation over the event log — `min(when(...))`
    * per milestone is map-side combinable, so the corpus reduces to key
    * cardinality before the single key shuffle; the latency columns are
    * map-only arithmetic on the aggregated frame. Out-of-order lifecycles
    * (a milestone observed before its predecessor) yield negative
    * elapsed values — preserved, not nulled: they are data-quality
    * signal, and a DQ rule can screen them downstream.
    */
  def accumulatingSnapshot(events: DataFrame, keyCol: String,
                           milestoneCol: String, tsCol: String,
                           milestones: Seq[String]): DataFrame = {
    require(milestones.nonEmpty, "need at least one milestone")
    require(milestones.distinct == milestones, s"duplicate milestones: $milestones")
    val aggs = milestones.map(m =>
      min(when(col(milestoneCol) === m, col(tsCol))).as(s"${m}_at"))
    val base = events.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    milestones.sliding(2).foldLeft(base) {
      case (df, Seq(a, b)) => df.withColumn(s"${a}_to_${b}_s",
        col(s"${b}_at").cast("long") - col(s"${a}_at").cast("long"))
      case (df, _) => df // single milestone: no latency columns
    }
  }

  /** RFM segmentation — per-key Recency (days since last event, as of
    * `asOf`), Frequency (event count), Monetary (exact cents,
    * `floor(value·100)` per event so both engines truncate identically) —
    * each scored 1–5 by PERCENTILE_DISC(20/40/60/80) boundaries computed
    * over the key frame, higher = better (recency scored inverted:
    * recent = 5). The classic CRM / churn-targeting readout.
    *
    * Scoring is boundary-based, NOT ntile: an exact global NTILE needs a
    * single-partition window over every key (the scale killer), while the
    * four quintile boundaries come from [[TextAnalysis.percentilesExact]]'s
    * (group, value) histogram — windows over distinct metric values only —
    * and broadcast back as literals into a map-only when-chain. Under
    * heavy ties the populations are not exactly 20% each (every tied key
    * lands in the same class — deterministic and engine-exact, unlike
    * rank-tiebreak ntile).
    */
  def rfm(events: DataFrame, keyCol: String, tsCol: String,
          valueCol: String, asOf: Column): DataFrame = {
    val per = events.groupBy(col(keyCol)).agg(
      datediff(asOf.cast("date"), max(to_date(col(tsCol)))).cast("long")
        .as("recency_days"),
      count(lit(1)).as("frequency"),
      sum(floor(col(valueCol) * 100).cast("long")).as("monetary_cents"))
    // all 12 boundaries in ONE pass: melt the three metrics to
    // (metric, value) and let percentilesExact group by metric name —
    // three separate calls would re-aggregate the event log three times
    val metrics = Seq("recency_days", "frequency", "monetary_cents")
    val melted = per.select(explode(array(metrics.map(m =>
      struct(lit(m).as("__metric"), col(m).as("__v"))): _*)).as("__mv"))
      .select(col("__mv.__metric").as("__metric"), col("__mv.__v").as("__v"))
    val boundRows = graft.operators.TextAnalysis.percentilesExact(
        melted, "__v", "__metric", Seq(20, 40, 60, 80))
      .collect()  // bounded: 3 metrics × 4 percents = 12 rows
    def bounds(c: String): Seq[Long] = boundRows
      .filter(_.getAs[String]("__metric") == c)
      .sortBy(_.getAs[Int]("pct"))
      .map(_.getAs[Long]("value")).toSeq
    def scoreAsc(c: String, bs: Seq[Long]): Column =
      bs.foldLeft(lit(1)) { (acc, b) =>
        acc + when(col(c) > b, 1).otherwise(0)
      }
    val (rb, fb, mb) = (bounds("recency_days"), bounds("frequency"),
      bounds("monetary_cents"))
    per
      .withColumn("r_score", lit(6) - scoreAsc("recency_days", rb))
      .withColumn("f_score", scoreAsc("frequency", fb))
      .withColumn("m_score", scoreAsc("monetary_cents", mb))
      .withColumn("segment",
        concat(col("r_score"), col("f_score"), col("m_score")))
  }

  /** Linear multi-touch attribution: every conversion splits its credit
    * EQUALLY across the user's touch events at-or-before it within
    * `windowSec` — the complement of last-touch (q137's `asOfJoin`
    * sweep), which gives the final click everything. Output: one row per
    * (conversion, touch) with the touch count and its 1/n credit.
    *
    * Scale shape: the touch↔conversion match is a plain user-key hash
    * equi-join with the time window as a residual predicate — per-user
    * fan-out is bounded by per-user activity (touches × conversions for
    * ONE user), never cross-user, so no nested-loop plan exists anywhere;
    * the credit split is one window over the conversion key. Timestamps
    * compare as integer microseconds (`unix_micros`), so window edges
    * agree across engines exactly.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String,
                        touchType: String, convType: String,
                        windowSec: Long): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_id"),
        unix_micros(col(tsCol)).as("__cus"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_id"),
        unix_micros(col(tsCol)).as("__tus"))
    val joined = conv.join(touch, Seq(userCol))
      .filter(col("__tus") <= col("__cus") &&
        col("__tus") >= col("__cus") - lit(windowSec * 1000000L))
    val w = Window.partitionBy(col("conv_id"))
    joined
      .withColumn("n_touches", count(lit(1)).over(w).cast("long"))
      .withColumn("credit",
        round(lit(1.0) / col("n_touches").cast("double"), 6))
      .select(col(userCol), col("conv_id"), col("touch_id"),
        col("n_touches"), col("credit"))
  }

  /** Position-based (U-shaped) multi-touch attribution — the other
    * standard credit model beside [[linearAttribution]]: the FIRST and
    * LAST touch inside the lookback window each take `endPct`% of the
    * conversion's credit and the middle touches split the remainder
    * evenly; degenerate journeys collapse exactly as analytics tools
    * define them (one touch → 100%, two touches → 50/50).
    *
    * Determinism: the touch order is (ts, touch_id) — a total order, so
    * "first"/"last" are engine-exact even under same-microsecond
    * bursts. Same scale shape as the linear model: one user-keyed
    * equi-join time-banded by predicate, then one window over conv_id
    * (conversion-sized groups, bounded by the lookback window).
    */
  def positionAttribution(events: DataFrame, userCol: String, tsCol: String,
                          idCol: String, typeCol: String,
                          touchType: String, convType: String,
                          windowSec: Long, endPct: Int = 40): DataFrame = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    require(endPct >= 1 && endPct <= 50, s"endPct must be in [1,50], got $endPct")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_id"),
        unix_micros(col(tsCol)).as("__cus"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_id"),
        unix_micros(col(tsCol)).as("__tus"))
    val joined = conv.join(touch, Seq(userCol))
      .filter(col("__tus") <= col("__cus") &&
        col("__tus") >= col("__cus") - lit(windowSec * 1000000L))
    val w = Window.partitionBy(col("conv_id"))
    val ord = w.orderBy(col("__tus").asc, col("touch_id").asc)
    // both weights derive from integer percents by ONE division, so each
    // is the correctly-rounded double of its decimal (0.4, 0.2, …) — the
    // same bits any engine's literal parses to; 1.0 − 2·0.4 would not be
    val endW = lit(endPct.toDouble / 100.0)
    val midW = lit((100 - 2 * endPct).toDouble / 100.0)
    val n = col("n_touches").cast("double")
    joined
      .withColumn("n_touches", count(lit(1)).over(w).cast("long"))
      .withColumn("pos", row_number().over(ord).cast("long"))
      .withColumn("credit", round(
        when(col("n_touches") === 1L, lit(1.0))
          .when(col("n_touches") === 2L, lit(0.5))
          .when(col("pos") === 1L || col("pos") === col("n_touches"), endW)
          .otherwise(midW / (n - lit(2.0))), 6))
      .select(col(userCol), col("conv_id"), col("touch_id"),
        col("n_touches"), col("pos"), col("credit"))
  }

  /** Top event-sequence paths — "what journeys do users actually take":
    * each user's first `maxLen` events (by the (ts, id) total order)
    * joined into a `>`-separated path string, counted across users, the
    * `k` most common returned with a deterministic (count desc, path
    * asc) tie-break. The product-analytics "top paths" report (and, on
    * a training corpus, the dominant event-template detector) as two
    * aggregations.
    *
    * Scale shape: a user-keyed window rank (rank filter truncates each
    * user to `maxLen` rows map-side via WindowGroupLimit), one user
    * aggregation building the bounded path string, one path aggregation
    * counting users, and a TakeOrdered top-k — no join, no unbounded
    * state; path strings are ≤ maxLen event names long by construction.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               idCol: String, typeCol: String,
               maxLen: Int, k: Int): DataFrame = {
    require(maxLen >= 1 && maxLen <= 64, s"maxLen must be in [1,64], got $maxLen")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .select(col(userCol), col(typeCol).as("__t"),
        row_number().over(w).as("__rn"))
      .filter(col("__rn") <= maxLen)
      .groupBy(col(userCol)).agg(
        array_join(expr("transform(array_sort(collect_list(struct(__rn, __t))), x -> x.__t)"),
          ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(k)
  }

  /** Conformed calendar dimension (the dbt-utils `date_spine` analog) —
    * one row per day in [start, end] with the attributes every daily
    * mart conforms to, derived by ARITHMETIC from the day number rather
    * than engine calendar functions whose numbering conventions differ
    * (Spark's `dayofweek` starts Sunday=1, ISO starts Monday=1): the
    * ISO weekday is anchored to 2024-01-01, a known Monday. `sequence`
    * + explode generates the spine distributed — no driver loop, no
    * collect; a year is 365 rows, so the frame broadcasts wherever it
    * joins.
    */
  def dateSpine(spark: org.apache.spark.sql.SparkSession,
                start: String, end: String): DataFrame = {
    import spark.implicits._
    val anchor = lit("2024-01-01").cast("date") // a Monday
    Seq((start, end)).toDF("s", "e")
      .select(explode(sequence(col("s").cast("date"), col("e").cast("date"),
        expr("interval 1 day"))).as("day"))
      .select(col("day"),
        year(col("day")).as("year"),
        quarter(col("day")).as("quarter"),
        month(col("day")).as("month"),
        dayofmonth(col("day")).as("day_of_month"),
        (pmod(datediff(col("day"), anchor), lit(7)) + 1).cast("int")
          .as("iso_dow"))
      .withColumn("week_start",
        date_sub(col("day"), col("iso_dow") - lit(1)))
      .withColumn("is_weekend", col("iso_dow") >= 6)
      .withColumn("is_month_end", col("day") === last_day(col("day")))
  }

  /** Last-observation-carried-forward daily series: for every (key, day)
    * in keys × [start, end], the most recent observed `valueCol` on or
    * before that day — the balance-over-time / position series every
    * banking dashboard draws from sparse transaction events, and the
    * point-in-time feature surface at daily grain (the dense counterpart
    * of q197's as-of join). Each day's observation is the LAST event of
    * that day by (`tsCol`, `tieCol`) — a total order, so the fill is
    * engine-exact; `observed` marks real observations vs carried ones;
    * keys with no observation yet read null (not 0 — "no balance" is not
    * a zero balance).
    *
    * Scale shape: the grid is keys × spine — the OUTPUT's own size — via
    * a broadcast of the day spine (calendar-sized); the daily pick and
    * the forward fill share one key-partitioned shuffle. Nothing
    * event-sized survives past the per-day rank.
    */
  def locfDaily(spark: org.apache.spark.sql.SparkSession, df: DataFrame,
                keyCol: String, tsCol: String, tieCol: String,
                valueCol: String, start: String, end: String): DataFrame = {
    val grid = df.select(col(keyCol)).distinct()
      .crossJoin(org.apache.spark.sql.functions.broadcast(
        dateSpine(spark, start, end).select("day")))
    // observations BEFORE the spine start are the carry-in balance: they
    // clamp to the start day (latest one wins there) so early spine days
    // read the real prior value, not "no balance yet" — but they are NOT
    // `observed` on that day (observed = a real event dated that day)
    val startLit = lit(start).cast("date")
    val wDay = Window
      .partitionBy(col(keyCol), greatest(to_date(col(tsCol)), startLit))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    // a null-ts event carries no time information: greatest(to_date(null),
    // start) would clamp it to the spine start and nulls-last desc order
    // would make it the carried-in baseline whenever it is a key's only
    // start-day row — junk fill. Dropped up front.
    val daily = df.filter(col(tsCol).isNotNull)
      .withColumn("__rn", row_number().over(wDay))
      .filter(col("__rn") === 1)
      .select(col(keyCol),
        greatest(to_date(col(tsCol)), startLit).as("day"),
        col(valueCol).as("__obs"),
        (to_date(col(tsCol)) >= startLit).as("__real"))
    val wFill = Window.partitionBy(col(keyCol)).orderBy(col("day").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn("observed",
        coalesce(col("__real"), lit(false)) && col("__obs").isNotNull)
      .withColumn("value_filled",
        last(col("__obs"), ignoreNulls = true).over(wFill))
      .drop("__obs", "__real")
  }

  /** Nearest-in-time join — for each left row, the single right row on
    * the SAME key whose timestamp is CLOSEST within ±`tolSec`, looking
    * both directions (the sensor-alignment / "which click belongs to
    * this purchase" match a backward-only as-of join gets wrong
    * whenever the truth lies just ahead). Total order on (|Δt|, right
    * ts, right id): exact ties prefer the EARLIER right row — a pinned
    * choice, not an engine accident. Left rows with no candidate in
    * the window are kept with nulls (left join semantics).
    *
    * Scale shape: one user-keyed equi-join with the ±band as a
    * residual predicate (the q165 attribution shape — never a
    * nested-loop), then one WindowGroupLimit rank per left row. Wide
    * tolerances on hot keys widen the candidate set; the band is the
    * knob.
    */
  def nearestJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  lTsCol: String, lIdCol: String,
                  rTsCol: String, rIdCol: String,
                  tolSec: Long): DataFrame = {
    require(tolSec > 0, s"tolSec must be positive, got $tolSec")
    val l = left.select(col(keyCol), col(lIdCol).as("l_id"),
      unix_micros(col(lTsCol)).as("__lus"))
    val r = right.select(col(keyCol), col(rIdCol).as("r_id"),
      unix_micros(col(rTsCol)).as("__rus"))
    val tol = lit(tolSec * 1000000L)
    // the band lives in the JOIN CONDITION, not a post-filter: a left row
    // whose every candidate is out of band must still survive with nulls
    val rr = r.withColumnRenamed(keyCol, "__rkey")
    val joined = l.join(rr,
      col(keyCol) === col("__rkey") &&
        abs(col("__rus") - col("__lus")) <= tol, "left")
    // partition by (key, l_id): lIdCol is only required unique WITHIN a
    // key — per-source sequence ids colliding across keys must not
    // collapse two left rows into one rank group
    val w = Window.partitionBy(col(keyCol), col("l_id"))
      .orderBy(abs(col("__rus") - col("__lus")).asc_nulls_last,
        col("__rus").asc_nulls_last, col("r_id").asc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col("l_id"), col("r_id"),
        (col("__rus") - col("__lus")).as("delta_us"))
  }

  /** Gap-filled daily series: [[dateSpine]] left-joined with a frame's
    * per-day counts, absent days reading 0 — the shape every
    * time-series chart and forecast needs (a missing day must plot as
    * zero, not vanish). The spine side is calendar-sized and broadcast;
    * the fact side collapses to (day, n) before the join.
    */
  def gapFillDaily(spark: org.apache.spark.sql.SparkSession,
                   df: DataFrame, tsCol: String,
                   start: String, end: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).cast("long").as("__n"))
    // broadcast the aggregated (right) side: a left join can only build
    // right, and both sides are day-cardinality anyway
    dateSpine(spark, start, end)
      .join(org.apache.spark.sql.functions.broadcast(daily), Seq("day"), "left")
      .withColumn("n_rows", coalesce(col("__n"), lit(0L)))
      .drop("__n")
  }

  /** Deterministic surrogate-key assignment for dimension loads — the
    * warehouse step between staging and the SCD2 merge: every business
    * key gets a stable dense integer key; keys already in the dimension
    * keep theirs, unseen business keys get max(existing) + dense_rank
    * over the NEW keys in business-key order.
    *
    * Determinism matters more than it looks: `monotonically_increasing_id`
    * changes across runs/partitionings, which silently breaks replayed
    * loads (§2 row 26's idempotence contract) — this assignment is a pure
    * function of (existing mapping, new key set), so a replay assigns
    * identical keys.
    *
    * Scale: the max(existing) is a one-row aggregate (broadcast), the
    * anti-join finds new keys with the dimension's own partitioning, and
    * the rank runs over the NEW-key delta only. The rank is a
    * range-partitioned sort + `zipWithIndex` — never a global window: a
    * single-partition `Window.orderBy` would be fine at steady state
    * (deltas are small) but routes the ENTIRE dimension through one task
    * on the bootstrap load, where every key is new.
    *
    * The rank rides ONE range shuffle consumed as ONE RDD:
    * `zipWithIndex`'s partition-size job and the downstream read share
    * the same computed map stage (Spark reuses shuffle output across
    * jobs on a single RDD lineage), so the numbering cannot disagree
    * with the sizes. A previous two-job form (per-range `row_number`
    * window + a separate counts collect, joined back) re-evaluated the
    * SAMPLING-BASED range exchange once per job — Spark documents
    * `repartitionByRange` boundaries as potentially different across
    * evaluations, which could duplicate or gap surrogate keys on exactly
    * the bootstrap load this path exists for. The final rank is a pure
    * function of the key SET — range boundaries only decide which task
    * computes which contiguous slice, not the resulting numbering — so
    * replays still assign identical keys.
    */
  def assignSurrogates(existing: DataFrame, incoming: DataFrame,
                       businessKey: String,
                       surrogateCol: String = "sk"): DataFrame = {
    val spark = incoming.sparkSession
    val maxSk = existing.agg(coalesce(max(col(surrogateCol)), lit(0L))
      .cast("long").as("__max_sk"))
    val newKeys = incoming.select(col(businessKey)).distinct()
      .join(existing.select(col(businessKey)), Seq(businessKey), "left_anti")
    // contiguous key ranges, sorted within each range (keys are distinct,
    // so position ≡ dense rank and no tie can straddle a range boundary)
    val keyField = newKeys.schema(businessKey)
    val sorted = newKeys
      .repartitionByRange(col(businessKey).asc)
      .sortWithinPartitions(col(businessKey).asc)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row(r.get(0), i + 1L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        businessKey, keyField.dataType, keyField.nullable),
      org.apache.spark.sql.types.StructField(
        "__rk", org.apache.spark.sql.types.LongType, nullable = false)))
    val assigned = spark.createDataFrame(indexed, schema)
      .crossJoin(broadcast(maxSk))
      .select(col(businessKey),
        (col("__max_sk") + col("__rk")).as(surrogateCol))
    existing.select(col(businessKey), col(surrogateCol).cast("long"))
      .unionByName(assigned)
  }
}
