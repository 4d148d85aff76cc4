package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, StringType}

/** Opt-in range-join acceleration: a pure band join
  * `points JOIN intervals ON p >= lo AND p <= hi` has no equi key, so
  * Spark plans a BroadcastNestedLoopJoin — or, when neither side fits,
  * a cartesian product that is quadratic and unrunnable at 100 TB. This
  * rule rewrites the LOGICAL join into the bucketed equi-join of
  * [[graft.operators.RangeJoin]] (the published range-join design every
  * warehouse ships behind a bin-size hint):
  *
  *  - the point side gains `bucket = floor(p / width)`;
  *  - the interval side explodes into `sequence(floor(lo/w), floor(hi/w))`;
  *  - the join becomes a hash equi-join on the bucket with the ORIGINAL
  *    band condition kept as a residual — each point matches an interval
  *    in exactly one bucket (its own), so no dedup is needed and results
  *    are bit-identical to the nested-loop plan.
  *
  * Enabled by `spark.graft.rangeJoin.bucketWidth=<positive number>` —
  * width is semantic knowledge (≈ the typical interval span), which is
  * why this is an explicit setting and not a guess; Databricks' range
  * join hint makes the same choice. Scope guards: INNER joins whose
  * condition, after extracting one numeric lower+upper band on the same
  * point expression, contains NO cross-side equi conjunct (if it does,
  * the planner already has a hash key and the rewrite would only add
  * work). Everything else passes through untouched.
  */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  // a malformed value must not break every query on the session (the
  // rule runs inside optimization of ALL queries): unparseable = off
  private def width: Option[Double] =
    spark.conf.getOption("spark.graft.rangeJoin.bucketWidth")
      .flatMap(v => scala.util.Try(v.toDouble).toOption).filter(_ > 0)

  // runaway-replication guard, same default as RangeJoin.pointInInterval;
  // malformed values fall back rather than breaking every query
  private def maxBuckets: Int =
    spark.conf.getOption("spark.graft.rangeJoin.maxBucketsPerInterval")
      .flatMap(v => scala.util.Try(v.toInt).toOption).filter(_ > 0)
      .getOrElse(RangeJoinRewrite.DefaultMaxBuckets)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => RangeJoinRewrite.rewritePlan(plan, w, maxBuckets)
  }
}

object RangeJoinRewrite extends PredicateHelper {

  /** Replication cap mirrored from `RangeJoin.pointInInterval`: one wide
    * interval (or a width too small for the domain) must fail fast with a
    * resize hint, not materialize an unbounded per-row bucket array.
    */
  val DefaultMaxBuckets = 4096

  /** Rewrite every qualifying band join in `plan` with bucket `w`. */
  def rewritePlan(plan: LogicalPlan, w: Double,
                  maxBuckets: Int = DefaultMaxBuckets): LogicalPlan =
    plan.transformUp {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        rewrite(j, l, r, cond, hint, w, maxBuckets).getOrElse(j)
    }

  /** Apply the acceleration to ONE DataFrame explicitly — no session
    * config involved; surrounding queries keep their plans.
    */
  def accelerate(df: org.apache.spark.sql.DataFrame, width: Double,
                 maxBuckets: Int = DefaultMaxBuckets): org.apache.spark.sql.DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    org.apache.spark.sql.graftbridge.ColumnBridge.ofRows(
      df.sparkSession, rewritePlan(df.queryExecution.analyzed, width, maxBuckets))
  }

  /** One extracted half-band: `point (>=|>) bound` or `point (<=|<) bound`,
    * with the point rooted in `pointOnLeft`'s side.
    */
  private case class Band(point: Expression, bound: Expression,
                          isLower: Boolean, pointOnLeft: Boolean)

  private def numeric(e: Expression): Boolean =
    e.dataType.isInstanceOf[NumericType]

  private def classify(e: Expression, l: LogicalPlan,
                       r: LogicalPlan): Option[Band] = {
    def sided(a: Expression, b: Expression): Option[Boolean] =
      if (a.references.subsetOf(l.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(r.outputSet) && b.references.nonEmpty)
        Some(true)
      else if (a.references.subsetOf(r.outputSet) && a.references.nonEmpty &&
        b.references.subsetOf(l.outputSet) && b.references.nonEmpty)
        Some(false)
      else None
    e match {
      case GreaterThanOrEqual(a, b) if numeric(a) =>
        sided(a, b).map(Band(a, b, isLower = true, _))
      case GreaterThan(a, b) if numeric(a) =>
        sided(a, b).map(Band(a, b, isLower = true, _))
      case LessThanOrEqual(a, b) if numeric(a) =>
        sided(a, b).map(Band(a, b, isLower = false, _))
      case LessThan(a, b) if numeric(a) =>
        sided(a, b).map(Band(a, b, isLower = false, _))
      case _ => None
    }
  }

  private def bucketOf(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w, DoubleType)))

  /** Attempt the rewrite; None = pattern doesn't apply, keep the join. */
  def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan, cond: Expression,
              hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
              w: Double, maxBuckets: Int = DefaultMaxBuckets): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equi conjunct means the planner already has
    // a hash key — the band rides along as a residual for free
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && a.references.nonEmpty &&
          b.references.subsetOf(r.outputSet) && b.references.nonEmpty) ||
          (a.references.subsetOf(r.outputSet) && a.references.nonEmpty &&
            b.references.subsetOf(l.outputSet) && b.references.nonEmpty)
      case _ => false
    }
    if (hasEqui) return None

    val bands = conjuncts.flatMap(classify(_, l, r))
    // find a point expression carrying BOTH a lower and an upper bound
    // from the opposite side
    val candidate = bands.filter(_.isLower).flatMap { lo =>
      bands.find(hi => !hi.isLower &&
        hi.pointOnLeft == lo.pointOnLeft &&
        hi.point.semanticEquals(lo.point)).map(hi => (lo, hi))
    }.headOption
    candidate.map { case (lo, hi) =>
      val (pointPlan, ivPlan) = if (lo.pointOnLeft) (l, r) else (r, l)

      val pBucket = Alias(bucketOf(lo.point, w), "__graft_bucket_p")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

      // inverted bands (hi < lo) match nothing under the residual anyway,
      // but an unguarded Sequence would default to step -1 and generate a
      // DESCENDING bucket range — silent exploded work. Filter them out,
      // exactly as RangeJoin.pointInInterval does. Null bounds drop too
      // (the residual band condition could never match them).
      val ivFiltered = Filter(
        GreaterThanOrEqual(hi.bound, lo.bound), ivPlan)

      val loB = bucketOf(lo.bound, w)
      val hiB = bucketOf(hi.bound, w)
      // fail fast instead of materializing an unbounded replica set (the
      // explicit-operator guard, mirrored at the rule level: one wide
      // interval must not OOM arbitrary queries once the conf is set)
      val cappedHi = If(
        LessThan(Subtract(hiB, loB), Literal(maxBuckets.toLong)),
        hiB,
        Cast(RaiseError(Concat(Seq(
          Literal.create(
            s"range-join rewrite: interval spans more than $maxBuckets " +
              s"buckets at width $w — raise the bucket width " +
              "(spark.graft.rangeJoin.bucketWidth) or the cap " +
              "(spark.graft.rangeJoin.maxBucketsPerInterval); lo=",
            StringType),
          Cast(lo.bound, StringType),
          Literal.create(" hi=", StringType),
          Cast(hi.bound, StringType)))), LongType))

      // Sequence is TimeZoneAwareExpression: it only counts as resolved
      // with a timezone id, even over plain longs
      val seq = Sequence(loB, cappedHi,
        None, Some(org.apache.spark.sql.internal.SQLConf.get
          .sessionLocalTimeZone))
      val ivAttr = AttributeReference("__graft_bucket_i", LongType,
        nullable = true)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(ivAttr),
        child = ivFiltered)

      val (newL, newR) =
        if (lo.pointOnLeft) (pointProj, gen) else (gen, pointProj)
      val bucketEq = EqualTo(pBucket.toAttribute, ivAttr)
      // PIN sort-merge on the Generate side unless the user already
      // hinted a strategy: the interval side just exploded ×(span/width)
      // and Generate is invisible to size estimation, so the planner can
      // elect to broadcast a bucket-replica relation that scales with
      // the interval corpus (RangeJoin.pointInInterval's pin, mirrored
      // at the rule level — the Linkage.scala:181 cliff class)
      val pinnedHint =
        if (hint.leftHint.exists(_.strategy.isDefined) ||
            hint.rightHint.exists(_.strategy.isDefined)) hint
        else {
          val merge = Some(org.apache.spark.sql.catalyst.plans.logical
            .HintInfo(strategy = Some(
              org.apache.spark.sql.catalyst.plans.logical.SHUFFLE_MERGE)))
          if (lo.pointOnLeft)
            org.apache.spark.sql.catalyst.plans.logical.JoinHint(
              hint.leftHint, merge)
          else
            org.apache.spark.sql.catalyst.plans.logical.JoinHint(
              merge, hint.rightHint)
        }
      val joined = Join(newL, newR, Inner, Some(And(bucketEq, cond)), pinnedHint)
      Project(j.output, joined)
    }
  }
}
