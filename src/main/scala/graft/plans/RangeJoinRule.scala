package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType}

/** Optimizer rule: VALUE-vs-INTERVAL theta joins → bucketed equi-joins.
  *
  * Spark has no physical strategy for `point.v >= iv.lo AND point.v <
  * iv.hi` — with no equi-conjunct the join plans as
  * BroadcastNestedLoopJoin (every row against every interval, and a
  * hard failure once the interval side outgrows the broadcast limit).
  * The standard distributed rewrite (the "range join optimization" of
  * Photon/Databricks, here as a plain Catalyst rule): quantize the value
  * domain into fixed-width buckets, expand each interval into every
  * bucket it overlaps (`explode(sequence(floor(lo/W), floor(hi/W)))` —
  * the inclusive upper bucket is deliberate, an ε-subtraction could MISS
  * values in (hi−ε, hi)), join point-bucket = interval-bucket, and keep
  * the ORIGINAL predicate as a residual so the rewrite is semantics-
  * preserving by construction. Work drops from |points|×|intervals| to
  * |points| + Σ span/W, shuffling like any equi-join.
  *
  * NOT every interval row is bucketable: an inverted interval (hi < lo)
  * would crash Sequence, an unbounded/NaN one (±Inf bounds) has no
  * finite bucket range, and a very wide one would explode into millions
  * of bucket rows. The rewrite therefore SPLITS the interval side on
  * `0 <= hi − lo <= W·MaxBucketsPerInterval` (double arithmetic — NaN
  * and ±Inf spans fail the predicate, no overflow): bucketable rows take
  * the equi-join, the remainder keeps the original theta join, and the
  * two results union. Row-identical to the plain join for every input —
  * inverted intervals match nothing via the theta branch instead of
  * crashing, unbounded ones still match everything.
  *
  * Scope is deliberately tight — the rule fires only on an INNER join
  * whose condition is exactly `GreaterThanOrEqual(v, lo) AND
  * (LessThan(v, hi) | LessThanOrEqual(v, hi))` with `v` from one side
  * and `lo`/`hi` from the other, all DoubleType: anything else (extra
  * conjuncts, mixed sides, other types) is left for Spark to plan
  * normally. When the point side was the original RIGHT child the
  * JoinHint's sides are swapped to follow their relations.
  * `q_range_join` is the manual form of the same rewrite and its oracle
  * doubles as this rule's semantics gate (OperatorSpec asserts plan
  * shape + row equality on both argument orders and on
  * inverted/unbounded interval rows).
  *
  * Activate per-session via `spark.experimental.extraOptimizations`
  * (the public hook for exactly this) or cluster-wide via
  * `spark.sql.extensions=graft.functions.GraftExtensions`, which
  * injects this rule alongside the SQL functions. The injected form
  * runs inside the fixed-point operator-optimization batch NEXT TO
  * BooleanSimplification, so the already-rewritten marker cannot be a
  * boolean no-op (a `true AND` conjunct would be simplified away and
  * the rest branch re-matched forever): the rest branch instead emits
  * its condition with the conjuncts SWAPPED (`upper AND lower`) —
  * semantically identical, stable under every built-in rule (Catalyst
  * canonicalizes conjunct order only for semantic comparison, never by
  * rewriting the plan), and outside this matcher's `lower AND upper`
  * scope by construction.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  /** Bucket width in value units; one width serves any data whose
    * interval spans are within a few orders of magnitude of it (the
    * residual predicate keeps any width CORRECT — width only tunes the
    * candidate-set size). */
  val BucketWidth = 50.0

  /** Interval rows expanding to more buckets than this take the
    * theta-join branch instead (bounding the Explode blow-up). */
  val MaxBucketsPerInterval = 4096L

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rewrite(j, left, right, cond, hint).getOrElse(j)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression,
                      hint: JoinHint): Option[LogicalPlan] = cond match {
    case And(GreaterThanOrEqual(v1, lo), upper)
        if upper.isInstanceOf[LessThan] || upper.isInstanceOf[LessThanOrEqual] =>
      val (v2, hi) = upper match {
        case LessThan(a, b) => (a, b)
        case LessThanOrEqual(a, b) => (a, b)
        case _ => return None
      }
      // the same value expression must be both bounds' subject
      if (!v1.semanticEquals(v2)) return None
      if (v1.dataType != DoubleType || lo.dataType != DoubleType ||
          hi.dataType != DoubleType) return None
      (sideOf(v1, left, right), sideOf(lo, left, right),
        sideOf(hi, left, right)) match {
        case (Some(vLeft), Some(loLeft), Some(hiLeft))
            if loLeft == hiLeft && vLeft != loLeft =>
          val (pointSide, ivSide) = if (vLeft) (left, right) else (right, left)
          // the hint's sides follow their relations: if the point side
          // was the original RIGHT child, left/right hints swap with it
          val newHint =
            if (vLeft) hint else JoinHint(hint.rightHint, hint.leftHint)
          val w = Literal(BucketWidth, DoubleType)
          def bucketOf(e: Expression): Expression =
            Cast(Floor(Divide(e, w)), LongType)
          // bucketable iff 0 <= hi - lo <= W * MaxBuckets — double
          // arithmetic on purpose: NaN fails both comparisons, ±Inf
          // spans exceed the cap, inverted intervals are negative, and
          // nothing overflows (a Long span check could)
          val span = Subtract(hi, lo)
          val bucketable: Expression = And(
            GreaterThanOrEqual(span, Literal(0.0, DoubleType)),
            LessThanOrEqual(span,
              Literal(BucketWidth * MaxBucketsPerInterval, DoubleType)))
          require(bucketable.dataType == BooleanType)
          // point side: project + bucket column
          val pB = Alias(bucketOf(v1), "__rj_pb")()
          val pointPlan = Project(pointSide.output :+ pB, pointSide)
          // bucketable intervals: explode the covered bucket range.
          // Sequence is TimeZoneAwareExpression: `resolved` demands a
          // timeZoneId even for integral sequences, and the analyzer
          // rule that fills it has already run — set it here
          val seq = new Sequence(bucketOf(lo), bucketOf(hi),
            Literal(1L, LongType)).withTimeZone(conf.sessionLocalTimeZone)
          // nullability must equal the generator's element schema
          // (Sequence never yields null elements) or Generate stays
          // unresolved
          val iB = AttributeReference("__rj_ib", LongType,
            nullable = false)()
          val ivPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(iB),
            child = Filter(bucketable, ivSide))
          val newCond = And(EqualTo(pB.toAttribute, iB), cond)
          val bucketJoin = Project(j.output,
            Join(pointPlan, ivPlan, Inner, Some(newCond), newHint))
          // the remainder (inverted / unbounded / too-wide intervals)
          // keeps the original theta join — returning Join(j children)
          // unchanged would re-match this rule, so guard the interval
          // side with the negated bucketable predicate FIRST and emit
          // the condition with SWAPPED conjuncts (upper AND lower): the
          // matcher only fires on lower-first, and no built-in rule
          // reorders conjuncts (see scaladoc), so the rewrite is
          // idempotent even inside a fixed-point batch
          val rest = Filter(Not(Coalesce(Seq(bucketable,
            Literal(false, BooleanType)))), ivSide)
          val (rl, rr) = if (vLeft) (pointSide, rest) else (rest, pointSide)
          val restJoin = Project(j.output,
            Join(rl, rr, Inner,
              Some(And(upper, GreaterThanOrEqual(v1, lo))), hint))
          Some(Union(Seq(bucketJoin, restJoin)))
        case _ => None
      }
    case _ => None
  }
}
