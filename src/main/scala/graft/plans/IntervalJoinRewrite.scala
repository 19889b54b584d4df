package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule (SURVEY.md §2.3 / spark_guide "custom operator" tier (c)):
  * rewrite a naive interval-overlap join — the pure-inequality pattern
  * `a.s < b.e AND b.s < a.e` that Catalyst can only plan as a nested loop —
  * into the complete fixed-width bucket blocking of q_join_interval,
  * AUTOMATICALLY, so a user can write the declarative overlap predicate and
  * still get an equi-join plan that survives two large sides.
  *
  * Rewrite: each side gains a generated `graft_bk` column exploding the
  * buckets its interval covers (`floorDiv(s, B) .. floorDiv(e, B)`); the
  * join becomes `bk_l = bk_r AND <original condition> AND bk_l =
  * floorDiv(greatest(s_l, s_r), B)`. The last conjunct is the
  * exactly-once guard: of the shared covered buckets, a qualifying pair is
  * emitted only in the bucket holding the later of the two starts — which
  * overlap guarantees lies in BOTH covers (max(s_a, s_b) < min(e_a, e_b)),
  * so multiplicity is exactly 1 per satisfying pair and NO de-dup pass is
  * needed (the rewrite is safe for unkeyed rows). A final Project restores
  * the original output. ExtractEquiJoinKeys then sees the bk equality and
  * plans a hash/sort-merge join; the overlap predicate rides as residual.
  *
  * Scope guards (all must hold, else the join is left untouched):
  *  - `spark.graft.intervalJoin.enabled` (default false — opt-in; the
  *    explicit q_join_interval form stays the documented spelling);
  *  - inner join whose condition contains the overlap pattern built from
  *    strict `<` on deterministic int/long bounds (day numbers, epochs —
  *    the determinism-contract types; `<=` variants are NOT rewritten:
  *    closed upper bounds need an end-inclusive cover and nothing in the
  *    inventory produces them);
  *  - no existing cross-side equi conjunct (Catalyst already hash-joins
  *    those; this also makes the rule a fixed-point no-op on its own
  *    output, whose `bk_l = bk_r` is exactly such a conjunct).
  *
  * Bucket width (`spark.graft.intervalJoin.bucket`, default 64 units) is
  * the LSH-band-style knob: fan-out per row is len/B + 1 exploded copies,
  * per-bucket pair volume grows with B. NULL bounds produce a NULL
  * sequence, which Explode drops — sound, because a NULL bound can never
  * satisfy the overlap comparisons under an inner join. Malformed
  * intervals (e < s) keep exactly-once semantics: the stop bound is
  * clamped to `greatest(bucket(s), bucket(e))`, and for a qualifying pair
  * with e_a < s_a the guard bucket is bucket(s_a) (since s_b < e_a < s_a),
  * which the clamped cover retains.
  */
object IntervalJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {
  private def enabled: Boolean = SQLConf.get
    .getConfString("spark.graft.intervalJoin.enabled", "false").toBoolean
  private def bucketWidth: Long = SQLConf.get
    .getConfString("spark.graft.intervalJoin.bucket", "64").toLong

  private def isIntLike(e: Expression): Boolean =
    (e.dataType == IntegerType || e.dataType == LongType) && e.deterministic

  /** Exact floor division on longs (negative-safe; no double round trip):
    * (x - pmod(x, b)) div b. */
  private def floorDiv(x: Expression, b: Long): Expression = {
    val xl = Cast(x, LongType)
    new IntegralDivide(
      new Subtract(xl, new Pmod(xl, Literal(b))), Literal(b))
  }

  /** (ls, le, rs, re) when the conjuncts contain `ls < re AND rs < le`
    * with ls/le over `left` and rs/re over `right`. */
  private def overlapPattern(conjuncts: Seq[Expression],
      left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Expression)] = {
    def side(e: Expression): Option[Boolean] = {
      val refs = e.references
      if (refs.isEmpty) None
      else if (refs.subsetOf(left.outputSet)) Some(true)
      else if (refs.subsetOf(right.outputSet)) Some(false)
      else None
    }
    // normalized strict comparisons (a < b), int-typed, single-sided each
    val lts = conjuncts.flatMap {
      case LessThan(a, b) => Some((a, b))
      case GreaterThan(a, b) => Some((b, a))
      case _ => None
    }.filter { case (a, b) => isIntLike(a) && isIntLike(b) }
    val crossing = lts.flatMap { case (a, b) =>
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb => Some((a, b, sa))
        case _ => None
      }
    }
    // one comparison left→right (ls < re), one right→left (rs < le)
    val lr = crossing.collectFirst { case (a, b, true) => (a, b) }
    val rl = crossing.collectFirst { case (a, b, false) => (a, b) }
    (lr, rl) match {
      case (Some((ls, re)), Some((rs, le))) => Some((ls, le, rs, re))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && {
            val cs = splitConjunctivePredicates(cond)
            // fixed-point + scope guard: never touch a join that already
            // has a cross-side equi conjunct (incl. our own rewrites)
            val hasEqui = cs.exists {
              case EqualTo(a, b) =>
                (a.references.nonEmpty && b.references.nonEmpty) &&
                  ((a.references.subsetOf(left.outputSet) &&
                    b.references.subsetOf(right.outputSet)) ||
                   (a.references.subsetOf(right.outputSet) &&
                    b.references.subsetOf(left.outputSet)))
              case _ => false
            }
            !hasEqui && overlapPattern(cs, left, right).isDefined
          } =>
        val conjuncts = splitConjunctivePredicates(cond)
        val Some((ls, le, rs, re)) = overlapPattern(conjuncts, left, right)
        val b = bucketWidth
        def coveredBuckets(s: Expression, e: Expression): Expression = {
          val start = floorDiv(s, b)
          // strict `<` upper bound ⇒ half-open interval ⇒ last covered
          // bucket is floorDiv(e - 1); clamp keeps malformed rows legal
          // for Sequence's ascending step
          val stop = Greatest(Seq(start, floorDiv(new Subtract(Cast(e, LongType),
            Literal(1L)), b)))
          // ResolveTimeZone already ran (this is the optimizer): a
          // TimeZoneAwareExpression built here must carry its zone or the
          // plan flips back to unresolved and validation rejects the rule
          Sequence(start, stop, Some(Literal(1L)),
            Some(SQLConf.get.sessionLocalTimeZone))
        }
        def genSide(child: LogicalPlan, s: Expression, e: Expression)
            : (LogicalPlan, Attribute) = {
          val bk = AttributeReference("graft_bk", LongType, nullable = false)()
          (Generate(Explode(coveredBuckets(s, e)), Nil, outer = false, None,
            Seq(bk), child), bk)
        }
        val (genL, bkL) = genSide(left, ls, le)
        val (genR, bkR) = genSide(right, rs, re)
        // exactly-once guard: emit only in the bucket of the later start.
        // The two starts may carry different integral widths (analyzer
        // coercion widens comparisons, not our extracted operands) —
        // Greatest requires exact type agreement, so widen both to long.
        val canonical = EqualTo(bkL, floorDiv(
          Greatest(Seq(Cast(ls, LongType), Cast(rs, LongType))), b))
        val newCond = (Seq(EqualTo(bkL, bkR), canonical) ++ conjuncts)
          .reduce[Expression](And)
        Project(j.output, Join(genL, genR, Inner, Some(newCond), JoinHint.NONE))
    }
  }
}
