package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: derive parquet-pushable range predicates implied by
  * filters on monotone timestamp transforms.
  *
  * The driver's `events.ts` is parquet TIMESTAMP(NANOS), which Spark reads
  * as a raw long; [[graft.Tables.events]] converts it with
  * `timestamp_micros(ts div 1000)`. A time-range filter on the converted
  * column can never reach the parquet scan — at 100 TB that is a full-table
  * scan for every time-slice query. This rule adds the *implied* bound on
  * the raw nanosecond column as an extra conjunct. Adding an implied
  * conjunct is always semantics-preserving (`p ⟹ q` gives
  * `p AND q ≡ p`), and the new conjunct is a plain attribute comparison,
  * so the datasource strategy pushes it into `PushedFilters` and row
  * groups outside the range are skipped via parquet min/max stats.
  *
  * Soundness of the bounds, with `tsμ(raw) = raw div 1000` (Spark's `div`
  * truncates toward zero) and `T` the literal micros value:
  *  - `tsμ(raw) <  T ⟹ raw <  T·1000`       (if `raw ≥ T·1000`, trunc-div
  *    gives `tsμ ≥ T` for either sign — contradiction);
  *  - `tsμ(raw) ≥  T ⟹ raw ≥  T·1000 − 999` (if `raw ≤ (T−1)·1000 − …`,
  *    i.e. `raw < T·1000 − 999`, then `tsμ ≤ T−1 < T`);
  *  - `≤` / `>` reduce to the above with `T ± 1`;
  *  - `=` yields both bounds.
  * For `date_trunc(unit, x)` (monotone, `trunc(x) ≤ x`): a *lower* bound
  * on the truncation implies the same lower bound on `x`; upper bounds do
  * NOT transfer and are left alone.
  *
  * The rule is idempotent (implied conjuncts already present are not
  * re-added), so it is safe inside the fixed-point operator-optimization
  * batch it is injected into by [[GraftExtensions]].
  */
object ImpliedScanRanges extends Rule[LogicalPlan] {

  /** Micros magnitudes safe to multiply by 1000 without Long overflow. */
  private val SafeMicros = Long.MaxValue / 1000 - 1

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** `timestamp_micros(raw div 1000)` where `raw` is a plain long
    * attribute (pushable); extracts `raw`. */
  private object NanoTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide =>
          (d.left, d.right) match {
            case (a: Attribute, Literal(1000L, LongType)) if a.dataType == LongType =>
              Some(a)
            case _ => None
          }
        case _ => None
      }
      case _ => None
    }
  }

  /** A timestamp literal's internal micros value, when in the safe range. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if math.abs(v) < SafeMicros => Some(v)
      case _ => None
    }
  }

  /** Peel monotone `date_trunc(unit, inner)` for lower bounds only. */
  private object Trunc {
    def unapply(e: Expression): Option[Expression] = e match {
      case t: TruncTimestamp if t.format.foldable => Some(t.timestamp)
      case _ => None
    }
  }

  private def lower(raw: Attribute, tUs: Long): Expression =
    GreaterThanOrEqual(raw, Literal(tUs * 1000L - 999L, LongType))
  private def upper(raw: Attribute, tUs: Long): Expression =
    LessThan(raw, Literal(tUs * 1000L, LongType))

  /** Implied raw-column bounds for one conjunct (empty when no pattern
    * matches). `Trunc` peeling only contributes lower bounds. */
  private def implied(c: Expression): Seq[Expression] = c match {
    case LessThan(NanoTs(raw), TsLit(t))            => Seq(upper(raw, t))
    case LessThanOrEqual(NanoTs(raw), TsLit(t))     => Seq(upper(raw, t + 1))
    case GreaterThanOrEqual(NanoTs(raw), TsLit(t))  => Seq(lower(raw, t))
    case GreaterThan(NanoTs(raw), TsLit(t))         => Seq(lower(raw, t + 1))
    case EqualTo(NanoTs(raw), TsLit(t))             => Seq(lower(raw, t), upper(raw, t + 1))
    // flipped operand order
    case GreaterThan(TsLit(t), NanoTs(raw))         => Seq(upper(raw, t))
    case GreaterThanOrEqual(TsLit(t), NanoTs(raw))  => Seq(upper(raw, t + 1))
    case LessThanOrEqual(TsLit(t), NanoTs(raw))     => Seq(lower(raw, t))
    case LessThan(TsLit(t), NanoTs(raw))            => Seq(lower(raw, t + 1))
    case EqualTo(TsLit(t), NanoTs(raw))             => Seq(lower(raw, t), upper(raw, t + 1))
    // date_trunc lower bounds transfer to the inner expression; recurse so
    // date_trunc('day', timestamp_micros(raw div 1000)) ≥ T reaches raw.
    case GreaterThanOrEqual(Trunc(inner), r @ TsLit(_)) =>
      implied(GreaterThanOrEqual(inner, r))
    case GreaterThan(Trunc(inner), r @ TsLit(_)) =>
      implied(GreaterThanOrEqual(inner, r)) // trunc > T ⟹ inner ≥ trunc > T ⟹ inner ≥ T
    case LessThanOrEqual(l @ TsLit(_), Trunc(inner)) =>
      implied(GreaterThanOrEqual(inner, l))
    case LessThan(l @ TsLit(_), Trunc(inner)) =>
      implied(GreaterThanOrEqual(inner, l))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val extra = conjuncts.flatMap(implied)
        .filterNot(e => conjuncts.exists(_.semanticEquals(e)))
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}

/** `SparkSessionExtensions` entry point — usable both programmatically
  * (`builder.withExtensions(new GraftExtensions)`) and via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => ImpliedScanRanges)
}
