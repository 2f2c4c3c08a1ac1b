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
  * on the truncation implies the same lower bound on `x`. An *upper*
  * bound transfers with the unit's maximum bucket length added:
  * `trunc(x) ≤ T ⟹ x < T + maxLen(unit)`, because
  * `x − trunc(x) < maxLen(unit)`. `maxLen` uses the longest possible
  * calendar bucket (31-day months, 366-day years) plus a 26-hour slack
  * for units ≥ MINUTE — wall-clock truncation in a non-UTC session zone
  * can stretch a bucket across a DST/offset transition (a fall-back day
  * is 25 h; tzdb offsets range −12…+14 with second-level components
  * historically), and no real transition exceeds 26 h. Sub-second units
  * need no slack: tzdb offsets are whole seconds, so second-and-finer
  * buckets are exact in absolute time. The slack costs nothing for
  * pruning — one extra day of row groups against a scan that would
  * otherwise read everything.
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

  /** A pushdown-eligible timestamp scan expression: a plain TimestampType
    * attribute, or `cast(ntzAttr AS timestamp)` — the shape
    * [[graft.Tables.events]] produces for isAdjustedToUTC=false
    * (TimestampNTZ-inferred) parquet. Emitting a comparison on the cast
    * is sound for any session zone (the bound is implied on the cast's
    * VALUE); Spark's own UnwrapCastInBinaryComparison, running in the
    * same fixed-point batch, then rewrites it to a plain NTZ-attribute
    * comparison, which the parquet source accepts into PushedFilters. */
  private object PushableTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case a: Attribute if a.dataType == TimestampType => Some(a)
      case c @ Cast(a: Attribute, TimestampType, _, _)
          if a.dataType == TimestampNTZType => Some(c)
      case _ => None
    }
  }

  /** Peel monotone `date_trunc(unit, inner)`; yields the inner expression
    * and the unit's maximum bucket length in micros (for upper bounds). */
  private object Trunc {
    private val Hour = 3600L * 1000000L
    private val Day = 24L * Hour
    /** Covers any historical offset change (see scaladoc soundness note). */
    private val TzSlack = 26L * Hour

    private def maxLenMicros(unit: String): Option[Long] = {
      val base = unit.toUpperCase(java.util.Locale.ROOT) match {
        case "MICROSECOND" => Some(1L)
        case "MILLISECOND" => Some(1000L)
        case "SECOND" => Some(1000000L)
        case "MINUTE" => Some(60L * 1000000L)
        case "HOUR" => Some(Hour)
        case "DAY" | "DD" => Some(Day)
        case "WEEK" => Some(7L * Day)
        case "MON" | "MONTH" | "MM" => Some(31L * Day)
        case "QUARTER" => Some(92L * Day)
        case "YEAR" | "YYYY" | "YY" => Some(366L * Day)
        case _ => None // unknown format: date_trunc returns null; no bound
      }
      base.map(b => if (b >= 60L * 1000000L) b + TzSlack else b)
    }

    def unapply(e: Expression): Option[(Expression, Option[Long])] = e match {
      case t: TruncTimestamp if t.format.foldable =>
        val unit = Option(t.format.eval()).map(_.toString)
        Some((t.timestamp, unit.flatMap(maxLenMicros)))
      case _ => None
    }
  }

  private def lower(raw: Attribute, tUs: Long): Expression =
    GreaterThanOrEqual(raw, Literal(tUs * 1000L - 999L, LongType))
  private def upper(raw: Attribute, tUs: Long): Expression =
    LessThan(raw, Literal(tUs * 1000L, LongType))

  /** Implied raw-column bounds for one conjunct (empty when no pattern
    * matches). */
  private def implied(c: Expression): Seq[Expression] = c match {
    // Base cases for a pushable timestamp scan expression (plain column
    // or NTZ cast — see PushableTs): the comparison is itself the
    // (pushable) bound. Standalone conjuncts of this shape re-emit
    // themselves and are dropped by the caller's semanticEquals dedup;
    // the cases exist so the date_trunc/IN recursions terminate usefully
    // on ordinary columns — date_trunc('day', ts) ≥ T on a parquet ts
    // column previously derived NO pushable bound at all.
    case GreaterThanOrEqual(PushableTs(e), TsLit(t)) =>
      Seq(GreaterThanOrEqual(e, Literal(t, TimestampType)))
    case LessThanOrEqual(PushableTs(e), TsLit(t)) =>
      Seq(LessThanOrEqual(e, Literal(t, TimestampType)))
    case LessThan(PushableTs(e), TsLit(t)) =>
      Seq(LessThan(e, Literal(t, TimestampType)))
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
    // date_trunc bounds transfer to the inner expression; recurse so
    // date_trunc('day', timestamp_micros(raw div 1000)) op T reaches raw.
    // Lower: trunc(x) ≥ T ⟹ x ≥ T (since trunc(x) ≤ x).
    // Upper: trunc(x) ≤ T ⟹ x < T + maxLen (since x − trunc(x) < maxLen);
    //        trunc(x) < T ⟹ trunc(x) ≤ T − 1μs ⟹ x < T − 1μs + maxLen.
    case GreaterThanOrEqual(Trunc(inner, _), r @ TsLit(_)) =>
      implied(GreaterThanOrEqual(inner, r))
    case GreaterThan(Trunc(inner, _), r @ TsLit(_)) =>
      implied(GreaterThanOrEqual(inner, r)) // trunc > T ⟹ inner ≥ trunc > T ⟹ inner ≥ T
    case LessThanOrEqual(l @ TsLit(_), Trunc(inner, _)) =>
      implied(GreaterThanOrEqual(inner, l))
    case LessThan(l @ TsLit(_), Trunc(inner, _)) =>
      implied(GreaterThanOrEqual(inner, l))
    case LessThanOrEqual(Trunc(inner, Some(ml)), TsLit(t)) =>
      implied(LessThan(inner, Literal(t + ml, TimestampType)))
    case LessThan(Trunc(inner, Some(ml)), TsLit(t)) =>
      implied(LessThan(inner, Literal(t - 1 + ml, TimestampType)))
    case GreaterThanOrEqual(TsLit(t), Trunc(inner, Some(ml))) =>
      implied(LessThan(inner, Literal(t + ml, TimestampType)))
    case GreaterThan(TsLit(t), Trunc(inner, Some(ml))) =>
      implied(LessThan(inner, Literal(t - 1 + ml, TimestampType)))
    case EqualTo(Trunc(inner, ml), r @ TsLit(t)) =>
      implied(GreaterThanOrEqual(inner, r)) ++
        ml.toSeq.flatMap(m => implied(LessThan(inner, Literal(t + m, TimestampType))))
    case EqualTo(r @ TsLit(t), Trunc(inner, ml)) =>
      implied(GreaterThanOrEqual(inner, r)) ++
        ml.toSeq.flatMap(m => implied(LessThan(inner, Literal(t + m, TimestampType))))
    // IN-list: the disjunction of equalities implies the [min, max] hull,
    // which IS a conjunct — ts IN (t₁…tₙ) ⟹ min(tᵢ) ≤ ts ≤ max(tᵢ).
    case In(e, list) if list.nonEmpty =>
      val ts = list.collect { case TsLit(t) => t }
      if (ts.length != list.length) Seq.empty // non-literal member: no hull
      else
        implied(GreaterThanOrEqual(e, Literal(ts.min, TimestampType))) ++
          implied(LessThanOrEqual(e, Literal(ts.max, TimestampType)))
    // Same for InSet — OptimizeIn rewrites In to InSet past
    // spark.sql.optimizer.inSetConversionThreshold (default 10) EARLIER
    // in the same batch, and the realistic big time-slice IN-list is
    // exactly that case. Timestamp internals are Long micros (nulls in
    // the set can never match, so the hull over the non-null members is
    // still implied for every row the predicate keeps).
    case InSet(e, hset) if hset.nonEmpty && e.dataType == TimestampType =>
      val ts = hset.toSeq.collect { case t: Long if math.abs(t) < SafeMicros => t }
      if (ts.isEmpty || ts.length != hset.count(_ != null)) Seq.empty
      else
        implied(GreaterThanOrEqual(e, Literal(ts.min, TimestampType))) ++
          implied(LessThanOrEqual(e, Literal(ts.max, TimestampType)))
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
