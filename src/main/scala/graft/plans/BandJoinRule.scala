package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Band-join optimization: rewrites an inner theta join whose condition
  * contains a *band* predicate
  *
  *     a >= b - c2  AND  a < b + c1        (a from one side, b from the
  *                                          other, c1/c2 literals)
  *
  * into a bucketized **equi** join: both sides are bucketed by
  * `floor(x / w)` with `w = c1 + c2`, the `b` side is expanded to its
  * three candidate buckets (k ∈ {-1,0,1}), the join becomes a hash join
  * on the bucket key, and the original band predicate is kept as an
  * exact post-condition.
  *
  * Motivation: Spark plans non-equi joins as BroadcastNestedLoopJoin —
  * O(|A|·|B|) predicate evaluations. The reference's own benchmark query
  * (`/root/reference/crates/arrow-zarr/benches/s3_bench.rs:222-234`) is
  * exactly this shape and costs 5.7B evaluations on the bench dataset;
  * bucketizing reduces it to the true match neighborhood. At 100 TB a
  * nested-loop band join is not runnable at all, while the bucketed
  * form is one ordinary shuffle join.
  *
  * Enabled via `SparkSessionExtensions` ([[GraftExtensions]]):
  *   spark.sql.extensions=graft.plans.GraftExtensions
  */
object BandJoinRule extends Rule[LogicalPlan] {

  /** band: a - b ∈ [-c2, c1), both literals, c1 >= 0, c2 >= 0, c1 + c2 > 0.
    * (Non-negative bounds are required for the candidate-bucket set to
    * be complete: with a negative bound, |a-b| can exceed the bucket
    * width w = c1+c2 and matches would be silently dropped.)
    * `c1L`/`c2L` carry the bound as an EXACT long when it has one —
    * extracting a >2^53 long literal through doubleValue() would
    * silently shrink the band width and drop matching rows. */
  private case class Band(
      a: Expression, b: Expression, c1: Double, c2: Double,
      c1L: Option[Long], c2L: Option[Long]) {
    def width: Double = c1 + c2
  }

  /** Double-based floor(x/w) bucketing is only exact while the key is
    * exactly representable as a double. Integral keys wider than 32 bits
    * (and decimals wider than a double mantissa) near 2^53 would land in
    * the wrong bucket — for those we either use exact integer arithmetic
    * (whole-number bounds) or skip the rewrite. */
  private def doubleExact(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | FloatType | DoubleType => true
    // decimals: only scale 0 (whole numbers ≤ 10^15 < 2^53) are truly
    // exact as doubles — e.g. decimal 0.1 is not, despite precision ≤ 15
    case d: DecimalType => d.precision <= 15 && d.scale == 0
    case _ => false // LongType, wide/fractional decimals
  }

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** A bound literal as (double value, exact long when lossless).
    * Integral literals past 2^52 return None outright: their double
    * image is lossy, and a band that wide is degenerate anyway — not
    * firing (keeping the original plan) is the only sound answer. A
    * whole-valued double/decimal literal within 2^52 also yields the
    * exact long, so `a <= b + 2.0D` on long keys still takes the exact
    * integer path. */
  private def litVal(e: Expression): Option[(Double, Option[Long])] = e match {
    case Literal(v: Number, ByteType | ShortType | IntegerType | LongType) =>
      val lv = v.longValue()
      if (math.abs(lv) > (1L << 52)) None else Some((lv.toDouble, Some(lv)))
    case Literal(v: org.apache.spark.sql.types.Decimal, _) =>
      val d = v.toDouble
      val l = if (d.isWhole && math.abs(d) <= (1L << 52).toDouble) Some(d.toLong) else None
      Some((d, l))
    case Literal(v: Number, _) =>
      val d = v.doubleValue()
      val l = if (d.isWhole && math.abs(d) <= (1L << 52).toDouble) Some(d.toLong) else None
      Some((d, l))
    case _ => None
  }

  /** Match `x < y + c` / `x <= y + c` → upper bound c (exclusive bound
    * adjusted conservatively) and `x >= y - c` / `x > y - c` → lower c. */
  private def upperOf(e: Expression)
      : Option[(Expression, Expression, Double, Option[Long])] = e match {
    case LessThan(a, Add(b, c, _)) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case LessThanOrEqual(a, Add(b, c, _)) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case GreaterThan(Add(b, c, _), a) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case GreaterThanOrEqual(Add(b, c, _), a) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case _ => None
  }

  private def lowerOf(e: Expression)
      : Option[(Expression, Expression, Double, Option[Long])] = e match {
    case GreaterThanOrEqual(a, Subtract(b, c, _)) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case GreaterThan(a, Subtract(b, c, _)) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case LessThanOrEqual(Subtract(b, c, _), a) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case LessThan(Subtract(b, c, _), a) => litVal(c).map { case (v, l) => (a, b, v, l) }
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def sameRef(x: Expression, y: Expression): Boolean = x.semanticEquals(y)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !j.getTagValue(BandJoinRule.rewritten).contains(true) &&
          // robust re-fire guard: the rewritten join carries helper
          // bucket attributes in its condition (tags do not survive
          // copies made by other optimizer rules)
          !cond.references.exists(_.name.startsWith("__band_bucket")) =>
      val conjuncts = splitConjuncts(cond)
      // an existing cross-side EQUI conjunct already gives Spark a hash
      // join key — the band predicate is then a cheap post-join filter,
      // and rewriting would only triple one side through the candidate
      // explode and widen the shuffle (plan pessimization, not a rescue
      // from a nested loop)
      def crossSides(l: Expression, r: Expression): Boolean =
        l.references.nonEmpty && r.references.nonEmpty &&
          ((l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
            (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet)))
      val hasCrossEqui = conjuncts.exists {
        case EqualTo(l, r) => crossSides(l, r)
        case EqualNullSafe(l, r) => crossSides(l, r)
        case _ => false
      }
      val uppers = if (hasCrossEqui) Nil else conjuncts.flatMap(upperOf)
      val lowers = if (hasCrossEqui) Nil else conjuncts.flatMap(lowerOf)
      // find a matching (a, b) pair with both bounds
      val band = (for {
        (ua, ub, c1, c1L) <- uppers.iterator
        (la, lb, c2, c2L) <- lowers.iterator
        if sameRef(ua, la) && sameRef(ub, lb)
        if c1 >= 0 && c2 >= 0 && c1 + c2 > 0
        // a strictly from one side, b strictly from the other
        if (ua.references.subsetOf(left.outputSet) && ub.references.subsetOf(right.outputSet)) ||
          (ua.references.subsetOf(right.outputSet) && ub.references.subsetOf(left.outputSet))
        if ua.dataType.isInstanceOf[NumericType] && ub.dataType.isInstanceOf[NumericType]
        // bucketing must be exact: either pure long arithmetic applies
        // (integral keys, exact long bounds — each ≤ 2^52, so the width
        // sum is exact too) or the keys are double-representable and the
        // sentinel-bucket scheme below covers every magnitude
        if (integral(ua.dataType) && integral(ub.dataType) &&
          c1L.isDefined && c2L.isDefined) ||
          (doubleExact(ua.dataType) && doubleExact(ub.dataType))
      } yield Band(ua, ub, c1, c2, c1L, c2L)).buffered.headOption

      band match {
        case None => j
        case Some(bd) =>
          // exact floor(x/w): pure-long arithmetic whenever the keys are
          // integral and the bounds carry exact longs (a 64-bit key cast
          // to double would mis-bucket past 2^53); double division
          // otherwise
          val exactLong = integral(bd.a.dataType) && integral(bd.b.dataType) &&
            bd.c1L.isDefined && bd.c2L.isDefined
          // both bounds ≤ 2^52, so the long width is exact and overflow-free
          val widthL: Long = if (exactLong) bd.c1L.get + bd.c2L.get else 0L
          def bucket(x: Expression): Expression =
            if (exactLong) {
              val xl = Cast(x, LongType)
              val wl = Literal(widthL, LongType)
              val q = new IntegralDivide(xl, wl)
              val r = Remainder(xl, wl)
              If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
            } else {
              val w = Literal(bd.width, DoubleType)
              Cast(Floor(Divide(Cast(x, DoubleType), w)), LongType)
            }

          // Double path magnitude guard: once |key| is within ~2^52
          // ulps of the band width, fl(b+c1) rounds far past the true
          // bound and floor(x/w) itself loses integer resolution — the
          // bucket difference of a matching pair becomes UNBOUNDED, so
          // no fixed candidate window is complete. Keys at or past
          // T = w·2^49 therefore collapse into one shared SENTINEL
          // bucket (a tiny nested-loop among only the astronomically
          // large keys, corrected by the ANDed original predicate);
          // below T both floors are precise to ±1 and the window below
          // is complete.
          val sentinelT: Double = bd.width * math.pow(2.0, 49)
          val SENT = Long.MaxValue
          // inert filler: far from every valid floor bucket (|floor| <
          // 2^49+2 below the threshold) AND with ±4 headroom so the
          // window arithmetic below can never wrap it onto SENT
          val NEVER = Long.MinValue + 100L
          def dblKey(x: Expression): Expression = Cast(x, DoubleType)
          def probeBucket(x: Expression): Expression =
            if (exactLong) bucket(x)
            else If(GreaterThanOrEqual(Abs(dblKey(x)), Literal(sentinelT)),
              Literal(SENT), bucket(x))

          val aOnLeft = bd.a.references.subsetOf(left.outputSet)
          val (aSide, bSide) = if (aOnLeft) (left, right) else (right, left)

          // a side: one bucket key
          val aKey = Alias(probeBucket(bd.a), "__band_bucket_a")()
          val aProj = Project(aSide.output :+ aKey, aSide)

          // b side: explode to candidate buckets bucket(b) + k. With
          // exact long bucketing k ∈ {-1,0,1} is provably complete. On
          // the double path, below the sentinel threshold the admitted
          // overshoot is < w/8 (true bucket difference ∈ {-2..2}) and
          // each computed floor can err by ±1 → k ∈ {-4..4}; one extra
          // slot emits the SENTINEL bucket when b is within 2w of the
          // threshold (so a pair straddling it still meets), and the
          // never-matching filler otherwise (a conditional slot must not
          // duplicate bucket(b) — that would duplicate join rows). The
          // ANDed original predicate discards all false positives.
          // Window base: past T+2w the floor is garbage (and its cast
          // could saturate onto SENT, duplicating join rows) — replace
          // it with the inert filler; such keys can only match via the
          // sentinel slot. In the straddle band [T-2w, T+2w) BOTH the
          // (still-precise) window buckets and the sentinel are emitted,
          // so pairs on either side of the threshold meet.
          val bBucket =
            if (exactLong) bucket(bd.b)
            else If(
              GreaterThanOrEqual(Abs(dblKey(bd.b)),
                Literal(sentinelT + 2.0 * bd.width)),
              Literal(NEVER), bucket(bd.b))
          val ks: Seq[Long] =
            if (exactLong) Seq(-1L, 0L, 1L) else (-4L to 4L)
          val windowSlots = ks.map {
            case 0L => bBucket
            case k if k < 0 => Subtract(bBucket, Literal(-k))
            case k => Add(bBucket, Literal(k))
          }
          val slots =
            if (exactLong) windowSlots
            else windowSlots :+ If(
              GreaterThanOrEqual(Abs(dblKey(bd.b)),
                Literal(sentinelT - 2.0 * bd.width)),
              Literal(SENT), Literal(NEVER))
          val candidates = CreateArray(slots)
          val gOut = AttributeReference("__band_bucket_b", LongType, nullable = true)()
          val bGen = Generate(Explode(candidates), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(gOut), child = bSide)

          val eq = EqualTo(aKey.toAttribute, gOut)
          val (newLeft, newRight) = if (aOnLeft) (aProj, bGen) else (bGen, aProj)
          val inner = Join(newLeft, newRight, Inner, Some(And(eq, cond)), hint)
          inner.setTagValue(BandJoinRule.rewritten, true)
          // restore the original output (drop helper columns)
          Project(j.output, inner)
      }
  }

  private val rewritten =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Boolean]("graft.bandJoinRewritten")
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`): injects the band-join
  * optimizer rule and registers every native kernel (`dot_f32`,
  * `simhash64`, `winnow64`, …) session-wide, so the library's full SQL
  * surface is available without per-query register calls. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BandJoinRule)
    graft.functions.VectorFunctions.descriptions.foreach(ext.injectFunction)
  }
}
