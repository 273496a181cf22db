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
    * (Non-negative bounds are required for the {-1,0,1} candidate-bucket
    * set to be complete: with a negative bound, |a-b| can exceed the
    * bucket width w = c1+c2 and matches would be silently dropped.) */
  private case class Band(a: Expression, b: Expression, c1: Double, c2: Double) {
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

  private def litVal(e: Expression): Option[Double] = e match {
    case Literal(v: Number, _) => Some(v.doubleValue())
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => Some(v.toDouble)
    case _ => None
  }

  /** Match `x < y + c` / `x <= y + c` → upper bound c (exclusive bound
    * adjusted conservatively) and `x >= y - c` / `x > y - c` → lower c. */
  private def upperOf(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case LessThan(a, Add(b, c, _)) => litVal(c).map(v => (a, b, v))
    case LessThanOrEqual(a, Add(b, c, _)) => litVal(c).map(v => (a, b, v))
    case GreaterThan(Add(b, c, _), a) => litVal(c).map(v => (a, b, v))
    case GreaterThanOrEqual(Add(b, c, _), a) => litVal(c).map(v => (a, b, v))
    case _ => None
  }

  private def lowerOf(e: Expression): Option[(Expression, Expression, Double)] = e match {
    case GreaterThanOrEqual(a, Subtract(b, c, _)) => litVal(c).map(v => (a, b, v))
    case GreaterThan(a, Subtract(b, c, _)) => litVal(c).map(v => (a, b, v))
    case LessThanOrEqual(Subtract(b, c, _), a) => litVal(c).map(v => (a, b, v))
    case LessThan(Subtract(b, c, _), a) => litVal(c).map(v => (a, b, v))
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
      val uppers = conjuncts.flatMap(c => upperOf(c).map(c -> _))
      val lowers = conjuncts.flatMap(c => lowerOf(c).map(c -> _))
      // find a matching (a, b) pair with both bounds
      val band = (for {
        (_, (ua, ub, c1)) <- uppers.iterator
        (_, (la, lb, c2)) <- lowers.iterator
        if sameRef(ua, la) && sameRef(ub, lb)
        if c1 >= 0 && c2 >= 0 && c1 + c2 > 0
        // a strictly from one side, b strictly from the other
        if (ua.references.subsetOf(left.outputSet) && ub.references.subsetOf(right.outputSet)) ||
          (ua.references.subsetOf(right.outputSet) && ub.references.subsetOf(left.outputSet))
        if ua.dataType.isInstanceOf[NumericType] && ub.dataType.isInstanceOf[NumericType]
        // bucketing must be exact: either pure long arithmetic applies
        // (integral keys, whole-number bounds) or every key value is
        // exactly representable as a double
        if (integral(ua.dataType) && integral(ub.dataType) &&
          c1.isWhole && c2.isWhole && c1 + c2 < 9e18) ||
          (doubleExact(ua.dataType) && doubleExact(ub.dataType))
      } yield Band(ua, ub, c1, c2)).buffered.headOption

      band match {
        case None => j
        case Some(bd) =>
          // exact floor(x/w): pure-long arithmetic whenever the keys are
          // integral and the bounds whole (a 64-bit key cast to double
          // would mis-bucket past 2^53); double division otherwise (keys
          // already exactly double-representable per the match guard)
          val exactLong = integral(bd.a.dataType) && integral(bd.b.dataType) &&
            bd.c1.isWhole && bd.c2.isWhole
          def bucket(x: Expression): Expression =
            if (exactLong) {
              val xl = Cast(x, LongType)
              val wl = Literal(bd.width.toLong, LongType)
              val q = new IntegralDivide(xl, wl)
              val r = Remainder(xl, wl)
              If(LessThan(r, Literal(0L)), Subtract(q, Literal(1L)), q)
            } else {
              val w = Literal(bd.width, DoubleType)
              Cast(Floor(Divide(Cast(x, DoubleType), w)), LongType)
            }

          val aOnLeft = bd.a.references.subsetOf(left.outputSet)
          val (aSide, bSide) = if (aOnLeft) (left, right) else (right, left)

          // a side: one bucket key
          val aKey = Alias(bucket(bd.a), "__band_bucket_a")()
          val aProj = Project(aSide.output :+ aKey, aSide)

          // b side: explode to candidate buckets bucket(b) + k. With exact
          // long bucketing k ∈ {-1,0,1} is provably complete; on the
          // double path floor(x/w) can err by ±1 on EACH side
          // independently (true bucket difference is in {-1,0,1}), so the
          // worst case is ±3 — widen to k ∈ {-3..3}. The ANDed original
          // predicate discards false positives either way; the only cost
          // is a slightly larger explode.
          val bBucket = bucket(bd.b)
          val ks: Seq[Long] =
            if (exactLong) Seq(-1L, 0L, 1L) else (-3L to 3L)
          val candidates = CreateArray(ks.map {
            case 0L => bBucket
            case k if k < 0 => Subtract(bBucket, Literal(-k))
            case k => Add(bBucket, Literal(k))
          })
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
