package graft.zarr

import org.apache.spark.sql.sources._

/** Chunk-granularity predicate evaluation for chunk skipping.
  *
  * Mirrors the reference's inexact pushdown (`table_provider.rs:91-96` +
  * any-row semantics `filter.rs:61-83`): the pushed filters are evaluated
  * against the decoded predicate columns of a chunk; if NO row satisfies
  * the conjunction the whole chunk is skipped, otherwise all rows are
  * emitted and Spark's residual `Filter` node does the exact row
  * filtering.
  *
  * Unsupported predicates evaluate to `true` (conservative: never skip a
  * chunk we can't reason about). Values are never null at read time
  * (SURVEY §1.3), so IsNull=false / IsNotNull=true.
  */
object ChunkFilter {

  /** Column names a filter tree references. */
  def references(f: Filter): Seq[String] = f.references.toSeq

  /** Can this filter be used for chunk skipping? (all leaves understood) */
  def supported(f: Filter): Boolean = f match {
    case EqualTo(_, _) | EqualNullSafe(_, _) | GreaterThan(_, _) |
        GreaterThanOrEqual(_, _) | LessThan(_, _) | LessThanOrEqual(_, _) |
        In(_, _) | IsNull(_) | IsNotNull(_) |
        StringStartsWith(_, _) | StringEndsWith(_, _) | StringContains(_, _) => true
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case _ => false
  }

  /** True iff at least one row of the chunk satisfies all `filters`.
    * `cols` maps column name → (decoded chunk column, row→elem mapping or
    * null for identity). */
  def anyRowMatches(
      filters: Seq[Filter],
      cols: Map[String, (ChunkColumn, Array[Int])],
      nRows: Int): Boolean = {
    if (filters.isEmpty) return true
    var r = 0
    while (r < nRows) {
      var all = true
      var i = 0
      while (all && i < filters.length) {
        if (!eval(filters(i), cols, r)) all = false
        i += 1
      }
      if (all) return true
      r += 1
    }
    false
  }

  private def value(cols: Map[String, (ChunkColumn, Array[Int])], name: String, r: Int): Any = {
    val (c, mapping) = cols(name)
    c.get(if (mapping eq null) r else mapping(r))
  }

  private def eval(f: Filter, cols: Map[String, (ChunkColumn, Array[Int])], r: Int): Boolean =
    f match {
      case EqualTo(a, v) => cmp(value(cols, a, r), v) == 0
      case EqualNullSafe(a, v) => cmp(value(cols, a, r), v) == 0
      case GreaterThan(a, v) => cmp(value(cols, a, r), v) > 0
      case GreaterThanOrEqual(a, v) => cmp(value(cols, a, r), v) >= 0
      case LessThan(a, v) => cmp(value(cols, a, r), v) < 0
      case LessThanOrEqual(a, v) => cmp(value(cols, a, r), v) <= 0
      case In(a, vs) => { val x = value(cols, a, r); vs.exists(v => cmp(x, v) == 0) }
      case IsNull(_) => false
      case IsNotNull(_) => true
      case StringStartsWith(a, p) => value(cols, a, r).toString.startsWith(p)
      case StringEndsWith(a, p) => value(cols, a, r).toString.endsWith(p)
      case StringContains(a, p) => value(cols, a, r).toString.contains(p)
      case And(l, rr) => eval(l, cols, r) && eval(rr, cols, r)
      case Or(l, rr) => eval(l, cols, r) || eval(rr, cols, r)
      case Not(c) => !eval(c, cols, r)
      case _ => true // unknown leaf: cannot exclude the chunk
    }

  /** Numeric-widening comparison between a chunk value and a literal
    * (shared with [[ChunkStats]] interval evaluation and the aggregate
    * pushdown's global min/max fold). */
  private[graft] def cmp(x: Any, v: Any): Int = (x, v) match {
    case (a: String, b: String) => cmpUtf8(a, b)
    case (a: Boolean, b: Boolean) => java.lang.Boolean.compare(a, b)
    case (a: java.math.BigDecimal, b) => a.compareTo(toBigDec(b))
    case (a, b: java.math.BigDecimal) => toBigDec(a).compareTo(b)
    case (a: Number, b: Number) =>
      (a, b) match {
        case (x1: java.lang.Float, _) => cmpDouble(x1.doubleValue(), b.doubleValue())
        case (x1: java.lang.Double, _) => cmpDouble(x1.doubleValue(), b.doubleValue())
        case (_, y1: java.lang.Float) => cmpDouble(a.doubleValue(), y1.doubleValue())
        case (_, y1: java.lang.Double) => cmpDouble(a.doubleValue(), y1.doubleValue())
        case _ => java.lang.Long.compare(a.longValue(), b.longValue())
      }
    case (a, b) => if (a == b) 0 else 1 // incomparable: only equality meaningful
  }

  /** Spark SQL's floating order EXCEPT that -0.0 and 0.0 are EQUAL
    * (primitive `==` in codegen'd comparisons; DuckDB agrees) —
    * `Double.compare` alone orders -0.0 < 0.0, and a skip verdict in
    * that order REFUTES a chunk of -0.0s against `EqualTo(0.0)` (or
    * `GreaterThanOrEqual(0.0)`): a silent row drop through every skip
    * layer this comparator feeds (segment bounds, inner-chunk masks,
    * decode-and-test). `+ 0.0` normalizes -0.0 to 0.0 and is identity
    * on every other value including NaN, whose Double.compare order
    * (largest, self-equal) already matches Spark's. */
  private def cmpDouble(x: Double, y: Double): Int =
    java.lang.Double.compare(x + 0.0d, y + 0.0d)

  /** Code-point order — identical to the UTF-8 binary order Spark's own
    * `UTF8String` comparisons use. `String.compareTo` (UTF-16 code-unit
    * order) disagrees with it exactly where a supplementary character
    * meets a BMP character in [U+E000, U+FFFF]: under code-unit order a
    * surrogate (0xD800-0xDFFF) sorts BELOW U+E000, under UTF-8 byte order
    * the supplementary code point it encodes sorts ABOVE all of the BMP.
    * A skip verdict computed in the wrong order can drop a chunk the
    * engine's residual filter would have kept (e.g. value U+10000 vs
    * predicate > U+E000), so every string comparison feeding a skip or a
    * pushed aggregate goes through this. The surrogate remap below is the
    * standard UTF-16→UTF-8-order fixup: [0xE000,0xFFFF] -0x800,
    * surrogates +0x2000 — monotone on each range, disjoint images. */
  private[graft] def cmpUtf8(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      var x = a.charAt(i).toInt
      var y = b.charAt(i).toInt
      if (x != y) {
        if (x >= 0xd800) x += (if (x >= 0xe000) -0x800 else 0x2000)
        if (y >= 0xd800) y += (if (y >= 0xe000) -0x800 else 0x2000)
        return x - y
      }
      i += 1
    }
    a.length - b.length
  }

  private def toBigDec(v: Any): java.math.BigDecimal = v match {
    case d: java.math.BigDecimal => d
    case d: scala.math.BigDecimal => d.bigDecimal
    case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
    case n: Number => new java.math.BigDecimal(n.toString)
    case other => new java.math.BigDecimal(other.toString)
  }
}
