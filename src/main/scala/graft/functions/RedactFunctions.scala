package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Typed-placeholder redaction kernel (`redact_typed`).
  *
  * Replaces every match of N prioritized patterns with that pattern's
  * placeholder in ONE left-to-right pass: the patterns are compiled as a
  * single alternation `(p1)|(p2)|...` and a matcher loop appends the tag
  * of whichever alternative participated in each match. Equivalent work
  * done with per-type `regexp_replace` costs one full text traversal AND
  * one rebuilt string per pattern; this kernel pays one traversal and
  * one build total (and returns the input untouched — zero-copy — when
  * nothing matches, the overwhelmingly common case in a real corpus).
  *
  * Match semantics are position-priority: the leftmost match wins, and
  * at a shared start position the first pattern in rule order wins
  * (Java regex and RE2 are both leftmost-first, so a DuckDB oracle can
  * reproduce the result exactly — see q130 for the split/extract/
  * full-match construction that does so in pure SQL).
  *
  * Scale: scan-local, zero shuffles; the compiled alternation is a plan
  * literal built once and shipped inside the serialized expression.
  */
object RedactOps {

  /** Compiled rule set: the alternation pattern, the capture-group index
    * of each alternative's wrapper (inner groups shift the numbering —
    * computed from each pattern's own group count), and the tags. */
  final class RedactTable(val pattern: Pattern, val groupIdx: Array[Int],
      val tags: Array[String]) extends Serializable

  /** Per-JVM cache for NON-foldable rules columns: without it every row
    * would rebuild and Pattern.compile the whole table (O(rows ×
    * compile)). Keyed by the rule strings themselves; bounded crudely —
    * a rules column with >64 distinct values is already outside the
    * function's intended use (rules are configuration, not data), and a
    * full clear just re-pays one compile per surviving distinct value. */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[String, RedactTable]()

  /** [[buildTable]] through the cache — the eval path for a non-literal
    * rules argument. Foldable rules keep their once-per-expression table
    * and never touch this. */
  def cachedTable(arr: ArrayData): RedactTable = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      // length-prefixed so no rule content can alias another key split
      val s = arr.getUTF8String(i).toString
      sb.append(s.length).append(':').append(s)
      i += 1
    }
    val key = sb.toString
    val hit = tableCache.get(key)
    if (hit != null) hit
    else {
      if (tableCache.size() >= 64) tableCache.clear()
      tableCache.computeIfAbsent(key, _ => buildTable(arr))
    }
  }

  /** Build + compile a rule table from a flat [pattern, tag, ...] pair
    * array. Pattern order is priority order at a shared match start. */
  def buildTable(arr: ArrayData): RedactTable = {
    val n = arr.numElements()
    require(n >= 2 && n % 2 == 0,
      s"redact_typed: rules must be non-empty [pattern, tag, ...] pairs, got $n entries")
    val m = n / 2
    val tags = new Array[String](m)
    val groupIdx = new Array[Int](m)
    val sb = new java.lang.StringBuilder
    var g = 1
    var i = 0
    while (i < m) {
      val pat = arr.getUTF8String(2 * i).toString
      tags(i) = arr.getUTF8String(2 * i + 1).toString
      // numeric backreferences would silently re-target once the
      // patterns are concatenated into one alternation (group numbers
      // rebase) — PII would leak unredacted with no error. Refuse them.
      var j = 0
      while (j < pat.length - 1) {
        if (pat.charAt(j) == '\\') {
          if (pat.charAt(j + 1).isDigit)
            throw new IllegalArgumentException(
              s"redact_typed: pattern '$pat' contains a numeric " +
                "backreference; group numbers are rebased when rules are " +
                "combined into one alternation, so backreferences are not " +
                "supported")
          j += 2 // an escape consumes the next char
        } else j += 1
      }
      if (i > 0) sb.append('|')
      groupIdx(i) = g
      sb.append('(').append(pat).append(')')
      // wrapper group + however many capturing groups the pattern itself has
      g += 1 + Pattern.compile(pat).matcher("").groupCount()
      i += 1
    }
    new RedactTable(Pattern.compile(sb.toString), groupIdx, tags)
  }

  def redact(text: UTF8String, t: RedactTable): UTF8String = {
    val s = text.toString
    val m = t.pattern.matcher(s)
    if (!m.find()) return text // nothing to mask: zero-copy passthrough
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      // exactly one alternative participated in this match
      var i = 0
      while (m.start(t.groupIdx(i)) < 0) i += 1
      sb.append(t.tags(i))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    UTF8String.fromString(sb.toString)
  }

  private val emptyToks = new GenericArrayData(Array.empty[Any])

  /** Redaction + the matched spans, still in one pass: struct<clean,
    * toks>. `toks` (in match order) is what a removal report needs —
    * per-type counts are tiny filters over it instead of one more
    * full-text scan per type, and checksum predicates (e.g. Luhn) see
    * the exact masked values. */
  def redactReport(text: UTF8String, t: RedactTable): InternalRow = {
    val s = text.toString
    val m = t.pattern.matcher(s)
    if (!m.find()) return new GenericInternalRow(Array[Any](text, emptyToks))
    val sb = new java.lang.StringBuilder(s.length)
    val toks = new java.util.ArrayList[Any]()
    var last = 0
    do {
      sb.append(s, last, m.start())
      var i = 0
      while (m.start(t.groupIdx(i)) < 0) i += 1
      sb.append(t.tags(i))
      toks.add(UTF8String.fromString(m.group()))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString),
      new GenericArrayData(toks.toArray)))
  }
}

/** `redact_typed(text, rules)` — `text` with every match of the
  * prioritized patterns replaced by its typed placeholder, in one pass.
  * `rules` is a flat [pattern, tag, ...] array; a literal rule set is
  * compiled once per plan. */
case class RedactTyped(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "redact_typed"
  @transient private lazy val table: RedactOps.RedactTable =
    RedactOps.buildTable(right.eval(null).asInstanceOf[ArrayData])
  override def nullSafeEval(text: Any, rules: Any): Any =
    if (right.foldable) RedactOps.redact(text.asInstanceOf[UTF8String], table)
    else RedactOps.redact(text.asInstanceOf[UTF8String],
      RedactOps.cachedTable(rules.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the non-null guard keeps a foldable NULL table on the generic
    // branch, where nullSafeCodeGen yields NULL per row (nullIntolerant)
    // — the literal branch would force the lazy at PLAN time and NPE
    if (right.foldable && right.eval(null) != null) {
      val ref = ctx.addReferenceObj("redactTable", table,
        classOf[RedactOps.RedactTable].getName)
      defineCodeGen(ctx, ev, (t, _) => s"graft.functions.RedactOps.redact($t, $ref)")
    } else {
      defineCodeGen(ctx, ev, (t, r) =>
        s"graft.functions.RedactOps.redact($t, graft.functions.RedactOps.cachedTable($r))")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `redact_report(text, rules)` — struct<clean: string, toks:
  * array<string>>: the redacted text plus the matched spans in match
  * order, from the same single alternation pass. Per-type counts and
  * per-token checksum predicates become cheap array filters over `toks`
  * instead of one more full-text regex scan per type. */
case class RedactReport(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "redact_report"
  @transient private lazy val table: RedactOps.RedactTable =
    RedactOps.buildTable(right.eval(null).asInstanceOf[ArrayData])
  override def nullSafeEval(text: Any, rules: Any): Any =
    if (right.foldable) RedactOps.redactReport(text.asInstanceOf[UTF8String], table)
    else RedactOps.redactReport(text.asInstanceOf[UTF8String],
      RedactOps.cachedTable(rules.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the non-null guard keeps a foldable NULL table on the generic
    // branch, where nullSafeCodeGen yields NULL per row (nullIntolerant)
    // — the literal branch would force the lazy at PLAN time and NPE
    if (right.foldable && right.eval(null) != null) {
      val ref = ctx.addReferenceObj("redactTable", table,
        classOf[RedactOps.RedactTable].getName)
      defineCodeGen(ctx, ev, (t, _) => s"graft.functions.RedactOps.redactReport($t, $ref)")
    } else {
      defineCodeGen(ctx, ev, (t, r) =>
        s"graft.functions.RedactOps.redactReport($t, graft.functions.RedactOps.cachedTable($r))")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
