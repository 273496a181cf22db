package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The redact_typed / redact_report kernels (q130): one alternation
  * pass, typed placeholders, position-priority semantics. The gate
  * corpora exercise the six PII shapes end-to-end against the DuckDB
  * oracle; the cases here pin the kernel mechanics the corpora can't
  * isolate — group-index bookkeeping with inner groups, priority at a
  * shared start, the zero-copy passthrough, and the report's tokens. */
class RedactSpec extends AnyFunSuite {

  private def table(rules: (String, String)*): RedactOps.RedactTable =
    RedactOps.buildTable(new GenericArrayData(
      rules.flatMap { case (p, t) => Seq(p, t) }
        .map(s => UTF8String.fromString(s)).toArray[Any]))

  private def redact(s: String, rules: (String, String)*): String =
    RedactOps.redact(UTF8String.fromString(s), table(rules: _*)).toString

  test("typed placeholders, multiple matches, tail preserved") {
    assert(redact("a 12 b 345 c", "[0-9]{3}" -> "[3D]", "[0-9]+" -> "[N]")
      == "a [N] b [3D] c")
    assert(redact("x9", "[0-9]" -> "[D]") == "x[D]")
    assert(redact("9x", "[0-9]" -> "[D]") == "[D]x")
  }

  test("no match returns the input object untouched (zero-copy)") {
    val in = UTF8String.fromString("nothing to see")
    val out = RedactOps.redact(in, table("[0-9]+" -> "[N]"))
    assert(out eq in)
  }

  test("priority: earlier rule wins at a shared start position") {
    // both alternatives match at position 0; rule order decides
    assert(redact("abc", "ab" -> "[X]", "abc" -> "[Y]") == "[X]c")
    assert(redact("abc", "abc" -> "[Y]", "ab" -> "[X]") == "[Y]")
  }

  test("position beats priority: the leftmost match wins") {
    // the lower-priority rule matches earlier in the string
    assert(redact("b a", "a" -> "[A]", "b" -> "[B]") == "[B] [A]")
  }

  test("inner capture groups do not confuse the tag selection") {
    // first pattern has TWO inner groups; second must still tag right
    val r = redact("ababab 77", "(a)(b)(?:ab)+" -> "[AB]", "([0-9])+" -> "[N]")
    assert(r == "[AB] [N]")
  }

  test("report returns cleaned text plus tokens in match order") {
    val row = RedactOps.redactReport(
      UTF8String.fromString("a 12 b 345 c"), table("[0-9]+" -> "[N]"))
    assert(row.getUTF8String(0).toString == "a [N] b [N] c")
    val toks = row.getArray(1)
    assert(toks.numElements() == 2)
    assert(toks.getUTF8String(0).toString == "12")
    assert(toks.getUTF8String(1).toString == "345")
  }

  test("report with no match: input text back, empty tokens") {
    val in = UTF8String.fromString("clean")
    val row = RedactOps.redactReport(in, table("[0-9]+" -> "[N]"))
    assert(row.getUTF8String(0) eq in)
    assert(row.getArray(1).numElements() == 0)
  }

  test("numeric backreferences are refused (alternation rebases group numbers)") {
    // in the combined (p1)|(p2) pattern, a later rule's \1 would point
    // at the FIRST rule's wrapper group — PII would silently leak
    val e = intercept[IllegalArgumentException] {
      table("[a-z]+@x" -> "[EMAIL]", "([0-9])\\1" -> "[DD]")
    }
    assert(e.getMessage.contains("backreference"), e.getMessage)
    // an escaped backslash before a digit is NOT a backreference
    assert(redact("a\\1b", "\\\\1" -> "[ESC]") == "a[ESC]b")
  }

  test("malformed rule arrays are refused loudly") {
    intercept[IllegalArgumentException] {
      table() // empty
    }
    intercept[IllegalArgumentException] {
      RedactOps.buildTable(new GenericArrayData(
        Array[Any](UTF8String.fromString("[0-9]")))) // odd length
    }
  }
}
