package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The ⚙normalize_text kernel (q108): lowercase + NFD accent strip +
  * non-letter/digit collapse. The DuckDB oracle replicates it as
  * `trim(regexp_replace(strip_accents(lower(text)), '[^\p{L}\p{Nd}]+', ' ', 'g'))`
  * — validated end-to-end on the gate corpora; the cases here pin the
  * kernel's unicode behavior beyond what the (ASCII) corpora exercise. */
class NormalizeTextSpec extends AnyFunSuite {

  private def norm(s: String): String =
    HashOps.normalizeText(UTF8String.fromString(s)).toString

  test("case folding, punctuation collapse, trim") {
    assert(norm("Hello,  World!") == "hello world")
    assert(norm("  a--b__c  ") == "a b c")
    assert(norm("") == "")
    assert(norm("!!!") == "")
    assert(norm("a1 B2") == "a1 b2")
  }

  test("accents strip to base letters (cross-lingual twins converge)") {
    assert(norm("Café") == "cafe")
    assert(norm("ÉLÈVE naïve señor") == "eleve naive senor")
    assert(norm("Zürich, Köln & München") == "zurich koln munchen")
    // the same sentence typed with and without accents normalizes equal
    assert(norm("Qualité des données") == norm("Qualite des donnees"))
  }

  test("non-Latin scripts survive (not a Latin-only filter)") {
    assert(norm("中文 данные") == "中文 данные")
    assert(norm("Привет, мир!") == "привет мир")
    // punctuation between CJK letters still collapses to one space
    assert(norm("中文。数据") == "中文 数据")
  }

  test("utf8proc-aligned corners: Indic vowel signs drop without a word break; sigma is context-free") {
    // U+093E DEVANAGARI VOWEL SIGN AA is category Mc: strip_accents
    // deletes it — the word must NOT split at the mark
    assert(norm("काम") == "कम")
    // per-code-point lowercase: final-position capital sigma lowers to
    // ordinary σ (U+03C3), never final-form ς — utf8proc's behavior
    assert(norm("ΑΓΡΟΣ") == "αγροσ")
    assert(norm("ὈΔΥΣΣΕΎΣ").last == 'σ')
  }

  test("idempotent and already-normal ASCII is untouched") {
    val plain = "the fast key order sort table scan"
    assert(norm(plain) == plain)
    val once = norm("Über-Größe: 100%")
    assert(norm(once) == once)
  }
}
