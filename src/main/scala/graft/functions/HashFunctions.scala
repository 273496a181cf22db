package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the dedup signature computations. Each is the
  * exact arithmetic of the corresponding oracle SQL (see
  * `graft.queries.Dedup`) — md5 hex in, deterministic signature out —
  * but as one tight Java loop instead of ~1k Catalyst lambda
  * invocations per row.
  */
object HashOps {

  /** 64-bit SimHash from per-word md5 hex strings: bit b sums
    * `2*((hexdigit(h[b/4]) >> (b%4)) & 1) - 1` over words; output is the
    * 64-char '0'/'1' string (bit 0 first) — identical to the oracle's
    * `list_transform(generate_series(0,63), ...)` formula. */
  def simhash64(hs: ArrayData): UTF8String = {
    val n = hs.numElements()
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      // null elements (null words hashed by a null-tolerant producer)
      // contribute nothing, mirroring how SQL aggregates skip NULLs
      if (hs.isNullAt(i)) { i += 1 }
      else {
      val h = hs.getUTF8String(i).getBytes // 32 ascii hex chars
      if (h.length != 32)
        throw new IllegalArgumentException(
          s"simhash64: elements must be 32-char lowercase md5 hex, got length ${h.length}")
      var b = 0
      while (b < 64) {
        val c = h(b >> 2)
        val digit = if (c <= '9') c - '0' else c - 'a' + 10
        acc(b) += 2 * ((digit >> (b & 3)) & 1) - 1
        b += 1
      }
      i += 1
      }
    }
    val out = new Array[Byte](64)
    var b = 0
    while (b < 64) { out(b) = if (acc(b) > 0) '1' else '0'; b += 1 }
    UTF8String.fromBytes(out)
  }

  /** 16-slot rotation MinHash over per-shingle md5 hex strings: slot i is
    * `min over shingles of substr(md5(x)||md5(x), i+1, 16)` — identical
    * to the oracle (the doubling is done internally). */
  def minhash16(hs: ArrayData): ArrayData = {
    val n = hs.numElements()
    val mins = new Array[String](16)
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) { i += 1 }
      else {
      val h32 = hs.getUTF8String(i).toString
      if (h32.length != 32)
        throw new IllegalArgumentException(
          s"minhash16: elements must be 32-char lowercase md5 hex, got length ${h32.length}")
      val h = h32 + h32
      var j = 0
      while (j < 16) {
        val sub = h.substring(j, j + 16)
        if (mins(j) == null || sub.compareTo(mins(j)) < 0) mins(j) = sub
        j += 1
      }
      i += 1
      }
    }
    // empty / all-null input: the oracle's `min over shingles` is NULL —
    // sixteen empty-string slots would make every such row
    // minhash-IDENTICAL, turning unrelated empty documents into
    // band-join duplicates
    if (mins(0) == null) null
    else new GenericArrayData(mins.map(m => UTF8String.fromString(m)))
  }
  /** Distinct word 3-gram shingles — the exact arithmetic of
    * `array_distinct(transform(sequence(1, greatest(n-2, 1)),
    *   i -> concat_ws(' ', slice(words, i, 3))))`
    * with `words = split(text, ' ', -1)`, as one pass. */
  def shingles3(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val count = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val hi = math.min(i + 3, n)
      val sb = new java.lang.StringBuilder(64)
      var j = i
      while (j < hi) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** DSIR log-importance score (q109): run-length fold over the SORTED
    * feature array — UTF8String binary order, identical to Spark's
    * `array_sort` and DuckDB's `ORDER BY feat` — adding
    * `run_count · lr(bucket)` per distinct feature, where bucket =
    * int(first 4 md5 hex digits of the feature's UTF-8 bytes) mod
    * lr.length. Exactly the terms, in exactly the order, of the q109
    * oracle's `list_sum(list(cnt * w ORDER BY feat))` — one tight loop
    * instead of an interpreted higher-order fold (measured 3.0 → sub-
    * second at sf0.1). */
  def dsirScore(feats: ArrayData, lr: Array[Double]): Double = {
    val n = feats.numElements()
    if (n == 0) return 0.0
    val arr = new Array[UTF8String](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!feats.isNullAt(i)) { arr(m) = feats.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == 0) return 0.0
    // UTF8String's compareTo is binary (byte) order
    java.util.Arrays.sort(arr.asInstanceOf[Array[AnyRef]], 0, m)
    val md = java.security.MessageDigest.getInstance("MD5")
    var acc = 0.0
    var runStart = 0
    var j = 1
    while (j <= m) {
      if (j == m || !arr(j).equals(arr(runStart))) {
        val d = md.digest(arr(runStart).getBytes)
        // first 4 hex digits = first 2 bytes, matching
        // conv(substring(md5(f), 1, 4), 16, 10) / ('0x'||substr(...))::INT
        val b = (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % lr.length
        acc += (j - runStart).toDouble * lr(b)
        runStart = j
      }
      j += 1
    }
    acc
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex of a 16-byte digest (shared by every md5-emitting
    * kernel so the encoding cannot drift between them). */
  private def digestHex(d: Array[Byte]): String = {
    val cs = new Array[Char](32)
    var j = 0
    while (j < 16) {
      cs(2 * j) = hexDigits((d(j) >> 4) & 0xf)
      cs(2 * j + 1) = hexDigits(d(j) & 0xf)
      j += 1
    }
    new String(cs)
  }

  /** md5 hex (lowercase) of every element — value-identical to
    * `transform(arr, x -> md5(x))` without per-element lambda dispatch. */
  def md5Array(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { out(i) = null; i += 1 }
      else {
      md.reset()
      out(i) = UTF8String.fromString(
        digestHex(md.digest(arr.getUTF8String(i).getBytes)))
      i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints (MOSS-style): Rabin-Karp rolling hash over
    * k=8-char windows (base 31, mod 1e9+7), then the minimum of each
    * sliding window of w=4 hashes, distinct. Arithmetic matches the
    * oracle's direct-sum formula exactly (the rolling update is
    * algebraically identical mod M). */
  def winnow(text: UTF8String): ArrayData = {
    val t = text.toString
    val n = t.length
    val K = 8
    val W = 4
    val B = 31L
    val M = 1000000007L
    if (n < K + W - 1) return new GenericArrayData(Array.empty[Any])
    val nh = n - K + 1
    val hs = new Array[Long](nh)
    // B^(K-1) mod M
    var bk = 1L
    var p = 0
    while (p < K - 1) { bk = bk * B % M; p += 1 }
    var h = 0L
    var i = 0
    while (i < K) { h = (h * B + t.charAt(i)) % M; i += 1 }
    hs(0) = h
    i = 1
    while (i < nh) {
      h = ((h - t.charAt(i - 1) * bk % M + M) % M * B + t.charAt(i + K - 1)) % M
      hs(i) = h
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var q = 0
    while (q + W <= nh) {
      var m = hs(q)
      var j = 1
      while (j < W) { if (hs(q + j) < m) m = hs(q + j); j += 1 }
      seen.add(m)
      q += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
    new GenericArrayData(out)
  }

  /** Cross-lingual text normalization: NFD-decompose, lowercase PER CODE
    * POINT (context-free simple mapping — utf8proc's `lower` semantics;
    * a whole-string toLowerCase would apply Greek final-sigma context
    * rules the oracle does not), drop marks (categories Mn/Mc/Me — the
    * utf8proc STRIPMARK set behind DuckDB's strip_accents, dropped
    * without a word break so Indic vowel signs do not split words), then
    * collapse every run of non-letter/non-decimal-digit code points to a
    * single space and trim. Letters of EVERY script survive (CJK,
    * Cyrillic, Arabic …) — the kernel removes accent/case/punctuation
    * variation without being Latin-only. Keep-set = L* + Nd, exactly the
    * oracle regex class `[^\p{L}\p{Nd}]+`. */
  def normalizeText(text: UTF8String): UTF8String = {
    val d = java.text.Normalizer.normalize(
      text.toString, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var pendingSpace = false
    var i = 0
    while (i < d.length) {
      val cp0 = d.codePointAt(i)
      i += Character.charCount(cp0)
      val t = Character.getType(cp0)
      if (t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
          t == Character.ENCLOSING_MARK) {
        // mark (accent, vowel sign, enclosure): drop, no word break
      } else {
        val cp = Character.toLowerCase(cp0)
        if (Character.isLetter(cp) || Character.isDigit(cp)) {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          pendingSpace = false
          sb.appendCodePoint(cp)
        } else pendingSpace = true
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Distinct word k-gram shingles, EMPTY when the doc has fewer than k
    * words — the exact arithmetic of
    * `CASE WHEN size(ws) >= k THEN array_distinct(transform(
    *    sequence(1, size(ws)-k+1), i -> array_join(slice(ws, i, k), ' ')))
    *  ELSE array() END` with `ws = split(text, ' ', -1)`, as one pass.
    * (Distinct from [[shingles3]], whose oracle keeps one truncated
    * shingle for short docs.) */
  def shinglesK(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((n - k + 1) * 2)
    var i = 0
    while (i <= n - k) {
      val sb = new java.lang.StringBuilder(80)
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = UTF8String.fromString(it.next()); p += 1 }
    new GenericArrayData(out)
  }

  /** md5 hex of every word k-gram OCCURRENCE of `text`, in position
    * order: element i is the hash of the gram starting at 0-based word
    * position i. Value-identical to
    * `transform(sequence(1, n-k+1), i -> md5(array_join(slice(ws, i, k), ' ')))`
    * — the digest is fed the words' UTF-8 bytes with ' ' separators, so
    * the hashed bytes ARE the joined gram's bytes — but without
    * materializing one ~100-byte gram string (plus its UTF8String box)
    * per occurrence. The substring-dedup spine (q121 detect / q126
    * remove) hashes every occurrence of every document; at corpus scale
    * the gram strings exist only to be hashed, so never building them
    * is the whole win. */
  def gramHashes(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val wb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      wb(i) = words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val sp = ' '.toByte
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i <= n - k) {
      md.reset()
      var j = i
      while (j < i + k) {
        if (j > i) md.update(sp)
        md.update(wb(j))
        j += 1
      }
      out(i) = UTF8String.fromString(digestHex(md.digest()))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Count of elements of `arr` present in `set` (duplicates counted,
    * null elements never match) — the exact arithmetic of
    * `size(filter(arr, x -> array_contains(set, x)))` without a
    * per-element lambda invocation. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Hash-set of an array's non-null elements (cloned: UTF8Strings read
    * off unsafe rows are buffer views that the reader reuses). */
  def buildSet(arr: ArrayData): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: UTF8String, b: UTF8String): Int = {
    val x = a.getBytes
    val y = b.getBytes
    // equal length is the CONTRACT: silently truncating to the shorter
    // input made a length mismatch (comparing a signature against a
    // truncated or non-signature column) read as a spuriously SMALL
    // distance — false duplicates under a `hamming64(..) <= k` threshold
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"hamming64: inputs must be equal-length bit strings, got ${x.length} and ${y.length}")
    val n = x.length
    var d = 0
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }
}

case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    HashOps.simhash64(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashOps.simhash64($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HammingDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    HashOps.hamming(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.HashOps.hamming($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class Md5Array(child: Expression) extends UnaryExpression with Serializable {
  // null elements map to null hashes (transform(arr, x -> md5(x)) semantics)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    HashOps.md5Array(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashOps.md5Array($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Winnow(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    HashOps.winnow(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashOps.winnow($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class Shingles3(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any): Any =
    HashOps.shingles3(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashOps.shingles3($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `normalize_text(text)` — cross-lingual normalization (q108): the
  * codegen'd twin of the oracle's
  * `trim(regexp_replace(strip_accents(lower(text)), '[^\p{L}\p{Nd}]+', ' ', 'g'))`. */
case class NormalizeText(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(a: Any): Any =
    HashOps.normalizeText(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.functions.HashOps.normalizeText($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class MinHash16(child: Expression) extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // an empty / all-null shingle set has NO minimum — the result is NULL
  // even for a NON-null input array (the oracle's min-over-empty), so
  // nullability cannot follow the child and codegen must carry the
  // null-result branch explicitly
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any): Any =
    HashOps.minhash16(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"""
      |${ev.value} = graft.functions.HashOps.minhash16($x);
      |${ev.isNull} = ${ev.value} == null;
      |""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `shingles_k(text, k)` — distinct word k-grams, empty below k words;
  * `k` must be a foldable positive int. */
case class ShinglesK(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles_k"
  @transient private lazy val k: Int = {
    require(right.foldable, "shingles_k: k must be a literal")
    val kRaw = right.eval(null)
    require(kRaw != null, "shingles_k: k must be a non-null literal")
    val kv = kRaw.asInstanceOf[Number].intValue()
    require(kv >= 1, s"shingles_k: k must be >= 1, got $kv")
    kv
  }
  override def nullSafeEval(text: Any, kv: Any): Any =
    HashOps.shinglesK(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = k.toString
    defineCodeGen(ctx, ev, (t, _) => s"graft.functions.HashOps.shinglesK($t, $kRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `gram_hashes(text, k)` — md5 hex of every word k-gram OCCURRENCE in
  * position order (see [[HashOps.gramHashes]]); `posexplode` over it
  * yields (0-based position, gram hash) without ever materializing the
  * gram strings. */
case class GramHashes(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_hashes"
  @transient private lazy val k: Int = {
    require(right.foldable, "gram_hashes: k must be a literal")
    val kRaw = right.eval(null)
    require(kRaw != null, "gram_hashes: k must be a non-null literal")
    val kv = kRaw.asInstanceOf[Number].intValue()
    require(kv >= 1, s"gram_hashes: k must be >= 1, got $kv")
    kv
  }
  override def nullSafeEval(text: Any, kv: Any): Any =
    HashOps.gramHashes(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kRef = k.toString
    defineCodeGen(ctx, ev, (t, _) => s"graft.functions.HashOps.gramHashes($t, $kRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dsir_score(feats, lr)` — DSIR log-importance weight of a document's
  * feature array against a literal per-bucket log-ratio table (see
  * [[HashOps.dsirScore]]). The table must be foldable: it is evaluated
  * once per plan and shipped as a plain double[]. */
case class DsirScore(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dsir_score"
  @transient private lazy val lrArr: Array[Double] = {
    require(right.foldable, "dsir_score: the weight table must be a literal array")
    val ad = right.eval(null).asInstanceOf[ArrayData]
    require(ad != null && ad.numElements() > 0, "dsir_score: empty weight table")
    ad.toDoubleArray()
  }
  override def nullSafeEval(arr: Any, wv: Any): Any =
    HashOps.dsirScore(arr.asInstanceOf[ArrayData], lrArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirLr", lrArr, "double[]")
    defineCodeGen(ctx, ev, (a, _) => s"graft.functions.HashOps.dsirScore($a, $ref)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `count_in(arr, set)` — how many elements of `arr` are members of the
  * string array `set` (duplicates counted). A literal set is hashed once
  * per plan; a column set (e.g. a 1-row broadcast vocabulary) is hashed
  * per row — still a win whenever `set` is much smaller than `arr`. */
case class CountIn(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "count_in"
  @transient private lazy val set: java.util.HashSet[UTF8String] =
    HashOps.buildSet(right.eval(null).asInstanceOf[ArrayData])
  override def nullSafeEval(arr: Any, setv: Any): Any =
    if (right.foldable) HashOps.countIn(arr.asInstanceOf[ArrayData], set)
    else HashOps.countIn(arr.asInstanceOf[ArrayData],
      HashOps.buildSet(setv.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the non-null guard keeps a foldable NULL set on the generic branch,
    // where nullSafeCodeGen yields NULL per row (nullIntolerant) — the
    // literal branch would force the lazy at PLAN time and NPE
    if (right.foldable && right.eval(null) != null) {
      val ref = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
      defineCodeGen(ctx, ev, (a, _) => s"graft.functions.HashOps.countIn($a, $ref)")
    } else {
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.HashOps.countIn($a, graft.functions.HashOps.buildSet($b))")
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
