package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge behavior of the native kernels under session SQL (review r9):
  * null array elements must follow SQL semantics (skip / propagate),
  * and every expression must survive whole-stage codegen with multiple
  * instances in one scope (no fixed local names). */
class KernelEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("kernel-edge-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // fail loudly if generated code does not compile instead of
      // silently falling back to interpreted eval
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("two dot_f32 calls in one projection compile (no fixed codegen locals)") {
    val r = spark.sql(
      """SELECT dot_f32(array(1.0F, 2.0F), array(3.0F, 4.0F)) +
        |       dot_f32(array(5.0F), array(6.0F)) AS s""".stripMargin).collect()
    assert(r(0).getDouble(0) == (3.0 + 8.0 + 30.0))
  }

  test("gram_hashes == md5 of the joined slice, per occurrence, incl. edge shapes") {
    // the kernel hashes word bytes + ' ' separators directly; it must be
    // value-identical to building each gram string and md5-ing it
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",  // n > k
      "a b c",                                        // n == k
      "a b",                                          // n < k -> empty
      "",                                             // one empty word
      "x  y   z w",                                   // consecutive spaces -> empty words
      "αβ ñ 漢字 § e")                                 // multi-byte UTF-8
    cases.foreach { text =>
      val r = spark.sql(
        s"""SELECT gram_hashes('$text', 3) AS fast,
           |  CASE WHEN size(split('$text', ' ', -1)) >= 3 THEN
           |    transform(sequence(1, size(split('$text', ' ', -1)) - 2),
           |      i -> md5(array_join(slice(split('$text', ' ', -1), i, 3), ' ')))
           |  ELSE array() END AS slow""".stripMargin).collect()(0)
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"text='$text'")
    }
    // null text propagates
    assert(spark.sql("SELECT gram_hashes(cast(null as string), 3)").collect()(0).isNullAt(0))
    // two instances in one projection compile under codegen
    val two = spark.sql(
      "SELECT size(gram_hashes('a b c d', 2)) + size(gram_hashes('p q', 2)) AS s")
      .collect()(0).getInt(0)
    assert(two == 3 + 1)
  }

  test("md5_array maps null elements to null (transform semantics)") {
    val r = spark.sql(
      "SELECT md5_array(array('a', cast(null as string), 'b')) AS h").collect()
    val h = r(0).getSeq[String](0)
    assert(h.length == 3 && h(0) != null && h(1) == null && h(2) != null)
    // value-identical to the documented equivalent
    val t = spark.sql(
      "SELECT transform(array('a', cast(null as string), 'b'), x -> md5(x)) AS h")
      .collect()(0).getSeq[String](0)
    assert(h == t)
  }

  test("simhash64 and minhash16 skip null elements instead of crashing") {
    val withNull = spark.sql(
      "SELECT simhash64(array(md5('x'), cast(null as string))) AS s, " +
        "minhash16(array(md5('x'), cast(null as string))) AS m").collect()(0)
    val without = spark.sql(
      "SELECT simhash64(array(md5('x'))) AS s, minhash16(array(md5('x'))) AS m")
      .collect()(0)
    assert(withNull.getString(0) == without.getString(0))
    assert(withNull.getSeq[String](1) == without.getSeq[String](1))
  }

  test("dsir_score == the interpreted sorted-fold, bit-exactly, on random inputs") {
    val rnd = new scala.util.Random(4242)
    val lrs = Array.fill(256)(rnd.nextGaussian() * 0.3)
    val lrSql = s"array(${lrs.map(v => s"${v}D").mkString(",")})"
    val bucket = (e: String) => s"cast(conv(substring(md5($e), 1, 4), 16, 10) as int) % 256"
    val foldSql = s"""aggregate(array_sort(f),
      |  struct(CAST(NULL AS string) AS prev, 0L AS run, CAST(0 AS double) AS acc),
      |  (st, x) -> CASE WHEN st.prev IS NULL OR x = st.prev
      |    THEN struct(x AS prev, st.run + 1L AS run, st.acc AS acc)
      |    ELSE struct(x AS prev, 1L AS run,
      |      st.acc + st.run * element_at($lrSql, (${bucket("st.prev")}) + 1) AS acc) END,
      |  st -> CASE WHEN st.prev IS NULL THEN CAST(0 AS double)
      |    ELSE st.acc + st.run * element_at($lrSql, (${bucket("st.prev")}) + 1) END)"""
      .stripMargin
    // random multilingual feature arrays, with duplicates, incl. empty
    val words = Seq("a", "b", "ab", "the", "データ", "мир", "café", "x_y", "emoji😀", "")
    val arrays = (0 until 40).map { _ =>
      val n = rnd.nextInt(30)
      (0 until n).map(_ => words(rnd.nextInt(words.length)) + rnd.nextInt(4))
    } :+ Seq.empty[String]
    val sp = spark; import sp.implicits._
    val df = arrays.map(a => Tuple1(a)).toDF("f")
    val rows = df.selectExpr(s"dsir_score(f, $lrSql) AS k", s"$foldSql AS ref").collect()
    rows.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0,
        s"kernel ${r.getDouble(0)} != fold ${r.getDouble(1)}")
    }
  }

  test("dsir_score skips null elements and handles empty tables loudly") {
    val r = spark.sql(
      "SELECT dsir_score(array('a', cast(null as string), 'a'), array(0.5D, -0.25D)) AS s," +
        " dsir_score(array('a', 'a'), array(0.5D, -0.25D)) AS t").collect()(0)
    assert(r.getDouble(0) == r.getDouble(1), "null elements contribute nothing")
    val e = intercept[Exception](
      spark.sql("SELECT dsir_score(array('a'), array())").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("weight table")), msgs(e).mkString(" | "))
  }

  private def msgsOf(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ msgsOf(t.getCause)

  test("vector kernels refuse wrong element types at analysis, never read garbage") {
    // array(1.0, 2.0) is array<double>: getFloat over an 8-byte stride
    // would return garbage similarities with no error
    val e = intercept[Exception](
      spark.sql("SELECT dot_f32(array(1.0D, 2.0D), array(3.0D, 4.0D))").collect())
    assert(msgsOf(e).exists(_.contains("dot_f32")), msgsOf(e).mkString(" | "))
    val e2 = intercept[Exception](
      spark.sql("SELECT norm_f32(array(1.0D))").collect())
    assert(msgsOf(e2).exists(_.contains("norm_f32")), msgsOf(e2).mkString(" | "))
    val e3 = intercept[Exception](
      spark.sql("SELECT sqdist64(array(1, 2), array(3, 4))").collect())
    assert(msgsOf(e3).exists(_.contains("sq_dist")), msgsOf(e3).mkString(" | "))
    // the legitimate widths still work, mixed
    val ok = spark.sql(
      "SELECT sqdist64(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS d").collect()(0)
    assert(ok.getDouble(0) == 8.0)
  }

  test("a foldable NULL table/set argument yields NULL rows, not a codegen NPE") {
    val r = spark.sql(
      """SELECT count_in(array('a'), CAST(NULL AS ARRAY<STRING>)) AS c,
        |       bpe_count('ab', CAST(NULL AS ARRAY<STRING>)) AS b,
        |       redact_typed('x', CAST(NULL AS ARRAY<STRING>)) AS t""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2), r.toString)
  }

  test("malformed signature inputs refuse loudly instead of raw index errors") {
    val e = intercept[Exception](
      spark.sql("SELECT simhash64(array('abc'))").collect())
    assert(msgsOf(e).exists(_.contains("md5 hex")), msgsOf(e).mkString(" | "))
    val e2 = intercept[Exception](
      spark.sql("SELECT minhash16(array('x'))").collect())
    assert(msgsOf(e2).exists(_.contains("md5 hex")), msgsOf(e2).mkString(" | "))
    val e3 = intercept[Exception](
      spark.sql("SELECT hamming64('0101', '01')").collect())
    assert(msgsOf(e3).exists(_.contains("equal-length")), msgsOf(e3).mkString(" | "))
  }

  test("minhash16 over an EMPTY shingle set is NULL (the oracle's min-over-empty)") {
    // sixteen empty-string slots would make every empty document
    // minhash-identical — unrelated rows become band-join duplicates
    val r = spark.sql(
      """SELECT minhash16(CAST(array() AS ARRAY<STRING>)) AS m,
        |       minhash16(array(CAST(NULL AS STRING))) AS n,
        |       minhash16(array(md5('x'))) AS ok""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && !r.isNullAt(2), r.toString)
  }
}
