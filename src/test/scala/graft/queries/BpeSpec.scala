package graft.queries

import graft.functions.BpeOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `bpe_count` kernel: equivalence with a straight priority-BPE
  * reference (lowest-rank pair first, rescanning after every merge),
  * table validation, and the codegen'd DataFrame path. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bpe-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def table(merges: Seq[(String, String)]): BpeOps.BpeTable =
    BpeOps.buildTable(new GenericArrayData(
      merges.map { case (a, b) => UTF8String.fromString(s"$a $b") }.toArray[Any]))

  /** Slow reference: literal priority BPE — find the lowest-rank pair
    * present, merge all its non-overlapping occurrences left to right,
    * repeat from scratch until no mergeable pair remains. */
  private def refCount(text: String, merges: Seq[(String, String)]): Int = {
    val rank = merges.zipWithIndex.toMap
    var total = 0
    text.split("[^A-Za-z]+").filter(_.nonEmpty).foreach { w =>
      var toks = w.toLowerCase.map(_.toString).toVector
      var done = false
      while (!done) {
        val best = toks.init.zip(toks.tail).flatMap(p => rank.get(p).map(p -> _))
          .sortBy(_._2).headOption.map(_._1)
        best match {
          case None => done = true
          case Some((a, b)) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < toks.length) {
              if (i < toks.length - 1 && toks(i) == a && toks(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += toks(i); i += 1 }
            }
            toks = out.result()
        }
      }
      total += toks.length
    }
    total
  }

  private val t = table(BpeOps.defaultMerges)
  private def kernel(s: String): Int = BpeOps.bpeCount(UTF8String.fromString(s), t)

  test("kernel == priority BPE on adversarial and random inputs") {
    val cases = Seq("", "a", "the", "thethethe", "ananan and", "atatatatat",
      "testing the theory of the thing", "ss tt st st st", "THE The tHe",
      "x" * 80, "inginginging", "andandand", "ther there therein",
      "punct.uation, and; spaces\n\ttabs", "1234 5678", "naive resume")
    cases.foreach { s =>
      assert(kernel(s) == refCount(s, BpeOps.defaultMerges), s"input: '$s'")
    }
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val s = (1 to rnd.nextInt(60)).map { _ =>
        val r = rnd.nextInt(10)
        if (r < 7) ('a' + rnd.nextInt(6)).toChar // dense in {a..f} for collisions
        else if (r < 8) ('a' + rnd.nextInt(26)).toChar
        else if (r < 9) ' ' else '.'
      }.mkString
      assert(kernel(s) == refCount(s, BpeOps.defaultMerges), s"input: '$s'")
    }
    // a table rich in chainable merges, dense alphabet
    val chain = Seq("a" -> "b", "ab" -> "c", "b" -> "c", "c" -> "a",
      "abc" -> "ca", "b" -> "a")
    val ct = table(chain)
    (1 to 300).foreach { _ =>
      val s = (1 to rnd.nextInt(40)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(BpeOps.bpeCount(UTF8String.fromString(s), ct) == refCount(s, chain),
        s"chain input: '$s'")
    }
  }

  test("table validation rejects non-well-founded and a==b merges") {
    intercept[IllegalArgumentException](table(Seq("a" -> "a")))
    intercept[IllegalArgumentException](table(Seq("ab" -> "c"))) // 'ab' never produced
    intercept[IllegalArgumentException](table(Seq("a" -> "B"))) // not lowercase
    table(Seq("a" -> "b", "ab" -> "c")) // well-founded: fine
  }

  test("bpe_segment: token arrays are consistent with bpe_count on single words") {
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(20))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val seg = BpeOps.bpeSegment(UTF8String.fromString(w), t)
      assert(seg.numElements() == kernel(w), s"word: '$w'")
      // segmentation concatenates back to the word
      val joined = (0 until seg.numElements()).map(seg.getUTF8String(_).toString).mkString
      assert(joined == w, s"word: '$w' reassembled '$joined'")
    }
  }

  test("q98 trainer: hand-derived merges on a fixed tiny corpus") {
    // words {aba:3, cab:3, bcbc:2, dede:1}. Adjacent-pair counts:
    //  aba: (a,b),(b,a); cab: (c,a),(a,b); bcbc: (b,c),(c,b),(b,c);
    //  dede: (d,e),(e,d),(d,e)
    // r1: (a,b)=6 wins → aba=[ab,a], cab=[c,ab]
    // r2: (ab,a)=3,(c,ab)=3,(b,c)=4,(c,b)=2,(d,e)=2,(e,d)=1 → (b,c)=4
    //     → bcbc=[bc,bc]
    // r3: tie (ab,a)=3 vs (c,ab)=3 → pair ASC: 'ab'<'c' → (ab,a)
    //     ((bc,bc) is a self-pair — excluded) → aba=[aba]
    // r4: (c,ab)=3 → cab=[cab]
    // r5: (d,e)=2 → dede=[de,de]
    val sp = spark; import sp.implicits._
    graft.functions.VectorFunctions.register(spark)
    val dir = java.nio.file.Files.createTempDirectory("bpe-train").toString
    (Seq.fill(3)("aba cab") ++ Seq.fill(2)("bcbc") ++ Seq("dede"))
      .zipWithIndex.map { case (t0, i) => (i.toLong, t0) }
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = graft.SparkEntry.queries("q98_bpe_train")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq === Seq(
      (1, "a", "b", 6L), (2, "b", "c", 4L), (3, "ab", "a", 3L),
      (4, "c", "ab", 3L), (5, "d", "e", 2L)))
  }

  test("codegen'd DataFrame path matches the interpreted kernel") {
    val sp = spark; import sp.implicits._
    graft.functions.VectorFunctions.register(spark)
    val texts = Seq("the theory of testing", "thethethe and ananan", "")
    val arr = BpeOps.defaultMerges.map { case (a, b) => s"'$a $b'" }.mkString(",")
    val rows = texts.toDF("text")
      .selectExpr(s"bpe_count(text, array($arr)) AS n")
      .collect().map(_.getInt(0)).toSeq
    assert(rows == texts.map(kernel))
  }
}
