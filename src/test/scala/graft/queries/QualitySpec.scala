package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 pipeline operators (q59-q63): bloom kernel semantics, plan
  * shapes, and bloom-vs-exact equivalence of the decontamination path.
  */
class QualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("quality-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("bloom_any: no false negatives; fp rate near the configured fpp") {
    val sp = spark
    import sp.implicits._
    val present = (0 until 2000).map(i => s"gram-$i")
    val bloom = present.toDF("g").stat.bloomFilter("g", 2000, 0.01)
    val bytes = graft.functions.BloomOps.toBytes(bloom)
    val probeHit = (0 until 2000).map(i => Seq(s"gram-$i"))
      .toDF("arr")
      .filter(call_function("bloom_any", lit(bytes), col("arr")))
      .count()
    assert(probeHit == 2000, "bloom filters must never produce false negatives")
    val absentHits = (0 until 2000).map(i => Seq(s"absent-$i"))
      .toDF("arr")
      .filter(call_function("bloom_any", lit(bytes), col("arr")))
      .count()
    assert(absentHits < 100, s"fp count $absentHits far above 1% of 2000")
  }

  test("bloom_any: any-element semantics over the array") {
    val sp = spark
    import sp.implicits._
    val bloom = Seq("x").toDF("g").stat.bloomFilter("g", 10, 0.01)
    val bytes = graft.functions.BloomOps.toBytes(bloom)
    val rows = Seq(
      (1, Seq("a", "b")),    // no member
      (2, Seq("a", "x")),    // member in tail position
      (3, Seq.empty[String]) // empty array -> false
    ).toDF("id", "arr")
      .filter(call_function("bloom_any", lit(bytes), col("arr")))
      .select("id").as[Int].collect().sorted
    assert(rows.sameElements(Array(2)))
  }

  test("kernels tolerate null array elements; shingles_k rejects k < 1") {
    val sp = spark
    import sp.implicits._
    graft.functions.VectorFunctions.register(sp)
    val bloom = Seq("x").toDF("g").stat.bloomFilter("g", 10, 0.01)
    val bytes = graft.functions.BloomOps.toBytes(bloom)
    val withNulls = Seq(1).toDF("id")
      .select(expr("array('a', CAST(NULL AS STRING), 'x')").as("arr"))
    assert(withNulls.filter(call_function("bloom_any", lit(bytes), col("arr"))).count() == 1)
    val nStop = Seq(1).toDF("id")
      .select(expr("count_in(array('a', CAST(NULL AS STRING), 'a'), array('a'))").as("c"))
      .as[Int].head()
    assert(nStop == 2)
    val err = intercept[Exception] {
      Seq("a b c").toDF("text").select(expr("shingles_k(text, 0)")).collect()
    }
    assert(err.getMessage != null)
  }

  test("q62: bloom prefilter + exact verify equals the bloom-free exact result") {
    val sp = spark
    import sp.implicits._
    // bloom-free reference: explode ALL train docs (no prefilter), exact join
    val base = graft.Tables.load(sp, dir, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ", -1).as("ws"))
      .withColumn("grams", expr(
        "CASE WHEN size(ws) >= 5 THEN array_distinct(transform(sequence(1, size(ws) - 4), " +
          "i -> array_join(slice(ws, i, 5), ' '))) ELSE array_remove(array(''), '') END"))
    val testGrams = base.filter(col("doc_id") % 13 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val exactBad = base.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(testGrams, Seq("gram"), "left_semi")
      .select("doc_id").distinct().as[Long].collect().toSet
    val viaQuery = SparkEntry.queries("q62_bloom_decontaminate")(sp, dir)
      .agg(sum("n_removed")).as[Long].head()
    assert(viaQuery == exactBad.size,
      s"bloom path removed $viaQuery docs, exact removes ${exactBad.size}")
  }

  test("q62 plan: train side is scan-filtered by bloom_any before any join") {
    val p = plan("q62_bloom_decontaminate")
    assert(p.contains("bloom_any") || p.contains("BloomAny"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q59/q61: per-doc operators stay shuffle-light (only the output sort)") {
    val p59 = plan("q59_passage_chunk")
    assert("Exchange".r.findAllIn(p59).length <= 1, p59)
    assert(p59.contains("Generate"), "passage chunking must be an explode")
    val p61 = plan("q61_gopher_filter")
    assert("Exchange".r.findAllIn(p61).length <= 1, p61)
  }

  test("q64/q65 plans: LM join is an equi join; centroid table broadcasts") {
    val p64 = plan("q64_bigram_lm")
    assert(!p64.contains("BroadcastNestedLoopJoin"), p64)
    assert(!p64.contains("CartesianProduct"), p64)
    val p65 = plan("q65_embed_outliers")
    assert(p65.contains("BroadcastHashJoin"), "centroid join must broadcast\n" + p65)
    assert(!p65.contains("BroadcastNestedLoopJoin"), p65)
  }

  test("q59: window/stride arithmetic covers every token exactly per formula") {
    val sp = spark
    import sp.implicits._
    val out = SparkEntry.queries("q59_passage_chunk")(sp, dir)
      .groupBy("doc_id")
      .agg(max("pid").as("max_pid"), sum("n_tokens").as("tok_sum"),
        max("n_tokens").as("max_tok"))
    val docs = graft.Tables.load(sp, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ", -1)).as("n"))
    val joined = out.join(docs, "doc_id")
      .select(col("doc_id"), col("max_pid"), col("tok_sum"), col("max_tok"), col("n"))
      .as[(Long, Int, Long, Int, Int)].collect()
    joined.foreach { case (id, maxPid, tokSum, maxTok, n) =>
      val expectedNp = if (n <= 32) 1 else (n - 32 + 23) / 24 + 1
      assert(maxPid == expectedNp - 1, s"doc $id: np mismatch")
      assert(maxTok <= 32, s"doc $id: window larger than 32")
      // windows overlap by 8 except a shorter last one: total tokens
      // emitted = n + 8 * (np - 1) - (uncovered tail of the last window)
      val lastStart = (expectedNp - 1) * 24
      val lastLen = math.min(32, n - lastStart)
      val fullSum = (expectedNp - 1) * 32 + lastLen
      assert(tokSum == fullSum, s"doc $id: token sum $tokSum != $fullSum")
    }
  }
}
