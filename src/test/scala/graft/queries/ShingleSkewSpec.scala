package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the df-cap skew-killer for the inverted-index shingle family
  * (VERDICT r7 "what's wrong" #3): a boilerplate shingle shared by every
  * document must be dropped from the posting lists BEFORE the pair join,
  * via a broadcast anti join (no extra shuffle on the postings), while
  * discriminative shingles below the cap survive untouched. */
class ShingleSkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("shingle-skew-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Synthetic boilerplate corpus: every doc carries the universal
    * "terms of service" shingle; genuine near-dup pairs share rare
    * shingles. */
  private def postings() = {
    val sp = spark; import sp.implicits._
    val rows =
      // 200 docs, all with the universal boilerplate shingle
      (0 until 200).map(i => (i.toLong, "web", "terms of service")) ++
        // docs 0/1 share two rare shingles (a real near-dup pair)
        Seq((0L, "web", "quick brown fox"), (1L, "web", "quick brown fox"),
          (0L, "web", "lazy sleeping dog"), (1L, "web", "lazy sleeping dog"))
    rows.toDF("doc_id", "source", "shingle")
  }

  test("hot postings are dropped exactly; rare postings survive") {
    val pruned = Dedup.dropHotPostings(postings(), Seq("source", "shingle"), cap = 50L)
    val left = pruned.collect()
    assert(left.length == 4, s"only the 4 rare postings must survive, got ${left.length}")
    assert(left.forall(_.getAs[String]("shingle") != "terms of service"))
    // pair-join fan-out through the pruned index: 1 pair, not 200*199/2
    val a = pruned.as("a"); val b = pruned.as("b")
    val pairs = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
    assert(pairs.length == 1 && pairs.head.getLong(0) == 0L && pairs.head.getLong(1) == 1L)
  }

  test("below-cap keys are untouched (cap above every df → identity)") {
    val in = postings()
    val out = Dedup.dropHotPostings(in, Seq("source", "shingle"), cap = 1000L)
    assert(out.count() == in.count())
  }

  test("the drop is a broadcast anti join — no posting-side shuffle added") {
    val plan = Dedup.dropHotPostings(postings(), Seq("source", "shingle"), cap = 50L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
