package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Band-join rule: same results as the nested-loop plan, but as a
  * bucketized equi join. */
class BandJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("band-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(0, 2000).selectExpr("id AS v").createOrReplaceTempView("nums")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val bandSql =
    """SELECT t1.v AS a, t2.v AS b FROM nums t1 JOIN nums t2
      |ON t1.v % 12 = 0 AND t1.v < t2.v + 1 AND t1.v >= t2.v - 1""".stripMargin

  test("band join rewrites to an equi join (no nested loop)") {
    val plan = spark.sql(bandSql).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__band_bucket") || plan.contains("HashJoin") ||
      plan.contains("SortMergeJoin"), plan)
  }

  test("rewritten band join returns the exact nested-loop result") {
    val got = spark.sql(bandSql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // expected: for v % 12 == 0, matches are t2.v in {v, v+1} (clipped)
    val expected = (0L until 2000L by 12).flatMap { v =>
      Seq(v -> v) ++ (if (v + 1 < 2000) Seq(v -> (v + 1)) else Nil)
    }.sorted
    assert(got.toSeq == expected)
  }

  test("negative values bucket correctly (floor semantics)") {
    spark.range(0, 100).selectExpr("id - 50 AS v").createOrReplaceTempView("negs")
    val got = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM negs t1 JOIN negs t2
        |ON t1.v < t2.v + 2 AND t1.v >= t2.v - 2""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val vs = (-50L until 50L)
    val expected = (for { a <- vs; b <- vs; if a < b + 2 && a >= b - 2 } yield (a, b)).sorted
    assert(got.toSeq == expected)
  }

  test("non-band theta joins are left untouched") {
    val p = spark.sql(
      """SELECT count(*) FROM nums t1 JOIN nums t2 ON t1.v > t2.v * 2""".stripMargin)
    assert(p.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }
}
