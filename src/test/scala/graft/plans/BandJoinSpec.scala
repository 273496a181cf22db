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

  test("negative bound (a >= b - (-5)) is not mis-bucketed") {
    // band [5, 10): |a-b| exceeds w = c1+c2 = 5, so the {-1,0,1} bucket
    // rewrite would drop rows — the rule must decline (ADVICE r1 #3)
    spark.range(0, 200).selectExpr("id AS v").createOrReplaceTempView("nbnd")
    val got = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM nbnd t1 JOIN nbnd t2
        |ON t1.v < t2.v + 10 AND t1.v >= t2.v - (-5)""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val vs = 0L until 200L
    val expected = (for { a <- vs; b <- vs; if a < b + 10 && a >= b + 5 } yield (a, b)).sorted
    assert(got.toSeq == expected)
  }

  test("long keys beyond 2^53 bucket exactly") {
    // double-based floor(x/w) collapses consecutive longs here; the rule
    // must use exact integer arithmetic (ADVICE r1 #3)
    val base = 9007199254740992L // 2^53
    spark.range(0, 40).selectExpr(s"id + ${base}L AS v").createOrReplaceTempView("bigv")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM bigv t1 JOIN bigv t2
        |ON t1.v < t2.v + 1 AND t1.v >= t2.v - 1""".stripMargin)
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val vs = (0L until 40L).map(_ + base)
    val expected = (for { a <- vs; b <- vs; if a < b + 1 && a >= b - 1 } yield (a, b)).sorted
    assert(got.toSeq == expected)
  }

  test("fractional-bound double keys stay exact (widened candidates)") {
    spark.range(0, 500).selectExpr("cast(id AS double) * 0.25 AS v")
      .createOrReplaceTempView("fracs")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM fracs t1 JOIN fracs t2
        |ON t1.v < t2.v + 0.75D AND t1.v >= t2.v - 0.5D""".stripMargin)
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val vs = (0 until 500).map(_ * 0.25)
    val expected = (for { a <- vs; b <- vs; if a < b + 0.75 && a >= b - 0.5 } yield (a, b)).sorted
    assert(got.toSeq == expected)
  }

  test("a band beside an existing equi conjunct does NOT rewrite (no pessimization)") {
    spark.range(0, 300).selectExpr("id AS v", "id % 7 AS k").createOrReplaceTempView("ek")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM ek t1 JOIN ek t2
        |ON t1.k = t2.k AND t1.v < t2.v + 2 AND t1.v >= t2.v - 2""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("__band_bucket"),
      s"equi conjunct already gives a hash join; band rewrite must decline\n$plan")
    assert(!plan.contains("NestedLoop"), plan)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val vs = 0L until 300L
    val expected = (for {
      a <- vs; b <- vs
      if a % 7 == b % 7 && a < b + 2 && a >= b - 2
    } yield (a, b)).sorted
    assert(got.toSeq == expected)
  }

  test("double keys where ulp(key) rivals the band width stay exact (review r9s2)") {
    // keys ~1e15: ulp = 0.125, band width 0.1 — the double-evaluated
    // predicate admits pairs whose true bucket difference exceeds 1;
    // the ±4 window must keep every match
    val sp = spark; import sp.implicits._
    val base = 1e15
    val keys = (0 until 60).map(i => base + i * 0.125)
    keys.map(Tuple1(_)).toDF("v").createOrReplaceTempView("ulpv")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM ulpv t1 JOIN ulpv t2
        |ON t1.v < t2.v + 0.1D AND t1.v >= t2.v - 0.1D""".stripMargin)
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    // expected under the SAME IEEE double predicate evaluation
    val expected = (for {
      a <- keys; b <- keys
      if a < b + 0.1 && a >= b - 0.1
    } yield (a, b)).sorted
    assert(got.toSeq == expected.toSeq,
      s"got ${got.length} rows, expected ${expected.length}")
  }

  test("astronomically large double keys fall into the sentinel bucket, no lost matches") {
    // keys ~1e18: ulp = 128 >> width 0.1 — floor(x/w) has NO integer
    // resolution here; the sentinel collapse must keep the join exact
    val sp = spark; import sp.implicits._
    val base = 1e18
    val keys = (0 until 24).map(i => base + i * 128.0) ++ Seq(1.0, 2.0, 100.5)
    keys.map(Tuple1(_)).toDF("v").createOrReplaceTempView("hugev")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM hugev t1 JOIN hugev t2
        |ON t1.v < t2.v + 0.1D AND t1.v >= t2.v - 0.1D""".stripMargin)
    assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val expected = (for {
      a <- keys; b <- keys
      if a < b + 0.1 && a >= b - 0.1
    } yield (a, b)).sorted
    assert(got.toSeq == expected.toSeq,
      s"got ${got.length} rows, expected ${expected.length}")
    // and no duplicates: every (a,b) pair at most once
    assert(got.length == got.distinct.length, "sentinel path duplicated join rows")
  }

  test("keys straddling the sentinel threshold still meet") {
    // T = 0.5 * 2^49 for width 0.5; place keys just below and above
    val sp = spark; import sp.implicits._
    val t = 0.5 * math.pow(2.0, 49)
    val keys = Seq(t - 1.0, t - 0.25, t, t + 0.25, t + 1.0, 10.0, 10.25)
    keys.map(Tuple1(_)).toDF("v").createOrReplaceTempView("straddle")
    val df = spark.sql(
      """SELECT t1.v AS a, t2.v AS b FROM straddle t1 JOIN straddle t2
        |ON t1.v < t2.v + 0.25D AND t1.v >= t2.v - 0.25D""".stripMargin)
    val got = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).sorted
    val expected = (for {
      a <- keys; b <- keys
      if a < b + 0.25 && a >= b - 0.25
    } yield (a, b)).sorted
    assert(got.toSeq == expected.toSeq)
    assert(got.length == got.distinct.length)
  }

  test("a long bound literal past 2^53 declines the rewrite instead of shrinking the band") {
    spark.range(0, 50).selectExpr("id AS v").createOrReplaceTempView("bigbound")
    val big = 9007199254740994L // 2^53 + 2: doubleValue() would round DOWN
    val df = spark.sql(
      s"""SELECT count(*) AS n FROM bigbound t1 JOIN bigbound t2
         |ON t1.v < t2.v + ${big}L AND t1.v >= t2.v - 0L""".stripMargin)
    // every pair with t1.v >= t2.v matches; the rule must not fire with
    // a silently-narrowed width (results would still be right here only
    // because 50 < width — the point is the DECLINE)
    assert(!df.queryExecution.executedPlan.toString.contains("__band_bucket"))
    assert(df.collect().head.getLong(0) == (0 until 50).map(_.toLong + 1).sum)
  }

  test("non-band theta joins are left untouched") {
    val p = spark.sql(
      """SELECT count(*) FROM nums t1 JOIN nums t2 ON t1.v > t2.v * 2""".stripMargin)
    assert(p.queryExecution.executedPlan.toString.contains("NestedLoop"))
  }
}
