package graft.operators

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics (ADVICE round-2 checklist): exact-time inclusive
  * matches, deterministic tie-break, no-prior-right-row nulls, and — the
  * round-2 correctness fix — genuinely-NULL payload values carried
  * atomically with their row instead of falling back to an older row. */
class AsOfJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("asof-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(
      left: Seq[(String, Long)],
      right: Seq[(String, Long, String, Option[String])],
      tieBreak: Seq[String] = Nil): Map[(String, Long), (Option[String], Option[String])] = {
    val sp = spark
    import sp.implicits._
    val l = left.toDF("k", "t")
    val r = right.toDF("k", "t", "x", "y")
    AsOfJoin.leftOuter(l, r, "k", "t", "k", "t", Seq("x", "y"), tieBreak)
      .collect()
      .map { row =>
        (row.getString(0), row.getLong(1)) ->
          (Option(row.getString(2)), Option(row.getString(3)))
      }.toMap
  }

  test("exact-time match is inclusive (right row at t == left t wins)") {
    val out = run(
      left = Seq(("a", 5L)),
      right = Seq(("a", 5L, "x5", Some("y5")), ("a", 3L, "x3", Some("y3"))))
    assert(out(("a", 5L)) == (Some("x5"), Some("y5")))
  }

  test("left rows with no prior right row get null payload") {
    val out = run(
      left = Seq(("a", 1L), ("b", 7L)),
      right = Seq(("a", 3L, "x3", Some("y3"))))
    assert(out(("a", 1L)) == (None, None), "right row is later than left")
    assert(out(("b", 7L)) == (None, None), "key has no right rows at all")
  }

  test("carry-forward attaches the latest prior right row") {
    val out = run(
      left = Seq(("a", 4L), ("a", 10L)),
      right = Seq(("a", 3L, "x3", Some("y3")), ("a", 5L, "x5", Some("y5"))))
    assert(out(("a", 4L)) == (Some("x3"), Some("y3")))
    assert(out(("a", 10L)) == (Some("x5"), Some("y5")))
  }

  test("null payload value is preserved atomically (no per-column tearing)") {
    // right row at t=5 has y = NULL; a per-column last(ignoreNulls) carry
    // would skip it and resurrect y3 from t=3, pairing x5 with y3 — a row
    // that never existed. The struct carry must yield (x5, null).
    val out = run(
      left = Seq(("a", 6L)),
      right = Seq(("a", 3L, "x3", Some("y3")), ("a", 5L, "x5", None)))
    assert(out(("a", 6L)) == (Some("x5"), None))
  }

  test("equal-time right rows resolve by tie-break (greatest wins), deterministically") {
    val out = run(
      left = Seq(("a", 6L)),
      right = Seq(("a", 5L, "x1", Some("t1")), ("a", 5L, "x2", Some("t2"))),
      tieBreak = Seq("x"))
    assert(out(("a", 6L)) == (Some("x2"), Some("t2")))
  }

  test("tolerance nulls out matches staler than the bound") {
    val sp = spark
    import sp.implicits._
    val l = Seq(("a", 10L), ("a", 20L)).toDF("k", "t")
    val r = Seq(("a", 8L, "x8", Option("y8"))).toDF("k", "t", "x", "y")
    val out = AsOfJoin.leftOuter(l, r, "k", "t", "k", "t", Seq("x", "y"),
      tolerance = Some(5L))
      .collect().map(row => row.getLong(1) ->
        (Option(row.getString(2)), Option(row.getString(3)))).toMap
    // t=10: staleness 2 <= 5 → matched; t=20: staleness 12 > 5 → nulled
    assert(out(10L) == (Some("x8"), Some("y8")))
    assert(out(20L) == (None, None))
  }

  test("NULL keys and NULL times never match (review r9s2)") {
    val sp = spark
    import sp.implicits._
    // schema with nullable key/time on both sides
    val l = Seq(
      (Option("a"), Option(5L), 1),
      (Option.empty[String], Option(5L), 2), // NULL key
      (Option("a"), Option.empty[Long], 3)   // NULL time
    ).toDF("k", "t", "id")
    val r = Seq(
      (Option("a"), Option(3L), "x3"),
      (Option.empty[String], Option(3L), "xNK"), // NULL key: must match nothing
      (Option("a"), Option.empty[Long], "xNT")   // NULL time: must match nothing
    ).toDF("k", "t", "x")
    val out = AsOfJoin.leftOuter(l, r, "k", "t", "k", "t", Seq("x"))
      .collect().map(row => row.getInt(2) -> Option(row.getString(3))).toMap
    assert(out(1) == Some("x3"), "real key/time still matches")
    assert(out(2).isEmpty, "NULL-key left row must not pick up the NULL-key right row")
    assert(out(3).isEmpty, "NULL-time left row must not pick up any right row")
    assert(out.size == 3, "every left row survives (left outer)")
  }

  test("left columns pass through unchanged and row count equals left count") {
    val sp = spark
    import sp.implicits._
    val l = Seq(("a", 5L, 1.5), ("a", 9L, 2.5), ("b", 2L, 3.5)).toDF("k", "t", "payload_l")
    val r = Seq(("a", 4L, "x4")).toDF("k", "t", "x")
    val out = AsOfJoin.leftOuter(l, r, "k", "t", "k", "t", Seq("x"))
    assert(out.columns.toSeq == Seq("k", "t", "payload_l", "x"))
    assert(out.count() == 3)
    val rows = out.collect().map(r0 => (r0.getString(0), r0.getLong(1))).toSet
    assert(rows == Set(("a", 5L), ("a", 9L), ("b", 2L)))
  }
}
