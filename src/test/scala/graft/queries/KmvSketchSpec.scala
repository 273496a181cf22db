package graft.queries

import graft.functions.VectorFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `kmv_sketch` aggregate: set semantics (duplicates ignored),
  * partition-independence (the merge path must commute with any input
  * split), the exact-small branch, bounded state, and the map-side
  * partial-aggregation plan shape that justifies it at scale. */
class KmvSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("kmv-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    VectorFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (n, kth) from kmv_sketch(hash, k) over the given longs. */
  private def sketch(values: Seq[Long], k: Int, partitions: Int): (Long, Option[Long]) = {
    val sp = spark; import sp.implicits._
    val row = values.toDF("h").repartition(partitions)
      .agg(expr(s"kmv_sketch(h, $k)").as("sk"))
      .select(col("sk.n"), col("sk.kth")).head()
    (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1)))
  }

  /** Reference: k-th smallest of the DISTINCT values. */
  private def ref(values: Seq[Long], k: Int): (Long, Option[Long]) = {
    val d = values.distinct.sorted
    (math.min(d.size, k).toLong, if (d.size >= k) Some(d(k - 1)) else None)
  }

  test("matches the k-th smallest distinct value, duplicates ignored") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(5000)(rnd.nextLong(1L << 52))
    val withDups = vals ++ vals.take(2000) ++ vals.take(500)
    assert(sketch(withDups, 32, 4) === ref(withDups, 32))
  }

  test("merge commutes with the input split: any partitioning, same sketch") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(2000)(rnd.nextLong(1L << 52))
    val expected = ref(vals, 16)
    for (p <- Seq(1, 3, 7, 32)) assert(sketch(vals, 16, p) === expected)
  }

  test("fewer than k distinct values: exact count, null kth") {
    assert(sketch(Seq(5L, 9L, 5L, 2L, 9L), 32, 3) === ((3L, None)))
    assert(sketch(Seq.empty[Long] :+ 4L, 2, 1) === ((1L, None)))
  }

  test("grouped md5-path estimate is bit-exact vs an independent reference") {
    val sp = spark; import sp.implicits._
    // 3 groups of known cardinality, hashed exactly like q89. Expected
    // values precomputed with Python hashlib over the same md5/13-hex/
    // 2^52 formulation: sorted(int(md5(str(u)).hexdigest()[:13], 16)
    // for u in range(n))[31] → 31 * 2^52 / h_32. (The g0 draw sits ~2.5σ
    // below its 400 truth — fixed sets are not a statistics test; the
    // point is the kernel reproduces the reference bit-for-bit.)
    val expected = Map(
      "g0" -> 677.955007125486, "g1" -> 1107.1405063939262, "g2" -> 1520.6917671142537)
    val rows = for (g <- 0 until 3; u <- 0 until (g + 1) * 400) yield (s"g$g", u.toLong)
    val est = rows.toDF("grp", "user_id").repartition(8)
      .groupBy("grp")
      .agg(expr(
        "kmv_sketch(cast(conv(substring(md5(cast(user_id as string)), 1, 13), 16, 10) as bigint), 32)")
        .as("sk"))
      .select(col("grp"), (lit(31.0) * lit(4503599627370496.0) / col("sk.kth")).as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est === expected)
  }

  test("survives the sort-based fallback: 2000 groups >> the 128-group hash threshold") {
    // ObjectHashAggregate switches to sort-based aggregation past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold (128),
    // which round-trips every buffer through serialize/deserialize —
    // this pins that path with exactly-known per-group answers
    val sp = spark; import sp.implicits._
    val rows = for (g <- 0 until 2000; v <- 0 until (g % 5) + 1) yield (g, v.toLong)
    val got = rows.toDF("g", "h").repartition(16)
      .groupBy("g").agg(expr("kmv_sketch(h, 8)").as("sk"))
      .select(col("g"), col("sk.n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size == 2000)
    for (g <- 0 until 2000) assert(got(g) == (g % 5) + 1, s"group $g")
  }

  test("plan does map-side partial aggregation (state ≤ k longs crosses the shuffle)") {
    val sp = spark; import sp.implicits._
    val df = Seq.fill(100)(1L).toDF("h").repartition(4)
      .agg(expr("kmv_sketch(h, 8)"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_kmv_sketch"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"), plan)
  }
}
