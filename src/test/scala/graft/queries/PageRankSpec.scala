package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bit-exactness pin for q97's integer fixed-point PageRank: a
  * hand-computed 3-node path graph (orders {1:[1,2], 2:[2,3]}) must
  * reproduce the exact integer ranks after 3 iterations. Cross-engine
  * equality is covered by the DuckDB selfcheck at three SFs; this spec
  * pins the arithmetic itself (div truncation points, damping order)
  * so a refactor cannot drift it.
  *
  * Hand derivation (n=3, r_init=1e9 div 3=333333333,
  * base=(15*333333333) div 100=49999999; deg: 1→1, 2→2, 3→1):
  *   iter1: r(1)=r(3)=49999999+(85*(333333333 div 2)) div 100=191666665
  *          r(2)=49999999+(85*666666666) div 100=616666665
  *   iter2: r(1)=r(3)=49999999+(85*(616666665 div 2)) div 100=312083331
  *          r(2)=49999999+(85*(191666665*2)) div 100=375833329
  *   iter3: r(1)=r(3)=49999999+(85*(375833329 div 2)) div 100=209729163
  *          r(2)=49999999+(85*(312083331*2)) div 100=580541661
  */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pagerank-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = Files.createTempDirectory("pagerank-spec").toString
    val s = spark
    import s.implicits._
    val ts = java.sql.Timestamp.valueOf("1996-06-01 00:00:00")
    Seq(
      (1L, 1L, ts), (1L, 2L, ts), // order 1: parts 1, 2
      (2L, 2L, ts), (2L, 3L, ts)  // order 2: parts 2, 3
    ).toDF("l_orderkey", "l_partkey", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("3-node path graph: exact integer ranks after 3 damped iterations") {
    val rows = graft.SparkEntry.queries("q97_copurchase_pagerank")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ORDER BY rank_u DESC, part_id: hub first, then the tied leaves
    assert(rows.toSeq === Seq(
      (2L, 2L, 580541661L),
      (1L, 1L, 209729163L),
      (3L, 1L, 209729163L)))
  }

  test("ranks keep total mass bounded (damping sanity)") {
    val rows = graft.SparkEntry.queries("q97_copurchase_pagerank")(spark, dir)
      .collect().map(_.getLong(2))
    val total = rows.sum
    // sum of ranks stays within integer-truncation slack of 1e9
    assert(total <= 1000000000L && total > 990000000L, s"total=$total")
  }
}
