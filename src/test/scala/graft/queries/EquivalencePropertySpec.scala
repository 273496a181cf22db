package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the two plan-rewrite exactness arguments that
  * queries rely on but that no oracle can distinguish from luck on one
  * dataset:
  *
  *  - q94's salted two-level cap is EXACT because every global
  *    per-source top-N row necessarily ranks within its salt bucket's
  *    top-N (the buckets partition the source's rows, and the global
  *    order restricted to a bucket preserves rank order);
  *  - q97's one-scan in-row pair expansion produces exactly the
  *    multiset of the two-sided equi self-join it replaces.
  *
  * Both are checked on randomized skewed data against the naive
  * formulation executed in the same session.
  */
class EquivalencePropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("equivalence-prop-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q94: salted two-level cap equals the naive per-source window on skewed data") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(1234)
    // heavy skew: one source holds ~70% of rows
    val rows = (1 to 5000).map { i =>
      val src = rnd.nextInt(10) match {
        case n if n < 7 => "hot"
        case n          => s"s$n"
      }
      (i.toLong, src)
    }
    val dir = Files.createTempDirectory("cap-prop").toString
    rows.toDF("doc_id", "source").write.parquet(s"$dir/documents.parquet")

    val twoLevel = graft.SparkEntry.queries("q94_domain_cap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val naive = rows.toDF("doc_id", "source")
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))))
      .where(col("rn") <= 15)
      .select(col("doc_id"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    assert(twoLevel === naive)
    assert(naive.groupBy(_._2).forall(_._2.size <= 15))
  }

  test("q97: in-row pair expansion equals the equi self-join pair multiset") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(99)
    // orders with 1-8 lines, duplicate parts within an order included
    val li = (1 to 500).flatMap { ok =>
      (1 to (1 + rnd.nextInt(8))).map(_ => (ok.toLong, (1 + rnd.nextInt(40)).toLong))
    }
    val df = li.toDF("l_orderkey", "l_partkey")

    val expanded = df.groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
          |  transform(filter(ps, y -> y != x),
          |            y -> named_struct('src', x, 'dst', y))))""".stripMargin)).as("e"))
      .select(col("e.src"), col("e.dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    val a = df.as("a"); val b = df.as("b")
    val joined = a.join(b,
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey"), col("b.l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted

    assert(expanded.length === joined.length)
    assert(expanded.toSeq === joined.toSeq)
  }
}
