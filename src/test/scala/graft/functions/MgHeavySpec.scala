package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `mg_heavy` Misra-Gries aggregate: the coverage guarantee — every
  * item with true frequency > n/k appears among the candidates — must
  * hold under ANY row order and partitioning (the summary content is
  * order-dependent; the guarantee is not). Property-tested on random
  * zipf-skewed data across shuffled orders and partition counts,
  * including the map-side partial-merge path.
  */
class MgHeavySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("mg-heavy-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def zipfItems(seed: Int, nRows: Int, vocab: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    // zipf-ish: item i drawn with weight ~ 1/(i+1)
    val weights = (0 until vocab).map(i => 1.0 / (i + 1))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    (1 to nRows).map { _ =>
      val u = rnd.nextDouble()
      s"w${cum.indexWhere(u <= _)}"
    }
  }

  test("coverage: true heavy hitters always among candidates, any partitioning") {
    val sp = spark; import sp.implicits._
    for (seed <- 1 to 5; parts <- Seq(1, 3, 7)) {
      val k = 16
      val items = zipfItems(seed, 4000, 300)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val heavy = exact.filter(_._2 > n / k).keySet
      val cands = items.toDF("w").repartition(parts)
        .agg(expr(s"mg_heavy(w, $k)")).head().getSeq[String](0).toSet
      assert(cands.size <= k, s"seed=$seed parts=$parts: > $k candidates")
      assert(heavy.subsetOf(cands),
        s"seed=$seed parts=$parts: missed ${heavy.diff(cands)}")
    }
  }

  test("grouped aggregation keeps per-group candidate bounds") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(_ => (s"g${rnd.nextInt(4)}", s"w${rnd.nextInt(1 << rnd.nextInt(8))}"))
    val out = rows.toDF("g", "w").repartition(5)
      .groupBy("g").agg(expr("mg_heavy(w, 8)").as("c"))
      .collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getSeq[String](1).size <= 8))
    // per-group guarantee
    rows.groupBy(_._1).foreach { case (g, grows) =>
      val exact = grows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = grows.size.toLong
      val heavy = exact.filter(_._2 > n / 8).keySet
      val cands = out.find(_.getString(0) == g).get.getSeq[String](1).toSet
      assert(heavy.subsetOf(cands), s"group $g missed ${heavy.diff(cands)}")
    }
  }

  test("dsir_hist matches the exploded md5-bucket counts, any partitioning") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      val g = s"s${i % 3}"
      // include empty arrays and unicode so the md5 runs over real bytes
      val feats =
        if (i % 41 == 0) Seq.empty[String]
        else Seq.fill(rnd.nextInt(20) + 1)(s"tok${rnd.nextInt(500)}_é")
      (g, feats)
    }
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("g", "feats").repartition(parts)
      val got = df.groupBy("g").agg(expr("dsir_hist(feats, 256)").as("h"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
      // reference: the q109 oracle's bucket expression, exploded
      val want = df.select(col("g"), explode(col("feats")).as("f"))
        .select(col("g"),
          expr("cast(conv(substring(md5(f), 1, 4), 16, 10) as int) % 256").as("b"))
        .groupBy("g", "b").count().collect()
        .groupBy(_.getString(0))
        .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap).toMap
      assert(got.keySet == rows.map(_._1).toSet, s"parts=$parts: groups with empty arrays must survive")
      got.foreach { case (g, h) =>
        assert(h.size == 256)
        val w = want.getOrElse(g, Map.empty[Int, Long])
        (0 until 256).foreach { b =>
          assert(h(b) == w.getOrElse(b, 0L), s"parts=$parts g=$g b=$b")
        }
      }
    }
  }
}
