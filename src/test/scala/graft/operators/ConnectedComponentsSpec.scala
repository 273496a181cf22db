package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("cc-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark; import sp.implicits._
    ConnectedComponents.label(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a chain collapses to its minimum node (diameter > 1 needs iteration)") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)))
    assert(got == (1L to 7L).map(_ -> 1L).toMap)
  }

  test("disjoint components keep separate labels") {
    val got = cc(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L)))
    assert(got(10L) == 10L && got(11L) == 10L && got(12L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
    assert(got(30L) == 30L && got(31L) == 30L && got(32L) == 30L)
  }

  test("edge direction and duplication do not change the fixpoint") {
    val e1 = Seq((5L, 1L), (1L, 5L), (5L, 1L), (3L, 5L))
    val got = cc(e1)
    assert(got == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("partition count does not change the fixpoint (contraction stitches partitions)") {
    val sp = spark; import sp.implicits._
    // a 40-node chain — worst case for label propagation, and with 8
    // partitions each union-find sees only a fragment
    val edges = (1L until 40L).map(i => (i, i + 1))
    for (parts <- Seq(1, 3, 8)) {
      val got = ConnectedComponents.label(edges.toDF("a", "b").repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (1L to 40L).map(_ -> 1L).toMap, s"parts=$parts")
    }
  }

  test("the distributed loop path (driverSolveEdgeLimit = 0) matches the driver solve") {
    val sp = spark; import sp.implicits._
    // a chain across partitions leaves residual contracted edges, so the
    // forced loop genuinely iterates; fixpoints must agree exactly
    val edges = (1L until 40L).map(i => (i, i + 1))
    val viaLoop = ConnectedComponents
      .label(edges.toDF("a", "b").repartition(8), driverSolveEdgeLimit = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLoop == (1L to 40L).map(_ -> 1L).toMap)
  }

  test("random graphs match a reference union-find (seeded)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val want = parent.keys.map(k => k -> find(k)).toMap
      val got = ConnectedComponents.label(edges.toDF("a", "b").repartition(5))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial=$trial")
    }
  }
}
