package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Edge behavior of the native kernels under session SQL (review r9):
  * null array elements must follow SQL semantics (skip / propagate),
  * and every expression must survive whole-stage codegen with multiple
  * instances in one scope (no fixed local names). */
class KernelEdgeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("kernel-edge-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // fail loudly if generated code does not compile instead of
      // silently falling back to interpreted eval
      .config("spark.sql.codegen.fallback", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("two dot_f32 calls in one projection compile (no fixed codegen locals)") {
    val r = spark.sql(
      """SELECT dot_f32(array(1.0F, 2.0F), array(3.0F, 4.0F)) +
        |       dot_f32(array(5.0F), array(6.0F)) AS s""".stripMargin).collect()
    assert(r(0).getDouble(0) == (3.0 + 8.0 + 30.0))
  }

  test("md5_array maps null elements to null (transform semantics)") {
    val r = spark.sql(
      "SELECT md5_array(array('a', cast(null as string), 'b')) AS h").collect()
    val h = r(0).getSeq[String](0)
    assert(h.length == 3 && h(0) != null && h(1) == null && h(2) != null)
    // value-identical to the documented equivalent
    val t = spark.sql(
      "SELECT transform(array('a', cast(null as string), 'b'), x -> md5(x)) AS h")
      .collect()(0).getSeq[String](0)
    assert(h == t)
  }

  test("simhash64 and minhash16 skip null elements instead of crashing") {
    val withNull = spark.sql(
      "SELECT simhash64(array(md5('x'), cast(null as string))) AS s, " +
        "minhash16(array(md5('x'), cast(null as string))) AS m").collect()(0)
    val without = spark.sql(
      "SELECT simhash64(array(md5('x'))) AS s, minhash16(array(md5('x'))) AS m")
      .collect()(0)
    assert(withNull.getString(0) == without.getString(0))
    assert(withNull.getSeq[String](1) == without.getSeq[String](1))
  }
}
