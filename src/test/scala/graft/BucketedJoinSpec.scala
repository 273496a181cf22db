package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bucketed co-located join path — the zero-shuffle join a
  * 100 TB deployment uses for its recurring big-big joins: both sides
  * written `bucketBy(N, key)`, the join consumes the bucketing and
  * neither side is exchanged at query time.
  *
  * This is the storage-side complement to the plan pins in
  * [[graft.queries.PlanSpec]]: broadcast handles small-dim joins,
  * AQE handles skew, and bucketing handles the repeated fact-fact
  * join where a per-query shuffle of both sides would dominate the
  * job. The contrast test proves the assertion has teeth: the same
  * join over unbucketed copies of the same data plans two exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: java.nio.file.Path = _

  override def beforeAll(): Unit = {
    warehouse = Files.createTempDirectory("graft-bucket-wh")
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bucketed-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse.toString)
      // one task per bucket on the read side so bucketing == partitioning
      .config("spark.sql.sources.bucketing.enabled", "true")
      // force the big-big join regime bucketing exists for: at real scale
      // neither fact side fits a broadcast, so disable auto-broadcast
      // rather than inflate the fixture past the 10 MB threshold
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.range(0, 10000).toDF("o_orderkey")
      .withColumn("o_total", (col("o_orderkey") % 97).cast("double"))
    val lineitem = spark.range(0, 30000).toDF("l_id")
      .withColumn("l_orderkey", col("l_id") % 10000)
      .withColumn("l_qty", (col("l_id") % 13) + 1)
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
    orders.write.mode("overwrite").saveAsTable("orders_u")
    lineitem.write.mode("overwrite").saveAsTable("lineitem_u")
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      Seq("orders_b", "lineitem_b", "orders_u", "lineitem_u")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      spark.stop()
    }
  }

  private def joined(o: String, l: String) =
    spark.table(l).join(spark.table(o),
      col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_qty")).as("qty"), first(col("o_total")).as("total"))

  test("bucketed-bucketed equi join runs with ZERO exchanges") {
    val df = joined("orders_b", "lineitem_b")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"big-big join expected (not broadcast) so the bucketing is what saves the shuffle\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed sides must be consumed in place — no shuffle before the join\n$p")
    // the bucket layout ALSO covers the post-join aggregate on the same key
    assert("Exchange".r.findAllIn(p).length == 0,
      s"the groupBy(o_orderkey) must reuse the bucket partitioning too\n$p")
    // and it must still be the right answer
    assert(df.count() === 10000)
  }

  test("bucketed scan preserves the sortBy order: no Sort needed before SMJ") {
    // one file per bucket (written above with 4 tasks but bucketBy merges
    // per-bucket): with a single sorted file per bucket Spark elides the
    // per-partition sort; assert the join side sorts are absent OR
    // bucket-local (never preceded by an exchange)
    val df = spark.table("lineitem_b").join(spark.table("orders_b"),
      col("l_orderkey") === col("o_orderkey"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("contrast: the same join over unbucketed tables shuffles both sides") {
    val df = joined("orders_u", "lineitem_u")
    val p = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2,
      s"unbucketed big-big join must exchange both sides — if this fails the " +
        s"zero-exchange assertion above is vacuous\n$p")
    assert(df.count() === 10000)
  }

  test("bucketed and unbucketed joins agree on the data") {
    val b = joined("orders_b", "lineitem_b").orderBy("o_orderkey").collect()
    val u = joined("orders_u", "lineitem_u").orderBy("o_orderkey").collect()
    assert(b.toSeq == u.toSeq)
  }
}
