package graft.queries

import java.nio.file.Files

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing: the co-located-join lever for repeated 100 TB joins.
  *
  * A fact-fact join (lineitem ⋈ orders on the order key) normally
  * shuffles BOTH sides every time it runs. Writing both tables bucketed
  * (`bucketBy(n, key)`) pre-partitions them on disk once; every later
  * join on that key then reads bucket-aligned splits and the exchange
  * disappears entirely — the cost moves from every-query to write-once.
  * This spec pins that contract end-to-end through the real writer and
  * catalog: same join, same data, shuffle exchanges 2 → 0.
  */
class BucketJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-bucket-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bucket-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // force the sort-merge path so the exchange count is the signal
      // (tiny test tables would otherwise broadcast)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed fact-fact join runs with ZERO shuffle exchanges") {
    val df = spark.table("lineitem_b").as("l")
      .join(spark.table("orders_b").as("o"),
        org.apache.spark.sql.functions.col("l.l_orderkey") ===
          org.apache.spark.sql.functions.col("o.o_orderkey"))
      .select("l.l_orderkey", "o.o_orderpriority")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"),
      s"bucket-aligned scan must satisfy the join's distribution\n$p")
    // and it still computes the right thing
    val unbucketed = Tables.load(spark, dir, "lineitem").as("l")
      .join(Tables.load(spark, dir, "orders").as("o"),
        org.apache.spark.sql.functions.col("l.l_orderkey") ===
          org.apache.spark.sql.functions.col("o.o_orderkey"))
    assert(df.count() == unbucketed.count())
  }

  test("the same join unbucketed shuffles both sides (the baseline being saved)") {
    val l = Tables.load(spark, dir, "lineitem").as("l")
    val o = Tables.load(spark, dir, "orders").as("o")
    val p = l.join(o,
        org.apache.spark.sql.functions.col("l.l_orderkey") ===
          org.apache.spark.sql.functions.col("o.o_orderkey"))
      .select("l.l_orderkey", "o.o_orderpriority")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("bucketed scan answers a bucket-key point filter without reading every bucket") {
    // bucket pruning: an equality filter on the bucketing key narrows the
    // scan to 1 of 8 buckets (visible as "SelectedBucketsCount: 1 out of 8").
    // The DisableUnnecessaryBucketedScan planner rule only keeps bucketed
    // scans where a downstream operator wants the distribution, so pin it
    // off for the filter-only shape (the pruning benefit is the point).
    val auto = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(auto)
    spark.conf.set(auto, "false")
    try {
      val p = spark.table("orders_b")
        .where(org.apache.spark.sql.functions.col("o_orderkey") === 7L)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"), p)
    } finally spark.conf.set(auto, prev)
  }
}
