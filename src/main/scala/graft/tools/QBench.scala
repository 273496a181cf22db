package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Single-query micro-bench: `runMain graft.tools.QBench q50_dedup_clusters ...`
  * — same session config and noop-sink methodology as [[graft.Bench]]
  * (warm once at sf0.001, median of 3 at SPARK_GRAFT_SF_DIR), but only
  * for the named queries, so operator iteration gets a fast feedback
  * loop without the full 56-query sweep. */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.tools.QBench <query-name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      graft.CacheRegistry.releaseAll()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.CacheRegistry.releaseAll()
        dt
      }.sorted
      println(f"QBENCH $name median=${times(1)}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
