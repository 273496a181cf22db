package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries are forced
  * through the `noop` DSv2 sink — unlike `count()`, this materializes
  * every output column (no projection pruning), so timings reflect the
  * full operator cost. */
object Bench {
  def main(args: Array[String]): Unit = {
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
    // untimed warmup of EVERY query at the smallest SF: pays one-time
    // codegen/classload costs (Dataset encoders, janino, noop sink)
    // outside the timings, so round-over-round deltas mean something
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    CacheRegistry.releaseAll()
    // median of 3 timed runs per query: single-shot local[32] timings are
    // noisy by construction (JIT, GC, page cache)
    val runs = 3
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop any table the query persisted so runs don't cross-feed
        spark.catalog.clearCache()
        CacheRegistry.releaseAll()
        dt
      }.sorted
      name -> times(runs / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"stat":"median","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
