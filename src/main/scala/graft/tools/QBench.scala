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
    // same slow-stage trace as graft.Bench, at a micro-bench threshold
    // (default 200 ms, override GRAFT_STAGE_TRACE_MS): a single query's
    // cost decomposes into named stages without a full sweep
    val traceMs = sys.env.getOrElse("GRAFT_STAGE_TRACE_MS", "200").toLong
    val currentQuery = new java.util.concurrent.atomic.AtomicReference[String]("warmup")
    val stageOwner = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          ev: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(ev.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(currentQuery.get)
        ev.stageIds.foreach(id => stageOwner.put(id, desc))
      }
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = ev.stageInfo
        val wall = for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3
        if (wall.exists(_ * 1000 >= traceMs)) {
          val q = Option(stageOwner.get(si.stageId)).getOrElse(currentQuery.get)
          val name = si.name.linesIterator.nextOption().getOrElse("")
          System.err.println(f"[bench-stage] q=$q stage=${si.stageId} wall=${wall.get}%.2fs gcMs=${si.taskMetrics.jvmGCTime} $name")
        }
        stageOwner.remove(si.stageId)
      }
    })
    args.foreach { name =>
      currentQuery.set(name)
      spark.sparkContext.setJobDescription(name)
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
