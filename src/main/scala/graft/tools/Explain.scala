package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.tools.Explain q57_source_overlap` prints
  * the formatted physical plan (post-AQE initial plan) for each named
  * query at SPARK_GRAFT_SF_DIR, plus a count of Exchange operators —
  * the shuffle budget the scale notes in each query header promise. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.tools.Explain <query-name>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      df.collect()
      // after the action, AdaptiveSparkPlan holds the final plan — the one
      // that shows whether identical shuffle stages were actually reused
      val txt = df.queryExecution.executedPlan.toString
      val exchanges = "Exchange (hash|range|Single)".r.findAllIn(txt).length
      val reused = "ReusedExchange|ReusedQueryStage".r.findAllIn(txt).length
      println(s"==== $name  (exchanges=$exchanges reused=$reused) ====")
      println(txt)
    }
    spark.stop()
  }
}
