package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for operator iteration — not registered
  * anywhere; contents change per investigation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)

    def docs = graft.Tables.load(spark, sfDir, "documents")
    def grams = docs.select(col("doc_id"), col("source"),
      explode(expr("shingles_k(text, 4)")).as("gram"))

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SCRATCH $label median=${ts(1)}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    @volatile var descs = List[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        descs ::= Option(js.properties.getProperty("spark.job.description")).getOrElse(
          js.stageInfos.headOption.map(_.name).getOrElse("?"))
    })
    graft.SparkEntry.queries("q69_rare_word_ratio")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    Thread.sleep(800)
    println("SCRATCH jobs-at-construction: " + descs.size + " :: " + descs.mkString(" | "))
    spark.stop()
  }
}
