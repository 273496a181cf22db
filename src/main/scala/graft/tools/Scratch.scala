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

    def runAttrib(parts: String): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q85_stream_interval_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      dt
    }
    runAttrib("32") // warm
    println(f"SCRATCH attrib p32=${runAttrib("32")}%.2f p8=${runAttrib("8")}%.2f p4=${runAttrib("4")}%.2f p2=${runAttrib("2")}%.2f")
    spark.stop()
  }
}
