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


    graft.functions.VectorFunctions.register(spark)
    import spark.implicits._
    val zarrDir = "target/scan-bench-zarr"
    val z = spark.read.format("zarr").load(zarrDir)
    println("=== plan sum(c2):")
    val q = z.agg(sum($"c2"))
    println(q.queryExecution.executedPlan.toString.take(2500))
    time("sum-c2")(q.collect())
    time("sum-4col")(z.agg(sum($"c0"), sum($"c1"), sum($"c2"), sum($"c3")).collect())
    time("select-c2-noop")(z.select($"c2").write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
