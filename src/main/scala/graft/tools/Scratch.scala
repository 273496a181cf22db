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

    def runQ(n: Int): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q85_stream_interval_join")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    runQ(0) // warm
    println(f"SCRATCH hdfs-store p8 median=${Seq(runQ(1), runQ(2), runQ(3)).sorted.apply(1)}%.2f")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    runQ(0) // warm rocksdb
    println(f"SCRATCH rocksdb p8 median=${Seq(runQ(1), runQ(2), runQ(3)).sorted.apply(1)}%.2f")
    spark.stop()
  }
}
