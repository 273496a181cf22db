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
    def docsDf = graft.Tables.load(spark, sfDir, "documents")
    time("simhash-compute")(
      docsDf.select(col("doc_id"),
        expr("simhash64(md5_array(split(text, ' ')))").as("simhash"))
        .write.format("noop").mode("overwrite").save())
    time("bands-explode")(
      docsDf.select(col("doc_id"),
        expr("simhash64(md5_array(split(text, ' ')))").as("simhash"))
        .select(col("doc_id"), col("simhash"),
          explode(expr(
            "transform(sequence(0, 3), j -> named_struct(" +
              "'band', j, 'bh', substring(simhash, 16*j + 1, 16)))")).as("b"))
        .write.format("noop").mode("overwrite").save())
    time("full-q37")(
      graft.SparkEntry.queries("q37_simhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    time("full-q50")(
      graft.SparkEntry.queries("q50_dedup_clusters")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
