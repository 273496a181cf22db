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
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    def rawEdges = li.groupBy(col("l_orderkey"))
      .agg(collect_list(col("l_partkey")).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
          |  transform(filter(ps, y -> y != x),
          |            y -> named_struct('src', x, 'dst', y))))""".stripMargin))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    time("edges-noop")(rawEdges.write.format("noop").mode("overwrite").save())
    time("edges-persist-count") {
      val e = rawEdges.persist(); e.count(); e.unpersist(true); ()
    }
    locally {
      val e = rawEdges.persist(); e.count()
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist(); deg.count()
      val c = deg.agg(
        expr("cast(1000000000 div count(*) as long)").as("r_init"),
        expr("cast((15 * (1000000000 div count(*))) div 100 as long)").as("base"))
      val r0 = deg.crossJoin(broadcast(c))
        .select(col("src").as("node"), col("deg"), col("r_init").as("r"))
      def step(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        e.join(broadcast(r.select(col("node").as("src"), col("deg"), col("r"))), "src")
          .groupBy(col("dst"))
          .agg(sum(expr("r div deg")).as("s"))
          .join(broadcast(deg.select(col("src").as("dst"), col("deg"))), "dst")
          .crossJoin(broadcast(c))
          .select(col("dst").as("node"), col("deg"),
            (col("base") + expr("cast((85 * s) div 100 as long)")).as("r"))
      time("deg-only")(deg.write.format("noop").mode("overwrite").save())
      time("iters-on-warm-cache")(
        step(step(step(r0))).orderBy(col("r").desc).limit(100)
          .write.format("noop").mode("overwrite").save())
      e.unpersist(true); deg.unpersist(true)
    }
    time("full-q97")(
      graft.SparkEntry.queries("q97_copurchase_pagerank")(spark, sfDir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()

  }
}
