package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc probe main (contents vary round to round; not part of the
  * library surface). Currently: decompose ZarrBench's theta-join time
  * into scan vs join. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "target/zarr-bench-store"
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW zarr_table USING zarr OPTIONS (path '$dir')")
    def t(nm: String, sql: String): Unit = {
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[probe] $nm: ${runs(1)}%.2f s (min ${runs(0)}%.2f)")
    }
    t("full-scan-1col", "SELECT var1 FROM zarr_table")
    t("full-scan-all", "SELECT * FROM zarr_table")
    t("filtered-t1-side", "SELECT * FROM zarr_table WHERE var1 % 12 = 0")
    t("theta", """SELECT t1.*, t2.* FROM zarr_table t1 JOIN zarr_table t2
      ON t1.var1 % 12 = 0 AND t1.var1 < t2.var1 + 1 AND t1.var1 >= t2.var1 - 1""")
    spark.stop()
  }
}
