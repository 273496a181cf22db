package graft.tools

import graft.zarr.{ZarrStore, ZarrType, ZarrWriter}
import org.apache.spark.sql.SparkSession

/** The reference's own benchmark harness, reproduced locally
  * (`/root/reference/crates/arrow-zarr/benches/s3_bench.rs`):
  *
  *  - dataset: 8 arrays `var1..var8`, each 512×512 int64, chunks 8×8
  *    (4096 chunks/array), blosc-LZ4, fill 0 (`s3_bench.rs:70-109`)
  *  - query 1: theta self-join
  *    `t1.var1 % 12 = 0 AND t1.var1 < t2.var1 + 1 AND t1.var1 >= t2.var1 - 1`
  *    (`s3_bench.rs:222-234`)
  *  - query 2: `SELECT * UNION ALL SELECT *` double scan (`s3_bench.rs:236-247`)
  *
  * The reference publishes no numbers (BASELINE.md) — these locals are
  * recorded as OUR baseline. Store is built once under target/ and
  * reused.
  */
object ZarrBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = "target/zarr-bench-store"
    val store = ZarrStore(dir)
    if (!new java.io.File(s"$dir/var1/zarr.json").exists()) {
      System.err.println("[zarr-bench] building 8x 512x512 store (one-time)...")
      store.writeStoreRootMeta()
      val vals = (0 until 512 * 512).map(_.toLong)
      (1 to 8).foreach { v =>
        ZarrWriter.writeArray(store, s"var$v", ZarrType.Int64,
          Seq(512, 512), Seq(8, 8), vals, Some(Seq("x", "y")),
          ZarrWriter.CodecChain.bloscLz4, fillJson = "0")
      }
      System.err.println("[zarr-bench] store built")
    }

    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW zarr_table USING zarr OPTIONS (path '$dir')")

    def time(name: String, sql: String, warm: Boolean = true): Double = {
      if (warm) spark.sql(sql).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      spark.sql(sql).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[zarr-bench] $name: $sec%.2f s")
      sec
    }

    val q1 = time("theta-self-join",
      """SELECT t1.*, t2.* FROM zarr_table t1 JOIN zarr_table t2
        |ON t1.var1 % 12 = 0 AND t1.var1 < t2.var1 + 1 AND t1.var1 >= t2.var1 - 1""".stripMargin)
    val q2 = time("union-all-double-scan",
      "SELECT * FROM zarr_table UNION ALL SELECT * FROM zarr_table")

    println(s"""{"metric":"zarr_bench","unit":"sec","queries":{"theta_join":$q1,"union_all":$q2}}""")
    spark.stop()
  }
}
