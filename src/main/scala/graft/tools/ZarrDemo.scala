package graft.tools

import java.nio.file.Files

import graft.zarr.{ZarrStore, ZarrWriter}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Smoke-drive of the zarr DSv2 connector through its public surface:
  * writes the reference's canonical lat/lon/data fixture, reads it back
  * with `spark.read.format("zarr")`, runs the reference's flagship
  * filtered query (`table_provider.rs:417-423`) and the CTE join, and
  * prints the physical plan so pushdowns are visible.
  */
object ZarrDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("zarr-demo").toString + "/latlon"
    ZarrWriter.writeLatLonStore(ZarrStore(dir))
    println(s"=== store: $dir")

    val df = spark.read.format("zarr").load(dir)
    println("=== schema: " + df.schema.simpleString)
    println("=== count(*): " + df.count())

    val q = df.filter(col("lat") < lit(38.1) && col("lon") > lit(-116.9))
      .select("lat", "lon", "data")
    q.explain("formatted")
    println("=== flagship WHERE query:")
    q.collect().sortBy(_.getDouble(2)).foreach(r =>
      println(f"  lat=${r.getDouble(0)}%.1f lon=${r.getDouble(1)}%.1f data=${r.getDouble(2)}%.1f"))

    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW z USING zarr OPTIONS (path '$dir')")
    val join = spark.sql(
      """WITH d1 AS (SELECT lat, lon, data FROM z),
        |     d2 AS (SELECT lat, lon, data * 2 AS data2 FROM z)
        |SELECT count(*) AS n, sum(d2.data2 - 2 * d1.data) AS zero
        |FROM d1 JOIN d2 ON d1.lat = d2.lat AND d1.lon = d2.lon""".stripMargin)
    println("=== CTE self-join: " + join.collect().mkString)

    // write path: DataFrame -> zarr store -> read back
    val outStore = Files.createTempDirectory("zarr-demo-w").toString + "/written"
    spark.range(0, 1000)
      .selectExpr("id", "cast(id * 0.5 as double) AS half", "concat('n', id) AS name")
      .coalesce(1)
      .write.format("zarr").mode("append")
      .option("chunk_size", "128").option("codec", "blosc")
      .save(outStore)
    val back = spark.read.format("zarr").load(outStore)
    println("=== written store schema: " + back.schema.simpleString)
    println("=== written rows: " + back.count() +
      ", checksum: " + back.agg(sum(col("half"))).collect()(0).getDouble(0))

    // sharded store: same data, inner chunks packed 8-per-object
    val shardStore = Files.createTempDirectory("zarr-demo-s").toString + "/sharded"
    spark.range(0, 1024)
      .selectExpr("id", "cast(id * 0.5 as double) AS half")
      .coalesce(1)
      .write.format("zarr").mode("append")
      .option("chunk_size", "256").option("inner_chunk_size", "32")
      .save(shardStore)
    val sback = spark.read.format("zarr").load(shardStore)
    val objects = new java.io.File(s"$shardStore/half/c").listFiles().length
    println("=== sharded store rows: " + sback.count() +
      s", stored objects/column: $objects (32 logical chunks), checksum: " +
      sback.agg(sum(col("half"))).collect()(0).getDouble(0))

    // chunk-statistics sidecar + metadata-only aggregates: the written
    // store carries _stats segments, so min/max/count answer without
    // reading a single chunk, and filtered scans skip chunks pre-fetch
    val aggPlan = back.agg(count(lit(1)), min(col("id")), max(col("half")))
      .queryExecution.executedPlan.toString
    println("=== metadata-only aggregate plan uses ZarrAggScan: " +
      aggPlan.contains("ZarrAggScan"))
    println("=== count/min/max from metadata: " +
      back.agg(count(lit(1)), min(col("id")), max(col("half"))).collect().mkString)
    println("=== stats segments: " +
      ZarrStore(outStore).listStatsSegments().mkString(", "))
    // round 7: exact per-chunk integer sums in the sidecar extend the
    // metadata-only surface to SUM/AVG
    val sumPlan = back.agg(sum(col("id")), avg(col("id")))
      .queryExecution.executedPlan.toString
    println("=== metadata-only SUM/AVG plan uses ZarrAggScan: " +
      sumPlan.contains("ZarrAggScan") + ", values: " +
      back.agg(sum(col("id")), avg(col("id"))).collect().mkString)
    println("=== filtered scan (stats skip chunks below id 900): " +
      back.filter(col("id") >= 900).count() + " rows")

    spark.stop()
  }
}
