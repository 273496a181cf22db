package graft.zarr

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Store observability: `describe` returns one row per array with the
  * layout facts an operator of a large store needs BEFORE querying it —
  * dtype, shape, stored-chunk (shard) layout, inner chunking, codec
  * chain, and how much of the store the chunk-stats sidecar covers (the
  * zero-GET aggregate / chunk-skip surface). Driver-side metadata only:
  * ONE consolidated root GET when the store carries it (engine-written
  * stores always do), else LIST + GET per array — never a chunk read,
  * so describing a 100 TB store costs the same as describing a 1 GB
  * one. */
object ZarrInfo {

  private val schema = StructType(Seq(
    StructField("array", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("format_version", IntegerType, nullable = false),
    StructField("dtype", StringType, nullable = false),
    StructField("shape", StringType, nullable = false),
    StructField("chunk_shape", StringType, nullable = false),
    StructField("shard_inner_shape", StringType, nullable = true),
    StructField("codecs", StringType, nullable = false),
    StructField("dimension_names", StringType, nullable = true),
    StructField("n_stored_chunks", LongType, nullable = false),
    StructField("stats_covered_chunks", LongType, nullable = false)))

  def describe(spark: SparkSession, path: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val pairs = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue)
      .filter(_._1.startsWith("fs.")).toSeq
    val store = ZarrStore(path, pairs)
    val metas = store.readConsolidatedMetas()
      .getOrElse(store.listArrays().map(store.readMeta))
    // sidecar coverage is a STORE-level fact (segments describe grid
    // ordinals shared by every array of the grid); repeated per row so
    // a bare `describe(...).show()` reads complete
    val covered = store.listStatsSegments().map(_._2.toLong).sum
    val rows = metas.sortBy(m => (!m.isCoordinate, m.name)).map { m =>
      Row(
        m.name,
        if (m.isCoordinate) "coordinate" else "data",
        m.formatVersion,
        m.dataType.zarrName,
        m.shape.mkString("x"),
        m.chunkShape.mkString("x"),
        m.shardingSpec.map(_.innerShape.mkString("x")).orNull,
        m.codecs.map(_.name).mkString(","),
        m.dimensionNames.map(_.mkString(",")).orNull,
        m.gridShape.map(_.toLong).product,
        covered)
    }
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)
  }
}
