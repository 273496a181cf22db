package graft.queries

import graft.{CacheRegistry, SparkEntry}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The queries that persist intermediates (q35/q36 shingle tables, q62
  * test grams) must leave NO cached RDDs behind once the registry hook
  * runs — a long-lived session running the full suite repeatedly should
  * hold zero storage between queries. */
class CacheHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("cache-hygiene")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("persisting queries release their caches via CacheRegistry") {
    Seq("q35_ngram_jaccard", "q36_minhash_lsh", "q62_bloom_decontaminate")
      .foreach { q =>
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        // while the action runs the persist is live; after release, gone
        CacheRegistry.releaseAll()
      }
    // getPersistentRDDs is maintained synchronously by persist/unpersist
    val leaked = spark.sparkContext.getPersistentRDDs
    assert(leaked.isEmpty,
      s"leaked persisted RDDs: ${leaked.values.map(_.toString).mkString("; ")}")
  }
}
