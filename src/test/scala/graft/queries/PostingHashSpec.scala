package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-22 posting-key change (guide §2.3 "shuffle fewer
  * bytes"): [[Dedup.PostingIndex]] joins on `xxhash64(shingle)` (8-byte
  * long) instead of the shingle string. The pair join and the df-cap
  * aggregate only test shingle EQUALITY, so the hash key is
  * result-identical unless two DISTINCT shingles collide in 64 bits —
  * this spec proves absence of collisions on the test corpus and pins
  * hash-join pair counts == string-join pair counts for both variants
  * (raw q35 and normalized q108). */
class PostingHashSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("posting-hash-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(spark)
  }

  override def afterAll(): Unit = {
    graft.CacheRegistry.releaseAll()
    if (spark != null) spark.stop()
  }

  /** String-keyed postings, the pre-r22 shape: exploded shingle
    * strings from the same shared base, same df-cap. */
  private def stringPostings(normalized: Boolean) = {
    val sized = Dedup.ShingleBase.base(spark, dir, normalized)
      .select(col("doc_id"), col("source"), col("lang"),
        size(col("sh")).as("sz"), explode(col("sh")).as("shingle"))
    Dedup.dropHotPostings(sized, Seq("source", "shingle"))
  }

  /** The q35-shape pair-count table over a posting index: per
    * (doc_a, doc_b, sa, sb), the number of common posting keys. */
  private def pairCounts(p: org.apache.spark.sql.DataFrame) = {
    val a = p.as("a"); val b = p.as("b")
    a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sa"), col("b.sz").as("sb"))
      .agg(count(lit(1)).as("c"))
  }

  for (normalized <- Seq(false, true)) {
    val variant = if (normalized) "normalized (q108)" else "raw (q35)"

    test(s"$variant: no xxhash64 collisions among distinct shingles") {
      val sh = Dedup.ShingleBase.base(spark, dir, normalized)
        .select(explode(col("sh")).as("shingle")).distinct()
      val strings = sh.count()
      val hashes = sh.select(xxhash64(col("shingle"))).distinct().count()
      assert(strings == hashes,
        s"$strings distinct shingles but $hashes distinct 64-bit hashes")
      assert(strings > 0, "corpus must produce shingles for the pin to mean anything")
    }

    test(s"$variant: hash-keyed pair counts == string-keyed pair counts") {
      def toMapOf(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getInt(3), r.getLong(4)))
        .toMap
      val hashed = toMapOf(pairCounts(Dedup.PostingIndex.postings(spark, dir, normalized)))
      val strs = toMapOf(pairCounts(stringPostings(normalized)))
      assert(hashed.nonEmpty, "the test corpus must produce at least one co-shingled pair")
      assert(hashed == strs,
        s"hash-join pair map (${hashed.size}) != string-join pair map (${strs.size})")
    }
  }

  test("4-gram vocabulary (q48/q54/q57 keys): no xxhash64 collisions") {
    val g = graft.Tables.load(spark, dir, "documents")
      .selectExpr("explode(shingles_k(text, 4)) AS gram").distinct()
    assert(g.count() == g.selectExpr("xxhash64(gram)").distinct().count())
  }

  test("the posting key is an 8-byte long (what the exchanges now carry)") {
    val p = Dedup.PostingIndex.postings(spark, dir, normalized = false)
    assert(p.schema("shingle").dataType == LongType, p.schema.treeString)
  }
}
