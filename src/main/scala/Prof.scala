import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof { def main(a: Array[String]): Unit = {
  val s = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions","32")
    .config("spark.ui.enabled","false").getOrCreate()
  s.sparkContext.setLogLevel("ERROR")
  val docs = s.read.parquet("/root/testdata/sf0.1/documents.parquet")
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"PROF $name: ${(System.nanoTime()-t0)/1e9}%.2f s (n=$n)")
  }
  // stage 1: md5 per word
  val w = docs.select(col("doc_id"), expr("transform(split(text, ' '), w -> md5(w))").as("hs"))
  time("md5-words")(w.selectExpr("sum(size(hs))").collect()(0).getLong(0))
  // stage 2: full simhash via lambdas
  val sh = w.select(col("doc_id"), expr(
    """array_join(transform(sequence(0, 63), b ->
      |  CASE WHEN aggregate(hs, 0, (acc, h) -> acc +
      |    2 * (shiftright(instr('0123456789abcdef', substr(h, (b div 4) + 1, 1)) - 1,
      |                    b % 4) & 1) - 1
      |  ) > 0 THEN '1' ELSE '0' END), '')""".stripMargin).as("simhash"))
  time("simhash-lambda")(sh.selectExpr("count(distinct simhash)").collect()(0).getLong(0))
  // minhash stages
  val shingles = docs.select(col("doc_id"), expr(
    "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 3))))").as("sh"))
  time("shingles")(shingles.selectExpr("sum(size(sh))").collect()(0).getLong(0))
  val hh = shingles.withColumn("hh", expr("transform(sh, x -> concat(md5(x), md5(x)))"))
  time("minhash-md5")(hh.selectExpr("sum(size(hh))").collect()(0).getLong(0))
  val sig = hh.withColumn("sg", expr(
    "transform(sequence(0, 15), i -> array_min(transform(hh, h -> substring(h, i + 1, 16))))"))
  time("minhash-sig")(sig.selectExpr("count(distinct sg[0])").collect()(0).getLong(0))
  s.stop()
}}
