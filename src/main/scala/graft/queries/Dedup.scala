package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the dedup toolbox of a
  * training-data pipeline (exact dedup lives in [[TextOps]] q34).
  *
  * All hash material is md5-derived so the DuckDB oracle can replicate
  * every step bit-for-bit (Spark's xxhash64/hash have no DuckDB
  * counterpart).
  *
  * Scale design (100 TB):
  *  - the O(n²) verifier (q35) is *blocked* by `source` — at scale you
  *    never all-pairs the corpus; you block (or LSH) first;
  *  - MinHash-LSH (q36) is the scale path: signatures are one narrow
  *    projection (no shuffle), candidates come from an equi shuffle join
  *    on (band, band_hash) — skew-safe because a band bucket only holds
  *    genuine near-dups plus rare collisions;
  *  - SimHash (q37) gives a second, cheaper signature family: 64-bit
  *    fingerprints, 4×16-bit band join, Hamming verify.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Word 3-gram shingle set (distinct), as a Column over `text`.
    * Matches the oracle's
    * `list_distinct(list_transform(generate_series(1, greatest(len(w)-2,1)), i -> w[i:i+2]))`. */
  private val shinglesExpr =
    "array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - 2, 1)), " +
      "i -> concat_ws(' ', slice(split(text, ' '), i, 3))))"

  private val shingleSql =
    """list_distinct(list_transform(generate_series(1, greatest(len(string_split(text,' '))-2, 1)),
      |      i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ---- n-gram Jaccard near-dup pairs, blocked by source ----
    QueryDef.sql(
      "q35_ngram_jaccard",
      s"""WITH s AS (
         |  SELECT doc_id, source, $shingleSql AS sh
         |  FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val sh = docs(s, dir).select(col("doc_id"), col("source"), expr(shinglesExpr).as("sh"))
      val a = sh.as("a")
      val b = sh.as("b")
      val j = size(array_intersect(col("a.sh"), col("b.sh"))) * 1.0 /
        size(array_union(col("a.sh"), col("b.sh")))
      a.join(b, col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
        .where(j >= 0.5)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          round(j, 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- MinHash + banded LSH: 16 hashes, 4 bands × 4 rows ----
    QueryDef.sql(
      "q36_minhash_lsh",
      s"""WITH s AS (
         |  SELECT doc_id, $shingleSql AS sh FROM documents
         |), sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, 15),
         |      i -> list_min(list_transform(sh, x -> substr(md5(i::VARCHAR || '|' || x), 1, 15)))) AS sg
         |  FROM s
         |), bands AS (
         |  SELECT doc_id, sh, j AS band,
         |    md5(sg[4*j+1] || sg[4*j+2] || sg[4*j+3] || sg[4*j+4]) AS bh
         |  FROM sig, range(0, 4) t(j)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sha, b.sh AS shb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  round(len(list_intersect(sha, shb)) * 1.0 /
         |        len(list_distinct(list_concat(sha, shb))), 4) AS jaccard
         |FROM cand
         |WHERE len(list_intersect(sha, shb)) * 1.0 /
         |      len(list_distinct(list_concat(sha, shb))) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val sh = docs(s, dir).select(col("doc_id"), expr(shinglesExpr).as("sh"))
      val sig = sh.withColumn("sg", expr(
        "transform(sequence(0, 15), " +
          "i -> array_min(transform(sh, x -> substr(md5(concat(cast(i AS string), '|', x)), 1, 15))))"))
      val bands = sig.select(
        col("doc_id"), col("sh"),
        explode(expr(
          """transform(sequence(0, 3), j -> named_struct(
            |  'band', j,
            |  'bh', md5(concat(element_at(sg, 4*j+1), element_at(sg, 4*j+2),
            |                   element_at(sg, 4*j+3), element_at(sg, 4*j+4)))))""".stripMargin))
          .as("b"))
        .select(col("doc_id"), col("sh"), col("b.band").as("band"), col("b.bh").as("bh"))
      val a = bands.as("a")
      val b = bands.as("b")
      val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sh").as("sha"), col("b.sh").as("shb"))
        .distinct()
      val j = size(array_intersect(col("sha"), col("shb"))) * 1.0 /
        size(array_union(col("sha"), col("shb")))
      cand.where(j >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- SimHash: 64-bit signed-sum fingerprint over words, banded
    //      4×16-bit LSH join, Hamming-distance verify ≤ 6 ----
    QueryDef.sql(
      "q37_simhash",
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), bits AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), b ->
        |      CASE WHEN list_sum(list_transform(ws, w ->
        |        2 * (((instr('0123456789abcdef', substr(md5(w), (b // 4) + 1, 1)) - 1) >> (b % 4)) & 1) - 1
        |      )) > 0 THEN '1' ELSE '0' END) AS bl
        |  FROM w
        |), sh AS (
        |  SELECT doc_id, array_to_string(bl, '') AS simhash FROM bits
        |), bands AS (
        |  SELECT doc_id, simhash, j AS band, substr(simhash, 16*j + 1, 16) AS bh
        |  FROM sh, range(0, 4) t(j)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS ha, b.simhash AS hb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  len(list_filter(generate_series(1, 64), i -> substr(ha, i, 1) != substr(hb, i, 1))) AS hamming
        |FROM cand
        |WHERE len(list_filter(generate_series(1, 64), i -> substr(ha, i, 1) != substr(hb, i, 1))) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      val w = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
      val sh = w.select(col("doc_id"), expr(
        """array_join(transform(sequence(0, 63), b ->
          |  CASE WHEN aggregate(ws, 0, (acc, w) -> acc +
          |    2 * (shiftright(instr('0123456789abcdef', substr(md5(w), (b div 4) + 1, 1)) - 1,
          |                    b % 4) & 1) - 1
          |  ) > 0 THEN '1' ELSE '0' END), '')""".stripMargin).as("simhash"))
      val bands = sh.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), j -> named_struct(" +
            "'band', j, 'bh', substring(simhash, 16*j + 1, 16)))")).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bh").as("bh"))
      val a = bands.as("a")
      val b = bands.as("b")
      val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.simhash").as("ha"), col("b.simhash").as("hb"))
        .distinct()
      val hamming = expr(
        "size(filter(sequence(1, 64), i -> substring(ha, i, 1) != substring(hb, i, 1)))")
      cand.where(hamming <= 6)
        .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
        .orderBy("doc_a", "doc_b")
    })
}
