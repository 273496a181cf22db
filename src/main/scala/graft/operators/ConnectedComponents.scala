package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list, by iterative min-label
  * propagation — the dedup-clustering step of a training-data pipeline:
  * near-duplicate PAIRS (from MinHash/SimHash/embedding LSH) become
  * CLUSTERS, and a pipeline keeps one canonical document per cluster.
  *
  * Spark has no built-in graph operator; the idiomatic distributed shape
  * is a loop of (join edges→labels, union, groupBy min) — each iteration
  * is one shuffle join + one shuffle aggregate, and the iteration count
  * is the graph diameter (near-dup graphs are shallow: clusters are
  * cliques or short chains, so a handful of rounds converge). Lineage is
  * cut with `localCheckpoint` every round so the plan does not grow
  * exponentially; convergence is detected with a cheap existence probe
  * (`limit(1).count`), not a full collect. For billion-node graphs the
  * same loop holds — swap min-propagation for the large-star/small-star
  * variant if diameters ever get deep.
  *
  * Determinism: the min-label fixpoint is unique regardless of join or
  * iteration order, so results hash-match a DuckDB recursive-CTE oracle.
  */
object ConnectedComponents {

  /** Edge list (a, b) → (node, comp) where comp = min node id of the
    * component. Only nodes appearing in edges are labeled. */
  def label(edges: DataFrame, maxIters: Int = 30): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()

    def step(l: DataFrame): DataFrame =
      sym.join(l, sym("b") === l("node"))
        .select(sym("a").as("node"), col("comp"))
        .union(l)
        .groupBy("node").agg(min("comp").as("comp"))

    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      // min-propagation is monotone, so extra hops never overshoot the
      // fixpoint: take TWO hops per round and pay the checkpoint +
      // convergence probe (the fixed per-round job costs) half as often
      val prop = step(step(labels)).localCheckpoint()
      val changed = prop.as("n")
        .join(labels.as("o"), col("n.node") === col("o.node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count() > 0
      labels = prop
      done = !changed
      iter += 1
    }
    labels
  }

  /** q50: SimHash near-dup pairs (q37 semantics: banded 4×16-bit LSH,
    * Hamming ≤ 6) clustered into components; each involved doc reports
    * its cluster id (min doc_id of the component) and the component
    * size. Oracle: the same pairs via the q37 SQL, closed transitively
    * with a recursive CTE. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q50_dedup_clusters",
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '), w -> md5(w)) AS hs
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), b ->
        |      CASE WHEN list_sum(list_transform(hs, h ->
        |        2 * (((instr('0123456789abcdef', substr(h, (b // 4) + 1, 1)) - 1) >> (b % 4)) & 1) - 1
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
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM cand
        |  WHERE len(list_filter(generate_series(1, 64),
        |          i -> substr(ha, i, 1) != substr(hb, i, 1))) <= 6
        |), edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_id,
        |  count(DISTINCT b) AS n_linked
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      // SimHash pairs exactly as q37 (same kernels, same band join)
      val shDf = Tables.load(s, dir, "documents").select(col("doc_id"),
        expr("simhash64(md5_array(split(text, ' ')))").as("simhash"))
      val bands = shDf.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), j -> named_struct(" +
            "'band', j, 'bh', substring(simhash, 16*j + 1, 16)))")).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bh").as("bh"))
      val a = bands.as("a")
      val b = bands.as("b")
      // hamming64 is a cheap codegen'd kernel: verify BEFORE the dedup so
      // the distinct shuffle carries two longs per row, not two 64-char
      // fingerprints (band-collision duplicates re-verify at most 3x)
      val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .where(expr("hamming64(a.simhash, b.simhash)") <= 6)
        .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
        .distinct()

      val labels = label(pairs)
      val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("n_linked"))
      labels.join(sizes, "comp")
        .select(col("node").as("doc_id"), col("comp").as("cluster_id"), col("n_linked"))
        .orderBy("doc_id")
    })
}
