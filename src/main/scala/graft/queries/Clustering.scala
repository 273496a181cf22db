package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space clustering for corpus curation: k-means over the
  * `embeddings` table (the "cluster then balance/filter the mixture"
  * step of a training-data pipeline, and the coarse quantizer training
  * behind the q42 IVF index), plus SemDeDup-style cluster-bounded
  * semantic deduplication (q88).
  *
  * Scale shape (100 TB): the assignment pass is a pure scan — centroids
  * travel as a plan literal (k×dim doubles, the degenerate broadcast),
  * distances are one codegen'd `sqdist64` call per (row, centroid), and
  * no shuffle happens at all. The recompute pass is one partial-agg
  * shuffle on (cluster, dim) — k×dim keys, so map-side combine reduces
  * each partition to ≤512 rows regardless of input size. The per-
  * iteration driver sync is k×dim doubles (the standard distributed
  * k-means / MLlib shape: iterations are driver-coordinated, data never
  * leaves the executors).
  *
  * Cross-engine determinism: centroids are rounded to 1e-6 after every
  * recompute and distances to 1e-6 before argmin, so engine-side
  * float-summation-order noise (~1e-13) cannot flip an assignment;
  * exact ties resolve to the first (lowest-id) centroid in both engines
  * (`array_position` / `list_position` both return the first match). */
object Clustering {

  private val K = 8
  private val Iters = 2

  /** First-k data-point centroids (vec_id < k), collected UNSORTED and
    * ordered driver-side: a global orderBy before a collect plans a
    * range exchange whose partitioner SAMPLES its child, so the
    * filtered scan would execute twice (two jobs) for a k-row result.
    * Shared by q56/q88/q91 here and q95's PQ codebook. */
  private[queries] def centroidSeed(emb: DataFrame, k: Int): Array[Array[Double]] =
    emb.filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  /** transform(<centroid literal>, c -> round(sqdist64(embedding, c), 6)) */
  private def distsExpr(cents: Array[Array[Double]]): String = {
    val centSql = cents
      .map(c => c.map(v => s"${v}D").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")
    s"transform($centSql, c -> round(sqdist64(embedding, c), 6))"
  }

  private def assign(emb: DataFrame, cents: Array[Array[Double]]): DataFrame =
    emb.withColumn("d", expr(distsExpr(cents)))
      .withColumn("cluster", expr("array_position(d, array_min(d)) - 1"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q56_kmeans",
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
        |  FROM embeddings
        |), c0 AS (
        |  SELECT vec_id AS cl, emb AS c FROM e WHERE vec_id < 8
        |), l0 AS (SELECT list(c ORDER BY cl) AS cents FROM c0),
        |a1 AS (
        |  SELECT vec_id, emb, list_position(d, list_min(d)) - 1 AS cluster
        |  FROM (
        |    SELECT vec_id, emb,
        |      list_transform(cents, c -> round(list_sum(list_transform(
        |        generate_series(1, 64), i -> (emb[i] - c[i]) * (emb[i] - c[i]))), 6)) AS d
        |    FROM e, l0)
        |), c1p AS (
        |  SELECT cluster AS cl, list(cv ORDER BY pos) AS c
        |  FROM (
        |    SELECT cluster, i AS pos, round(avg(emb[i]), 6) AS cv
        |    FROM a1, range(1, 65) t(i) GROUP BY cluster, i)
        |  GROUP BY cluster
        |), c1 AS (
        |  SELECT g.cl, coalesce(p.c, z.c) AS c
        |  FROM range(0, 8) g(cl)
        |  LEFT JOIN c1p p ON p.cl = g.cl
        |  LEFT JOIN c0 z ON z.cl = g.cl
        |), l1 AS (SELECT list(c ORDER BY cl) AS cents FROM c1),
        |a2 AS (
        |  SELECT vec_id, emb, list_position(d, list_min(d)) - 1 AS cluster
        |  FROM (
        |    SELECT vec_id, emb,
        |      list_transform(cents, c -> round(list_sum(list_transform(
        |        generate_series(1, 64), i -> (emb[i] - c[i]) * (emb[i] - c[i]))), 6)) AS d
        |    FROM e, l1)
        |), c2p AS (
        |  SELECT cluster AS cl, list(cv ORDER BY pos) AS c
        |  FROM (
        |    SELECT cluster, i AS pos, round(avg(emb[i]), 6) AS cv
        |    FROM a2, range(1, 65) t(i) GROUP BY cluster, i)
        |  GROUP BY cluster
        |), c2 AS (
        |  SELECT g.cl, coalesce(p.c, z.c) AS c
        |  FROM range(0, 8) g(cl)
        |  LEFT JOIN c2p p ON p.cl = g.cl
        |  LEFT JOIN c1 z ON z.cl = g.cl
        |), l2 AS (SELECT list(c ORDER BY cl) AS cents FROM c2)
        |SELECT vec_id, (list_position(d, list_min(d)) - 1)::BIGINT AS cluster,
        |  list_min(d) AS dist
        |FROM (
        |  SELECT vec_id,
        |    list_transform(cents, c -> round(list_sum(list_transform(
        |      generate_series(1, 64), i -> (emb[i] - c[i]) * (emb[i] - c[i]))), 6)) AS d
        |  FROM e, l2)
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      // init: the first K embeddings are the centroids (deterministic, and
      // they are real data points, so no cluster starts empty)
      var cents: Array[Array[Double]] = centroidSeed(emb, K)
      for (_ <- 1 to Iters) {
        val recomputed = assign(emb, cents)
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(round(avg(col("v").cast("double")), 6).as("cv"))
          .collect()
        // a cluster that lost every point keeps its previous centroid
        // (mirrors the oracle's coalesce; cannot happen with data-point init)
        val next = Array.tabulate(K)(i => cents(i).clone())
        recomputed.foreach { r =>
          next(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
        }
        cents = next
      }
      // dist is NOT re-rounded: d's elements are already 1e-6-rounded, and
      // rounding a rounded value again would sit exactly on half-way
      // boundaries where Spark (HALF_UP on the shortest decimal repr) and
      // DuckDB (nearest on the binary value) disagree
      assign(emb, cents)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          array_min(col("d")).as("dist"))
        .orderBy("vec_id")
    },

    // ---- SemDeDup-style semantic dedup (Abbas et al. 2023): k-means-
    //      assign every embedding to a cluster, then search for near-
    //      duplicates ONLY within each cluster — pairwise work drops from
    //      O(n²) to O(n·n/k). A doc is dropped when any smaller-id doc in
    //      its cluster has cosine ≥ τ (the deterministic keep-first rule;
    //      same discipline as exact dedup q34 / MinHash q36).
    //
    //      Scale shape (100 TB): assignment is a pure scan (centroids are
    //      a plan literal; at production k they are a broadcast table —
    //      SemDeDup uses ~50k clusters for 100M+ docs, bounding each
    //      cluster to ~n/k rows). The pair search is a plain equi join on
    //      the cluster id — one shuffle, per-key work bounded by the
    //      cluster size, nothing all-pairs. Cosine rounds to 6dp BEFORE
    //      the τ compare in both engines, so summation noise cannot flip
    //      a borderline pair. ----
    QueryDef.sql(
      "q88_semdedup",
      """WITH e AS (
        |  SELECT vec_id, embedding, list_transform(embedding, x -> x::DOUBLE) AS emb
        |  FROM embeddings
        |), c0 AS (
        |  SELECT vec_id AS cl, emb AS c FROM e WHERE vec_id < 8
        |), l0 AS (SELECT list(c ORDER BY cl) AS cents FROM c0),
        |a AS (
        |  SELECT vec_id, embedding, list_position(d, list_min(d)) - 1 AS cluster
        |  FROM (
        |    SELECT vec_id, embedding,
        |      list_transform(cents, c -> round(list_sum(list_transform(
        |        generate_series(1, 64), i -> (emb[i] - c[i]) * (emb[i] - c[i]))), 6)) AS d
        |    FROM e, l0)
        |), p AS (
        |  SELECT b.vec_id AS vb
        |  FROM a x JOIN a b ON x.cluster = b.cluster AND x.vec_id < b.vec_id
        |  WHERE round(list_sum(list_transform(generate_series(1, 64),
        |          i -> (x.embedding[i]::DOUBLE) * (b.embedding[i]::DOUBLE))) /
        |        (sqrt(list_sum(list_transform(x.embedding, v -> (v::DOUBLE) * (v::DOUBLE)))) *
        |         sqrt(list_sum(list_transform(b.embedding, v -> (v::DOUBLE) * (v::DOUBLE))))), 6)
        |        >= 0.35)
        |SELECT vec_id, cluster::BIGINT AS cluster,
        |  (CASE WHEN vec_id IN (SELECT vb FROM p) THEN 0 ELSE 1 END)::BIGINT AS keep
        |FROM a ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val cents: Array[Array[Double]] = centroidSeed(emb, K)
      // (vec_id, embedding, nrm, cluster): norm computed once per row, not
      // once per pair
      val assigned = assign(emb, cents)
        .select(col("vec_id"), col("embedding"), col("cluster"),
          expr("norm_f32(embedding)").as("nrm"))
      val a = assigned.as("a")
      val b = assigned.as("b")
      // dot_f32 sums left-to-right and is symmetric in its arguments
      val cos = round(expr("dot_f32(a.embedding, b.embedding)") /
        (col("a.nrm") * col("b.nrm")), 6)
      val dropped = a.join(b,
          col("a.cluster") === col("b.cluster") && col("a.vec_id") < col("b.vec_id"))
        .where(cos >= 0.35)
        .select(col("b.vec_id").as("dup_id")).distinct()
      // final flag join is narrow on both sides: (vec_id, cluster) vs the
      // dropped-id set — embeddings do not ride through this shuffle
      assigned.select(col("vec_id"), col("cluster"))
        .join(dropped, col("vec_id") === col("dup_id"), "left")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          when(col("dup_id").isNull, 1L).otherwise(0L).as("keep"))
        .orderBy("vec_id")
    },

    // ---- product quantization (Jégou et al. 2011, the PQ of IVF-PQ):
    //      split each 64-dim embedding into 8 contiguous 8-dim
    //      subspaces and encode each subspace as the index of its
    //      nearest sub-centroid — 64 floats compress to 8 small codes.
    //      Together with q42's IVF coarse quantizer this is the
    //      standard 100 TB ANN index layout (IVF-PQ): the inverted
    //      list stores PQ codes, distance evaluation works off a
    //      k×m lookup table instead of raw vectors.
    //
    //      Scale shape: encoding is a PURE SCAN — the codebook
    //      (m×k×(d/m) doubles = 8×8×8 here) travels as a plan
    //      literal (a broadcast table at production k=256), every
    //      distance is one codegen'd `sqdist64` over an 8-float
    //      slice, and no shuffle happens at all. Training the
    //      codebook is q56's k-means run per subspace (not repeated
    //      here — fixed data-point centroids keep the oracle exact,
    //      same discipline as q88).
    //
    //      Determinism: per-subspace distances round to 6dp before
    //      argmin (ties → lowest code in both engines); the
    //      reconstruction error is carried as an exact integer in
    //      1e-6 units (round then cast) and summed as BIGINTs, so
    //      no float summation order can flip the hash. ----
    QueryDef.sql(
      "q91_pq_encode",
      """WITH e AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb
        |  FROM embeddings
        |), c0 AS (
        |  SELECT vec_id AS cl, emb AS c FROM e WHERE vec_id < 8
        |), l0 AS (SELECT list(c ORDER BY cl) AS cents FROM c0),
        |d AS (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 7), j ->
        |      list_transform(cents, c ->
        |        round(list_sum(list_transform(generate_series(1, 8), i ->
        |          (emb[8*j+i] - c[8*j+i]) * (emb[8*j+i] - c[8*j+i]))), 6))) AS dd
        |  FROM e, l0)
        |SELECT vec_id,
        |  array_to_string(list_transform(dd,
        |    x -> (list_position(x, list_min(x)) - 1)::VARCHAR), '-') AS pq_code,
        |  list_sum(list_transform(dd,
        |    x -> round(list_min(x) * 1e6)::BIGINT))::BIGINT AS recon_err_u
        |FROM d ORDER BY vec_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val emb = Tables.load(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val cents: Array[Array[Double]] = centroidSeed(emb, K)
      val m = 8
      val subDim = 64 / m
      // d$j = 8 rounded sub-distances for subspace j; all scan-local
      val withDists = (0 until m).foldLeft(emb) { (df, j) =>
        val centSql = cents
          .map(c => c.slice(subDim * j, subDim * (j + 1))
            .map(v => s"${v}D").mkString("array(", ",", ")"))
          .mkString("array(", ",", ")")
        df.withColumn(s"d$j", expr(
          s"transform($centSql, c -> round(sqdist64(slice(embedding, ${subDim * j + 1}, $subDim), c), 6))"))
      }
      val codes = (0 until m).map(j =>
        (expr(s"array_position(d$j, array_min(d$j))") - 1).cast("string"))
      val errs = (0 until m).map(j =>
        round(expr(s"array_min(d$j)") * 1e6).cast("long"))
      withDists.select(col("vec_id"),
          concat_ws("-", codes: _*).as("pq_code"),
          errs.reduce(_ + _).as("recon_err_u"))
        .orderBy("vec_id")
    })
}
