package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (vec_id, embedding float[64],
  * label).
  *
  * Cosine is computed by one deterministic formula in both engines —
  * elementwise double products summed left-to-right, rounded at the
  * output — so the DuckDB oracle hash-matches.
  *
  * Scale design (100 TB):
  *  - brute-force top-k (q38) broadcasts the small query set and linearly
  *    scans the corpus — no shuffle of the corpus side at all; the per-
  *    partition TopK (window + filter) keeps only k rows per query;
  *  - the all-pairs verifier (q39) exists as a correctness oracle; at
  *    scale you run q40 instead;
  *  - random-hyperplane LSH (q40) buckets the corpus ONCE (narrow
  *    projection), then candidates come from an equi join on the bucket
  *    key — the classic ANN recall/cost trade.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.load(s, dir, "embeddings")
  }

  /** Per-label centroid means of the float32 `embedding` column as
    * (label, cent: array<double>), rounded to 6dp BEFORE any distance
    * compare — the cross-engine determinism lever. q42's coarse
    * quantizer and q65's outlier QA share this one definition so the
    * rounding discipline cannot drift between them. One partial-agg
    * shuffle on (label, pos): k×dim keys regardless of corpus size. */
  private[queries] def perLabelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("x").cast("double")), 6).as("m"))
      .groupBy(col("label"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)")
        .as("cent"))

  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), i -> ($a[i]::DOUBLE) * ($b[i]::DOUBLE)))"

  private def duckNorm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> (x::DOUBLE) * (x::DOUBLE))))"

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-k: the exact ANN baseline ----
    QueryDef.sql(
      "q38_cosine_topk",
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
         |), scored AS (
         |  SELECT q.qid, e.vec_id,
         |    round(${duckDot("q.qv", "e.embedding")} /
         |          (${duckNorm("q.qv")} * ${duckNorm("e.embedding")}), 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id != q.qid
         |), ranked AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, cos, rk FROM ranked WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val e = emb(s, dir).withColumn("nrm", expr("norm_f32(embedding)"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(expr("dot_f32(qv, embedding)") / (col("qn") * col("nrm")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("qid", "rk")
    },

    // ---- embedding-cosine near-duplicate pairs (exact, tiled) ----
    //
    // An exact threshold join at cos >= 0.3 cannot be LSH-pruned on this
    // data: measured at sf0.01, the qualifying pairs sit right at the
    // threshold (median cos 0.326), and every random-hyperplane family
    // set reaching 100% recall generates MORE candidate pairs than
    // all-pairs (16 families x 2 bits = 4x all-pairs). So the O(n^2)
    // compute is inherent — what must NOT be O(n^2) is the plan's memory
    // and communication shape. The naive `a.vec_id < b.vec_id` non-equi
    // join plans as BroadcastNestedLoopJoin (whole corpus broadcast →
    // executor OOM at scale). Instead: classic TILED self-join — assign
    // each vector a block (vec_id mod B), enumerate the B*(B+1)/2
    // unordered block pairs as tiles, route each side to its tiles with a
    // broadcast of the tiny tile table, and join the two sides on the
    // tile id — a plain shuffle equi join. Each task scores one
    // (n/B)x(n/B) tile; shuffle volume is n*(B+1)/2 rows; no broadcast
    // of the corpus, no nested loop. For approximate-but-cheap near-dup
    // at scale, q40 (LSH) / q42 (IVF) are the recall/cost trade.
    QueryDef.sql(
      "q39_embed_neardup",
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(${duckDot("a.embedding", "b.embedding")} /
         |        (${duckNorm("a.embedding")} * ${duckNorm("b.embedding")}), 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckDot("a.embedding", "b.embedding")} /
         |      (${duckNorm("a.embedding")} * ${duckNorm("b.embedding")}) >= 0.3
         |ORDER BY vec_a, vec_b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val nBlocks = 8
      val tiles = (for { i <- 0 until nBlocks; j <- i until nBlocks }
        yield (i * nBlocks + j, i, j)).toDF("tid", "bi", "bj")
      val e = emb(s, dir).withColumn("nrm", expr("norm_f32(embedding)"))
        .withColumn("blk", pmod(col("vec_id"), lit(nBlocks)).cast("int"))
      val aSide = e.join(broadcast(tiles), col("blk") === col("bi"))
        .select(col("tid"), col("bi"), col("bj"),
          col("vec_id").as("ida"), col("embedding").as("ea"), col("nrm").as("na"))
      val bSide = e.join(broadcast(tiles), col("blk") === col("bj"))
        .select(col("tid").as("tidb"),
          col("vec_id").as("idb"), col("embedding").as("eb"), col("nrm").as("nb"))
      // dot_f32 sums elementwise products left-to-right: symmetric in its
      // arguments, so cos is order-independent and least/greatest is safe
      val cos = expr("dot_f32(ea, eb)") / (col("na") * col("nb"))
      aSide.join(bSide, col("tid") === col("tidb"))
        // diagonal tiles (bi==bj) see both orders of a pair: keep one;
        // off-diagonal tiles see each cross-block pair exactly once
        .where(col("bi") < col("bj") || col("ida") < col("idb"))
        .where(cos >= 0.3)
        .select(least(col("ida"), col("idb")).as("vec_a"),
          greatest(col("ida"), col("idb")).as("vec_b"),
          round(cos, 6).as("cos"))
        .orderBy("vec_a", "vec_b")
    },

    // ---- LSH-bucketed ANN: 4 md5-derived random hyperplanes → 16
    //      buckets; top-5 within the query's bucket ----
    QueryDef.sql(
      "q40_ann_lsh",
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |    array_to_string(list_transform(generate_series(0, 3), p ->
         |      CASE WHEN list_sum(list_transform(generate_series(1, 64), j ->
         |        (embedding[j]::DOUBLE) *
         |        (2 * ((instr('0123456789abcdef',
         |                     substr(md5(p::VARCHAR || '-' || j::VARCHAR), 1, 1)) - 1) % 2) - 1)
         |      )) > 0 THEN '1' ELSE '0' END), '') AS bucket
         |  FROM embeddings
         |), q AS (
         |  SELECT vec_id AS qid, embedding AS qv, bucket FROM b WHERE vec_id < 10
         |), scored AS (
         |  SELECT q.qid, c.vec_id,
         |    round(${duckDot("q.qv", "c.embedding")} /
         |          (${duckNorm("q.qv")} * ${duckNorm("c.embedding")}), 6) AS cos
         |  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.qid
         |), ranked AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, cos, rk FROM ranked WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      // The hyperplane signs depend only on (p, j) — 4x64 CONSTANTS the
      // oracle derives from md5 hex. The old expression computed those
      // 256 md5s per ROW through interpreted higher-order lambdas (no
      // codegen for zip_with/aggregate); here the same signs are md5'd
      // ONCE driver-side into float ±1 literals and each plane is one
      // codegen'd dot_f32. Bit-exact: dot_f32 sums (double)x * (double)s
      // left-to-right, and x * ±1.0 is exact — the identical terms in
      // the identical order as the oracle's list_sum.
      val signArr: IndexedSeq[String] = (0 until 4).map { p =>
        (1 to 64).map { j =>
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$p-$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          val firstHexDigit = (d(0) >> 4) & 0xf
          if (firstHexDigit % 2 == 1) "CAST(1 AS float)" else "CAST(-1 AS float)"
        }.mkString("array(", ",", ")")
      }
      val signExpr = (0 until 4)
        .map(p => s"CASE WHEN dot_f32(embedding, ${signArr(p)}) > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      val b = emb(s, dir).select(col("vec_id"), col("embedding"), expr(signExpr).as("bucket"))
      val q = b.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
      val scored = broadcast(q)
        .join(b.withColumnRenamed("bucket", "cbucket"),
          col("cbucket") === col("bucket") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(expr("dot_f32(qv, embedding)") /
            (expr("norm_f32(qv)") * expr("norm_f32(embedding)")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("qid", "rk")
    },

    // ---- int8 scalar quantization: per-vector (min, max) affine code —
    //      the compression step ANN systems apply before indexing. All
    //      quantized values use floor of IEEE-deterministic arithmetic
    //      (identical op order in both engines), so the oracle matches
    //      bit-for-bit; reconstruction error is rounded at the output.
    //      Scale shape: narrow scan-project, no shuffle. ----
    QueryDef.sql(
      "q52_int8_quantize",
      s"""WITH q AS (
         |  SELECT vec_id, embedding,
         |    list_min(list_transform(embedding, x -> x::DOUBLE)) AS mn,
         |    list_max(list_transform(embedding, x -> x::DOUBLE)) AS mx
         |  FROM embeddings)
         |SELECT vec_id, round(mn, 6) AS q_min, round(mx, 6) AS q_max,
         |  list_sum(list_transform(embedding, x ->
         |    CASE WHEN mx > mn
         |      THEN least(floor((x::DOUBLE - mn) * 255.0 / (mx - mn)), 255)::BIGINT
         |      ELSE 0 END))::BIGINT AS q_sum
         |FROM q ORDER BY vec_id""".stripMargin) { (s, dir) =>
      emb(s, dir)
        .withColumn("mn", expr(
          "aggregate(embedding, CAST('Infinity' AS double), (acc, x) -> least(acc, CAST(x AS double)))"))
        .withColumn("mx", expr(
          "aggregate(embedding, CAST('-Infinity' AS double), (acc, x) -> greatest(acc, CAST(x AS double)))"))
        .select(
          col("vec_id"),
          round(col("mn"), 6).as("q_min"),
          round(col("mx"), 6).as("q_max"),
          expr("""aggregate(embedding, 0L, (acc, x) ->
            acc + CASE WHEN mx > mn
              THEN CAST(least(floor((CAST(x AS double) - mn) * 255.0D / (mx - mn)), 255.0D) AS bigint)
              ELSE 0L END)""").as("q_sum"))
        .orderBy("vec_id")
    },

    // ---- IVF-style ANN: label-partitioned coarse quantizer. Centroids
    //      are per-position averages (rounded BEFORE any comparison so
    //      both engines rank identically); each query probes its 2
    //      nearest centroids and ranks only those partitions' vectors.
    //      At scale the centroid table is broadcast and each query
    //      touches nprobe/nlist of the corpus. ----
    QueryDef.sql(
      "q42_ivf_ann",
      s"""WITH pos AS (
         |  SELECT label, j, round(avg(embedding[j]::DOUBLE), 6) AS m
         |  FROM embeddings, generate_series(1, 64) t(j)
         |  GROUP BY label, j
         |), cent AS (
         |  SELECT label, list(m ORDER BY j) AS cv FROM pos GROUP BY label
         |), q AS (
         |  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
         |), qc AS (
         |  SELECT q.qid, c.label,
         |    row_number() OVER (PARTITION BY q.qid ORDER BY
         |      round(list_sum(list_transform(generate_series(1, 64),
         |        i -> (q.qv[i]::DOUBLE) * cv[i])), 6) DESC, c.label) AS crk
         |  FROM q, cent c
         |), probes AS (
         |  SELECT qid, label FROM qc WHERE crk <= 2
         |), scored AS (
         |  SELECT p.qid, e.vec_id,
         |    round(${duckDot("q.qv", "e.embedding")} /
         |          (${duckNorm("q.qv")} * ${duckNorm("e.embedding")}), 6) AS cos
         |  FROM probes p
         |  JOIN q ON q.qid = p.qid
         |  JOIN embeddings e ON e.label = p.label AND e.vec_id != p.qid
         |), ranked AS (
         |  SELECT qid, vec_id, cos,
         |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored)
         |SELECT qid, vec_id, cos, rk FROM ranked WHERE rk <= 5
         |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      // per-position centroid means, rounded to 6dp pre-comparison
      val cent = perLabelCentroids(e).withColumnRenamed("cent", "cv")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val qcW = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("label"))
      val probes = broadcast(q).join(broadcast(cent))
        .select(col("qid"), col("qv"), col("label"),
          round(expr(
            "aggregate(zip_with(qv, cv, (x, c) -> CAST(x AS double) * c), " +
              "CAST(0 AS double), (acc, v) -> acc + v)"), 6).as("cscore"))
        .withColumn("crk", row_number().over(qcW))
        .filter(col("crk") <= 2)
        .select(col("qid"), col("qv"), col("label").as("plabel"))
      val scored = broadcast(probes)
        .join(e.withColumn("nrm", expr("norm_f32(embedding)")),
          col("label") === col("plabel") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          round(expr("dot_f32(qv, embedding)") /
            (expr("norm_f32(qv)") * col("nrm")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("qid", "rk")
    },

    // ---- IVF-PQ search (asymmetric distance computation): the full
    //      100 TB ANN serving layout, composing q42's coarse quantizer
    //      with q91's PQ codes. The corpus is stored as 8 small codes
    //      per vector (not raw floats); each query probes its 2 nearest
    //      coarse partitions, builds an m×k lookup table of subspace
    //      distances ONCE, and ranks every candidate with m=8 table
    //      lookups instead of a 64-dim distance (Jégou et al. 2011).
    //
    //      Scale shape: encoding is a pure scan (codebook as a plan
    //      literal); the LUT is computed on the ≤ nq×nprobe broadcast
    //      probe rows — per QUERY, never per candidate — so candidate
    //      scoring touches no floats, only element_at into an 8-entry
    //      array; the corpus side is never shuffled (broadcast-probe
    //      equi join on the IVF partition key, same as q42). At
    //      production scale the inverted lists hold only (vec_id,
    //      codes) — 8 bytes/vector instead of 256 — which is the point:
    //      the whole index fits in memory where raw vectors cannot.
    //
    //      Determinism: sub-distances round to 6dp before both argmin
    //      (encode) and the LUT (search); ADC totals are exact BIGINT
    //      sums of 1e-6-unit integers, so no float summation order can
    //      flip the hash (same discipline as q91). Ties: lowest code at
    //      encode, lowest vec_id at rank, in both engines. ----
    QueryDef.sql(
      "q95_ivfpq_search",
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(embedding, x -> x::DOUBLE) AS emb
        |  FROM embeddings
        |), c0 AS (
        |  SELECT vec_id AS cl, emb AS c FROM e WHERE vec_id < 8
        |), l0 AS (SELECT list(c ORDER BY cl) AS cents FROM c0),
        |d AS (
        |  SELECT vec_id, label,
        |    list_transform(generate_series(0, 7), j ->
        |      list_transform(cents, c ->
        |        round(list_sum(list_transform(generate_series(1, 8), i ->
        |          (emb[8*j+i] - c[8*j+i]) * (emb[8*j+i] - c[8*j+i]))), 6))) AS dd
        |  FROM e, l0
        |), enc AS (
        |  SELECT vec_id, label,
        |    list_transform(dd, x -> list_position(x, list_min(x))) AS codes
        |  FROM d
        |), pos AS (
        |  SELECT label, j, round(avg(emb[j]), 6) AS m FROM e,
        |    generate_series(1, 64) t(j) GROUP BY label, j
        |), cc AS (
        |  SELECT label, list(m ORDER BY j) AS cv FROM pos GROUP BY label
        |), q AS (
        |  SELECT vec_id AS qid, emb AS qv FROM e WHERE vec_id < 10
        |), qc AS (
        |  SELECT q.qid, q.qv, c.label,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY
        |      round(list_sum(list_transform(generate_series(1, 64),
        |        i -> qv[i] * cv[i])), 6) DESC, c.label) AS crk
        |  FROM q, cc c
        |), probes AS (
        |  SELECT qid, qv, label FROM qc WHERE crk <= 2
        |), scored AS (
        |  SELECT p.qid, en.vec_id,
        |    list_sum(list_transform(generate_series(0, 7), j ->
        |      round(round(list_sum(list_transform(generate_series(1, 8), i ->
        |        (p.qv[8*j+i] - cents[codes[j+1]][8*j+i])
        |        * (p.qv[8*j+i] - cents[codes[j+1]][8*j+i]))), 6) * 1e6)::BIGINT
        |    ))::BIGINT AS adc_u
        |  FROM probes p JOIN enc en ON en.label = p.label AND en.vec_id != p.qid, l0
        |), ranked AS (
        |  SELECT qid, vec_id, adc_u,
        |    row_number() OVER (PARTITION BY qid ORDER BY adc_u, vec_id) AS rk
        |  FROM scored)
        |SELECT qid, vec_id, adc_u, rk FROM ranked WHERE rk <= 5
        |ORDER BY qid, rk""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val m = 8
      val subDim = 64 / m
      // PQ codebook: fixed data-point sub-centroids (vec_id < 8), one
      // k-vector array literal per subspace — same training discipline
      // as q91 so codes agree across the two queries.
      val cb: Array[Array[Double]] = Clustering.centroidSeed(e, 8)
      def centSql(j: Int): String = cb
        .map(c => c.slice(subDim * j, subDim * (j + 1))
          .map(v => s"${v}D").mkString("array(", ",", ")"))
        .mkString("array(", ",", ")")
      // corpus → (vec_id, label, c0..c7): scan-local encode, 1-based
      // codes. The sub-distance array is computed ONCE per subspace into
      // d$j and the argmin reads it twice — the previous shape inlined
      // the interpreted transform(8 × sqdist64) both as array_position's
      // argument and under array_min, doubling the per-row encode work
      // (q91 already hoists the same way).
      val encoded = (0 until m).foldLeft(e) { (df, j) =>
        df.withColumn(s"d$j", expr(
          s"""transform(${centSql(j)}, c ->
             |  round(sqdist64(slice(embedding, ${subDim * j + 1}, $subDim), c), 6))""".stripMargin))
      }.select(col("vec_id") +: col("label") +: (0 until m).map(j =>
        expr(s"cast(array_position(d$j, array_min(d$j)) as int)").as(s"c$j")): _*)
      // coarse probe: identical discipline to q42 (dot vs per-label
      // centroid, rounded, top-2)
      val cent = perLabelCentroids(e).withColumnRenamed("cent", "cv")
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val qcW = Window.partitionBy(col("qid")).orderBy(col("cscore").desc, col("label"))
      val probesBase = broadcast(q).join(broadcast(cent))
        .select(col("qid"), col("qv"), col("label"),
          round(expr(
            "aggregate(zip_with(qv, cv, (x, c) -> CAST(x AS double) * c), " +
              "CAST(0 AS double), (acc, v) -> acc + v)"), 6).as("cscore"))
        .withColumn("crk", row_number().over(qcW))
        .filter(col("crk") <= 2)
        .select(col("qid"), col("qv"), col("label").as("plabel"))
      // the ADC lookup tables: m arrays of k rounded sub-distances,
      // computed once per (query, probe) row on the broadcast side
      val probes = (0 until m).foldLeft(probesBase) { (df, j) =>
        df.withColumn(s"lut$j", expr(
          s"transform(${centSql(j)}, c -> round(sqdist64(slice(qv, ${subDim * j + 1}, $subDim), c), 6))"))
      }.drop("qv")
      val adcU = (0 until m).map(j =>
        round(expr(s"element_at(lut$j, c$j)") * 1e6).cast("long")).reduce(_ + _)
      val scored = broadcast(probes)
        .join(encoded, col("label") === col("plabel") && col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"), adcU.as("adc_u"))
      val w95 = Window.partitionBy(col("qid")).orderBy(col("adc_u"), col("vec_id"))
      scored.withColumn("rk", row_number().over(w95))
        .filter(col("rk") <= 5)
        .orderBy("qid", "rk")
    },

    // ---- contrastive-pair mining: for each anchor, its POSITIVE (the
    //      nearest same-label neighbor) and its two HARD NEGATIVES
    //      (the highest-cosine different-label neighbors) — the
    //      anchor/positive/negatives triple every contrastive or
    //      embedding-finetune dataset starts from, with in-batch-random
    //      negatives replaced by mined hard ones (the standard recall
    //      lever).
    //
    //      Scale shape: one broadcast of the anchor set against a
    //      single corpus scan (q38's linear-scan discipline — the
    //      corpus is never shuffled); per-anchor winners come from two
    //      WindowGroupLimit-pruned rank windows over the nq-bounded
    //      scored rows. At production scale the same mining runs over
    //      q42/q95's IVF-PQ candidates instead of the full scan —
    //      identical downstream plan.
    //
    //      Determinism: cosines round to 6dp pre-rank (ties → lowest
    //      vec_id), the q38 discipline. ----
    QueryDef.sql(
      "q101_contrastive_pairs",
      s"""WITH q AS (
         |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
         |  FROM embeddings WHERE vec_id < 20
         |), scored AS (
         |  SELECT q.qid, q.qlabel, e.vec_id, e.label,
         |    round(${duckDot("q.qv", "e.embedding")} /
         |          (${duckNorm("q.qv")} * ${duckNorm("e.embedding")}), 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id != q.qid
         |), pos AS (
         |  SELECT qid, vec_id AS pos_id, cos AS pos_cos FROM (
         |    SELECT qid, vec_id, cos,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |    FROM scored WHERE label = qlabel) WHERE rk = 1
         |), neg AS (
         |  SELECT qid,
         |    min(CASE WHEN rk = 1 THEN vec_id END)::BIGINT AS neg1_id,
         |    min(CASE WHEN rk = 1 THEN cos END) AS neg1_cos,
         |    min(CASE WHEN rk = 2 THEN vec_id END)::BIGINT AS neg2_id,
         |    min(CASE WHEN rk = 2 THEN cos END) AS neg2_cos
         |  FROM (
         |    SELECT qid, vec_id, cos,
         |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
         |    FROM scored WHERE label != qlabel) WHERE rk <= 2 GROUP BY qid)
         |SELECT p.qid, p.pos_id, p.pos_cos, n.neg1_id, n.neg1_cos,
         |  n.neg2_id, n.neg2_cos
         |FROM pos p JOIN neg n ON n.qid = p.qid
         |ORDER BY p.qid""".stripMargin) { (s, dir) =>
      val e = emb(s, dir).withColumn("nrm", expr("norm_f32(embedding)"))
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"), col("vec_id"), col("label"),
          round(expr("dot_f32(qv, embedding)") / (col("qn") * col("nrm")), 6).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val pos = scored.where(col("label") === col("qlabel"))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("qid"), col("vec_id").as("pos_id"), col("cos").as("pos_cos"))
      val neg = scored.where(col("label") =!= col("qlabel"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 2)
        .groupBy(col("qid"))
        .agg(
          min(when(col("rk") === 1, col("vec_id"))).as("neg1_id"),
          min(when(col("rk") === 1, col("cos"))).as("neg1_cos"),
          min(when(col("rk") === 2, col("vec_id"))).as("neg2_id"),
          min(when(col("rk") === 2, col("cos"))).as("neg2_cos"))
      pos.join(neg, "qid")
        .select(col("qid"), col("pos_id"), col("pos_cos"),
          col("neg1_id"), col("neg1_cos"), col("neg2_id"), col("neg2_cos"))
        .orderBy("qid")
    },

    // ---- embedding diversity per label (round 11): the data-curation
    //      dial between dedup aggressiveness and coverage — a
    //      low-diversity cluster is near-duplicate mass (SemDeDup's
    //      premise), a high-diversity one should be left alone. The
    //      mean pairwise squared distance has an O(n²) definition but a
    //      ONE-PASS identity: E||x − μ||² = E||x||² − ||μ||² (and mean
    //      pairwise sq distance = 2·that), so the metric needs exactly
    //      two bounded aggregates — mean squared norm per label and the
    //      per-position centroid (labels × dim keys, q42's recipe with
    //      the same round-to-6 cross-engine discipline) — never a pair
    //      join. 100 TB shape: both aggregates are map-side-combinable
    //      shuffles on tiny keys; the label join is broadcast-size. ----
    QueryDef.sql(
      "q123_embedding_diversity",
      s"""WITH pos AS (
         |  SELECT label, j, round(avg(embedding[j]::DOUBLE), 6) AS m
         |  FROM embeddings, generate_series(1, 64) t(j)
         |  GROUP BY label, j
         |), cent AS (
         |  SELECT label, round(sum(m * m), 6) AS c2 FROM pos GROUP BY label
         |), nrm AS (
         |  SELECT label, count(*) AS n,
         |    round(avg(list_sum(list_transform(embedding,
         |      x -> x::DOUBLE * x::DOUBLE))), 6) AS msq
         |  FROM embeddings GROUP BY label
         |)
         |SELECT nrm.label, nrm.n::BIGINT AS n, nrm.msq AS mean_sq_norm,
         |  cent.c2 AS centroid_sq_norm, round(nrm.msq - cent.c2, 6) AS diversity
         |FROM nrm JOIN cent USING (label)
         |ORDER BY nrm.label""".stripMargin) { (s, dir) =>
      val e = emb(s, dir)
      val posM = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("j0", "x")))
        .groupBy(col("label"), (col("j0") + 1).as("j"))
        .agg(round(avg(col("x").cast("double")), 6).as("m"))
      val cent = posM.groupBy("label")
        .agg(round(sum(col("m") * col("m")), 6).as("c2"))
      val nrm = e.groupBy("label").agg(
        count(lit(1)).as("n"),
        round(avg(expr(
          "aggregate(embedding, 0D, (acc, x) -> acc + CAST(x AS double) * CAST(x AS double))")), 6)
          .as("msq"))
      nrm.join(cent, "label")
        .select(col("label"), col("n"), col("msq").as("mean_sq_norm"),
          col("c2").as("centroid_sq_norm"),
          round(col("msq") - col("c2"), 6).as("diversity"))
        .orderBy("label")
    })
}
