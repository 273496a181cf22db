package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond the round-2 set: repetition-
  * based quality signals, batch sessionization, cross-split contamination
  * detection, and deterministic stratified sampling.
  *
  * Scale notes (100 TB):
  *  - q46/q49 are pure scan-project/filter — no shuffle at all; repetition
  *    signals are per-row array expressions inside whole-stage codegen;
  *  - q47 is the batch twin of streaming sessionization
  *    ([[graft.streaming.EventStream.sessionize]]): one shuffle by
  *    user_id feeds BOTH window passes (lag + running sum share the
  *    partitioning/sort), plus one for the per-session aggregate —
  *    2 exchanges total, verified in PlanSpec;
  *  - q48 is an inverted-index equi join on 4-grams (the q35 shape):
  *    grams are deduped per doc before the join, the test split is a
  *    small fraction of the corpus, and cost scales with true overlap,
  *    never all-pairs.
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.load(s, dir, "documents")
  }

  /** Per-doc distinct word 4-grams, exploded — ONE definition shared by
    * the contamination detector (q48), the decontamination step (q54)
    * and the overlap matrix (q57) so they can never tokenize
    * differently. The native [[graft.functions.ShinglesK]] kernel is
    * value-identical to the oracle's
    * `list_distinct(list_transform(generate_series(1, greatest(len(ws)-3, 0)),
    *   i -> array_to_string(ws[i:i+3], ' ')))`. */
  private def fourGrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      // every consumer (q48 pair join, q54 decontamination semi join,
      // q57 source-mask groupBy) tests gram EQUALITY only — none emits
      // the gram string — so ship an 8-byte xxhash64 key through their
      // exchanges instead of the ~25-byte word 4-gram (guide §2.3; the
      // q35 PostingIndex argument, incl. the collision analysis —
      // PostingHashSpec pins collision absence on the test corpus, the
      // DuckDB oracle gates all three queries)
      .select(col("doc_id"), col("source"),
        explode(expr("shingles_k(text, 4)")).as("gram_str"))
      .select(col("doc_id"), col("source"), xxhash64(col("gram_str")).as("gram"))

  val defs: Seq[QueryDef] = Seq(

    // ---- Gopher-style repetition signals: duplicate-word fraction,
    //      duplicate-bigram fraction, mean word length ----
    QueryDef.sql(
      "q46_repetition",
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), b AS (
        |  SELECT doc_id, ws,
        |    list_transform(generate_series(1, greatest(len(ws) - 1, 0)),
        |      i -> ws[i] || ' ' || ws[i + 1]) AS bg
        |  FROM w)
        |SELECT doc_id,
        |  len(ws) AS n_words,
        |  round(1.0 - len(list_distinct(ws)) * 1.0 / len(ws), 4) AS dup_word_frac,
        |  CASE WHEN len(bg) > 0
        |    THEN round(1.0 - len(list_distinct(bg)) * 1.0 / len(bg), 4)
        |    ELSE 0.0 END AS dup_bigram_frac,
        |  round(list_sum(list_transform(ws, x -> length(x))) * 1.0 / len(ws), 4)
        |    AS mean_word_len
        |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // derive narrow, persist once, sort narrow — q30's SortShapes
      // shape: the array derivations run once and the range exchange
      // carries four small columns, not the word/bigram arrays
      SortShapes.sortedNarrow(
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        // bigrams without a 1-past-end guard: zip the array with itself
        // shifted by one — empty when size(ws) < 2
        .withColumn("bg", expr(
          "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), " +
            "(a, b) -> concat(a, ' ', b))"))
        .select(
          col("doc_id"),
          size(col("ws")).as("n_words"),
          round(lit(1.0) - size(array_distinct(col("ws"))) * lit(1.0) / size(col("ws")), 4)
            .as("dup_word_frac"),
          when(size(col("bg")) > 0,
            round(lit(1.0) - size(array_distinct(col("bg"))) * lit(1.0) / size(col("bg")), 4))
            .otherwise(lit(0.0)).as("dup_bigram_frac"),
          round(expr("aggregate(ws, 0L, (acc, x) -> acc + length(x))") * lit(1.0) /
            size(col("ws")), 4).as("mean_word_len")),
      "doc_id")
    },

    // ---- batch sessionization: 30-minute inactivity gap, the batch twin
    //      of the streaming flatMapGroupsWithState sessionizer ----
    QueryDef.sql(
      "q47_sessionize",
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts, event_id,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_seq
        |  FROM d)
        |SELECT user_id, sess_seq::BIGINT AS sess_seq, count(*) AS n_events,
        |  epoch_us(min(ts)) AS sess_start, epoch_us(max(ts)) AS sess_end
        |FROM s GROUP BY user_id, sess_seq
        |ORDER BY user_id, sess_seq""".stripMargin) { (s, dir) =>
      // ts is a raw nanosecond long; DuckDB reads the same parquet at µs
      // precision, so truncate to µs FIRST — the gap compare, window
      // order and outputs then agree with the oracle by construction
      // (a 30min+sub-µs gap would otherwise split in Spark only).
      val gapUs = 30L * 60 * 1000 * 1000
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("user_id"), expr("ts div 1000").as("ts"), col("event_id"))
        .withColumn("new_sess",
          when(lag(col("ts"), 1).over(w).isNull ||
            col("ts") - lag(col("ts"), 1).over(w) > gapUs, 1).otherwise(0))
        .withColumn("sess_seq", sum(col("new_sess")).over(wc))
        .groupBy(col("user_id"), col("sess_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("sess_start"),
          max(col("ts")).as("sess_end"))
        .orderBy("user_id", "sess_seq")
    },

    // ---- train/test contamination: 4-gram overlap between the held-out
    //      split (source = 'src0') and the rest of the corpus ----
    QueryDef.sql(
      "q48_contamination",
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(ws) - 3, 0)),
        |      i -> array_to_string(ws[i:i+3], ' ')))) AS gram
        |  FROM d)
        |SELECT t.doc_id AS test_doc, tr.doc_id AS train_doc, count(*) AS n_shared
        |FROM g t JOIN g tr ON t.gram = tr.gram
        |  AND t.source = 'src0' AND tr.source != 'src0'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      // df-cap (see Dedup.ShingleDfCap): a 4-gram present in more docs
      // than the cap is boilerplate — no contamination signal, pure join
      // skew. Dropped before the split so both sides agree.
      val grams = Dedup.dropHotPostings(fourGrams(s, dir), Seq("gram"))
      val test = grams.filter(col("source") === "src0")
        .select(col("doc_id").as("test_doc"), col("gram"))
      val train = grams.filter(col("source") =!= "src0")
        .select(col("doc_id").as("train_doc"), col("gram"))
      test.join(train, "gram")
        .groupBy(col("test_doc"), col("train_doc"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("test_doc", "train_doc")
    },

    // ---- per-source length-distribution stats: exact percentiles
    //      (Spark `percentile` and DuckDB `quantile_cont` share the same
    //      linear-interpolation formula, verified bit-identical). Exact
    //      percentile buffers each group's values — fine for bounded
    //      per-source groups; unbounded groups would switch to
    //      approx_percentile (t-digest) at the cost of the oracle. ----
    QueryDef.sql(
      "q53_length_stats",
      """SELECT source, count(*) AS n_docs,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90
        |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      // one percentile aggregate with an array of probes: a single
      // value buffer + sort per group instead of three
      docs(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          expr("percentile(n_chars, array(0.25D, 0.5D, 0.9D))").as("pcts"))
        .select(col("source"), col("n_docs"), col("min_chars"), col("max_chars"),
          round(element_at(col("pcts"), 1), 4).as("p25"),
          round(element_at(col("pcts"), 2), 4).as("p50"),
          round(element_at(col("pcts"), 3), 4).as("p90"))
        .orderBy("source")
    },

    // ---- TF-IDF top terms per source: tf over (source, term), df over
    //      the corpus, idf = ln(N/df). Both groupBys are partial-agg
    //      shuffles on narrow keys; the tf⋈df join shuffles by term.
    //      Ranking uses the ROUNDED score so cross-engine float noise
    //      cannot reorder ranks. ----
    QueryDef.sql(
      "q51_tfidf_top_terms",
      """WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT source, term, count(*) AS tf FROM t GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.source, tf.term, tf.tf, df.df,
        |    round(tf.tf * ln(n.n * 1.0 / df.df), 4) AS score
        |  FROM tf JOIN df USING (term), n
        |), ranked AS (
        |  SELECT source, term, tf, df, score,
        |    row_number() OVER (PARTITION BY source ORDER BY score DESC, term) AS rk
        |  FROM scored)
        |SELECT source, term, tf, df, score, rk FROM ranked
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin) { (s, dir) =>
      val terms = docs(s, dir)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ", -1)).as("term"))
      val tf = terms.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = terms.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = docs(s, dir).agg(count(lit(1)).as("n"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .select(col("source"), col("term"), col("tf"), col("df"),
          round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .orderBy("source", "rk")
    },

    // ---- decontamination REMOVAL: drop from the train split every doc
    //      sharing a 4-gram with the held-out source (q48 finds the
    //      pairs; this is the pipeline step that acts on them). The
    //      overlap set is produced by the same inverted-index join and
    //      applied with a LEFT ANTI join — no pairwise materialization
    //      reaches the output. ----
    QueryDef.sql(
      "q54_decontaminate",
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, source,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(ws) - 3, 0)),
        |      i -> array_to_string(ws[i:i+3], ' ')))) AS gram
        |  FROM d)
        |SELECT doc_id, source FROM documents
        |WHERE source != 'src0' AND doc_id NOT IN (
        |  SELECT DISTINCT tr.doc_id
        |  FROM g t JOIN g tr ON t.gram = tr.gram
        |    AND t.source = 'src0' AND tr.source != 'src0')
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val grams = fourGrams(s, dir)
      // only EXISTENCE of an overlap matters here (q48 counts pairs), so
      // a left semi against deduped test grams caps the intermediate at
      // one row per train gram — no fan-out by how many test docs share
      // the gram, and no extra distinct() exchange
      val testGrams = grams.filter(col("source") === "src0").select("gram").distinct()
      val contaminated = grams.filter(col("source") =!= "src0")
        .join(testGrams, Seq("gram"), "left_semi")
        .select(col("doc_id")).distinct()
      docs(s, dir).filter(col("source") =!= "src0")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // ---- unigram log-probability quality score (KenLM-proxy): per-doc
    //      mean ln of each word's corpus frequency. Corpus counts are one
    //      narrow-key aggregate; the word→count attach shuffles by word;
    //      the per-doc mean is a second aggregate. Low scores flag
    //      rare-vocabulary/garbled docs. ----
    QueryDef.sql(
      "q55_unigram_logprob",
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        |), cnt AS (
        |  SELECT w, count(*) AS c FROM t GROUP BY w
        |), tot AS (SELECT count(*) AS n FROM t)
        |SELECT t.doc_id, count(*) AS n_words,
        |  round(avg(ln(cnt.c * 1.0 / tot.n)), 4) AS mean_logp
        |FROM t JOIN cnt USING (w), tot
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
      val terms = docs(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      val cnt = terms.groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = terms.agg(count(lit(1)).as("n"))
      terms.join(cnt, "w").crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          round(avg(log(col("c") * lit(1.0) / col("n"))), 4).as("mean_logp"))
        .orderBy("doc_id")
    },

    // ---- cross-source duplication matrix: which sources copy from each
    //      other. Per-source DISTINCT 4-gram sets (vocabulary-bounded,
    //      not corpus-bounded), then an inverted-index self-join on the
    //      gram: each gram contributes at most (#sources-with-it choose 2)
    //      pairs, so the fan-out is bounded by source count squared —
    //      never all-document-pairs. The mixture-design signal a curation
    //      pipeline uses to decide which sources to down-weight. ----
    QueryDef.sql(
      "q57_source_overlap",
      """WITH d AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT DISTINCT source, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(ws) - 3, 0)),
        |    i -> array_to_string(ws[i:i+3], ' ')))) AS gram
        |  FROM d
        |), sz AS (
        |  SELECT source, count(*) AS n FROM g GROUP BY source
        |), pair AS (
        |  SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT s1, s2, n_shared,
        |  round(n_shared * 1.0 / (x.n + y.n - n_shared), 4) AS jaccard
        |FROM pair JOIN sz x ON x.source = s1 JOIN sz y ON y.source = s2
        |ORDER BY s1, s2""".stripMargin) { (s, dir) =>
      // no self-join, no per-gram set objects: the source domain is tiny
      // (≤ 64 — guarded in-plan), so each gram's source set is a LONG
      // BITMASK built with a fully codegen'd bit_or aggregate (the
      // ObjectHashAggregate collect_set this replaces was the dominant
      // cost). The source→bit mapping comes from a 1-row broadcast of
      // the sorted source list — computed inside the plan, never a
      // driver collect. After the per-gram bit_or, identical masks are
      // counted (distinct masks ≤ 2^|sources| but in practice a few
      // hundred), so pair expansion runs over mask-count rows, not
      // gram rows. For > 64 sources this operator would fall back to
      // the collect_set formulation; the in-plan guard raises instead
      // of silently wrapping the shift.
      val srcArr = docs(s, dir)
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .select(when(size(col("srcs")) <= 64, col("srcs"))
          .otherwise(raise_error(lit("q57 bitmask path supports <= 64 sources")))
          .as("srcs"))
      val maskCounts = fourGrams(s, dir)
        .crossJoin(broadcast(srcArr))
        .select(col("gram"), expr(
          "shiftleft(1L, int(array_position(srcs, source)) - 1)").as("bit"))
        .groupBy(col("gram")).agg(expr("bit_or(bit)").as("mask"))
        .groupBy(col("mask")).agg(count(lit(1)).as("c"))
      // mask → the (s1, s2) pair structs plus a (s1, '') singleton per
      // set bit; each contributes the mask's gram count c
      maskCounts
        .crossJoin(broadcast(srcArr))
        // the set-bit sources, resolved to names once — keeping this a
        // separate projection keeps the generator expression small (the
        // analyzer cost of a triple-inlined bit filter is measurable)
        .select(col("c"), expr(
          "transform(filter(transform(srcs, (x, i) -> " +
            "IF((shiftright(mask, i) & 1) = 1, i, -1)), v -> v >= 0), " +
            "a -> element_at(srcs, a + 1))").as("ms"))
        .select(col("c"), explode(expr(
          "concat(" +
            "flatten(transform(ms, (x, ai) -> " +
            "transform(slice(ms, ai + 2, size(ms)), " +
            "y -> struct(x AS s1, y AS s2)))), " +
            "transform(ms, x -> struct(x AS s1, '' AS s2)))")).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum(col("c")).as("cnt"))
        .agg(
          map_from_entries(collect_list(
            when(col("s2") === "", struct(col("s1"), col("cnt"))))).as("nmap"),
          collect_list(
            when(col("s2") =!= "", struct(col("s1"), col("s2"), col("cnt"))))
            .as("pairs"))
        .select(col("nmap"), explode(col("pairs")).as("p"))
        .select(col("p.s1").as("s1"), col("p.s2").as("s2"),
          col("p.cnt").as("n_shared"),
          round(col("p.cnt") * lit(1.0) /
            (element_at(col("nmap"), col("p.s1")) +
              element_at(col("nmap"), col("p.s2")) - col("p.cnt")), 4)
            .as("jaccard"))
        .orderBy("s1", "s2")
    },

    // ---- deterministic data mixing: cap every source at a fixed doc
    //      budget, chosen by md5 order (reproducible, no RNG) — the
    //      "balance the mixture" step after q57 identifies over-
    //      represented sources. One shuffle by source for the per-source
    //      rank; a skewed giant source would first be cut down with the
    //      q49-style md5-prefix filter (pure scan) before the exact rank,
    //      keeping any single reducer's sort bounded. ----
    QueryDef.sql(
      "q58_mix_sample",
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source, rk FROM r
        |WHERE rk <= 12 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 12)
        .select(col("doc_id"), col("source"), col("rk"))
        .orderBy("doc_id")
    },

    // ---- deterministic stratified sampling: md5-bucketed per-language
    //      rates (en 50%, others 12.5%) — a pure filter, no shuffle, and
    //      reproducible across engines and runs (no RNG) ----
    QueryDef.sql(
      "q49_stratified_sample",
      """SELECT doc_id, lang, source FROM documents
        |WHERE (instr('0123456789abcdef',
        |         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
        |      < (CASE WHEN lang = 'en' THEN 8 ELSE 2 END)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .where(expr(
          "(instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1)" +
            " < (CASE WHEN lang = 'en' THEN 8 ELSE 2 END)"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },

    // ---- weighted reservoir sampling (Efraimidis-Spirakis A-ES):
    //      key_i = ln(u_i) / w_i with u_i uniform on (0,1], take the k
    //      largest keys — inclusion probability proportional to weight
    //      (here n_chars: longer docs more likely sampled). u_i is
    //      md5-derived, so the "random" draw is deterministic and both
    //      engines select the identical sample.
    //      Scale shape: keys are scan-local arithmetic; the k largest
    //      come from per-partition top-k merged on the driver
    //      (TakeOrderedAndProject, pinned in PlanSpec) — no shuffle, no
    //      sort of the corpus; this is THE one-pass distributed weighted
    //      sampler. Keys are rounded to 9dp pre-rank in both engines
    //      (ties broken by doc_id) so a last-ulp ln() divergence cannot
    //      flip the selection. ----
    QueryDef.sql(
      "q90_weighted_sample",
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 1)
        |             / 4503599627370496.0) / n_chars, 9) AS skey
        |  FROM documents)
        |SELECT doc_id, source, n_chars, skey
        |FROM k ORDER BY skey DESC, doc_id LIMIT 64""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(
            log((expr(
              "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
              + lit(1)) / lit(4503599627370496.0)) / col("n_chars"), 9).as("skey"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(64)
    },

    // ---- per-source cap (the "max N pages per domain" rule of
    //      RefinedWeb/Dolma-style web curation): keep at most 15 docs
    //      per source, selected by md5(doc_id) order — a deterministic
    //      uniform draw both engines reproduce.
    //
    //      Scale shape: a naive row_number() per source shuffles the
    //      WHOLE corpus onto one partition per source — a hot domain
    //      (half the web crawl) lands on a single task. This plan caps
    //      in two levels: top-15 within (source, salt) — 16 hash-salt
    //      buckets spread each source 16-ways — then top-15 of the
    //      ≤16·15 per-source survivors. Exact because every global
    //      top-15 row is necessarily inside its salt bucket's top-15.
    //      Stage 2's input is ≤240 rows per source regardless of
    //      corpus size, so the plan survives any domain skew (same
    //      two-level discipline as q28's salted agg). ----
    QueryDef.sql(
      "q94_domain_cap",
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 15
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val cap = 15
      val base = docs(s, dir)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("salt", substring(col("h"), 1, 1))
      val w1 = Window.partitionBy(col("source"), col("salt"))
        .orderBy(col("h"), col("doc_id"))
      val w2 = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      base.withColumn("rn1", row_number().over(w1)).where(col("rn1") <= cap)
        .withColumn("rn", row_number().over(w2)).where(col("rn") <= cap)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    },

    // ---- the standard curation recipe as ONE declarative plan:
    //      exact-dedup (keep-first per content hash) → quality filter
    //      (q31's rule, verbatim) → per-source cap (200 docs by md5
    //      draw), reported as a per-source funnel. No stage is
    //      materialized: each row carries SURVIVOR FLAGS (dedup-keeper,
    //      quality-ok, under-cap) and one conditional aggregate emits
    //      every stage count — so Catalyst fuses the whole pipeline
    //      into two window shuffles (content_fp; source) + one narrow
    //      agg, a single pass over the corpus. This is the operational
    //      answer to "run the curation pipeline": not four jobs with
    //      three intermediate tables, one plan.
    //
    //      The cap stage uses a plain per-(source, survivor) window
    //      here; under real domain skew swap in q94's salted two-level
    //      discipline — semantics identical, demonstrated separately.
    //
    //      Determinism: flags are integer/regex-count comparisons (the
    //      q31 parity), the cap draw orders by md5(doc_id) with doc_id
    //      ties, and every output is an exact integer. ----
    QueryDef.sql(
      "q100_curation_pipeline",
      """WITH f AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY md5(lower(trim(text))))
        |         THEN 1 ELSE 0 END AS keep_dedup,
        |    CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 1000
        |          AND len(regexp_extract_all(lower(text),
        |                '\b(the|a|of|and|to|in|is|that)\b')) * 1.0
        |              / len(string_split(text, ' ')) >= 0.01
        |         THEN 1 ELSE 0 END AS keep_quality
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, source, n_chars, keep_dedup, keep_quality,
        |    CASE WHEN keep_dedup = 1 AND keep_quality = 1 THEN
        |      row_number() OVER (
        |        PARTITION BY source, keep_dedup * keep_quality
        |        ORDER BY md5(doc_id::VARCHAR), doc_id)
        |    ELSE 0 END AS rn
        |  FROM f)
        |SELECT source,
        |  count(*) AS n_raw,
        |  sum(keep_dedup)::BIGINT AS n_dedup,
        |  sum(keep_dedup * keep_quality)::BIGINT AS n_quality,
        |  sum(CASE WHEN rn BETWEEN 1 AND 200 THEN 1 ELSE 0 END)::BIGINT AS n_final,
        |  sum(CASE WHEN rn BETWEEN 1 AND 200 THEN n_chars ELSE 0 END)::BIGINT AS chars_final,
        |  sum(CASE WHEN rn BETWEEN 1 AND 200 THEN doc_id ELSE 0 END)::BIGINT AS id_sum_final
        |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val wFp = Window.partitionBy(md5(lower(trim(col("text")))))
      val f = docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"), col("text"),
          when(col("doc_id") === min(col("doc_id")).over(wFp), 1).otherwise(0)
            .as("keep_dedup"),
          when(size(split(col("text"), " ", -1)).between(20, 1000) &&
            size(expr(
              "regexp_extract_all(lower(text), '\\\\b(the|a|of|and|to|in|is|that)\\\\b', 0)"))
              * lit(1.0) / size(split(col("text"), " ", -1)) >= 0.01, 1)
            .otherwise(0).as("keep_quality"))
      val wCap = Window
        .partitionBy(col("source"), col("keep_dedup") * col("keep_quality"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val g = f.withColumn("rn",
        when(col("keep_dedup") === 1 && col("keep_quality") === 1,
          row_number().over(wCap)).otherwise(0))
      val inCap = col("rn").between(1, 200)
      g.groupBy(col("source"))
        .agg(count(lit(1)).as("n_raw"),
          sum(col("keep_dedup")).as("n_dedup"),
          sum(col("keep_dedup") * col("keep_quality")).as("n_quality"),
          sum(when(inCap, 1).otherwise(0)).as("n_final"),
          sum(when(inCap, col("n_chars")).otherwise(0L)).as("chars_final"),
          sum(when(inCap, col("doc_id")).otherwise(0L)).as("id_sum_final"))
        .orderBy("source")
    },

    // ---- per-source weighted reservoir (stratified A-ES): q90's
    //      Efraimidis-Spirakis keys ranked WITHIN each source — "k docs
    //      per source, inclusion probability ∝ length" — the balanced-
    //      mixture draw (every source contributes exactly k) where q90
    //      is the global one.
    //
    //      Scale shape: keys are scan-local arithmetic; the per-group
    //      top-k is a source-partitioned rank window, which Spark
    //      executes with WindowGroupLimit partial pruning map-side —
    //      each mapper forwards at most k rows per source before the
    //      ONE source shuffle. Same 9dp key rounding + doc_id
    //      tie-break as q90 so a last-ulp ln() divergence cannot flip
    //      the draw. ----
    QueryDef.sql(
      "q105_stratified_reservoir",
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |    round(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 1)
        |             / 4503599627370496.0) / n_chars, 9) AS skey
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_chars, skey,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY skey DESC, doc_id) AS rk
        |  FROM k)
        |SELECT source, rk, doc_id, n_chars FROM r WHERE rk <= 8
        |ORDER BY source, rk""".stripMargin) { (s, dir) =>
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("skey").desc, col("doc_id"))
      docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"),
          round(
            log((expr(
              "cast(conv(substring(md5(cast(doc_id as string)), 1, 13), 16, 10) as bigint)")
              + lit(1)) / lit(4503599627370496.0)) / col("n_chars"), 9).as("skey"))
        .withColumn("rk", row_number().over(wSrc))
        .where(col("rk") <= 8)
        .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
        .orderBy("source", "rk")
    },

    // ---- native dynamic-gap session windows: Spark's built-in
    //      `session_window` operator (the one stateful-session
    //      primitive q47 hand-rolls with gaps-and-islands, here as the
    //      engine-native aggregate — in batch it plans as ONE user_id
    //      shuffle + sort-based session merge, and the identical
    //      expression runs under Structured Streaming with watermarked
    //      state eviction).
    //
    //      Boundary semantics pinned by the oracle: Spark sessions are
    //      half-open [start, last + gap) and a new event merges only if
    //      its time is STRICTLY below the current end, so a gap of
    //      exactly 30 min splits — the islands formulation must use
    //      `>=` (q47's custom 30-min rule uses `>`, which is why the
    //      two queries are intentionally different registry entries).
    //      ts truncates to µs first, the q47 cross-engine discipline. ----
    QueryDef.sql(
      "q102_session_window",
      """WITH d AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), s AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess_seq
        |  FROM d)
        |SELECT user_id, epoch_us(min(ts)) AS sess_start,
        |  epoch_us(max(ts)) + 1800000000 AS sess_end_excl,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess_seq
        |ORDER BY user_id, sess_start""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .select(col("user_id"), expr("timestamp_micros(ts div 1000)").as("et"))
        .groupBy(col("user_id"), expr("session_window(et, '30 minutes')").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          expr("unix_micros(sw.start)").as("sess_start"),
          expr("unix_micros(sw.end)").as("sess_end_excl"),
          col("n_events"))
        .orderBy("user_id", "sess_start")
    },

    // ---- deterministic train/val/test split assignment: the hash-of-id
    //      discipline every training pipeline needs — a document's split
    //      is a pure function of its identity (md5(doc_id) mod 100 →
    //      80/10/10), so it NEVER moves when the corpus grows, is
    //      re-sharded, or is re-ordered (position-based splits leak val
    //      into train on every re-crawl). Output is the per-source split
    //      audit: counts plus each split's share of its source, the check
    //      that hashing didn't skew any stratum.
    //
    //      Scale shape: assignment is scan-local arithmetic on a hash;
    //      the audit is ONE (source, split) aggregate (≤ 3·|sources|
    //      keys, map-side combined) + a broadcast-sized window for the
    //      shares. No join, no document shuffle. ----
    QueryDef.sql(
      "q106_stable_split",
      """WITH a AS (
        |  SELECT source,
        |    CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT source,
        |          ('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 100 AS b
        |        FROM documents))
        |SELECT source, split, count(*) AS n_docs,
        |  round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY source), 4) AS share
        |FROM a GROUP BY source, split
        |ORDER BY source, split""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("source"))
      docs(s, dir)
        .select(col("source"),
          (expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int)")
            % 100).as("b"))
        .select(col("source"),
          when(col("b") < 80, "train").when(col("b") < 90, "val")
            .otherwise("test").as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("split"), col("n_docs"),
          round(col("n_docs") * 1.0 / sum(col("n_docs")).over(w), 4).as("share"))
        .orderBy("source", "split")
    },

    // ---- corpus-order novelty curve: what fraction of each document's
    //      3-gram shingles has ALREADY appeared in an earlier document
    //      (smaller doc_id = earlier in corpus order). The dedup-aware
    //      curation signal: a feed whose novelty collapses toward 0 is
    //      re-crawling content the corpus already holds, and per-doc
    //      novelty is the keep/drop score incremental ingestion uses.
    //
    //      Scale shape: ONE document scan; postings co-locate by shingle
    //      exactly once (a whole-partition window min — the frame is
    //      unordered, so this is a per-group aggregate, spill-backed for
    //      hot boilerplate shingles), then one doc_id aggregate. Two
    //      exchanges total, never a pair join: cost is linear in total
    //      postings at any corpus size (no df-cap needed — unlike the
    //      PAIR joins in q35/q48, a hot shingle here contributes df
    //      rows, not df² pairs). ----
    QueryDef.sql(
      "q107_novelty_curve",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), s AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(ws) - 2, 1)),
        |      i -> array_to_string(ws[i:i+2], ' ')))) AS sh
        |  FROM d
        |), f AS (
        |  SELECT sh, min(doc_id) AS first_doc FROM s GROUP BY sh)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
        |  round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) * 1.0 /
        |        count(*), 4) AS novelty
        |FROM s JOIN f ON f.sh = s.sh
        |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin) { (s, dir) =>
      val wf = Window.partitionBy(col("sh"))
      docs(s, dir)
        .select(col("doc_id"), explode(expr("shingles3(text)")).as("sh"))
        .withColumn("first_doc", min(col("doc_id")).over(wf))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1).otherwise(0))
            .cast("long").as("n_novel"))
        .select(col("doc_id"), col("n_shingles"), col("n_novel"),
          round(col("n_novel") * 1.0 / col("n_shingles"), 4).as("novelty"))
        .orderBy("doc_id")
    },

    // ---- DSIR importance weights (Xie et al. 2023, "Data Selection for
    //      Language Models via Importance Resampling"): score every raw
    //      document by how target-like its hashed n-gram distribution
    //      is. Features = unigrams + word bigrams hashed into 256
    //      buckets (md5, the engine-wide deterministic hash); target =
    //      the lexicographically first source; both bucket
    //      distributions get add-one smoothing; a doc's log importance
    //      weight is Σ_f count_f · (ln p_tgt(bucket f) − ln p_raw(bucket
    //      f)). Output: the 20 highest-weight non-target docs — the
    //      resampling pool's head.
    //
    //      Scale shape (the DSIR two-pass discipline): pass 1 builds the
    //      bucket distributions — a 256-key aggregate, map-side
    //      combined, collected as a plan literal (bounded at 256 rows
    //      regardless of corpus size, the q42/q74 literal-table rule);
    //      pass 2 scores ENTIRELY scan-locally — each doc folds its
    //      sorted feature array against the 256-double literal, so the
    //      scoring pass has ZERO shuffles and ends in a
    //      TakeOrderedAndProject top-k. No posting join, no per-doc
    //      state beyond the fold.
    //
    //      Determinism: both engines sum per-distinct-feature terms in
    //      sorted-feature order (Spark array_sort fold ↔ DuckDB
    //      list(cnt·w ORDER BY feat)); ln is the one libm call (q64/q74
    //      precedent), final weight rounded to 6dp BEFORE the rank. ----
    QueryDef.sql(
      "q109_dsir_weights",
      """WITH t AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        |), f AS MATERIALIZED (
        |  SELECT doc_id, source,
        |    list_concat(ws, list_transform(range(1, greatest(len(ws), 1)),
        |      i -> ws[i] || '_' || ws[i + 1])) AS feats
        |  FROM t
        |), tgt AS (SELECT min(source) AS ts FROM documents
        |), xb AS MATERIALIZED (
        |  SELECT doc_id, source, feat,
        |    ('0x' || substr(md5(feat), 1, 4))::INT % 256 AS b
        |  FROM (SELECT doc_id, source, unnest(feats) AS feat FROM f)
        |), bc AS (
        |  SELECT b, count(*) AS cr,
        |    sum(CASE WHEN source = (SELECT ts FROM tgt) THEN 1 ELSE 0 END)::BIGINT AS ct
        |  FROM xb GROUP BY b
        |), tots AS (SELECT sum(cr)::BIGINT AS r, sum(ct)::BIGINT AS t FROM bc
        |), lr AS (
        |  SELECT g.b,
        |    ln((coalesce(bc.ct, 0) + 1.0) / (tots.t + 256.0)) -
        |    ln((coalesce(bc.cr, 0) + 1.0) / (tots.r + 256.0)) AS w
        |  FROM (SELECT unnest(range(0, 256))::INT AS b) g
        |  LEFT JOIN bc USING (b) CROSS JOIN tots
        |), dc AS (
        |  SELECT doc_id, source, feat, b, count(*) AS cnt
        |  FROM xb GROUP BY doc_id, source, feat, b
        |), sc AS (
        |  SELECT dc.doc_id, max(dc.source) AS source,
        |    sum(dc.cnt)::BIGINT AS n_feats,
        |    list_sum(list(dc.cnt * lr.w ORDER BY dc.feat)) AS raw
        |  FROM dc JOIN lr ON dc.b = lr.b
        |  WHERE dc.source <> (SELECT ts FROM tgt)
        |  GROUP BY dc.doc_id)
        |SELECT doc_id, source, n_feats, round(raw, 6) AS logw
        |FROM sc ORDER BY logw DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"), split(col("text"), " ", -1).as("ws"))
        // unigrams ++ bigrams; zip_with pads the shorter side with null,
        // so the trailing (w_n, null) pair concats to null and is dropped
        .withColumn("feats", expr(
          "concat(ws, filter(zip_with(ws, slice(ws, 2, greatest(size(ws) - 1, 0)), " +
            "(a, b) -> concat(a, '_', b)), x -> x IS NOT NULL))"))
      // pass 1: ONE job computes both the target source and the bucket
      // distributions, with NO per-feature fan-out — the native
      // `dsir_hist` aggregate (same md5-bucket identity as dsir_score)
      // keeps one long[256] per (source, partition) and merges map-side,
      // so the feature arrays never explode into rows and the shuffle
      // carries sources×256 longs. Groups exist even for zero-feature
      // sources, so target = min(source) falls out of the same collect
      // (the old shape ran a separate min(source) job, then exploded
      // every feature through a Generate + groupBy(bucket)).
      val counts = d.groupBy("source")
        .agg(expr("dsir_hist(feats, 256)").as("h"))
        .collect()
      val targetOpt = counts.iterator.map(_.getString(0)).filter(_ != null).minOption
      require(targetOpt.isDefined,
        "q109_dsir_weights: documents table has no non-null source — no DSIR target exists")
      val target = targetOpt.get
      val cr = new Array[Long](256)
      val ct = new Array[Long](256)
      counts.foreach { r =>
        val h = r.getSeq[Long](1)
        var b = 0
        while (b < 256) {
          cr(b) += h(b)
          if (r.getString(0) == target) ct(b) += h(b)
          b += 1
        }
      }
      val rTot = cr.sum
      val tTot = ct.sum
      val lrs = Array.tabulate(256)(i =>
        math.log((ct(i) + 1.0) / (tTot + 256.0)) - math.log((cr(i) + 1.0) / (rTot + 256.0)))
      val lrArr = s"array(${lrs.map(v => s"${v}D").mkString(",")})"
      // pass 2: scan-local scoring via the codegen'd `dsir_score` kernel
      // — a run-length fold over the binary-sorted feature array, terms
      // in sorted-feature order to match the oracle's ordered list sum
      // (KernelEdgeSpec pins kernel == the interpreted fold bit-exactly)
      d.where(col("source") =!= target)
        .select(col("doc_id"), col("source"),
          size(col("feats")).cast("long").as("n_feats"),
          expr(s"dsir_score(feats, $lrArr)").as("raw"))
        .select(col("doc_id"), col("source"), col("n_feats"),
          round(col("raw"), 6).as("logw"))
        .orderBy(col("logw").desc, col("doc_id"))
        .limit(20)
    })
}
