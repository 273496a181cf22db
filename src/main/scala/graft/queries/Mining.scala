package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 additions: behavioral analytics over `events` (staged funnel,
  * retention cohorts, z-score anomalies) and corpus-curation ops over
  * `documents`/`embeddings` (boilerplate n-gram mining, temperature-scaled
  * source mixing, rare-word novelty scoring, ANN recall evaluation).
  *
  * Scale notes (100 TB):
  *  - q66: all three stage aggregates shuffle on `user_id`, so the stage
  *    joins land co-partitioned — Spark reuses the hash partitioning and
  *    plans SortMergeJoin without an extra exchange; per-stage state is
  *    one row per user;
  *  - q67: the classic inverted-index shape — distinct-per-doc shingles
  *    (native kernel, no intermediate set materialization) → one wide
  *    (gram) shuffle with map-side partial counts → global top-k via
  *    TakeOrderedAndProject (no full sort);
  *  - q68: per-source token totals are a narrow 20-key aggregate; the
  *    normalizing sum is computed over an ORDERED list in BOTH engines
  *    (summation order pinned ⇒ bit-identical), and sqrt is IEEE
  *    correctly-rounded in both — no cross-engine float drift by
  *    construction;
  *  - q69: the scoring pass is scan-local (`count_in` against the
  *    top-k vocabulary folded to one broadcast row INSIDE the plan) —
  *    no driver collect, no job at construction; only the tiny vocab
  *    agg shuffles;
  *  - q70: joins two already-small top-k result sets (k rows per query) —
  *    evaluation cost is independent of corpus size;
  *  - q71: ONE shuffle on user_id (`collect_set` of active days is
  *    bounded by the calendar, not by event volume), then a cohort-key
  *    re-agg over |days| rows;
  *  - q72: per-type moments are a 5-key aggregate broadcast back over the
  *    scan — anomaly filtering never shuffles the fact table.
  */
object Mining {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.load(s, dir, "documents")
  }

  /** events with `ts` as a microsecond long — the parquet stores
    * TIMESTAMP(NANOS) which Spark reads as a raw ns long (Tables.load),
    * `div 1000` matches DuckDB's `epoch_us(ts)` exactly. */
  private def eventsUs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn("tus", expr("ts div 1000"))

  val defs: Seq[QueryDef] = Seq(

    // ---- staged conversion funnel view → click → purchase: stage k's
    //      timestamp is the earliest matching event strictly after stage
    //      k-1 — the standard product-analytics funnel, expressed as
    //      per-stage min-aggregates joined on user_id ----
    QueryDef.sql(
      "q66_event_funnel",
      """WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
        |  GROUP BY e.user_id
        |), p AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
        |  GROUP BY e.user_id
        |)
        |SELECT v.user_id,
        |  (1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT) AS stage,
        |  (t2 - t1) AS us_to_click,
        |  (t3 - t2) AS us_to_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |       LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin) { (s, dir) =>
      val e = eventsUs(s, dir).select(col("user_id"), col("event_type"), col("tus"))
      val v = e.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("tus").as("t1"))
      val c = e.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("tus") > col("t1"))
        .groupBy("user_id").agg(min("tus").as("t2"))
      val p = e.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("tus") > col("t2"))
        .groupBy("user_id").agg(min("tus").as("t3"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          (lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
            + when(col("t3").isNotNull, 1).otherwise(0)).cast("int").as("stage"),
          (col("t2") - col("t1")).as("us_to_click"),
          (col("t3") - col("t2")).as("us_to_purchase"))
        .orderBy("user_id")
    },

    // ---- boilerplate phrase mining: word 3-grams shared by >= 4 distinct
    //      docs, top 50 by document frequency — the common-crawl
    //      header/footer detection primitive ----
    QueryDef.sql(
      "q67_boilerplate_ngrams",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(ws) - 2, 0)),
        |    i -> array_to_string(ws[i:i+2], ' ')))) AS gram
        |  FROM d
        |), c AS (
        |  SELECT gram, count(*) AS n_docs, min(doc_id) AS first_doc
        |  FROM g GROUP BY gram
        |)
        |SELECT gram, n_docs, first_doc FROM c WHERE n_docs >= 4
        |ORDER BY n_docs DESC, gram LIMIT 50""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), explode(expr("shingles_k(text, 3)")).as("gram"))
        .groupBy("gram")
        .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
        .filter(col("n_docs") >= 4)
        .orderBy(col("n_docs").desc, col("gram"))
        .limit(50)
    },

    // ---- temperature-scaled source mixing (alpha = 0.5): sampling
    //      weights proportional to sqrt(source tokens) — the standard
    //      multinomial-temperature rebalancing of a multi-source corpus.
    //      The normalizer is summed over a source-ORDERED list in both
    //      engines and sqrt is correctly rounded in both, so every float
    //      on the way to the output is bit-identical cross-engine ----
    QueryDef.sql(
      "q68_temperature_mix",
      """WITH t AS (
        |  SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS tok
        |  FROM documents GROUP BY source
        |), w AS (
        |  SELECT source, tok, sqrt(tok) AS wt FROM t
        |), tot AS (
        |  SELECT list_sum(list(wt ORDER BY source)) AS twt FROM w
        |)
        |SELECT source, tok, round(wt / twt, 6) AS weight,
        |  round(100000 * wt / twt / tok, 6) AS epochs
        |FROM w, tot ORDER BY source""".stripMargin) { (s, dir) =>
      val t = docs(s, dir)
        .select(col("source"), size(split(col("text"), " ", -1)).as("nw"))
        .groupBy("source").agg(sum(col("nw")).as("tok"))
        .withColumn("wt", sqrt(col("tok").cast("double")))
      // pinned summation order: sort the (source, wt) structs, then fold
      // left-to-right — same order DuckDB's list(wt ORDER BY source) sums in
      val tot = t.groupBy().agg(
        expr("aggregate(transform(array_sort(collect_list(struct(source, wt))), " +
          "x -> x.wt), 0D, (acc, v) -> acc + v)").as("twt"))
      t.crossJoin(broadcast(tot))
        .select(col("source"), col("tok"),
          round(col("wt") / col("twt"), 6).as("weight"),
          round(lit(100000) * col("wt") / col("twt") / col("tok"), 6).as("epochs"))
        .orderBy("source")
    },

    // ---- rare-word novelty scoring: fraction of a doc's tokens outside
    //      the global top-10 vocabulary (the synthetic corpus has a 31-word
    //      vocab, so top-10 leaves a meaningful rare tail). The vocabulary
    //      is a tiny deterministic top-k (count desc, word) folded to ONE
    //      row inside the plan and broadcast — constructing the DataFrame
    //      launches no job, and the wordcount pass runs exactly once per
    //      execution. The scoring pass stays scan-local (`count_in`
    //      hash-set kernel, codegen'd) — no explode-join of the full
    //      token stream ----
    QueryDef.sql(
      "q69_rare_word_ratio",
      """WITH wc AS (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |), top AS (
        |  SELECT word FROM (
        |    SELECT word, count(*) AS c FROM wc GROUP BY word
        |    ORDER BY c DESC, word LIMIT 10)
        |), tl AS (
        |  SELECT list(word) AS wl FROM top
        |)
        |SELECT doc_id, len(ws) AS n_words,
        |  round((len(ws) - len(list_filter(ws, x -> list_contains(wl, x))))
        |    * 1.0 / len(ws), 6) AS rare_frac
        |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), tl
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val top10 = d
        .select(explode(split(col("text"), " ", -1)).as("word"))
        .groupBy("word").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("word"))
        .limit(10)
        .agg(collect_list(col("word")).as("wl"))
      // sort below, scoring above (the r21 hoist — q30's
      // single-execution rationale). The SortShapes narrow-sort variant
      // was A/B'd in r22 and REVERTED for this query: the persist build
      // costs +0.15 s at sf0.1 in two independent windows (0.318 →
      // 0.467/0.469) because the broadcast-probe scoring is cheap while
      // the materialization is not — exactly VERDICT r21's "keep the
      // hoist where kernel cost < text width" carve-out. The 1-row
      // broadcast join above the sort is a narrow stream-side append,
      // so row order is preserved.
      d.select(col("doc_id"), col("text"))
        .orderBy("doc_id")
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .withColumn("n_words", size(col("ws")))
        .crossJoin(broadcast(top10))
        .select(col("doc_id"), col("n_words"),
          round((col("n_words") -
            call_function("count_in", col("ws"), col("wl"))) *
            lit(1.0) / col("n_words"), 6)
            .as("rare_frac"))
    },

    // ---- ANN recall evaluation: recall@5 of the LSH index (q40) against
    //      the exact brute-force ranking (q38), per query vector. Both
    //      sides reuse the registered query definitions verbatim — Spark
    //      fns AND oracle SQL — so the metric can never drift from the
    //      operators it measures ----
    {
      def defOf(n: String) = Similarity.defs.find(_.name == n).get
      val exact = defOf("q38_cosine_topk")
      val approx = defOf("q40_ann_lsh")
      QueryDef.sql(
        "q70_ann_recall",
        s"""WITH ex AS (
           |${exact.oracle.get}
           |), ap AS (
           |${approx.oracle.get}
           |)
           |SELECT ex.qid, count(ap.vec_id)::BIGINT AS n_hit,
           |  round(count(ap.vec_id) / 5.0, 2) AS recall
           |FROM ex LEFT JOIN ap ON ex.qid = ap.qid AND ex.vec_id = ap.vec_id
           |GROUP BY ex.qid ORDER BY ex.qid""".stripMargin) { (s, dir) =>
        val ex = exact.fn(s, dir).select(col("qid"), col("vec_id"))
        val ap = approx.fn(s, dir).select(col("qid"), col("vec_id"))
          .withColumn("hit", lit(1))
        ex.join(ap, Seq("qid", "vec_id"), "left")
          .groupBy("qid")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hit"))
          .select(col("qid"), col("n_hit"),
            round(col("n_hit") / lit(5.0), 2).as("recall"))
          .orderBy("qid")
      }
    },

    // ---- retention cohorts: users grouped by first-active day; retained
    //      if active again within the next 7 days. ONE shuffle on
    //      user_id — the active-day set per user is bounded by the
    //      calendar window, so collect_set stays small at any volume ----
    QueryDef.sql(
      "q71_retention_cohorts",
      """WITH d AS (
        |  SELECT user_id, epoch_us(ts) // 86400000000 AS dy FROM events
        |), f AS (
        |  SELECT user_id, min(dy) AS d0 FROM d GROUP BY user_id
        |), r AS (
        |  SELECT f.user_id, f.d0,
        |    max(CASE WHEN d.dy BETWEEN f.d0 + 1 AND f.d0 + 7
        |        THEN 1 ELSE 0 END) AS ret
        |  FROM f JOIN d ON f.user_id = d.user_id
        |  GROUP BY f.user_id, f.d0
        |)
        |SELECT d0 AS cohort_day, count(*) AS n_users,
        |  sum(ret)::BIGINT AS n_retained,
        |  round(sum(ret) * 1.0 / count(*), 4) AS retention_frac
        |FROM r GROUP BY d0 ORDER BY cohort_day""".stripMargin) { (s, dir) =>
      eventsUs(s, dir)
        .select(col("user_id"), expr("tus div 86400000000").as("dy"))
        .groupBy("user_id")
        .agg(min("dy").as("d0"), collect_set("dy").as("days"))
        .select(col("d0"),
          expr("CASE WHEN exists(days, d -> d > d0 AND d <= d0 + 7) " +
            "THEN 1 ELSE 0 END").as("ret"))
        .groupBy(col("d0").as("cohort_day"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("ret")).as("n_retained"),
          round(sum(col("ret")) * lit(1.0) / count(lit(1)), 4).as("retention_frac"))
        .orderBy("cohort_day")
    },

    // ---- passage-level duplication: chunk every doc with q59's EXACT
    //      chunker (fns and oracle reused verbatim), then measure the
    //      fraction of each doc's passages that occur more than once in
    //      the corpus — the span-level dup signal used to de-boilerplate
    //      web crawls. Two narrow shuffles: (passage_md5) count, then
    //      (doc_id) re-agg ----
    {
      val chunker = Quality.defs.find(_.name == "q59_passage_chunk").get
      QueryDef.sql(
        "q73_passage_dedup",
        s"""WITH p AS (
           |${chunker.oracle.get}
           |), c AS (
           |  SELECT passage_md5, count(*) AS cnt FROM p GROUP BY passage_md5
           |)
           |SELECT p.doc_id, count(*) AS n_passages,
           |  sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup,
           |  round(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
           |    AS dup_frac
           |FROM p JOIN c ON p.passage_md5 = c.passage_md5
           |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin) { (s, dir) =>
        val p = chunker.fn(s, dir).select(col("doc_id"), col("passage_md5"))
        val c = p.groupBy("passage_md5").agg(count(lit(1)).as("cnt"))
        p.join(c, "passage_md5")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_passages"),
            sum(when(col("cnt") > 1, 1).otherwise(0)).as("n_dup"),
            round(sum(when(col("cnt") > 1, 1).otherwise(0)) * lit(1.0)
              / count(lit(1)), 6).as("dup_frac"))
          .orderBy("doc_id")
      }
    },

    // ---- source drift: KL(source ‖ corpus) over the global top-20
    //      vocabulary with add-one smoothing — the domain-shift monitor
    //      for mixture rebalancing. The 20-word support is completed
    //      per source (missing words get count 0) and the KL sum runs
    //      over a word-ORDERED list in both engines; ln is the one
    //      libm call, the q64 precedent ----
    QueryDef.sql(
      "q74_source_drift",
      """WITH wc AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
        |), sw AS (
        |  SELECT source, word, count(*) AS c FROM wc GROUP BY source, word
        |), top AS (
        |  SELECT word, sum(c)::BIGINT AS cg FROM sw GROUP BY word
        |  ORDER BY cg DESC, word LIMIT 20
        |), gt AS (
        |  SELECT sum(cg)::BIGINT AS totg FROM top
        |), grid AS (
        |  SELECT s.source, t.word, t.cg, coalesce(sw.c, 0) AS cs
        |  FROM (SELECT DISTINCT source FROM documents) s
        |  CROSS JOIN top t
        |  LEFT JOIN sw ON sw.source = s.source AND sw.word = t.word
        |), st AS (
        |  SELECT source, sum(cs)::BIGINT AS tots FROM grid GROUP BY source
        |), terms AS (
        |  SELECT g.source, g.word,
        |    ((g.cs + 1.0) / (st.tots + 20.0)) *
        |      ln(((g.cs + 1.0) / (st.tots + 20.0)) /
        |         ((g.cg + 1.0) / (gt.totg + 20.0))) AS term,
        |    st.tots
        |  FROM grid g JOIN st ON g.source = st.source CROSS JOIN gt
        |)
        |SELECT source, max(tots) AS top20_tokens,
        |  round(list_sum(list(term ORDER BY word)), 6) AS kl
        |FROM terms GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val sw = docs(s, dir)
        .select(col("source"), explode(split(col("text"), " ", -1)).as("word"))
        .groupBy("source", "word").agg(count(lit(1)).as("c"))
      val top = sw.groupBy("word").agg(sum(col("c")).as("cg"))
        .orderBy(col("cg").desc, col("word")).limit(20)
      val gt = top.groupBy().agg(sum(col("cg")).as("totg"))
      val sources = docs(s, dir).select(col("source")).distinct()
      val grid = sources.crossJoin(broadcast(top))
        .join(sw, Seq("source", "word"), "left")
        .withColumn("cs", coalesce(col("c"), lit(0)))
      val st = grid.groupBy("source").agg(sum(col("cs")).as("tots"))
      val terms = grid.join(st, "source").crossJoin(broadcast(gt))
        .select(col("source"), col("word"), col("tots"),
          (((col("cs") + 1.0) / (col("tots") + 20.0)) *
            log(((col("cs") + 1.0) / (col("tots") + 20.0)) /
              ((col("cg") + 1.0) / (col("totg") + 20.0)))).as("term"))
      // pinned summation order: fold term values sorted by word, matching
      // DuckDB's list(term ORDER BY word) left-to-right sum
      terms.groupBy("source")
        .agg(max(col("tots")).as("top20_tokens"),
          round(expr("aggregate(transform(array_sort(collect_list(struct(word, term))), " +
            "x -> x.term), 0D, (acc, v) -> acc + v)"), 6).as("kl"))
        .orderBy("source")
    },

    // ---- per-doc unigram entropy: Shannon entropy of the doc's word
    //      distribution — the "how repetitive / how diverse" signal next
    //      to q46's duplicate fractions. ENTIRELY scan-local on the
    //      Spark side: sort the doc's words once and fold run lengths in
    //      a single pass (O(n log n) per doc vs O(n·distinct) for a
    //      filter-per-word formulation — measured 2.3 s → this). Both
    //      engines sum the per-word terms in sorted-word order, so the
    //      summation order is pinned cross-engine ----
    QueryDef.sql(
      "q81_token_entropy",
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), c AS (
        |  SELECT doc_id, len(ws) AS n_words, word, count(*) AS cnt
        |  FROM w, unnest(ws) AS t(word)
        |  GROUP BY doc_id, len(ws), word
        |), e AS (
        |  SELECT doc_id, n_words,
        |    list_sum(list((cnt * 1.0 / n_words) * ln(cnt * 1.0 / n_words)
        |      ORDER BY word)) AS negent
        |  FROM c GROUP BY doc_id, n_words)
        |SELECT doc_id, n_words, round(-negent, 6) AS entropy
        |FROM e ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // one-pass run-length fold over the sorted word array: the
      // accumulator carries (previous word, run length, entropy sum);
      // each run closes with its (c/n) ln(c/n) term in sorted-word
      // order — the same terms, same order as the oracle's ordered list
      // derive narrow, persist once, sort narrow — q30's SortShapes
      // shape: the run-length fold runs once and the range exchange
      // carries (doc_id, n_words, entropy), not the word arrays
      SortShapes.sortedNarrow(
      docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .select(col("doc_id"), size(col("ws")).as("n_words"),
          expr(
            """aggregate(array_sort(ws),
              |  struct(CAST(NULL AS string) AS prev, 0L AS run, CAST(0 AS double) AS acc),
              |  (st, x) -> CASE WHEN st.prev IS NULL OR x = st.prev
              |    THEN struct(x AS prev, st.run + 1L AS run, st.acc AS acc)
              |    ELSE struct(x AS prev, 1L AS run,
              |      st.acc + (st.run * CAST(1.0 AS double) / size(ws)) *
              |               ln(st.run * CAST(1.0 AS double) / size(ws)) AS acc) END,
              |  st -> st.acc + (st.run * CAST(1.0 AS double) / size(ws)) *
              |                 ln(st.run * CAST(1.0 AS double) / size(ws)))
              |""".stripMargin).as("negent"))
        .select(col("doc_id"), col("n_words"), round(-col("negent"), 6).as("entropy")),
      "doc_id")
    },

    // ---- PMI collocation mining: word pairs that co-occur in documents
    //      far more than chance — ln( p(a,b) / (p(a) p(b)) ) over
    //      doc-level presence, for pairs in >= 25 docs. Pair candidates
    //      come from each doc's DISTINCT word set (vocabulary-bounded,
    //      not length-bounded); counts are exact integers so the PMI is
    //      one ln of an integer ratio — identical in both engines ----
    QueryDef.sql(
      "q82_collocations",
      """WITH d AS (
        |  SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS us
        |  FROM documents
        |), n AS (SELECT count(*) AS nd FROM documents),
        |wf AS (
        |  SELECT unnest(us) AS w FROM d
        |), wc AS (
        |  SELECT w, count(*) AS cw FROM wf GROUP BY w
        |), pairs AS (
        |  SELECT doc_id, a.w1, b.w2 FROM (
        |    SELECT doc_id, unnest(us) AS w1, us FROM d) a,
        |    LATERAL (SELECT unnest(a.us) AS w2) b
        |  WHERE a.w1 < b.w2
        |), pc AS (
        |  SELECT w1, w2, count(*) AS cp FROM pairs GROUP BY w1, w2
        |)
        |SELECT w1, w2, cp,
        |  round(ln(cp * 1.0 * nd / (x.cw * 1.0 * y.cw)), 6) AS pmi
        |FROM pc JOIN wc x ON pc.w1 = x.w
        |        JOIN wc y ON pc.w2 = y.w
        |        CROSS JOIN n
        |WHERE cp >= 25
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin) { (s, dir) =>
      // ONE document scan and ONE exchange feed all three counts the PMI
      // needs: each doc emits its word pairs, a (w, NULL) marker per
      // distinct word, and a single (NULL, NULL) marker — so pair
      // support, word doc-frequency and the corpus doc count fall out of
      // the same partial-agg'd groupBy. The old shape scanned documents
      // once per count family (pair scan + word scan + a count() job),
      // recomputing the sort/distinct each time.
      // coalesce: a null-text doc has no words but still counts in nd
      // (the oracle's count(*)), so its (NULL, NULL) marker must emit
      val d = docs(s, dir)
        .select(col("doc_id"),
          coalesce(array_sort(array_distinct(split(col("text"), " ", -1))),
            expr("CAST(array() AS array<string>)")).as("us"))
      val emitted = d.select(explode(expr(
        "concat(" +
          "flatten(transform(us, (x, i) -> " +
          "  transform(slice(us, i + 2, size(us)), y -> struct(x AS w1, y AS w2)))), " +
          "transform(us, x -> struct(x AS w1, CAST(NULL AS string) AS w2)), " +
          "array(struct(CAST(NULL AS string) AS w1, CAST(NULL AS string) AS w2)))"))
        .as("p"))
        .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      // persisted: the count table is vocab-bounded (distinct pairs +
      // vocab + 1 marker row), and without the persist each of the three
      // consumers below re-plans the scan+explode+exchange — the filter
      // pushed below each branch's partial agg differs, so ReuseExchange
      // cannot fire across them and the expensive pair explode would run
      // three times
      val counts = graft.CacheRegistry.track(
        emitted.groupBy("w1", "w2").agg(count(lit(1)).as("c")).persist())
      val nd = counts.filter(col("w1").isNull && col("w2").isNull)
        .select(col("c").as("nd"))
      val wc = counts.filter(col("w1").isNotNull && col("w2").isNull)
        .select(col("w1").as("w"), col("c").as("cw"))
      val pc = counts.filter(col("w2").isNotNull && col("c") >= 25)
        .select(col("w1"), col("w2"), col("c").as("cp"))
      pc.join(broadcast(wc.withColumnRenamed("w", "w1").withColumnRenamed("cw", "cwa")), "w1")
        .join(broadcast(wc.withColumnRenamed("w", "w2").withColumnRenamed("cw", "cwb")), "w2")
        .join(broadcast(nd))
        .select(col("w1"), col("w2"), col("cp"),
          round(log(col("cp") * lit(1.0) * col("nd") / (col("cwa") * lit(1.0) * col("cwb"))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(50)
    },

    // ---- z-score anomaly detection: events whose value is > 3 rounded
    //      population stddevs from its event_type's rounded mean. Moments
    //      are rounded to 6dp BEFORE the compare (the centroid
    //      discipline), so both engines flag the identical rows ----
    QueryDef.sql(
      "q72_value_anomalies",
      """WITH s AS (
        |  SELECT event_type, round(avg(value), 6) AS mu,
        |    round(stddev_pop(value), 6) AS sd
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_id, e.event_type, e.value,
        |  round((e.value - mu) / sd, 3) AS z
        |FROM events e JOIN s ON e.event_type = s.event_type
        |WHERE abs(e.value - mu) > 3 * sd
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "events")
      val stats = e.groupBy("event_type")
        .agg(round(avg("value"), 6).as("mu"),
          round(stddev_pop(col("value")), 6).as("sd"))
      e.join(broadcast(stats), "event_type")
        .filter(abs(col("value") - col("mu")) > lit(3) * col("sd"))
        .select(col("event_id"), col("event_type"), col("value"),
          round((col("value") - col("mu")) / col("sd"), 3).as("z"))
        .orderBy("event_id")
    },

    // ---- per-user event-type transition matrix: counts and total gap
    //      time for every consecutive (from → to) pair in each user's
    //      event-time-ordered stream — the Markov-chain primitive behind
    //      behavioral modeling and bot detection. ONE user_id shuffle
    //      (the lag window), then a ≤ |types|² aggregate; gaps stay
    //      exact microsecond longs, so no float summation to pin ----
    QueryDef.sql(
      "q86_event_transitions",
      """WITH s AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tus,
        |    lag(event_type) OVER w AS from_type,
        |    lag(epoch_us(ts)) OVER w AS prev_tus
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |)
        |SELECT from_type, event_type AS to_type, count(*) AS n,
        |  sum(tus - prev_tus)::BIGINT AS sum_gap_us
        |FROM s WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      eventsUs(s, dir)
        .select(col("user_id"), col("event_type"), col("tus"), col("event_id"))
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .withColumn("prev_tus", lag(col("tus"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"), sum(col("tus") - col("prev_tus")).as("sum_gap_us"))
        .orderBy("from_type", "to_type")
    },

    // ---- graded retrieval evaluation: MRR and nDCG@10 of the exact
    //      cosine ranking, with same-label as the (binary) relevance
    //      judgment — the companion metric to q70's recall@k (rank
    //      POSITION matters here: a relevant hit at rank 1 is worth
    //      ~3.5× one at rank 10). IDCG uses the full relevance set
    //      (per-label corpus count minus self, capped at 10), i.e.
    //      textbook nDCG, so a query whose label has <10 members is
    //      not penalized for unfillable ranks.
    //
    //      Scale shape: the ranking side is q38's broadcast-queries ×
    //      corpus linear scan with per-partition WindowGroupLimit — the
    //      corpus is never shuffled; per-query metric rows are nq-
    //      bounded; label counts are a k-key broadcast agg.
    //
    //      Determinism: per-rank DCG gains are round(1e6/log2(rk+1))
    //      integers summed exactly as BIGINT (none of the 10 constants
    //      sits near a .5 boundary, so a last-ulp log2 divergence
    //      cannot flip the rounding); MRR divides two small exact ints;
    //      nDCG divides two BIGINTs — identical doubles both engines. ----
    QueryDef.sql(
      "q96_retrieval_ndcg",
      """WITH q AS (
        |  SELECT vec_id AS qid, label AS qlabel, embedding AS qv
        |  FROM embeddings WHERE vec_id < 10
        |), scored AS (
        |  SELECT q.qid, q.qlabel, e.vec_id,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |        i -> (q.qv[i]::DOUBLE) * (e.embedding[i]::DOUBLE))) /
        |      (sqrt(list_sum(list_transform(q.qv, x -> (x::DOUBLE) * (x::DOUBLE)))) *
        |       sqrt(list_sum(list_transform(e.embedding, x -> (x::DOUBLE) * (x::DOUBLE))))),
        |      6) AS cos,
        |    CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
        |  FROM q JOIN embeddings e ON e.vec_id != q.qid
        |), t10 AS (
        |  SELECT * FROM (
        |    SELECT qid, qlabel, rel,
        |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rk
        |    FROM scored) WHERE rk <= 10
        |), perq AS (
        |  SELECT qid, qlabel, sum(rel)::BIGINT AS n_rel10,
        |    sum(round(1e6 * rel / log2(rk + 1)))::BIGINT AS dcg_u,
        |    min(CASE WHEN rel = 1 THEN rk END) AS frk
        |  FROM t10 GROUP BY qid, qlabel
        |), lc AS (
        |  SELECT label, count(*) AS nlab FROM embeddings GROUP BY label
        |), f AS (
        |  SELECT qid, n_rel10, frk, dcg_u,
        |    CASE WHEN nlab > 1 THEN round(1e6 * list_sum(list_transform(
        |      generate_series(1, least(10, nlab - 1)),
        |      i -> 1.0 / log2(i + 1))))::BIGINT END AS idcg_u
        |  FROM perq JOIN lc ON lc.label = perq.qlabel)
        |SELECT qid, n_rel10,
        |  COALESCE(round(1.0::DOUBLE / frk, 4), 0.0) AS mrr,
        |  dcg_u, idcg_u,
        |  round(dcg_u::DOUBLE / idcg_u, 4) AS ndcg
        |FROM f ORDER BY qid""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("nrm", expr("norm_f32(embedding)"))
      val labCnt = e.groupBy(col("label")).agg(count(lit(1)).as("nlab"))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("label").as("qlabel"),
          col("embedding").as("qv"), col("nrm").as("qn"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("qid"))
        .select(col("qid"), col("qlabel"),
          round(expr("dot_f32(qv, embedding)") / (col("qn") * col("nrm")), 6).as("cos"),
          col("vec_id"),
          when(col("label") === col("qlabel"), 1).otherwise(0).as("rel"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      val t10 = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      val perq = t10.groupBy(col("qid"), col("qlabel"))
        .agg(sum(col("rel")).cast("long").as("n_rel10"),
          sum(round(lit(1e6) * col("rel") / log2(col("rk") + 1))).cast("long").as("dcg_u"),
          min(when(col("rel") === 1, col("rk"))).as("frk"))
      perq.join(broadcast(labCnt), col("label") === col("qlabel"))
        .withColumn("idcg_u", expr(
          // nlab = 1 means the query's relevance set (label members
          // minus self) is EMPTY: Spark's sequence(1, 0) auto-steps
          // DOWNWARD to [1, 0] (it is not empty like DuckDB's
          // generate_series(1, 0)), and 1/log2(0+1) is Infinity — so
          // the degenerate case must be guarded to NULL explicitly,
          // matching the oracle's NULL-idcg semantics for an empty
          // relevance set.
          """CASE WHEN nlab > 1 THEN cast(round(1e6 * aggregate(
            |  sequence(1L, least(10L, nlab - 1)),
            |  cast(0 as double), (acc, i) -> acc + 1.0 / log2(i + 1))) as long)
            |END""".stripMargin))
        .select(col("qid"), col("n_rel10"),
          coalesce(round(lit(1.0) / col("frk"), 4), lit(0.0)).as("mrr"),
          col("dcg_u"), col("idcg_u"),
          round(col("dcg_u").cast("double") / col("idcg_u"), 4).as("ndcg"))
        .orderBy("qid")
    },

    // ---- link-analysis centrality: 3 PageRank iterations (d = 0.85)
    //      over the co-purchase MULTI-graph — parts are linked once per
    //      co-occurrence in an order, so edge multiplicity IS the
    //      affinity weight (weighted PageRank without materializing
    //      weights, and without the DISTINCT shuffle an unweighted
    //      graph would cost). The iterative join-agg operator family
    //      (the web-graph quality signal of CommonCrawl-style curation,
    //      same plan shape as label propagation), complementing q50's
    //      connected components.
    //
    //      Scale shape: the oracle states edges as a self-join; the
    //      plan builds them in ONE fact-table scan — collect_list per
    //      order (groups are order-sized, bounded) then in-row pair
    //      expansion, exploded scan-local — one shuffle on the order
    //      key instead of two scan+shuffle join sides. The destination
    //      degree is attached to the persisted edge table ONCE
    //      (edges(src, dst, dst_deg)) and the node state carries
    //      contrib = r div deg, so every iteration is exactly ONE join
    //      (edges ⋈ state on src) + one map-side-partial aggregate on
    //      dst — no per-step degree re-attach. Node state is the parts
    //      DIMENSION (bounded, ≪ edges); while it fits
    //      [[Mining.PagerankBroadcastNodeLimit]] it is broadcast (the
    //      k-means/q56 discipline). Past that limit — web-scale graphs
    //      where node state outgrows a broadcast — the SAME step runs
    //      as a shuffle join against the edge table pre-partitioned by
    //      src at persist time, so the edge side is exchanged once for
    //      all iterations and only the (node, contrib) state shuffles
    //      per step. Both modes are pinned in PlanSpec.
    //
    //      Determinism: ranks live in integer 1e-9 units; every step is
    //      integer arithmetic (div truncation, exact BIGINT sums) — the
    //      two engines are BIT-IDENTICAL with no float anywhere, so no
    //      summation-order or libm concern exists at all. Dangling
    //      nodes cannot occur (the graph is symmetric by construction:
    //      every node has deg >= 1 in both directions). ----
    QueryDef.sql(
      "q97_copurchase_pagerank",
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |), e AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
        |), deg AS (
        |  SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src
        |), c AS (
        |  SELECT (1000000000 // count(*))::BIGINT AS r_init,
        |    ((15 * (1000000000 // count(*))) // 100)::BIGINT AS base
        |  FROM deg
        |), r0 AS (
        |  SELECT src AS node, deg, r_init AS r FROM deg, c
        |), r1 AS (
        |  SELECT e.dst AS node, min(d2.deg) AS deg,
        |    (min(c.base) + (85 * sum(r0.r // r0.deg)) // 100)::BIGINT AS r
        |  FROM e JOIN r0 ON r0.node = e.src JOIN deg d2 ON d2.src = e.dst, c
        |  GROUP BY e.dst
        |), r2 AS (
        |  SELECT e.dst AS node, min(d2.deg) AS deg,
        |    (min(c.base) + (85 * sum(r1.r // r1.deg)) // 100)::BIGINT AS r
        |  FROM e JOIN r1 ON r1.node = e.src JOIN deg d2 ON d2.src = e.dst, c
        |  GROUP BY e.dst
        |), r3 AS (
        |  SELECT e.dst AS node, min(d2.deg) AS deg,
        |    (min(c.base) + (85 * sum(r2.r // r2.deg)) // 100)::BIGINT AS r
        |  FROM e JOIN r2 ON r2.node = e.src JOIN deg d2 ON d2.src = e.dst, c
        |  GROUP BY e.dst)
        |SELECT node AS part_id, deg, r AS rank_u FROM r3
        |ORDER BY rank_u DESC, part_id LIMIT 100""".stripMargin) { (s, dir) =>
      pagerank(s, dir, PagerankBroadcastNodeLimit)
    }
  )

  /** Nodes up to this count keep the per-iteration state join a
    * broadcast (state rows are 4 longs ≈ 32 B + overhead → well under
    * executor broadcast budgets at 4M); larger graphs switch to the
    * pre-partitioned shuffle-join step. Package-visible so PlanSpec can
    * pin BOTH modes on the same data. */
  private[queries] val PagerankBroadcastNodeLimit = 4000000L

  private[queries] def pagerank(
      s: SparkSession, dir: String, broadcastNodeLimit: Long): DataFrame = {
    // one-year co-shipment window: bounds the graph like a real
    // recent-window affinity computation (and the filter pushes to
    // the parquet scan)
    val li = Tables.load(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_partkey"))
    // all ordered (src, dst) occurrence pairs with differing part
    // values — the exact multiset the oracle's self-join produces —
    // from ONE scan: per-order part list, expanded in-row
    val edgesRaw = graft.CacheRegistry.track(
      li.groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_partkey")).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, x ->
            |  transform(filter(ps, y -> y != x),
            |            y -> named_struct('src', x, 'dst', y))))""".stripMargin))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist())
    val deg = graft.CacheRegistry.track(
      edgesRaw.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist())
    // the integer constants are a bounded driver sync (the q56 k-means
    // discipline): n = node count, known once deg is cached. Bench's
    // [bench-stage] per-stage wall/GC trace already attributes any
    // edge-build outlier (each iteration's aggregate is its own stage),
    // so no query-body instrumentation is needed here.
    val n = deg.count()
    require(n > 0, "q97: no co-purchase edges in the ship window")
    val bcastState = n <= broadcastNodeLimit
    val rInit = 1000000000L / n
    val base = (15L * rInit) / 100L
    // dst-side degree rides the persisted edge table (attached ONCE;
    // the graph is symmetric so deg keyed by src covers every dst) —
    // iterations never touch `deg` again. Fallback mode pre-partitions
    // by src at persist time: the cached partitioning satisfies every
    // iteration's join distribution, so only the per-step state — the
    // small side — moves.
    val degAsDst0 = deg.select(col("src").as("dst"), col("deg").as("dst_deg"))
    val degAsDst = if (bcastState) broadcast(degAsDst0) else degAsDst0
    val edgesWithDeg0 = edgesRaw.join(degAsDst, "dst")
      .select(col("src"), col("dst"), col("dst_deg"))
    // fallback layout: explicit partition count so AQE cannot re-shape
    // it, and an eager materialization so every iteration PLANS against
    // the known cached partitioning (a lazily-cached AQE plan reports
    // unknown partitioning and each step would re-exchange the edges)
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = graft.CacheRegistry.track(
      (if (bcastState) edgesWithDeg0
       else edgesWithDeg0.repartition(nPart, col("src"))).persist())
    if (!bcastState) edges.count(): Unit
    // state carries contrib = r div deg, so the step needs no source-
    // side degree either: ONE join + one partial-final agg per iteration
    val r0 = deg.select(col("src").as("node"), col("deg"), lit(rInit).as("r"))
      .withColumn("contrib", expr("r div deg"))
    def step(r: DataFrame): DataFrame = {
      val state0 = r.select(col("node").as("src"), col("contrib"))
      // fallback: state is the SHUFFLED HASH build side — the cached
      // edge partitioning already satisfies the join's distribution
      // (set spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
      // =false so the cache exposes it), and hash build beats sort-
      // merge here because the edge side never needs sorting
      val state = if (bcastState) broadcast(state0) else state0.hint("shuffle_hash")
      edges.join(state, "src")
        .groupBy(col("dst"), col("dst_deg"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"), col("dst_deg").as("deg"),
          (lit(base) + expr("cast((85 * s) div 100 as long)")).as("r"))
        .withColumn("contrib", expr("r div deg"))
    }
    val r3 = step(step(step(r0)))
    r3.select(col("node").as("part_id"), col("deg"), col("r").as("rank_u"))
      .orderBy(col("rank_u").desc, col("part_id"))
      .limit(100)
  }
}
