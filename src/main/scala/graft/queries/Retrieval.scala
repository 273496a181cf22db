package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 3: training-example packing, BM25 retrieval scoring,
  * pivot, and curriculum phase assignment.
  *
  * Scale notes (100 TB):
  *  - q75 is one window shuffle per source (cumulative token sum in
  *    doc_id order) followed by a narrow (source, bin) re-agg — the
  *    standard greedy concat-packing pass that turns documents into
  *    fixed-length training sequences;
  *  - q76 is the retrieval sweet spot: per-term tfs come from
  *    scan-local array filters (NO token explode), corpus stats (N,
  *    avgdl, per-term dfs) are ONE 1-row aggregate broadcast back, and
  *    the top-k plans as TakeOrderedAndProject — a single corpus pass
  *    end to end;
  *  - q77 reuses q64's bigram scorer verbatim, then adds one window
  *    (per-source ntile) and a 4×sources-key agg — difficulty-phased
  *    curriculum split at the cost of one extra narrow shuffle.
  */
object Retrieval {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.load(s, dir, "documents")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- greedy sequence packing, distributed the way real packers
    //      shard it: docs are routed to 16 deterministic shards per
    //      source (doc_id mod 16) and each shard packs ITS slice into
    //      2048-token bins by cumulative sum — a doc's bin is where its
    //      first token lands. A single per-source window would serialize
    //      each source through one task (20 sources = 20 tasks at any
    //      corpus size); sharding keeps every core busy and costs only
    //      one partial tail bin per shard. Pure integer arithmetic ----
    QueryDef.sql(
      "q75_sequence_pack",
      """WITH w AS (
        |  SELECT doc_id, source, doc_id % 16 AS shard,
        |    len(string_split(text, ' ')) AS nw
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, shard, nw,
        |    sum(nw) OVER (PARTITION BY source, shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM w
        |)
        |SELECT source, shard, ((cum - nw) // 2048)::BIGINT AS bin,
        |  count(*) AS n_docs, sum(nw)::BIGINT AS n_tokens
        |FROM c GROUP BY source, shard, bin
        |ORDER BY source, shard, bin""".stripMargin) { (s, dir) =>
      val win = Window.partitionBy(col("source"), col("shard"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          (col("doc_id") % 16).as("shard"),
          size(split(col("text"), " ", -1)).as("nw"))
        .withColumn("cum", sum(col("nw")).over(win))
        .groupBy(col("source"), col("shard"),
          expr("(cum - nw) div 2048").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_tokens"))
        .orderBy("source", "shard", "bin")
    },

    // ---- tokenize-and-pack: the actual FINAL stage of a training-data
    //      pipeline, end to end — BPE-encode every document to token
    //      ids (q87's priority-merge kernel + a fixed vocabulary: ids
    //      1..26 for 'a'..'z', 26+rank for each merge's output token)
    //      and greedily concat-pack the id streams into fixed 2048-
    //      token bins with per-document boundary offsets (q75's
    //      sharded cumulative-sum packing over REAL token counts
    //      instead of whitespace words). Per doc: its id-array digest
    //      (sum + first/last id pin the id assignment end to end) and
    //      its (bin, bin_offset) placement.
    //
    //      Scale shape: tokenization + id mapping are scan-local
    //      (bpe_segment kernel + array transforms — no explode, no
    //      vocabulary join: the vocabulary is a 42-entry plan
    //      literal); packing is ONE window shuffle over 16
    //      deterministic shards (q75's discipline — a single global
    //      window would serialize the corpus through one task); no
    //      joins anywhere. The oracle replays the BPE with q87's
    //      recursive fixpoint-replacement formulation and the same
    //      closed-form vocabulary. ----
    {
      import graft.functions.BpeOps.defaultMerges
      val mergeRows = defaultMerges.zipWithIndex.map { case ((a, b), i) =>
        s"(${i + 1},'|$a|$b|','|$a$b|')"
      }.mkString(",")
      val m = defaultMerges.length
      val mergeArr = defaultMerges.map { case (a, b) => s"'$a $b'" }.mkString(",")
      val produced = defaultMerges.map { case (a, b) => s"'$a$b'" }.mkString(",")
      def duckId(t: String): String =
        s"CASE WHEN length($t) = 1 THEN ascii($t) - 96 " +
          s"ELSE 26 + list_position([$produced], $t) END"
      QueryDef.sql(
        "q118_tokenize_pack",
        s"""WITH RECURSIVE merges(i, pat, rep) AS (
           |  SELECT * FROM (VALUES $mergeRows) t(i, pat, rep)
           |),
           |prep AS (
           |  SELECT doc_id,
           |    '|' || replace(regexp_replace(lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')),
           |                                  '([a-z])', '\\1|', 'g'),
           |                   ' ', ' |') AS s
           |  FROM documents
           |),
           |bpe(doc_id, s, i) AS (
           |  SELECT doc_id, s, 1 FROM prep
           |  UNION ALL
           |  SELECT b.doc_id, replace(b.s, m.pat, m.rep),
           |         CASE WHEN replace(b.s, m.pat, m.rep) = b.s THEN b.i + 1 ELSE b.i END
           |  FROM bpe b JOIN merges m ON m.i = b.i
           |  WHERE b.i <= $m
           |),
           |tok AS (
           |  SELECT doc_id, list_filter(string_split(s, '|'),
           |                             x -> regexp_matches(x, '^[a-z]+$$')) AS ts
           |  FROM bpe WHERE i = $m + 1
           |),
           |ids AS (
           |  SELECT doc_id, len(ts)::BIGINT AS n_tokens,
           |    coalesce(list_sum(list_transform(ts, t -> ${duckId("t")})), 0)::BIGINT AS id_sum,
           |    (CASE WHEN len(ts) = 0 THEN NULL ELSE ${duckId("ts[1]")} END)::INT AS first_id,
           |    (CASE WHEN len(ts) = 0 THEN NULL ELSE ${duckId("ts[-1]")} END)::INT AS last_id
           |  FROM tok
           |),
           |c AS (
           |  SELECT *, doc_id % 16 AS shard,
           |    sum(n_tokens) OVER (PARTITION BY doc_id % 16 ORDER BY doc_id
           |      ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM ids
           |)
           |SELECT doc_id, shard, n_tokens, id_sum, first_id, last_id,
           |  ((cum - n_tokens) // 2048)::BIGINT AS bin,
           |  ((cum - n_tokens) % 2048)::BIGINT AS bin_offset
           |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
        def sparkId(t: String): String =
          s"CASE WHEN length($t) = 1 THEN ascii($t) - 96 " +
            s"ELSE 26 + cast(array_position(array($produced), $t) as int) END"
        val win = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs(s, dir)
          .select(col("doc_id"),
            expr(
              s"""transform(
                 |  flatten(transform(
                 |    filter(split(lower(regexp_replace(text, '[^A-Za-z]+', ' ')), ' '),
                 |           x -> x != ''),
                 |    w -> bpe_segment(w, array($mergeArr)))),
                 |  t -> ${sparkId("t")})""".stripMargin).as("ids"))
          .select(col("doc_id"),
            size(col("ids")).cast("long").as("n_tokens"),
            expr("aggregate(ids, cast(0 as bigint), (a, x) -> a + x)").as("id_sum"),
            expr("CASE WHEN size(ids) = 0 THEN CAST(NULL AS INT) ELSE element_at(ids, 1) END")
              .as("first_id"),
            expr("CASE WHEN size(ids) = 0 THEN CAST(NULL AS INT) ELSE element_at(ids, -1) END")
              .as("last_id"))
          .withColumn("shard", col("doc_id") % 16)
          .withColumn("cum", sum(col("n_tokens")).over(win))
          .select(col("doc_id"), col("shard"), col("n_tokens"), col("id_sum"),
            col("first_id"), col("last_id"),
            expr("(cum - n_tokens) div 2048").as("bin"),
            ((col("cum") - col("n_tokens")) % 2048).as("bin_offset"))
          .orderBy("doc_id")
      }
    },

    // ---- BM25 scoring (k1=1.2, b=0.75, Lucene idf) for a fixed 3-term
    //      query, top 20 docs. Per-term tf via scan-local array filters;
    //      corpus stats are one 1-row agg broadcast back ----
    QueryDef.sql(
      "q76_bm25",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), f AS (
        |  SELECT doc_id, len(ws) AS dl,
        |    len(list_filter(ws, x -> x = 'spark')) AS tf1,
        |    len(list_filter(ws, x -> x = 'table')) AS tf2,
        |    len(list_filter(ws, x -> x = 'query')) AS tf3
        |  FROM d
        |), g AS (
        |  SELECT count(*) AS n, sum(dl) * 1.0 / count(*) AS avgdl,
        |    sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
        |    sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2,
        |    sum(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS df3
        |  FROM f
        |), scored AS (
        |  SELECT doc_id,
        |    round(
        |      ln((g.n - df1 + 0.5) / (df1 + 0.5) + 1) * (tf1 * 2.2) /
        |        (tf1 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
        |      ln((g.n - df2 + 0.5) / (df2 + 0.5) + 1) * (tf2 * 2.2) /
        |        (tf2 + 1.2 * (0.25 + 0.75 * dl / avgdl)) +
        |      ln((g.n - df3 + 0.5) / (df3 + 0.5) + 1) * (tf3 * 2.2) /
        |        (tf3 + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        |  FROM f, g)
        |SELECT doc_id, bm25 FROM scored
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin) { (s, dir) =>
      def tf(term: String) = expr(s"size(filter(ws, x -> x = '$term'))")
      val f = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ", -1).as("ws"))
        .select(col("doc_id"), size(col("ws")).as("dl"),
          tf("spark").as("tf1"), tf("table").as("tf2"), tf("query").as("tf3"))
      val g = f.groupBy().agg(
        count(lit(1)).as("n"),
        (sum(col("dl")) * lit(1.0) / count(lit(1))).as("avgdl"),
        sum(when(col("tf1") > 0, 1).otherwise(0)).as("df1"),
        sum(when(col("tf2") > 0, 1).otherwise(0)).as("df2"),
        sum(when(col("tf3") > 0, 1).otherwise(0)).as("df3"))
      def part(tfc: String, dfc: String) =
        log((col("n") - col(dfc) + 0.5) / (col(dfc) + 0.5) + 1) *
          (col(tfc) * 2.2) /
          (col(tfc) + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      f.crossJoin(broadcast(g))
        .select(col("doc_id"),
          round(part("tf1", "df1") + part("tf2", "df2") + part("tf3", "df3"), 4)
            .as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(20)
    },

    // ---- PIVOT: per-user event-type activity matrix via the Dataset
    //      pivot API (explicit value list => no extra distinct-values
    //      job and a fixed output schema — the only safe form at scale;
    //      an unlisted pivot must first scan for distinct keys). The
    //      oracle states the identical conditional-aggregation form ----
    QueryDef.sql(
      "q78_pivot",
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // ---- UNPIVOT: melt the q78 activity matrix back to long form with
    //      the unpivot API (codegen'd Expand, one output row per cell,
    //      no shuffle beyond q78's own agg). Dropping empty cells makes
    //      the roundtrip equal the direct GROUP BY — which is exactly
    //      what the oracle states, so pivot∘unpivot is self-validating.
    //      NOTE the pivot value list is coupled to the five event_type
    //      values the events generator emits (same coupling as q78); the
    //      oracle is a dynamic GROUP BY, so a new event_type in the data
    //      would surface as an oracle mismatch here — by design, not
    //      silently dropped ----
    QueryDef.sql(
      "q80_unpivot",
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          Array(col("view"), col("click"), col("purchase"), col("signup"), col("error")),
          "event_type", "n")
        .filter(col("n") > 0)
        .orderBy("user_id", "event_type")
    },

    // ---- RANGE-frame window: each event's trailing-1-hour activity for
    //      its user — a VALUE-based frame (all rows within 3600s of
    //      event time), not a ROWS frame; the sliding-exposure feature
    //      behind rate limiting and engagement scoring. One shuffle on
    //      user_id; the frame is computed by Spark's running-window
    //      machinery without re-scanning the hour per row ----
    QueryDef.sql(
      "q79_range_window",
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS tus, value FROM events
        |)
        |SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 2) AS val_1h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY tus
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-3600000000L, Window.currentRow)
      Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("tus"), col("value"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("val_1h", round(sum(col("value")).over(w), 2))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("val_1h"))
        .orderBy("event_id")
    },

    // ---- curriculum phases: quartile docs by q64's bigram-LM mean
    //      log-prob within each source (phase 1 = most predictable) and
    //      summarize each phase — the difficulty schedule feeding
    //      curriculum training. Reuses q64 verbatim, Spark and oracle ----
    {
      val lm = Quality.defs.find(_.name == "q64_bigram_lm").get
      QueryDef.sql(
        "q77_curriculum",
        s"""WITH lm AS (
           |${lm.oracle.get}
           |), d AS (
           |  SELECT source, lm.doc_id, mean_logp FROM lm
           |  JOIN documents ON documents.doc_id = lm.doc_id
           |), p AS (
           |  SELECT source, doc_id, mean_logp,
           |    ntile(4) OVER (PARTITION BY source
           |      ORDER BY mean_logp DESC, doc_id) AS phase
           |  FROM d)
           |SELECT source, phase, count(*) AS n_docs,
           |  floor(sum(round(mean_logp * 10000)::BIGINT)::DOUBLE / count(*)) / 10000.0
           |    AS phase_logp
           |FROM p GROUP BY source, phase ORDER BY source, phase""".stripMargin) { (s, dir) =>
        val scored = lm.fn(s, dir).select(col("doc_id"), col("mean_logp"))
        val d = docs(s, dir).select(col("doc_id"), col("source"))
          .join(scored, "doc_id")
        val w = Window.partitionBy(col("source"))
          .orderBy(col("mean_logp").desc, col("doc_id"))
        d.withColumn("phase", ntile(4).over(w))
          .groupBy(col("source"), col("phase"))
          .agg(count(lit(1)).as("n_docs"),
            // mean_logp is 4dp-rounded by q64: scale to integer 1e-4
            // units and sum EXACTLY (order-free) — avg(double) would sum
            // in engine-specific order and can flip the 4th decimal.
            // The mean then lands back on the 1e-4 grid via floor, NOT
            // round: sum/n can be an exact .5 in grid units (e.g.
            // -203787/6) and round-half behavior differs cross-engine,
            // while 0.5 is binary-exact so floor agrees everywhere
            (floor(sum(round(col("mean_logp") * 10000).cast("long"))
              .cast("double") / count(lit(1))) / lit(10000.0)).as("phase_logp"))
          .orderBy("source", "phase")
      }
    }
  )
}
