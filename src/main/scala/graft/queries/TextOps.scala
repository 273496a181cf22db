package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table (doc_id, text, lang, source, n_chars).
  *
  * Every operator is a deterministic, engine-agnostic formula so the
  * DuckDB oracle can replicate it exactly (md5 is the only hash both
  * engines share). All plans are narrow (no shuffle except the final
  * ORDER BY; aggregations are partial+final) — at 100 TB these run as a
  * single scan-project pipeline per document partition.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting: whitespace + a BPE-ish word/punct regex ----
    QueryDef.sql(
      "q30_token_count",
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS bpe_tokens,
        |  length(text) AS n_chars2
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // derive narrow, persist once, sort the narrow rows (SortShapes):
      // the regex passes run once AND the range exchange carries four
      // small columns instead of the corpus text
      SortShapes.sortedNarrow(
        docs(s, dir).select(
          col("doc_id"),
          size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
          size(expr("regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\\\s]', 0)"))
            .as("bpe_tokens"),
          length(col("text")).as("n_chars2")),
        "doc_id")
    },

    // ---- quality scoring: length / punctuation / stopword ratios ----
    QueryDef.sql(
      "q31_quality",
      """WITH t AS (
        |  SELECT doc_id, length(text) AS n,
        |    len(string_split(text, ' ')) AS n_words,
        |    len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS n_stop
        |  FROM documents)
        |SELECT doc_id,
        |  round(n_punct * 1.0 / n_words, 4) AS punct_ratio,
        |  round(n_stop * 1.0 / n_words, 4) AS stop_ratio,
        |  round(n * 1.0 / n_words, 4) AS avg_word_len,
        |  CASE WHEN n_words BETWEEN 20 AND 1000
        |        AND n_stop * 1.0 / n_words >= 0.01 THEN 1 ELSE 0 END AS quality_ok
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // derive narrow, persist once, sort narrow — q30's SortShapes shape
      SortShapes.sortedNarrow(
        docs(s, dir)
          .select(
            col("doc_id"),
            length(col("text")).as("n"),
            size(split(col("text"), " ", -1)).as("n_words"),
            size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).as("n_punct"),
            size(expr("regexp_extract_all(lower(text), '\\\\b(the|a|of|and|to|in|is|that)\\\\b', 0)"))
              .as("n_stop"))
          .select(
            col("doc_id"),
            round(col("n_punct") * 1.0 / col("n_words"), 4).as("punct_ratio"),
            round(col("n_stop") * 1.0 / col("n_words"), 4).as("stop_ratio"),
            round(col("n") * 1.0 / col("n_words"), 4).as("avg_word_len"),
            when(col("n_words").between(20, 1000) &&
              col("n_stop") * 1.0 / col("n_words") >= 0.01, 1).otherwise(0).as("quality_ok")),
        "doc_id")
    },

    // ---- language ID: marker-token + script heuristic (deterministic
    //      n-gram-style scorer; the synthetic corpus is English word-salad,
    //      so the oracle checks the FORMULA, not the planted label) ----
    QueryDef.sql(
      "q32_lang_id",
      """WITH sc AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(lower(text), '\b(the|of|and|is|to)\b')) AS en_hits,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist)\b')) AS de_hits,
        |    len(regexp_extract_all(lower(text), '\b(el|la|los|es|y)\b')) AS es_hits,
        |    len(regexp_extract_all(lower(text), '\b(le|la|les|est|et)\b')) AS fr_hits,
        |    len(regexp_extract_all(text, '[一-鿿]')) AS cjk_chars
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN cjk_chars > 0 THEN 'zh'
        |       WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  en_hits, de_hits, es_hits, fr_hits, cjk_chars
        |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      def hits(pat: String) =
        size(expr(s"regexp_extract_all(lower(text), '\\\\b($pat)\\\\b', 0)"))
      // derive narrow, persist once, sort narrow — q30's SortShapes shape
      SortShapes.sortedNarrow(
        docs(s, dir)
          .select(
            col("doc_id"),
            hits("the|of|and|is|to").as("en_hits"),
            hits("der|die|das|und|ist").as("de_hits"),
            hits("el|la|los|es|y").as("es_hits"),
            hits("le|la|les|est|et").as("fr_hits"),
            size(expr("regexp_extract_all(text, '[\\\\u4e00-\\\\u9fff]', 0)")).as("cjk_chars"))
          .select(
            col("doc_id"),
            when(col("cjk_chars") > 0, "zh")
              .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("es_hits") &&
                col("en_hits") >= col("fr_hits"), "en")
              .when(col("de_hits") >= col("es_hits") && col("de_hits") >= col("fr_hits"), "de")
              .when(col("es_hits") >= col("fr_hits"), "es")
              .otherwise("fr").as("pred_lang"),
            col("en_hits"), col("de_hits"), col("es_hits"), col("fr_hits"), col("cjk_chars")),
        "doc_id")
    },

    // ---- document fingerprinting: content hash of the normalized text
    //      + an order-insensitive vocabulary fingerprint ----
    QueryDef.sql(
      "q33_fingerprint",
      """SELECT doc_id,
        |  md5(lower(trim(text))) AS content_fp,
        |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS vocab_fp
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // derive narrow, persist once, sort narrow — q30's SortShapes shape
      SortShapes.sortedNarrow(
        docs(s, dir).select(
          col("doc_id"),
          md5(lower(trim(col("text")))).as("content_fp"),
          md5(array_join(array_sort(array_distinct(split(lower(col("text")), " "))), " "))
            .as("vocab_fp")),
        "doc_id")
    },

    // ---- winnowing fingerprints: Rabin-Karp rolling hash (k=8, base 31,
    //      mod 1e9+7) + sliding-window-of-4 minima, distinct — the
    //      MOSS-style rolling-hash document fingerprint. The native
    //      `winnow64` kernel uses the O(n) rolling update; the oracle
    //      states the O(n·k) direct sum (algebraically identical). ----
    QueryDef.sql(
      "q44_winnow_fingerprint",
      """WITH h AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(text) - 7), i ->
        |      list_sum(list_transform(generate_series(0, 7), j ->
        |        ascii(substr(text, i + j, 1)) * (31 ** (7 - j))))::BIGINT % 1000000007) AS hs
        |  FROM documents),
        |w AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(generate_series(1, len(hs) - 3), p ->
        |      list_min(hs[p:p+3]))) AS fps
        |  FROM h)
        |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS fp_min,
        |  list_max(fps) AS fp_max,
        |  list_sum(fps)::BIGINT % 1000000007 AS fp_digest
        |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      // derive narrow, persist once, sort narrow — q30's SortShapes shape
      // (the intermediate fps array stays below the persist; only the
      // four stats ride the cache and the exchange)
      SortShapes.sortedNarrow(
        docs(s, dir)
          .select(col("doc_id"), expr("winnow64(text)").as("fps"))
          .select(
            col("doc_id"),
            size(col("fps")).as("n_fp"),
            expr("array_min(fps)").as("fp_min"),
            expr("array_max(fps)").as("fp_max"),
            expr("aggregate(fps, CAST(0 AS bigint), (a, x) -> a + x) % 1000000007")
              .as("fp_digest")),
        "doc_id")
    },

    // ---- exact deduplication: hash-groupBy on the content fingerprint.
    //      Map-side partial agg makes this one shuffle of (hash → count);
    //      at 100 TB this is THE cheapest dedup and runs first. ----
    QueryDef.sql(
      "q34_dedup_exact",
      """WITH fp AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS content_fp FROM documents)
        |SELECT content_fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM fp GROUP BY content_fp
        |ORDER BY content_fp""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), md5(lower(trim(col("text")))).as("content_fp"))
        .groupBy("content_fp")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("content_fp")
    },

    // ---- REAL tokenizer-fidelity token counting: priority BPE over a
    //      rank-ordered merges table (the `bpe_count` native kernel —
    //      scan-local, table compiled once per plan; see BpeFunctions
    //      for the equivalence argument that also makes the oracle's
    //      recursive iterated-replacement formulation exact) ----
    {
      import graft.functions.BpeOps.defaultMerges
      val mergeRows = defaultMerges.zipWithIndex.map { case ((a, b), i) =>
        s"(${i + 1},'|$a|$b|','|$a$b|')"
      }.mkString(",")
      val m = defaultMerges.length
      val mergeArr = defaultMerges.map { case (a, b) => s"'$a $b'" }.mkString(",")
      QueryDef.sql(
        "q87_bpe_tokens",
        // words → '|'-delimited character tokens; each merge rank applied
        // by replace() to fixpoint (the recursion re-applies a rank until
        // the string stops changing — replace() consumes the shared
        // delimiter of adjacent occurrences, so one pass can miss every
        // other occurrence), then ranks advance. With a != b merges this
        // is exactly priority BPE — same argument as the kernel's.
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
           |)
           |SELECT doc_id,
           |  len(list_filter(string_split(s, '|'),
           |                  x -> regexp_matches(x, '^[a-z]+$$')))::BIGINT AS n_bpe_tokens
           |FROM bpe WHERE i = $m + 1
           |ORDER BY doc_id""".stripMargin) { (s, dir) =>
        graft.functions.VectorFunctions.register(s)
        // derive narrow, persist once, sort narrow — q30's SortShapes shape
        SortShapes.sortedNarrow(
          docs(s, dir).select(col("doc_id"),
            expr(s"cast(bpe_count(text, array($mergeArr)) as bigint)")
              .as("n_bpe_tokens")),
          "doc_id")
      }
    },

    // ---- BPE tokenizer TRAINING: learn the top-5 merges from the
    //      corpus (the q87 kernel's table, discovered instead of given).
    //      Classic dictionary BPE: train on the word-frequency table —
    //      vocab-bounded, NOT the corpus — counting adjacent token
    //      pairs weighted by word count, merging the argmax each round.
    //      Self-pairs (a,a) are excluded from selection: it keeps the
    //      fixpoint-replacement oracle formulation exactly equal to the
    //      kernel's left-to-right sweep (q87's a≠b equivalence), and
    //      every learned table is then automatically well-founded.
    //
    //      Scale shape: word extraction is one explode + one (word)
    //      shuffle with map-side combine; the word table is persisted
    //      and each of the 5 rounds is scan-local re-segmentation via
    //      the `bpe_segment` kernel (merges-so-far as a plan literal) +
    //      one bounded pair aggregate; the per-round driver sync is ONE
    //      row (the argmax) — the k-means discipline. Pair counts are
    //      exact integers; ties break (count DESC, pair ASC) in both
    //      engines, so training is fully deterministic. ----
    {
      val rounds = 5
      // pair counting + argmax + fixpoint merge application per round,
      // chained: s<r> is the segmentation entering round r
      def roundSql(r: Int): String = {
        val pat = s"(SELECT '|'||pa||'|'||pb||'|' FROM b$r)"
        val rep = s"(SELECT '|'||pa||pb||'|' FROM b$r)"
        s"""p$r AS (
           |  SELECT string_split(pr, ' ')[1] AS pa, string_split(pr, ' ')[2] AS pb,
           |    sum(cnt)::BIGINT AS c
           |  FROM (
           |    SELECT cnt, unnest(list_transform(generate_series(1, len(t) - 1),
           |      j -> t[j] || ' ' || t[j + 1])) AS pr
           |    FROM (SELECT cnt, list_filter(string_split(s, '|'), x -> x != '') AS t
           |          FROM s$r))
           |  GROUP BY pa, pb
           |), b$r AS MATERIALIZED (
           |  SELECT pa, pb, c FROM p$r WHERE pa != pb
           |  ORDER BY c DESC, pa, pb LIMIT 1
           |), f$r(word, cnt, s, done) AS (
           |  SELECT word, cnt, s, false FROM s$r
           |  UNION ALL
           |  SELECT word, cnt, replace(s, $pat, $rep), replace(s, $pat, $rep) = s
           |  FROM f$r WHERE NOT done
           |), s${r + 1} AS MATERIALIZED (SELECT word, cnt, s FROM f$r WHERE done)""".stripMargin
      }
      val unionSql = (1 to rounds).map(r =>
        if (r == 1) s"SELECT 1 AS merge_rank, pa AS tok_a, pb AS tok_b, c AS pair_count FROM b1"
        else s"SELECT $r, pa, pb, c FROM b$r").mkString("\n  UNION ALL ")
      QueryDef.sql(
        "q98_bpe_train",
        s"""WITH RECURSIVE w0 AS MATERIALIZED (
           |  SELECT word, count(*)::BIGINT AS cnt FROM (
           |    SELECT unnest(list_filter(
           |      string_split(lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')), ' '),
           |      x -> x != '')) AS word
           |    FROM documents)
           |  GROUP BY word
           |), s1 AS MATERIALIZED (
           |  SELECT word, cnt,
           |    '|' || array_to_string(list_transform(generate_series(1, len(word)),
           |      i -> word[i]), '|') || '|' AS s
           |  FROM w0
           |), ${(1 to rounds).map(roundSql).mkString(",\n")}
           |SELECT * FROM (
           |  $unionSql
           |) ORDER BY merge_rank""".stripMargin) { (s, dir) =>
        graft.functions.VectorFunctions.register(s)
        val words = graft.CacheRegistry.track(
          docs(s, dir)
            .select(explode(split(lower(regexp_replace(col("text"), "[^A-Za-z]+", " ")), " "))
              .as("word"))
            .where(col("word") =!= "")
            .groupBy("word").agg(count(lit(1)).as("cnt"))
            .persist())
        val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var exhausted = false
        for (_ <- 1 to rounds if !exhausted) {
          val mergeArr =
            if (merges.isEmpty) "cast(array() as array<string>)"
            else merges.map { case (a, b, _) => s"'$a $b'" }.mkString("array(", ",", ")")
          val best = words
            .select(col("cnt"), expr(s"bpe_segment(word, $mergeArr)").as("t"))
            .where(size(col("t")) >= 2)
            .select(col("cnt"), explode(expr(
              """transform(sequence(1, size(t) - 1),
                |  j -> named_struct('pa', element_at(t, j), 'pb', element_at(t, j + 1)))"""
                .stripMargin)).as("p"))
            .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
            .agg(sum(col("cnt")).as("c"))
            .where(col("pa") =!= col("pb"))
            .orderBy(col("c").desc, col("pa"), col("pb"))
            .limit(1).collect().headOption
          // a degenerate corpus (all single-letter words, or fewer
          // distinct mergeable pairs than rounds) legitimately runs
          // out of pairs — emit the merges learned so far, as BPE
          // training does
          best match {
            case Some(b) => merges += ((b.getString(0), b.getString(1), b.getLong(2)))
            case None    => exhausted = true
          }
        }
        val sess = s
        import sess.implicits._
        merges.toSeq.zipWithIndex
          .map { case ((a, b, c), i) => (i + 1, a, b, c) }
          .toDF("merge_rank", "tok_a", "tok_b", "pair_count")
          .orderBy("merge_rank")
      }
    },

    // ---- exact heavy hitters WITHOUT the full-vocabulary groupBy: the
    //      two-pass sketch-then-verify recipe. Pass 1 runs the native
    //      `mg_heavy` Misra-Gries aggregate (≤k counters of state per
    //      partition, mergeable map-side — the repo's second
    //      TypedImperativeAggregate) alongside the exact row count;
    //      every item with true frequency > n/k is GUARANTEED to be
    //      among its ≤k candidates regardless of row order or
    //      partitioning. Pass 2 exactly counts ONLY those ≤k candidate
    //      keys (the shuffle carries k keys after map-side combine, not
    //      the vocabulary) and applies the threshold — so the output is
    //      EXACT and oracle-checkable while the plan never aggregates
    //      the full key space. At 100 TB this is how you find the
    //      dominant domains/tokens when the key cardinality itself is
    //      too large to shuffle; the driver sync is ≤k strings.
    //
    //      The MG summary CONTENT is order-dependent (counts are
    //      approximations, never exposed); the coverage guarantee is
    //      not — MgHeavySpec property-tests it under random data and
    //      partitionings. ----
    QueryDef.sql(
      "q104_heavy_hitters",
      """WITH w AS (
        |  SELECT unnest(list_filter(
        |    string_split(lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')), ' '),
        |    x -> x != '')) AS word
        |  FROM documents
        |), t AS (SELECT count(*) AS n FROM w)
        |SELECT word, count(*)::BIGINT AS freq
        |FROM w, t GROUP BY word, n HAVING count(*) > n // 64
        |ORDER BY freq DESC, word""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val words = graft.CacheRegistry.track(
        docs(s, dir)
          .select(explode(split(lower(regexp_replace(col("text"), "[^A-Za-z]+", " ")), " "))
            .as("word"))
          .where(col("word") =!= "")
          .persist())
      val row = words
        .agg(expr("mg_heavy(word, 64)").as("cand"), count(lit(1)).as("n"))
        .head()
      val cands = row.getSeq[String](0)
      val n = row.getLong(1)
      // an empty summary is a legitimate outcome (MG drains to empty
      // when no item exceeds n/(k+1)); the exact answer is then the
      // empty set, same as the oracle's empty HAVING result
      val base = if (cands.isEmpty) words.limit(0) else words.where(col("word").isin(cands: _*))
      base
        .groupBy(col("word"))
        .agg(count(lit(1)).as("freq"))
        .where(col("freq") > n / 64)
        .orderBy(col("freq").desc, col("word"))
    },

    // ---- per-GROUP heavy hitters: q104's sketch-then-verify recipe run
    //      per source ("the dominant tokens of each domain") — and the
    //      grouped exercise of the Misra-Gries aggregate, whose partial
    //      states now merge per GROUP KEY across partitions (a different
    //      merge path than q104's single global group). Fully
    //      distributed, no driver sync at all: pass 1's per-source
    //      candidate summaries (≤ k words each) explode into a
    //      (source, word) candidate table that is BROADCAST back onto
    //      the token stream, so pass 2's exact count shuffles only
    //      candidate-matching tokens. MG guarantee per group: any word
    //      with freq > n/(k+1) is in its group's summary, and the
    //      threshold n div 32 > n/33, so the exact output is complete.
    //      100 TB shape: state is |sources|·k counters, the candidate
    //      broadcast is |sources|·k rows, and the full per-source
    //      vocabulary is never shuffled. ----
    QueryDef.sql(
      "q116_heavy_hitters_by_source",
      """WITH w AS (
        |  SELECT source, unnest(list_filter(
        |    string_split(lower(regexp_replace(text, '[^A-Za-z]+', ' ', 'g')), ' '),
        |    x -> x != '')) AS word
        |  FROM documents
        |), t AS (SELECT source AS tsource, count(*) AS n FROM w GROUP BY source)
        |SELECT w.source, word, count(*) AS freq
        |FROM w JOIN t ON w.source = t.tsource
        |GROUP BY w.source, word, n HAVING count(*) > n // 32
        |ORDER BY source, freq DESC, word""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      val words = graft.CacheRegistry.track(
        docs(s, dir)
          .select(col("source"),
            explode(split(lower(regexp_replace(col("text"), "[^A-Za-z]+", " ")), " "))
              .as("word"))
          .where(col("word") =!= "")
          .persist())
      val cand = words.groupBy(col("source"))
        .agg(expr("mg_heavy(word, 32)").as("cands"), count(lit(1)).as("n"))
        .select(col("source"), col("n"), explode(col("cands")).as("word"))
      words.join(broadcast(cand), Seq("source", "word"))
        .groupBy(col("source"), col("word"), col("n"))
        .agg(count(lit(1)).as("freq"))
        .where(col("freq") > expr("n div 32"))
        .select(col("source"), col("word"), col("freq"))
        .orderBy(col("source"), col("freq").desc, col("word"))
    },

    // ---- PII redaction: the masking pass every released corpus runs
    //      (emails / IPv6+IPv4 / credit cards / national-ID-shaped runs
    //      / phone numbers → typed placeholders, plus per-type match
    //      counts for the removal report; card candidates additionally
    //      get a LUHN checksum verdict — the report separates
    //      card-SHAPED runs from checkable card numbers). Patterns use
    //      only char classes + bounded quantifiers + grouped bounded
    //      repetition, the regex subset Java regex (Spark, codegen'd)
    //      and RE2 (DuckDB) match identically; the Luhn sum is the same
    //      generated 16-term arithmetic on both sides. The corpus text
    //      is synthetic, so each doc is AUGMENTED with deterministic
    //      doc_id-derived PII before redaction — incl. one Luhn-VALID
    //      and one Luhn-INVALID card — so the match counts are real
    //      (nonzero), the Luhn filter provably separates, and the
    //      cleaned-text md5 breaks on any masking drift. Redaction is
    //      a SINGLE fused alternation pass (the redact_report kernel);
    //      the per-type counts and the Luhn verdict are full-match
    //      filters over the pass's matched spans — position-priority
    //      token counts, identical in both engines — not independent
    //      raw-text rescans. Scan-local narrow plan: no shuffle except
    //      the final ORDER BY; at 100 TB this fuses into the scan like
    //      q30-q33. ----
    QueryDef.sql(
      "q130_pii_redact",
      s"""WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |      '@mail.example.com from 10.' || (doc_id % 256) || '.0.' ||
        |      (doc_id % 100) || ' ipv6 2001:db8:11:22:33:44:55:' ||
        |      (doc_id % 9000 + 1000) ||
        |      ' card 4111-1111-1111-1111 or 1234-5678-9012-3456 id ' ||
        |      lpad(((doc_id * 7) % 1000)::VARCHAR, 3, '0') || '-' ||
        |      lpad((doc_id % 100)::VARCHAR, 2, '0') || '-' ||
        |      lpad(((doc_id * 3) % 10000)::VARCHAR, 4, '0') ||
        |      ' or call +1-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(t, '$piiCombinedRe') AS parts,
        |    regexp_extract_all(t, '$piiCombinedRe') AS toks
        |  FROM aug)
        |SELECT doc_id,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$emailRe'))) AS n_email,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$ipv6Re'))) AS n_ipv6,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$ipRe'))) AS n_ip,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$ccRe'))) AS n_cc,
        |  len(list_filter(toks, x -> CASE WHEN regexp_full_match(x, '$ccRe')
        |    THEN ($luhnSum16) % 10 = 0 ELSE false END)) AS n_cc_luhn,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$idRe'))) AS n_id,
        |  len(list_filter(toks, x -> regexp_full_match(x, '$phoneRe'))) AS n_phone,
        |  md5(parts[1] || array_to_string(
        |    list_transform(range(1, len(toks) + 1), i ->
        |      $piiTagCaseSql || coalesce(parts[i + 1], '')), '')) AS clean_fp
        |FROM red ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // fused redaction: the redact_report native kernel — ONE matcher
      // pass over the combined alternation yields the cleaned text AND
      // the matched spans, so the per-type counts are tiny array
      // filters over ~10 tokens/doc instead of one more full-text regex
      // scan per type (13 traversals of every document before; 1 now).
      // The DuckDB oracle reproduces the identical position-priority
      // result via split + extract + first-full-match tagging (see
      // piiTagCaseSql for why first-full-match is exact); the six
      // patterns are pairwise disjoint on FULL match (@ / colons /
      // dots / dash groupings are mutually exclusive), so per-type
      // token filters equal per-type tags on both sides.
      graft.functions.VectorFunctions.register(s)
      // Spark SQL string literals parse backslash escapes; double them
      // so each regex reaches the kernel intact
      def esc(r: String) = r.replace("\\", "\\\\")
      val rulesSql = piiPatterns.map { case (r, tag) =>
        s"'${esc(r)}', '$tag'"
      }.mkString(", ")
      def nOf(re: String) =
        expr(s"size(filter(rep.toks, x -> x RLIKE '^(?:${esc(re)})$$'))")
      // derive narrow, persist once, sort narrow — q30's SortShapes shape
      // (the redact pass is the most expensive scan-local kernel in the
      // registry: running it in the range sampler too roughly doubled
      // the query in r20, and shipping the augmented text through the
      // range exchange — the r21 hoist — moved the corpus to order
      // eight derived columns)
      SortShapes.sortedNarrow(
      docs(s, dir)
        .select(col("doc_id"), concat(
          col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com from 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 100).cast("string"),
          lit(" ipv6 2001:db8:11:22:33:44:55:"),
          (col("doc_id") % 9000 + 1000).cast("string"),
          lit(" card 4111-1111-1111-1111 or 1234-5678-9012-3456 id "),
          lpad(((col("doc_id") * 7) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 100).cast("string"), 2, "0"), lit("-"),
          lpad(((col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
          lit(" or call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
        // separate projection so the struct is evaluated once per row:
        // CollapseProject keeps a non-trivial expression referenced
        // more than once in its own project instead of inlining it
        .select(col("doc_id"),
          expr(s"redact_report(t, array($rulesSql))").as("rep"))
        .select(
          col("doc_id"),
          nOf(emailRe).as("n_email"),
          nOf(ipv6Re).as("n_ipv6"),
          nOf(ipRe).as("n_ip"),
          nOf(ccRe).as("n_cc"),
          // CASE, not AND: neither engine guarantees short-circuit
          // inside a lambda, and the Luhn CAST must only see card tokens
          expr(s"size(filter(rep.toks, x -> CASE WHEN x RLIKE '^(?:$ccRe)$$' " +
            s"THEN ($luhnSum16) % 10 = 0 ELSE false END))")
            .cast("long").as("n_cc_luhn"),
          nOf(idRe).as("n_id"),
          nOf(phoneRe).as("n_phone"),
          md5(col("rep.clean")).as("clean_fp")),
      "doc_id")
    })

  /** Full-form IPv6 (8 hextets) — grouped bounded repetition, identical
    * in Java regex and RE2; no backslashes, so one literal serves the
    * Spark DSL, Spark SQL `expr`, and the DuckDB oracle. */
  private def ipv6Re = "([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
  private def emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private def ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private def phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  /** Redaction priority order: pattern -> typed placeholder. One list
    * drives the fused alternation regex, the Spark tag CASE, and the
    * DuckDB tag CASE, so the three can never drift apart. */
  private def piiPatterns: Seq[(String, String)] = Seq(
    emailRe -> "[EMAIL]", ipv6Re -> "[IP6]", ipRe -> "[IP]",
    ccRe -> "[CC]", idRe -> "[ID]", phoneRe -> "[PHONE]")
  /** All six PII shapes as ONE alternation, so redaction is a single
    * left-to-right pass instead of six sequential full-text traversals.
    * Priority at a shared start position = alternation order (Java and
    * RE2 are both leftmost-first); matches at an earlier position win
    * over later-starting higher-priority ones — position-priority
    * semantics, applied identically in both engines. */
  private def piiCombinedRe: String =
    piiPatterns.map { case (r, _) => s"(?:$r)" }.mkString("|")
  /** Token -> placeholder. Sound because the winning alternative
    * full-matches its token while every HIGHER-priority alternative
    * matched nothing at that position (else it would have won), so the
    * first full-matching pattern in priority order is exactly the
    * alternative that produced the match. */
  private def piiTagCaseSql: String =
    piiPatterns.init.map { case (r, tag) =>
      s"WHEN regexp_full_match(toks[i], '$r') THEN '$tag'"
    }.mkString("CASE ", " ", s" ELSE '${piiPatterns.last._2}' END")
  /** Dashed 16-digit card-shaped run. */
  private def ccRe = "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}"
  /** National-ID-shaped run (SSN format). Cannot match inside the card,
    * phone, or IPv6 injections: their dash/colon spacings never produce
    * the 3-2-4 digit grouping. */
  private def idRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  /** Luhn checksum of the 16-digit dashed candidate `x` as a 16-term
    * sum — generated once and interpolated into BOTH the Spark
    * higher-order-function expression and the DuckDB lambda, so the
    * two engines evaluate literally the same arithmetic. Doubles the
    * odd (1-indexed, left-to-right) digits, i.e. every second from the
    * right for a 16-digit number, with the >9 fold-down. */
  private def luhnSum16: String = (1 to 16).map { i =>
    val d = s"CAST(substr(replace(x, '-', ''), $i, 1) AS INT)"
    if (i % 2 == 1) s"(CASE WHEN 2*$d > 9 THEN 2*$d - 9 ELSE 2*$d END)" else d
  }.mkString(" + ")
}
