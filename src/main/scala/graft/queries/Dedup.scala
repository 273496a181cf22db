package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection over `documents` — the dedup toolbox of a
  * training-data pipeline (exact dedup lives in [[TextOps]] q34).
  *
  * All hash material is md5-derived so the DuckDB oracle can replicate
  * every step bit-for-bit (Spark's xxhash64/hash have no DuckDB
  * counterpart).
  *
  * Scale design (100 TB):
  *  - q35 computes pairwise Jaccard through an *inverted index*
  *    (explode shingles → equi join on the shingle → count common per pair):
  *    cost is proportional to real overlap, not to n², and the shingle
  *    join shuffles by shingle hash — the classic sparse-similarity
  *    pattern. Blocking by `source` additionally bounds any hot shingle.
  *  - MinHash-LSH (q36) is the sub-linear path: one narrow projection
  *    computes 16-slot signatures, candidates come from an equi join on
  *    (band, band_hash) — a bucket only holds genuine near-dups plus
  *    rare collisions, so the join never explodes;
  *  - SimHash (q37) gives a second, cheaper signature family: 64-bit
  *    fingerprints, 4×16-bit band join, Hamming verify. Each word is
  *    md5-hashed ONCE and all 64 bits are derived from the cached hex
  *    (not 64 hashes/word).
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.load(s, dir, "documents")
  }

  /** Document-frequency cap for inverted-index posting lists (q35/q48).
    *
    * A shingle present in more than this many documents is boilerplate —
    * it carries no near-duplicate signal (its posting list pairs
    * *everything* with *everything*), but it IS the skew that kills the
    * shingle join at corpus scale: one navigation-bar sentence shared by
    * 10M pages is a single join key with a 10M-row posting list
    * (10^14 pairs). Dropping df > cap postings bounds the worst join key
    * at cap² pairs while leaving every discriminative shingle intact.
    *
    * The cap is far above any df in the test corpora (measured max 25 at
    * sf0.1), so oracle results are bit-identical at test scale; at 100 TB
    * it is the standard df-cap approximation from the near-dup
    * literature. ShingleSkewSpec pins the mechanism. */
  private[queries] val ShingleDfCap = 1000L

  /** Drop postings whose key (the `keys` tuple) occurs in more than
    * `cap` rows. The hot-key set is TINY by construction (only keys
    * above the cap), so it broadcasts and the drop is a map-side
    * broadcast anti join — no extra shuffle on the postings. */
  private[queries] def dropHotPostings(
      postings: DataFrame, keys: Seq[String], cap: Long = ShingleDfCap): DataFrame = {
    val hot = postings.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .where(col("df") > cap)
      .select(keys.map(col): _*)
    postings.join(broadcast(hot), keys, "left_anti")
  }

  /** Shared shingle-array base (round-11 consolidation): ONE persisted
    * (doc_id, source, lang, sh) table per shingle VARIANT — raw
    * `shingles3(text)` and cross-lingual
    * `shingles3(normalize_text(text))`. Every dedup asset derives from
    * it: [[PostingIndex]] explodes it (q35/q108) and [[SignatureIndex]]
    * minhashes it (q36/q110), so q35/q36/q110's first-build batch scans
    * the documents parquet exactly ONCE (PlanSpec-pinned) where round
    * 10 scanned it once per asset, and q108's normalized variant adds
    * at most one more scan.
    *
    * Variant-keyed rather than one both-variant table, deliberately: a
    * cache build materializes EVERY column of the cached plan, so a
    * combined (sh, shn) base taxes any query that reads one variant
    * with the other's full normalize+shingle pass — measured at sf0.1
    * as q110 1.17→1.83 s and q36 0.96→1.11 s standalone (the driver's
    * bench releases caches per query, so standalone cost is what it
    * times). With variant keying no query pays for columns it never
    * reads, and a mixed batch still builds each variant once. At
    * 100 TB the corpus shingle base is a persisted TABLE written
    * offline in one pass over text (where computing both variants
    * together IS right); the session memo optimizes the interactive
    * case. Memoized per (session, dir, variant);
    * [[CacheRegistry.releaseAll]] invalidates the memo with the
    * persist. */
  private[queries] object ShingleBase {
    // keyed by the SESSION too: a cached plan is bound to the session it
    // was built on, and handing it to a different/stopped session would
    // execute on the wrong conf or throw
    private val memo = scala.collection.mutable.Map
      .empty[(SparkSession, String, Boolean), DataFrame]

    def base(s: SparkSession, dir: String, normalized: Boolean): DataFrame =
      synchronized {
        memo.getOrElseUpdate((s, dir, normalized), {
          val shExpr =
            if (normalized) "shingles3(normalize_text(text))" else shinglesExpr
          val b = graft.CacheRegistry.track(docs(s, dir)
            .select(col("doc_id"), col("source"), col("lang"),
              expr(shExpr).as("sh"))
            .persist())
          graft.CacheRegistry.onRelease(() =>
            ShingleBase.synchronized { memo.remove((s, dir, normalized)): Unit })
          b
        })
      }
  }

  /** Shared shingle-posting view (round-10 consolidation, round-11
    * re-based onto [[ShingleBase]]): the inverted index — (doc_id,
    * source, lang, set size, exploded shingle), df-capped per
    * (source, shingle) — feeds q35 (raw) and q108 (normalized). The
    * explode is a scan-local derivation of the persisted base (arrays
    * are cached once; re-exploding them is cheap columnar compute), so
    * the only exchange in a posting build is the df-cap's hot-key
    * aggregate, whose above-cap survivors broadcast back as a
    * left-anti join — the postings themselves are never reshuffled
    * (PlanSpec-pinned). Memoized per (dir, variant) so repeated
    * callers share one plan; invalidated with the base's persist. */
  private[queries] object PostingIndex {
    private val memo = scala.collection.mutable.Map
      .empty[(SparkSession, String, Boolean), DataFrame]

    /** The df-capped posting table for `dir`; `normalized` selects the
      * `normalize_text` (cross-lingual) variant. */
    def postings(s: SparkSession, dir: String, normalized: Boolean): DataFrame =
      synchronized {
        memo.getOrElseUpdate((s, dir, normalized), {
          // join on a 64-bit hash of the shingle, not the string
          // (guide §2.3 "shuffle keys and metadata instead of payloads"):
          // the pair join and the df-cap aggregate only ever test shingle
          // EQUALITY — `c` counts common shingles — so an 8-byte
          // xxhash64 key carries the same information as the ~20-40-byte
          // word 3-gram through both exchanges. Exactness: distinct
          // shingles colliding in 64 bits could over-count `c`; at
          // shingle-vocabulary cardinalities (n << 2^32 per source
          // block) the expected collision count n²/2^65 is absent, the
          // DuckDB oracle (string join) confirms equality at every test
          // SF, and PostingHashSpec pins hash-join == string-join pair
          // counts on the test corpus.
          val sized = ShingleBase.base(s, dir, normalized)
            .select(col("doc_id"), col("source"), col("lang"),
              size(col("sh")).as("sz"),
              explode(col("sh")).as("shingle_str"))
            .select(col("doc_id"), col("source"), col("lang"), col("sz"),
              xxhash64(col("shingle_str")).as("shingle"))
          graft.CacheRegistry.onRelease(() =>
            PostingIndex.synchronized { memo.remove((s, dir, normalized)): Unit })
          // NOT persisted, deliberately (re-measured r21): caching the
          // exploded postings costs a full materialization (explode +
          // columnar cache write) that exceeds what the join sides save
          // by not re-exploding the already-cached ShingleBase arrays —
          // measured q35 1.93 -> 2.43 s with a persist here.
          dropHotPostings(sized, Seq("source", "shingle"))
        })
      }
  }

  /** Shared MinHash signature asset (round-10 lever, round-11 re-based
    * onto [[ShingleBase]]): the (doc_id, shingle-set) view and its
    * 4-band LSH projection are what q36 (full near-dup) and q110
    * (incremental dedup) both need — in production BOTH are persisted
    * signature tables (q110's corpus-side asset IS this). The shingle
    * view reads the shared base; the band projection (the minhash
    * compute) persists separately since bands carry only
    * (doc_id, band, bh) ≈ 50 bytes/row into any LSH join — the corpus
    * text/shingles never ride a shuffle. Memo invalidated with the
    * persists via [[CacheRegistry]]. */
  private[queries] object SignatureIndex {
    // session-keyed for the same reason as ShingleBase's memo
    private val memo = scala.collection.mutable.Map
      .empty[(SparkSession, String), (DataFrame, DataFrame)]

    /** (shingled, bands): `shingled` = (doc_id, sh) from the shared
      * base; `bands` = (doc_id, band, bh) persisted. */
    def shingleAndBands(s: SparkSession, dir: String): (DataFrame, DataFrame) =
      synchronized {
        memo.getOrElseUpdate((s, dir), {
          val shingled = ShingleBase.base(s, dir, normalized = false)
            .select(col("doc_id"), col("sh"))
          // bh = xxhash64 of the band's concatenated signature slices
          // (r22; was md5): the band hash exists only to test SLICE
          // EQUALITY in the LSH candidate joins (q36/q110/q122) — it is
          // never output — so an 8-byte long key replaces the 32-char
          // md5 string in the persist AND in every band-join exchange
          // (guide §2.3). Candidate sets are identical modulo 64-bit
          // hash collisions, the same accepted-risk class as the q35
          // posting keys (a collision only ADDS a candidate, which the
          // jaccard>=0.5 verify then inspects); oracle-gated at every
          // test SF.
          val bands = graft.CacheRegistry.track(shingled
            .withColumn("sg", expr("minhash16(md5_array(sh))"))
            .select(col("doc_id"),
              explode(expr(
                """transform(sequence(0, 3), j -> named_struct(
                  |  'band', j,
                  |  'bh', xxhash64(concat(element_at(sg, 4*j+1), element_at(sg, 4*j+2),
                  |                        element_at(sg, 4*j+3), element_at(sg, 4*j+4)))))""".stripMargin))
                .as("b"))
            .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
            .persist())
          graft.CacheRegistry.onRelease(() =>
            SignatureIndex.synchronized { memo.remove((s, dir)): Unit })
          (shingled, bands)
        })
      }
  }

  /** Word 3-gram shingle set (distinct), as a Column over `text` — the
    * native [[graft.functions.Shingles3]] kernel, value-identical to the
    * oracle's
    * `list_distinct(list_transform(generate_series(1, greatest(len(w)-2,1)), i -> w[i:i+2]))`. */
  private val shinglesExpr = "shingles3(text)"

  private def shingleSqlOn(c: String): String =
    s"""list_distinct(list_transform(generate_series(1, greatest(len(string_split($c,' '))-2, 1)),
       |      i -> array_to_string(string_split($c,' ')[i:i+2], ' ')))""".stripMargin

  private val shingleSql = shingleSqlOn("text")

  val defs: Seq[QueryDef] = Seq(

    // ---- n-gram Jaccard near-dup pairs via inverted index, blocked by
    //      source. The oracle states the same semantics in its dense
    //      (all-pairs) form — results are identical because every pair
    //      with jaccard >= 0.5 shares at least one shingle. ----
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
      // shared builder (PostingIndex): df-capped so boilerplate shingles
      // (df > cap within the source block) are dropped BEFORE the pair
      // join — they add no signal and their posting lists are the
      // quadratic skew at corpus scale. Set sizes (sz) keep the FULL
      // shingle sets, so jaccard is unchanged wherever no capped
      // shingle exists (all test corpora).
      val pruned = PostingIndex.postings(s, dir, normalized = false)
      val a = pruned.as("a")
      val b = pruned.as("b")
      // length filter (exact, from the set-similarity-join literature):
      // J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so J >= 0.5 requires the
      // sizes within 2x of each other — prune those pairs inside the
      // join, before they fan into the aggregate
      val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") <= col("b.sz") * 2 && col("b.sz") <= col("a.sz") * 2)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sz").as("sa"), col("b.sz").as("sb"))
        .agg(count(lit(1)).as("c"))
      val j = col("c") * 1.0 / (col("sa") + col("sb") - col("c"))
      common.where(j >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- MinHash + banded LSH: 16 rotation-sliced views of one md5 per
    //      shingle, 4 bands × 4 rows ----
    QueryDef.sql(
      "q36_minhash_lsh",
      s"""WITH s AS (
         |  SELECT doc_id, $shingleSql AS sh FROM documents
         |), hs AS (
         |  SELECT doc_id, sh, list_transform(sh, x -> md5(x) || md5(x)) AS hh FROM s
         |), sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, 15),
         |      i -> list_min(list_transform(hh, h -> substr(h, i + 1, 16)))) AS sg
         |  FROM hs
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
      // the shared signature asset (SignatureIndex): shingle table +
      // 50-byte/row band projection, one persisted build serving q36 AND
      // q110; candidate pairs are rare, so shingles are fetched only for
      // candidates via the two verify joins below
      val (shingled, bands) = SignatureIndex.shingleAndBands(s, dir)
      val a = bands.as("a")
      val b = bands.as("b")
      val cand = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val withSh = cand
        .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      val j = size(array_intersect(col("sha"), col("shb"))) * 1.0 /
        size(array_union(col("sha"), col("shb")))
      withSh.where(j >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(j, 4).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- SimHash: 64-bit signed-sum fingerprint over words (one md5 per
    //      word), banded 4×16-bit LSH join, Hamming verify ≤ 6 ----
    QueryDef.sql(
      "q37_simhash",
      """WITH w AS (
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
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |  len(list_filter(generate_series(1, 64), i -> substr(ha, i, 1) != substr(hb, i, 1))) AS hamming
        |FROM cand
        |WHERE len(list_filter(generate_series(1, 64), i -> substr(ha, i, 1) != substr(hb, i, 1))) <= 6
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, dir) =>
      // persisted: the band SELF-join would otherwise plan the simhash
      // kernel (one md5 per word) once per side — two full document
      // scans + two kernel passes (seen in plans/r21). The fingerprint
      // table is 1 long + 64-char string per doc, so the cache is tiny.
      val sh = graft.CacheRegistry.track(
        docs(s, dir).select(col("doc_id"),
          expr("simhash64(md5_array(split(text, ' ')))").as("simhash"))
          .persist())
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
      val hamming = expr("hamming64(ha, hb)")
      cand.where(hamming <= 6)
        .select(col("doc_a"), col("doc_b"), hamming.as("hamming"))
        .orderBy("doc_a", "doc_b")
    },

    // ---- cross-lingual near-dup candidates (round 9): q35's inverted
    //      index run over `normalize_text` output (lowercase, accents
    //      stripped, punctuation collapsed — the ⚙normalize_text
    //      kernel), pairing only documents of DIFFERENT languages within
    //      a source block. Translated/transliterated twins share
    //      normalized shingles their raw forms may not. Global top-20 by
    //      jaccard (threshold-free: stable at every SF), deterministic
    //      via the (unrounded jaccard, doc_a, doc_b) sort. Same
    //      100 TB shape as q35: posting-list equi join + df-cap, never
    //      all-pairs; top-k is TakeOrderedAndProject, no global sort. ----
    QueryDef.sql(
      "q108_crosslingual_neardup",
      s"""WITH n AS (
         |  SELECT doc_id, source, lang,
         |    trim(regexp_replace(strip_accents(lower(text)), '[^\\p{L}\\p{Nd}]+', ' ', 'g')) AS ntext
         |  FROM documents
         |), s AS (
         |  SELECT doc_id, source, lang, ${shingleSqlOn("ntext")} AS sh FROM n)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  a.lang AS lang_a, b.lang AS lang_b,
         |  round(len(list_intersect(a.sh, b.sh)) * 1.0 /
         |        len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
         |FROM s a JOIN s b ON a.source = b.source AND a.lang < b.lang
         |WHERE len(list_intersect(a.sh, b.sh)) > 0
         |ORDER BY len(list_intersect(a.sh, b.sh)) * 1.0 /
         |      len(list_distinct(list_concat(a.sh, b.sh))) DESC, doc_a, doc_b
         |LIMIT 20""".stripMargin) { (s, dir) =>
      val pruned = PostingIndex.postings(s, dir, normalized = true)
      val a = pruned.as("a")
      val b = pruned.as("b")
      val common = a.join(b,
        col("a.shingle") === col("b.shingle") && col("a.source") === col("b.source") &&
          col("a.lang") < col("b.lang"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
          col("a.sz").as("sa"), col("b.sz").as("sb"))
        .agg(count(lit(1)).as("c"))
      val j = col("c") * 1.0 / (col("sa") + col("sb") - col("c"))
      common
        .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"),
          round(j, 4).as("jaccard"), j.as("_j"))
        .orderBy(col("_j").desc, col("doc_a"), col("doc_b"))
        .limit(20)
        .select(col("doc_a"), col("doc_b"), col("lang_a"), col("lang_b"), col("jaccard"))
    },

    // ---- incremental corpus dedup (round 9): dedup a NEW ingest batch
    //      (doc_id % 5 = 0, a stable hash-style split) against the
    //      EXISTING corpus (the rest) via the q36 MinHash-LSH bands —
    //      the daily-crawl update operation of a production pipeline.
    //      Every new doc is reported with its best existing match
    //      (max verified jaccard ≥ 0.5, tiebreak lowest existing
    //      doc_id) or flagged clean.
    //
    //      100 TB shape: the band table of the EXISTING corpus is a
    //      persisted signature asset in production — the incremental
    //      cost of an update is new-batch-sized: new-batch bands equi
    //      join the corpus bands on (band, bh) (sub-linear, bucket
    //      collisions only, never all-pairs), candidate pairs are rare
    //      so the shingle-fetch verify joins and the per-new-doc argmax
    //      window touch only candidates. Nothing broadcasts or
    //      shuffles the corpus beyond its (already-materialized)
    //      50-byte/row band projection. ----
    QueryDef.sql(
      "q110_incremental_dedup",
      s"""WITH s AS (
         |  SELECT doc_id, $shingleSql AS sh FROM documents
         |), hs AS (
         |  SELECT doc_id, sh, list_transform(sh, x -> md5(x) || md5(x)) AS hh FROM s
         |), sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, 15),
         |      i -> list_min(list_transform(hh, h -> substr(h, i + 1, 16)))) AS sg
         |  FROM hs
         |), bands AS (
         |  SELECT doc_id, sh, j AS band,
         |    md5(sg[4*j+1] || sg[4*j+2] || sg[4*j+3] || sg[4*j+4]) AS bh
         |  FROM sig, range(0, 4) t(j)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id,
         |    a.sh AS sha, b.sh AS shb
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
         |  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 != 0
         |), ver AS (
         |  SELECT new_id, old_id,
         |    len(list_intersect(sha, shb)) * 1.0 /
         |      len(list_distinct(list_concat(sha, shb))) AS jac
         |  FROM cand
         |  WHERE len(list_intersect(sha, shb)) * 1.0 /
         |        len(list_distinct(list_concat(sha, shb))) >= 0.5
         |), best AS (
         |  SELECT new_id, old_id, jac,
         |    row_number() OVER (PARTITION BY new_id ORDER BY jac DESC, old_id) AS rk
         |  FROM ver
         |)
         |SELECT d.doc_id, (best.new_id IS NOT NULL) AS is_dup,
         |  best.old_id AS match_id, round(best.jac, 4) AS jaccard
         |FROM documents d LEFT JOIN best ON d.doc_id = best.new_id AND best.rk = 1
         |WHERE d.doc_id % 5 = 0 ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val isNew = col("doc_id") % 5 === 0
      // the shared signature asset (SignatureIndex) — in production the
      // old side IS this persisted table, so an update pays new-batch
      // cost only; here q36 and q110 literally share one build
      val (shingled, bands) = SignatureIndex.shingleAndBands(s, dir)
      val cand = bands.filter(isNew).as("a")
        .join(bands.filter(!isNew).as("b"),
          col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
        .select(col("a.doc_id").as("new_id"), col("b.doc_id").as("old_id"))
        .distinct()
      val withSh = cand
        .join(shingled.select(col("doc_id").as("new_id"), col("sh").as("sha")), "new_id")
        .join(shingled.select(col("doc_id").as("old_id"), col("sh").as("shb")), "old_id")
      val jac = size(array_intersect(col("sha"), col("shb"))) * 1.0 /
        size(array_union(col("sha"), col("shb")))
      val best = withSh.where(jac >= 0.5)
        .select(col("new_id"), col("old_id"), jac.as("jac"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("new_id")).orderBy(col("jac").desc, col("old_id"))))
        .filter(col("rk") === 1)
      docs(s, dir).select(col("doc_id")).filter(isNew)
        .join(best, col("doc_id") === col("new_id"), "left")
        .select(col("doc_id"), col("new_id").isNotNull.as("is_dup"),
          col("old_id").as("match_id"), round(col("jac"), 4).as("jaccard"))
        .orderBy("doc_id")
    },

    // ---- exact substring dedup (round 11): the suffix-array dedup of
    //      Lee et al. ("Deduplicating Training Data Makes Language
    //      Models Better") re-expressed Spark-shaped — a LONG exact
    //      word k-gram (k=20) shared verbatim between documents marks
    //      copied boilerplate that Jaccard-style whole-doc similarity
    //      (q35/q36) under-weights. Per document: how many distinct
    //      20-grams it has, how many also occur in ANOTHER document,
    //      and the duplicated fraction — the per-doc removable-span
    //      signal a substring-dedup pass acts on. Docs under 20 words
    //      carry no gram and report 0.
    //
    //      100 TB shape: gram df via groupBy (map-side combine keeps a
    //      boilerplate gram shared by millions of docs skew-safe — a
    //      WINDOW over the gram hash would materialize that gram's
    //      whole posting list in one task), flags joined back on the
    //      gram hash where ReuseExchange serves both consumers from ONE
    //      postings shuffle (PlanSpec-pinned), then a doc_id
    //      re-aggregate; never a pair join, never all-pairs. Grams ride
    //      the shuffle as 32-char md5 keys, not 100+-byte strings. ----
    QueryDef.sql(
      "q121_substring_dedup",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, greatest(len(ws) - 19, 0)),
        |    i -> array_to_string(ws[i:i+19], ' ')))) AS gram
        |  FROM d
        |), c AS (
        |  SELECT gram, count(*) AS df FROM g GROUP BY gram
        |), p AS (
        |  SELECT g.doc_id, count(*) AS n_grams,
        |    sum(CASE WHEN c.df > 1 THEN 1 ELSE 0 END) AS n_dup
        |  FROM g JOIN c USING (gram) GROUP BY g.doc_id
        |)
        |SELECT d0.doc_id,
        |  coalesce(p.n_grams, 0)::BIGINT AS n_grams,
        |  coalesce(p.n_dup, 0)::BIGINT AS n_dup,
        |  round(coalesce(p.n_dup * 1.0 / p.n_grams, 0), 4) AS dup_frac
        |FROM documents d0 LEFT JOIN p ON d0.doc_id = p.doc_id
        |ORDER BY d0.doc_id""".stripMargin) { (s, dir) =>
      // distinct gram hashes per doc without materializing gram strings
      // (native gram_hashes kernel — same identity as md5 of the joined
      // gram, hashed from the word bytes directly)
      // r22: fold the 32-char md5 key down to its xxhash64 long before
      // the exchanges — gh is equality-only here (df count + join-back),
      // so the df groupBy and the reused postings shuffle carry 8-byte
      // keys instead of 32-byte strings (guide §2.3; q35's collision
      // analysis applies and the oracle gates the result)
      val g = docs(s, dir)
        .select(col("doc_id"),
          explode(expr("array_distinct(gram_hashes(text, 20))")).as("gh_md5"))
        .select(col("doc_id"), xxhash64(col("gh_md5")).as("gh"))
      // skew-safe df: partial (map-side) counts shrink even a
      // corpus-wide boilerplate gram to one row per partition before
      // the exchange; the postings' gh-shuffle is REUSED by the join
      val dfByGram = g.groupBy("gh").agg(count(lit(1)).as("df"))
      val withDf = g.join(dfByGram, "gh")
      val per = withDf.groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      docs(s, dir).select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          round(coalesce(col("n_dup") * 1.0 / col("n_grams"), lit(0.0)), 4)
            .as("dup_frac"))
        .orderBy("doc_id")
    },

    // ---- substring-span REMOVAL (round 13): q121 detects duplicated
    //      20-gram spans; this pass REMOVES them — the act half of Lee
    //      et al.'s suffix-array dedup, Spark-shaped. First-occurrence-
    //      wins: for each distinct 20-gram the corpus-minimal
    //      (doc_id, pos) occurrence is kept; every other occurrence
    //      marks its 20-token span for removal. A token is dropped when
    //      ANY removed span covers it; cleaned text = the surviving
    //      tokens re-joined. Output: per-doc token counts + the cleaned
    //      text's md5 (content-hashed, so a single misplaced token
    //      breaks the gate).
    //
    //      100 TB shape: same gram-postings spine as q121 — occurrences
    //      carry (gh, doc_id, pos) where gh is a 32-char md5 (grams
    //      never ride a shuffle as 100+-byte strings); per-gram df and
    //      the winning first occurrence come from ONE partial-agg'd
    //      groupBy (min(struct) is map-side combinable — no Window, no
    //      posting-list materialization); the join-back reuses the gh
    //      exchange; span flags re-aggregate doc-locally; the final
    //      token filter is a scan-local higher-order expression over
    //      (text, spans) — the corpus never rides a pair join. ----
    QueryDef.sql(
      "q126_substring_removal",
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        |), g AS (
        |  SELECT doc_id, unnest(generate_series(1, greatest(len(ws) - 19, 0))) AS pos, ws FROM d
        |), occ AS (
        |  SELECT doc_id, pos, array_to_string(ws[pos:pos+19], ' ') AS gram FROM g
        |), marked AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        |  FROM occ
        |), spans AS (
        |  SELECT doc_id, pos AS s FROM marked WHERE rn > 1
        |), tok AS (
        |  SELECT doc_id, unnest(generate_series(1, len(ws))) AS p, ws FROM d
        |), tk AS (
        |  SELECT t.doc_id, t.p, t.ws[t.p] AS w,
        |    EXISTS (SELECT 1 FROM spans sp WHERE sp.doc_id = t.doc_id
        |            AND sp.s <= t.p AND t.p <= sp.s + 19) AS rm
        |  FROM tok t
        |)
        |SELECT d.doc_id,
        |  len(d.ws)::BIGINT AS n_tokens,
        |  coalesce(sum(CASE WHEN tk.rm THEN 1 ELSE 0 END), 0)::BIGINT AS removed_tokens,
        |  md5(coalesce(string_agg(CASE WHEN NOT tk.rm THEN tk.w END, ' ' ORDER BY tk.p), '')) AS clean_md5
        |FROM d LEFT JOIN tk ON d.doc_id = tk.doc_id
        |GROUP BY d.doc_id, len(d.ws)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).select(col("doc_id"), split(col("text"), " ").as("ws"))
      // all gram OCCURRENCES with word positions (1-based); grams ride
      // shuffles as md5 keys only — and are hashed WITHOUT materializing
      // the ~100-byte gram strings (native gram_hashes kernel: the md5
      // is fed the word bytes + ' ' separators directly)
      val occ = docs(s, dir)
        .select(col("doc_id"), posexplode(expr("gram_hashes(text, 20)")))
        // r22: xxhash64-fold the md5 key (equality-only: df + min-struct
        // + join-back) so both gh exchanges carry longs — q121's move
        .select(col("doc_id"), (col("pos") + 1).as("pos"),
          xxhash64(col("col")).as("gh"))
      // per-gram df + corpus-minimal occurrence, ONE partial-agg'd
      // groupBy (min over struct combines map-side — skew-safe where a
      // Window would pin a boilerplate gram's postings in one task)
      val stats = occ.groupBy("gh").agg(
        count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("fst"))
      val spans = occ.join(stats, "gh")
        .filter(col("df") > 1 &&
          !(col("doc_id") === col("fst.doc_id") && col("pos") === col("fst.pos")))
        .groupBy("doc_id").agg(collect_list(col("pos")).as("spans"))
      // derive narrow, persist once, sort narrow — q30's SortShapes
      // shape: the kept-token filter + md5 (the most expensive
      // scan-local piece of this plan) runs once, and the range
      // exchange carries (doc_id, n_tokens, removed_tokens, clean_md5)
      // instead of the corpus word arrays + spans
      SortShapes.sortedNarrow(
        d.join(spans, Seq("doc_id"), "left")
          .select(col("doc_id"), col("ws"),
            coalesce(col("spans"), expr("array()").cast("array<int>")).as("spans"))
          .withColumn("kept", expr(
            "filter(transform(ws, (w, i) -> named_struct('w', w, 'p', i + 1)), " +
              "x -> !exists(spans, sp -> sp <= x.p AND x.p <= sp + 19))"))
          .select(col("doc_id"),
            size(col("ws")).cast("long").as("n_tokens"),
            (size(col("ws")) - size(col("kept"))).cast("long").as("removed_tokens"),
            md5(array_join(expr("transform(kept, x -> x.w)"), " ")).as("clean_md5")),
        "doc_id")
    },

    // ---- dedup observability (round 11): per-source duplication rate —
    //      the fraction of each source's documents with at least one
    //      VERIFIED near-duplicate (jaccard >= 0.5) anywhere in the
    //      corpus. The QA dashboard number a production dedup pass is
    //      judged by (which crawls are dirty, which are clean), computed
    //      on the SAME shared signature asset q36/q110 use: band equi
    //      join for candidates, shingle-fetch verify for rare pairs,
    //      then a doc-level distinct and one source aggregate — the
    //      corpus never rides a pair join. ----
    QueryDef.sql(
      "q122_dedup_rate_by_source",
      s"""WITH s AS (
         |  SELECT doc_id, $shingleSql AS sh FROM documents
         |), hs AS (
         |  SELECT doc_id, sh, list_transform(sh, x -> md5(x) || md5(x)) AS hh FROM s
         |), sig AS (
         |  SELECT doc_id, sh,
         |    list_transform(generate_series(0, 15),
         |      i -> list_min(list_transform(hh, h -> substr(h, i + 1, 16)))) AS sg
         |  FROM hs
         |), bands AS (
         |  SELECT doc_id, sh, j AS band,
         |    md5(sg[4*j+1] || sg[4*j+2] || sg[4*j+3] || sg[4*j+4]) AS bh
         |  FROM sig, range(0, 4) t(j)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sh AS sha, b.sh AS shb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |), ver AS (
         |  SELECT doc_a, doc_b FROM cand
         |  WHERE len(list_intersect(sha, shb)) * 1.0 /
         |        len(list_distinct(list_concat(sha, shb))) >= 0.5
         |), dup AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM ver
         |    UNION ALL SELECT doc_b AS doc_id FROM ver)
         |)
         |SELECT d.source, count(*)::BIGINT AS n_docs,
         |  count(dup.doc_id)::BIGINT AS n_dup,
         |  round(count(dup.doc_id) * 1.0 / count(*), 4) AS dup_rate
         |FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id
         |GROUP BY d.source
         |ORDER BY d.source""".stripMargin) { (s, dir) =>
      val (shingled, bands) = SignatureIndex.shingleAndBands(s, dir)
      val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val withSh = cand
        .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
        .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      val j = size(array_intersect(col("sha"), col("shb"))) * 1.0 /
        size(array_union(col("sha"), col("shb")))
      val dup = withSh.where(j >= 0.5)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      docs(s, dir).select(col("doc_id"), col("source"))
        .join(dup.withColumn("hit", lit(1)), Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), count(col("hit")).as("n_dup"),
          round(count(col("hit")) * 1.0 / count(lit(1)), 4).as("dup_rate"))
        .orderBy("source")
    })
}
