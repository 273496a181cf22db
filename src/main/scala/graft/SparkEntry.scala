package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from the per-area modules:
  *  - [[graft.queries.Relational]] — SURVEY §2B relational surface (q01-q24)
  *  - [[graft.queries.Extras]]     — json/math/array functions, salted agg,
  *    HLL + KMV distinct sketches, exact length quantiles (q25-q29, q89, q93)
  *  - [[graft.queries.TextOps]]    — token/quality/lang-id/fingerprint/
  *    exact-dedup, BPE token counting AND BPE tokenizer training,
  *    two-pass exact heavy hitters, global and per-source, PII
  *    redaction (q30-q34, q44, q87, q98, q104, q116, q130)
  *  - [[graft.queries.Dedup]]      — n-gram Jaccard, MinHash-LSH, SimHash,
  *    cross-lingual near-dup over normalize_text, incremental
  *    new-batch-vs-corpus dedup (q35-q37, q108, q110)
  *  - [[graft.queries.Similarity]] — cosine top-k, near-dup, LSH ANN,
  *    IVF-PQ search with asymmetric-distance LUTs, contrastive
  *    hard-negative mining (q38-q40, q95, q101)
  *  - [[graft.operators.Multimodal]] — binary-payload feature extraction,
  *    real JDK image/audio decode roundtrips under the oracle gate,
  *    perceptual-hash image dedup (q41, q112, q113, q114)
  *  - [[graft.operators.AsOfJoin]]   — union+window as-of join (q45)
  *  - [[graft.queries.Pipeline]]     — repetition signals, sessionization,
  *    contamination, sampling/mixing, source-overlap matrix, weighted
  *    reservoir sampling, per-source domain cap, and the one-pass
  *    curation-funnel pipeline, native session_window sessions, stratified
  *    per-source reservoir, stable hash-of-id split assignment,
  *    corpus-order novelty curve, DSIR importance weights (q46-q49,
  *    q51-q55, q57-q58, q90, q94, q100, q102, q105, q106, q107, q109)
  *  - [[graft.operators.ConnectedComponents]] — dedup clustering (q50)
  *  - [[graft.queries.Clustering]]   — k-means embedding clustering (q56),
  *    SemDeDup cluster-bounded semantic dedup (q88), product
  *    quantization PQ codes (q91)
  *  - [[graft.queries.Quality]]      — passage chunking, vocab stats,
  *    Gopher filter, bloom decontamination, token-budget mix, bigram LM,
  *    embedding outliers, Zipf rank-frequency fit (q59-q65, q111)
  *  - [[graft.queries.Mining]]      — event funnel, boilerplate n-grams,
  *    temperature mix, rare-word novelty, ANN recall eval, retention
  *    cohorts, z-score anomalies, passage dedup, source drift, nDCG/MRR
  *    retrieval eval, co-purchase PageRank (q66-q74, q96-q97)
  *  - [[graft.queries.Retrieval]]   — sequence packing, BM25 scoring,
  *    curriculum phases (q75-q77)
  *  - [[graft.streaming.StreamQueries]] — Structured Streaming runs
  *    surfaced as oracle-checked entries: watermarked windowed agg,
  *    funnel state machine, stream-stream interval join, watermark-
  *    bounded streaming dedup, streaming session_window sessions
  *    (q83-q85, q92, q103)
  *  - [[graft.queries.ZarrRoundtrip]] — the zarr connector in the
  *    oracle gate: write documents → zarr store → DSv2 read → agg
  *    (q99), cube write/append/region/shard/describe/sink
  *    (q125, q128, q129, q131, q132, q133, q134, q135), ranged/stats
  *    lifecycle (q136-q140), sharded vlen-binary blobs (q141), the
  *    tabular maintenance lifecycle (q142)
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    _root_.graft.queries.Relational.defs ++
      _root_.graft.queries.Extras.defs ++
      _root_.graft.queries.TextOps.defs ++
      _root_.graft.queries.Dedup.defs ++
      _root_.graft.queries.Similarity.defs ++
      _root_.graft.operators.Multimodal.defs ++
      _root_.graft.operators.AsOfJoin.defs ++
      _root_.graft.queries.Pipeline.defs ++
      _root_.graft.operators.ConnectedComponents.defs ++
      _root_.graft.queries.Clustering.defs ++
      _root_.graft.queries.Quality.defs ++
      _root_.graft.queries.Mining.defs ++
      _root_.graft.queries.Retrieval.defs ++
      _root_.graft.streaming.StreamQueries.defs ++
      _root_.graft.queries.ZarrRoundtrip.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Name-sorted ListMap: bench/verify iteration order is stable across
    * registry growth, so round-over-round per-query deltas are
    * attributable (same warmth/cache position every round). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      allDefs.map(d => d.name -> d.fn).sortBy(_._1): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    scala.collection.immutable.ListMap(
      allDefs.collect { case QueryDef(n, _, Some(o)) => n -> o }.sortBy(_._1): _*)
}
