package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark (DataFrame-API) implementation plus, when
  * the semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL
  * over the same parquet tables. Column names/aliases MUST match between
  * the two — the driver sorts columns by name before hashing.
  *
  * Determinism rules for oracle-checked queries:
  *  - every floating aggregate is `round(..., n)` in BOTH engines so that
  *    summation-order differences cannot flip the hash;
  *  - every query has a total ORDER BY so row order is deterministic.
  *    Exception: q112/q113 satisfy it by ORDER-PRESERVATION — the sort
  *    sits BELOW their codec mapPartitions (a terminal sort would
  *    re-execute the ImageIO/WAV lineage in the range partitioner's
  *    sampling pass, doubling every encode+decode), and the per-row
  *    narrow map keeps partition contents and order intact through
  *    toDF/collect. This leans on Spark not re-partitioning or
  *    reordering above a narrow map — if an optimizer/AQE change ever
  *    does, those two hashes flip first; re-check this assumption
  *    before debugging their kernels;
  *  - raw timestamps are cast to date (the parquet testdata mixes ms/ns
  *    timestamp precision, which Spark and DuckDB read differently).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
