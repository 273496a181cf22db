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
  *  - every query has a total ORDER BY so row order is deterministic;
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
