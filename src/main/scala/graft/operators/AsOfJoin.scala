package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row with
  * the same key whose time is ≤ the left row's time.
  *
  * Spark has no built-in as-of join, and the naive formulations do not
  * scale: a non-equi range join plans as a nested loop (O(|L|·|R|) per
  * key), and a "join then pick max" explodes every left row by its full
  * right history before discarding all but one. The idiomatic distributed
  * shape used here is **union + window carry-forward**:
  *
  *   1. tag both inputs and union them into one relation
  *      (key, time, side, payload…);
  *   2. shuffle ONCE by key, sort each key group by
  *      (time, side, tiebreak) — right rows sort before left rows at
  *      equal time, so "at or before" is inclusive;
  *   3. `last(payload, ignoreNulls = true)` over an unbounded-preceding
  *      row frame carries the latest right payload forward onto every
  *      subsequent left row;
  *   4. keep the left rows.
  *
  * Cost: one shuffle + sort of |L| + |R| rows, the same plan shape as a
  * sort-merge join — this survives 100 TB where per-row range probes do
  * not. Skew in a hot key is bounded by that key's own history (and AQE
  * skew handling applies to the shuffle).
  *
  * Determinism: ties among right rows at equal (key, time) are resolved
  * by `rightTieBreak` (ascending; the LAST one wins), so results are
  * exactly reproducible — required for the DuckDB oracle hash-compare.
  */
object AsOfJoin {

  /** Left-outer as-of join.
    *
    * @param left           probe side; all its columns are preserved
    * @param right          build side (e.g. a slowly-changing dimension)
    * @param leftKey/leftTime   join key and event-time on the left
    * @param rightKey/rightTime join key and effective-time on the right
    * @param payload        right columns to attach to matched left rows
    *                       (null when the left row has no prior right row)
    * @param rightTieBreak  deterministic tie order for right rows sharing
    *                       (key, time); the greatest value wins
    */
  def leftOuter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {

    val leftCols = left.columns.toSeq
    val lrowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val rightTypes = right.select(payload.map(col): _*).schema

    val tieCols = rightTieBreak.filterNot(payload.contains)
    val l2 = left.select(
      Seq(
        col(leftKey).as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__lrow")) ++
        payload.map(p => lit(null).cast(rightTypes(p).dataType).as(p)) ++
        tieCols.map(p => lit(null).cast(right.select(col(p)).schema.head.dataType).as(p)): _*)
    val r2 = right.select(
      Seq(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lrowType).as("__lrow")) ++
        payload.map(col) ++ tieCols.map(col): _*)

    val order: Seq[Column] =
      Seq(col("__t").asc, col("__side").asc) ++ rightTieBreak.map(col(_).asc)
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l2.unionByName(r2)
      .select(col("*") +: payload.map(p =>
        last(col(p), ignoreNulls = true).over(w).as(s"__m_$p")): _*)
      .where(col("__side") === 1)
      .select(leftCols.map(c => col("__lrow").getField(c).as(c)) ++
        payload.map(p => col(s"__m_$p").as(p)): _*)
  }
}
