package graft.operators

import graft.{QueryDef, Tables}
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
  *   3. `last(rightStruct, ignoreNulls = true)` over an unbounded-
  *      preceding row frame carries the latest right row forward onto
  *      every subsequent left row — the whole payload travels as ONE
  *      struct so a matched right row whose payload field is genuinely
  *      NULL is preserved atomically (per-column carries would skip the
  *      null and tear the row, mixing fields from different right rows);
  *   4. keep the left rows and unpack the carried struct.
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
    * @param tolerance      max allowed staleness `leftTime - rightTime`
    *                       (same unit as the time columns, which must be
    *                       numeric); a match older than this is nulled
    *                       out, like pandas `merge_asof(tolerance=...)`.
    *                       None → unbounded lookback
    */
  def leftOuter(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTime: String,
      rightKey: String,
      rightTime: String,
      payload: Seq[String],
      rightTieBreak: Seq[String] = Nil,
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns.toSeq
    val lrowType = left.select(struct(leftCols.map(col): _*)).schema.head.dataType

    // the right row travels as ONE struct (payload + tie-break cols +
    // its own time, for the tolerance check), so carry-forward is
    // atomic: a matched right row with a NULL payload field stays null
    // instead of falling back to an older right row.
    val tieCols = rightTieBreak.filterNot(payload.contains)
    val rrowStruct = struct(
      (payload ++ tieCols).map(col) :+ col(rightTime).as("__rt"): _*)
    val rrowType = right.select(rrowStruct).schema.head.dataType

    val l2 = left.select(
      col(leftKey).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      struct(leftCols.map(col): _*).as("__lrow"),
      lit(null).cast(rrowType).as("__rrow"))
    // NULL never matches in an as-of join (pandas merge_asof, DuckDB
    // ASOF): a right row with a NULL key or NULL time must not be
    // carried onto anything — without this filter, NULL keys group
    // together under partitionBy and a NULL-time right row sorts first
    // (asc nulls-first) and becomes "the match" for its whole key.
    // Left rows with NULL key/time need no filter: after this drop
    // their window frame holds no right rows, so they carry NULL.
    val r2 = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lrowType).as("__lrow"),
        rrowStruct.as("__rrow"))

    val order: Seq[Column] =
      Seq(col("__t").asc, col("__side").asc) ++
        rightTieBreak.map(tc => col("__rrow").getField(tc).asc)
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l2.unionByName(r2)
      .withColumn("__m", last(col("__rrow"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    // tolerance: a carried match staler than the bound reads as no match
    val inTol = tolerance match {
      case Some(t) => col("__t") - col("__m").getField("__rt") <= t
      case None => lit(true)
    }
    carried.select(leftCols.map(c => col("__lrow").getField(c).as(c)) ++
      payload.map(p => when(inTol, col("__m").getField(p)).as(p)): _*)
  }

  /** q45: each click event joined to the latest prior-or-equal purchase by
    * the same user. DuckDB has a native `ASOF JOIN` — a perfect oracle.
    * The right side is pre-deduplicated per (user_id, ts) so that equal-
    * time ties cannot make either engine's pick nondeterministic. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q45_asof_join",
      """WITH c AS (
        |  SELECT event_id, user_id, ts, round(value, 2) AS value
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, max(event_id) AS p_event_id,
        |    round(max(value), 2) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts, c.value,
        |  p.p_event_id, p.p_value
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      // ts is a raw nanosecond long (Tables.load); DuckDB reads the same
      // parquet at µs precision. Truncate to µs BEFORE the join so both
      // engines see identical times everywhere — the compare, the
      // per-(user, ts) right-side dedup group, and the output — rather
      // than relying on the data never colliding within a microsecond.
      val ev = Tables.load(s, dir, "events")
        .withColumn("ts", expr("ts div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(col("value"), 2).as("value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("p_event_id"),
          round(max(col("value")), 2).as("p_value"))
      leftOuter(clicks, purchases,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "user_id", rightTime = "ts",
        payload = Seq("p_event_id", "p_value"))
        .orderBy("event_id")
    })
}
