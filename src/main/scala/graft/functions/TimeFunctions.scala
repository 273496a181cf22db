package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, TimestampNTZType}

/** `zarr_timestamp(counts, unit)` — the documented ergonomics helper for
  * Zarr v2 `datetime64` columns, which this engine deliberately surfaces
  * as RAW int64 counts (lossless for every unit, NaT preserved; see
  * ZarrMeta's datetime64 note and the reference's int64 passthrough at
  * `table_provider.rs` type mapping). This expression is the EXPLICIT
  * conversion step a pipeline opts into:
  *
  *  - unit-aware: 'W'/'D'/'h'/'m'/'s'/'ms'/'us' scale exactly to
  *    microseconds (overflow is a loud error, never a wrapped instant);
  *    'ns' TRUNCATES toward negative infinity to whole microseconds —
  *    the one lossy step, made visible here instead of hidden in a scan;
  *  - numpy's NaT sentinel (Long.MinValue) becomes SQL NULL — the
  *    missing-value semantics every downstream aggregate expects;
  *  - calendar units ('Y'/'M') are refused: they have no fixed
  *    microsecond width, so converting them silently would guess.
  *
  * Returns TIMESTAMP_NTZ (the wall-instant-free type both Spark's
  * parquet writer and DuckDB's TIMESTAMP agree on byte-for-byte), and
  * stays inside whole-stage codegen. Registered by
  * [[VectorFunctions.register]]; usable as
  * `SELECT zarr_timestamp(ts, 'ns') FROM zarr_table`.
  */
case class ZarrTimestampExpr(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = TimestampNTZType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zarr_timestamp expects a BIGINT counts column, got ${left.dataType}")
    else if (right.dataType != StringType || !right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "zarr_timestamp expects a literal unit string ('W','D','h','m','s','ms','us','ns')")
    else {
      // resolve the unit at analysis: a bad (or NULL) unit fails the
      // QUERY with a typed error, not row 1 (and never an NPE)
      val u = right.eval()
      if (u == null)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "zarr_timestamp: unit must be a non-null literal string")
      else
        try {
          ZarrTimestampExpr.scaleOf(u.toString)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        } catch {
          case e: IllegalArgumentException =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e.getMessage)
        }
    }
  }

  private lazy val unit: String = right.eval().toString

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) null
    else {
      val counts = v.asInstanceOf[Long]
      if (counts == Long.MinValue) null // numpy NaT
      else ZarrTimestampExpr.toMicros(counts, unit)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val u = ctx.addReferenceObj("unit", unit, "java.lang.String")
    val leftGen = left.genCode(ctx)
    ev.copy(code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = true;
         |long ${ev.value} = 0L;
         |if (!${leftGen.isNull} && ${leftGen.value} != Long.MIN_VALUE) {
         |  ${ev.isNull} = false;
         |  ${ev.value} = graft.functions.ZarrTimestampExpr.toMicros(${leftGen.value}, $u);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ZarrTimestampExpr {
  /** Microseconds per unit count; -1 marks the divide (ns) case. */
  def scaleOf(unit: String): Long = unit match {
    case "W" => 7L * 86400L * 1000000L
    case "D" => 86400L * 1000000L
    case "h" => 3600L * 1000000L
    case "m" => 60L * 1000000L
    case "s" => 1000000L
    case "ms" => 1000L
    case "us" => 1L
    case "ns" => -1L
    case other => throw new IllegalArgumentException(
      s"zarr_timestamp: unsupported unit '$other' — fixed-width units are " +
        "W/D/h/m/s/ms/us/ns; calendar units (Y/M) have no fixed microsecond " +
        "width, convert them explicitly upstream")
  }

  /** Exact unit→microsecond conversion; ns truncates toward negative
    * infinity (floorDiv — the instant at or before the ns tick);
    * multiplication overflow is a loud error, never a wrapped instant. */
  def toMicros(counts: Long, unit: String): Long = {
    val scale = scaleOf(unit)
    if (scale == -1L) Math.floorDiv(counts, 1000L)
    else
      try Math.multiplyExact(counts, scale)
      catch {
        case _: ArithmeticException => throw new ArithmeticException(
          s"zarr_timestamp: $counts ${unit} overflows the TIMESTAMP range")
      }
  }
}
