package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * The reference's only extension point is a row-predicate trait
  * (`filter.rs:23-30`); our similarity-search operators need per-row
  * vector arithmetic, and a codegen'd `Expression` keeps it inside
  * whole-stage codegen — ~10-50× faster than the equivalent
  * `aggregate(zip_with(...))` lambda chain and usable from SQL after
  * [[VectorFunctions.register]].
  */

/** Element-type gate for the vector kernels: the generated getFloat /
  * getDouble reads interpret the Unsafe array buffer AT ITS DECLARED
  * STRIDE, so an array<double> fed to a float32 kernel (the natural SQL
  * literal `array(1.0, 2.0)` is array<double>) would read garbage
  * across word boundaries with no error — exactly the silent-wrong-
  * similarity class the analyzer must refuse. */
private[functions] object VectorTypeCheck {
  def requireElem(
      name: String, elem: DataType, args: Seq[Expression]): TypeCheckResult = {
    val bad = args.find(a => a.dataType match {
      case ArrayType(e, _) => e != elem
      case _ => true
    })
    bad match {
      case Some(a) => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<${elem.simpleString}> arguments, got ${a.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.requireElem("dot_f32", FloatType, Seq(left, right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2 norm of a float vector, as a codegen'd unary expression. */
case class NormF32(child: Expression) extends UnaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorTypeCheck.requireElem("norm_f32", FloatType, Seq(child))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x => {
      val fn = ctx.freshName("normF32")
      val code =
        s"""
           |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  double acc = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    double v = (double) arr.getFloat(i);
           |    acc += v * v;
           |  }
           |  return java.lang.Math.sqrt(acc);
           |}
         """.stripMargin
      val method = ctx.addNewFunction(fn, code)
      s"$method($x)"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Squared L2 distance between two vectors (float32 or float64 arrays in
  * either position; floats are widened to double exactly, accumulation is
  * a sequential index-order fold so results are bit-reproducible across
  * engines that fold the same way). The k-means assignment kernel: one
  * call per (row, centroid), inside whole-stage codegen. */
case class SqDist64(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // float32 OR float64 in either position; anything else (array<int>,
  // non-array) would be getDouble-read at the wrong stride — refuse at
  // analysis like the f32 kernels
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).find(a => a.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    })
    bad match {
      case Some(a) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects array<float> or array<double> arguments, got ${a.dataType.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val lGet = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ($lGet) - ($rGet);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorFunctions {

  /** All native kernels as (identifier, info, builder) descriptions —
    * consumed both by per-session [[register]] and by
    * [[graft.plans.GraftExtensions]] (session-wide injection). */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("dot_f32"),
        new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
        (children: Seq[Expression]) => DotF32(children(0), children(1))),
      (FunctionIdentifier("norm_f32"),
        new ExpressionInfo(classOf[NormF32].getName, "norm_f32"),
        (children: Seq[Expression]) => NormF32(children.head)),
      (FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => SimHash64(children.head)),
      (FunctionIdentifier("hamming64"),
        new ExpressionInfo(classOf[HammingDist].getName, "hamming64"),
        (children: Seq[Expression]) => HammingDist(children(0), children(1))),
      (FunctionIdentifier("md5_array"),
        new ExpressionInfo(classOf[Md5Array].getName, "md5_array"),
        (children: Seq[Expression]) => Md5Array(children.head)),
      (FunctionIdentifier("winnow64"),
        new ExpressionInfo(classOf[Winnow].getName, "winnow64"),
        (children: Seq[Expression]) => Winnow(children.head)),
      (FunctionIdentifier("shingles3"),
        new ExpressionInfo(classOf[Shingles3].getName, "shingles3"),
        (children: Seq[Expression]) => Shingles3(children.head)),
      (FunctionIdentifier("minhash16"),
        new ExpressionInfo(classOf[MinHash16].getName, "minhash16"),
        (children: Seq[Expression]) => MinHash16(children.head)),
      (FunctionIdentifier("normalize_text"),
        new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
        (children: Seq[Expression]) => NormalizeText(children.head)),
      (FunctionIdentifier("sqdist64"),
        new ExpressionInfo(classOf[SqDist64].getName, "sqdist64"),
        (children: Seq[Expression]) => SqDist64(children(0), children(1))),
      (FunctionIdentifier("bloom_any"),
        new ExpressionInfo(classOf[BloomAny].getName, "bloom_any"),
        (children: Seq[Expression]) => BloomAny(children(0), children(1))),
      (FunctionIdentifier("shingles_k"),
        new ExpressionInfo(classOf[ShinglesK].getName, "shingles_k"),
        (children: Seq[Expression]) => ShinglesK(children(0), children(1))),
      (FunctionIdentifier("count_in"),
        new ExpressionInfo(classOf[CountIn].getName, "count_in"),
        (children: Seq[Expression]) => CountIn(children(0), children(1))),
      (FunctionIdentifier("dsir_score"),
        new ExpressionInfo(classOf[DsirScore].getName, "dsir_score"),
        (children: Seq[Expression]) => DsirScore(children(0), children(1))),
      (FunctionIdentifier("bpe_count"),
        new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
        (children: Seq[Expression]) => BpeCount(children(0), children(1))),
      (FunctionIdentifier("bpe_segment"),
        new ExpressionInfo(classOf[BpeSegment].getName, "bpe_segment"),
        (children: Seq[Expression]) => BpeSegment(children(0), children(1))),
      (FunctionIdentifier("kmv_sketch"),
        new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
        (children: Seq[Expression]) => KmvSketch(children(0), children(1))),
      (FunctionIdentifier("mg_heavy"),
        new ExpressionInfo(classOf[MgHeavy].getName, "mg_heavy"),
        (children: Seq[Expression]) => MgHeavy(children(0), children(1))),
      (FunctionIdentifier("dsir_hist"),
        new ExpressionInfo(classOf[DsirHist].getName, "dsir_hist"),
        (children: Seq[Expression]) => DsirHist(children(0), children(1))),
      (FunctionIdentifier("zarr_timestamp"),
        new ExpressionInfo(classOf[ZarrTimestampExpr].getName, "zarr_timestamp"),
        (children: Seq[Expression]) => ZarrTimestampExpr(children(0), children(1))),
      (FunctionIdentifier("gram_hashes"),
        new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
        (children: Seq[Expression]) => GramHashes(children(0), children(1))),
      (FunctionIdentifier("redact_typed"),
        new ExpressionInfo(classOf[RedactTyped].getName, "redact_typed"),
        (children: Seq[Expression]) => RedactTyped(children(0), children(1))),
      (FunctionIdentifier("redact_report"),
        new ExpressionInfo(classOf[RedactReport].getName, "redact_report"),
        (children: Seq[Expression]) => RedactReport(children(0), children(1))))

  /** Register every kernel as a SQL-callable function on the session
    * (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    descriptions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
