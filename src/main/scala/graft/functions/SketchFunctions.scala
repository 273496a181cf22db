package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate.
  *
  * This is the distributed-sketch shape `collect_set` cannot give:
  * aggregation state is a bounded set of the k smallest DISTINCT hash
  * values — at most k longs per group no matter how many rows flow in —
  * and two partial states merge by unioning and re-truncating to k. So
  * map-side partial aggregation reduces each partition to ≤k longs per
  * group before the shuffle, and executor memory is O(groups × k)
  * regardless of input size.
  *
  * Unlike HLL (q29, rows-only), KMV over a deterministic hash is exactly
  * reproducible in any engine: the DuckDB oracle ranks the same distinct
  * md5-derived hashes and reads the k-th smallest. Estimator (Bar-Yossef
  * et al. 2002): with hashes uniform on [0, 2^52), the k-th smallest
  * h_k estimates the cardinality as (k-1) * 2^52 / h_k; when fewer than
  * k distinct hashes exist the sketch IS the exact distinct set.
  *
  * Output is the raw sketch summary `struct(n, kth)` — n = min(#distinct,
  * k), kth = k-th smallest hash (null until k are seen) — so the query
  * states the estimator arithmetic explicitly and the oracle can mirror
  * it token-for-token.
  */
case class KmvSketch(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with BinaryLike[Expression] {

  // k comes from a foldable literal, like CountIn's vocab argument
  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("kmv_sketch hash input must be BIGINT")
    else if (!right.foldable || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("kmv_sketch k must be an INT literal")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("kmv_sketch k must be >= 2")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("kth", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = left.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // keep only the k smallest: skip anything ≥ the current k-th
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (buf.size < k || h < buf.last()) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val kth: Any = if (buf.size >= k) buf.last() else null
    new GenericInternalRow(Array[Any](buf.size.toLong, kth))
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvSketch =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "kmv_sketch"
}
