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

/** Misra-Gries heavy-hitter summary as a native Catalyst aggregate
  * (`mg_heavy(item, k)` → array of candidate items).
  *
  * Aggregation state is at most k (item, count) counters per group no
  * matter how many rows flow in: a present item increments its counter,
  * a new item takes a free counter, and a miss with all counters busy
  * decrements every counter (dropping zeros) — the classic Misra-Gries
  * update. Two partials merge by count-wise union then subtracting the
  * (k+1)-th largest count from all (Agarwal et al. 2013), which
  * preserves the deficit bound under ANY merge tree, so map-side
  * partial aggregation works and the shuffle carries ≤k counters per
  * partition.
  *
  * Guarantee: every item with true frequency > n/k survives in the
  * final summary regardless of row order or partitioning (the summary
  * CONTENT is order-dependent; the coverage guarantee is not). The
  * counts are approximations, so only the ITEMS are exposed — callers
  * run a bounded exact-count verify pass over the ≤k candidates, which
  * is the standard two-pass exact heavy-hitter recipe at scale: the
  * full-cardinality groupBy never happens.
  */
case class MgHeavy(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with BinaryLike[Expression] {

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("mg_heavy item input must be STRING")
    else if (!right.foldable || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("mg_heavy k must be an INT literal")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("mg_heavy k must be >= 2")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val s = v.toString
      if (buf.containsKey(s)) buf.put(s, buf.get(s) + 1L)
      else if (buf.size < k) buf.put(s, 1L)
      else { // decrement-all, drop zeros
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = if (buf.containsKey(e.getKey)) buf.get(e.getKey) else 0L
      buf.put(e.getKey, prev + e.getValue)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all; drop non-positive
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= pivot) eit.remove() else e.setValue(e.getValue - pivot)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val items = new java.util.ArrayList[String](buf.keySet())
    java.util.Collections.sort(items)
    val out = new Array[Any](items.size)
    var i = 0
    while (i < items.size) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(items.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    // encode each key ONCE (serialize runs per group per exchange/spill;
    // a second sizing-pass encode would double the allocation here)
    val keys = new Array[Array[Byte]](buf.size)
    val vals = new Array[Long](buf.size)
    var bytes = 4
    var i = 0
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      keys(i) = e.getKey.getBytes("UTF-8")
      vals(i) = e.getValue
      bytes += 4 + keys(i).length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    i = 0
    while (i < keys.length) {
      bb.putInt(keys(i).length); bb.put(keys(i)); bb.putLong(vals(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(new String(kb, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MgHeavy =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): MgHeavy =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MgHeavy =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mg_heavy"
}

/** `dsir_hist(feats, n)` — per-group histogram of DSIR hash buckets as a
  * native Catalyst aggregate: for every element of every input feature
  * array, bucket = int(first 4 md5 hex digits of the element's UTF-8
  * bytes) mod n — the exact [[HashOps.dsirScore]] / q109-oracle bucket
  * identity — and the output is the n-long count array.
  *
  * This replaces the explode + groupBy(bucket) shape for DSIR's pass 1:
  * aggregation state is one long[n] per group per partition (mergeable
  * by element-wise add, so map-side partial aggregation reduces each
  * partition to n longs per group before the shuffle), and the feature
  * arrays never fan out into per-feature rows — the md5 runs in one
  * tight loop per array. Null arrays and null elements contribute
  * nothing, but their GROUP still exists (so a source whose docs have
  * no features still appears with a zero histogram).
  */
case class DsirHist(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with BinaryLike[Expression] {

  private lazy val n: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("dsir_hist input must be ARRAY<STRING>")
    else if (!right.foldable || right.dataType != IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("dsir_hist bucket count must be an INT literal")
    else if (right.eval() == null || right.eval().asInstanceOf[Number].intValue() < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure("dsir_hist bucket count must be >= 1")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = left.eval(input)
    if (v != null) {
      val feats = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val md = java.security.MessageDigest.getInstance("MD5")
      val m = feats.numElements()
      var i = 0
      while (i < m) {
        if (!feats.isNullAt(i)) {
          val d = md.digest(feats.getUTF8String(i).getBytes)
          // first 4 hex digits = first 2 bytes — the dsirScore identity
          buf((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % n) += 1L
          md.reset()
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    var i = 0
    while (i < n) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): DsirHist =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): DsirHist =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DsirHist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dsir_hist"
}
