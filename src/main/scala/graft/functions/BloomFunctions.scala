package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Broadcast-bloom membership kernel for decontamination at scale.
  *
  * The 100 TB pattern: build a bloom filter over the SMALL side (the
  * held-out/test n-grams) with `df.stat.bloomFilter` (a distributed
  * treeAggregate), serialize it into a literal, and scan-filter the big
  * corpus with `bloom_any(bytes, grams)` — no shuffle touches the big
  * side; only bloom-positive candidates (true overlaps + the fp rate)
  * proceed to the exact verification join. Mirrors the runtime-filter
  * idea of Spark's own InjectRuntimeFilter, but as a user-level operator
  * with an explicit exact-verify stage so results stay exact.
  */
object BloomOps {

  /** Per-JVM deserialization cache keyed by byte-array IDENTITY: the
    * same array instance arrives in the task binary once (the plan's
    * literal and the codegen reference dedup under Java serialization),
    * and each executor inflates it to a BloomFilter once. Weak keys let
    * the bitset go away with the task binary. */
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[Array[Byte], BloomFilter]())

  def bloomFor(bytes: Array[Byte]): BloomFilter =
    cache.computeIfAbsent(bytes,
      b => BloomFilter.readFrom(new ByteArrayInputStream(b)))

  /** True iff ANY element of `arr` might be in the bloom filter (null
    * elements are never members). Membership is checked with the utf8
    * bytes — identical hashing to `putString`/`putBinary` used by
    * `DataFrameStatFunctions.bloomFilter` on a string column. */
  def containsAny(bloom: BloomFilter, arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
        bloom.mightContainBinary(arr.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  /** Serialize a bloom filter for embedding as a binary literal. */
  def toBytes(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }
}

/** `bloom_any(bloom_bytes, array<string>)` — true iff any array element
  * might be in the serialized bloom filter. `left` must be a literal
  * (the bloom is deserialized once per executor, not per row); codegen
  * pins the deserialized filter as a referenced object.
  */
case class BloomAny(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_any"

  // the SAME array instance as the literal child's value, so the task
  // binary carries the bits once (Java serialization dedups by identity)
  @transient private lazy val bloomBytes: Array[Byte] = {
    require(left.foldable, "bloom_any: bloom bytes must be a literal")
    left.eval(null).asInstanceOf[Array[Byte]]
  }

  override def nullSafeEval(bytes: Any, arr: Any): Any =
    BloomOps.containsAny(BloomOps.bloomFor(bloomBytes), arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bloomVar = ctx.addMutableState(classOf[BloomFilter].getName, "bloomAny",
      v => s"$v = graft.functions.BloomOps.bloomFor($bytesRef);")
    defineCodeGen(ctx, ev, (_, arr) => s"graft.functions.BloomOps.containsAny($bloomVar, $arr)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
