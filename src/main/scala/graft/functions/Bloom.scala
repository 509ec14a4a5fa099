package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Bloom filter over a bigint key column as a mergeable native
  * aggregate — `bloom_agg(key, mBits, k)` → `array<bigint>` bitset
  * (mBits/64 words), for user-spellable SEMI-JOIN REDUCTION.
  *
  * The 100 TB move this enables: build the filter on the SMALL
  * (already-filtered) side of a join — one bitset per map task, merged
  * by bitwise OR — broadcast the final array (a few KB), and drop
  * probe-side rows BEFORE their shuffle. A 99%-selective dimension
  * predicate then cuts the fact-side exchange by ~99% at the cost of a
  * scan-side filter; false positives are removed by the real join, so
  * the result is EXACTLY the plain join's (which is what the oracle
  * checks — the bloom is a plan property, not a semantics change).
  *
  * Hashing: bit_i(key) = pmod(xxhash64(i::bigint, key), mBits), i in
  * 1..k — the PUBLIC `xxhash64` SQL function's exact chain
  * (h = hashLong(i, 42); h = hashLong(key, h)), so the probe side
  * needs no custom expression at all: membership is spelled with
  * built-in, whole-stage-codegen'd `xxhash64`/`shiftleft`/array
  * indexing, and BloomSpec pins bit-for-bit agreement between this
  * aggregate and the SQL expression.
  */
case class BloomAgg(
    child: Expression,
    mExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val mBits: Int = mExpr.eval().asInstanceOf[Int]
  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("bloom_agg requires a bigint key")
    else if (!mExpr.foldable || mExpr.dataType != IntegerType ||
      !kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("bloom_agg requires literal int mBits, k")
    else if (mExpr.eval().asInstanceOf[Int] <= 0 ||
      mExpr.eval().asInstanceOf[Int] % 64 != 0 ||
      kExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure(
        "bloom_agg requires mBits > 0 divisible by 64 and k > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  /** Same chain as SQL `xxhash64(CAST(i AS BIGINT), key)`. */
  private def bit(i: Int, key: Long): Int =
    java.lang.Math.floorMod(
      XXH64.hashLong(key, XXH64.hashLong(i.toLong, 42L)), mBits.toLong).toInt

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var i = 1
      while (i <= k) {
        val b = bit(i, key)
        buf(b >>> 6) |= 1L << (b & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child, mExpr, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), mExpr = newChildren(1),
      kExpr = newChildren(2))
}

object Bloom {
  /** SQL predicate testing key membership in a `bloom_agg(…, mBits, k)`
    * bitset column — built-ins only, stays inside whole-stage codegen.
    * `bl` must be an `array<bigint>` column name, `key` a bigint
    * expression string. */
  def containsSql(bl: String, key: String, mBits: Int, k: Int): String =
    (1 to k).map { i =>
      val b = s"pmod(xxhash64(cast($i as bigint), $key), $mBits)"
      s"(($bl[cast($b div 64 as int)] & shiftleft(1L, cast($b % 64 as int))) != 0)"
    }.mkString(" AND ")
}
