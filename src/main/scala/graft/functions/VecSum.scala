package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Elementwise sum of fixed-dimension long vectors as ONE mergeable
  * native aggregate — `vec_sum(q, d)` → `array<bigint>` of length d.
  *
  * This is the centroid-training primitive of the whole ANN/clustering
  * family (Σv per cell for k-means/IVF/SemDeDup). Expressed as 64
  * separate `sum(q[i])` columns it works, but each site makes Catalyst
  * plan 65 aggregate expressions and janino compile a HashAggregate
  * class big enough that its COLD compile dominates the query (measured:
  * the training collect runs 3.9 s cold vs 0.8 s warm at sf0.1 — and
  * under the benchmark's interleaved passes the 100-entry codegen cache
  * always evicts these classes between reps, so the first family query
  * of every pass pays the full tax). One imperative buffer replaces all
  * 64 update expressions: the generated code shrinks to a single
  * aggregate call, while the exchange payload stays the same K×d longs
  * (partial buffers merge by elementwise add — the CMS/HLL property).
  *
  * Overflow: Long addition wraps silently; with ×10⁴ fixed-point
  * quantization (|q_i| ≲ 2·10⁴) the per-cell sums wrap past ~4.6e14
  * rows per cell — far beyond any real cell, and the same bound the
  * 64-column formulation had (`sum(q[i])` is the identical Long sum).
  */
case class VecSum(
    child: Expression,
    dimExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val dim: Int = dimExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[ArrayType] ||
      child.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure("vec_sum requires array<bigint>")
    else if (!dimExpr.foldable || dimExpr.dataType != IntegerType ||
      dimExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("vec_sum requires a literal int dim > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      var i = 0
      while (i < n) { buf(i) += arr.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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
  override def prettyName: String = "vec_sum"
  override def children: Seq[Expression] = Seq(child, dimExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dimExpr = newChildren(1))
}
