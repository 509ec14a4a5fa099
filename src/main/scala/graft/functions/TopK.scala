package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Exact top-k values per group as a bounded min-heap aggregate —
  * `max_k(col, k)` → `array<double>` sorted descending.
  *
  * Why a custom `TypedImperativeAggregate` (SURVEY.md §2c "limit /
  * top-k" scale path): the window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY x DESC) <= k`) must
  * exchange and SORT every row of every group; this aggregate keeps a
  * k-element heap per group, so the shuffle carries k doubles per group
  * per map task — partial aggregation for an operation the built-in
  * aggregates can't express. At 100 TB that is the difference between
  * sorting the table and scanning it.
  *
  * Determinism: the result is the multiset of the k largest values,
  * sorted — independent of row order, so it hash-compares against a
  * sort+slice oracle.
  */
case class MaxK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Double]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("max_k requires a double column")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("max_k requires a literal int k")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("max_k requires k > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): mutable.PriorityQueue[Double] =
    mutable.PriorityQueue.empty[Double](Ordering[Double].reverse) // min-heap

  private def push(h: mutable.PriorityQueue[Double], v: Double): Unit =
    if (h.size < k) h.enqueue(v)
    else if (v > h.head) { h.dequeue(); h.enqueue(v) }

  override def update(h: mutable.PriorityQueue[Double],
      input: InternalRow): mutable.PriorityQueue[Double] = {
    val v = child.eval(input)
    if (v != null) push(h, v.asInstanceOf[Double])
    h
  }

  override def merge(a: mutable.PriorityQueue[Double],
      b: mutable.PriorityQueue[Double]): mutable.PriorityQueue[Double] = {
    b.foreach(push(a, _)); a
  }

  override def eval(h: mutable.PriorityQueue[Double]): Any =
    new GenericArrayData(h.toArray.sorted(Ordering[Double].reverse))

  override def serialize(h: mutable.PriorityQueue[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * h.size)
    bb.putInt(h.size)
    h.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = createAggregationBuffer()
    var i = 0
    while (i < n) { h.enqueue(bb.getDouble); i += 1 }
    h
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "max_k"
  override def children: Seq[Expression] = Seq(child, kExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
