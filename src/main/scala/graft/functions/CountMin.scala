package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Count-Min sketch as a mergeable native aggregate —
  * `cms_sketch(s, depth, width)` → `array<bigint>` of depth×width
  * counters (row-major), the Cormode–Muthukrishnan frequency sketch.
  *
  * Why an aggregate (SURVEY.md §2c "UDAF" scale path): the sketch IS
  * the 100 TB answer to "how often does each of 10⁹ tokens appear" when
  * the exact answer doesn't fit anywhere — each map task folds its
  * partition into a depth×width counter array, partial aggregation
  * merges them by ELEMENTWISE ADD (the sketch's defining property), and
  * one buffer of depth×width longs per task crosses the exchange
  * instead of the token stream. Point estimates then read
  * `min_d sketch[d·width + cell_d(w)]` — an overestimate, never under.
  *
  * Determinism: counters are sums over a multiset — commutative and
  * associative, so the sketch is bit-identical whatever the partition
  * order, and hash-compares against a SQL oracle that builds the same
  * cells by GROUP BY. The row hash is the first 8 hex digits of
  * `md5(d || ':' || s)` taken as an unsigned int mod width — chosen
  * because both engines can compute it exactly (Spark:
  * `conv(substring(md5(..),1,8),16,10)`; DuckDB:
  * `('0x' || substr(md5(..),1,8))::BIGINT`).
  */
case class CmsSketch(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int = depthExpr.eval().asInstanceOf[Int]
  private lazy val width: Int = widthExpr.eval().asInstanceOf[Int]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("cms_sketch requires a string column")
    else if (!depthExpr.foldable || depthExpr.dataType != IntegerType ||
      !widthExpr.foldable || widthExpr.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("cms_sketch requires literal int depth, width")
    else if (depthExpr.eval().asInstanceOf[Int] <= 0 ||
      widthExpr.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("cms_sketch requires depth > 0, width > 0")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  /** One digest instance per deserialized aggregate copy (= per task):
    * `digest()` leaves the instance reset, and update()/merge() run
    * single-threaded against their buffer, so reuse is safe — vs the
    * previous per-row-per-depth `getInstance` (4 allocations/row,
    * ~108M at the 100× probe's 27M tokens, and BASELINE.md already
    * names the md5 update as the dominant sketch-build cost). */
  @transient private lazy val md = MessageDigest.getInstance("MD5")

  /** First 8 md5 hex digits of "d:s" as an unsigned 32-bit value —
    * the cross-engine-computable row hash (see class doc). */
  private def cell(d: Int, s: String): Int = {
    val h = md.digest(s"$d:$s".getBytes(StandardCharsets.UTF_8))
    val u = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (u % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.toString
      var d = 0
      while (d < depth) { buf(d * width + cell(d, s)) += 1; d += 1 }
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
  override def prettyName: String = "cms_sketch"
  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2))
}
