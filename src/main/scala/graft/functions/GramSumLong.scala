package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** INTEGER-EXACT second-moment (Gram) accumulator over an `array<long>`
  * column: one pass emits n, the first-moment sums s_i, and the
  * upper-triangle product sums s_ij — the sufficient statistics for the
  * exact covariance matrix of a quantized embedding corpus (SURVEY.md
  * D12). Integer addition is commutative and associative, so unlike
  * every float reduction in this pack the result is bit-determined with
  * NO fold-order discipline — any partition order, any merge tree, any
  * engine produces the identical longs, which is what makes a
  * corpus-sized covariance FULLY oracle-checkable.
  *
  * Scale shape (the VectorSumCount/H13 argument): each map partition
  * forwards ONE (1 + d + d(d+1)/2)-long partial — d=64 ⇒ 2 145 longs,
  * ~17 KB — instead of n·d(d+1)/2 exploded product rows; the exchange
  * is parameter-bounded, the per-row work is the d(d+1)/2 multiply-adds
  * a covariance pass fundamentally costs.
  *
  * Overflow contract: sums accumulate with Math.addExact and FAIL LOUD
  * (never wrap silently into a wrong covariance). With inputs quantized
  * to `b` fractional bits and |x| ≤ 1, products are ≤ 2^2b, so a long
  * holds ≥ 2^(62−2b) rows — b=10 ⇒ ~4.6×10^12 rows (beyond a 100 TB
  * 64-dim corpus); larger b trades capacity for precision and the
  * thrown ArithmeticException is the signal the caller picked b too
  * large for the corpus, not a wrong answer.
  *
  * Buffer layout: empty until the first row (d is read from the data),
  * then [n, s_0..s_{d−1}, p_00, p_01, …, p_{d−1,d−1}] with the products
  * row-major over the upper triangle (i ≤ j). eval emits the pairs as
  * (i, j, p) structs so consumers never re-derive triangle indexing.
  */
case class GramSumLong(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("pairs", ArrayType(StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("p", LongType, nullable = false))), containsNull = false),
      nullable = false)))
  override def prettyName: String = "gram_sum_long"

  override def createAggregationBuffer(): Array[Long] = Array.empty[Long]

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val len = 1 + d + d * (d + 1) / 2
    val b = if (buf.isEmpty) new Array[Long](len) else buf
    require(b.length == len,
      s"gram_sum_long: ragged input (buffer dim vs $d)")
    val x = new Array[Long](d)
    var i = 0
    while (i < d) { x(i) = if (arr.isNullAt(i)) 0L else arr.getLong(i); i += 1 }
    b(0) = Math.addExact(b(0), 1L)
    var k = 1 + d
    i = 0
    while (i < d) {
      b(1 + i) = Math.addExact(b(1 + i), x(i))
      var j = i
      while (j < d) {
        b(k) = Math.addExact(b(k), Math.multiplyExact(x(i), x(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"gram_sum_long: ragged merge (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf.isEmpty) return null // empty group (global agg over zero rows)
    // invert len = 1 + d + d(d+1)/2 exactly by scanning (d is small)
    var d = 0
    while (1 + d + d * (d + 1) / 2 < buf.length) d += 1
    require(1 + d + d * (d + 1) / 2 == buf.length,
      s"gram_sum_long: corrupt buffer length ${buf.length}")
    val pairs = new Array[Any](d * (d + 1) / 2)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val pr = new GenericInternalRow(3)
        pr.setInt(0, i); pr.setInt(1, j); pr.setLong(2, buf(1 + d + k))
        pairs(k) = pr
        k += 1
        j += 1
      }
      i += 1
    }
    val row = new GenericInternalRow(3)
    row.setLong(0, buf(0))
    row.update(1, new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, 1 + d)))
    row.update(2, new GenericArrayData(pairs))
    row
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): GramSumLong =
    copy(child = newChildren.head)
}

object GramSumLong {
  def apply(v: Column): Column =
    GraftColumnBridge.column(
      GramSumLong(GraftColumnBridge.expression(v)).toAggregateExpression())
}
