package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise SUM + COUNT over an `array<double>` column in one
  * imperative aggregate (SURVEY.md H3's single-buffer discipline applied
  * to the k-means recompute): `groupBy(centroid).agg(VectorSumCount(v))`
  * replaces the posexplode → (centroid, pos) hash-agg → collect/reassemble
  * two-shuffle spelling. The scale difference is the shuffle payload —
  * each map partition forwards ONE (d+1)-double partial per group
  * (k·d per partition, bounded by the k/d PARAMETERS) instead of n·d
  * exploded element rows; per round that turns the dominant exchange
  * from corpus-proportional to parameter-bounded. Accumulation order is
  * partition-nondeterministic exactly like the avg() it replaces —
  * acceptable for centroid training (documented float-mean contract;
  * every consumer re-ranks with exact cosine).
  *
  * Buffer layout: empty until the first row (the dimension is read from
  * the data), then [count, sum_0, …, sum_{d-1}].
  */
case class VectorSumCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("vsum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "vector_sum_count"

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) new Array[Double](d + 1) else buf
    require(b.length == d + 1,
      s"vector_sum_count: ragged input (dim ${b.length - 1} vs $d)")
    b(0) += 1.0
    var i = 0
    while (i < d) {
      if (!arr.isNullAt(i)) b(i + 1) += arr.getDouble(i)
      i += 1
    }
    b
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    if (b.isEmpty) return a
    if (a.isEmpty) return b
    require(a.length == b.length,
      s"vector_sum_count: ragged merge (${a.length - 1} vs ${b.length - 1})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty) return null // empty group (global agg over zero rows)
    val row = new GenericInternalRow(2)
    row.update(0, new GenericArrayData(java.util.Arrays.copyOfRange(buf, 1, buf.length)))
    row.setLong(1, buf(0).toLong)
    row
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): VectorSumCount =
    copy(child = newChildren.head)
}

object VectorSumCount {
  def apply(v: Column): Column =
    GraftColumnBridge.column(
      VectorSumCount(GraftColumnBridge.expression(v)).toAggregateExpression())
}
