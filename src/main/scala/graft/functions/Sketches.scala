package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Single-pass sketch aggregates (SURVEY.md H3).
  *
  * The column-per-component spelling (64 separate `min(xxhash64(h, i))` /
  * `sum(when(bit))` aggregate columns) is codegen'd but generates very
  * large methods — most of d2/d4's wall time at bench scale was Janino
  * compilation, and the agg buffer is a 64-field UnsafeRow touched per
  * input. These imperative aggregates keep one primitive array buffer and
  * update all k components in a tight loop per input row.
  */

/** MinHash signature: array of k minima of seeded rehashes of `child`
  * (a 64-bit hash column). Component i equals
  * `min(xxhash64(h, i))` = min over rows of XXH64.hashInt(i, XXH64.hashLong(h, 42))
  * — bit-compatible with the SQL spelling, so LSH banding built on either
  * agrees.
  */
case class MinHashSignature(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(k >= 1 && k <= 1024)

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var i = 0
      while (i < k) {
        val h = XXH64.hashInt(i, base)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSignature =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHashSignature =
    copy(child = newChildren.head)
}

object MinHashSignature {
  def apply(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(h), k).toAggregateExpression())
}

/** 64-bit SimHash of a stream of 64-bit token hashes: per-bit ±1 votes in
  * one int-array buffer, sign-packed on eval. Equals the 64-column
  * `sum(when(bit,1,-1))` spelling.
  */
case class SimHash64(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var bits = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) bits |= 1L << i; i += 1 }
    bits
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHash64 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHash64 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHash64 =
    copy(child = newChildren.head)
}

object SimHash64 {
  def apply(h: Column): Column =
    GraftColumnBridge.column(
      SimHash64(GraftColumnBridge.expression(h)).toAggregateExpression())
}
