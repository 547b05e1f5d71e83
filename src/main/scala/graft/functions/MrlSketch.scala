package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Deterministic MERGEABLE rank/quantile sketch — the compactor
  * hierarchy of Manku, Rajagopalan & Lindsay (1998, "Approximate Medians
  * and other Quantiles in One Pass and with Limited Memory"), which is
  * also the non-randomized baseline of Karnin, Lang & Liberty (2016,
  * "Optimal Quantile Approximation in Streams"). This is the capability
  * x2's Greenwald–Khanna CANNOT provide and x12's histogram only fakes
  * under a fixed-bin assumption: a small serialized summary that can be
  * stored per partition/day and UNIONED later to answer any-grain
  * quantile questions without rescanning raw data (the x4 mergeable-HLL
  * story applied to quantiles).
  *
  * State: one buffer per level l, capacity k, each stored item standing
  * for 2^l original items. A full level sorts and keeps every other item
  * (the survivor offset ALTERNATES per level — deterministic, no RNG:
  * the engine-wide no-randomness discipline), pushing k/2 items of
  * doubled weight up one level; an odd leftover stays at its level. Each
  * pair-compaction at level l moves any fixed rank by at most 2^(l-1),
  * and a level compacts at most n/(2^(l-1)·k) times, so the total rank
  * error is <= L·n/k with L = number of levels ~ log2(n/k) — the bound
  * holds under ANY merge order, which is what makes the estimate safe to
  * gate even though Spark's partition/merge order varies run to run.
  */
final class MrlState(val k: Int) {
  require(k >= 4 && k % 2 == 0, s"mrl k must be even and >= 4, got $k")
  var n: Long = 0L
  val levels = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[Double]]
  val parity = scala.collection.mutable.ArrayBuffer.empty[Boolean]

  private def ensure(l: Int): Unit =
    while (levels.size <= l) {
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      parity += false
    }

  def add(x: Double): Unit = {
    ensure(0)
    levels(0) += x
    n += 1
    sweep()
  }

  /** Compact every full level, bottom-up (a compaction can only fill
    * HIGHER levels, so one upward pass reaches a fixpoint).
    */
  private def sweep(): Unit = {
    var l = 0
    while (l < levels.size) {
      if (levels(l).size >= k) compact(l)
      l += 1
    }
  }

  private def compact(l: Int): Unit = {
    ensure(l + 1)
    val arr = levels(l).toArray
    java.util.Arrays.sort(arr)
    val even = arr.length - (arr.length % 2)
    val keepOdd = parity(l)
    parity(l) = !keepOdd
    val out = levels(l + 1)
    var i = if (keepOdd) 1 else 0
    while (i < even) { out += arr(i); i += 2 }
    levels(l).clear()
    if (even < arr.length) levels(l) += arr(arr.length - 1) // odd leftover keeps its weight
  }

  def merge(other: MrlState): MrlState = {
    require(other.k == k, s"cannot union MRL sketches of different k: $k vs ${other.k}")
    var l = 0
    while (l < other.levels.size) {
      ensure(l)
      levels(l) ++= other.levels(l)
      l += 1
    }
    n += other.n
    sweep()
    this
  }

  /** Smallest stored value whose cumulative weight reaches q·n. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"q must be in [0,1], got $q")
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    require(items.nonEmpty, "quantile of an empty sketch")
    val sorted = items.sortBy(_._1)
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  def serialize(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(k)
    out.writeLong(n)
    out.writeInt(levels.size)
    var l = 0
    while (l < levels.size) {
      out.writeBoolean(parity(l))
      out.writeInt(levels(l).size)
      levels(l).foreach(out.writeDouble)
      l += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object MrlState {
  def deserialize(bytes: Array[Byte]): MrlState = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val st = new MrlState(in.readInt())
    st.n = in.readLong()
    val nl = in.readInt()
    var l = 0
    while (l < nl) {
      st.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      st.parity += in.readBoolean()
      val m = in.readInt()
      var i = 0
      while (i < m) { st.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    st
  }
}

/** Build one MRL sketch per group from a DOUBLE column → BINARY. */
case class MrlSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlState] with ExpectsInputTypes {

  require(k >= 4 && k % 2 == 0 && k <= 65536, s"mrl_sketch k must be even in [4, 65536], got $k")

  override def inputTypes = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mrl_sketch"

  override def createAggregationBuffer(): MrlState = new MrlState(k)

  override def update(buf: MrlState, input: InternalRow): MrlState = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: MrlState, b: MrlState): MrlState = a.merge(b)
  override def eval(buf: MrlState): Any = buf.serialize()
  override def serialize(buf: MrlState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MrlState = MrlState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MrlSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MrlSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MrlSketchAgg =
    copy(child = newChildren.head)
}

object MrlSketchAgg {
  def apply(value: Column, k: Int): Column =
    GraftColumnBridge.column(
      MrlSketchAgg(GraftColumnBridge.expression(value), k).toAggregateExpression())
}

/** Union previously-built MRL sketches (BINARY column) → BINARY — the
  * any-grain roll-up over stored partials (hll_union_agg's shape).
  */
case class MrlUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MrlState] with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mrl_union"

  // k adopted from the first arriving sketch: a 0-item placeholder that
  // merges k-compatibly with anything
  override def createAggregationBuffer(): MrlState = new MrlState(4)

  private def mergeInto(a: MrlState, b: MrlState): MrlState =
    if (b.n == 0L && b.levels.isEmpty) a
    else if (a.n == 0L && a.levels.isEmpty) b
    else a.merge(b)

  override def update(buf: MrlState, input: InternalRow): MrlState = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeInto(buf, MrlState.deserialize(v.asInstanceOf[Array[Byte]]))
  }

  override def merge(a: MrlState, b: MrlState): MrlState = mergeInto(a, b)
  override def eval(buf: MrlState): Any = buf.serialize()
  override def serialize(buf: MrlState): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MrlState = MrlState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MrlUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MrlUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MrlUnionAgg =
    copy(child = newChildren.head)
}

object MrlUnionAgg {
  def apply(sketch: Column): Column =
    GraftColumnBridge.column(
      MrlUnionAgg(GraftColumnBridge.expression(sketch)).toAggregateExpression())
}

/** Quantile estimate from a serialized MRL sketch. Scalar post-aggregate
  * work on a handful of rows — interpreted eval is the right cost class
  * (the H2/H6 documented-choice convention).
  */
case class MrlQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "mrl_quantile"

  override def nullSafeEval(sketch: Any, q: Any): Any = {
    val st = MrlState.deserialize(sketch.asInstanceOf[Array[Byte]])
    if (st.n == 0L) null else st.quantile(q.asInstanceOf[Double])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MrlQuantile =
    copy(left = newLeft, right = newRight)
}

object MrlQuantile {
  def apply(sketch: Column, q: Double): Column =
    GraftColumnBridge.column(MrlQuantile(
      GraftColumnBridge.expression(sketch),
      org.apache.spark.sql.catalyst.expressions.Literal(q)))
}
