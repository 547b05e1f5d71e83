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

/** KMV (k-minimum-values) theta sketch: the k smallest DISTINCT values of
  * a 64-bit-hash column, as an ascending array. State is bounded at k
  * longs no matter how many rows stream through, merges are
  * order-independent, and the sketch is EXACT below capacity (fewer than
  * k distinct hashes => the array IS the distinct set) — beyond it, the
  * k-th value is the theta threshold: everything below theta is a
  * uniform sample of the set at rate theta, which is what makes
  * distinct/overlap estimation (Sketching x6) a count-and-divide.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinValues.Buffer]
    with ExpectsInputTypes {

  require(k >= 16 && k <= 65536,
    s"kmin_values k must be in [16, 65536] (sketch state = k longs), got $k")

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_values"

  override def createAggregationBuffer(): KMinValues.Buffer =
    new KMinValues.Buffer()

  private def add(buf: KMinValues.Buffer, v: Long): Unit = {
    if (buf.set.size < k) {
      buf.set.add(v)
      if (buf.set.size == k) buf.threshold = buf.set.last()
    } else if (v < buf.threshold) {
      // saturated accept is rare once warm; the common reject path above
      // this branch is an O(1) size read + ONE primitive compare against
      // the cached threshold, never an O(log k) tree walk to set.last()
      if (buf.set.add(v)) {
        buf.set.remove(buf.set.last())
        buf.threshold = buf.set.last()
      }
    }
  }

  override def update(buf: KMinValues.Buffer, input: InternalRow): KMinValues.Buffer = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: KMinValues.Buffer, b: KMinValues.Buffer): KMinValues.Buffer = {
    val it = b.set.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: KMinValues.Buffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KMinValues.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KMinValues.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new KMinValues.Buffer()
    var i = 0
    while (i < n) { s.set.add(bb.getLong); i += 1 }
    if (s.set.size >= k) s.threshold = s.set.last()
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KMinValues =
    copy(child = newChildren.head)
}

object KMinValues {
  /** Sorted distinct values + a cached rejection threshold: Long.MaxValue
    * until the sketch saturates at k, then always == set.last, so the
    * per-row hot path never touches the tree.
    */
  final class Buffer {
    val set = new java.util.TreeSet[java.lang.Long]()
    var threshold: Long = Long.MaxValue
  }

  def apply(h: Column, k: Int): Column =
    GraftColumnBridge.column(
      KMinValues(GraftColumnBridge.expression(h), k).toAggregateExpression())
}

/** COUNT-MIN SKETCH of a string-key stream in ONE pass (SURVEY I9b —
  * Cormode & Muthukrishnan 2005): the fixed `depth*width` long buffer IS
  * the aggregation state; each input key increments its `depth` cells
  * (cell_d = md5-56("d:key") mod width — [[HashFunctions.md5Hash56Local]],
  * the spec-pinned row-local twin of the column hash, so the cells are
  * BIT-COMPATIBLE with [[graft.operators.Sketching.countMinCells]]'s
  * relational spelling and with the DuckDB oracle that rebuilds them).
  * Merge is element-wise sum — CMS is linear — so partial (map-side)
  * sketches combine to exactly the single-pass sketch, which is what
  * makes this a per-shard/per-day artifact a 100 TB pipeline stores and
  * rolls up without raw data. vs the relational spelling: no xdepth row
  * expansion and no (dep, cell) shuffle — the only bytes crossing the
  * wire are the constant-size buffers themselves.
  *
  * Output: the flattened row-major cells array (index = dep*width+cell),
  * the storable artifact; point estimates are min-over-depths reads.
  */
case class CountMinSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(depth >= 1 && depth <= 16 && width >= 2 && width <= (1 << 20)
    && depth.toLong * width <= (1 << 22),
    s"count_min shape out of range: $depth x $width (state = depth*width longs)")

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      var d = 0
      while (d < depth) {
        val cell = (HashFunctions.md5Hash56Local(d.toString + ":" + key) % width).toInt
        buf(d * width + cell) += 1L
        d += 1
      }
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
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CountMinSketch =
    copy(child = newChildren.head)
}

object CountMinSketch {
  def apply(key: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(
      CountMinSketch(GraftColumnBridge.expression(key), depth, width)
        .toAggregateExpression())
}

/** BLOOM FILTER over a 64-bit-hash column in ONE pass (SURVEY I10 —
  * Bloom 1970): the fixed `mBits`-bit bitmap IS the aggregation state
  * (`mBits/64` longs); each input hash sets its `kHashes` positions
  * (pos_i = md5-56("i:hash") mod mBits — [[HashFunctions.md5Hash56Local]],
  * so a DuckDB oracle and a relational probe recompute the SAME
  * positions from the same hash values). Merge is bitwise OR — set
  * union is a bloom homomorphism, bloom(A ∪ B) = bloom(A) | bloom(B) —
  * so partial (map-side) bitmaps combine to exactly the single-pass
  * bitmap, and per-shard/per-day bitmaps roll up without raw data.
  * Membership has NO false negatives by construction; false positives
  * at rate ~(1 - e^(-kn/m))^k, sized by the MEMBER set (for the
  * decontamination use: the tiny benchmark suite), never the corpus.
  *
  * Output: the bitmap as mBits/64 row-major longs (bit b of the filter
  * = bit (b mod 64) of word (b div 64)) — the broadcastable artifact a
  * probe tests with k shift-and-mask expressions per key.
  */
case class BloomBits(
    child: Expression,
    mBits: Int,
    kHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(mBits >= 64 && mBits <= (1 << 24) && mBits % 64 == 0,
    s"bloom_bits mBits must be a multiple of 64 in [64, 2^24], got $mBits")
  require(kHashes >= 1 && kHashes <= 16,
    s"bloom_bits kHashes must be in [1, 16], got $kHashes")

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_bits"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < kHashes) {
        val pos = (HashFunctions.md5Hash56Local(i.toString + ":" + h) % mBits).toInt
        buf(pos >>> 6) |= 1L << (pos & 63)
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
    Array.fill(mBits / 64)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBits =
    copy(child = newChildren.head)
}

object BloomBits {
  def apply(h: Column, mBits: Int, kHashes: Int): Column =
    GraftColumnBridge.column(
      BloomBits(GraftColumnBridge.expression(h), mBits, kHashes)
        .toAggregateExpression())
}

/** HYPERLOGLOG register sketch over a STRING key in ONE pass (SURVEY
  * I14 — Flajolet, Fusy, Gandouet & Meunier 2007, "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm"): the
  * 2^p max-rho registers ARE the aggregation state (2^p longs), built
  * from the engine-portable md5-56 hash — so unlike the built-in
  * approx_count_distinct (x1) and the DataSketches HLL (x4), whose
  * randomized internals only admit error-bound specs, THIS sketch is
  * fully oracle-checkable: a DuckDB query rebuilds bit-identical
  * registers from the same md5 arithmetic.
  *
  * Geometry (all pure integer, both engines): h = md5-56(key) in
  * [0, 2^56); register index = h mod m; w = h div m in [0, 2^(56-p));
  * rho = (56-p) - bitlength(w) + 1, with w == 0 -> (56-p)+1 (the "all
  * zeros" maximum); register = MAX rho over its keys. Merge =
  * element-wise MAX — the HLL homomorphism: registers(A ∪ B) =
  * max(registers(A), registers(B)), so per-shard/per-day sketches roll
  * up to EXACTLY the single-pass registers (the x8/x11 mergeability
  * story with a max instead of a sum/OR).
  *
  * The estimator stays exact-arithmetic until one final division: with
  * rho <= (56-p)+1, Z = sum 2^-rho is an INTEGER in units of
  * 2^-((56-p)+1) (z_int = sum 2^((56-p)+1 - rho) <= m * 2^((56-p)+1),
  * within long range for p >= 2), and est = alpha_m * m^2 / Z is one
  * IEEE division of exact-integer-valued doubles — deterministic and
  * bit-identical cross-engine when both sides share the same literal
  * constant. The small-range linear-counting correction (m * ln(m/V))
  * is deliberately NOT applied inside the operator: ln is engine-
  * dependent in the last ulp; callers get v_zero and apply it outside
  * the oracle-checked frame.
  */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(p >= 4 && p <= 14, s"hll p must be in [4, 14], got $p")
  private val m = 1 << p
  private val wBits = 56 - p

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HashFunctions.md5Hash56Local(v.toString)
      val idx = (h % m).toInt
      val w = h / m
      val rho =
        if (w == 0L) wBits + 1
        else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > buf(idx)) buf(idx) = rho.toLong
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
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
    Array.fill(m)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
}

object HllRegisters {
  def apply(key: Column, p: Int): Column =
    GraftColumnBridge.column(
      HllRegisters(GraftColumnBridge.expression(key), p)
        .toAggregateExpression())

  /** The bias-corrected raw-estimator constant alpha_m (Flajolet 2007,
    * Fig. 3) — computed ONCE here and interpolated as the SAME literal
    * into both the Spark column and the oracle SQL, so the one floating
    * division both engines perform starts from identical bits.
    */
  def alphaM(p: Int): Double = {
    val m = 1 << p
    if (m == 16) 0.673
    else if (m == 32) 0.697
    else if (m == 64) 0.709
    else 0.7213 / (1.0 + 1.079 / m)
  }
}

/** MISRA-GRIES heavy-hitters summary (SURVEY I16 — Misra & Gries 1982;
  * mergeability per Agarwal, Cormode, Huang, Phillips, Wei & Yi 2012,
  * "Mergeable Summaries"): at most k (key, count) pairs no matter how
  * many rows stream through. Update is the classic rule — increment a
  * tracked key, insert while there is room, otherwise decrement every
  * counter by 1 and drop zeros (the arriving key is consumed by the
  * decrement). Merge sums the two counter maps, then restores the k
  * bound by subtracting the (k+1)-th largest count from every counter
  * and dropping non-positives — the ACHPWY merge, which preserves the
  * one-sided deficit guarantee: for every key,
  *
  *     est <= true_count  and  true_count - est <= n / (k+1)
  *
  * with n the TOTAL row count seen, whatever the partitioning or merge
  * order. Any key with true_count > n/(k+1) is therefore guaranteed
  * present — the frequent-items contract. Counts (unlike the guarantee)
  * are order-dependent across merges, so operators built on this sketch
  * are rows-only with bound specs (the x1/x4 class), never hash oracles.
  *
  * State is <= k entries — constant memory for a 100 TB scan, and the
  * map-side partial aggregation means each shuffle carries k pairs per
  * partition, never the vocabulary.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k >= 2 && k <= 4096, s"misra_gries k must be in [2, 4096], got $k")

  override def inputTypes = Seq(StringType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      val cur: Long = buf.getOrDefault(key, 0L)
      if (cur != 0L) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // decrement-all: the arriving key and one unit of every tracked
        // key are jointly discarded — k+1 distinct keys per unit of
        // undercount, which is where the n/(k+1) bound comes from.
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      a.put(e.getKey, a.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives: back to
      // <= k entries, deficit grows by at most that count for any key.
      val counts = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { counts(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(a.size - (k + 1)) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    // deterministic emission order: (est desc, key asc)
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(entries,
      (x: (String, Long), y: (String, Long)) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    new GenericArrayData(entries.map { case (key, est) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(key), est)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
      // UTFDataFormatException past 65535 encoded bytes, and the
      // motivating keys (URLs, long n-grams) can exceed that — a spill
      // or shuffle would kill the aggregation mid-query
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val kl = in.readInt()
      val kb = new Array[Byte](kl)
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  def apply(key: Column, k: Int): Column =
    GraftColumnBridge.column(
      MisraGries(GraftColumnBridge.expression(key), k).toAggregateExpression())
}
