package graft.operators

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent Directions matrix sketching (SURVEY.md §2 I11 / x13):
  * Liberty (2013, KDD) with the Ghashami-Liberty-Phillips-Woodruff
  * (2016, SIAM J. Comput.) analysis — the deterministic, MERGEABLE
  * covariance compression that makes one-pass distributed PCA of a
  * 100 TB embedding table possible: every partition folds its rows
  * into a constant-size l x d sketch B, shard sketches merge by
  * feeding one sketch's rows into another (GLPW Sec. 4: merging
  * preserves the guarantee), and the result bounds the covariance
  * error SPECTRALLY:
  *
  *   0 <= x'(A'A - B'B)x  and  ||A'A - B'B||_2 <= ||A||_F^2 / l
  *
  * — so every eigenvalue of the sketch covariance is within an
  * additive ||A||_F^2/l of the truth (Weyl), which is what a PCA /
  * subspace-whitening stage needs.
  *
  * Shape: the 2l x d buffer SVD (LAPACK via Breeze, in Spark's own
  * classpath) runs per ~l rows per partition — executor-side, tiny
  * (2l x d = 32 x 64 here), never data-proportional. The driver merge
  * touches only numPartitions x l sketch rows (partition-bounded, the
  * exportBigramModel collect class).
  */
object FrequentDirections {

  /** Streaming FD accumulator: insert rows one at a time; `result`
    * yields at most `l` rows whose Gram matrix lower-bounds A'A within
    * the FD guarantee. Buffer is 2l rows; on overflow, one reduced SVD
    * + the sigma_l^2 shrink zeroes at least half the buffer.
    */
  final class Accumulator(val l: Int, val d: Int) extends Serializable {
    require(l >= 2 && d >= 1, s"need l >= 2, d >= 1; got l=$l d=$d")
    private val buf = DenseMatrix.zeros[Double](2 * l, d)
    private var n = 0

    def insert(row: Array[Double]): Unit = {
      require(row.length == d, s"row dim ${row.length} != $d")
      if (n == 2 * l) shrink()
      var j = 0
      while (j < d) { buf(n, j) = row(j); j += 1 }
      n += 1
    }

    private def shrink(): Unit = {
      val svd.SVD(_, s, vt) = svd.reduced(buf)
      // delta = sigma_l^2 (1-indexed l): rows 0..l-2 survive shrunk,
      // row l-1 zeroes out, rows l..2l-1 clear — half the buffer frees
      val delta = if (s.length >= l) s(l - 1) * s(l - 1) else 0.0
      buf := 0.0
      var i = 0
      while (i < math.min(l, s.length)) {
        val w = math.sqrt(math.max(s(i) * s(i) - delta, 0.0))
        if (w > 0) {
          var j = 0
          while (j < d) { buf(i, j) = w * vt(i, j); j += 1 }
        }
        i += 1
      }
      n = math.min(l, s.length)
    }

    /** Final sketch rows (shrunk to <= l rows), norm-descending. */
    def result(): Array[Array[Double]] = {
      if (n > l) shrink()
      (0 until math.min(n, l)).map(i => Array.tabulate(d)(j => buf(i, j)))
        .filter(r => r.exists(_ != 0.0)).toArray
    }
  }

  /** Distributed sketch of an `Array[Float]` embedding column: one FD
    * accumulator per partition (constant memory), then a driver-side
    * FD merge over the partition-bounded shard sketches — the GLPW
    * merge, which preserves the spectral guarantee.
    */
  def sketch(e: DataFrame, l: Int, d: Int): Array[Array[Double]] = {
    val spark = e.sparkSession
    import spark.implicits._
    val shardRows = e.select(col("embedding")).as[Array[Float]]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val acc = new Accumulator(l, d)
          it.foreach(v => acc.insert(v.map(_.toDouble)))
          acc.result().iterator
        }
      }
      .collect() // numPartitions x l rows, never data-proportional
    val merged = new Accumulator(l, d)
    shardRows.foreach(merged.insert)
    merged.result()
  }
}
