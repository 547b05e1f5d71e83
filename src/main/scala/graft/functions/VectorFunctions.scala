package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, expressed with
  * higher-order array functions (evaluated natively by Catalyst, no UDF
  * serialization).
  *
  * Accumulation is an explicit left fold so results are bit-identical to
  * the DuckDB oracle's `list_reduce` spelling — see Num's float discipline.
  * [[graft.functions.CosineSimilarity]] is the codegen'd fast path with the
  * same arithmetic shape (SURVEY.md H1).
  */
object VectorFunctions {

  /** Left-fold sum of an Array[Double] column. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def normSq(a: Column): Column =
    foldSum(transform(a, x => x.cast("double") * x.cast("double")))

  /** cosine = dot / sqrt(|a|^2 * |b|^2) — the exact grouping the oracle
    * uses; do not "simplify" to sqrt(na)*sqrt(nb), which rounds differently.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))
}
