package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale utilities (SURVEY.md §5): the two levers that matter most
  * for 100 TB fact-fact joins — co-located bucketing (no shuffle at read
  * time) and key salting (no straggler task under skew).
  */
object ScaleUtils {

  /** Write `df` as a bucketed+sorted table: joins and aggregations on
    * `keys` against other tables bucketed the same way become
    * zero-shuffle sort-merge joins. At 100 TB this converts the dominant
    * exchange (e.g. orders ⋈ lineitem on orderkey) into a local merge.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join with key salting for skew: every row of `left` gets one of
    * `salts` pseudo-random salt values (deterministic per partition/row,
    * no RNG state), while `right` is replicated across all salt values, so
    * a hot key's rows spread over `salts` reducer tasks instead of one
    * straggler. Use when one side is small enough to replicate xN but too
    * big (or too skewed) to broadcast; AQE's skew-join handles the
    * sort-merge case, this handles the deliberate-repartition case.
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1)
    // Right rows are replicated across all salts, so any join type that
    // emits UNMATCHED right rows (right/full outer) would duplicate them
    // `salts` times. Only left-preserving types are sound here.
    val ok = Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti")
    require(ok(joinType.toLowerCase.replace(" ", "")),
      s"saltedEquiJoin supports inner/left/left_semi/left_anti joins, got '$joinType': " +
        "right-preserving outer types would emit each unmatched right row once per salt")
    val saltedLeft = left.withColumn("__graft_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, keys :+ "__graft_salt", joinType)
      .drop("__graft_salt")
  }
}
