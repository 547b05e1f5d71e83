package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Morton (Z-order) value of two non-negative int columns: the low
    * `bits` bits of each, interleaved (x even positions, y odd) — a
    * space-filling curve, so CONTIGUOUS z ranges cover compact (x, y)
    * rectangles. Pure shifts/ors, codegen'd end to end.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    // 2*bits+1 must stay < 64: JVM long shifts mask the count to 6 bits,
    // so an oversized `bits` would silently wrap into a garbage curve
    require(bits >= 1 && bits <= 31,
      s"zValue interleaves 2*bits bits into one long; bits must be in [1, 31], got $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** G18 — Z-ORDERED data layout (the OPTIMIZE ZORDER of table
    * formats): write `df` as `files` parquet files range-partitioned
    * and sorted by the Morton interleave of TWO filter columns, so
    * every file's (min, max) footer rectangle is COMPACT in both
    * dimensions — a predicate on EITHER column (or both) prunes most
    * files at planning time from footer stats alone. A single-column
    * sort gives perfect pruning on that column and none on the other;
    * the curve trades a little of each for locality in both — the
    * standard multi-dimensional clustering answer at 100 TB, where the
    * scan you avoid is the whole game.
    *
    * Columns must be non-negative ints fitting in `bits` bits (rank or
    * quantize upstream — a production wrapper would ntile to 2^bits).
    * The range partitioner samples deterministic split points over z;
    * sortWithinPartitions keeps row groups monotone in z so row-group
    * stats prune WITHIN files too.
    */
  def writeZOrdered(df: DataFrame, dir: String, colX: String, colY: String,
      files: Int, bits: Int = 16): Unit = {
    df.withColumn("__graft_z", zValue(col(colX), col(colY), bits))
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** G24 — HIVE-PARTITIONED LAYOUT (the lake layout whose scans prune):
    * write `df` with one directory level per `partCols` value, so a
    * filter on those columns becomes DIRECTORY pruning — the planner
    * never lists, opens, or footers the non-matching partitions. This is
    * the layer BELOW G22's stats manifest (which skips files WITHIN what
    * the layout couldn't prune) and the layout that activates Spark's
    * DYNAMIC partition pruning: a fact ⋈ dim join keyed on the partition
    * column with a selective dim filter plants a runtime subquery into
    * the fact scan's PartitionFilters, so the fact side scans only the
    * partitions the filtered dim actually reaches — the #1 scan killer
    * on a 100 TB partitioned lake, and it needs zero query changes.
    * Choose partition columns with BOUNDED cardinality (enum/date-grain;
    * a high-cardinality partition column melts the listing layer into
    * millions of directories — that regime belongs to G8 bucketing).
    */
  def writePartitioned(df: DataFrame, dir: String, partCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(dir)

  /** G22 — STATS MANIFEST (the Iceberg/Delta data-skipping layer above
    * parquet footers): per-file (min, max, rows) for a filter column,
    * built with ONE distributed scan at WRITE/publish time and stored
    * as a tiny table. Parquet already prunes row groups from footers,
    * but at 100 TB the planner must OPEN every footer first — a million
    * small reads per query; a manifest answers "which files can match"
    * from file-count-bounded metadata instead. Build once per publish
    * (the WAP audit pass can piggyback), read many.
    */
  def buildStatsManifest(df: DataFrame, statCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"),
        count(lit(1)).as("n_rows"))

  /** Range read with manifest-driven FILE skipping: keep only files
    * whose [min_v, max_v] intersects [lo, hi], then scan just those.
    * The manifest collect is file-count-bounded (the audit-report
    * class), never data-proportional; the residual in-file filter
    * still pushes down to row groups, so skipping composes with —
    * never replaces — footer pruning. Returns (files kept, frame).
    */
  def readSkipping(spark: SparkSession, manifest: DataFrame, statCol: String,
      lo: Long, hi: Long): (Seq[String], DataFrame) = {
    require(lo <= hi, s"empty range: [$lo, $hi]")
    val files = manifest
      .filter(!(col("max_v") < lo || col("min_v") > hi))
      .select("file").collect().map(_.getString(0)).toSeq.sorted
    val frame =
      if (files.nonEmpty)
        spark.read.parquet(files: _*)
          .filter(col(statCol) >= lo && col(statCol) <= hi)
      else {
        // the empty-range path must carry the REAL table schema (a
        // zero-column emptyDataFrame breaks any caller that selects
        // statCol or unions with a non-empty read): one footer read of
        // any manifest file — file-count-bounded, never data
        manifest.select("file").limit(1).collect().headOption match {
          case Some(row) =>
            val schema = spark.read.parquet(row.getString(0)).schema
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          case None => spark.emptyDataFrame
        }
      }
    (files, frame)
  }
}
