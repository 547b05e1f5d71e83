package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One place for the read path. All operators load tables through here so
  * read-path tuning (pushdown verification, bucketing at scale) is central.
  * Tables are the driver-generated TPC-H-ish set (TESTDATA.md).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.parquet has shipped with two ts physical types across testdata
    * vintages: TIMESTAMP(NANOS) (which Spark's vectorized reader only
    * accepts as LONG via the legacy nanosAsLong flag) and plain
    * timestamp[us]. Branch on the RESOLVED read schema so both produce the
    * same TIMESTAMP column: nanos-as-long truncates to micros (matching
    * DuckDB's ns->us cast, toward zero); a micros timestamp passes through,
    * with TIMESTAMP_NTZ cast to TIMESTAMP (micros-identical — the session
    * timezone is pinned to UTC in GraftSession/SparkSpec).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Spread a small-file scan across all cores before CPU-heavy per-row
    * work (hashing, shingling, similarity). The test parquet files are a
    * single ~MB row-group = one input split; without this, a 32-core run
    * executes expensive projections on one task. At real scale inputs
    * arrive in thousands of splits and this becomes a no-op-sized shuffle.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
