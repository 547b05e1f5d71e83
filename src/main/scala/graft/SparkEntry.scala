package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  private def packs: Seq[Relational.Q] =
    Relational.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ Sketching.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** The frame Bench times per name — the PRODUCTION spelling where the
    * verify frame carries an exact-answer gate leg (bounds-oracle /
    * recall-floor entries); identical to [[queries]] otherwise.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.benchFn.getOrElse(q.fn)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
