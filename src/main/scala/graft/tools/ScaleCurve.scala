package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALING-CURVE measurement (round 12): the §5 scale arguments as
  * NUMBERS. Each headline operator runs at 1x/2x/4x/8x of the sf0.1
  * fixture (id-shifted unions of the provided parquet — a measurement
  * harness, not a correctness fixture: correctness stays pinned to the
  * driver's own tables) and reports warm wall time, so "this plan is
  * scan/shuffle-bound and scales ~linearly" is a measured curve instead
  * of an argument. A super-linear curve here is the smoke alarm for an
  * accidentally quadratic stage — exactly what a 100 TB deployment
  * cannot discover in production.
  *
  * Usage: runMain graft.tools.ScaleCurve [sfDir] [maxFactor]
  * Prints one `[scale] <op> <factor> <rows> <sec>` line per point.
  */
object ScaleCurve {

  private def scaledDocs(spark: SparkSession, dir: String, f: Int): DataFrame = {
    val base = graft.Tables.documents(spark, dir)
    (0 until f).map(i => base.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 100000000L)))
      .reduce(_ unionByName _)
  }

  private def scaledLineitem(spark: SparkSession, dir: String, f: Int): DataFrame = {
    val base = graft.Tables.lineitem(spark, dir)
    (0 until f).map(_ => base).reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val maxF = if (args.length > 1) args(1).toInt else 8
    val spark = graft.GraftSession.local()
    import graft.operators.{Dedup, TextAnalysis}

    // (name, factor -> frame). Every op ends in an action that consumes
    // the full result (count/agg), so the measured time covers the whole
    // distributed plan, not a limit.
    val ops: Seq[(String, Int => DataFrame)] = Seq(
      // scan-bound: one codegen projection per row, no shuffle
      "t33_entropy_scan" -> (f =>
        TextAnalysis.charEntropyRowLocal(scaledDocs(spark, sfDir, f))),
      // one map-side-combinable hash aggregate (the d1 spelling)
      "d1_exact_dedup" -> (f =>
        scaledDocs(spark, sfDir, f)
          .groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
            .as("content_hash"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))),
      // banded candidate join + verify (the d2 lazy pipeline) — the
      // operator whose naive spelling IS quadratic; the curve proves the
      // banding holds. NOTE: id-shifted copies of the same corpus are
      // ADVERSARIAL input (every doc gains f-1 exact twins, so the true
      // pair count grows ~f^2/2) — the measured curve bounds real-corpus
      // behavior from above.
      "d2_minhash_pairs" -> (f =>
        Dedup.nearDupPairs(scaledDocs(spark, sfDir, f))),
      // narrow integer-gate scan (the Gopher rules)
      "t18_gopher_gate" -> (f =>
        TextAnalysis.gopherRules(scaledDocs(spark, sfDir, f))),
      // classic wide aggregate over the fact table (q1 shape)
      "q1_lineitem_agg" -> (f =>
        scaledLineitem(spark, sfDir, f)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            avg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("n")))
    )

    val factors = Iterator.iterate(1)(_ * 2).takeWhile(_ <= maxF).toSeq
    ops.foreach { case (name, mk) =>
      factors.foreach { f =>
        // warm min-of-2: first run pays scan cache/codegen, min absorbs it
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = mk(f).count()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          (n, dt)
        }
        val rows = times.head._1
        println(f"[scale] $name%-18s f=$f rows=$rows%9d ${times.map(_._2).min}%7.2f s")
      }
    }
    spark.stop()
  }
}
