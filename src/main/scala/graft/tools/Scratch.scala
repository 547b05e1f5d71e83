package graft.tools

import org.apache.spark.sql.functions._

/** One-off diagnostics — currently: does AQE reuse the shared token/gram
  * exchange subtrees in t21/t25/t29 at RUNTIME (the round-10 claim)?
  * Prints the post-execution adaptive plan and counts reuse markers.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    Seq("t21_bm25_topk", "t25_hybrid_rrf", "t29_rake_keyphrases").foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // execute THIS queryExecution so AQE materializes its stages
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedQueryStage")) +
        plan.linesIterator.count(_.contains("ReusedExchange"))
      val shuffles = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Broadcast") && !l.contains("Reused"))
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      println(s"[scratch] $name reusedStages=$reused shuffleExchanges=$shuffles parquetScans=$scans")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
