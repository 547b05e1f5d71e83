package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** One-off diagnostics — currently: where do p21/p26's seconds go under
  * the noop action? Times each sub-stage of the composed plan.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    import graft.operators.{TextAnalysis => T}
    import graft.operators.Num.r4

    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        println(f"[scratch] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val canon = T.canonicalizeUrl(T.fixtureDirtyUrl)

    time("p21.canon")(docs.select(col("doc_id"), canon.as("canon_url")))
    time("p21.minIds")(docs.select(col("doc_id"), canon.as("canon_url"))
      .groupBy(col("canon_url")).agg(min(col("doc_id")).as("doc_id")))
    val minIds = docs.select(col("doc_id"), canon.as("canon_url"))
      .groupBy(col("canon_url")).agg(min(col("doc_id")).as("doc_id"))
    time("p21.join")(docs.select(col("doc_id"), col("text"), canon.as("canon_url"))
      .join(minIds, Seq("canon_url", "doc_id")))
    val xt = T.htmlToText(T.fixtureHtml)
    time("p21.join+xt")(docs.select(col("doc_id"), col("text"), canon.as("canon_url"))
      .join(minIds, Seq("canon_url", "doc_id"))
      .select(col("doc_id"), col("canon_url"), xt.as("xt")))
    time("p21.full")(graft.SparkEntry.benchQueries("p21_web_pipeline")(spark, sfDir))

    time("p26.hostGraph")(graft.operators.Pipeline.hostGraph(
      docs.select(col("doc_id"), T.fixtureDirtyUrl.as("url"),
        T.fixtureLinkedHtml.as("html"))))
    time("p26.full")(graft.SparkEntry.benchQueries("p26_rank_weighted_sample")(spark, sfDir))

    // range-exchange sampling hypothesis: the final orderBy re-executes
    // its child pipeline for partition-boundary sampling
    Seq("p21_web_pipeline", "t1_token_stats", "q15_price_quantiles").foreach { n =>
      val df = graft.SparkEntry.benchQueries(n)(spark, sfDir)
      val lp = df.queryExecution.logical
      val stripped = lp match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.child
        case other => other
      }
      val noSortDf = org.apache.spark.sql.GraftColumnBridge.ofRows(spark, stripped)
      time(s"$n.noSort")(noSortDf)
      time(s"$n.withSort")(df)
    }
    spark.stop()
  }
}
