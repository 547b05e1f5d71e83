package graft.tools

/** One-off diagnostic for the r10 s5 bench regression: run one full
  * bench-shaped pass (every benched query once), then re-run a handful of
  * suspect queries warm while watching Spark's codegen compilation
  * counter (CodegenMetrics) — if a warm re-run of an already-executed
  * query triggers FRESH Janino compilations, its generated classes were
  * evicted from the codegen class cache by the rest of the pass, and the
  * "warm" bench time is silently paying compile + re-JIT every pass.
  * Usage: runMain graft.tools.CacheProbe [sfDir]
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(32)
    import org.apache.spark.metrics.source.CodegenMetrics
    def compiles: Long = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    val names = graft.SparkEntry.benchQueries.toSeq
    val t0 = System.nanoTime()
    names.foreach { case (n, fn) =>
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"[probe] $n FAILED: ${e.getMessage}") }
      spark.catalog.clearCache()
    }
    println(f"[probe] pass1: ${(System.nanoTime() - t0) / 1e9}%.1f s, total compilations=$compiles")
    val suspects = Seq("s5_ann_quantized_topk", "t21_bm25_topk", "p3_stratified_sample",
      "t16_perplexity_filter", "t11_surprisal")
    (1 to 2).foreach { pass =>
      suspects.foreach { n =>
        val c0 = compiles
        val t1 = System.nanoTime()
        graft.SparkEntry.benchQueries(n)(spark, sfDir).count()
        val dt = (System.nanoTime() - t1) / 1e9
        println(f"[probe] pass${pass + 1} $n warm $dt%.2f s, fresh compilations=${compiles - c0}")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
