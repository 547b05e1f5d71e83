package graft.tools

/** One-off: measured ANN recall vs s1 at a given sfDir for the
  * approximate entries — used to place the sf0.001 floors honestly.
  * Usage: runMain graft.tools.RecallProbe [sfDir]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.GraftSession.local(8)
    val exact = graft.SparkEntry.benchQueries("s1_ann_bruteforce_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    Seq("s2_ann_lsh_topk", "s4_ann_ivf_topk", "s6_ann_pq_topk",
        "s8_ann_ivfpq_topk", "s9_ann_ivfpq_index_read").foreach { n =>
      val got = graft.SparkEntry.benchQueries(n)(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      println(f"[recall] $n ${(got & exact).size.toDouble / exact.size}%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
