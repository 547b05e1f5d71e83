package graft.tools

/** Solo warm timing of one named SparkEntry query — isolates a query's
  * own cost from full-bench cache/GC contention when chasing a slow
  * bench line. Usage: runMain graft.tools.SoloTime <name> [sfDir] [runs]
  */
object SoloTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    // 4th arg "bench" times the benchFn spelling (what BENCH_r*.json and
    // the frozen floors actually measure) instead of the oracle entry.
    val useBench = args.length > 3 && args(3) == "bench"
    val spark = graft.GraftSession.local()
    val fn = if (useBench) graft.SparkEntry.benchQueries(name)
      else graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[solo] $name run $i rows=$n ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
