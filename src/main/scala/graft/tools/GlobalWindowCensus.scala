package graft.tools

/** One-off census backing PlanAuditSpec's warning-reconciliation pin
  * (r15 verdict item 6): for every verify AND bench frame, the number of
  * unpartitioned logical Window/WindowGroupLimit nodes — the nodes whose
  * physical execution fires the runtime "No Partition Defined for Window
  * operation" warning. The spec pins the resulting map EXACTLY, so a new
  * global window can't hide among the known warnings.
  *
  * Usage: runMain graft.tools.GlobalWindowCensus [sfDir]
  */
object GlobalWindowCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(8)
    val qs = graft.SparkEntry.queries
    val bench = graft.SparkEntry.benchQueries.toSeq
      .filter { case (n, fn) => !(fn eq qs(n)) }
      .map { case (n, fn) => (s"$n#bench", n, fn) }
    val surface = (qs.toSeq.map { case (n, fn) => (n, n, fn) } ++ bench).sortBy(_._1)
    surface.foreach { case (display, base, fn) =>
      if (!PlanAudit.iterative.contains(base)) {
        val audited = if (display == base) PlanAudit.lazyTwin.getOrElse(base, fn) else fn
        val hits = try PlanAudit.globalWindows(audited(spark, sfDir)) catch {
          case _: Throwable => Seq.empty
        }
        spark.catalog.clearCache()
        if (hits.nonEmpty)
          println(s"""[gwcensus] "$display" -> ${hits.size}, // ${hits.mkString("; ")}""")
      }
    }
    println("[gwcensus] done")
    spark.stop()
  }
}
