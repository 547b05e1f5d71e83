package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}

/** Plan auditor: prints explain(formatted) for a named query (or times a
  * micro-stage) so codegen boundaries and pushdown are inspectable.
  * Usage: runMain graft.tools.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(sys.env.getOrElse("EXPLAIN_CPUS", "8").toInt)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"rows=$n  elapsed=${(System.nanoTime() - t0) / 1e9}%.2f sec")
    spark.stop()
  }
}
