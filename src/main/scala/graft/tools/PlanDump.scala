package graft.tools

import java.nio.file.{Files, Paths}

/** Dump explain("formatted") for a list of queries to files in one JVM —
  * the plans/rNN before/after evidence capture.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <query> [query ...]
  * Writes <outDir>/<query>_<suffix>.txt for each query (sf dir from
  * SPARK_GRAFT_SF_DIR, default sf0.01 — plan shape, not timing).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    Files.createDirectories(outDir)
    val spark = graft.GraftSession.local(sys.env.getOrElse("EXPLAIN_CPUS", "8").toInt)
    names.foreach { name =>
      val df = graft.SparkEntry.benchQueries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      val nEx = "Exchange".r.findAllIn(plan).size
      println(s"[plandump] $name -> ${name}_$suffix.txt (Exchange~$nEx)")
    }
    spark.stop()
  }
}
