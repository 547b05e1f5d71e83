package graft.tools

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Task-binary-size probe (r15 verdict item 5): executes every benched
  * query and attributes Spark's "Broadcasting large task binary" warnings
  * (DAGScheduler fires them past ~1000 KiB of serialized task closure) to
  * the query that produced them — the warning itself carries no query
  * context, so a new plan-literal payload regression hides in the bench
  * tail's noise unless something maps warning → entry mechanically.
  *
  * A fat task binary is the plan-literal smell: the closure ships a
  * payload (codebook literal, pattern automaton, learned table) with
  * EVERY task instead of once per executor via a broadcast variable —
  * at 1000 executors × many tasks each, that multiplies out to real
  * scheduler and network cost. Threshold-clean queries print nothing.
  *
  * Usage: runMain graft.tools.TaskBinProbe [sfDir] [warnKiB]
  */
object TaskBinProbe {
  /** Largest "Broadcasting large task binary with size N KiB" observed
    * while `body` runs; 0 when no warning fired.
    */
  def maxTaskBinaryKiB(body: => Unit): Double = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val pat = """Broadcasting large task binary with size ([\d.]+) (KiB|MiB)""".r.unanchored
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val app: AbstractAppender =
      new AbstractAppender("graft-taskbin", null, null, true, Array.empty) {
        override def append(e: LogEvent): Unit =
          e.getMessage.getFormattedMessage match {
            case pat(n, unit) =>
              seen.add(n.toDouble * (if (unit == "MiB") 1024.0 else 1.0))
            case _ => ()
          }
      }
    app.start()
    cfg.getRootLogger.addAppender(app, Level.WARN, null)
    ctx.updateLoggers()
    try body finally {
      cfg.getRootLogger.removeAppender("graft-taskbin")
      ctx.updateLoggers()
      app.stop()
    }
    import scala.jdk.CollectionConverters._
    seen.asScala.foldLeft(0.0)(math.max)
  }

  // Benched queries whose task binary legitimately sits at/over the warn
  // line, each with its boundedness argument — the allowedHints
  // discipline applied to closure size. Anything NOT listed that crosses
  // the threshold is a plan-literal payload regression (the pre-r16
  // dHash63 class: 126 unrolled substr trees at 1.7 MB/task).
  val allowedTaskBin: Map[String, String] = Map(
    "p26_rank_weighted_sample" ->
      ("~1003 KiB at sf0.1: the iterative host-rank fold's accumulated plan " +
        "(rankIterate localCheckpoints per round — closure carries the round's " +
        "lineage, PARAMETER-bounded by the iteration count, never data-proportional)"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val warnKiB = args.lift(1).map(_.toDouble).getOrElse(1000.0)
    val spark = graft.GraftSession.local()
    var offenders = List.empty[(String, Double)]
    graft.SparkEntry.benchQueries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val kib = try maxTaskBinaryKiB {
        fn(spark, sfDir).foreach(_ => ())
      } catch {
        case e: Throwable =>
          println(s"[taskbin] $name FAILED: ${e.getMessage}"); 0.0
      }
      if (kib >= warnKiB) {
        if (allowedTaskBin.contains(name))
          println(f"[taskbin] $name%-28s max task binary $kib%.1f KiB  [allowed: ${allowedTaskBin(name)}]")
        else {
          offenders ::= (name, kib)
          println(f"[taskbin] $name%-28s max task binary $kib%.1f KiB  <== inspect")
        }
      }
      spark.catalog.clearCache()
    }
    println(s"[taskbin] queries with UNADJUDICATED task binaries past $warnKiB KiB: ${offenders.size}" +
      (if (offenders.isEmpty) "" else offenders.sortBy(-_._2)
        .map { case (n, k) => f"$n ($k%.1f KiB)" }.mkString(" — ", ", ", "")))
    spark.stop()
    if (offenders.nonEmpty) sys.exit(2)
  }
}
