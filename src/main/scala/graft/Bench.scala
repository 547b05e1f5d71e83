package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Each query runs twice and the WARM (second) time is reported — the cold
  * run carries one-off plan/codegen-compile/JVM-warmup cost that is fixed
  * overhead, not throughput (measured in round 1: heavy queries cost the
  * same at sf0.001 and sf0.1 cold). The single JSON result line goes to
  * stdout unprefixed (build.sbt forces OutputStrategy.StdoutOutput) and,
  * belt-and-braces, to the file named by SPARK_GRAFT_BENCH_OUT if set.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 3 runs by default so a single machine-load spike can't dominate
    // min-of-N (round 4's phantom q01/q24/q31 "regressions" were one-run
    // variance in a 2-run min)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.local()
    // View-backed queries read a memoized materialized artifact, which
    // would reduce their warm run to a checkpoint scan and hide any
    // regression in the build they stand for. Before EACH timed run,
    // drop exactly the artifact that query is responsible for building:
    // d2's line then measures the minhash+LSH+verify build (warm), d6's
    // the connected-components build over a staged pair graph, and d7
    // stays the pure read-the-staged-clusters line — the production
    // pipeline's three cost classes, each visible.
    val rebuild: Map[String, () => Unit] = Map(
      "d2_dedup_minhash_lsh" -> (() => graft.operators.Dedup.clearPairViews()),
      "d6_dedup_clusters" -> (() => graft.operators.Dedup.clearClusterViews()))
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      rebuild.get(name).foreach(_.apply())
      val t0 = System.nanoTime()
      // a crashing query must NOT report its time-to-fail as a legitimate
      // timing: mark the run negative (min-of-N then keeps the marker, so
      // the key is visibly broken in the JSON) and log to stderr
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators persist small signature frames; drop them so later
      // queries aren't taxed by leftover cached blocks
      spark.catalog.clearCache()
      if (ok) dt else -dt
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      name -> (1 to math.max(1, runs)).map(_ => timeOnce(name, fn)).min
    }
    // Keep the whole line SHORT: the driver captures only the last ~2000
    // chars of stdout and sbt appends a ~70-char [success] line after the
    // JSON — round 2's full-precision line overflowed that window by ~2
    // chars and failed to parse. Centisecond times, basename sf, and
    // queries keyed by their unique id prefix (q09/d2/t7 — the SURVEY §2
    // ids; full names stay in Verify/CORRECTNESS) keep the line ~900
    // chars with room for 100+ queries.
    def cs2(v: Double): String = (math.round(v * 100) / 100.0).toString
    def short(n: String): String = n.takeWhile(_ != '_')
    val collides = results.keys.groupBy(short).collect { case (_, v) if v.size > 1 => v }.flatten.toSet
    val qs = results.map { case (k, v) =>
      "\"" + (if (collides(k)) k else short(k)) + "\":" + cs2(v)
    }.mkString("{", ",", "}")
    // failed queries carry NEGATIVE per-key markers — exclude them from
    // the headline total so a crash can't read as a speedup (subtracting
    // its time-to-fail); the negative key is the visible failure signal
    val total = results.values.filter(_ >= 0).sum
    val sfName = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    val json =
      s"""{"metric":"total","value":${cs2(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    // stdout is the primary channel — print BEFORE the file write, which
    // may fail (bad path) and must not discard the whole run's result
    println(json)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      try Files.writeString(Paths.get(p), json)
      catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
