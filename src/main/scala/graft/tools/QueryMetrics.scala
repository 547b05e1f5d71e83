package graft.tools

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** G19 — query observability: a `QueryExecutionListener` that harvests
  * the physical plan's SQL metrics (leaf output rows, files/bytes the
  * planner touched, shuffle bytes written) per completed action — the
  * numbers an operations dashboard tracks per pipeline stage at
  * 100 TB, where "did this query scan one partition or the whole
  * table" is the difference between a pruned plan and a full-table
  * accident. Pull-based and in-memory: attach, run the workload,
  * `drain()` the records (or `summarize` them as a DataFrame for the
  * usual operator treatment).
  *
  * Semantics: numFiles/filesSize are LISTING-level — they reflect
  * partition/file pruning decisions (the spec proves a partition
  * filter shrinks both), not post-pruning column-chunk IO; per-task IO
  * needs a `SparkListener` on task metrics, a heavier hammer than the
  * per-query question usually warrants.
  */
object QueryMetrics {

  final case class QueryRecord(name: String, durationNs: Long,
      outputRows: Long, filesRead: Long, bytesRead: Long,
      shuffleBytesWritten: Long)

  final class Collector extends QueryExecutionListener {
    private val buf = ArrayBuffer.empty[QueryRecord]

    // AQE hides the real tree: AdaptiveSparkPlanExec exposes no
    // children (its final plan lives in `executedPlan`) and each
    // materialized stage wraps its subtree in a QueryStageExec whose
    // `plan` is likewise not a child. Expression SUBQUERIES (scalar/IN
    // subqueries, DPP, runtime bloom-filter builds) hang off
    // `subqueries`, not `children` — a walk that skips them
    // under-reports IO exactly on the pruned queries this tool exists
    // to observe. (A reused subquery contributes once per reference —
    // planner-touched semantics, matching the listing-level contract.)
    private def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: (nodes(a.executedPlan) ++ a.subqueries.flatMap(nodes))
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: (nodes(q.plan) ++ q.subqueries.flatMap(nodes))
      case other => other +: (other.children ++ other.subqueries).flatMap(nodes)
    }

    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = synchronized {
      // one pass over the node list; metric map KEYS ("numFiles",
      // "filesSize", "shuffleBytesWritten") are stable identifiers,
      // unlike the display descriptions. Leaf-only rows: every operator
      // reports numOutputRows; summing the whole tree would count each
      // row once per stage.
      var leafRows = 0L
      var files = 0L
      var bytes = 0L
      var shuffle = 0L
      nodes(qe.executedPlan).foreach { n =>
        val isWrapper =
          n.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] ||
          n.isInstanceOf[org.apache.spark.sql.execution.adaptive.QueryStageExec]
        n.metrics.foreach { case (k, m) =>
          val v = math.max(0L, m.value)
          k match {
            case "numOutputRows" if n.children.isEmpty && !isWrapper => leafRows += v
            case "numFiles" => files += v
            case "filesSize" => bytes += v
            case "shuffleBytesWritten" => shuffle += v
            case _ => ()
          }
        }
      }
      buf += QueryRecord(
        name = funcName,
        durationNs = durationNs,
        outputRows = leafRows,
        filesRead = files,
        bytesRead = bytes,
        shuffleBytesWritten = shuffle)
    }

    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = ()

    def drain(): Seq[QueryRecord] = synchronized {
      val out = buf.toSeq
      buf.clear()
      out
    }
  }

  /** Attach a fresh collector to the session. Caller detaches with
    * `spark.listenerManager.unregister(c)` when done.
    */
  def attach(spark: SparkSession): Collector = {
    val c = new Collector
    spark.listenerManager.register(c)
    c
  }

  /** The drained records as a DataFrame — observability data is just
    * data; aggregate it with the same engine it observes.
    */
  def summarize(spark: SparkSession, records: Seq[QueryRecord]): DataFrame = {
    import spark.implicits._
    records.toDF()
  }

  final case class BatchRecord(queryName: String, batchId: Long,
      inputRows: Long, stateRows: Long, stateBytes: Long)

  /** The STREAMING half of the observability surface: a
    * `StreamingQueryListener` harvesting per-micro-batch progress —
    * input rows and the state store's row/byte footprint summed across
    * stateful operators. State size is THE number to watch on a
    * 100 TB/day stream: a watermark that stops advancing shows up here
    * as monotone state growth long before executors die.
    */
  final class StreamingCollector
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val buf = ArrayBuffer.empty[BatchRecord]

    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

    override def onQueryProgress(event: QueryProgressEvent): Unit = synchronized {
      val p = event.progress
      buf += BatchRecord(
        queryName = Option(p.name).getOrElse(""),
        batchId = p.batchId,
        inputRows = p.numInputRows,
        stateRows = p.stateOperators.map(_.numRowsTotal).sum,
        stateBytes = p.stateOperators.map(_.memoryUsedBytes).sum)
    }

    def drain(): Seq[BatchRecord] = synchronized {
      val out = buf.toSeq
      buf.clear()
      out
    }
  }

  def attachStreaming(spark: SparkSession): StreamingCollector = {
    val c = new StreamingCollector
    spark.streams.addListener(c)
    c
  }
}
