package graft.streaming

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ArrayBuffer
import scala.concurrent.duration._
import scala.concurrent.{Await, Future, ExecutionContext, TimeoutException}
import scala.util.control.NonFatal

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger => SSTrigger}

/** Why a batch was flushed — mirrors the reference's two trigger kinds
  * (reference: nibbler.go:18-23).
  */
sealed trait Trigger
object Trigger {
  /** Flushed because the ticker fired with a non-empty batch. */
  case object Ticker extends Trigger
  /** Flushed because the batch reached `size` items. */
  case object BatchFull extends Trigger
}

object Nibbler {
  val DefaultSize = 100
  val DefaultTicker: FiniteDuration = 1.minute
  val DefaultTimeout: FiniteDuration = 1.second

  final class ValidationException(msg: String) extends IllegalArgumentException(msg)
  final class ReceiverClosedException
    extends IllegalStateException("receiver closed: nibbler stopped after processor failure")

  /** New + start in one call (reference: nibbler.go:188-197). */
  def start[T: Encoder](spark: SparkSession, cfg: NibblerConfig[T]): Nibbler[T] = {
    val n = new Nibbler[T](spark, cfg)
    n.start()
    n
  }
}

/** Config for the micro-batch processor (reference: nibbler.go:27-46).
  *
  * Defaults mirror the reference's `Sanitize` (nibbler.go:48-60):
  * sub-millisecond timeout -> 1s, sub-millisecond ticker -> 1m, size 0 -> 100.
  * A missing processor fails validation (nibbler.go:62-68).
  */
final case class NibblerConfig[T](
    processor: (Trigger, Seq[T]) => Unit,
    size: Int = 0,
    tickerDuration: Duration = Duration.Zero,
    processingTimeout: Duration = Duration.Zero,
    resumeAfterErr: Boolean = false,
    onError: (Seq[T], Throwable) => Unit = null) {

  def sanitized: NibblerConfig[T] = copy(
    size = if (size <= 0) Nibbler.DefaultSize else size,
    tickerDuration =
      if (tickerDuration < 1.milli) Nibbler.DefaultTicker else tickerDuration,
    processingTimeout =
      if (processingTimeout < 1.milli) Nibbler.DefaultTimeout else processingTimeout)

  def validate(): Unit =
    if (processor == null)
      throw new Nibbler.ValidationException("batch processor cannot be empty")
}

/** Embedded micro-batch processor: the reference's `Nibbler[T]`
  * (nibbler.go:75-197) re-expressed on Structured Streaming.
  *
  * Receiver -> `MemoryStream[T]` (a real streaming source); the listen loop
  * is a `StreamingQuery` with a processing-time trigger equal to the ticker
  * duration; each micro-batch is split into `size`-capped slices — full
  * slices flush immediately as `BatchFull` (reference: nibbler.go:160-165),
  * the remainder is carried and flushed by the ticker as `Ticker`
  * (reference: nibbler.go:153-158). Batches are reset only after successful
  * processing (nibbler.go:111-114); on processor error or exception the
  * failure callback runs and `resumeAfterErr` decides continue-vs-stop
  * (nibbler.go:137-149).
  *
  * Scale note: this class is the embedded, in-app API (driver-side batches,
  * like the reference — batches are `size` items by contract). For
  * cluster-scale streams use [[NibblerSink]], which applies the same
  * size+ticker semantics to distributed `Dataset` micro-batches without
  * collecting to the driver.
  */
final class Nibbler[T: Encoder](spark: SparkSession, rawCfg: NibblerConfig[T]) {
  rawCfg.validate()
  private val cfg = rawCfg.sanitized

  private implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
  private val source = MemoryStream[T]
  private val lock = new Object
  private val carry = ArrayBuffer.empty[T]
  private val stopped = new AtomicBoolean(false)
  @volatile private var query: StreamingQuery = _
  private var ticker: ScheduledExecutorService = _
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** Push one item (reference `Receiver()`, nibbler.go:120-122). Throws
    * [[Nibbler.ReceiverClosedException]] once the nibbler has stopped after a
    * non-resumable failure — the analog of "send on closed channel".
    */
  def push(item: T): Unit = pushAll(Seq(item))

  def pushAll(items: Seq[T]): Unit = {
    if (stopped.get()) throw new Nibbler.ReceiverClosedException
    source.addData(items)
  }

  def isActive: Boolean = !stopped.get() && query != null && query.isActive

  /** Start listening (reference `Listen()`, nibbler.go:125-150).
    *
    * The QUERY trigger is a fast poll, NOT the ticker: the reference
    * checks batch fullness on every arrival (nibbler.go:160-165), so
    * arrivals must reach foreachBatch promptly — a trigger equal to the
    * ticker would delay full-batch flushes (and drain calls) by up to a
    * whole ticker period. Ticker semantics live in the carry buffer +
    * ticker thread.
    */
  def start(): this.type = {
    val tickMs = cfg.tickerDuration.toMillis
    val pollMs = math.max(1L, math.min(tickMs, 50L))
    query = source.toDS().writeStream
      .queryName(s"nibbler-${System.identityHashCode(this)}")
      .trigger(SSTrigger.ProcessingTime(pollMs))
      .outputMode("append")
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        val items = batch.collect()
        lock.synchronized {
          if (!stopped.get()) {
            carry ++= items
            while (carry.length >= cfg.size && !stopped.get())
              flushLocked(Trigger.BatchFull, cfg.size)
          }
        }
      }
      .start()
    ticker = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "nibbler-ticker"); t.setDaemon(true); t
    })
    ticker.scheduleAtFixedRate(() => tick(), tickMs, tickMs, TimeUnit.MILLISECONDS)
    this
  }

  /** Ticker flush of a non-empty partial batch (nibbler.go:153-158). */
  private def tick(): Unit = lock.synchronized {
    if (!stopped.get() && carry.nonEmpty) flushLocked(Trigger.Ticker, carry.length)
  }

  /** Process `n` items under the processing timeout; reset them from the
    * carry buffer only on success (nibbler.go:98-117). Must hold `lock`.
    */
  private def flushLocked(trigger: Trigger, n: Int): Unit = {
    val slice = carry.take(n).toVector
    val result =
      try {
        Await.result(Future(cfg.processor(trigger, slice)), cfg.processingTimeout)
        None
      } catch {
        case e: TimeoutException => Some(e)
        case NonFatal(e)         => Some(e) // panic recovery (nibbler.go:81-96)
      }
    result match {
      case None =>
        carry.remove(0, n)
      case Some(err) =>
        if (cfg.onError != null)
          try cfg.onError(slice, err) catch { case NonFatal(_) => () }
        if (cfg.resumeAfterErr) {
          // Skip past the failed batch (nibbler.go:146-148).
          carry.remove(0, n)
        } else {
          stopped.set(true)
          carry.clear()
          stopAsync()
        }
    }
  }

  private def stopAsync(): Unit = {
    val q = query
    val t = ticker
    new Thread(() => {
      try if (q != null && q.isActive) q.stop() catch { case NonFatal(_) => () }
      if (t != null) t.shutdown()
    }, "nibbler-stopper").start()
  }

  /** Drain everything already pushed through the processor (test/shutdown
    * aid; the reference's tests sleep instead).
    */
  def awaitIdle(): Unit = processAllAvailable()

  def processAllAvailable(): Unit = {
    val q = query
    if (q != null && q.isActive)
      try q.processAllAvailable() catch { case NonFatal(_) => () }
  }

  /** Flush any carried partial batch as a ticker flush, then stop. Safe to
    * call from user threads (never from inside the processor).
    */
  def stop(): Unit = {
    processAllAvailable()
    lock.synchronized {
      if (!stopped.get() && carry.nonEmpty) flushLocked(Trigger.Ticker, carry.length)
      stopped.set(true)
    }
    val q = query
    try if (q != null && q.isActive) q.stop() catch { case NonFatal(_) => () }
    if (ticker != null) ticker.shutdown()
  }
}
