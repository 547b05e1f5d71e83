package graft.streaming

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger => SSTrigger}
import org.apache.spark.storage.StorageLevel

/** Distributed counterpart of [[Nibbler]] (SURVEY.md A13): the same
  * size-or-ticker semantics applied to ANY streaming Dataset — file source,
  * rate source, Kafka-shaped sources — without collecting batches to the
  * driver.
  *
  * The ticker is the processing-time trigger; "batch full" is detected by
  * counting the micro-batch (cheap: the batch is persisted before the count
  * so the processor's pass doesn't rescan the source). The processor
  * receives the whole micro-batch as a Dataset, so its work (writes to a
  * sink, bulk upserts — the reference README's "bulk insert" use case)
  * runs distributed on executors.
  *
  * Error semantics mirror the reference (nibbler.go:137-149): processor
  * exceptions route to `onError` with the failed batch; `resumeAfterErr`
  * decides whether the query keeps running (offsets advance past the failed
  * batch) or fails.
  */
object NibblerSink {

  final case class Config[T](
      processor: (Trigger, Dataset[T]) => Unit,
      /** Batches at least this large count as BATCH_FULL flushes. At scale,
        * pair with source rate limits (maxFilesPerTrigger /
        * maxOffsetsPerTrigger) so one trigger ~ one "full" batch.
        */
      size: Long = 100L,
      tickerDuration: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(1, "min"),
      resumeAfterErr: Boolean = false,
      onError: (Dataset[T], Throwable) => Unit = null)

  /** Attach the micro-batch semantics to a streaming Dataset and return the
    * started query's writer (caller invokes .start()).
    */
  def writer[T](ds: Dataset[T], cfg: Config[T]): DataStreamWriter[T] =
    ds.writeStream
      .trigger(SSTrigger.ProcessingTime(cfg.tickerDuration.toMillis))
      .foreachBatch { (batch: Dataset[T], _: Long) =>
        batch.persist(StorageLevel.MEMORY_AND_DISK)
        try {
          val n = batch.count()
          if (n > 0) {
            val trigger =
              if (n >= cfg.size) Trigger.BatchFull else Trigger.Ticker
            try cfg.processor(trigger, batch)
            catch {
              case NonFatal(e) =>
                if (cfg.onError != null)
                  try cfg.onError(batch, e) catch { case NonFatal(_) => () }
                if (!cfg.resumeAfterErr) throw e
            }
          }
        } finally batch.unpersist()
      }

  def start[T](ds: Dataset[T], cfg: Config[T]): StreamingQuery =
    writer(ds, cfg).start()
}
