package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream (SURVEY.md A14/A15):
  * watermarked tumbling-window aggregation and custom keyed state via
  * mapGroupsWithState — the two Structured Streaming primitives a nibbler
  * user graduates to when per-batch callbacks stop being enough.
  *
  * Scale notes: the window agg shuffles on (window, event_type) with
  * partial aggregation map-side; state in sessionTracker is bounded by the
  * processing-time timeout so the state store cannot grow without bound on
  * a 100 TB/day stream.
  */
object EventsPipeline {

  /** Streaming exact dedup by id with bounded state (A16): the streaming
    * twin of Dedup.d1 — a duplicate id arriving within the watermark
    * horizon is dropped even if its timestamp differs (the key is the id
    * ALONE, via dropDuplicatesWithinWatermark); per-id state is evicted
    * once the watermark passes it, so the store stays bounded on an
    * unbounded stream.
    */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(idCol)

  /** Production state-store configuration for the stateful operators here
    * (sessionTracker, dedupStream, tumblingAgg) on a 100 TB/day stream:
    * the RocksDB provider keeps keyed state off the executor heap (no GC
    * pressure from hundreds of millions of keys) with changelog
    * checkpointing so each commit ships only the delta. Apply via
    * `conf.foreach { case (k, v) => spark.conf.set(k, v) }` before
    * starting queries.
    */
  val RocksDBStateStore: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")

  /** Watermarked 1-minute tumbling aggregation (A14). Works on any
    * streaming or batch DataFrame with (ts: timestamp, event_type, value).
    */
  def tumblingAgg(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("win.start").as("minute_start"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(nEvents: Long, lastSec: Long, nSessions: Long)

  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Custom keyed state (A15): per-user session counting with a 30-minute
    * gap rule, the streaming twin of the batch q17_events_sessionize.
    *
    * Pass `GroupStateTimeout.ProcessingTimeTimeout` in production so idle
    * users' state is evicted after an hour and the store stays bounded on an
    * unbounded key space. (Caveat: with a processing-time timeout the
    * stateful operator always requests another micro-batch, so
    * `processAllAvailable()` never quiesces — fine for a long-running
    * service, wrong for drain-style tests, hence the NoTimeout default.)
    */
  def sessionTracker(
      events: Dataset[Event],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](timeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val st = state.getOption.getOrElse(SessionState(0, 0, 0))
            state.remove()
            SessionUpdate(userId, st.nSessions, st.nEvents)
          } else {
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val sec = e.ts.getTime / 1000
              val newSession = st.lastSec == Long.MinValue || sec - st.lastSec > 1800
              st = SessionState(
                nEvents = st.nEvents + 1,
                lastSec = sec,
                nSessions = st.nSessions + (if (newSession) 1 else 0))
            }
            state.update(st)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            SessionUpdate(userId, st.nSessions, st.nEvents)
          }
      }
  }
}
