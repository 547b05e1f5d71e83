package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Watermarked streaming approximate-distinct per tumbling window
    * (A27): distinct users per window via HLL++ — per-window state is a
    * FIXED-SIZE sketch instead of an unbounded distinct-user set, the
    * count-distinct shape that survives a 100 TB/day stream (exact
    * streaming countDistinct isn't supported precisely because its state
    * is unbounded). HLL register merges are max-per-register —
    * commutative and associative — so the streamed estimate EQUALS the
    * batch estimate on the same data regardless of micro-batch slicing
    * (spec-pinned), and the watermark evicts closed windows' sketches.
    */
  def approxDistinctAgg(events: DataFrame, windowDur: String = "1 minute",
      watermark: String = "2 minutes", rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"))
      .select(col("win.start").as("window_start"), col("approx_users"))

  /** A34 — STREAMING KMV sketch roll-up: batch x8's twin, closing the
    * sketch pack's streaming story. [[graft.functions.KMinValues]] is
    * the aggregation inside a watermarked windowed agg (the A27 pattern
    * with the custom mergeable aggregate): per micro-batch the partial
    * buffers update, across micro-batches the state-store buffer MERGES
    * — and the KMV merge (keep the k smallest distinct) is commutative
    * and associative, so the emitted sketch is BIT-IDENTICAL to the
    * batch sketch over the same rows regardless of micro-batch slicing
    * (spec-pinned, the pigeonhole argument x8's oracle proves for the
    * batch roll-up). State per open (window, type) is k longs — bounded
    * by the PARAMETER — and the watermark evicts closed windows, so the
    * shape survives a 100 TB/day stream. The emitted sketch column is
    * the per-window artifact a downstream x8-style roll-up merges
    * without raw data; distinct_users applies the same estimator as
    * batch ([[graft.operators.Sketching.kmvCardinalityEstimate]]).
    */
  def kmvWindowedAgg(events: DataFrame, k: Int = 2048,
      windowDur: String = "1 minute", watermark: String = "2 minutes"): DataFrame =
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"), col("event_type"))
      .agg(graft.functions.KMinValues(xxhash64(col("user_id")), k).as("sk"))
      .select(col("win.start").as("window_start"), col("event_type"), col("sk"),
        round(graft.operators.Sketching.kmvCardinalityEstimate(col("sk"), k))
          .cast("long").as("distinct_users"))

  /** A51 — STREAMING windowed quantiles via the MRL mergeable sketch
    * (batch x18's twin; the A34 pattern with
    * [[graft.functions.MrlSketchAgg]] as the aggregate): per (window,
    * event_type) the stream maintains one compactor-hierarchy sketch —
    * state is parameter-bounded (k doubles per level over ~log2(n/k)
    * levels), the watermark evicts closed windows, and the emitted
    * BINARY sketch column keeps mrl_union-merging downstream without
    * raw data (the whole point of mergeability: the stream emits
    * per-window partials, any later grain is a union). The estimate
    * columns read the per-window sketch in place; the MRL rank bound
    * L·n/k holds under any micro-batch slicing because merge order
    * never affects it (the x18 contract).
    */
  def mrlWindowedQuantiles(events: DataFrame, k: Int = 256,
      windowDur: String = "1 minute", watermark: String = "2 minutes"): DataFrame =
    events
      .filter(col("value").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"), col("event_type"))
      .agg(graft.functions.MrlSketchAgg(col("value"), k).as("sk"),
        count(lit(1)).as("n_events"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("sk"), col("n_events"),
        graft.functions.MrlQuantile(col("sk"), 0.5).as("est_median"),
        graft.functions.MrlQuantile(col("sk"), 0.9).as("est_p90"))

  /** A43 — STREAMING windowed distinct via the exactly-replayable HLL
    * registers (batch x15's twin; the A34 pattern with
    * [[graft.functions.HllRegisters]] as the aggregate): where A26's
    * built-in approx_count_distinct admits only estimate-level checks,
    * the md5-56 register array is DETERMINISTIC given the rows, and the
    * register merge (element-wise max) is commutative/associative/
    * idempotent — so the emitted per-window sketch is BIT-IDENTICAL to
    * the batch sketch over the same rows regardless of micro-batch
    * slicing (spec-pinned), and per-window sketches keep max-merging
    * downstream without raw data (the x15 roll-up). State per open
    * (window, type) is 2^p longs — parameter-bounded; the watermark
    * evicts closed windows. The estimate column applies x15's exact
    * one-division estimator with the same interpolated constant.
    */
  def hllWindowedDistinct(events: DataFrame, p: Int = 7,
      windowDur: String = "1 minute", watermark: String = "2 minutes"): DataFrame = {
    val c = graft.functions.HllRegisters.alphaM(p) *
      (1L << p).toDouble * (1L << p).toDouble * math.pow(2.0, 57 - p)
    events
      .filter(col("user_id").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"), col("event_type"))
      .agg(graft.functions.HllRegisters(col("user_id").cast("string"), p).as("regs"))
      .select(col("win.start").as("window_start"), col("event_type"), col("regs"),
        round(lit(c) / expr(
          s"aggregate(regs, 0L, (acc, r) -> acc + shiftleft(1L, cast(${57 - p} - r AS int)))")
          .cast("double")).cast("long").as("distinct_users"))
  }

  /** A35 — STREAMING corpus card: batch p5's incremental twin, the
    * per-ingest-window dataset summary a continuously-ingesting corpus
    * publishes instead of re-scanning itself. Same shape discipline as
    * A27/A34: every aggregate is commutative/associative (count, sum,
    * min, max — the quality average is the SUM OF INTEGER-QUANTIZED
    * scores exactly like p5, so no float accumulation order exists to
    * diverge), hence the streamed card is bit-equal to the batch card
    * over the same rows regardless of micro-batch slicing (spec-pinned).
    * State per open (window, lang, source) is one fixed-width buffer;
    * the watermark evicts closed windows. The doc stream must carry an
    * ingest `ts` column — event time for a corpus is arrival time.
    */
  def corpusCardStream(docs: DataFrame, windowDur: String = "1 minute",
      watermark: String = "2 minutes", qualityMin: Double = 0.61): DataFrame = {
    import graft.operators.Num.{r2, r4}
    val q = graft.operators.TextAnalysis.qualityScore(col("text"))
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("win"), col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("total_tokens"),
        sum(floor(q * 10000.0 + 0.5).cast("long")).as("qsum"),
        sum(when(q >= qualityMin, 1L).otherwise(0L)).as("n_quality_pass"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(col("win.start").as("window_start"), col("lang"), col("source"),
        col("n_docs"), col("total_tokens"),
        r2(col("total_tokens") / col("n_docs")).as("avg_tokens"),
        r4(col("qsum") / (col("n_docs") * 10000.0)).as("avg_quality"),
        col("n_quality_pass"), col("min_chars"), col("max_chars"))
  }

  /** Watermarked SLIDING-window aggregation (A22): each event counts into
    * duration/slide overlapping windows (Expand + hash agg, incremental
    * under streaming — state is one row per open (window, type), evicted
    * past the watermark). Batch twin: q33_events_sliding.
    */
  def slidingAgg(events: DataFrame, duration: String = "10 minutes",
      slide: String = "5 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), duration, slide).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(nEvents: Long, lastSec: Long, nSessions: Long)

  final case class SessionUpdate(user_id: Long, n_sessions: Long, n_events: Long)

  /** Native gap-based session windows (A18): groups each user's events
    * into sessions that close after `gap` of inactivity — the built-in
    * operator twin of [[sessionTracker]]'s hand-rolled state (and, in
    * batch mode, of the lag+cumsum spelling in q17/q27). State is bounded
    * by the watermark; the aggregation is map-side partial like any
    * groupBy.
    */
  def sessionWindowAgg(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sess"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("user_id"), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"), col("total_value"))

  /** Watermarked stream-stream interval join (A19, outer variants A26):
    * each purchase matched to the same user's clicks in the `horizon`
    * before it. Both sides are watermarked and the join condition bounds
    * event-time distance, so Spark can expire join state — the
    * unbounded-state trap of a naive stream-stream equi-join is
    * structurally avoided. At 100 TB/day the state store holds one
    * horizon's worth of each side, partitioned by user_id.
    *
    * `joinType` left/right/full outer (A26) emits the unmatched side
    * null-extended — NOT immediately, but when the watermark closes that
    * row's match horizon (only then is "no partner" final), so outer
    * results trail the inner ones by up to horizon + watermark delay:
    * the abandoned-click shape a funnel pipeline wants, with the same
    * state bound as the inner join.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      horizonMinutes: Int = 10, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_outer", "right_outer", "full_outer", "left_semi")(joinType),
      s"unsupported stream-stream joinType: $joinType")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", s"$horizonMinutes minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", s"$horizonMinutes minutes")
    val joined = c.join(p, expr(
      s"""c_user = p_user AND
          click_ts BETWEEN purchase_ts - INTERVAL $horizonMinutes MINUTES
                       AND purchase_ts"""), joinType)
    if (joinType == "left_semi")
      joined.select(col("c_user").as("user_id"), col("click_id"), col("click_ts"))
    else joined
      // outer variants leave one side null — the surviving side names the user
      .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("click_id"),
        col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Stream-static enrichment join (A20): a streaming fact joined to a
    * batch dimension. The dimension is broadcast — each micro-batch plans
    * a broadcast hash join, no shuffle of the stream and no state store
    * at all (the static side is re-resolved per batch, picking up dim
    * updates).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

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

  /** Arbitrary stateful processing v2 (A21): the same per-user session
    * counting as [[sessionTracker]], re-expressed on Spark 4's
    * `transformWithState` StatefulProcessor API — typed named state
    * variables (value/list/map) with per-variable TTL, timers, and schema
    * evolution, the successor to mapGroupsWithState for long-lived
    * services. In production pass a `ttl` so an unbounded user key space
    * stays bounded (the v2 analog of A15's processing-time timeout); state
    * v2 requires the RocksDB provider ([[RocksDBStateStore]]).
    */
  class SessionProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, Event, SessionUpdate] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], ttl)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[SessionUpdate] = {
      var st = if (state.exists()) state.get() else SessionState(0L, Long.MinValue, 0L)
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val sec = e.ts.getTime / 1000
        val newSession = st.lastSec == Long.MinValue || sec - st.lastSec > 1800
        st = SessionState(
          nEvents = st.nEvents + 1,
          lastSec = sec,
          nSessions = st.nSessions + (if (newSession) 1 else 0))
      }
      state.update(st)
      Iterator.single(SessionUpdate(user, st.nSessions, st.nEvents))
    }
  }

  /** [[SessionProcessor]] wired onto a stream — must run with the RocksDB
    * state store ([[RocksDBStateStore]]); see the spec for the contract
    * that its outputs equal [[sessionTracker]]'s batch for batch.
    */
  def sessionTrackerTws(events: Dataset[Event],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(ttl), TimeMode.None(), OutputMode.Update())
  }

  final case class OutlierFlag(event_id: Long, event_type: String,
      value: Double, is_outlier: Boolean)

  /** Streaming IQR outlier gate (A49) — batch q54's published-fences
    * twin: the Tukey fences are RANK-based, so a stream cannot compute
    * them online; the production shape (the t15 quality-model pattern)
    * computes fences in batch over the trusted window
    * ([[graft.operators.Relational.iqrFences]] — the SAME definition the
    * batch gate uses), publishes the enum-sized (lo, hi) map, and gates
    * arrivals row-locally against it. STATELESS — the A24 class: no
    * shuffle, no state; spec pins streamed flags == fence replay and the
    * per-type outlier totals == batch q54's counts. Types without a
    * published fence PASS (is_outlier = false): an unseen enum value is
    * a schema event for governance, not a numeric outlier.
    */
  def iqrGateStream(
      events: Dataset[(Long, String, Double)],
      fences: Map[String, (Double, Double)]): Dataset[OutlierFlag] = {
    import events.sparkSession.implicits._
    val bc = events.sparkSession.sparkContext.broadcast(fences)
    events.map { case (id, tpe, v) =>
      val out = bc.value.get(tpe) match {
        case Some((lo, hi)) => v < lo || v > hi
        case None => false
      }
      OutlierFlag(id, tpe, v, out)
    }
  }

  final case class EwmaState(n: Long, s: Double)
  final case class EwmaUpdate(user_id: Long, n_events: Long, ewma: Double)

  /** A48 — streaming EWMA per user (batch q53's stateful twin): the
    * telemetry primitive as live state — ValueState holds (n, s) and
    * each arriving event folds s = (s + x) / 2 in event_id order WITHIN
    * the batch, continuing the fold ACROSS batches from state. Exactly
    * batch `Relational.ewmaByUser`'s dyadic recursion, so for in-order
    * streams (the log-replay/CDC regime this processor declares — an
    * out-of-order feed needs a watermarked re-sort upstream) the final
    * per-user (n, ewma) is BIT-IDENTICAL to the batch fold regardless
    * of micro-batch slicing: dyadic α + pinned order, no
    * associativity assumption needed because the fold literally resumes
    * from the carried s.
    */
  class EwmaProcessor extends StatefulProcessor[Long, (Long, Long, Double), EwmaUpdate] {
    @transient private var state: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[EwmaUpdate] = {
      var st = if (state.exists()) state.get() else EwmaState(0L, 0.0)
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        st = EwmaState(st.n + 1, if (st.n == 0L) v else (st.s + v) / 2.0)
      }
      state.update(st)
      Iterator.single(EwmaUpdate(user, st.n, st.s))
    }
  }

  /** [[EwmaProcessor]] wired onto a (event_id, user_id, value) stream —
    * RocksDB state store required (the A21 contract).
    */
  def ewmaTws(events: Dataset[(Long, Long, Double)]): Dataset[EwmaUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class TsWinState(n: Long, tail: Seq[Double])
  final case class TsWinUpdate(user_id: Long, start: Long, dist: Double,
      dist_z: Double)

  /** A56 — STREAMING time-series subsequence scoring (B56's twin): the
    * per-user sliding-window assembly as BOUNDED transformWithState —
    * state is exactly the last L-1 values plus a position counter (L is
    * a query parameter, so per-user state is constant regardless of
    * stream length: the A48/q55 discipline). A window completing at
    * position p (stride-aligned start p-L+1) emits once with its
    * distance folded by the LITERAL batch recurrence
    * ([[graft.operators.Relational.tsDistance]] — ascending-index
    * (x-q)^2 from 0.0, the q53 pinned-fold contract) AND by q57's
    * z-normalized recurrence ([[graft.operators.Relational
    * .tsZnormDistance]] — the UCR form a live telemetry matcher runs:
    * match SHAPE, not scale/offset; same bounded state, two scores per
    * completed window), so streamed scores are bit-equal to
    * [[graft.operators.Relational.tsSubsequenceScores]] /
    * [[graft.operators.Relational.tsZnormSubsequenceScores]] under ANY
    * micro-batch slicing. Contract: per-user IN-ORDER arrival by
    * event_id (the append-log case — event ids assigned monotonically
    * at ingest); within a batch rows sort by event_id, so only
    * CROSS-batch disorder violates it.
    */
  class TsWindowProcessor(query: Seq[Double], stride: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), TsWinUpdate] {
    private val L = query.size
    private val (qz, qnorm) = graft.operators.Relational.znormQueryConstants(query)
    @transient private var state: ValueState[TsWinState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TsWinState](
        "tswin", Encoders.product[TsWinState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[TsWinUpdate] = {
      var st = if (state.exists()) state.get() else TsWinState(0L, Vector.empty)
      val out = Seq.newBuilder[TsWinUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val p = st.n + 1
        val buf = (st.tail :+ v).takeRight(L)
        if (p >= L && (p - L) % stride == 0)
          out += TsWinUpdate(user, p - L + 1,
            graft.operators.Relational.tsDistance(buf, query),
            graft.operators.Relational.tsZnormDistance(buf, qz, qnorm))
        st = TsWinState(p, buf.takeRight(math.max(L - 1, 0)))
      }
      state.update(st)
      out.result().iterator
    }
  }

  def tsWindowsTws(events: Dataset[(Long, Long, Double)], query: Seq[Double],
      stride: Int): Dataset[TsWinUpdate] = {
    require(query.nonEmpty && stride >= 1)
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new TsWindowProcessor(query, stride),
        TimeMode.None(), OutputMode.Update())
  }

  final case class TsLeftState(n: Long, tail: Seq[Double],
      ring: Seq[(Long, Seq[Double])])
  final case class TsLeftUpdate(user_id: Long, start: Long, nn_start: Long,
      dist: Double)

  /** A57 — STREAMING left matrix profile (B62's twin): the profile
    * variant that streams EXACTLY, because a window's left-NN (nearest
    * neighbor among preceding windows within the horizon) is FINAL at
    * window completion — append-only output, no retractions. State per
    * user = the TsWindowProcessor tail (L-1 values + counter) PLUS a
    * ring of the ≤ horizon/stride most recent completed windows (L
    * doubles each) — everything bounded by the L/stride/horizon
    * PARAMETERS, the A48/q55 discipline. Distance is the LITERAL batch
    * fold ([[graft.operators.Relational.tsDistance]]), ties break to
    * the smallest predecessor start by an ascending strict-less scan —
    * the same (dist, pstart) order as batch's min(struct) — so
    * streamed rows are BIT-IDENTICAL to [[graft.operators.Relational
    * .tsLeftProfile]] under any micro-batch slicing (spec). Same
    * in-order-by-event_id arrival contract as A56.
    */
  class TsLeftProfileProcessor(L: Int, stride: Int, horizon: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), TsLeftUpdate] {
    require(L >= 1 && stride >= 1 && horizon >= L)
    @transient private var state: ValueState[TsLeftState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TsLeftState](
        "tsleft", Encoders.product[TsLeftState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[TsLeftUpdate] = {
      var st = if (state.exists()) state.get()
        else TsLeftState(0L, Vector.empty, Vector.empty)
      val out = Seq.newBuilder[TsLeftUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val p = st.n + 1
        val buf = (st.tail :+ v).takeRight(L)
        var ring = st.ring
        if (p >= L && (p - L) % stride == 0) {
          val start = p - L + 1
          // ascending-pstart strict-less scan == batch min(struct(dist, pstart))
          var bestD = Double.NaN
          var bestS = -1L
          ring.foreach { case (ps, pv) =>
            if (start - ps >= L && start - ps <= horizon) {
              val d = graft.operators.Relational.tsDistance(buf, pv)
              if (bestS < 0 || d < bestD) { bestD = d; bestS = ps }
            }
          }
          if (bestS >= 0) out += TsLeftUpdate(user, start, bestS, bestD)
          // retain only windows future completions can still reach:
          // the next window starts at start+stride and reaches back
          // `horizon` positions
          ring = (ring :+ (start, buf))
            .filter { case (ps, _) => ps >= start + stride - horizon }
        }
        st = TsLeftState(p, buf.takeRight(math.max(L - 1, 0)), ring)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def tsLeftProfileTws(events: Dataset[(Long, Long, Double)], L: Int,
      stride: Int, horizon: Int): Dataset[TsLeftUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new TsLeftProfileProcessor(L, stride, horizon),
        TimeMode.None(), OutputMode.Update())
  }

  final case class TsFlossState(n: Long, tail: Seq[Double],
      ring: Seq[(Long, Seq[Double])], pend: Seq[(Long, Long)],
      curve: Seq[(Long, Long, Double)])
  final case class TsFlossUpdate(user_id: Long, boundary: Long,
      crossings: Long, cac1: Double)

  /** A62 — STREAMING FLOSS (Gharghabi et al., ICDM 2017 §4.2: the online
    * half of q64's FLUSS): the one-sided corrected arc-crossing curve
    * emitted AS THE SERIES ARRIVES. Arcs are the left profile's (A57's
    * state discipline — a window's nearest PRECEDING neighbor within the
    * horizon is final at window completion), so a boundary's crossing
    * count is final exactly when the last window that can reach it
    * (index boundary+H−1, H = horizon/stride) completes — at which point
    * ONE row emits, never to be retracted.
    *
    * State per user = A57's window ring (≤ H windows of L doubles) PLUS
    * ≤ H+1 pending (boundary, count) integer pairs — all parameter-
    * bounded, the A48/q55 discipline. Emission arithmetic is the batch
    * column spelling verbatim (min(1, c/IAC) then r4), and the emission
    * SET equals [[graft.operators.Relational.tsFlossCac1]]'s rows
    * exactly on a replayed finite series: the batch frame's trusted
    * interior [H, n−H] is precisely the set of boundaries that finalize
    * before the stream ends (spec-pinned bit-equal across micro-batch
    * slicings). Same in-order-by-event_id arrival contract as A56/A57.
    */
  /** One processor, two operators: `alerts = None` is A62 (every
    * finalized curve point emits); `alerts = Some((threshold, zone))` is
    * A63 — regime-boundary ALERTS, B67's online twin: finalized points
    * land in a ≤ 2·zone+1 curve ring instead of emitting, and boundary
    * bD = bF − zone becomes DECIDABLE the moment bF finalizes (its full
    * ±zone context is then final) — emit iff cac1(bD) ≤ threshold,
    * strictly below the preceding-zone minimum (empty window passes —
    * the trusted curve starts at H, same partial edge as batch), and ≤
    * the following-zone minimum (always full by construction: exactly
    * B67's boundary + zone ≤ maxb cap, so streamed alerts equal the
    * batch rows with no end-of-series dependence).
    */
  class TsFlossProcessor(L: Int, stride: Int, horizon: Int,
      alerts: Option[(Double, Int)] = None)
      extends StatefulProcessor[Long, (Long, Long, Double), TsFlossUpdate] {
    require(L >= 1 && stride >= 1 && horizon >= L && horizon % stride == 0)
    private val g0 = (L + stride - 1) / stride
    private val gmax = horizon / stride
    require(gmax >= g0)
    private val iac = g0 + (gmax - g0) / 2.0 // the batch lit(iac) constant
    alerts.foreach { case (thr, zone) => require(zone >= 1 && thr > 0.0) }
    @transient private var state: ValueState[TsFlossState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TsFlossState](
        "tsfloss", Encoders.product[TsFlossState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[TsFlossUpdate] = {
      var st = if (state.exists()) state.get()
        else TsFlossState(0L, Vector.empty, Vector.empty, Vector.empty,
          Vector.empty)
      val out = Seq.newBuilder[TsFlossUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val p = st.n + 1
        val buf = (st.tail :+ v).takeRight(L)
        var ring = st.ring
        var pend = st.pend
        var curve = st.curve
        if (p >= L && (p - L) % stride == 0) {
          val start = p - L + 1
          val i = (start - 1) / stride
          // left-NN over the ring — A57's ascending strict-less scan,
          // the batch min(struct(dist, pstart)) order
          var bestD = Double.NaN
          var bestS = -1L
          ring.foreach { case (ps, pv) =>
            if (start - ps >= L && start - ps <= horizon) {
              val d = graft.operators.Relational.tsDistance(buf, pv)
              if (bestS < 0 || d < bestD) { bestD = d; bestS = ps }
            }
          }
          if (bestS >= 0) {
            // arc (j -> i) crosses boundaries (j, i] — all still pending
            // (j >= i - gmax, so every touched boundary > the one about
            // to finalize); counters are created on first touch
            val j = (bestS - 1) / stride
            var b = j + 1
            while (b <= i) {
              val at = pend.indexWhere(_._1 == b)
              pend = if (at >= 0) pend.updated(at, (b, pend(at)._2 + 1L))
                else pend :+ (b, 1L)
              b += 1
            }
          }
          // boundary i-gmax+1 is now final: no window > i can arc across
          // it. Inside the trusted interior (>= gmax; the upper n-gmax
          // cap is automatic — later boundaries never finalize on a
          // finite series) it either emits (A62) or joins the decision
          // ring (A63).
          val bF = i - gmax + 1
          if (bF >= gmax) {
            val c = pend.find(_._1 == bF).map(_._2).getOrElse(0L)
            val cac = graft.operators.Num.r4Double(
              math.min(1.0, c.toDouble / iac))
            alerts match {
              case None =>
                out += TsFlossUpdate(user, bF, c, cac)
              case Some((thr, zone)) =>
                curve = curve :+ ((bF, c, cac))
                val bD = bF - zone
                curve.find(_._1 == bD).foreach { case (_, cD, cacD) =>
                  // mp over [bD-zone, bD-1] (the batch rangeBetween
                  // (-zone, -1) frame): possibly partial at the trusted
                  // edge (batch's null-passes contract); mn over
                  // [bD+1, bD+zone] = bD+1..bF, always full here
                  val mp = curve.collect {
                    case (b, _, cc) if b >= bD - zone && b < bD => cc }
                  val mn = curve.collect {
                    case (b, _, cc) if b > bD && b <= bD + zone => cc }
                  if (cacD <= thr && (mp.isEmpty || cacD < mp.min) &&
                      cacD <= mn.min)
                    out += TsFlossUpdate(user, bD, cD, cacD)
                }
                curve = curve.filter(_._1 > bD - zone)
            }
          }
          pend = pend.filter(_._1 > bF)
          ring = (ring :+ (start, buf))
            .filter { case (ps, _) => ps >= start + stride - horizon }
        }
        st = TsFlossState(p, buf.takeRight(math.max(L - 1, 0)), ring, pend,
          curve)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def tsFlossCac1Tws(events: Dataset[(Long, Long, Double)], L: Int,
      stride: Int, horizon: Int): Dataset[TsFlossUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new TsFlossProcessor(L, stride, horizon),
        TimeMode.None(), OutputMode.Update())
  }

  /** A63 — streaming regime-boundary alerts (B67's twin): see
    * [[TsFlossProcessor]]'s `alerts` mode.
    */
  def tsFlossAlertsTws(events: Dataset[(Long, Long, Double)], L: Int,
      stride: Int, horizon: Int, threshold: Double,
      zone: Int): Dataset[TsFlossUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(
        new TsFlossProcessor(L, stride, horizon, Some((threshold, zone))),
        TimeMode.None(), OutputMode.Update())
  }

  final case class AcfState(n: Long, s: Long, q: Long, tail: Seq[Long],
      cxy: Seq[Long], ah: Seq[Long], bt: Seq[Long], m: Seq[Long])
  final case class AcfUpdate(user_id: Long, pos: Long, period: Long,
      acf: Double)

  /** A65 — STREAMING ACF period monitor (B74's twin): the live
    * periodicity estimate a telemetry pipeline keeps per user — "has
    * this user's dominant cycle shifted?" — emitted after every
    * arrival. State per user is the last maxLag SCALED values plus
    * 3 + 4·maxLag exact integer accumulators (n/Σx/Σx² and per-lag
    * Σxy/Σx_head/Σx_tail/pair count) — PARAMETER-bounded regardless of
    * stream length (the A48/A56 discipline), and because every
    * accumulator is an exact integer the fold is order-free WITHIN the
    * arithmetic: after the last arrival the accumulators are
    * bit-identical to the batch q74 sufficient statistics under ANY
    * micro-batch slicing, and the scalar tail replays batch q74's
    * parenthesized IEEE tree verbatim ([[graft.operators.Num.r4Double]],
    * the shared r4 contract). Emission = the argmax lag ≥ 2 with the
    * same (acf desc, lag asc) tie rule and the same exact integer
    * flatness guard, so the FINAL emission per user equals q74's
    * `is_period` row exactly (spec-pinned across ≥ 2 slicings). Same
    * in-order-by-event_id arrival contract as A56/A57.
    */
  class AcfProcessor(maxLag: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), AcfUpdate] {
    @transient private var state: ValueState[AcfState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[AcfState](
        "acf", Encoders.product[AcfState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[AcfUpdate] = {
      val z = Vector.fill(maxLag)(0L)
      var st = if (state.exists()) state.get() else AcfState(0L, 0L, 0L,
        Vector.empty, z, z, z, z)
      val out = Seq.newBuilder[AcfUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val x = math.floor(v * 100.0 + 0.5).toLong
        val tail = st.tail.toVector
        val reach = math.min(st.n, maxLag.toLong).toInt
        var cxy = st.cxy.toVector; var ah = st.ah.toVector
        var bt = st.bt.toVector; var m = st.m.toVector
        (1 to reach).foreach { d =>
          val xh = tail(tail.size - d)
          cxy = cxy.updated(d - 1, cxy(d - 1) + xh * x)
          ah = ah.updated(d - 1, ah(d - 1) + xh)
          bt = bt.updated(d - 1, bt(d - 1) + x)
          m = m.updated(d - 1, m(d - 1) + 1L)
        }
        val n = st.n + 1
        val s = st.s + x
        val q = st.q + x * x
        st = AcfState(n, s, q, (tail :+ x).takeRight(maxLag), cxy, ah, bt, m)
        if (n >= 3) {
          val xb = s.toDouble / n.toDouble
          val flat = n * q - s * s == 0L
          val best = (2 to math.min(maxLag.toLong, n - 1).toInt).map { d =>
            val acf =
              if (flat) 0.0
              else graft.operators.Num.r4Double(
                (cxy(d - 1).toDouble - xb * ah(d - 1).toDouble -
                  xb * bt(d - 1).toDouble +
                  m(d - 1).toDouble * xb * xb) /
                (q.toDouble - n.toDouble * xb * xb))
            (acf, d.toLong)
          }.maxBy { case (a, d) => (a, -d) }
          out += AcfUpdate(user, n, best._2, best._1)
        }
      }
      state.update(st)
      out.result().iterator
    }
  }

  def acfPeriodTws(events: Dataset[(Long, Long, Double)],
      maxLag: Int): Dataset[AcfUpdate] = {
    require(maxLag >= 2, "acfPeriodTws: maxLag must be >= 2")
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new AcfProcessor(maxLag),
        TimeMode.None(), OutputMode.Update())
  }

  final case class SeasState(n: Long, ring: Seq[Long],
      sphi: Seq[Long], cnt: Seq[Long])
  final case class SeasUpdate(user_id: Long, pos: Long, phase: Long,
      tnum: Long, sphi: Long, cnt: Long)

  /** A66 — STREAMING seasonal-trend MA (B76's twin): the centered 2×P
    * moving average is a DELAYED-EMISSION statistic — position p's
    * trend needs h = P/2 future values, so the row for p − h completes
    * exactly when p arrives. State per user = a ring of the last
    * 2h + 1 scaled values + P running integer phase sums
    * (PARAMETER-bounded, the A48/A56 discipline). Every emitted field
    * is an exact integer (tnum = the MA numerator; sphi/cnt = the
    * running detrended phase sums after this row), so the stream is
    * bit-equal to batch q76 under ANY micro-batch slicing: emitted
    * r4(tnum/(200P)) == the batch trend column row for row, and the
    * LAST emission per (user, phase) carries exactly the batch phase
    * sufficient statistics — the batch seasonal index derives from
    * them by the same IEEE tree (spec-pinned). Same
    * in-order-by-event_id contract as A56/A57/A65.
    */
  class SeasonalMaProcessor(period: Int)
      extends StatefulProcessor[Long, (Long, Long, Double), SeasUpdate] {
    require(period >= 2 && period % 2 == 0)
    private val h = period / 2
    @transient private var state: ValueState[SeasState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SeasState](
        "seas", Encoders.product[SeasState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[SeasUpdate] = {
      var st = if (state.exists()) state.get() else SeasState(0L,
        Vector.empty, Vector.fill(period)(0L), Vector.fill(period)(0L))
      val out = Seq.newBuilder[SeasUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val x = math.floor(v * 100.0 + 0.5).toLong
        val n = st.n + 1
        val ring = (st.ring.toVector :+ x).takeRight(2 * h + 1)
        var sphi = st.sphi.toVector; var cnt = st.cnt.toVector
        if (n >= 2L * h + 1) {
          val pos = n - h
          // ring spans positions [pos − h, pos + h]: half-weighted ends
          val tnum = ring.head + ring.last +
            2L * ring.slice(1, 2 * h).sum
          val xm = ring(h) // the value AT pos
          val phase = pos % period
          val dsc = 2L * period * xm - tnum
          val pi = phase.toInt
          sphi = sphi.updated(pi, sphi(pi) + dsc)
          cnt = cnt.updated(pi, cnt(pi) + 1L)
          out += SeasUpdate(user, pos, phase, tnum, sphi(pi), cnt(pi))
        }
        st = SeasState(n, ring, sphi, cnt)
      }
      state.update(st)
      out.result().iterator
    }
  }

  def seasonalMaTws(events: Dataset[(Long, Long, Double)],
      period: Int): Dataset[SeasUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new SeasonalMaProcessor(period),
        TimeMode.None(), OutputMode.Update())
  }

  final case class CusumState(n: Long, sw: Long, z: Long, zmin: Long,
      prevAbove: Boolean)
  final case class CusumAlarm(user_id: Long, pos: Long, s_value: Double)

  /** A67 — STREAMING CUSUM mean-shift alarms (B80's twin): the
    * detector CUSUM was INVENTED as (Page 1954 — sequential by
    * construction), run live. State per user = FIVE scalars (position,
    * warm-up sum, Z, running min of Z, the upcrossing latch) — O(1),
    * the strongest state bound in the pack. Every scalar is an exact
    * integer, so the emitted alarm set is bit-equal to batch q80
    * under ANY micro-batch slicing (spec-pinned across 2 slicings);
    * the one IEEE division happens at emission, the shared r4
    * contract. Same in-order-by-event_id contract as A56/A65/A66.
    */
  class CusumProcessor(warmup: Int, kCents: Long, hCents: Long)
      extends StatefulProcessor[Long, (Long, Long, Double), CusumAlarm] {
    private val w = warmup.toLong
    @transient private var state: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[CusumAlarm] = {
      var st = if (state.exists()) state.get()
        else CusumState(0L, 0L, 0L, Long.MaxValue, prevAbove = false)
      val out = Seq.newBuilder[CusumAlarm]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val x = math.floor(v * 100.0 + 0.5).toLong
        val n = st.n + 1
        if (n <= w) st = CusumState(n, st.sw + x, 0L, Long.MaxValue, false)
        else {
          val z = st.z + (w * x - st.sw - w * kCents)
          val zmin = math.min(st.zmin, z)
          val s = z - math.min(0L, zmin)
          val above = s > w * hCents
          if (above && !st.prevAbove)
            out += CusumAlarm(user, n,
              graft.operators.Num.r4Double(s.toDouble / (100.0 * warmup)))
          st = CusumState(n, st.sw, z, zmin, above)
        }
      }
      state.update(st)
      out.result().iterator
    }
  }

  def cusumAlarmsTws(events: Dataset[(Long, Long, Double)],
      warmup: Int = 16, kCents: Long = 200L,
      hCents: Long = 1200L): Dataset[CusumAlarm] = {
    require(warmup >= 1 && kCents >= 0 && hCents > 0)
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new CusumProcessor(warmup, kCents, hCents),
        TimeMode.None(), OutputMode.Update())
  }

  final case class TrendState(n: Long, sp: Long, spp: Long, sx: Long,
      sxx: Long, spx: Long)
  final case class TrendUpdate(user_id: Long, n_events: Long,
      slope: Double, intercept: Double, r2: Double)

  /** A68 — STREAMING OLS trend monitor (B81's twin): the live
    * "is this user trending" readout. State per user = SIX integer
    * scalars (the OLS sufficient statistics — O(1), the A67 class);
    * integer accumulation is order-free, so after any prefix the
    * emitted fit equals batch q81 on that prefix BIT-EXACTLY (the
    * scalar tails are the shared IEEE trees, r4). Emits one updated
    * fit per arrival once n ≥ 2. Same in-order contract as A65-A67
    * only for the POSITION assignment (the statistics themselves are
    * permutation-invariant).
    */
  class TrendProcessor
      extends StatefulProcessor[Long, (Long, Long, Double), TrendUpdate] {
    @transient private var state: ValueState[TrendState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TrendState](
        "trend", Encoders.product[TrendState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long, Double)],
        timers: TimerValues): Iterator[TrendUpdate] = {
      var st = if (state.exists()) state.get()
        else TrendState(0L, 0L, 0L, 0L, 0L, 0L)
      val out = Seq.newBuilder[TrendUpdate]
      rows.toSeq.sortBy(_._1).foreach { case (_, _, v) =>
        val x = math.floor(v * 100.0 + 0.5).toLong
        val p = st.n + 1
        st = TrendState(p, st.sp + p, st.spp + p * p, st.sx + x,
          st.sxx + x * x, st.spx + p * x)
        if (p >= 2) {
          val covN = st.n * st.spx - st.sp * st.sx
          val varP = st.n * st.spp - st.sp * st.sp
          val varX = st.n * st.sxx - st.sx * st.sx
          val r4 = graft.operators.Num.r4Double _
          if (varX == 0L)
            out += TrendUpdate(user, st.n, 0.0,
              r4(st.sx.toDouble / st.n.toDouble / 100.0), 0.0)
          else out += TrendUpdate(user, st.n,
            r4(covN.toDouble / varP.toDouble / 100.0),
            r4((st.sx.toDouble / st.n.toDouble -
              covN.toDouble / varP.toDouble *
                (st.sp.toDouble / st.n.toDouble)) / 100.0),
            r4(covN.toDouble * covN.toDouble /
              (varP.toDouble * varX.toDouble)))
        }
      }
      state.update(st)
      out.result().iterator
    }
  }

  def trendLineTws(
      events: Dataset[(Long, Long, Double)]): Dataset[TrendUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._2)
      .transformWithState(new TrendProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  final case class PerplexityFlag(doc_id: Long, n_bigrams: Long,
      total_bits: Long, keep: Boolean)

  /** A33 — streaming perplexity gate: the BOUNDED twin of batch E16.
    * The full bigram model is vocabulary²-sized (why t16 has no direct
    * streaming twin — an unbounded broadcast is the exact scale-killer
    * the batch operator avoids by JOINING the model); the streaming
    * spelling ships the top-K most frequent bigrams (K is a parameter,
    * like a real exported LM's vocabulary cap) and charges out-of-model
    * bigrams a flat `oovBits` penalty. Each arriving doc is scored
    * row-locally over [[graft.functions.HashFunctions.tokensLocal]]
    * (the shared column-path tokenization twin) — STATELESS, the A24
    * pattern. Spec pins streamed flags == the batch truncated-model
    * scorer ([[graft.operators.TextAnalysis.perplexityFilterTopK]])
    * EXACTLY across micro-batch slicings.
    */
  def perplexityGateStream(docs: Dataset[(Long, String)],
      model: Map[(String, String), Long], oovBits: Long,
      maxBitsNum: Long = 433L, maxBitsDen: Long = 100L): Dataset[PerplexityFlag] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(model)
    docs.flatMap { case (id, text) =>
      if (text == null) None // batch twin: split(null) -> no token array
      else {
        val tk = graft.functions.HashFunctions.tokensLocal(text)
        if (tk.length < 2) None // batch twin: size(tk) >= 2 filter
        else {
          var i = 0
          var total = 0L
          while (i < tk.length - 1) {
            total += bc.value.getOrElse((tk(i), tk(i + 1)), oovBits)
            i += 1
          }
          val n = (tk.length - 1).toLong
          Some(PerplexityFlag(id, n, total, total * maxBitsDen <= maxBitsNum * n))
        }
      }
    }
  }

  final case class OrderRow(o_orderkey: Long, o_custkey: Long,
      o_orderdate: Timestamp, o_orderpriority: String)

  /** One streamed SCD2 span emission. `seq` is a per-customer emission
    * counter: an open span is re-emitted (updated n_orders) as orders
    * arrive and finally superseded by its CLOSE emission, so the
    * current truth per (customer, version) is the max-seq row — the
    * same latest-wins convention as any CDC-fed dimension table.
    */
  final case class ScdSpanUpdate(c_custkey: Long, version: Long,
      priority: String, effective_from: java.sql.Date,
      effective_to: Option[java.sql.Date], n_orders: Long, seq: Long)

  /** A31 — STREAMING SCD2 dimension maintenance: the stateful streaming
    * twin of batch [[graft.operators.Relational.scd2Dimension]] (B46),
    * the CDC-ingestion shape of the same islands semantics — the
    * dimension history stays current as order events arrive instead of
    * being rebuilt from the full fact table.
    *
    * State per customer = the OPEN span only (version, priority, first
    * day, count) — O(1) per key regardless of history length; closed
    * spans are emitted downstream and never revisited. A priority
    * change CLOSES the open span (effective_to = the new span's first
    * day, exactly the batch lead()) and opens the next version.
    *
    * Ordering contract: rows within a micro-batch are sorted by
    * (event time, order key) — the batch total order; ACROSS
    * micro-batches per-customer event-time monotonicity is the feed's
    * contract (CDC commit order provides it). The spec pins streamed
    * latest-per-version == the batch operator's spans exactly, across
    * micro-batch slicings.
    *
    * Day arithmetic twin: epoch-day under UTC == batch `to_date` under
    * the UTC session TZ (the q45/x8 cross-engine date convention).
    */
  class ScdProcessor extends StatefulProcessor[Long, OrderRow, ScdSpanUpdate] {
    @transient private var state: ValueState[ScdState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ScdState](
        "scd_open_span", Encoders.product[ScdState], TTLConfig.NONE)

    private def utcDay(ts: Timestamp): Int =
      math.floorDiv(ts.getTime, 86400000L).toInt

    private def day(d: Int): java.sql.Date =
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(d.toLong))

    override def handleInputRows(cust: Long, rows: Iterator[OrderRow],
        timers: TimerValues): Iterator[ScdSpanUpdate] = {
      var st = if (state.exists()) state.get() else null
      // seq advances on every EMISSION: a version's CLOSE always outranks
      // its earlier open snapshots, so latest-per-version is the truth
      var seq = if (st == null) 0L else st.seq
      val out = scala.collection.mutable.ArrayBuffer.empty[ScdSpanUpdate]
      rows.toSeq.sortBy(r => (r.o_orderdate.getTime, r.o_orderkey)).foreach { r =>
        val d = utcDay(r.o_orderdate)
        if (st == null) {
          st = ScdState(1L, r.o_orderpriority, d, 1L, 0L)
        } else if (r.o_orderpriority == st.priority) {
          st = st.copy(nOrders = st.nOrders + 1)
        } else {
          seq += 1
          out += ScdSpanUpdate(cust, st.version, st.priority,
            day(st.fromDay), Some(day(d)), st.nOrders, seq)
          st = ScdState(st.version + 1, r.o_orderpriority, d, 1L, 0L)
        }
      }
      if (st != null) {
        seq += 1
        out += ScdSpanUpdate(cust, st.version, st.priority,
          day(st.fromDay), None, st.nOrders, seq)
        state.update(st.copy(seq = seq))
      }
      out.iterator
    }
  }

  /** [[ScdProcessor]] wired onto an order stream — requires the RocksDB
    * state store ([[RocksDBStateStore]]), like all transformWithState
    * pipelines.
    */
  def scd2Stream(orders: Dataset[OrderRow]): Dataset[ScdSpanUpdate] = {
    import orders.sparkSession.implicits._
    orders
      .groupByKey(_.o_custkey)
      .transformWithState(new ScdProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class CdcOp(key: Long, seq: Long, op: String,
      custkey: Long, status: String, price: Double)

  final case class CdcRowUpdate(key: Long, version: Long, deleted: Boolean,
      custkey: Long, status: String, price: Double, emit_seq: Long)

  /** A42 — STREAMING CDC materialization: batch q49's compaction+apply
    * as continuous MATERIALIZED-VIEW MAINTENANCE — arriving change-log
    * ops (upserts/deletes with per-key sequence numbers) keep a
    * latest-row view current instead of re-compacting the full log.
    *
    * State per key = the LATEST op only (O(1) regardless of churn — the
    * q49 max_by, incrementalized). Each batch emits one update row per
    * touched key carrying the current materialized values (deletes emit
    * a tombstone); downstream latest-per-key by emit_seq IS the view —
    * the same latest-wins convention as A31's span updates. Late or
    * duplicate ops with seq <= the stored seq are ignored (idempotent
    * replay, the CDC at-least-once contract).
    */
  class CdcProcessor extends StatefulProcessor[Long, CdcOp, CdcRowUpdate] {
    @transient private var state: ValueState[CdcMatState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CdcMatState](
        "cdc_latest_op", Encoders.product[CdcMatState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcOp],
        timers: TimerValues): Iterator[CdcRowUpdate] = {
      var st = if (state.exists()) state.get() else null
      var changed = false
      rows.toSeq.sortBy(_.seq).foreach { r =>
        if (st == null || r.seq > st.seq) {
          st = CdcMatState(r.seq, r.op, r.custkey, r.status, r.price,
            if (st == null) 0L else st.emitSeq)
          changed = true
        }
      }
      if (changed) {
        val next = st.copy(emitSeq = st.emitSeq + 1)
        state.update(next)
        Iterator.single(CdcRowUpdate(key, next.seq, next.op == "D",
          next.custkey, next.status, next.price, next.emitSeq))
      } else Iterator.empty
    }
  }

  /** [[CdcProcessor]] wired onto a change-log stream — RocksDB state
    * store required, like all transformWithState pipelines.
    */
  def cdcApplyStream(ops: Dataset[CdcOp]): Dataset[CdcRowUpdate] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .transformWithState(new CdcProcessor, TimeMode.None(), OutputMode.Update())
  }

  final case class BandedDoc(band_key: Long, doc_id: Long, sig: Array[Long])

  final case class NearDupHit(doc_id: Long, earlier_id: Long, est_jaccard: Double)

  /** Streaming NEAR-dup detection (A23) — the streaming twin of the batch
    * minhash/LSH pipeline (Dedup.d2), for the "drop near-dups as the
    * corpus arrives" ingestion shape a training-data pipeline needs:
    *
    *   docs stream → relational shingle+minhash (the SAME codegen
    *   pipeline batch d2 uses, via [[graft.operators.Dedup.minhashBanded]])
    *   → explode to one row per LSH band key → `flatMapGroupsWithState`
    *   keyed BY BAND KEY, whose state is the band's previously-seen
    *   (doc_id, signature) members → each arriving doc is compared to its
    *   band's members by SIGNATURE AGREEMENT (matching minhash components
    *   / k estimates Jaccard, the standard estimator) and emits a hit per
    *   earlier near-duplicate.
    *
    * Scale/state design: state is partitioned by band key (the same key
    * the batch join shuffles on). `maxPerBand` FIFO-bounds each band's
    * member list; the NUMBER of live band groups is only bounded when a
    * `ProcessingTimeTimeout` is passed (dead bands then evict after
    * `stateTtl`) — with the NoTimeout default (right for drain-style
    * tests, whose processAllAvailable never quiesces under a
    * processing-time timeout), total state grows with the distinct band
    * count, so PRODUCTION ingestion must pass the timeout. Candidate
    * work per doc is |band members| per its 16 bands, never a corpus
    * scan. A pair colliding in several bands is emitted once per
    * colliding band — dedupe downstream per micro-batch if exact-once
    * pair emission matters (the batch twin dedups the same way).
    */
  /** Convenience wiring: a (doc_id, text) stream through the row-local
    * minhash/banding twin ([[graft.operators.Dedup.minhashBandedLocal]] —
    * bit-compatible with the batch pipeline) into [[streamingNearDup]].
    */
  def nearDupStream(docs: Dataset[(Long, String)],
      minEstJaccard: Double = 0.8,
      maxPerBand: Int = 64,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      stateTtl: String = "1 hour"): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    val banded = docs.flatMap { case (id, text) =>
      graft.operators.Dedup.minhashBandedLocal(id, text)
        .map { case (k, i, s) => BandedDoc(k, i, s) }
    }
    streamingNearDup(banded, minEstJaccard, maxPerBand, timeout, stateTtl)
  }

  /** Exact-verify second stage for streaming near-dup (A25) — candidates
    * from the signature-estimate stage ([[nearDupStream]], run at a
    * LOWERED estimate gate so no true pair is lost to estimator noise)
    * are verified by EXACT Jaccard before anything is dropped, the same
    * two-phase shape as the batch d2 pipeline:
    *
    *   candidate hits (slim id pairs — no payload ever rides the band
    *   shuffle) → stream-static equi-join against the staged per-doc
    *   sorted shingle-set artifact ([[graft.operators.Dedup.shingleSets]],
    *   persisted, re-read per micro-batch) on EACH side of the pair →
    *   codegen merge-walk intersection → exact Jaccard ≥ `minJaccard`.
    *
    * Staleness contract: a pair is verifiable only when BOTH docs are in
    * the staged artifact — a doc racing ahead of the artifact refresh is
    * silently unverifiable (inner join), so production refreshes the
    * artifact per ingestion window and replays the gap. A pair colliding
    * in several bands is verified once per colliding band — dedupe
    * downstream if exact-once emission matters (same contract as A23).
    */
  def nearDupStreamVerified(
      docs: Dataset[(Long, String)],
      corpusGrams: DataFrame,
      minJaccard: Double = 0.8,
      candidateEstGate: Double = 0.5,
      maxPerBand: Int = 64,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      stateTtl: String = "1 hour"): DataFrame = {
    val hits = nearDupStream(docs, candidateEstGate, maxPerBand, timeout, stateTtl)
      .toDF()
    val a = corpusGrams.select(col("doc_id").as("a_id"), col("sg").as("a_sg"))
    val b = corpusGrams.select(col("doc_id").as("b_id"), col("sg").as("b_sg"))
    val inter = graft.functions.SortedIntersectSize(col("a_sg"), col("b_sg")).cast("double")
    hits
      .join(a, col("doc_id") === col("a_id"))
      .join(b, col("earlier_id") === col("b_id"))
      .withColumn("inter", inter)
      .withColumn("jaccard",
        col("inter") / (size(col("a_sg")) + size(col("b_sg")) - col("inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_id"), col("earlier_id"), col("jaccard"))
  }

  final case class ContamFlag(doc_id: Long, n_shared_grams: Long, contaminated: Boolean)

  /** Streaming decontamination (A24) — the streaming twin of batch d8,
    * for the "reject benchmark-leaking docs as they arrive" ingestion
    * shape: the benchmark's distinct gram-hash set (built ONCE by the
    * batch pipeline, [[graft.operators.Dedup.wordGramHashes]] — benchmark
    * suites are MBs, so the set broadcasts) is probed per arriving doc by
    * the bit-compatible row-local gram twin. Stateless — no group state,
    * no watermark, no shuffle: a pure map over the stream, which is why
    * the contaminated flag is exact per doc (same n_shared_grams the
    * batch operator reports) and throughput scales with partitions.
    */
  def decontaminateStream(
      docs: Dataset[(Long, String)],
      benchGrams: Set[Long],
      n: Int = 8): Dataset[ContamFlag] = {
    import docs.sparkSession.implicits._
    // broadcast a sorted primitive array, not the Set: 8 bytes/gram vs
    // ~50 for boxed HashSet nodes, and the per-token probe is an
    // allocation-free binarySearch — this IS the ingestion hot path
    val sorted = benchGrams.toArray
    java.util.Arrays.sort(sorted)
    val bc = docs.sparkSession.sparkContext.broadcast(sorted)
    docs.map { case (id, text) =>
      val shared = graft.operators.Dedup.wordGramHashesLocal(text, n)
        .count(g => java.util.Arrays.binarySearch(bc.value, g) >= 0)
      ContamFlag(id, shared.toLong, shared > 0)
    }
  }

  final case class ContamShare(doc_id: Long, n_grams: Long, n_shared: Long,
      severity: String)

  /** Streaming contamination SHARE (A46) — the streaming twin of batch
    * d23 (`Dedup.contaminationShare`), the graded sibling of A24's
    * binary gate: per arriving doc, total distinct grams, benchmark-
    * shared grams, and the severity class (same integer cross-
    * multiplication cuts), all row-locally against the broadcast sorted
    * benchmark gram array. STATELESS — the A24 pattern: no shuffle, no
    * state, throughput scales with partitions; spec pins streamed
    * (n_grams, n_shared, severity) == batch d23's exactly.
    */
  def contaminationShareStream(
      docs: Dataset[(Long, String)],
      benchGrams: Set[Long],
      n: Int = 8): Dataset[ContamShare] = {
    import docs.sparkSession.implicits._
    val sorted = benchGrams.toArray
    java.util.Arrays.sort(sorted)
    val bc = docs.sparkSession.sparkContext.broadcast(sorted)
    docs.map { case (id, text) =>
      val grams = graft.operators.Dedup.wordGramHashesLocal(text, n)
      val shared = grams.count(g => java.util.Arrays.binarySearch(bc.value, g) >= 0)
      val (ng, ns) = (grams.length.toLong, shared.toLong)
      val severity =
        if (ns == 0L) "clean"
        else if (ns * 20 < ng) "trace"
        else if (ns * 2 < ng) "partial"
        else "saturated"
      ContamShare(id, ng, ns, severity)
    }
  }

  final case class QualityFlag(doc_id: Long, n_tokens: Long, score_sum: Long, keep: Boolean)

  /** Streaming quality-model gate (A30) — the streaming twin of batch
    * t15 (`TextAnalysis.qualityModelScore`), for the "reject low-quality
    * docs as they arrive" ingestion shape: the model is a DENSE
    * per-bucket integer-weight array (dim = length — vocab-bounded, the
    * exported-linear-model artifact), broadcast once; each arriving doc
    * is scored row-locally with the bit-compatible md5 bucket twin
    * ([[graft.functions.HashFunctions.md5Hash56Local]]) and the same
    * integer keep gate. STATELESS — no shuffle, no state store, no
    * watermark (the A24 pattern); spec pins streamed flags == batch
    * t15's exactly. Null-text docs emit nothing, matching the batch
    * explode's drop.
    */
  def qualityGateStream(docs: Dataset[(Long, String)],
      weights: Array[Long]): Dataset[QualityFlag] = {
    import docs.sparkSession.implicits._
    require(weights.nonEmpty, "weights must be a dense per-bucket array")
    val dim = weights.length
    val bc = docs.sparkSession.sparkContext.broadcast(weights)
    docs.flatMap { case (id, text) =>
      if (text == null) None // batch twin: explode over split(null) drops the doc
      else {
        val tk = graft.functions.HashFunctions.tokensLocal(text)
        var sum = 0L
        var i = 0
        while (i < tk.length) {
          val b = java.lang.Math.floorMod(
            graft.functions.HashFunctions.md5Hash56Local(tk(i)), dim.toLong).toInt
          sum += bc.value(b)
          i += 1
        }
        Some(QualityFlag(id, tk.length.toLong, sum, sum >= 0L))
      }
    }
  }

  def streamingNearDup(
      banded: Dataset[BandedDoc],
      minEstJaccard: Double = 0.8,
      maxPerBand: Int = 64,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      stateTtl: String = "1 hour"): Dataset[NearDupHit] = {
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "streamingNearDup supports NoTimeout or ProcessingTimeTimeout (no event-time column)")
    import banded.sparkSession.implicits._
    banded
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[Vector[(Long, Array[Long])], NearDupHit](
        OutputMode.Append(), timeout) {
        (_: Long, docs: Iterator[BandedDoc], state: GroupState[Vector[(Long, Array[Long])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var members = state.getOption.getOrElse(Vector.empty)
            val hits = Vector.newBuilder[NearDupHit]
            docs.toSeq.sortBy(_.doc_id).foreach { d =>
              if (!members.exists(_._1 == d.doc_id)) {
                members.foreach { case (earlierId, earlierSig) =>
                  val k = math.min(earlierSig.length, d.sig.length)
                  var agree = 0; var i = 0
                  while (i < k) { if (earlierSig(i) == d.sig(i)) agree += 1; i += 1 }
                  val est = if (k == 0) 0.0 else agree.toDouble / k
                  if (est >= minEstJaccard) hits += NearDupHit(d.doc_id, earlierId, est)
                }
                members = (members :+ (d.doc_id, d.sig)).takeRight(maxPerBand)
              }
            }
            state.update(members)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration(stateTtl)
            hits.result().iterator
          }
      }
  }

  /** A58: streaming CRAWL-FRONTIER host discovery — the live twin of the
    * p23 link-graph build. Each arriving (url, html) page contributes its
    * absolute outlinks (t35's stateless extract, the A28/A50 attach
    * class) to a running per-host discovered-link count — the signal a
    * crawler's frontier scheduler prioritizes by (more in-links found ⇒
    * fetch that host sooner), continuously maintained in update mode.
    * State is one long per host (host-proportional, ≪ stream volume);
    * the count is slicing-invariant because counting is commutative —
    * the spec pins final streamed counts == one-shot batch counts, and
    * Demo 20 joins this against the published p23 ranks.
    */
  def frontierHostCounts(pages: DataFrame): DataFrame = {
    import graft.operators.{TextAnalysis => T}
    pages
      .select(explode(T.extractLinks(col("html"))).as("link"))
      .select(T.hostOf(T.canonicalizeUrl(col("link"))).as("host"))
      .groupBy(col("host")).agg(count(lit(1)).as("n_links_seen"))
  }

  /** A59: streaming EMBEDDING-DISTRIBUTION monitor — D12's exact Gram
    * statistics maintained live over an arriving embedding stream
    * (update mode, one global GramSumLong aggregate). The running
    * (n, sums, pairs) triple is the sufficient statistic for the
    * stream-so-far covariance, so a consumer can watch for embedding
    * drift (an encoder-version change shifts the covariance long before
    * any downstream metric moves) without ever storing a vector. State
    * is ONE (1 + d + d(d+1)/2)-long buffer — parameter-bounded, the
    * A48 class; integer sums are order-free, so the streamed statistics
    * are BIT-EQUAL to the batch pass under any slicing (spec-pinned).
    */
  def embeddingGramStream(vecs: DataFrame, scaleBits: Int = 10): DataFrame =
    graft.operators.Similarity.gramSums(vecs, scaleBits)
}

/** A31's per-customer state: the OPEN SCD2 span only. TOP-LEVEL and
  * non-private by necessity, not style: Spark's encoder generates Java
  * (Janino) that constructs and reads this class by name, and a private
  * object-nested case class made every state read/write fall back to the
  * interpreted projection path ("Expr codegen error ... candidates:
  * public long EventsPipeline$ScdState.version()" in the round-5 suite
  * log) — tests passed, but a 100 TB/day CDC stream would pay the
  * interpreter on every state touch. EventsPipelineSpec asserts the
  * fallback warning is gone.
  */
final case class ScdState(version: Long, priority: String,
    fromDay: Int, nOrders: Long, seq: Long)

/** A42's per-key state: the latest CDC op (the q49 max_by,
  * incrementalized) plus the emission counter. TOP-LEVEL for the same
  * encoder-codegen reason as [[ScdState]].
  */
final case class CdcMatState(seq: Long, op: String, custkey: Long,
    status: String, price: Double, emitSeq: Long)
