package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming analytics layer — the dashboard queries (SURVEY.md §2.5) as
 * incremental streaming aggregations instead of the reference's
 * rescan-everything-every-10 s pandas model (`dashbord/dashbord.py:94-105`),
 * plus the stateful operators the north star adds.
 *
 * State posture at scale: every aggregation here is keyed (window ×
 * event_type, or user), so state partitions across executors; watermarks
 * bound state size; nothing collects to the driver.
 */
object StreamingAnalytics {

  /** Tumbling-window count per event type with watermark-bounded state —
   * the streaming form of A2 (gender/type distribution). Append mode. */
  def windowedTypeCounts(
      events: DataFrame,
      tsCol: String,
      watermark: String = "10 minutes",
      window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))

  /** Streaming form of the dashboard's marquee A3 query — running top-k
   * registered email domains — incremental instead of the reference's
   * rescan-everything pandas loop. The keyed count is the streaming state:
   * one counter per domain, partitioned across executors, updated with
   * map-side partials each micro-batch. The top-k sort+limit runs in
   * COMPLETE output mode over that aggregate relation — whose cardinality
   * is the number of distinct registered domains, small by construction —
   * never over the stream itself. Works identically on a batch DataFrame
   * (same plan, no streaming nodes), which is what the equivalence test
   * pins. */
  def topKDomains(profiles: DataFrame, k: Int = 5): DataFrame =
    profiles
      .select(graft.ops.Transforms.emailDomain(col("email")).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("domain"))
      .limit(k)

  /** Streaming dedup on a key within a watermark horizon — the streaming
   * form of exact dedup (bounded state, unlike a global dropDuplicates). */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      keys: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream inner join: action events enriched with the
   * user's profile-change events from the preceding `joinWindow`.
   *
   * Both sides are watermarked AND the join carries an event-time range
   * predicate — the two conditions that let Spark bound buffered state on
   * both sides and emit/evict deterministically. A stream-stream join
   * without the range predicate buffers one side forever; this is the
   * canonical bounded-state enrichment shape. */
  def enrichWithProfiles(
      actions: DataFrame,   // user_id, ts (timestamp), event_type
      profiles: DataFrame,  // user_id, p_ts (timestamp), tier
      watermark: String = "10 minutes",
      joinWindow: String = "1 hour"): DataFrame = {
    val a = actions.withWatermark("ts", watermark)
    val p = profiles.withWatermark("p_ts", watermark)
    a.join(p,
      a("user_id") === p("user_id") &&
        p("p_ts") <= a("ts") &&
        p("p_ts") >= a("ts") - expr(s"INTERVAL '$joinWindow'"))
      .select(a("user_id"), a("ts"), a("event_type"), p("p_ts"), p("tier"))
  }

  final case class ActionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class ProfileEvent(user_id: Long, p_ts: Timestamp, tier: String)

  // ---- custom state: session tracking via flatMapGroupsWithState ----

  final case class SessionEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Emits one row per CLOSED session (gap > timeout) — arbitrary stateful
   * logic the SQL surface can't express incrementally. Batch equivalent:
   * the s1_sessionize inventory query (lag + flag-sum).
   *
   * `flushAfterMillis` (None = never, preserving the original
   * append-only contract): when set, a PROCESSING-time timeout fires
   * for any user quiet that long, closing and emitting their open
   * session — without it a quiescent user's LAST session sits in state
   * forever and never reaches the sink (the batch operator emits it;
   * the stream would not). Processing time, not event time, because
   * the quiet user by definition sends no more events to advance a
   * watermark. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMillis: Long,
      flushAfterMillis: Option[Long] = None)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    val timeoutConf =
      if (flushAfterMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // quiet period elapsed with zero new events: the open
            // session is closed by definition of the gap rule.
            val s = state.get
            state.remove()
            Iterator.single(
              SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMillis =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              flushAfterMillis.foreach(ms => state.setTimeoutDuration(ms))
            }
            closed.reverseIterator
          }
      }
  }

  final case class TurnEvent(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String, props: String)
  final case class TranscriptOut(user_id: Long, n_turns: Long,
      ts_start: Timestamp, ts_end: Timestamp, text: String)

  /** Streaming [[graft.ext.TextAnalysis.conversationAssembly]]: sessions
   * accumulate their ordered turns in per-user state and EMIT the full
   * serialized transcript the moment a `gapMillis` quiet period closes
   * them — the chat/SFT prep step as an append-mode stream, so closed
   * conversations flow into the curation pipeline while open ones keep
   * accumulating. Same turn format (`type:props`, newline-joined) and
   * the same (ts, event_id) order as the batch operator, so under
   * monotone per-user ingest a closed session's transcript is
   * IDENTICAL to the batch row (spec-proven). State per user is one
   * open session's turns — gap-bounded, never the history.
   *
   * `flushAfterMillis` (None = never): when set, a processing-time
   * timeout closes and emits the open session of any user quiet that
   * long — mirroring the batch operator's completeness, which emits
   * every session including each user's last. Without it a quiescent
   * user's final transcript is held in state forever (the same trade
   * [[sessionize]] documents; processing time because the quiet user
   * sends nothing to advance a watermark). */
  def conversationTranscripts(events: Dataset[TurnEvent],
      gapMillis: Long,
      flushAfterMillis: Option[Long] = None)(implicit spark: SparkSession)
      : Dataset[TranscriptOut] = {
    import spark.implicits._
    val timeoutConf =
      if (flushAfterMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[(Long, Long, String)], TranscriptOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[TurnEvent],
            state: GroupState[Seq[(Long, Long, String)]]) =>
          def emit(s: Seq[(Long, Long, String)]): TranscriptOut =
            TranscriptOut(user, s.size.toLong,
              new Timestamp(s.head._1), new Timestamp(s.last._1),
              s.map(_._3).mkString("\n"))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            // MERGE-then-resegment, never append: a batch boundary can
            // split a (ts, event_id) tie (batch 1 delivers id 5 at T,
            // batch 2 delivers id 3 at the same T — still monotone
            // ingest), and only re-sorting the open session's turns with
            // the batch reproduces the batch operator's global order. The
            // sort is over ONE open session + one batch — gap-bounded.
            val batchTurns = rows.map(e => (e.ts.getTime, e.event_id,
              s"${e.event_type}:${Option(e.props).getOrElse("")}")).toSeq
            val all = (state.getOption.getOrElse(Seq.empty) ++ batchTurns)
              .sortBy(t => (t._1, t._2))
            var closed = List.empty[TranscriptOut]
            var cur = Seq.empty[(Long, Long, String)]
            all.foreach { t =>
              if (cur.nonEmpty && t._1 - cur.last._1 > gapMillis) {
                closed ::= emit(cur)
                cur = Seq(t)
              } else cur = cur :+ t
            }
            if (cur.nonEmpty) {
              state.update(cur)
              flushAfterMillis.foreach(ms => state.setTimeoutDuration(ms))
            }
            closed.reverseIterator
          }
      }
  }

  // ---- custom state v2: transformWithState (the arbitrary-state API that
  // replaces flatMapGroupsWithState — typed per-key state handles, TTL,
  // timers; requires the RocksDB state store provider) ----

  final case class StatEvent(user_id: Long, value: Double)
  final case class RunningStat(n: Long, total: Double)
  final case class RunningStatOut(user_id: Long, n_events: Long,
      total_value: Double)

  /** Per-user running (count, sum) via a typed `ValueState` — the minimal
   * TWS processor: O(1) state per key, partitioned across executors, one
   * upsert row per key per micro-batch (update mode). The same shape
   * extends to TTL'd state (`TTLConfig(duration)`) and event-time timers
   * without changing the state layout. */
  class RunningStatsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, StatEvent, RunningStatOut] {
    @transient private var stat:
      org.apache.spark.sql.streaming.ValueState[RunningStat] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      stat = getHandle.getValueState[RunningStat]("stat",
        org.apache.spark.sql.Encoders.product[RunningStat],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[StatEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[RunningStatOut] = {
      var s = if (stat.exists()) stat.get() else RunningStat(0L, 0.0)
      rows.foreach(r => s = RunningStat(s.n + 1, s.total + r.value))
      stat.update(s)
      Iterator.single(RunningStatOut(key, s.n, s.total))
    }
  }

  /** Streaming per-user running stats through `transformWithState`. The
   * session must run the RocksDB state store provider (TWS requirement):
   * `spark.sql.streaming.stateStore.providerClass =
   *  ...state.RocksDBStateStoreProvider`. */
  def runningUserStats(events: Dataset[StatEvent])(
      implicit spark: SparkSession): Dataset[RunningStatOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class TypedEvent(user_id: Long, event_type: String)
  final case class TypeCount(user_id: Long, event_type: String, n: Long)

  /** Per-key categorical histogram on TWS `MapState` — the state primitive
   * the running-stats (`ValueState`) and timer (`ValueState` + timers)
   * processors don't cover: one map entry per (key, category) updated in
   * place, upserts emitted only for the categories the batch touched (not
   * the whole histogram — output stays proportional to the delta). */
  class TypeHistogramProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TypedEvent, TypeCount] {
    @transient private var hist:
      org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      hist = getHandle.getMapState[String, Long]("hist",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[TypeCount] = {
      val touched = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      rows.foreach { e =>
        val cur = touched.getOrElse(e.event_type,
          if (hist.containsKey(e.event_type)) hist.getValue(e.event_type)
          else 0L)
        touched(e.event_type) = cur + 1
      }
      touched.foreach { case (t, n) => hist.updateValue(t, n) }
      touched.iterator.map { case (t, n) => TypeCount(key, t, n) }
    }
  }

  /** Streaming per-user event-type histogram through `transformWithState`
   * MapState (RocksDB provider required). Update mode: one upsert per
   * touched (user, type) per micro-batch. */
  def typeHistogram(events: Dataset[TypedEvent])(
      implicit spark: SparkSession): Dataset[TypeCount] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeHistogramProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  final case class SeriesPoint(key: String, ord: Long, x: Double)
  final case class EwmaPoint(key: String, ord: Long, x: Double,
      ewma: Double, is_spike: Boolean)
  final case class EwmaState(lags: Seq[Double], n_seen: Long)

  /** Streaming EWMA spike detection on TWS `ValueState` — the incremental
   * form of [[graft.ext.TimeSeries.ewmaAnomaly]]: per key, the state is
   * the trailing ≤ `lookback` values (most recent first) plus the seen
   * count; each arriving point folds the SAME dyadic weights
   * (Σ lag_i·2^−i, α = ½) the batch operator evaluates, so under the
   * monotone-ingest contract (batches arrive in non-decreasing `ord`; the
   * processor sorts within a batch) the streamed output is
   * BIT-IDENTICAL to the batch pass over the accumulated series — every
   * term is an exact dyadic double, pinned in `StreamingSpec`. State is
   * O(lookback) doubles per key; output appends one row per point. */
  class EwmaSpikeProcessor(lookback: Int, spikeFactor: Double,
      minBase: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, SeriesPoint, EwmaPoint] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[EwmaState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[EwmaState]("ewma",
        org.apache.spark.sql.Encoders.product[EwmaState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[SeriesPoint],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[EwmaPoint] = {
      var s = if (st.exists()) st.get() else EwmaState(Seq.empty, 0L)
      val out = scala.collection.mutable.ArrayBuffer.empty[EwmaPoint]
      rows.toSeq.sortBy(_.ord).foreach { r =>
        // identical association to the batch lag chain: term i=1..lookback
        // summed left to right (all dyadic-exact, so this is belt and
        // braces, not a numerical necessity)
        var ep = 0.0
        var i = 0
        while (i < math.min(s.lags.length, lookback)) {
          ep += s.lags(i) * math.pow(0.5, i + 1)
          i += 1
        }
        val ew = r.x * 0.5 + ep * 0.5
        val spike = s.n_seen >= lookback &&
          r.x > spikeFactor * ep + minBase
        out += EwmaPoint(key, r.ord, r.x, ew, spike)
        s = EwmaState((r.x +: s.lags).take(lookback), s.n_seen + 1)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Streaming EWMA spike flags through `transformWithState` (RocksDB
   * provider required). Append mode: one row per arriving point. */
  def ewmaSpikes(points: Dataset[SeriesPoint], lookback: Int = 12,
      spikeFactor: Double = 2.0, minBase: Double = 5.0)(
      implicit spark: SparkSession): Dataset[EwmaPoint] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(
        new EwmaSpikeProcessor(lookback, spikeFactor, minBase),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class CountPoint(key: String, ord: Long, x: Long)
  final case class CusumPoint(key: String, ord: Long, x: Long,
      s_stat: Long, is_alarm: Boolean)
  final case class CusumState(c: Long, c_min: Long, seen: Boolean)

  /** Streaming one-sided CUSUM on TWS `ValueState` — the incremental form
   * of [[graft.ext.TimeSeries.cusum]]: the batch operator's prefix-sum
   * identity S_n = C_n − min(0, min_{t≤n} C_t) needs exactly TWO longs
   * of state per key (the running prefix C and its running minimum), so
   * the drift detector streams with O(1) state where the windowed batch
   * form sorts — same integers, and under the monotone-ingest contract
   * (batches arrive in non-decreasing `ord`; the processor sorts within
   * a batch) the streamed rows are BIT-IDENTICAL to the batch pass over
   * the accumulated series, pinned in `StreamingSpec`. */
  class CusumProcessor(target: Long, slack: Long, threshold: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, CountPoint, CusumPoint] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[CusumState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[CusumState]("cusum",
        org.apache.spark.sql.Encoders.product[CusumState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CountPoint],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CusumPoint] = {
      var s = if (st.exists()) st.get() else CusumState(0L, 0L, false)
      val out = scala.collection.mutable.ArrayBuffer.empty[CusumPoint]
      rows.toSeq.sortBy(_.ord).foreach { r =>
        val c = s.c + (r.x - target - slack)
        val cMin = if (s.seen) math.min(s.c_min, c) else c
        val sStat = c - math.min(0L, cMin)
        out += CusumPoint(key, r.ord, r.x, sStat, sStat > threshold)
        s = CusumState(c, cMin, seen = true)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Streaming CUSUM alarms through `transformWithState` (RocksDB
   * provider required). Append mode: one row per arriving point. */
  def cusumAlarms(points: Dataset[CountPoint], target: Long, slack: Long,
      threshold: Long)(implicit spark: SparkSession): Dataset[CusumPoint] = {
    import spark.implicits._
    points
      .groupByKey(_.key)
      .transformWithState(new CusumProcessor(target, slack, threshold),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class DayActive(user_id: Long, day: Long)
  final case class GrowthEvent(user_id: Long, day: Long, flow: String)
  final case class GrowthState(last: Long, seen: Boolean)

  /** Streaming growth accounting on TWS `ValueState` — the incremental
   * twin of [[graft.ext.Attribution.growthAccounting]]: per user, TWO
   * fields of state (last active day + seen flag) emit the new /
   * retained / resurrected flow on each fresh active day, and the
   * CHURNED flow for day `last+1` the moment a gap becomes observable
   * (the user reappears past it). Under the monotone-ingest contract
   * (per-user days arrive non-decreasing across batches; the processor
   * sorts and dedups within a batch) the emitted flows are EXACTLY the
   * batch operator's rows MINUS each user's trailing churn — the one
   * flow that needs tomorrow's absence, which a stream cannot observe
   * until the horizon passes (same honest boundary as the session
   * flush; pinned in StreamingSpec). */
  class GrowthProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, DayActive, GrowthEvent] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[GrowthState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[GrowthState]("growth",
        org.apache.spark.sql.Encoders.product[GrowthState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[DayActive],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[GrowthEvent] = {
      var s = if (st.exists()) st.get() else GrowthState(0L, false)
      val out = scala.collection.mutable.ArrayBuffer.empty[GrowthEvent]
      rows.map(_.day).toSeq.distinct.sorted.foreach { d =>
        if (!s.seen) out += GrowthEvent(key, d, "new")
        else if (d == s.last) ()          // repeat activity, no flow
        else if (d == s.last + 1) out += GrowthEvent(key, d, "retained")
        else if (d > s.last + 1) {
          out += GrowthEvent(key, s.last + 1, "churned")
          out += GrowthEvent(key, d, "resurrected")
        }
        if (!s.seen || d > s.last) s = GrowthState(d, seen = true)
      }
      st.update(s)
      out.iterator
    }
  }

  /** Streaming growth flows through `transformWithState` (RocksDB
   * provider required). Append mode: one row per observable flow. */
  def growthFlows(days: Dataset[DayActive])(
      implicit spark: SparkSession): Dataset[GrowthEvent] = {
    import spark.implicits._
    days
      .groupByKey(_.user_id)
      .transformWithState(new GrowthProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class FunnelHit(user_id: Long, t_first: Timestamp,
      t_last: Timestamp, n_steps: Int)

  /** Streaming ordered-step funnel on TWS `ListState` — the third state
   * primitive (next to the ValueState stats and MapState histogram), doing
   * CEP-lite sequence detection: the list holds the event-time of each
   * funnel stage reached so far (strictly increasing times, stages in
   * `steps` order); when the final stage lands, ONE FunnelHit emits and
   * the key resets. The incremental counterpart of the batch s2_funnel
   * query. State is O(|steps|) per key — appended stage timestamps, never
   * raw events. */
  class FunnelProcessor(steps: Seq[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, FunnelEvent, FunnelHit] {
    require(steps.nonEmpty, "need at least one funnel step")
    @transient private var reached:
      org.apache.spark.sql.streaming.ListState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      reached = getHandle.getListState[Long]("reached",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[FunnelHit] = {
      var times = reached.get().toArray.toVector
      var hits = List.empty[FunnelHit]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val stage = times.length
        if (stage < steps.length && e.event_type == steps(stage) &&
            (times.isEmpty || e.ts.getTime > times.last)) {
          times :+= e.ts.getTime
          if (times.length == steps.length) {
            hits ::= FunnelHit(key, new Timestamp(times.head),
              new Timestamp(times.last), steps.length)
            times = Vector.empty
          }
        }
      }
      reached.clear()
      if (times.nonEmpty) reached.appendList(times.toArray)
      hits.reverseIterator
    }
  }

  /** Streaming funnel detection through `transformWithState` ListState
   * (RocksDB provider required); append mode, one row per completed
   * funnel. */
  def streamingFunnel(events: Dataset[FunnelEvent], steps: Seq[String])(
      implicit spark: SparkSession): Dataset[FunnelHit] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps),
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  final case class TimedEvent(user_id: Long, ts: Timestamp)
  final case class IdleSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Idle-session closer on EVENT-TIME TIMERS — the TWS capability
   * flatMapGroupsWithState lacks cleanly: instead of emitting on the next
   * inbound event for the key, the session closes when the WATERMARK
   * passes `last + gap`, so an abandoned key still emits. One timer per
   * key (re-armed on every event: delete + register), state cleared on
   * expiry — state size is O(open sessions), bounded by the watermark. */
  class IdleSessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TimedEvent, ClosedSession] {
    @transient private var sess:
      org.apache.spark.sql.streaming.ValueState[IdleSession] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      sess = getHandle.getValueState[IdleSession]("sess",
        org.apache.spark.sql.Encoders.product[IdleSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TimedEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[ClosedSession] = {
      // Same gap semantics as the fMGWS sessionize and s1/s4: the open
      // state session plus this batch's events fold — sorted by start —
      // into gap-merged intervals, the standard interval-merge. This
      // handles every arrival order uniformly: late events within gap of
      // EACH OTHER sessionize together (a per-event case analysis closed
      // them as singletons — round-4 review), a late event within gap of
      // the open session widens its start, and an intra-batch gap SPLITS.
      // Every merged session except the latest closes immediately (only
      // events later than anything seen can still extend it, and the next
      // session's start bounds the earlier ones); the latest stays open
      // and waits on the timer.
      //
      // EARLY-CLOSE APPROXIMATION (documented contract, round-4 advice): a
      // pre-watermark late event whose timestamp falls in the gap BETWEEN
      // two already-merged sessions — within gapMs of one that just closed
      // — arrives in a later batch, finds the closed session gone from
      // state, and emits separately, where a batch run over the same
      // events would have bridged them into one session. The alternative
      // (hold every session whose last+gap is above the watermark, close
      // only on timer expiry) trades that for O(open-sessions) state per
      // key and emission delayed by the full watermark lag even for
      // sessions no on-time event can ever reopen. This operator
      // deliberately keeps the O(1)-state prompt-emission side of that
      // trade; exact late-merge semantics at batch parity are available
      // from the batch sessionize (s1/s4) over the landed events.
      val seeds = (
        (if (sess.exists()) List(sess.get()) else Nil) ++
          rows.map(e => IdleSession(e.ts.getTime, e.ts.getTime, 1))
        ).sortBy(s => (s.start, s.last))
      val merged = seeds.foldLeft(List.empty[IdleSession]) {
        case (h :: t, s) if s.start - h.last <= gapMs =>
          IdleSession(math.min(h.start, s.start),
            math.max(h.last, s.last), h.n + s.n) :: t
        case (acc, s) => s :: acc
      }.reverse
      val closed = merged.dropRight(1).map(s =>
        ClosedSession(key, new Timestamp(s.start), new Timestamp(s.last), s.n))
      val cur = merged.lastOption
      cur.foreach(sess.update)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      cur.foreach(s => getHandle.registerTimer(s.last + gapMs))
      closed.iterator
    }

    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[ClosedSession] = {
      val out =
        if (!sess.exists()) Iterator.empty
        else {
          val s = sess.get()
          Iterator.single(ClosedSession(key,
            new Timestamp(s.start), new Timestamp(s.last), s.n))
        }
      sess.clear()
      out
    }
  }

  /** Event-time-timer sessionization through `transformWithState`.
   * `events` must carry a watermark on `ts` (timers fire against it);
   * requires the RocksDB state store provider. */
  def idleSessions(events: Dataset[TimedEvent], gapMs: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new IdleSessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  final case class TransEvent(user_id: Long, tsu: Long, event_id: Long,
      event_type: String)
  final case class Transition(user_id: Long, e_from: String,
      e_to: String)

  /** Per-user consecutive-event transition pairs as a STREAM — the
   * incremental front half of the s7 Markov model: ONE string of state
   * per user (the last event type under the (tsu, event_id) total
   * order), each arrival emitting its (prev → cur) pair; a downstream
   * streaming agg over (e_from, e_to) maintains the transition counts
   * whose state is |types|²-bounded, so the whole Markov model streams
   * with O(users + types²) state. Under per-user monotone ingest the
   * emitted pair MULTISET equals the batch lead() pairs exactly
   * (spec-pinned); rows inside a micro-batch sort by the same total
   * order, so boundary placement cannot reorder a user's chain. */
  class TransitionProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TransEvent, Transition] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[String] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      last = getHandle.getValueState[String]("last",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TransEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[Transition] = {
      var prev = if (last.exists()) Option(last.get()) else None
      val out = scala.collection.mutable.ListBuffer.empty[Transition]
      rows.toSeq.sortBy(e => (e.tsu, e.event_id)).foreach { e =>
        prev.foreach(p => out += Transition(key, p, e.event_type))
        prev = Some(e.event_type)
      }
      prev.foreach(last.update)
      out.iterator
    }
  }

  /** Streaming Markov transition pairs through `transformWithState`
   * (RocksDB provider required); append mode, one row per consecutive
   * pair. */
  def markovTransitions(events: Dataset[TransEvent])(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class CohortHit(user_id: Long, cohort_day: Long,
      age_days: Long)
  final case class CohortState(cohort: Long, last: Long)

  /** Streaming cohort-retention hits — the incremental twin of
   * [[graft.ext.Attribution.cohortRetention]]: TWO longs of state per
   * user (first-ever active day = the cohort, last emitted day for
   * day-grain dedup); each FRESH active day emits one (cohort, age)
   * hit. Unlike growth accounting there is NO churn lookahead — the
   * retention triangle is append-only — so under per-user monotone
   * ingest the emitted hit multiset equals the batch operator's
   * (user, cohort, age) activity EXACTLY, and a downstream keyed agg
   * maintains the full triangle (n_active per (cohort, age); n_cohort
   * = the age-0 cell) with O(cohorts·ages) state. Pinned against the
   * batch operator in StreamingSpec. */
  class CohortProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, DayActive, CohortHit] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[CohortState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[CohortState]("cohort",
        org.apache.spark.sql.Encoders.product[CohortState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[DayActive],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CohortHit] = {
      var s = if (st.exists()) Option(st.get()) else None
      val out = scala.collection.mutable.ListBuffer.empty[CohortHit]
      rows.map(_.day).toSeq.distinct.sorted.foreach { d =>
        s match {
          case None =>
            out += CohortHit(key, d, 0L)
            s = Some(CohortState(d, d))
          case Some(cs) if d > cs.last =>
            out += CohortHit(key, cs.cohort, d - cs.cohort)
            s = Some(cs.copy(last = d))
          case _ => () // repeat day: no new cell activity
        }
      }
      s.foreach(st.update)
      out.iterator
    }
  }

  /** Streaming cohort hits through `transformWithState` (RocksDB
   * provider required); append mode, one row per fresh (user, day). */
  def cohortHits(days: Dataset[DayActive])(
      implicit spark: SparkSession): Dataset[CohortHit] = {
    import spark.implicits._
    days
      .groupByKey(_.user_id)
      .transformWithState(new CohortProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class AttrEvent(user_id: Long, tsu: Long, event_id: Long,
      event_type: String, value: Double)
  final case class AttributedConversion(user_id: Long, tsu: Long,
      event_id: Long, channel: String, value_micro: Long)
  final case class LastTouchState(lt_type: String, lt_tsu: Long)

  /** Streaming last-touch attribution — the incremental twin of
   * [[graft.ext.Attribution.lastTouch]] (r9 verdict #5): the reference
   * dashboard's "where did users come from" question
   * (`dashbord/dashbord.py:115-119`) upgraded to conversions, streamed.
   * ONE (type, tsu) pair of state per user: each arriving touch
   * (view/click) overwrites it; each arriving purchase emits its
   * attributed channel — the most recent touch within `lookbackUs`, or
   * `"(none)"` — with the purchase value micro-quantized exactly as the
   * batch operator does. Under per-user monotone ingest (batches arrive
   * in non-decreasing (tsu, event_id); the processor sorts within a
   * batch by the same total order) the emitted per-purchase rows are
   * BIT-IDENTICAL to the batch operator's pre-aggregation relation, so
   * a downstream streaming agg over channel maintains exactly the batch
   * (channel, n_conversions, attributed_micro) readout with
   * O(users + channels) state — pinned the CUSUM way in StreamingSpec. */
  class LastTouchProcessor(lookbackUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AttrEvent, AttributedConversion] {
    require(lookbackUs >= 1, s"lookbackUs must be >= 1, got $lookbackUs")
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[LastTouchState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[LastTouchState]("lastTouch",
        org.apache.spark.sql.Encoders.product[LastTouchState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AttributedConversion] = {
      var s = if (st.exists()) Option(st.get()) else None
      val out =
        scala.collection.mutable.ListBuffer.empty[AttributedConversion]
      rows.toSeq.sortBy(e => (e.tsu, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" | "click" =>
            s = Some(LastTouchState(e.event_type, e.tsu))
          case "purchase" =>
            val channel = s match {
              case Some(t) if t.lt_tsu >= e.tsu - lookbackUs => t.lt_type
              case _ => "(none)"
            }
            // the batch operator's exact micro quantization:
            // floor(v·1e6 + 0.5)
            out += AttributedConversion(key, e.tsu, e.event_id, channel,
              math.floor(e.value * 1e6 + 0.5).toLong)
          case _ => () // non-touch, non-purchase events carry no flow
        }
      }
      s.foreach(st.update)
      out.iterator
    }
  }

  /** Streaming last-touch attributed conversions through
   * `transformWithState` (RocksDB provider required); append mode, one
   * row per purchase. */
  def lastTouchConversions(events: Dataset[AttrEvent], lookbackUs: Long)(
      implicit spark: SparkSession): Dataset[AttributedConversion] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new LastTouchProcessor(lookbackUs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class WFLevel(user_id: Long, best_level: Int)
  final case class WFState(best: Int, pvMax: Long, pvPrev: Long,
      pairViews: Seq[Long], pairClicks: Seq[Long])

  /** Streaming WINDOWED strict-order funnel — the incremental twin of
   * [[graft.ext.Attribution.windowFunnel]] (r10 verdict #7: s2's
   * unbounded funnel had a streaming twin, s8's window-of-first-step
   * rule did not): per user, the deepest view → click → purchase chain
   * where each step is STRICTLY after the previous and the whole chain
   * fits inside `windowUs` of its own first step, every view a
   * candidate start.
   *
   * State is NOT the event history — it is the dominance-pruned
   * candidate frontier, per user:
   *
   *  - `pvMax` / `pvPrev`: at most TWO views awaiting their first
   *    click. Under monotone ingest a future click lands at
   *    tsu ≥ pvMax, so only two cases exist — tsu > pvMax (where pvMax
   *    dominates every older pending view: same assigned click,
   *    strictly later deadline) and tsu == pvMax (where the strictness
   *    rule disqualifies pvMax and the dominant eligible view is the
   *    newest STRICTLY older one, pvPrev). Every other pending view is
   *    provably dominated and drops at arrival.
   *  - `pairViews/pairClicks`: per distinct first-click, the dominant
   *    (view, click) chain still awaiting its purchase. Earlier pairs
   *    have earlier clicks (looser purchase-after-click bound) but
   *    earlier deadlines — neither dominates, so all live pairs are
   *    kept, PRUNED the moment event time passes `view + windowUs`
   *    (their chains can no longer complete). State is therefore
   *    bounded by the user's distinct click times inside one active
   *    window, never the history.
   *
   * A user at best_level 3 is terminal (3 is the max) — state freezes.
   * Emits (user_id, best_level) whenever the level INCREASES; a
   * downstream max-agg (or last-emit) maintains exactly the batch
   * `(user_id, best_level)` relation under per-user monotone ingest —
   * pinned against the batch operator in StreamingSpec, tie cases
   * included. */
  class WindowFunnelProcessor(windowUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AttrEvent, WFLevel] {
    require(windowUs >= 1, s"windowUs must be >= 1, got $windowUs")
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[WFState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[WFState]("windowFunnel",
        org.apache.spark.sql.Encoders.product[WFState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[WFLevel] = {
      var s = if (st.exists()) st.get()
        else WFState(0, -1L, -1L, Nil, Nil)
      var best = s.best
      var pvMax = s.pvMax
      var pvPrev = s.pvPrev
      var pairs = s.pairViews.zip(s.pairClicks).toList
      val out = scala.collection.mutable.ListBuffer.empty[WFLevel]
      rows.toSeq.sortBy(e => (e.tsu, e.event_id)).foreach { e =>
        val before = best
        if (best < 3) e.event_type match {
          case "view" =>
            if (best < 1) best = 1
            if (pvMax < 0L) pvMax = e.tsu
            else if (e.tsu > pvMax) { pvPrev = pvMax; pvMax = e.tsu }
          // a same-tsu duplicate view changes nothing
          case "click" =>
            val tc = e.tsu
            pairs = pairs.filter { case (v, _) => v + windowUs >= tc }
            if (pvMax >= 0L) {
              if (tc > pvMax) {
                // pvMax dominates every pending view for this and all
                // future clicks; assigned (in window) or dead (out)
                if (tc <= pvMax + windowUs) {
                  if (best < 2) best = 2
                  pairs ::= (pvMax, tc)
                }
                pvMax = -1L; pvPrev = -1L
              } else {
                // tc == pvMax: strictness disqualifies pvMax (it stays
                // pending for a later click); the dominant eligible
                // view is pvPrev
                if (pvPrev >= 0L && tc <= pvPrev + windowUs) {
                  if (best < 2) best = 2
                  pairs ::= (pvPrev, tc)
                }
                pvPrev = -1L
              }
            }
          case "purchase" =>
            val tp = e.tsu
            pairs = pairs.filter { case (v, _) => v + windowUs >= tp }
            if (pairs.exists { case (_, c) => tp > c }) best = 3
          case _ => () // other event types carry no funnel step
        }
        if (best > before) out += WFLevel(key, best)
      }
      st.update(
        if (best >= 3) WFState(3, -1L, -1L, Nil, Nil)
        else WFState(best, pvMax, pvPrev, pairs.map(_._1),
          pairs.map(_._2)))
      out.iterator
    }
  }

  /** Streaming windowed funnel through `transformWithState` (RocksDB
   * provider required); append mode, one row per per-user level
   * increase — max per user is the batch `windowFunnel` readout. */
  def windowFunnelLevels(events: Dataset[AttrEvent], windowUs: Long)(
      implicit spark: SparkSession): Dataset[WFLevel] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new WindowFunnelProcessor(windowUs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  final case class FunnelStageDelta(user_id: Long, stage: String,
      delta_s: Long)
  final case class FSLState(tView: Long, tClick: Long, tPurchase: Long)

  /** Streaming funnel-stage LATENCIES — the incremental twin of
   * [[graft.ext.Attribution.funnelStageDeltas]] (r11 verdict #4: s2 and
   * s8 both stream; s13's per-step time-to-convert was the funnel
   * family's last batch-only member). Per user the s2 unbounded-chain
   * rule fixes each step FOREVER once seen under monotone ingest —
   * `t_view` is the first view (no later event can precede it),
   * `t_click` the first click strictly after `t_view`, `t_purchase` the
   * first purchase strictly after `t_click` — so each completed step
   * emits its whole-second latency exactly once, FINAL at emission (no
   * retraction, no window). State is three longs per user, frozen once
   * the purchase lands; a downstream grouped order-stat over the
   * emitted rows IS the batch s13 readout. Unset steps are
   * Long.MinValue sentinels — NOT -1, because event time is allowed to
   * be negative (epoch-relative micros pre-1970; the seeded random pin
   * caught exactly this). */
  class FunnelLatencyProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, AttrEvent, FunnelStageDelta] {
    @transient private var st:
      org.apache.spark.sql.streaming.ValueState[FSLState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      st = getHandle.getValueState[FSLState]("funnelLatency",
        org.apache.spark.sql.Encoders.product[FSLState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[AttrEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[FunnelStageDelta] = {
      val unset = Long.MinValue
      var s = if (st.exists()) st.get() else FSLState(unset, unset, unset)
      val out = scala.collection.mutable.ListBuffer.empty[FunnelStageDelta]
      rows.toSeq.sortBy(e => (e.tsu, e.event_id)).foreach { e =>
        e.event_type match {
          case "view" =>
            if (s.tView == unset) s = s.copy(tView = e.tsu)
          case "click" =>
            if (s.tView != unset && s.tClick == unset &&
                e.tsu > s.tView) {
              s = s.copy(tClick = e.tsu)
              out += FunnelStageDelta(key, "view->click",
                (e.tsu - s.tView) / 1000000L)
            }
          case "purchase" =>
            if (s.tClick != unset && s.tPurchase == unset &&
                e.tsu > s.tClick) {
              s = s.copy(tPurchase = e.tsu)
              out += FunnelStageDelta(key, "click->purchase",
                (e.tsu - s.tClick) / 1000000L)
            }
          case _ => () // other event types are not funnel steps
        }
      }
      st.update(s)
      out.iterator
    }
  }

  /** Streaming funnel-stage latencies through `transformWithState`
   * (RocksDB provider required); append mode, one FINAL row per
   * completed (user, stage) — the exact row set of the batch
   * `funnelStageDeltas` under per-user monotone ingest. */
  def funnelStageLatencies(events: Dataset[AttrEvent])(
      implicit spark: SparkSession): Dataset[FunnelStageDelta] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new FunnelLatencyProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
