package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.operators.EventTime

/** Structured Streaming over the `events` table (SURVEY §2.9: the
  * reference has no streaming — this is the §7.5 extension surface).
  *
  * Batch/stream parity: `hourlyAgg` is the streaming twin of
  * EventQueries.q20 — same grouping, same measures — so the memory-sink
  * output can be asserted equal to the batch result in tests
  * (EventsStreamingSpec).
  *
  * Scale notes: watermark + tumbling window keeps state bounded by
  * (#hours in watermark) × (#event types); sessionization state is one
  * small struct per active user, evicted on timeout — both shapes run
  * unchanged on a real cluster with a durable checkpoint dir.
  */
object EventsStreaming {

  /** Fixture event schema (ts = int64 nanoseconds) — what the spec
    * fixtures write. Real testdata may declare any type
    * [[graft.operators.EventTime]] supports; [[readEvents]] reads the
    * actual footer instead of assuming this.
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  /** File-source stream of the events table (one file = one microbatch
    * locally; on a cluster this is any file/Kafka source with the same
    * schema). The file source requires a declared schema: declare
    * exactly what the file's footer says (one driver-side footer read),
    * so a regeneration that changes the physical `ts` type never
    * desyncs the stream from the files.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // int64-nanos footer readability is a session default
    // (GraftConf.bootstrap) — stream constructors stay conf-pure
    val fileSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream
      .schema(fileSchema)
      // Glob-match ONLY the events table (the sf dir holds every table);
      // the [t] forces glob interpretation — a bare file path is rejected
      // by the file stream source ("basePath must be a directory").
      .parquet(s"$dir/events.parque[t]")
    EventTime.withUs(raw).withColumn("ts_ts", timestamp_micros(col("us")))
  }

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark for
    * late data. Output schema matches EventQueries.q20.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_ts", "2 hours")
      .groupBy(window(col("ts_ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct("user_id").as("approx_users"),
        sum("value").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n_events"), col("approx_users"), col("sum_value"))

  /** Per-user session state for the stateful sessionizer. */
  case class SessionState(lastUs: Long, nSessions: Long, nEvents: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Stateful gap-sessionization (1 h inactivity) via mapGroupsWithState —
    * the streaming twin of EventQueries.q19. Emits the running per-user
    * session counts on every update.
    */
  def sessionize(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapUs = 3600L * 1000000L
    events
      .select(col("user_id"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          // Sort within the microbatch: arrival order is not time order.
          val sorted = rows.map(_._2).toSeq.sorted
          val init = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          val end = sorted.foldLeft(init) { (st, us) =>
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > gapUs
            SessionState(us, st.nSessions + (if (newSession) 1 else 0), st.nEvents + 1)
          }
          state.update(end)
          UserSessions(uid, end.nSessions, end.nEvents)
      }
      .toDF()
  }

  /** One closed gap-session: emitted when the inactivity gap is observed
    * in-batch, or by event-time timeout once the watermark passes the
    * session's horizon. `sum_value` stays raw here (cent-granular
    * doubles sum exactly); presentation rounding happens in the
    * DataFrame layer so stream and batch twin round identically.
    */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  /** The (single) open session carried between microbatches. */
  case class OpenSession(startUs: Long, lastUs: Long, nEvents: Long,
      sumValue: Double)

  /** Session-granular sessionization — the flatMapGroupsWithState shape
    * [[sessionize]]'s running counters can't express: one output row per
    * CLOSED session (start/end/size/value), not a running per-user
    * rollup. In-batch gaps close sessions immediately; the tail session
    * stays in state and is closed by EVENT-TIME timeout when the
    * watermark passes `last event + gap` — so state is one small struct
    * per user active inside the watermark horizon, evicted on timeout,
    * and the output is append-mode (each session exactly once), the
    * contract a downstream sink (training-shard writer, feature store)
    * actually wants. Batch twin: [[sessionsBatch]]; parity pinned in
    * StreamingMultimodalSpec.
    */
  def closedSessions(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val gapUs = 3600L * 1000000L
    events
      .withWatermark("ts_ts", "2 hours")
      .select(col("user_id"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"),
        col("value"), col("ts_ts"))
      .as[(Long, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, rows, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: the open
            // session is definitively closed
            val o = state.get
            state.remove()
            Iterator.single(ClosedSession(uid, o.startUs, o.lastUs, o.nEvents, o.sumValue))
          } else {
            // arrival order is not time order: sort the microbatch slice
            val sorted = rows.map(r => (r._2, r._3)).toArray.sortBy(_._1)
            val closed = scala.collection.mutable.ArrayBuffer[ClosedSession]()
            var open = state.getOption
            sorted.foreach { case (us, v) =>
              open match {
                case Some(o) if us - o.lastUs <= gapUs =>
                  // min/max guards: a LATE event from a following batch
                  // can be older than the carried session's bounds —
                  // merging must never move lastUs backward (it anchors
                  // the timeout horizon) or leave start_us after an
                  // absorbed earlier event
                  open = Some(OpenSession(math.min(o.startUs, us),
                    math.max(o.lastUs, us), o.nEvents + 1, o.sumValue + v))
                case Some(o) =>
                  closed += ClosedSession(uid, o.startUs, o.lastUs, o.nEvents, o.sumValue)
                  open = Some(OpenSession(us, us, 1L, v))
                case None =>
                  open = Some(OpenSession(us, us, 1L, v))
              }
            }
            open.foreach { o =>
              state.update(o)
              // timeout in EVENT time: fires once the watermark passes
              // the session's inactivity horizon. A group whose events
              // ran entirely behind the watermark (late data in a
              // multi-batch stream) would have a horizon in the past,
              // which setTimeoutTimestamp rejects — clamp to just past
              // the watermark so the session closes in the next batch
              // instead of crashing the query.
              val horizon = o.lastUs / 1000L + gapUs / 1000L
              state.setTimeoutTimestamp(
                math.max(horizon, state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
      .toDF()
      .withColumn("sum_value", round(col("sum_value"), 2))
  }

  /** Batch twin of [[closedSessions]]: every gap-session of the bounded
    * input (the stream can only ever emit a subset — tail sessions
    * inside the watermark horizon are still open when it ends).
    */
  def sessionsBatch(events: DataFrame): DataFrame = {
    val gapUs = 3600L * 1000000L
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("us").asc)
    events
      .select(col("user_id"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"),
        col("value"))
      .withColumn("gap", col("us") - lag("us", 1).over(wo))
      .withColumn("new_sess",
        when(col("gap").isNull || col("gap") > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum("new_sess").over(
        wo.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sess_id")
      .agg(
        min("us").as("start_us"), max("us").as("end_us"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select("user_id", "start_us", "end_us", "n_events", "sum_value")
  }

  /** Per-user funnel state: earliest view, earliest qualifying click,
    * earliest qualifying purchase (micros; None = stage not reached).
    */
  case class FunnelState(v: Option[Long], c: Option[Long], p: Option[Long])
  case class UserFunnel(user_id: Long, v_us: Option[Long], c_us: Option[Long],
      p_us: Option[Long], stage: Int)

  /** Streaming twin of EventQueries.q30: per-user ordered funnel
    * (view → click → purchase), maintained incrementally via
    * mapGroupsWithState and emitted as a running update-mode row per
    * user. Each microbatch slice is sorted by event time before the
    * fold, so for an in-order stream the end-of-stream table equals the
    * batch q30 exactly (parity pinned in spec). A late cross-batch
    * event can only deepen the funnel or lower `v_us` — decided stages
    * never retract, the same observed-prefix concession `sessionize`
    * makes. State is three optional longs per user; production expires
    * dormant users with an event-time timeout (the closedSessions
    * idiom) — not needed for a bounded local replay.
    */
  def funnelStages(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, UserFunnel](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[FunnelState]) =>
          // arrival order is not time order: sort the microbatch slice;
          // at EQUAL timestamps the enabling stage must fold first
          // (batch q30's >= is inclusive), so view < click < purchase
          val stageOrd = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
          val sorted = rows.map(r => (r._3, r._2)).toArray
            .sortBy { case (us, et) => (us, stageOrd.getOrElse(et, 3)) }
          val end = sorted.foldLeft(
            state.getOption.getOrElse(FunnelState(None, None, None))) {
            case (st, (us, et)) => et match {
              case "view" =>
                st.copy(v = Some(st.v.fold(us)(math.min(_, us))))
              case "click" if st.c.isEmpty &&
                  st.v.exists(us >= _) =>
                st.copy(c = Some(us))
              case "purchase" if st.p.isEmpty &&
                  st.c.exists(us >= _) =>
                st.copy(p = Some(us))
              case _ => st
            }
          }
          state.update(end)
          val stage =
            if (end.p.isDefined) 3 else if (end.c.isDefined) 2
            else if (end.v.isDefined) 1 else 0
          UserFunnel(uid, end.v, end.c, end.p, stage)
      }
      .toDF()
  }

  /** Per-type running-anomaly state: open (not-yet-final) hour counts
    * plus the exact integer moments of every CLOSED hour so far.
    */
  case class AnomalyState(open: Map[Long, Long], nh: Long, sx: Long, sxx: Long,
      lastClosed: Long = Long.MinValue)
  case class HourAnomaly(event_type: String, hour_us: Long, n_events: Long,
      zscore: Double, is_anomaly: Boolean)

  /** Streaming traffic-anomaly detection — the continuous twin of
    * EventQueries.q33 under PREFIX semantics: each event type's state
    * carries its open hourly counters plus the exact integer Σx/Σx²
    * moments of every hour already closed, and when the watermark
    * passes an hour's end (+2 h delay) that hour is scored against the
    * moments of the hours BEFORE it, emitted once (append), and folded
    * into the moments. Prefix scoring is what a live monitor can
    * actually compute — q33's global-moments z needs the whole history
    * at every hour, which only a batch pass has; the exact prefix twin
    * ([[anomaliesPrefixBatch]]) is proven equal on an in-order stream.
    *
    * One stateful operator does both the hour assembly and the scoring
    * (chaining a windowed agg INTO mapGroupsWithState is the shape
    * Spark restricts); state per event type is the open-hour map inside
    * the watermark horizon + three longs — bounded by (horizon ×
    * arrival spread), evicted as hours close. Hours close in ascending
    * order, so the moment fold is deterministic; z arithmetic is the
    * exact q33 operation sequence via the scalar dround twin.
    */
  def anomalyStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val hourUsL = 3600L * 1000000L
    events
      .withWatermark("ts_ts", "2 hours")
      .select(col("event_type"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"), col("ts_ts"))
      .select(col("event_type"),
        (expr(s"us div $hourUsL") * lit(hourUsL)).as("hour_us"), col("ts_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomalyState, HourAnomaly](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (et, rows, state: GroupState[AnomalyState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(AnomalyState(Map.empty, 0L, 0L, 0L))
          if (!state.hasTimedOut) {
            // never re-open an emitted hour (it would close twice —
            // duplicate append row AND a double fold into the Σx/Σx²
            // moments; ADVICE r10). Spark's FlatMapGroupsWithStateExec
            // already filters sub-watermark rows under EventTimeTimeout
            // (verified: the late-replay spec passes with this guard
            // disabled), so this is defense-in-depth making emit-once a
            // STATE invariant rather than an engine behavior we inherit.
            // Hours close in ascending order, so <= lastClosed is exact.
            val bumped = rows.foldLeft(st.open) { (m, r) =>
              if (r._2 <= st.lastClosed) m
              else m.updated(r._2, m.getOrElse(r._2, 0L) + 1L)
            }
            st = st.copy(open = bumped)
          }
          // close every hour the watermark has passed, OLDEST FIRST —
          // each closes against the moments of the hours before it
          val ready = st.open.keys.filter(h => h + hourUsL <= wmUs).toSeq.sorted
          val out = ready.map { h =>
            val n = st.open(h)
            val z =
              if (st.nh > 1) {
                val mean = st.sx.toDouble / st.nh
                val variance =
                  (st.sxx.toDouble - st.nh * mean * mean) / (st.nh - 1)
                if (variance > 0)
                  graft.operators.Rounding.droundD((n - mean) / math.sqrt(variance), 6)
                else 0.0
              } else 0.0
            st = AnomalyState(st.open - h, st.nh + 1, st.sx + n, st.sxx + n * n, h)
            HourAnomaly(et, h, n, z, math.abs(z) > 3.0)
          }
          state.update(st)
          if (st.open.nonEmpty) {
            val horizon = (st.open.keys.min + hourUsL) / 1000L + 2L * 3600L * 1000L
            state.setTimeoutTimestamp(
              math.max(horizon, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
      .select(
        date_format(timestamp_micros(col("hour_us")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n_events"), col("zscore"), col("is_anomaly"))
  }

  /** Per-type EWMA state: open hour counts + the closed-hour counts
    * still inside the 24 h baseline horizon (trimmed as hours close).
    */
  case class EwmaState(open: Map[Long, Long], closed: Map[Long, Long],
      lastClosed: Long = Long.MinValue)
  case class HourEwma(event_type: String, hr: Long, n_events: Long,
      ewma: Option[Double], hist: Long, is_spike: Boolean)

  /** Streaming twin of EventQueries.q40 — and unlike q33, the EWMA
    * baseline is ALREADY prefix-semantics (hour h scores against hours
    * h-24..h-1 only), so on an in-order stream the emitted rows equal
    * the batch operator's rows exactly, not a weaker prefix variant.
    * State per event type is the open-hour map inside the watermark
    * horizon plus at most 24 closed-hour counters; hours close oldest-
    * first as the watermark (+2 h delay) passes them, are scored against
    * the retained baseline with the same integer 2^(24-d) weights and
    * integer cross-product spike rule, then join the baseline and evict
    * anything older than 24 h. State is O(horizon + 24) longs per type.
    */
  def ewmaStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    val hourUsL = 3600L * 1000000L
    events
      .withWatermark("ts_ts", "2 hours")
      .select(col("event_type"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"), col("ts_ts"))
      .select(col("event_type"), expr(s"us div $hourUsL").as("hr"), col("ts_ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, HourEwma](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (et, rows, state: GroupState[EwmaState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(EwmaState(Map.empty, Map.empty))
          if (!state.hasTimedOut) {
            // same emit-once state invariant as anomalyStream: an hour
            // that already closed and joined the baseline never re-opens
            val bumped = rows.foldLeft(st.open) { (m, r) =>
              if (r._2 <= st.lastClosed) m
              else m.updated(r._2, m.getOrElse(r._2, 0L) + 1L)
            }
            st = st.copy(open = bumped)
          }
          val ready = st.open.keys.filter(h => (h + 1L) * hourUsL <= wmUs).toSeq.sorted
          val out = ready.map { h =>
            val n = st.open(h)
            val contrib = st.closed.filter { case (h2, _) => h2 >= h - 24 && h2 < h }
            val num = contrib.iterator
              .map { case (h2, c) => c * (1L << (24 - (h - h2)).toInt) }.sum
            val den = contrib.iterator
              .map { case (h2, _) => 1L << (24 - (h - h2)).toInt }.sum
            val hist = contrib.size.toLong
            val ewma =
              if (hist > 0) Some(graft.operators.Rounding.droundD(num.toDouble / den, 6))
              else None
            val spike = hist >= 6 && n * den > 2 * num
            // fold the closed hour into the baseline, trim past-horizon hours
            st = EwmaState(st.open - h,
              (st.closed + (h -> n)).filter { case (h2, _) => h2 >= h - 23 })
            HourEwma(et, h, n, ewma, hist, spike)
          }
          state.update(st)
          if (st.open.nonEmpty) {
            val horizon = (st.open.keys.min + 1L) * hourUsL / 1000L + 2L * 3600L * 1000L
            state.setTimeoutTimestamp(
              math.max(horizon, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
      .toDF()
  }

  /** Batch twin of [[anomalyStream]]: prefix-moments z per (hour, type)
    * over the bounded input — each hour scored against strictly earlier
    * hours, the exact semantics the stream applies as hours close.
    */
  def anomaliesPrefixBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("hour_us").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val mean = col("sx").cast("double") / col("nh")
    val variance = (col("sxx").cast("double") - col("nh") * mean * mean) /
      (col("nh") - 1)
    events
      .select(col("event_type"),
        EventTime.usExpr(events.schema("ts").dataType).as("us"))
      .select(col("event_type"),
        (expr("us div 3600000000") * lit(3600L * 1000000L)).as("hour_us"))
      .groupBy("event_type", "hour_us").agg(count(lit(1)).as("n_events"))
      .withColumn("nh", count(lit(1)).over(w))
      .withColumn("sx", sum("n_events").over(w))
      .withColumn("sxx", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("z",
        when(col("nh") > 1 && variance > 0,
          graft.operators.Rounding.dround(
            (col("n_events") - mean) / sqrt(variance), 6))
          .otherwise(lit(0.0)))
      .select(
        date_format(timestamp_micros(col("hour_us")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("n_events"),
        col("z").as("zscore"), (abs(col("z")) > 3.0).as("is_anomaly"))
  }

  /** Sliding-window variant (1 h window, 30 min slide): each event lands
    * in two windows; same watermark bound on state.
    */
  def slidingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_ts", "2 hours")
      .groupBy(window(col("ts_ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact deduplication with bounded state: dropDuplicates on
    * the id within a watermark horizon — the streaming twin of the
    * batch exact-dedup operator (TextQueries.qd1's shape). State holds
    * only ids seen inside the watermark, so memory is bounded by
    * (arrival rate × horizon), not stream length.
    */
  def dedupeEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts_ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Watermarked stream-stream interval join (attribution shape): each
    * click joins the same user's purchases landing within one hour
    * after it. Both sides carry watermarks and the join condition
    * bounds p_ts relative to c_ts in both directions, so Spark can
    * evict buffered rows once the watermark passes the interval — state
    * is bounded by (arrival rate × horizon), the only stream-stream
    * join shape that survives an unbounded stream.
    */
  def attributionJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(buys,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("value"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** Batch twin of [[attributionJoin]] for parity assertions. */
  def attributionJoinBatch(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_ts").as("c_ts"),
        col("event_id").as("click_id"))
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
    clicks.join(buys,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("value"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us"))
  }

  /** Run a streaming DataFrame to completion against a memory sink and
    * return the result table (local test/dev harness).
    */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode = OutputMode.Update()): DataFrame = {
    val q: StreamingQuery = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
