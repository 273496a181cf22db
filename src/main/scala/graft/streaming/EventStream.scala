package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` stream
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference is strictly bounded (`Boundedness::Bounded`,
  * `scanner.rs:54`) — streaming is a capability the Spark build adds on
  * top: the same event-analytics queries run incrementally with
  * watermarks bounding state.
  *
  * Scale notes: all stateful ops key by `user_id`/`event_type`, so state
  * shards across executors with the shuffle; watermarks bound state size
  * (without one, a 100 TB backfill would accumulate unbounded window
  * state).
  */
object EventStream {

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Session(
      user_id: Long, n_events: Int, total_value: Double,
      started: Timestamp, ended: Timestamp)

  final case class SessionState(n: Int, total: Double, start: Long, last: Long)

  /** File-based stream of the events table with `ts` normalized to the
    * engine-wide epoch-ns BIGINT convention (the same shape
    * `Tables.load` hands batch queries). A file source needs its schema
    * up front, so probe the batch reader's view of the footer once
    * (driver-side, one footer read) and declare EXACTLY that schema —
    * whatever physical ts shape is on disk — then route through the one
    * shared normalization in [[graft.Tables.normalizeEventTs]], so the
    * batch and streaming read boundaries cannot drift apart. */
  // raw footer schema, memoized per (session, dir): the probe is a
  // driver-side footer read that otherwise repeats on every stream
  // construction (x3 timed runs; q85 builds two sides per run). The RAW
  // schema is cached, not Tables.load's normalized view — the file
  // source must declare the physical ts shape on disk.
  private val schemaMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), org.apache.spark.sql.types.StructType]

  /** Visible for tests: live entry count after the stopped-session sweep. */
  private[graft] def schemaMemoSize: Int = schemaMemo.size

  def fromFilesRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bounded like Tables.load's memo (r22, ADVICE): stopped sessions'
    // entries are swept on every access
    schemaMemo.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    val probed = schemaMemo.getOrElseUpdate((spark, sfDir),
      spark.read.parquet(s"$sfDir/events.parquet").schema)
    // events.parquet is a single file; stream its parent directory with a
    // glob filter so the file source sees a directory basePath
    val raw = spark.readStream.schema(probed)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    graft.Tables.normalizeEventTs(spark, raw)
  }

  /** File-based stream of the events table (new parquet files appearing
    * under the directory are picked up incrementally), ts as a proper
    * TIMESTAMP for watermarks/windows. */
  def fromFiles(spark: SparkSession, sfDir: String): DataFrame =
    fromFilesRaw(spark, sfDir)
      // integer ns->us division: `/` would widen the ~1.7e18 ns epoch to
      // double (53-bit mantissa) and corrupt the low microseconds
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling 1-hour windowed aggregate with a 2-hour watermark for late
    * data — the streaming analog of batch q22_events_window. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding window (1 hour every 15 min) per event type. */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  final case class FEvent(user_id: Long, tus: Long, event_type: String, event_id: Long)

  /** Funnel progress per user: -1 = stage not reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)

  final case class FunnelUpdate(
      user_id: Long, stage: Int, us_to_click: Option[Long], us_to_purchase: Option[Long])

  /** Streaming twin of batch q66_event_funnel: a per-user state machine
    * over view → click → purchase. Emission semantics are per-BATCH, not
    * per-advance: every user with any event in the micro-batch gets a
    * FunnelUpdate of their current state, including non-advancing batches
    * and stage-0 users who clicked/purchased without ever viewing —
    * consumers wanting only funnel entrants filter stage >= 1 (as the
    * equivalence spec does to match q66). Within a micro-batch events are
    * processed in (tus, event_id) order, so on an in-order stream (or a
    * single AvailableNow batch) the result is exactly q66's
    * earliest-after-prior-stage semantics; unbounded out-of-order arrival
    * degrades to the usual streaming approximation. State is three longs
    * per user — sharded by the groupByKey shuffle, O(users) total. */
  def funnel(events: Dataset[FEvent]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelUpdate](GroupStateTimeout.NoTimeout) {
        (uid: Long, batch: Iterator[FEvent], state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
          batch.toSeq.sortBy(e => (e.tus, e.event_id)).foreach { e =>
            e.event_type match {
              case "view" if s.t1 < 0 => s = s.copy(t1 = e.tus)
              case "click" if s.t1 >= 0 && s.t2 < 0 && e.tus > s.t1 =>
                s = s.copy(t2 = e.tus)
              case "purchase" if s.t2 >= 0 && s.t3 < 0 && e.tus > s.t2 =>
                s = s.copy(t3 = e.tus)
              case _ => ()
            }
          }
          state.update(s)
          val stage =
            (if (s.t1 >= 0) 1 else 0) + (if (s.t2 >= 0) 1 else 0) + (if (s.t3 >= 0) 1 else 0)
          FunnelUpdate(uid, stage,
            if (s.t2 >= 0) Some(s.t2 - s.t1) else None,
            if (s.t3 >= 0) Some(s.t3 - s.t2) else None)
      }
  }

  /** Stream-stream interval join: attribute each click to the same
    * user's views in the preceding hour. Both sides carry watermarks so
    * Spark can bound join state — without them a 100 TB backfill would
    * buffer every view forever; with them state is (users × 1 h) of
    * views. The join keys on user_id (state shards with the shuffle)
    * plus the event-time band predicate. */
  def clickAttribution(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", "2 hours")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") < col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"), col("view_id"),
        unix_micros(col("c_ts")).minus(unix_micros(col("v_ts"))).as("lag_us"))
  }

  /** Custom state: sessionization with a 30-minute inactivity gap via
    * flatMapGroupsWithState + event-time timeout. */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = 30L * 60 * 1000
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, s.n, s.total, new Timestamp(s.start), new Timestamp(s.last)))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // a late-but-admitted out-of-order event (earlier batch
                  // already advanced `last`) must never REGRESS the
                  // session bounds: ended is the max event time seen,
                  // started the min — otherwise the next event computes
                  // its gap against a rolled-back `last` and wrongly
                  // splits a live session
                  cur = Some(SessionState(s.n + 1, s.total + e.value,
                    math.min(s.start, t), math.max(s.last, t)))
                case Some(s) =>
                  closed ::= Session(uid, s.n, s.total, new Timestamp(s.start), new Timestamp(s.last))
                  cur = Some(SessionState(1, e.value, t, t))
                case None =>
                  cur = Some(SessionState(1, e.value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
