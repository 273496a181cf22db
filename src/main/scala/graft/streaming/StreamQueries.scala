package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming operators surfaced as driver-checkable CORRECTNESS entries.
  *
  * Each query RUNS a Structured Streaming job to completion
  * (Trigger.AvailableNow over the static events file, memory sink)
  * inside the query function and returns the materialized result, so the
  * DuckDB oracle validates the streaming machinery itself — watermarked
  * windowed aggregation, the mapGroupsWithState funnel state machine,
  * and the watermark-bounded stream-stream interval join — not just
  * their batch twins. On a single AvailableNow batch each is exactly
  * equivalent to its batch formulation (the EventStreamSpec equivalence
  * tests pin the same property against the batch DataFrames).
  *
  * Only deterministic columns are exposed (counts, ids, microsecond
  * longs) — no float aggregates whose summation order could differ
  * between engines.
  */
object StreamQueries {

  private val seq = new AtomicInteger(0)

  /** Last memory-sink table name registered per prefix — the drop victim
    * must be tracked per prefix (not derived from the shared counter) or
    * interleaved invocations of different queries drop nonexistent names
    * and leak the real previous tables in long-lived sessions. */
  private val lastTable = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Run `df` to completion into a fresh memory-sink table; the previous
    * invocation's table for the same prefix is dropped so repeated runs
    * (Bench warm + 3 timed) do not accumulate result copies.
    *
    * Stateful-operator partitioning is fixed per stream at start from
    * `spark.sql.shuffle.partitions`; each state partition pays per-batch
    * store-commit IO (HDFS-backed snapshots), so it must be sized to the
    * stream's data volume, not the batch engine's CPU count — at the
    * test scale measured medians for the interval join are 32→~8 s,
    * 8→3.34 s, 4→2.52 s, 2→2.74 s, so 4 is the floor of the
    * commit-IO curve here; a production backfill would raise it with
    * volume (GRAFT_STREAM_STATE_PARTS overrides). The conf is restored
    * after the (synchronous) run. */
  private def runToTable(df: DataFrame, prefix: String, mode: String): DataFrame = {
    val name = s"${prefix}_${seq.incrementAndGet()}"
    val spark = df.sparkSession
    lastTable.get(prefix).foreach(spark.catalog.dropTempView)
    lastTable(prefix) = name
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = spark.conf.get(noData)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("GRAFT_STREAM_STATE_PARTS", "4"))
    // state-store provider, env-parameterised (r22): the default
    // HDFS-backed provider won the A/B for these bounded replays
    // (RocksDB pays JNI + WAL/snapshot setup per store with no offset —
    // measured in OPTIMIZATION_r22.md); a long-running production
    // pipeline with large state would flip this to the RocksDB provider
    // for its incremental snapshots and off-heap state.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.get(providerKey)
    sys.env.get("GRAFT_STREAM_STATE_PROVIDER")
      .foreach(p => spark.conf.set(providerKey, p))
    // every query run here emits on DATA batches (complete-mode agg,
    // NoTimeout mapGroupsWithState, inner interval join emitting on
    // match) — the trailing no-data batch would only evict state, at the
    // cost of one more full state-commit round across every partition
    spark.conf.set(noData, "false")
    try {
      val w = df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(Trigger.AvailableNow())
      // these are bounded correctness replays, not durable pipelines:
      // state/offset commit IO can go to tmpfs when present (a real
      // deployment points checkpointLocation at durable shared storage)
      val ckptBase = new java.io.File("/dev/shm")
      val ckpt =
        if (ckptBase.isDirectory && ckptBase.canWrite)
          Some(java.nio.file.Files.createTempDirectory(
            ckptBase.toPath, s"graft-ckpt-$name-"))
        else None
      val q = ckpt.fold(w)(d => w.option("checkpointLocation", d.toString)).start()
      // stop the query in a finally: if processAllAvailable throws (e.g.
      // the driver thread is interrupted), deleting the checkpoint under
      // a still-running query would leave it failing micro-batches
      try q.processAllAvailable()
      finally {
        try q.stop()
        finally ckpt.foreach { d =>
          org.apache.commons.io.FileUtils.deleteQuietly(d.toFile); ()
        }
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set(noData, prevNoData)
      spark.conf.set(providerKey, prevProvider)
    }
    spark.table(name)
  }

  /** Raw-column stream: the funnel Dataset needs the microsecond LONG
    * (`ts div 1000`, matching batch q66), not fromFiles' timestamp.
    * fromFilesRaw hands back ts in the engine-wide epoch-ns BIGINT
    * convention regardless of the parquet's physical timestamp type. */
  private def rawEvents(s: SparkSession, dir: String): DataFrame =
    EventStream.fromFilesRaw(s, dir)

  val defs: Seq[QueryDef] = Seq(

    // ---- watermarked tumbling-window aggregate (complete mode emits
    //      every window; counts only — deterministic cross-engine) ----
    QueryDef.sql(
      "q83_stream_hourly",
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2
        |ORDER BY hour_us, event_type""".stripMargin) { (s, dir) =>
      val out = EventStream.hourlyByType(EventStream.fromFiles(s, dir))
        .select(unix_micros(col("hour_start")).as("hour_us"),
          col("event_type"), col("n"))
      runToTable(out, "stream_hourly", "complete")
        .orderBy("hour_us", "event_type")
    },

    // ---- mapGroupsWithState funnel: single AvailableNow batch ⇒ the
    //      per-user final state == batch q66 (same oracle, verbatim);
    //      stage-0 users (no view) are filtered as q66's v-CTE does ----
    {
      val q66Oracle = graft.queries.Mining.defs
        .find(_.name == "q66_event_funnel").get.oracle.get
      QueryDef.sql("q84_stream_funnel", q66Oracle) { (s, dir) =>
        import s.implicits._
        val stream = rawEvents(s, dir)
          .select(col("user_id"), expr("ts div 1000").as("tus"),
            col("event_type"), col("event_id"))
          .as[EventStream.FEvent]
        runToTable(EventStream.funnel(stream).toDF(), "stream_funnel", "update")
          .filter(col("stage") >= 1)
          .select(col("user_id"), col("stage"),
            col("us_to_click"), col("us_to_purchase"))
          .orderBy("user_id")
      }
    },

    // ---- watermark-bounded stream-stream interval join: inner-join
    //      results emit as matched (state eviction, not emission, is
    //      what the watermark gates), so one batch yields the full
    //      batch band-join result ----
    QueryDef.sql(
      "q85_stream_interval_join",
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        |  v.event_id AS view_id,
        |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
        |FROM events c JOIN events v
        |  ON v.user_id = c.user_id
        | AND v.event_type = 'view' AND c.event_type = 'click'
        | AND epoch_us(v.ts) < epoch_us(c.ts)
        | AND epoch_us(v.ts) >= epoch_us(c.ts) - 3600000000
        |ORDER BY click_id, view_id""".stripMargin) { (s, dir) =>
      // two separate file sources, NOT a branched self-join: each side
      // pushes its event_type filter into its own parquet scan, which
      // measures ~30% faster than one shared full scan branched twice
      def side(t: String) = EventStream.fromFiles(s, dir)
        .filter(col("event_type") === t)
      runToTable(
        EventStream.clickAttribution(side("view"), side("click")),
        "stream_attrib", "append")
        .orderBy("click_id", "view_id")
    },

    // ---- watermark-bounded streaming dedup
    //      (`dropDuplicatesWithinWatermark`): the stateful ingestion-
    //      dedup operator — one state entry per distinct key, evicted
    //      once the watermark passes the key's horizon, so state is
    //      bounded by the live-key cardinality instead of the stream's
    //      history (unbounded `dropDuplicates` state is the 100 TB
    //      failure mode). The 60-day delay covers the test data's
    //      30-day span, so the streaming result equals global DISTINCT
    //      and stays oracle-exact; a production pipeline sets the delay
    //      to its real dedup horizon. First-seen rows emit in their
    //      arrival batch (stateful filter, not an agg — no watermark
    //      wait), and only key columns are exposed so arrival order
    //      inside a batch cannot leak into the result. The per-type
    //      count + id-checksum aggregation runs batch-side on the
    //      materialized sink, keeping the output SF-stable. ----
    QueryDef.sql(
      "q92_stream_dedup",
      """SELECT event_type, count(*) AS n_users,
        |  sum(user_id)::BIGINT AS user_id_sum
        |FROM (SELECT DISTINCT user_id, event_type FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val deduped = EventStream.fromFiles(s, dir)
        .withWatermark("ts", "60 days")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      runToTable(deduped, "stream_dedup", "append")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"))
        .orderBy("event_type")
    },

    // ---- streaming session_window: the native dynamic-gap session
    //      aggregate under real Structured Streaming, completing the
    //      sessions triangle (q47 batch islands, q102 batch native,
    //      q103 streaming native) against ONE boundary definition —
    //      all three check out against the same half-open-window
    //      semantics. Complete mode here: an append-mode session emits
    //      only once the watermark passes its end, which a bounded
    //      AvailableNow replay's final data batch never does (the
    //      trailing no-data batch is disabled in runToTable) — a
    //      production pipeline runs append + watermark and trades that
    //      latency for bounded state. ----
    {
      val q102Oracle = graft.queries.Pipeline.defs
        .find(_.name == "q102_session_window").get.oracle.get
      QueryDef.sql("q103_stream_sessions", q102Oracle) { (s, dir) =>
        val sessions = EventStream.fromFiles(s, dir)
          .groupBy(col("user_id"),
            expr("session_window(ts, '30 minutes')").as("sw"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("sess_start"),
            unix_micros(col("sw.end")).as("sess_end_excl"),
            col("n_events"))
        runToTable(sessions, "stream_sessions", "complete")
          .orderBy("user_id", "sess_start")
      }
    })
}
