package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class EventStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("event-stream-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("hourly windowed aggregate over a MemoryStream matches hand computation") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[EventStream.Event]
    in.addData(
      EventStream.Event(1, ts(5), 1, "click", 1.0),
      EventStream.Event(2, ts(20), 1, "click", 2.0),
      EventStream.Event(3, ts(65), 2, "view", 10.0),
      EventStream.Event(4, ts(70), 2, "click", 4.0))
    val q = EventStream.hourlyByType(in.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("hourly")
      .select(col("hour_start").cast("long"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set((0L, "click", 2L, 3.0), (3600L, "view", 1L, 10.0), (3600L, "click", 1L, 4.0)))
  }

  test("streaming hourly agg over the events file == batch aggregation") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    val stream = EventStream.fromFiles(spark, dir)
    val q = EventStream.hourlyByType(stream)
      .writeStream.format("memory").queryName("hourly_file")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_file")
      .select(col("hour_start").cast("long").as("h"), col("event_type"), col("n"))
    val batch = graft.Tables.load(spark, dir, "events")
      // integer ns->us division: `/` is double division and its 53-bit
      // mantissa corrupts the low microseconds at ~1.7e18 ns epochs
      .withColumn("tsn", timestamp_micros(expr("ts div 1000")))
      .groupBy(date_trunc("hour", col("tsn")).cast("long").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("sessionization groups events by 30-min inactivity gap") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[EventStream.Event]
    // user 1: events at 0,10,20 (one session), then 90,95 (second session)
    // user 2: single event at 15
    in.addData(
      EventStream.Event(1, ts(1), 1, "a", 1.0),
      EventStream.Event(2, ts(10), 1, "a", 1.0),
      EventStream.Event(3, ts(20), 1, "a", 1.0),
      EventStream.Event(4, ts(90), 1, "a", 5.0),
      EventStream.Event(5, ts(95), 1, "a", 5.0),
      EventStream.Event(6, ts(15), 2, "b", 7.0))
    val out = EventStream.sessionize(in.toDS())
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // within one batch, user 1's first session closes when the 90-min
    // event arrives (gap > 30 min)
    val rows = spark.table("sessions")
      .select("user_id", "n_events", "total_value").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(rows.contains((1L, 3, 3.0)), s"got $rows")
  }

  test("sessionize: a late out-of-order event never regresses session bounds") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[EventStream.Event]
    val out = EventStream.sessionize(in.toDS())
    val q = out.writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    // times start at 60 min: the initial watermark is epoch 0 and a
    // ts=0 event would be dropped as late before reaching the operator
    // batch 1: events at 60 and 80 min — session last=80
    in.addData(
      EventStream.Event(1, ts(60), 1, "a", 1.0),
      EventStream.Event(2, ts(80), 1, "a", 1.0))
    q.processAllAvailable()
    // batch 2: a LATE event at 70 min (admitted — watermark is 2h back);
    // the session's `last` must stay 80, not regress to 70
    in.addData(EventStream.Event(3, ts(70), 1, "a", 1.0))
    q.processAllAvailable()
    // batch 3: event at 105 min — gap vs the true last (80) is 25 min,
    // within the 30-min gap, so the session must NOT split (a regressed
    // last of 70 would compute a 35-min gap and wrongly close it)
    in.addData(EventStream.Event(4, ts(105), 1, "a", 1.0))
    q.processAllAvailable()
    // far-future event advances the watermark and times the session out
    in.addData(EventStream.Event(5, ts(60 * 13), 1, "a", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("late_sessions")
      .select("user_id", "n_events", "started", "ended").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getTimestamp(2).getTime / 60000, r.getTimestamp(3).getTime / 60000))
    assert(rows.toSeq == Seq((1L, 4, 60L, 105L)), s"got ${rows.toSeq}")
  }

  test("stream-stream interval join == batch band join on the events file") {
    val dir = "/root/testdata/sf0.001"
    def side(t: String) = EventStream.fromFiles(spark, dir)
      .filter(col("event_type") === t)
    val q = EventStream.clickAttribution(side("view"), side("click"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrib")
    val batch = {
      val e = graft.Tables.load(spark, dir, "events")
        .withColumn("tus", expr("ts div 1000"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("tus").as("vt"), col("event_id").as("view_id"))
      e.filter(col("event_type") === "click")
        .select(col("user_id"), col("tus").as("ct"), col("event_id").as("click_id"))
        .join(v, col("user_id") === col("vu") &&
          col("vt") < col("ct") && col("vt") >= col("ct") - 3600L * 1000000L)
        .select(col("user_id"), col("click_id"), col("view_id"),
          (col("ct") - col("vt")).as("lag_us"))
    }
    assert(streamed.count() > 0, "attribution join must produce rows")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streaming interval join must equal the batch band join")
  }

  test("streaming funnel: state machine matches hand computation") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val in = MemoryStream[EventStream.FEvent]
    in.addData(
      // user 1: full funnel; pre-view click at t=5 must NOT count
      EventStream.FEvent(1, 5, "click", 1),
      EventStream.FEvent(1, 10, "view", 2),
      EventStream.FEvent(1, 30, "click", 3),
      EventStream.FEvent(1, 40, "purchase", 4),
      // user 2: purchase before click -> stuck at stage 2
      EventStream.FEvent(2, 10, "view", 5),
      EventStream.FEvent(2, 15, "purchase", 6),
      EventStream.FEvent(2, 20, "click", 7),
      // user 3: view only
      EventStream.FEvent(3, 10, "view", 8))
    val q = EventStream.funnel(in.toDS())
      .writeStream.format("memory").queryName("funnel_mem")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("funnel_mem").as[EventStream.FunnelUpdate]
      .collect().map(u => u.user_id -> u).toMap
    assert(rows(1L) == EventStream.FunnelUpdate(1L, 3, Some(20L), Some(10L)))
    assert(rows(2L) == EventStream.FunnelUpdate(2L, 2, Some(10L), None))
    assert(rows(3L) == EventStream.FunnelUpdate(3L, 1, None, None))
  }

  test("streaming funnel over the events file == batch q66") {
    val sp = spark
    import sp.implicits._
    val dir = "/root/testdata/sf0.001"
    // read raw columns rather than via fromFiles: the funnel Dataset
    // needs the microsecond LONG (`ts div 1000`, matching batch q66
    // exactly), not the timestamp column fromFiles produces
    val stream = EventStream.fromFilesRaw(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_type"), col("event_id"))
      .as[EventStream.FEvent]
    val q = EventStream.funnel(stream)
      .writeStream.format("memory").queryName("funnel_file")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // single AvailableNow batch -> one update per user = final state
    val streamed = spark.table("funnel_file")
      .filter(col("stage") >= 1)
      .select(col("user_id"), col("stage"), col("us_to_click"), col("us_to_purchase"))
    val batch = graft.SparkEntry.queries("q66_event_funnel")(spark, dir)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "streaming funnel must equal batch q66")
  }
}
