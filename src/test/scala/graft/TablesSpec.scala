package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The events read boundary (ADVICE r8): ts normalization must be
  * timezone-INDEPENDENT — a library consumer's session zone must not
  * change the epoch-ns values either batch (`Tables.load`) or streaming
  * (`EventStream.fromFilesRaw`) hand to queries, and the normalization
  * must not mutate session conf as a read side effect. */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("tables-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // deliberately NOT UTC: the mains pin UTC, ad-hoc consumers may not
      .config("spark.sql.session.timeZone", "Asia/Tokyo")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("events ts normalization is identical under any session timezone") {
    val tokyo = Tables.load(spark, dir, "events")
      .orderBy("event_id").select("event_id", "ts").collect()
    assert(spark.conf.get("spark.sql.session.timeZone") == "Asia/Tokyo",
      "normalizeEventTs must not mutate the session timezone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      val ny = Tables.load(spark, dir, "events")
        .orderBy("event_id").select("event_id", "ts").collect()
      assert(tokyo.length == ny.length && tokyo.length > 0)
      tokyo.zip(ny).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1),
          s"tz-dependent ts: event ${a.getLong(0)} ${a.getLong(1)} vs ${b.getLong(1)}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
  }

  test("NTZ shape normalizes zone-free: DST fall-back overlap instants survive") {
    import java.time.LocalDateTime
    val sp = spark; import sp.implicits._
    // UTC wall clocks 05:30Z and 06:30Z on 2024-11-03 both land on wall
    // 01:30 in America/New_York (EDT then EST) — a zone round-trip
    // resolves the ambiguous wall clock to ONE offset and shifts the
    // other instant by 3600 s; pure wall-clock arithmetic must not
    val times = Seq(
      LocalDateTime.parse("2024-11-03T05:30:00"),
      LocalDateTime.parse("2024-11-03T06:30:00"),
      LocalDateTime.parse("1999-12-31T23:59:59.999999"))
    val p = java.nio.file.Files.createTempDirectory("tables-ntz").toString + "/events"
    times.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("event_id", "ts").write.mode("overwrite").parquet(p)
    val expected = times.map(t =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + t.getNano)
    Seq("America/New_York", "Asia/Tokyo").foreach { tz =>
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        val df = spark.read.parquet(p)
        assert(df.schema("ts").dataType ==
          org.apache.spark.sql.types.TimestampNTZType, df.schema)
        val got = Tables.normalizeEventTs(spark, df)
          .orderBy("event_id").collect().map(_.getLong(1)).toSeq
        assert(got == expected, s"tz=$tz: $got != $expected")
      } finally spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    }
  }

  test("streaming read boundary produces the same epoch-ns values as batch") {
    import org.apache.spark.sql.streaming.Trigger
    val stream = graft.streaming.EventStream.fromFilesRaw(spark, dir)
    val q = stream.select("event_id", "ts")
      .writeStream.format("memory").queryName("tables_spec_raw")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tables_spec_raw").orderBy("event_id").collect()
    val batch = Tables.load(spark, dir, "events")
      .orderBy("event_id").select("event_id", "ts").collect()
    assert(streamed.length == batch.length && batch.length > 0)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1))
    }
  }
}
