package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-provided parquet tables (TESTDATA.md) for a given
  * scale-factor directory and registers them as temp views so queries can
  * use either the DataFrame API or `spark.sql`.
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the parquet scan — at 100 TB the
  * scan is the dominant cost and must only read referenced columns /
  * row groups.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir, table): `spark.read.parquet` builds a
  // fresh InMemoryFileIndex and re-reads the footer schema on EVERY
  // call, which costs a small listing/footer job per query construction
  // (x3 timed runs x queries x tables in a bench sweep). The DataFrame
  // is an immutable plan — only file metadata is cached here, never
  // results (the guide's file-listing-cache point, applied at the one
  // shared read boundary). Session-keyed like ShingleBase's memo.
  private val memo = scala.collection.mutable.Map
    .empty[(SparkSession, String, String), DataFrame]

  /** Visible for tests: live entry count after the stopped-session sweep. */
  private[graft] def memoSize: Int = synchronized { memo.size }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    synchronized {
      // Bounded (r22, ADVICE): drop entries owned by STOPPED sessions on
      // every access, so a long-lived multi-session driver cannot pin
      // dead sessions' plans + file indexes forever. Within a live
      // session the entries stay for the JVM's lifetime — dataset dirs
      // are immutable for a process (TESTDATA contract), so staleness
      // cannot arise. TablesSpec pins the sweep.
      memo.filterInPlace { case ((s, _, _), _) => !s.sparkContext.isStopped }
      memo.getOrElseUpdate((spark, sfDir, name), {
        // events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
        // reader rejects; read it as a raw nanosecond long instead
        // (queries bucket it arithmetically, which matches DuckDB's
        // native-ns date_trunc).
        if (name == "events")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/$name.parquet")
        if (name == "events") normalizeEventTs(spark, df) else df
      })
    }

  /** The `events.ts` column arrives in two physical shapes depending on
    * how the driver generated the parquet: TIMESTAMP(NANOS) — which the
    * nanosAsLong legacy conf surfaces as a raw epoch-ns BIGINT — or
    * TIMESTAMP(MICROS), surfaced as TIMESTAMP_NTZ (or plain TIMESTAMP if
    * written UTC-adjusted). Every query in the registry (and every DuckDB
    * oracle, via `epoch_us(ts)`) assumes the engine-wide convention
    * ts = epoch NANOSECONDS as BIGINT, so normalize the µs shapes up to
    * it here, at the single read boundary shared by batch
    * ([[load]]) and streaming ([[graft.streaming.EventStream]]).
    *
    * Timezone-independent by construction (no session-conf mutation):
    * the NTZ wall clock is a UTC instant in this data, and
    * `timestampdiff` between two NTZ values is pure wall-clock
    * arithmetic — no zone is ever consulted, so there is no
    * ambiguous-wall-clock hazard (a zone round-trip via
    * convert_timezone+cast would silently shift instants landing in a
    * DST fall-back overlap hour). The plain-TIMESTAMP shape is already
    * an instant — `unix_micros` on it never consults the zone either. */
  def normalizeEventTs(spark: SparkSession, df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts) " +
              "* cast(1000 as bigint)"))
      case _ =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "unix_micros(cast(ts as timestamp)) * cast(1000 as bigint)"))
    }

  /** Register all tables of `sfDir` as temp views (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => load(spark, sfDir, n).createOrReplaceTempView(n) }
}
