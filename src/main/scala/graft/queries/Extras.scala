package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining SURVEY §2B scalar-function families (json / math / array)
  * plus a skew-handling join pattern. */
object Extras {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---- JSON extraction over the events props column ----
    QueryDef.sql(
      "q25_json",
      """SELECT json_extract_string(props, '$.k') AS k,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |GROUP BY 1
        |ORDER BY CAST(k AS INT)""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").as("k"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("k").cast("int"))
    },

    // ---- math scalar functions ----
    QueryDef.sql(
      "q26_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 4) AS root,
        |  round(pow(l_discount + 1, 3), 6) AS cubed,
        |  round(ln(l_extendedprice), 6) AS logp,
        |  CAST(ceil(l_quantity / 7) AS BIGINT) AS bucket,
        |  abs(l_quantity - 25) AS dist25
        |FROM lineitem
        |WHERE l_quantity > 47
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 47)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("root"),
          round(pow(col("l_discount") + 1, 3), 6).as("cubed"),
          round(log(col("l_extendedprice")), 6).as("logp"),
          ceil(col("l_quantity") / 7).cast("long").as("bucket"),
          abs(col("l_quantity") - 25).as("dist25"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- array functions over the embedding column ----
    QueryDef.sql(
      "q27_array_funcs",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 6) AS head_sum,
        |  round(list_max(list_transform(embedding, x -> x::DOUBLE)), 6) AS vmax,
        |  round(list_min(list_transform(embedding, x -> x::DOUBLE)), 6) AS vmin
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(expr(
            "aggregate(slice(embedding, 1, 8), CAST(0 AS double), (a, x) -> a + CAST(x AS double))"),
            6).as("head_sum"),
          round(expr("CAST(array_max(embedding) AS double)"), 6).as("vmax"),
          round(expr("CAST(array_min(embedding) AS double)"), 6).as("vmin"))
        .orderBy("vec_id")
    },

    // ---- sketches: HyperLogLog++ approximate distinct counts. No DuckDB
    //      oracle (sketch implementations differ across engines) → the
    //      driver records a rows-only check; the machine-checked gate is
    //      the ε-tolerance ENFORCED inside the query: the exact counts
    //      bound the sketch, and |approx−exact|/exact > ε raises — a
    //      sketch regression turns the rows-only check into a hard
    //      failure instead of passing on row count alone. ----
    QueryDef.rowsOnly("q29_approx_distinct") { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val approx = li.agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("apx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("apx_orders"))
      // exact guards as two pruned single-column distincts (the q10
      // lesson: one agg with both would plan as Expand, 2x every row)
      val exact = li.agg(countDistinct(col("l_partkey")).as("ex_parts"))
        .crossJoin(li.agg(countDistinct(col("l_orderkey")).as("ex_orders")))
      val partsOk = abs(col("apx_parts") - col("ex_parts")) * 1.0 / col("ex_parts") < 0.05
      val ordersOk = abs(col("apx_orders") - col("ex_orders")) * 1.0 / col("ex_orders") < 0.05
      approx.crossJoin(exact)
        .select(col("apx_parts"), col("ex_parts"), col("apx_orders"), col("ex_orders"),
          when(partsOk, lit(true)).otherwise(raise_error(concat(
            lit("q29 HLL parts estimate outside 5% of exact: apx="),
            col("apx_parts").cast("string"), lit(" exact="), col("ex_parts").cast("string"))))
            .as("parts_within_5pct"),
          when(ordersOk, lit(true)).otherwise(raise_error(concat(
            lit("q29 HLL orders estimate outside 5% of exact: apx="),
            col("apx_orders").cast("string"), lit(" exact="), col("ex_orders").cast("string"))))
            .as("orders_within_5pct"))
    },

    // ---- sketches, oracle-checkable: KMV (k-minimum-values) distinct
    //      estimate over a deterministic md5-derived 52-bit hash. Unlike
    //      HLL (q29) the whole computation is engine-independent, so the
    //      DuckDB oracle reproduces the estimate bit-for-bit: it ranks
    //      the same distinct hashes and reads the same k-th smallest.
    //      Scale shape: the native kmv_sketch aggregate keeps ≤k longs of
    //      state per group, partials merge by union+truncate — map-side
    //      combine reduces every partition to ≤k longs per group before
    //      the ONE shuffle (collect_set would ship every distinct value).
    //      Estimator (Bar-Yossef et al.): (k-1) * 2^52 / h_k; exact count
    //      when fewer than k distinct hashes exist. ----
    QueryDef.sql(
      "q89_kmv_distinct",
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 13))::BIGINT AS hv
        |  FROM events WHERE user_id IS NOT NULL
        |), r AS (
        |  SELECT event_type, hv,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM h)
        |SELECT event_type,
        |  round(CASE WHEN max(n) < 32 THEN max(n)::DOUBLE
        |        ELSE 31::DOUBLE * 4503599627370496::DOUBLE /
        |             max(CASE WHEN rk = 32 THEN hv END) END, 4) AS kmv_users
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      t(s, dir, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(col("event_type"))
        .agg(expr(
          "kmv_sketch(cast(conv(substring(md5(cast(user_id as string)), 1, 13), 16, 10) as bigint), 32)")
          .as("sk"))
        .select(col("event_type"),
          round(when(col("sk.n") < 32, col("sk.n").cast("double"))
            .otherwise(lit(31.0) * lit(4503599627370496.0) / col("sk.kth")), 4)
            .as("kmv_users"))
        .orderBy("event_type")
    },

    // ---- skew-handling: salted aggregation-join. The salt spreads a hot
    //      key across 8 shuffle partitions before the final combine; the
    //      oracle states the logically-identical unsalted form. ----
    QueryDef.sql(
      "q28_salted_agg",
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      // two-phase salted aggregation: (key, salt) partial -> key final;
      // result identical, hot keys spread 8-ways in the first shuffle
      t(s, dir, "orders")
        .withColumn("salt", pmod(col("o_orderkey"), lit(8)))
        .groupBy(col("o_custkey"), col("salt"))
        .agg(count(lit(1)).as("pn"), sum(col("o_totalprice")).as("ps"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("pn")).as("n_orders"), round(sum(col("ps")), 2).as("spend"))
        .orderBy("o_custkey")
    },

    // ---- exact order statistics: per-language document-length
    //      quantiles (the distribution-stats pass every corpus report
    //      starts with). Spark `percentile` and DuckDB `quantile_cont`
    //      share the same definition — linear interpolation at rank
    //      p·(n-1) — so the values agree exactly; both are rounded to
    //      4dp anyway so an interpolation ulp cannot flip the hash.
    //
    //      Scale shape: Spark's exact percentile aggregates a
    //      value→count map per group (NOT the raw rows) — memory is
    //      bounded by the DISTINCT length cardinality, which for a
    //      bounded integer like n_chars stays small at any corpus
    //      size, and the map merges map-side like any partial agg. For
    //      genuinely unbounded-cardinality columns the 100 TB path is
    //      `approx_percentile` (t-digest, fixed-size sketch) — same
    //      plan shape, sketch instead of map. ----
    QueryDef.sql(
      "q93_length_quantiles",
      """SELECT lang, count(*) AS n_docs,
        |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
        |  round(quantile_cont(n_chars, 0.5),  4) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 4) AS p75,
        |  round(quantile_cont(n_chars, 0.9),  4) AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(n_chars, 0.25)"), 4).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 4).as("p50"),
          round(expr("percentile(n_chars, 0.75)"), 4).as("p75"),
          round(expr("percentile(n_chars, 0.9)"), 4).as("p90"))
        .orderBy("lang")
    })
}
