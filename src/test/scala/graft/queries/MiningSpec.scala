package graft.queries

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 mining operators (q66-q72): result invariants plus the plan
  * shapes the 100 TB design depends on.
  */
class MiningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("mining-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def run(q: String) = SparkEntry.queries(q)(spark, dir)
  private def plan(q: String): String =
    run(q).queryExecution.executedPlan.toString

  test("q66 funnel: stages monotone, lags non-negative, one row per viewer") {
    val rows = run("q66_event_funnel").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "one row per user")
    rows.foreach { r =>
      val stage = r.getInt(1)
      assert(stage >= 1 && stage <= 3)
      // stage implies which lags are present; present lags are > 0 (strict after)
      assert((stage >= 2) == !r.isNullAt(2), s"stage=$stage click lag null mismatch")
      assert((stage == 3) == !r.isNullAt(3), s"stage=$stage purchase lag null mismatch")
      if (!r.isNullAt(2)) assert(r.getLong(2) > 0)
      if (!r.isNullAt(3)) assert(r.getLong(3) > 0)
    }
  }

  test("q67 boilerplate: global top-k plans as TakeOrderedAndProject") {
    val p = plan("q67_boilerplate_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
    run("q67_boilerplate_ngrams").collect().foreach(r => assert(r.getLong(1) >= 4))
  }

  test("q68 temperature mix: weights sum to 1, epochs flatten the skew") {
    val rows = run("q68_temperature_mix").collect()
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum $wsum")
    // temperature < 1 upweights small sources: smallest source gets the
    // largest epochs multiplier
    val byTok = rows.sortBy(_.getLong(1))
    assert(byTok.head.getDouble(3) >= byTok.last.getDouble(3))
  }

  test("q69 rare-word: scoring pass is scan-local (explode only in the vocab subtree)") {
    val p = plan("q69_rare_word_ratio")
    // exactly ONE Generate — the in-plan top-10 vocab wordcount; the
    // scoring side is a scan + count_in against the 1-row broadcast
    assert("Generate".r.findAllIn(p).length == 1,
      s"only the vocab subtree may explode tokens\n$p")
    assert(p.contains("count_in"), p)
    run("q69_rare_word_ratio").collect().foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q70 ann recall: bounded by 1, hits consistent with recall") {
    val rows = run("q70_ann_recall").collect()
    assert(rows.length == 10, "one row per query vector")
    rows.foreach { r =>
      val hits = r.getLong(1)
      assert(hits >= 0 && hits <= 5)
      assert(math.abs(r.getDouble(2) - hits / 5.0) < 1e-9)
    }
  }

  test("q71 retention: cohorts partition the user base") {
    val rows = run("q71_retention_cohorts").collect()
    val users = rows.map(_.getLong(1)).sum
    assert(users == 15, s"cohorts must cover all 15 users, got $users")
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("q72 anomalies: stats side broadcast, fact side not shuffled") {
    val p = plan("q72_value_anomalies")
    assert(p.contains("BroadcastHashJoin"), p)
    run("q72_value_anomalies").collect().foreach(r =>
      assert(math.abs(r.getDouble(3)) >= 3.0 - 0.02, s"z=${r.getDouble(3)}"))
  }

  test("q73 passage dedup: fractions bounded, dup count <= passages") {
    val rows = run("q73_passage_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val f = r.getDouble(3)
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q74 source drift: KL non-negative (Gibbs) for every source") {
    val rows = run("q74_source_drift").collect()
    assert(rows.nonEmpty)
    // smoothing perturbs p and q slightly: allow rounding-level slack
    rows.foreach(r => assert(r.getDouble(2) >= -1e-6, s"KL ${r.getDouble(2)}"))
  }

  test("q75 packing: bins contiguous per shard, tokens conserved") {
    val rows = run("q75_sequence_pack").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (key, bins) =>
      val ids = bins.map(_._3).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1,
        s"$key bins not contiguous: ${ids.toSeq}")
    }
    // packing must not create or drop tokens: per-source bin totals equal
    // an independent word count over the raw table
    val packed = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "size(split(text, ' ', -1)) AS nw")
      .groupBy("source").sum("nw").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == direct, s"token totals diverge: $packed vs $direct")
  }

  test("q76 bm25: top-k plans as TakeOrderedAndProject, scores descending") {
    val p = plan("q76_bm25")
    assert(p.contains("TakeOrderedAndProject"), p)
    val scores = run("q76_bm25").collect().map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "scores must be descending")
    assert(scores.forall(_ >= 0.0))
  }

  test("q77 curriculum: 4 phases per source, phase 1 most predictable") {
    val rows = run("q77_curriculum").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (src, phases) =>
      assert(phases.map(_._2).toSet.subsetOf(Set(1, 2, 3, 4)))
      // ntile orders by mean_logp DESC: phase 1's summary log-prob is
      // the highest (least negative)
      val byPhase = phases.sortBy(_._2).map(_._4)
      assert(byPhase.zip(byPhase.tail).forall { case (a, b) => a >= b },
        s"$src phases not monotone: ${byPhase.toSeq}")
    }
  }

  test("q78 pivot: explicit value list avoids the distinct-scan job; counts conserve") {
    val df = run("q78_pivot")
    assert(df.columns.toSeq == Seq("user_id", "view", "click", "purchase", "signup", "error"))
    val total = df.collect().map(r => (1 to 5).map(r.getLong).sum).sum
    val events = spark.read.parquet(s"$dir/events.parquet").count()
    assert(total == events, s"pivot cells must sum to all events: $total != $events")
  }

  test("q81 entropy: bounded by ln(n_words), scan-local (no shuffle before sort)") {
    run("q81_token_entropy").collect().foreach { r =>
      val h = r.getDouble(2)
      // output is rounded to 6dp, which can land just above the bound
      assert(h >= 0.0 && h <= math.log(r.getInt(1).toDouble) + 1e-6,
        s"entropy $h out of [0, ln(${r.getInt(1)})]")
    }
    val p = plan("q81_token_entropy")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 0, s"entropy scoring must not hash-shuffle\n$p")
  }

  test("q82 collocations: pair support never exceeds either word's doc freq") {
    val rows = run("q82_collocations").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= 25))
  }

  test("q66/q79: events scans are column-pruned (no props/value where unused)") {
    // q66 needs only user_id, event_type, ts
    val p66 = plan("q66_event_funnel")
    assert(!p66.contains("props"), "q66 must not read props")
    assert(!p66.contains("value"), "q66 must not read value")
    // q79 needs value but not props
    val p79 = plan("q79_range_window")
    assert(!p79.contains("props"), "q79 must not read props")
  }

  test("q66 funnel plan: stage joins reuse the user_id partitioning") {
    // the three per-stage aggregates and both outer joins key on user_id;
    // beyond the three scan-side aggregate exchanges and the final sort,
    // no extra join exchange may appear
    val p = plan("q66_event_funnel")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 5, s"expected <=5 hash exchanges, got $exchanges\n$p")
  }
}
