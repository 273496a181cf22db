package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list, by iterative min-label
  * propagation — the dedup-clustering step of a training-data pipeline:
  * near-duplicate PAIRS (from MinHash/SimHash/embedding LSH) become
  * CLUSTERS, and a pipeline keeps one canonical document per cluster.
  *
  * Spark has no built-in graph operator; the idiomatic distributed shape
  * is a loop of (join edges→labels, union, groupBy min) — each iteration
  * is one shuffle join + one shuffle aggregate, and the iteration count
  * is the graph diameter (near-dup graphs are shallow: clusters are
  * cliques or short chains, so a handful of rounds converge). Lineage is
  * cut with lazy `localCheckpoint`s every round so the plan does not
  * grow exponentially, while convergence detection (a label-sum compare)
  * shares the materializing job. The loop only runs when the CONTRACTED
  * root graph exceeds [[DriverSolveEdgeLimit]]; below it the residual is
  * solved exactly on the driver (a bounded sync — see [[label]]). For
  * billion-node graphs the same loop holds — swap min-propagation for
  * the large-star/small-star variant if diameters ever get deep.
  *
  * Determinism: the min-label fixpoint is unique regardless of join or
  * iteration order, so results hash-match a DuckDB recursive-CTE oracle.
  */
object ConnectedComponents {

  /** Open-addressing long→long map (linear probing, power-of-two
    * capacity) for the per-partition union-find: a boxed
    * java.util.HashMap costs ~60 B/entry where this costs 16, which at
    * the default 128 MB edge partitions (~8M edges → up to 16M nodes) is
    * the difference between ~1 GB and ~360 MB of executor heap. */
  private final class LongLongMap(initialCapacity: Int = 1 << 16) {
    private var cap = Integer.highestOneBit(math.max(initialCapacity, 16) * 2 - 1)
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var n = 0
    private def idx(k: Long): Int = {
      var i = (java.lang.Long.hashCode(k * -7046029254386353131L)) & (cap - 1)
      while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
      i
    }
    def getOrElse(k: Long, dflt: Long): Long = {
      val i = idx(k); if (used(i)) vals(i) else dflt
    }
    def contains(k: Long): Boolean = used(idx(k))
    def put(k: Long, v: Long): Unit = {
      val i = idx(k)
      if (!used(i)) {
        used(i) = true; keys(i) = k; n += 1
        if (n * 4 > cap * 3) grow()
      }
      val j = idx(k) // grow() may have moved the slot
      keys(j) = k; vals(j) = v; used(j) = true
    }
    private def grow(): Unit = {
      val ok = keys; val ov = vals; val ou = used
      cap *= 2; keys = new Array[Long](cap); vals = new Array[Long](cap)
      used = new Array[Boolean](cap)
      var i = 0
      while (i < ok.length) {
        if (ou(i)) { val j = idx(ok(i)); used(j) = true; keys(j) = ok(i); vals(j) = ov(i) }
        i += 1
      }
    }
    def foreachEntry(f: (Long, Long) => Unit): Unit = {
      var i = 0
      while (i < cap) { if (used(i)) f(keys(i), vals(i)); i += 1 }
    }
    def size: Int = n
  }

  /** Edge list (a, b) → (node, comp) where comp = min node id of the
    * component. Only nodes appearing in edges are labeled; node ids must
    * be integral (they are cast to long). Expects a DEDUPED undirected
    * edge list (each pair once, either orientation) — duplicates stay
    * correct but inflate the contraction input.
    *
    * Two phases, the standard scalable CC shape (GraphX / Kiveris et al
    * "CC in MapReduce and beyond"):
    *
    *  1. **Partition-local contraction**: each edge partition is solved
    *     exactly with an in-memory union-find (`mapPartitions` — genuine
    *     per-partition imperative logic), emitting (node → local root).
    *     Every edge collapses inside its own partition; the only residual
    *     structure is nodes seen by several partitions with different
    *     local roots. This removes the graph's intra-partition diameter
    *     entirely — the #1 cost of pure label propagation on chain-heavy
    *     near-dup graphs — at the price of O(nodes-per-partition) executor
    *     memory (16 B/node via the primitive map above; size
    *     `spark.sql.files.maxPartitionBytes` accordingly).
    *  2. **Global loop on the contracted root graph** (per shared node:
    *     star edges min-root ↔ other roots), which is orders of magnitude
    *     smaller than the input and has near-clique shape, so the
    *     hop+jump rounds below converge in O(log diameter) global
    *     barriers — at 1000 executors, barrier count is the cost that
    *     matters.
    *
    * Final labels compose the two: comp(v) = loop-comp of v's minimal
    * local root (contraction preserves components, so the fixpoint is
    * still the unique per-component min node id). */
  /** Contracted-graph edge budget for the exact driver union-find
    * below: 2^18 edges ≈ 4 MB of longs — the q56/q97 bounded-driver-
    * sync discipline. Past it, the distributed hop+jump loop runs. */
  private[operators] val DriverSolveEdgeLimit = 1 << 18

  def label(edges: DataFrame, maxIters: Int = 30,
      driverSolveEdgeLimit: Int = DriverSolveEdgeLimit): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // the edge pipeline feeds EXACTLY ONE consumer (the contraction,
    // whose grouped output is eagerly checkpointed below), so it is read
    // once with or without its own checkpoint — the previous eager
    // localCheckpoint here materialized the full edge list in a separate
    // job for nothing
    val e = edges.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)]
    val roots = e.mapPartitions { it =>
      val parent = new LongLongMap()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (c != r) { val nx = parent.getOrElse(c, c); parent.put(c, r); c = nx }
        r
      }
      it.foreach { case (a, b) =>
        // every endpoint must own an entry — roots are found-not-stored,
        // and an unstored node would vanish from the emitted mapping
        if (!parent.contains(a)) parent.put(a, a)
        if (!parent.contains(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        // min-link keeps the root the smallest local member, so local
        // roots are component members (needed for phase-2 composition)
        if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
      }
      val out = Array.newBuilder[(Long, Long)]
      out.sizeHint(parent.size)
      parent.foreachEntry((k, _) => out += ((k, find(k))))
      out.result().iterator
    }.toDF("node", "root")
    // one row per node: minimal root + every distinct root this node got
    // across partitions (the residual cross-partition structure)
    val grouped = roots.groupBy("node")
      .agg(min(col("root")).as("mr"), collect_set(col("root")).as("rs"))
      .localCheckpoint()
    graft.CacheRegistry.trackCheckpoint(grouped)
    val cEdges = grouped
      .select(col("mr").as("a"), explode(col("rs")).as("b"))
      .where(col("a") =!= col("b"))
    // The contracted root graph is orders of magnitude smaller than the
    // input (only nodes seen by SEVERAL partitions with different local
    // roots survive). Up to DriverSolveEdgeLimit edges it is solved
    // EXACTLY on the driver with the same union-find — one small collect
    // replaces the loop's per-round global barriers and convergence-sum
    // jobs (the q56-centroid/q97-node-count bounded-sync discipline; the
    // fixpoint is the same unique per-component min either way). The
    // limit+1 collect is itself the gate: an oversized result falls back
    // to the distributed hop+jump loop, so scale safety is unchanged.
    val sample = cEdges.limit(driverSolveEdgeLimit + 1).collect()
    val cLab =
      if (sample.length <= driverSolveEdgeLimit) {
        val parent = new LongLongMap()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x
          while (c != r) { val nx = parent.getOrElse(c, c); parent.put(c, r); c = nx }
          r
        }
        sample.foreach { row =>
          val a = row.getLong(0); val b = row.getLong(1)
          if (!parent.contains(a)) parent.put(a, a)
          if (!parent.contains(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra) else if (rb < ra) parent.put(ra, rb)
        }
        val out = Seq.newBuilder[(Long, Long)]
        out.sizeHint(parent.size)
        parent.foreachEntry((k, _) => out += ((k, find(k))))
        out.result().toDF("cn", "comp")
      } else loopLabel(cEdges, maxIters)
        .select(col("node").as("cn"), col("comp"))
    grouped.join(cLab, grouped("mr") === cLab("cn"), "left")
      .select(grouped("node"),
        coalesce(col("comp"), col("mr")).as("comp"))
  }

  /** Distributed min-label fixpoint over an (a, b) edge list — the
    * phase-2 loop; see [[label]] for the full operator. */
  private def loopLabel(edges: DataFrame, maxIters: Int): DataFrame = {
    // LAZY checkpoints throughout the loop: the convergence sum is the
    // materializing action, so each round (and the init) costs ONE Spark
    // job instead of an eager-checkpoint job plus a probe job
    val e = graft.CacheRegistry.trackCheckpoint(
      edges.select(col("a"), col("b")).localCheckpoint(eager = false))
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
    // init ∘ hop 1 in one aggregate: comp = min(self, neighbors)
    var labels = sym.groupBy(col("a").as("node"))
      .agg(least(col("node"), min(col("b"))).as("comp"))
      .localCheckpoint(eager = false)
    graft.CacheRegistry.trackCheckpoint(labels)
    // decimal(38) sum: node ids × node count can brush the long range
    def compSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = compSum(labels)
    // empty contracted graph (all edges collapsed inside one partition):
    // the aggregate over zero rows returns a null sum — nothing to iterate
    if (prevSum == null) return labels

    // one edge hop: comp(v) ← min over {v} ∪ N(v) of comp
    def step(l: DataFrame): DataFrame =
      sym.join(l, sym("b") === l("node"))
        .select(sym("a").as("node"), col("comp"))
        .union(l)
        .groupBy("node").agg(min("comp").as("comp"))

    // pointer jump: comp(v) ← comp(comp(v)). Every comp value is a node
    // id of the same component (min over a subset of members), so the
    // inner self-join is total. Each jump DOUBLES the distance a label
    // has travelled — alternating hop+jump+jump contracts chains
    // exponentially, so rounds = O(log diameter) instead of O(diameter):
    // on a long-chain near-dup graph this is the difference between 8
    // synchronization rounds and 3 (and at cluster scale, between 8
    // global barriers and 3).
    def jump(l: DataFrame): DataFrame = {
      val m = l.select(col("node").as("jn"), col("comp").as("jc"))
      l.join(m, l("comp") === m("jn"))
        .select(l("node"), col("jc").as("comp"))
    }

    var iter = 0
    var done = false
    while (!done && iter < maxIters) {
      // every per-node update is non-increasing (hop min includes self;
      // jump uses comp(u) ≤ u), so an unchanged sum ⇔ a full fixpoint,
      // and the fixpoint of hop is the unique per-component min label
      val prop = graft.CacheRegistry.trackCheckpoint(
        jump(jump(step(labels))).localCheckpoint(eager = false))
      val newSum = compSum(prop) // materializes the checkpoint in the same job
      labels = prop
      done = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    labels
  }

  /** q50: SimHash near-dup pairs (q37 semantics: banded 4×16-bit LSH,
    * Hamming ≤ 6) clustered into components; each involved doc reports
    * its cluster id (min doc_id of the component) and the component
    * size. Oracle: the same pairs via the q37 SQL, closed transitively
    * with a recursive CTE. */
  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q50_dedup_clusters",
      """WITH RECURSIVE w AS (
        |  SELECT doc_id, list_transform(string_split(text, ' '), w -> md5(w)) AS hs
        |  FROM documents
        |), bits AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, 63), b ->
        |      CASE WHEN list_sum(list_transform(hs, h ->
        |        2 * (((instr('0123456789abcdef', substr(h, (b // 4) + 1, 1)) - 1) >> (b % 4)) & 1) - 1
        |      )) > 0 THEN '1' ELSE '0' END) AS bl
        |  FROM w
        |), sh AS (
        |  SELECT doc_id, array_to_string(bl, '') AS simhash FROM bits
        |), bands AS (
        |  SELECT doc_id, simhash, j AS band, substr(simhash, 16*j + 1, 16) AS bh
        |  FROM sh, range(0, 4) t(j)
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS ha, b.simhash AS hb
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        |), pairs AS (
        |  SELECT doc_a, doc_b FROM cand
        |  WHERE len(list_filter(generate_series(1, 64),
        |          i -> substr(ha, i, 1) != substr(hb, i, 1))) <= 6
        |), edges AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |), reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        |SELECT a AS doc_id, least(a, min(b)) AS cluster_id,
        |  count(DISTINCT b) AS n_linked
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.VectorFunctions.register(s)
      // SimHash pairs exactly as q37 (same kernels, same band join);
      // persisted for the same reason as q37 — the band self-join would
      // otherwise run the per-word-md5 kernel once per side
      val shDf = graft.CacheRegistry.track(
        Tables.load(s, dir, "documents").select(col("doc_id"),
          expr("simhash64(md5_array(split(text, ' ')))").as("simhash"))
          .persist())
      val bands = shDf.select(col("doc_id"), col("simhash"),
        explode(expr(
          "transform(sequence(0, 3), j -> named_struct(" +
            "'band', j, 'bh', substring(simhash, 16*j + 1, 16)))")).as("b"))
        .select(col("doc_id"), col("simhash"), col("b.band").as("band"), col("b.bh").as("bh"))
      val a = bands.as("a")
      val b = bands.as("b")
      // hamming64 is a cheap codegen'd kernel: verify BEFORE the dedup so
      // the distinct shuffle carries two longs per row, not two 64-char
      // fingerprints (band-collision duplicates re-verify at most 3x)
      val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
        .where(expr("hamming64(a.simhash, b.simhash)") <= 6)
        .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
        .distinct()

      val labels = label(pairs)
      val sizes = labels.groupBy(col("comp")).agg(count(lit(1)).as("n_linked"))
      labels.join(sizes, "comp")
        .select(col("node").as("doc_id"), col("comp").as("cluster_id"), col("n_linked"))
        .orderBy("doc_id")
    })
}
