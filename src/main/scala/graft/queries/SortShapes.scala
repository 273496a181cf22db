package graft.queries

import graft.CacheRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Terminal-sort shape for scan-local kernel queries (the q30 family).
  *
  * A terminal global ORDER BY range-samples its child, so whatever sits
  * below the exchange executes TWICE (the partitioner's sampling pass +
  * the shuffle's map pass). Round 21 avoided the double kernel by
  * sorting the raw (doc_id, text) scan and deriving above the Sort —
  * but that ships the full corpus text through the range exchange for
  * queries whose output is a few numbers per document (guide §2.3:
  * shuffle fewer bytes — exactly wrong at 100 TB, where the terminal
  * sort would move the corpus over the network to order a handful of
  * derived columns).
  *
  * This shape gets both properties: derive the narrow output first,
  * persist it — ONE materialization: the range sampler's pass populates
  * the cache, the shuffle's map pass reads it back — and sort the
  * narrow rows. The kernel runs once AND the exchange carries only the
  * derived columns.
  *
  * The persist is registered with [[CacheRegistry]], so every
  * bench/verify run releases and rebuilds it inside its own timed
  * region — nothing is cached across runs.
  */
object SortShapes {
  /** Sort `derived` (already projected down to the narrow output
    * columns) by `keys`, materializing it once so the range sampler
    * does not re-execute the derivation: the sampling pass BUILDS the
    * cache, the shuffle's map pass reads it back.
    *
    * `persist` rather than `localCheckpoint`, deliberately (both were
    * measured, r22): an eager checkpoint runs the kernel at DataFrame
    * CONSTRUCTION (breaking the lazy-construction contract PlanSpec
    * pins), and any checkpoint — eager or lazy — collapses the plan to
    * an opaque `Scan ExistingRDD`, hiding the kernel, the pruned
    * ReadSchema and the partial aggregates from every plan dump the
    * optimization evidence rests on. The cache's columnar encode costs
    * ~60-100 ms per query at sf0.1 over checkpoint row blocks
    * (family sum 6.97 s vs 6.51 s) — paid for keeping the plan
    * inspectable and construction lazy. */
  def sortedNarrow(derived: DataFrame, keys: String*): DataFrame =
    CacheRegistry.track(derived.persist())
      .orderBy(keys.map(col): _*)
}
