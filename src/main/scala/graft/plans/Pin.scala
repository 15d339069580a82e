package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cluster-survivable single-materialization pin for multi-consumer
  * intermediates (q145's supplier-grain aggregate, q151's customer-grain
  * RFM relation, dedup_semantic's cell assignment).
  *
  * Why not localCheckpoint(true)? It stores blocks on executors with NO
  * lineage — the right call for iterative plans that must truncate
  * (label propagation), but on a real cluster a single executor loss
  * makes every downstream consumer unrecoverable. persist(
  * MEMORY_AND_DISK) gives the same build-once effect (the eager count()
  * materializes the cache before any consumer plans against it) while
  * keeping the logical plan: a lost block is recomputed from lineage,
  * and memory pressure SPILLS the blocks to disk instead of evicting
  * them — which also closes the bench-host hypothesis where an evicted
  * memoized frame is silently recomputed once per consumer per rep.
  *
  * The CacheManager keys the entry by canonicalized plan, so repeated
  * invocations of the same query in one session (bench reps, Verify +
  * specs in one JVM) share one cache entry instead of stacking blocks.
  * All pinned frames here are dimension-sized (suppliers, customers,
  * vectors) — bytes to low MB, never fact-table scale.
  */
object Pin {
  /** r16: the pin is LAZY — persist() alone registers the
    * InMemoryRelation every consumer plans against; the blocks fill
    * when the first consumer computes, so the dedicated count() job
    * (one per pin site, 14 sites) and its extra pass are gone. The
    * build-once effect is unchanged: later consumers read the cache,
    * and the CacheManager's per-partition locking keeps a concurrent
    * first-compute single.
    */
  def pinned(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }
}
