package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Cache lifecycle helper for the pipeline operators.
  *
  * The dedup/similarity operators persist small intermediates (shingle
  * tables, signatures, packed bitsets) because projection collapse
  * would otherwise inline their interpreted hash pipelines into every
  * consumer. Left cached, those blocks accumulate in a long-lived
  * server until memory pressure evicts them. The contract: an operator
  * that persists an intermediate eagerly materializes its own
  * (orders-of-magnitude smaller) result and releases the intermediate
  * before returning — no operator leaks a cacheManager entry past its
  * return. CachingSpec asserts the cache is empty after every pipeline
  * query materializes.
  */
private[graft] object Caching {

  /** When true, [[materializeAndRelease]] returns the lazy plan
    * unchanged (and releases nothing) — plan-inspection mode for
    * `graft.Plans` and plan-shape tests, because localCheckpoint
    * otherwise collapses every documented operator plan to a
    * `Scan ExistingRDD` of the result. Only for short-lived
    * documentation/test processes: caches are never released. */
  @volatile private[graft] var inspectLazyPlans = false

  /** Materialize `result` eagerly — `localCheckpoint` runs the plan
    * once and truncates lineage to a LogicalRDD, whose blocks the
    * ContextCleaner reaps once the plan is unreferenced (unlike
    * cacheManager entries, which live until explicit unpersist) — then
    * release the cached intermediates it consumed. */
  def materializeAndRelease(result: DataFrame, cached: DataFrame*): DataFrame =
    if (inspectLazyPlans) result
    else {
      val out = result.localCheckpoint(true)
      cached.foreach(_.unpersist())
      out
    }
}
