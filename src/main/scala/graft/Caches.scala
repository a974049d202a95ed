package graft

import org.apache.spark.sql.DataFrame

/** Registry for persisted intermediates whose lifetime is "until the
  * current query's result is materialized".
  *
  * Operators like the banded-LSH digest relation, the connected-components
  * label fixpoint, and the IVF training set must stay cached while the
  * caller consumes the returned lazy plan (unpersisting inside the operator
  * would force a full lineage recompute at the consuming action). But they
  * must not outlive that consumption either: e17/e19/e20 each build their
  * own digest caches, so a bench or driver run that never cleans up stacks
  * a new set of cached relations per query for the life of the session.
  *
  * Contract: operators register what they persist via [[persistTracked]] /
  * [[register]]; the per-query harnesses (Verify, Bench, and the smoke
  * sweep) call [[drain]] after each query's result is fully materialized.
  * Tests that call tracked operators directly may skip draining — their
  * sf0.001 caches are tiny and die with the suite JVM.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (default MEMORY_AND_DISK) and register it for the next
    * [[drain]]. Returns `df` for chaining.
    */
  def persistTracked(df: DataFrame): DataFrame = { df.persist(); register(df) }

  /** Register an already-persisted frame for the next [[drain]]. */
  def register(df: DataFrame): DataFrame = { tracked.add(df); df }

  /** Unpersist every tracked frame. Call after the consuming action — the
    * parquet write, collect, or count that materializes the query result.
    */
  def drain(): Unit = {
    var df = tracked.poll()
    while (df != null) { df.unpersist(); df = tracked.poll() }
  }
}
