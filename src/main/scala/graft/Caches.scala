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
  *
  * Tracking is per-thread: a query's plan is built and consumed on one
  * caller thread, so scoping the registry with a ThreadLocal means two
  * queries running concurrently in one JVM (parallel test suites, a
  * multithreaded driver) cannot drain each other's persists mid-plan.
  */
object Caches {
  private val tracked =
    ThreadLocal.withInitial[java.util.ArrayDeque[DataFrame]](() => new java.util.ArrayDeque[DataFrame]())

  /** Persist `df` (default MEMORY_AND_DISK) and register it for the next
    * [[drain]]. Returns `df` for chaining.
    */
  def persistTracked(df: DataFrame): DataFrame = { df.persist(); register(df) }

  /** Register an already-persisted frame for the next [[drain]]. */
  def register(df: DataFrame): DataFrame = { tracked.get.add(df); df }

  /** Unpersist every frame tracked on the calling thread. Call after the
    * consuming action — the parquet write, collect, or count that
    * materializes the query result — on the same thread that built the plan.
    */
  def drain(): Unit = {
    val q = tracked.get
    var df = q.poll()
    while (df != null) { df.unpersist(); df = q.poll() }
  }
}
