package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Shared helpers for the declared query inventory (SURVEY.md §2.4).
  *
  * Hash-determinism strategy (SURVEY.md §7.3 #2): the driver compares our
  * parquet output against DuckDB value-by-value, so every checked query must
  * be **bit-deterministic across engines**:
  *
  *  - Sums over doubles are order-dependent in the low bits ⇒ never sum raw
  *    doubles. The source doubles are 2-decimal values, so
  *    `CAST(x AS DECIMAL(18,2))` is exact; decimal sums are exact and
  *    order-independent; the final `CAST(sum AS DOUBLE)` is correctly
  *    rounded in both engines (same rational → same double).
  *  - Averages = `CAST(sum_dec AS DOUBLE) / count` — single IEEE division,
  *    exactly defined.
  *  - Every query ends in a total-order sort (ties broken by key columns).
  *  - Aggregate/computed columns carry identical aliases on both sides.
  *
  * This costs nothing at scale: decimal sum partial-aggregates exactly like
  * double sum (map-side combine, single shuffle of one buffer per group).
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  /** Source-table read, schema-memoized: the testdata corpus is
    * immutable for the session, so the footer-inference job
    * (`parquet at Q.scala`) only runs once per table — the profiler
    * showed every gate re-paying it per reference (r18 optimization).
    */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Caches.readParquetStableSchema(s, s"$dir/$name.parquet")

  /** Load the `events` table. Its `ts` is parquet TIMESTAMP(NANOS), which
    * Spark only reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set
    * in Verify/Bench/test sessions); the actual values are µs-precision, so
    * ns→µs truncation is lossless and matches DuckDB (whose TIMESTAMP is µs).
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _ => raw
    }
  }

  /** Run independent gate legs on driver threads (r18 optimization,
    * guide §2.6: actions are only sequential because the driver calls
    * them sequentially — overlapping independent legs lets each leg's
    * tail of small jobs back-fill the others' idle cores). Results come
    * back in `legs` order, so callers' unions/joins stay deterministic.
    * Only for legs that touch DISJOINT state (own dirs/tables).
    */
  def inParallel[A](legs: Seq[() => A]): Seq[A] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(legs.size, 4)))
    val ec = scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      // drain per-query tracked persists ON the leg's own thread (r19,
      // r18 verdict #5): Caches tracking is ThreadLocal and the harness
      // drains only the caller thread, so a leg that persistTracked's an
      // intermediate on a pool thread would otherwise leak it for the
      // session. Legs materialize their own results before returning
      // (the inParallel contract: disjoint state, serves folded inside
      // the leg), so draining here never forces a recompute.
      val fs = legs.map(l => scala.concurrent.Future(
        try l() finally graft.Caches.drain())(ec))
      fs.map(f => scala.concurrent.Await.result(f,
        scala.concurrent.duration.Duration.Inf))
    } finally { pool.shutdown(); () }
  }

  /** Exact 2-decimal view of a money/quantity double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Scale-safe top-K per group (adds `rank` 1..k, keeps only winners):
    * phase 1 ranks within each (group, scan-partition) slice — bounded by
    * the partition — and keeps local top-K, a SUPERSET of the global
    * top-K under any partitioning (a global winner is a winner of its own
    * partition a fortiori); phase 2 ranks the ≤ k·partitions survivors
    * per group (bounded by construction). A hot group never sorts on one
    * task, and the final ranks are defined by the total `order` alone —
    * independent of partitioning. `order` must be a total order (break
    * ties with a unique key) or ranks are nondeterministic.
    */
  def topKPerGroup(df: DataFrame, grp: String, k: Int,
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val local = Window.partitionBy(grp, "_pid").orderBy(order: _*)
    val global = Window.partitionBy(grp).orderBy(order: _*)
    df.withColumn("_pid", spark_partition_id())
      .withColumn("_lrn", row_number().over(local)).filter(col("_lrn") <= k)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= k)
      .drop("_pid", "_lrn")
  }
}
