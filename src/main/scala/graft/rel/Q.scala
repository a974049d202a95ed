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

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Exact 2-decimal view of a money/quantity double. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def dbl(c: Column): Column = c.cast(DoubleType)
}
