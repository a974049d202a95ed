package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range joins (no reference analogue; standard event-pipeline
  * primitive: "right rows within a window before each left row").
  *
  * Two formulations:
  *  - **With an equi key** (the common case): a plain join on the key with
  *    the interval as an extra condition — Spark executes it as a
  *    hash/sort-merge join on the key and post-filters the interval; one
  *    shuffle per side. This is what [[graft.stream.QueriesF]] f8 uses.
  *  - **Without an equi key** a naive inequality join is a nested-loop
  *    cross product. [[binnedIntervalJoin]] manufactures an equi key by
  *    binning timestamps to window-sized buckets: each left row joins its
  *    own and the previous bin (any right row within `window` of a left
  *    row lands in one of the two), then the exact interval filters. Turns
  *    O(n·m) into shuffle-bounded equi-join work — the standard trick for
  *    temporal joins at 100 TB.
  */
object RangeJoin {

  /** left ⋈ right where `rightTs ∈ (leftTs − windowSec, leftTs]` (half-open:
    * a right row exactly windowSec before the left row is excluded — see the
    * `>` in the interval filter and the matching assertion in ApiSpec), no
    * equi key. Columns of both inputs must be disjoint.
    */
  def binnedIntervalJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, windowSec: Long): DataFrame = {
    val lSec: Column = unix_micros(col(leftTs).cast("timestamp")) / lit(1000000L)
    val rSec: Column = unix_micros(col(rightTs).cast("timestamp")) / lit(1000000L)
    // left explodes into its bin and the one before; right keeps one bin
    val l = left
      .withColumn("_bin", explode(array(
        floor(lSec / windowSec), floor(lSec / windowSec) - 1)))
    val r = right.withColumn("_bin", floor(rSec / windowSec))
    l.join(r, Seq("_bin"))
      .filter(col(rightTs) <= col(leftTs) &&
        col(rightTs) > col(leftTs) - expr(s"INTERVAL $windowSec SECONDS"))
      .drop("_bin")
  }
}
