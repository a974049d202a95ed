package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for each left row, the latest right row of the
  * same key with `rightTs <= leftTs`. The reference has no temporal
  * operators; this is the canonical event-enrichment primitive a pipeline
  * over the `events` table needs (attribute a purchase to the last prior
  * view, join a trade to the prevailing quote, …).
  *
  * Built by **composition** (preference tier (a) — no custom SparkPlan
  * needed): union both sides tagged, one hash-partition + sort per key,
  * then `last_value(…, ignoreNulls)` over the running window. Right rows
  * sort before left rows at equal timestamps, giving `<=` semantics.
  *
  * Scale: exactly one shuffle of each input (partition by key, sort by
  * (ts, tag)) — the same cost profile as a sort-merge join, with no
  * per-row subqueries and no skew beyond the key distribution itself
  * (salt hot keys upstream via [[Skew]] if needed). This is the standard
  * large-scale formulation; a dedicated SparkPlan would only save the
  * union's column padding.
  */
object AsOf {

  /** Inner as-of join. Output: left rows (original columns) + the matched
    * right row's columns (prefixed `asof_`); left rows with no match are
    * dropped (inner semantics, like DuckDB's ASOF JOIN).
    *
    * `direction`: "backward" (default) matches the LATEST right row with
    * `rightTs <= leftTs`; "forward" the EARLIEST right row with
    * `rightTs >= leftTs` (same single-shuffle plan — only the sort order
    * flips). `toleranceUs` drops a match farther than the given
    * event-time distance in microseconds (DuckDB/pandas `tolerance`
    * semantics): the nearest candidate is still the only candidate, so
    * tolerance is a post-filter, not a different plan.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be backward|forward, got $direction")
    val rStruct = struct(right.columns.toIndexedSeq.map(col): _*)
    // null event times carry no ordering information: SQL ASOF semantics
    // (p.ts >= NULL is never true) drop them — filter both sides up front
    // so a null-ts right row can't sort first and masquerade as a match
    val l = left.filter(col(leftTs).isNotNull)
      .withColumn("_ts", col(leftTs)).withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(right.select(rStruct).schema.head.dataType))
    val r = right.filter(col(rightTs).isNotNull).select(
      col(key), col(rightTs).as("_ts"), lit(0).as("_tag"), rStruct.as("_r"))
    val rPadded = l.columns.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select(l.columns.toIndexedSeq.map(col): _*)

    // _r as the final sort key makes ties among equal-ts right rows
    // deterministic (struct comparison by field order); forward mode
    // reverses the time sort so "last prior" becomes "last following
    // scanned in reverse" = earliest following
    val tsOrder = if (direction == "backward") col("_ts").asc else col("_ts").desc
    val w = Window.partitionBy(col(key)).orderBy(tsOrder, col("_tag"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rPadded)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1 && col("_match").isNotNull)

    val withinTol = toleranceUs match {
      case None => matched
      case Some(tol) =>
        val gap =
          if (direction == "backward")
            unix_micros(col("_ts").cast("timestamp")) -
              unix_micros(col(s"_match.$rightTs").cast("timestamp"))
          else
            unix_micros(col(s"_match.$rightTs").cast("timestamp")) -
              unix_micros(col("_ts").cast("timestamp"))
        matched.filter(gap <= tol)
    }
    val rightOut = right.columns.map(c => col(s"_match.$c").as(s"asof_$c"))
    withinTol.select(left.columns.toIndexedSeq.map(col) ++ rightOut: _*)
  }
}
