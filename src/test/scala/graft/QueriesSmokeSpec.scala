package graft

import org.scalatest.funsuite.AnyFunSuite

/** Umbrella: every declared query runs at sf0.001 and the driver contract
  * invariants hold (value-level correctness is the DuckDB oracle's job —
  * tools/compare.py at sf0.01).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  // Plan-shape allowlists + assertions live in graft.PlanPins, shared with
  // the at-scale post-AQE audit (graft.PlanAudit).

  for (q <- Seq("b16_exact_quantiles", "b20_window_ranks"))
    test(s"$q ranks over range partitions, not one task per priority") {
      val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("rangepartitioning"),
        s"$q must range-partition the global order (two-pass rank recipe)")
      // the only Window allowed is the per-range-partition row_number — its
      // partition spec must include the synthetic pid column, never a bare
      // low-cardinality priority key
      val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
      assert(windowLines.forall(_.contains("pid")),
        s"$q's window must be per range partition: $windowLines")
      Caches.drain()
    }

  test("b7 top-K: the optimizer's WindowGroupLimit prunes before the shuffle") {
    val df = SparkEntry.queries("b7_topk_window")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    // the bare low-cardinality window partition key is legal ONLY because
    // InferWindowGroupLimit inserts a PARTIAL per-scan-partition top-3
    // prune before the exchange (two-phase top-K inside the optimizer);
    // if a Spark upgrade stops matching this pattern, b7 must go back to
    // an explicit two-phase plan — this pin is the alarm
    val limits = plan.linesIterator.filter(_.contains("WindowGroupLimit")).toSeq
    assert(limits.exists(_.contains("Partial")) && limits.exists(_.contains("Final")),
      s"expected a map-side Partial + post-shuffle Final WindowGroupLimit:\n$plan")
    // the only range exchange is the 15-row output orderBy (carries rn);
    // the fact table itself must not be range-repartitioned for top-K
    val rangeEx = plan.linesIterator
      .filter(_.contains("Exchange rangepartitioning")).toSeq
    assert(rangeEx.forall(_.contains("rn#")), s"fact-table range shuffle: $rangeEx")
    Caches.drain()
  }

  test("e67 chunker is exchange-free up to the output sort") {
    val df = SparkEntry.queries("e67_chunk_windows")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the rangepartitioning of the final
    // gate-determinism orderBy — the chunker itself never shuffles
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(_.contains("rangepartitioning")),
      s"chunker must be shuffle-free (only the output sort exchanges): $exchanges")
    Caches.drain()
  }

  test("b23 sessionize: one hash shuffle serves both windows and the rollup") {
    val df = SparkEntry.queries("b23_sessionize")(spark, TestSpark.Sf)
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange") && l.contains("hashpartitioning")).toSeq
    assert(hashEx.size == 1 && hashEx.head.contains("user_id"),
      s"expected exactly one user_id hash exchange reused by the " +
        s"(user_id, session_idx) aggregate: $hashEx")
    Caches.drain()
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.Sf)
      assert(df.columns.nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
      val violations = PlanPins.violations(name, plan)
      assert(violations.isEmpty, violations.mkString("; "))
      val n = df.count()
      assert(n >= 0)
      Caches.drain() // free per-query tracked intermediates, like the harnesses
    }
  }
}
