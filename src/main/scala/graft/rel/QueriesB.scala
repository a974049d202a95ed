package graft.rel

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Q._

/** Group B — the relational core implied by the reference's internal catalog
  * SQL (SURVEY.md §2.3/§2.4.B): equi-joins (ref pg_index⋈pg_attribute,
  * datum/postgis/table.py:116-128; sde.layers⋈spatial_references,
  * datum/oracle_stgeom/table.py:90-104), an anti-join (NOT IN subquery,
  * datum/oracle_stgeom/database.py:52-61), conjunctive predicates, and
  * aggregation — widened to the standard relational algebra a Spark user
  * expects (window, set ops, rollup).
  *
  * Scale notes per query:
  *  - dimension sides (region/nation/customer/part ≤ ~2% of fact size) are
  *    explicitly `broadcast()` so the fact table never shuffles for a join;
  *  - groupBy aggregates use exact decimal sums (see [[Q]]) which partial-
  *    aggregate map-side — one shuffle of (group-key, 128-bit buffer);
  *  - rank/quantile/top-K over the LOW-CARDINALITY o_orderpriority key
  *    (5 values at any scale factor) never use a bare
  *    Window.partitionBy(priority) — that sorts each priority's entire
  *    slice on ONE task. They share [[groupRanks]], the e44/b20 two-pass
  *    recipe: range-partition the global (group, order) order, rank within
  *    each range partition, broadcast per-(group, partition) offsets back.
  */
object QueriesB {

  /** Global rank within `grp` under the total order `order`, without a
    * per-group window: range-partition by (grp, order...), `row_number`
    * WITHIN each range partition (bounded by partition size), then add
    * broadcast per-(grp, partition) exclusive row-count offsets from one
    * tiny driver collect. Appends `rn` (1-based global rank in the group,
    * long), `n` (group size, long), and the synthetic `pid`. The ranks
    * are defined by the total order alone — independent of where the
    * range boundaries fall.
    *
    * Intended for LOW-cardinality groups (the offset collect is
    * O(groups × partitions)); a high-cardinality group key needs no
    * two-pass trick — a plain per-key window already spreads across the
    * cluster (and for top-K, [[graft.rel.Q.topKPerGroup]]).
    */
  private def groupRanks(df: org.apache.spark.sql.DataFrame, grp: String,
      order: Seq[org.apache.spark.sql.Column]): org.apache.spark.sql.DataFrame = {
    val base = df
      .repartitionByRange(32, (col(grp) +: order): _*)
      .withColumn("pid", spark_partition_id())
      .transform(graft.Caches.persistTracked) // counts pass + rank pass
    val counts = base.groupBy(grp, "pid").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val nByGroup: Map[String, Long] =
      counts.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).sum }
    val off: Map[String, Long] = counts.groupBy(_._1).flatMap {
      case (g, rs) =>
        var acc = 0L
        rs.sortBy(_._2).map { case (_, pid, c) =>
          val o = acc; acc += c; s"$g|$pid" -> o
        }
    }
    val w = Window.partitionBy(grp, "pid").orderBy(order: _*)
    base
      .withColumn("rn", row_number().over(w).cast("long") +
        element_at(typedLit(off), concat_ws("|", col(grp), col("pid"))))
      .withColumn("n", element_at(typedLit(nByGroup), col(grp)))
  }

  val all: Map[String, Fn] = Map(
    // b1: orders ⋈ customer (ref #19/#20 shape). Customer is the dimension —
    // broadcast it; orders streams through unshuffled.
    "b1_join_inner" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
        .select(o("o_orderkey"), c("c_custkey"), c("c_name"), o("o_totalprice"))
        .orderBy("o_orderkey")
    }),

    // b2: 4-way star join lineitem⋈orders⋈customer⋈nation⋈region → revenue
    // per region. All dims broadcast: the fact table is scanned once with
    // zero join shuffles; the single shuffle is the 5-group aggregate.
    "b2_join_multiway" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      l.join(broadcast(o), l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name").as("r_name"))
        .agg(
          dbl(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    // b3: customers with no orders — ref NOT IN subquery shape
    // (datum/oracle_stgeom/database.py:52-61) as a left-anti hash join.
    "b3_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // b4: parts that appear in lineitem — left-semi (EXISTS).
    "b4_semi_join" -> ((s, dir) => {
      val p = t(s, dir, "part"); val l = t(s, dir, "lineitem")
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .select("p_partkey", "p_name").orderBy("p_partkey")
    }),

    // b5: TPC-H Q1 shape — exact decimal sums, partial+final hash agg.
    "b5_group_agg" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val sumQty = sum(dec2(col("l_quantity")))
      l.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dbl(sumQty).as("sum_qty"),
          dbl(sum(dec2(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(dec2(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec2(col("l_discount"))))).as("sum_disc_price"),
          (dbl(sumQty) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // b6: distinct customer count over orders — partial-aggregated
    // count(distinct) (Catalyst expands to a two-phase exact distinct).
    "b6_distinct" -> ((s, dir) =>
      t(s, dir, "orders").agg(countDistinct(col("o_custkey")).as("n"))),

    // b15: sequential window functions — lag/lead/first_value over each
    // customer's order history (deterministic frame: orderdate then the
    // unique orderkey). delta is a single exactly-rounded double
    // subtraction of stored values — engine-portable without decimal
    // staging. Explicit 0.0 defaults at partition edges: the driver's
    // comparator reads NULL doubles as NaN and NaN ≠ NaN, so oracle-checked
    // double columns must never be NULL. One shuffle on o_custkey serves
    // all three functions.
    "b15_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1, 0.0).over(w).as("next_price"),
          first_value(col("o_totalprice")).over(w).as("first_price"))
        .withColumn("delta", col("o_totalprice") - col("prev_price"))
        .orderBy("o_orderkey")
    }),

    // b17: GROUPING SETS — the general form behind rollup (b9) and cube
    // (b11): per-priority totals, per-status totals, and the grand total
    // in ONE pass (Spark expands to a single Expand + hash aggregate — one
    // scan, one shuffle, vs three separate groupBys = three scans).
    // Grouping nulls are disambiguated with an ALL label (the data's own
    // columns are non-null).
    "b17_grouping_sets" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec2(col("o_totalprice"))).cast("double").as("sum_price"))
        .select(coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("n"), col("sum_price"))
        .orderBy("pri", "status")),

    // b16: EXACT group quantiles by nearest-rank (ceil) — k_q = ⌈q·n⌉ in
    // pure integer arithmetic ((q·10·n + 9) div 10), so there is no
    // interpolation and no engine-specific quantile definition to disagree
    // on: the answer is the k-th smallest value under a total order
    // (value, key). Ranks come from the two-pass groupRanks recipe (a
    // per-priority window would sort a whole group on one task); the
    // quantile pick is then one map-side-combined conditional aggregate.
    "b16_exact_quantiles" -> ((s, dir) => {
      groupRanks(
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
        "o_orderpriority", Seq(col("o_totalprice"), col("o_orderkey")))
        .groupBy("o_orderpriority")
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("o_totalprice"))).as("p50"),
          max(when(col("rn") === expr("(9 * n + 9) div 10"), col("o_totalprice"))).as("p90"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy("o_orderpriority")
    }),

    // b18: RANGE-frame window — 30-day trailing spend per customer at
    // each order. Unlike a ROWS frame, the frame is bounded by the ORDER
    // BY VALUE (epoch seconds), so gaps and same-day ties behave like SQL
    // says they should (all peers join the frame). Exact decimal sum
    // inside the frame keeps it bit-portable. Same shuffle shape as any
    // per-key window: one hash partition + sort, no global sort.
    "b18_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("es"))
        .rangeBetween(-30L * 86400, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("es", col("o_orderdate").cast("timestamp").cast("long"))
        .withColumn("trailing_30d",
          sum(dec2(col("o_totalprice"))).over(w).cast("double"))
        .select("o_orderkey", "o_custkey", "es", "o_totalprice", "trailing_30d")
        .orderBy("o_orderkey")
    }),

    // b7: top-3 orders by totalprice within each orderpriority — top-K by
    // global group rank from the two-pass groupRanks recipe (a window over
    // the 5-value priority key would serialize each group onto one task);
    // tie-broken by o_orderkey for a total order.
    "b7_topk_window" -> ((s, dir) => {
      // top-K per group as the PLAIN window + rank filter: Spark's
      // InferWindowGroupLimit rewrites `row_number() ≤ k` into a
      // WindowGroupLimit pair — a PARTIAL top-3-per-group prune on each
      // scan partition BEFORE the shuffle, then the Final limit after —
      // so only ≤ 3·partitions winner rows per group ever shuffle. That
      // is the two-phase top-K recipe (e50) built into the optimizer; the
      // old hand-rolled groupRanks ranking of every row to keep 15 was
      // the r6 rehearsal's worst B-group scaling term (7.5 s at sf1 →
      // ~0.5 s). The low-cardinality priority key is safe as a window
      // partition HERE precisely because the Partial limit bounds each
      // task's input (pinned in QueriesSmokeSpec).
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn").cast("int").as("rn"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderpriority", "rn")
    }),

    // b8: UNION (distinct) then EXCEPT of customer-key sets.
    "b8_set_ops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val rich = c.filter(col("c_acctbal") > 7000).select("c_custkey")
      val bld  = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val near = c.filter(col("c_nationkey") < 5).select("c_custkey")
      rich.union(bld).distinct().except(near).orderBy("c_custkey")
    }),

    // b10: skew-salted join + two-phase aggregate — result-identical to the
    // plain join/groupBy (the oracle IS the plain SQL), but each hot
    // custkey's rows spread over 8 shuffle partitions. Decimal sums make
    // the salted regroup value-identical.
    "b10_skew_salted_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").select("o_custkey", "o_totalprice")
      val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
      val joined = Skew.saltedJoin(o, c, "o_custkey", buckets = 8)
      joined.groupBy("c_mktsegment")
        .agg(dbl(sum(dec2(col("o_totalprice")))).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")
    }),

    // b11: CUBE — all grouping sets over (returnflag, linestatus).
    "b11_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(dbl(sum(dec2(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // b12: sketch aggregates, HASH-GATED — HyperLogLog distinct estimate +
    // the certified-bound quantile sketch ([[graft.functions.QuantileSketch]])
    // next to their exact values. At 100 TB these sketches replace exact
    // distinct/percentile (fixed-size partial state, one map-side-combined
    // shuffle vs a full-row distinct/sort shuffle). The approx VALUES are
    // partition-order-dependent and cannot be hashed cross-engine; what IS
    // deterministic is each sketch's error contract, so the emitted columns
    // are the exact statistics (DuckDB-matchable) plus booleans asserting
    // |approx − exact| within the certified bound: the HLL at rsd=0.01
    // within ±5% (5σ), each sketch percentile inside the exact
    // [p−5%, p+5%] percentile_disc interval (guaranteed while the sketch's
    // self-reported rank-error bound stays under 5%·n — itself asserted by
    // sketch_err_ok), and the sketch's row count equal to the exact count.
    "b12_approx_stats" -> ((s, dir) => {
      val sk = graft.functions.AggExpressions.quantileSketch(
        col("l_extendedprice"), Seq(0.5, 0.9, 0.99))
      def disc(p: Double) =
        dbl(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY l_extendedprice)"))
      t(s, dir, "lineitem")
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), rsd = 0.01).as("_hll"),
          sk.as("_sk"),
          count(col("l_extendedprice")).as("n_rows"),
          disc(0.5).as("exact_p50"), disc(0.45).as("_p50_lo"), disc(0.55).as("_p50_hi"),
          disc(0.9).as("exact_p90"), disc(0.85).as("_p90_lo"), disc(0.95).as("_p90_hi"),
          disc(0.99).as("exact_p99"), disc(0.94).as("_p99_lo"), disc(1.0).as("_p99_hi"))
        .select(
          col("exact_parts"), col("n_rows"),
          (abs(col("_hll") - col("exact_parts")) <=
            col("exact_parts") * 0.05).as("hll_ok"),
          col("exact_p50"),
          col("_sk.values").getItem(0).between(col("_p50_lo"), col("_p50_hi")).as("p50_in_eps"),
          col("exact_p90"),
          col("_sk.values").getItem(1).between(col("_p90_lo"), col("_p90_hi")).as("p90_in_eps"),
          col("exact_p99"),
          col("_sk.values").getItem(2).between(col("_p99_lo"), col("_p99_hi")).as("p99_in_eps"),
          (col("_sk.err_bound") + 1 <= ceil(col("_sk.n") * 0.05)).as("sketch_err_ok"),
          (col("_sk.n") === col("n_rows")).as("sketch_n_ok"))
    }),

    // b13: pivot — order counts per status × priority, fixed value list
    // (explicit values keep the output schema static: the scale-safe form —
    // dynamic pivot needs a values scan first).
    "b13_pivot" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        // pivot leaves NULL where a (status, priority) cell has no rows;
        // the SQL FILTER form counts 0 — align on 0
        .na.fill(0L, Seq("p1", "p2", "p3", "p4", "p5"))
        .orderBy("o_orderstatus")),

    // b14: unpivot/melt — lineitem measures to (metric, value) long form.
    "b14_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice")),
          "metric", "value")
        .orderBy("l_orderkey", "l_linenumber", "metric")),

    // b9: ROLLUP(returnflag, linestatus) — NULLS FIRST pinned explicitly
    // (Spark's ASC default) so both engines order subtotal rows identically.
    "b9_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dbl(sum(dec2(col("l_quantity")))).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // b19: correlated scalar subqueries through the raw-SQL surface —
    // customers above their own nation's average balance. Catalyst
    // DECORRELATES both subqueries into one per-nation aggregate joined
    // back on the correlation key (equi-join, covered by the plan sweep);
    // a naive engine would loop the subquery per row. The predicate is
    // the exact cross-multiplication `bal·n > sum` (decimal × bigint vs
    // decimal sum), so no engine ever divides — a float average would
    // make boundary rows engine-dependent.
    "b19_correlated_subquery" -> ((s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      graft.api.Datum.connect(s"parquet://$dir").execute(CorrelatedSql)
    }),

    // b22: EXISTS / NOT EXISTS subqueries through the raw-SQL surface —
    // b19's decorrelation story for the predicate shapes: Catalyst
    // rewrites the EXISTS to a left-semi and the NOT EXISTS to a
    // left-anti join on the correlation key (asserted in ApiSpec — two
    // hash joins, no per-row subquery execution, the rewrite that makes
    // correlated predicates scale). One SQL text, valid in both engines.
    "b22_exists_subquery" -> ((s, dir) => {
      implicit val sp: org.apache.spark.sql.SparkSession = s
      graft.api.Datum.connect(s"parquet://$dir").execute(ExistsSql)
    }),

    // b20: the rank-function family — ntile / percent_rank / cume_dist.
    // The ORDER BY is a TOTAL order (price, key): ntile's bucket
    // boundaries and the tie-sets of percent_rank/cume_dist are then
    // engine-independent (under a partial order, ntile splits ties by
    // arbitrary row order — nondeterministic across engines).
    //
    // NOT one window per priority group: o_orderpriority has 5 values at
    // any scale factor, so Window.partitionBy(priority) sorts each group's
    // ENTIRE slice of the table on a single task. Instead the e44 two-pass
    // recipe: range-partition by the global (priority, price, key) order,
    // rank WITHIN each range partition, broadcast the per-(priority,
    // partition) exclusive row-count offsets back, and derive all three
    // functions arithmetically from the global rank + the per-group total:
    //   rank rn  = local row_number + offset   (total order ⇒ rank == rn)
    //   ntile(4) = bucket of rn where the first n%4 buckets hold n/4+1
    //   percent_rank = (rn-1)/(n-1), cume_dist = rn/n  (same double
    //   division the window functions evaluate ⇒ identical bits)
    // No task ever sorts more than one range partition.
    // b23: gap-based batch sessionization — the canonical event-log
    // rollup: a user's events split into sessions wherever the
    // inter-event gap exceeds 30 min (lag → new-session flag → running
    // sum numbers the sessions), then one aggregate per session. Scale
    // shape: both windows AND the final groupBy key on user_id — a key
    // whose cardinality GROWS with the data (per-user event counts are
    // bounded), the legitimate per-entity window class (b15), never a
    // fixed-cardinality key; one shuffle total, since the window exchange
    // on user_id is reused by the (user_id, session_idx) aggregate.
    "b23_sessionize" -> ((s, dir) => {
      val gapUs = 1800L * 1000000L
      val ev = events(s, dir).select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val gap = col("us") - lag(col("us"), 1).over(w)
      ev.withColumn("new_s",
          when(gap.isNull || gap > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx", sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"), max(col("us")).as("end_us"))
        .withColumn("duration_us", col("end_us") - col("start_us"))
        .orderBy("user_id", "session_idx")
    }),

    "b20_window_ranks" -> ((s, dir) => {
      groupRanks(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
        "o_orderpriority", Seq(col("o_totalprice"), col("o_orderkey")))
        .withColumn("q4", expr(
          """CAST(CASE WHEN rn <= (n % 4) * (n DIV 4 + 1)
            |  THEN (rn - 1) DIV (n DIV 4 + 1) + 1
            |  ELSE n % 4 + (rn - (n % 4) * (n DIV 4 + 1) - 1)
            |         DIV GREATEST(n DIV 4, 1) + 1
            |END AS INT)""".stripMargin))
        .withColumn("pr", expr(
          "CASE WHEN n = 1 THEN 0.0" +
            " ELSE CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END"))
        .withColumn("cd", expr("CAST(rn AS DOUBLE) / CAST(n AS DOUBLE)"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
          col("q4"), col("pr"), col("cd"))
        .orderBy("o_orderkey")
    }),

    // b21: exact cross-engine Pearson correlation — the reason not to use
    // the built-in corr(): every engine folds its running moments in its
    // own order, so the low bits differ. Here the five moments are EXACT
    // decimal sums (order-independent), each converts to double once
    // (correctly rounded), and the correlation is one fixed double DAG —
    // identical operand order in both engines ⇒ identical bits. Scale
    // cost is the same single map-side-combined aggregate as any sum.
    "b21_corr_stats" -> ((s, dir) => {
      val x = dec2(col("l_quantity")); val y = dec2(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
          sum(x * y).cast("double").as("sxy"),
          sum(x * x).cast("double").as("sxx"),
          sum(y * y).cast("double").as("syy"))
        .withColumn("corr_xy",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))))
        .select("l_returnflag", "n", "sx", "sy", "corr_xy")
        .orderBy("l_returnflag")
    })
  )

  /** One SQL text for b22 — valid verbatim in Spark SQL and DuckDB:
    * suppliers with at least one oversized shipment, none of which came
    * back as a return (~600 lineitems/supplier, so both predicates need
    * the rare-event threshold to discriminate).
    */
  private val ExistsSql: String =
    "SELECT s_suppkey, s_name FROM supplier s " +
      "WHERE EXISTS (SELECT 1 FROM lineitem l " +
      "WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 49) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_suppkey = s.s_suppkey AND l2.l_returnflag = 'R' " +
      "AND l2.l_quantity > 49) " +
      "ORDER BY s_suppkey"

  /** One SQL text for b19 — valid verbatim in Spark SQL and DuckDB. */
  private val CorrelatedSql: String =
    "SELECT c_custkey, c_acctbal FROM customer c " +
      "WHERE CAST(c_acctbal AS DECIMAL(18,2)) * " +
      "(SELECT count(*) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) > " +
      "(SELECT sum(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3 " +
      "WHERE c3.c_nationkey = c.c_nationkey) " +
      "ORDER BY c_custkey"

  val oracle: Map[String, String] = Map(
    "b19_correlated_subquery" -> CorrelatedSql,
    "b22_exists_subquery" -> ExistsSql,
    "b23_sessionize" ->
      ("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events), " +
        "fl AS (SELECT user_id, event_id, us, " +
        "CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000 " +
        "THEN 1 ELSE 0 END AS new_s FROM ev " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)), " +
        "sx AS (SELECT user_id, us, CAST(sum(new_s) OVER (PARTITION BY user_id " +
        "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS BIGINT) AS session_idx FROM fl) " +
        "SELECT user_id, session_idx, count(*) AS n_events, " +
        "min(us) AS start_us, max(us) AS end_us, " +
        "max(us) - min(us) AS duration_us " +
        "FROM sx GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),
    "b20_window_ranks" ->
      ("SELECT o_orderkey, o_orderpriority, o_totalprice, " +
        "ntile(4) OVER w AS q4, percent_rank() OVER w AS pr, cume_dist() OVER w AS cd " +
        "FROM orders " +
        "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) " +
        "ORDER BY o_orderkey"),
    "b21_corr_stats" ->
      ("WITH a AS (SELECT l_returnflag, count(*) AS n, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy " +
        "FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l_returnflag, n, sx, sy, " +
        "(n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_xy " +
        "FROM a ORDER BY l_returnflag"),
    "b1_join_inner" ->
      ("SELECT o_orderkey, c_custkey, c_name, o_totalprice FROM orders " +
        "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"),
    "b2_join_multiway" ->
      ("SELECT r_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_items FROM lineitem " +
        "JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY r_name ORDER BY r_name"),
    "b3_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN " +
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 200000) ORDER BY c_custkey"),
    "b4_semi_join" ->
      ("SELECT p_partkey, p_name FROM part " +
        "WHERE p_partkey IN (SELECT l_partkey FROM lineitem) ORDER BY p_partkey"),
    "b5_group_agg" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty, " +
        "count(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "b6_distinct" -> "SELECT count(DISTINCT o_custkey) AS n FROM orders",
    "b15_window_lag" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, " +
        "lag(o_totalprice, 1, 0.0) OVER w AS prev_price, " +
        "lead(o_totalprice, 1, 0.0) OVER w AS next_price, " +
        "first_value(o_totalprice) OVER w AS first_price, " +
        "o_totalprice - lag(o_totalprice, 1, 0.0) OVER w AS delta " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
        "ORDER BY o_orderkey"),
    "b18_range_frame" ->
      ("WITH o AS (SELECT o_orderkey, o_custkey, " +
        "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS es, " +
        "o_totalprice FROM orders) " +
        "SELECT o_orderkey, o_custkey, es, o_totalprice, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
        "(PARTITION BY o_custkey ORDER BY es " +
        "RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d " +
        "FROM o ORDER BY o_orderkey"),
    "b17_grouping_sets" ->
      ("SELECT coalesce(o_orderpriority, 'ALL') AS pri, " +
        "coalesce(o_orderstatus, 'ALL') AS status, count(*) AS n, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price " +
        "FROM orders GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ()) " +
        "ORDER BY 1, 2"),
    "b16_exact_quantiles" ->
      ("WITH r AS (SELECT o_orderpriority, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn, " +
        "count(*) OVER (PARTITION BY o_orderpriority) AS n FROM orders) " +
        "SELECT o_orderpriority, max(n) AS n, " +
        "max(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END) AS p50, " +
        "max(CASE WHEN rn = (9 * n + 9) // 10 THEN o_totalprice END) AS p90, " +
        "max(o_totalprice) AS max_price " +
        "FROM r GROUP BY 1 ORDER BY 1"),
    "b7_topk_window" ->
      ("SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (" +
        "SELECT o_orderpriority, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
        "FROM orders) WHERE rn <= 3 ORDER BY o_orderpriority, rn"),
    "b8_set_ops" ->
      ("SELECT c_custkey FROM (" +
        "SELECT c_custkey FROM customer WHERE c_acctbal > 7000 " +
        "UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "EXCEPT SELECT c_custkey FROM customer WHERE c_nationkey < 5 ORDER BY c_custkey"),
    "b10_skew_salted_agg" ->
      ("SELECT c_mktsegment, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue, " +
        "count(*) AS n_orders FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment ORDER BY c_mktsegment"),
    "b11_cube" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),
    "b12_approx_stats" ->
      ("SELECT count(DISTINCT l_partkey) AS exact_parts, " +
        "count(l_extendedprice) AS n_rows, TRUE AS hll_ok, " +
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS exact_p50, " +
        "TRUE AS p50_in_eps, " +
        "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS exact_p90, " +
        "TRUE AS p90_in_eps, " +
        "CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS DOUBLE) AS exact_p99, " +
        "TRUE AS p99_in_eps, TRUE AS sketch_err_ok, TRUE AS sketch_n_ok " +
        "FROM lineitem"),
    "b13_pivot" ->
      ("SELECT o_orderstatus, " +
        "count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1, " +
        "count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2, " +
        "count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3, " +
        "count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4, " +
        "count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5 " +
        "FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"),
    "b14_unpivot" ->
      ("SELECT l_orderkey, l_linenumber, metric, value FROM (" +
        "SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value " +
        "FROM lineitem WHERE l_orderkey < 100 " +
        "UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice " +
        "FROM lineitem WHERE l_orderkey < 100) " +
        "ORDER BY l_orderkey, l_linenumber, metric"),
    "b9_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) " +
        "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST")
  )
}
