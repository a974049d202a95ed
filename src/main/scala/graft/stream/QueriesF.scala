package graft.stream

import org.apache.spark.sql.functions._
import graft.rel.Q._

/** Group F — event-time windowing queries (SURVEY.md §2.4.F) + the props
  * JSON surface. f1–f3 and f5 run as batch plans with DuckDB oracles
  * (manual epoch-bucket arithmetic keeps both engines on exact integer
  * window assignment); f4 actually executes a Structured Streaming query
  * with a watermark and is oracle-checked against the SQL-predictable
  * "finalized windows" subset: window_end ≤ max(event_time) − delay.
  */
object QueriesF {

  val all: Map[String, Fn] = Map(
    // f1: 10-minute tumbling counts/sums per event type.
    "f1_tumbling_agg" -> ((s, dir) =>
      EventWindows.tumbling(events(s, dir)).orderBy("epoch_start", "event_type")),

    // f2: 10-minute windows sliding every 5 — each event in 2 windows.
    "f2_sliding_window" -> ((s, dir) =>
      EventWindows.sliding(events(s, dir)).orderBy("epoch_start", "event_type")),

    // f3: per-user sessions with a 30-minute gap.
    "f3_session_window" -> ((s, dir) =>
      EventWindows.sessions(events(s, dir)).orderBy("user_id", "session_start")),

    // f4: real Structured Streaming run (file micro-batches + 15-minute
    // watermark, append mode): emits exactly the windows the watermark
    // finalized. MemoryStream late-drop semantics are in StreamingSpec.
    "f4_watermark_late" -> ((s, dir) =>
      EventWindows.tumblingWithWatermark(s, dir)
        .orderBy("epoch_start", "event_type")),

    // f6: custom streaming state (flatMapGroupsWithState) — converged
    // per-user running stats; exact-cents state makes the final state
    // equal the batch aggregate bit-for-bit (the oracle).
    "f6_stateful_running" -> ((s, dir) =>
      EventWindows.userRunningStatsBatchEnd(s, dir).orderBy("user_id")),

    // f7: as-of join — attribute each purchase to the user's latest prior
    // view (composition-based sort-merge as-of; DuckDB's native ASOF JOIN
    // is the oracle).
    "f7_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.rel.AsOf.asofJoin(purchases, views, "user_id", "ts", "ts")
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("view_event_id"),
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("asof_ts").cast("timestamp"))).as("gap_us"))
        .orderBy("event_id")
    }),

    // f8: range join — purchases within 5 minutes after a view by the same
    // user (equi key + interval condition: one sort-merge join, interval
    // post-filtered; see rel.RangeJoin for the keyless binned variant).
    // Projections and predicate are shared with the streaming twin f11
    // (EventWindows.purchasesViews / rangeJoinCond) so the two can never
    // silently diverge.
    "f8_range_join" -> ((s, dir) => {
      val (p, v) = EventWindows.purchasesViews(events(s, dir))
      p.join(v, EventWindows.rangeJoinCond(300))
        .select(col("p_id"), col("user_id"), col("v_id"))
        .orderBy("p_id", "v_id")
    }),

    // f9: time-series gap-fill — dense 10-minute grid per event_type with
    // zero-filled empty buckets (sequence over the observed span ×
    // distinct types, left join onto f1's sparse aggregate). At scale the
    // grid is generated, never materialized from the fact table.
    "f9_gapfill" -> ((s, dir) => {
      // persist the sparse aggregate: it is consumed twice (the eager stats
      // collect below and the grid join) — without caching the fact table
      // would be scanned and aggregated twice. The cached frame is tiny
      // (one row per (window, type), ~8k rows at sf0.1).
      // tracked: the returned plan joins onto it, so it is freed by the
      // harness's per-query Caches.drain() after materialization
      val sparse = graft.Caches.persistTracked(EventWindows.tumbling(events(s, dir)))
      // one eager stats pass (min/max/type-set in a single aggregate) so the
      // fact table isn't re-scanned for span and types at execution time
      val stats = sparse.agg(min("epoch_start"), max("epoch_start"),
        collect_set("event_type")).collect()(0)
      val (lo, hi) = (stats.getLong(0), stats.getLong(1))
      val types = stats.getSeq[String](2).sorted
      val grid = s.range(lo, hi + 1, 600).toDF("epoch_start")
        .crossJoin(s.createDataFrame(types.map(Tuple1(_))).toDF("event_type"))
      grid.join(sparse, Seq("epoch_start", "event_type"), "left")
        .select(col("epoch_start"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
        .orderBy("epoch_start", "event_type")
    }),

    // f5: JSON props column — extract $.k and aggregate per event type
    // (the events table's semi-structured surface, FIXTURES.md §1).
    "f5_props_json" -> ((s, dir) =>
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy("event_type")),

    // f10: streaming dedup end-to-end — doubled input stream, watermarked
    // dropDuplicates, checkpointed exactly-once parquet sink, read back.
    // Oracle = the distinct events themselves (event_id is unique, so the
    // dedup must reduce the doubled stream exactly to the source).
    "f10_stream_dedup" -> ((s, dir) =>
      EventWindows.dedupToParquet(s, dir).orderBy("event_id")),

    // f12: the f3 session windows executed as a REAL streaming query
    // (watermark + session_window state merging in the state store, append
    // mode) — oracle-checked against the finalized-sessions subset, the
    // session analogue of f4's tumbling contract.
    "f12_stream_session" -> ((s, dir) =>
      EventWindows.sessionsWithWatermark(s, dir)
        .orderBy("user_id", "session_start")),

    // f11: the f8 range join executed as a REAL stream-stream join
    // (purchases ⋈ views, watermark-bounded state on both sides) — same
    // oracle SQL as the batch form; proves the unified-engine contract on
    // the join path like f4 does for windowed aggregation.
    "f11_stream_range_join" -> ((s, dir) =>
      EventWindows.attributionJoinBatchEnd(s, dir).orderBy("p_id", "v_id")),

    // f13: stream-static enrichment — the events stream broadcast-joins a
    // static dimension (customer → segment) per micro-batch, then a tiny
    // (segment × type) aggregate in complete mode. No join state, no
    // stream-side shuffle; the converged table equals the batch join+agg
    // (the oracle).
    "f13_stream_static_join" -> ((s, dir) =>
      EventWindows.enrichedSegmentStats(s, dir).orderBy("segment", "event_type")),

    // f22: streaming PQ encoding — the f21 train-offline/apply-on-ingest
    // shape for the vector tier: e57's codebooks train batch-side, the
    // embedding stream encodes statelessly (scan-local argmin, append
    // mode, zero streaming state); batch encoding is the oracle.
    "f22_stream_pq_encode" -> ((s, dir) =>
      EventWindows.streamPqEncode(s, dir).orderBy("vec_id")),

    // f24: e60's leakage-free SPLIT routing on the ingest stream — a
    // stream-static join against the batch-derived cluster manifest
    // (stateless, append mode); bit-exact vs the batch assignment.
    "f24_stream_split_route" -> ((s, dir) =>
      EventWindows.streamSplitRoute(s, dir).orderBy("doc_id")),

    // f26: the IVF vector index MAINTAINED ON INGEST — batch-trained
    // centroids route each arriving vector to its inverted list
    // (stateless scan-local argmin); foreachBatch APPENDS partitioned by
    // list_id, so index maintenance is pure partition-dir appends and
    // the e64 probe partition-prunes to nprobe dirs. Rows = e18/e64.
    "f26_stream_ivf_ingest" -> ((s, dir) =>
      EventWindows.streamIvfIngest(s, dir)),

    // f27: streaming CERTIFIED-BOUND quantiles — the mergeable quantile
    // sketch aggregates per watermark-finalized tumbling window with its
    // buffer living in the state store (mergeable == streamable; the
    // streaming twin of b12/e75's batch certification). The batch side
    // re-derives each emitted window's EXACT percentiles and the result
    // grades the sketch: estimate within ±0.05 rank of exact, certified
    // bound within the k=256 guarantee, stream count == batch count.
    // Per-window state is O(k) at any event rate; the grading join
    // touches only emitted windows.
    "f27_stream_quantiles" -> ((s, dir) => {
      val streamed = EventWindows.streamWindowQuantiles(s, dir)
      def disc(p: Double) =
        expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY value)").cast("double")
      val exact = events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(count(lit(1)).as("n_batch"),
          disc(0.5).as("exact_p50"), disc(0.45).as("_lo50"), disc(0.55).as("_hi50"),
          disc(0.9).as("exact_p90"), disc(0.85).as("_lo90"), disc(0.95).as("_hi90"))
        .select(col("w.start").cast("long").as("epoch_start"), col("n_batch"),
          col("exact_p50"), col("_lo50"), col("_hi50"),
          col("exact_p90"), col("_lo90"), col("_hi90"))
      streamed.join(exact, "epoch_start") // emitted (finalized) windows only
        .select(col("epoch_start"), col("n"),
          col("exact_p50"),
          col("sk.values").getItem(0).between(col("_lo50"), col("_hi50")).as("p50_in_eps"),
          col("exact_p90"),
          col("sk.values").getItem(1).between(col("_lo90"), col("_hi90")).as("p90_in_eps"),
          // small windows never compact: err_bound degenerates to the
          // discretization slack (1 row = exact-or-adjacent), so the
          // certified gate is err_bound ≤ max(1, 5% of n)
          (col("sk.err_bound") <=
            greatest(lit(1L), ceil(col("n") * 0.05))).as("sketch_err_ok"),
          (col("sk.n") === col("n")).as("sketch_n_ok"),
          (col("n") === col("n_batch")).as("n_match"))
        .orderBy("epoch_start")
    }),

    // f28: streaming heavy hitters — e77's certified Misra–Gries sketch
    // per watermark-finalized DAY window, its c=16 buffer living in the
    // state store (the f27 recipe applied to frequency). ~150 distinct
    // users per day against capacity 16 forces real decrement/merge
    // activity in-stream. The batch side re-derives each emitted day's
    // exact per-user counts; the result grades the top-3 exact users per
    // day against the sketch's guarantees — each boolean provable for
    // every run (coverage, est bracketing, err ≤ n/(c+1)) — plus
    // stream-count == batch-count per window.
    "f28_stream_top_users" -> ((s, dir) => {
      val C = 16
      val streamed = EventWindows.streamWindowTopUsers(s, dir, c = C)
      val winUser = events(s, dir)
        .withColumn("ts", col("ts").cast("timestamp"))
        .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
        .agg(count(lit(1)).as("exact_n"))
        .select(col("w.start").cast("long").as("epoch_start"),
          col("user_id"), col("exact_n"))
        .transform(graft.Caches.persistTracked) // top-3 + window totals
      val top = graft.rel.Q.topKPerGroup(winUser, "epoch_start", 3,
        Seq(col("exact_n").desc, col("user_id"))).drop("rank")
      val tot = winUser.groupBy("epoch_start")
        .agg(sum(col("exact_n")).as("win_n"))
      val est = streamed.select(col("epoch_start"),
          explode(arrays_zip(col("sk.items").as("i"), col("sk.counts").as("c"))).as("z"))
        .select(col("epoch_start"), col("z.i").cast("long").as("user_id"),
          col("z.c").as("est"))
      val bounds = streamed.select(col("epoch_start"),
        col("sk.err").as("b_err"), col("sk.n").as("b_n"))
      top.join(est, Seq("epoch_start", "user_id"), "left")
        .join(bounds, "epoch_start") // inner: finalized windows only
        .join(tot, "epoch_start")
        .select(col("epoch_start"), col("user_id"), col("exact_n"),
          (col("est").isNotNull || col("exact_n") <= col("b_err")).as("covered"),
          (col("est").isNull || (col("est") <= col("exact_n") &&
            col("exact_n") <= col("est") + col("b_err"))).as("est_ok"),
          (col("b_err") * (C + 1) <= col("b_n")).as("err_bound_ok"),
          (col("b_n") === col("win_n")).as("n_match"))
        .orderBy(col("epoch_start"), col("exact_n").desc, col("user_id"))
    }),

    // f31: streamed posting-index maintenance — f26's idempotent
    // append-only recipe applied to e82's bucket-partitioned lexical
    // index; the closing pruned probe returns e80's top-10 verbatim.
    "f31_stream_postings" -> ((s, dir) =>
      EventWindows.streamPostingsIngest(s, dir)),

    // f32: compaction of the streamed posting index — a 3-micro-batch
    // ingest compacted mid-stream (replay-safe bound) and at termination;
    // posting multiset proven bit-identical, file count proven to drop,
    // and the pruned probe over the compacted layout returns e80's top-10
    // verbatim (the oracle).
    "f32_index_compaction" -> ((s, dir) =>
      EventWindows.streamPostingsCompacted(s, dir)),

    // f35: POLICY-driven compaction — f32's pipeline where the observed
    // committed file count (budget: one file per bucket dir), not a
    // hard-coded batch number, decides each fold; the gate asserts the
    // policy both held (under budget) and fired (over budget) and the
    // probe returns e80's top-10 verbatim (the oracle).
    "f35_policy_compaction" -> ((s, dir) =>
      EventWindows.streamPostingsPolicyCompacted(s, dir)),

    // f36: DELETE lifecycle on the stream-maintained posting index —
    // tombstone -> masked probe -> fold-with-mask -> compacted probe
    // (e95's contract where ingest owns the index; see
    // EventWindows.streamPostingsDeleteServe)
    "f36_stream_delete_serve" -> ((s, dir) =>
      EventWindows.streamPostingsDeleteServe(s, dir)),

    // f37: DELETE lifecycle on the stream-maintained DENSE index — the
    // last cell of the lifecycle matrix (e94 batch×dense, e95
    // batch×sparse, f36 stream×sparse); see
    // EventWindows.streamIvfPqDeleteServe
    "f37_stream_ivfpq_delete" -> ((s, dir) =>
      EventWindows.streamIvfPqDeleteServe(s, dir)),

    // f34: IVFPQ index maintenance ON INGEST — e90's trainings applied
    // scan-locally to the embedding stream (route + 4-byte encode),
    // appended per micro-batch in the list-partitioned layout, compacted
    // mid-stream and at termination, then served by e90's pruned-ADC
    // recall grader — identical rows to the batch artifact by
    // construction (oracle = e90's SQL verbatim).
    "f34_stream_ivfpq_ingest" -> ((s, dir) =>
      EventWindows.streamIvfPqIngest(s, dir)),

    // f33: structured dead-letter quarantine on the event ingest stream —
    // two planted corruption classes (wire-level type drift caught by
    // PERMISSIVE _corrupt_record, semantic bad-props caught by a JSON
    // validator); good rows typed and bit-identical to the clean table,
    // bad rows quarantined with class + recovered id + non-empty error.
    "f33_stream_quarantine" -> ((s, dir) =>
      EventWindows.streamStructuredQuarantine(s, dir)),

    // f30: e80's BM25 scoring applied ON INGEST — index-time stats from
    // the batch memo, per-doc scoring scan-local in the stream (append
    // mode, no state); the batch scorer's relation is the oracle
    // verbatim, proving index-time and ingest-time scoring agree
    // bit-exactly.
    "f30_stream_bm25" -> ((s, dir) =>
      EventWindows.streamBm25Score(s, dir).orderBy("doc_id")),

    // f29: e76's decontamination report derived from the INGEST STREAM —
    // the filter trains batch-side once (session memo), every streamed
    // doc is probed scan-locally by the codegen'd bloom_hits kernel, and
    // the same per-source rollup grades the stream's probe counts against
    // the exact eval overlap. Oracle = e76's SQL verbatim: the report is
    // identical by construction, proving batch probe and ingest probe are
    // one code path.
    "f29_stream_decontaminate" -> ((s, dir) =>
      graft.llm.QueriesE.bloomGradeReport(
        EventWindows.streamBloomDecontaminate(s, dir), s, dir)),

    // f25: e67's chunker applied ON INGEST — overlapping token windows as
    // a stateless streaming generate (append mode, no state, no shuffle):
    // retrieval indexing keeps up with ingest by construction. Bit-exact
    // vs the batch chunker (the oracle is e67's SQL verbatim).
    "f25_stream_chunk" -> ((s, dir) =>
      EventWindows.streamChunk(s, dir).orderBy("doc_id", "chunk_idx")),

    // f23: e61's shard ROUTING applied on the document ingest stream —
    // key/shard are scalar md5 math, so the route is a stateless
    // append-mode projection; bit-exact vs the batch assignment (the
    // oracle is e61 minus the resume sequence).
    "f23_stream_shard" -> ((s, dir) =>
      EventWindows.streamShardRoute(s, dir).orderBy("doc_id")),

    // f21: batch-trained artifact applied ON INGEST — the documents stream
    // tokenized under the BPE merges trained on the static corpus (e54's
    // Bpe.mergesDf, session-memoized), per-source token totals in complete
    // mode. The merge table rides into the kernel as a literal; converged
    // table = the batch aggregate (exact integers, order-independent).
    "f21_stream_tokenize" -> ((s, dir) =>
      EventWindows.streamTokenizeBySource(s, dir).orderBy("source")),

    // f14: CDC upsert sink — foreachBatch merges each batch's per-user
    // argmax into a keyed parquet state table (read-merge-atomic-swap);
    // final state = latest event per user, the batch window argmax oracle.
    "f14_stream_upsert" -> ((s, dir) =>
      EventWindows.upsertLatestToParquet(s, dir).orderBy("user_id")),

    // f15: LEFT OUTER stream-stream range join — matched pairs emit on
    // arrival; unmatched purchases emit a NULL view once the watermark
    // seals them (p_ts behind the global watermark). Oracle = batch left
    // join restricted to matched-or-finalized rows.
    "f15_stream_outer_join" -> ((s, dir) =>
      EventWindows.attributionOuterBatchEnd(s, dir).orderBy("p_id", "v_id")),

    // f17: FORWARD as-of with tolerance — for each view, the next purchase
    // by the same user within 30 minutes (conversion attribution). Same
    // single-shuffle composed plan as f7 with the time sort reversed;
    // tolerance is a post-filter on the unique nearest candidate.
    "f17_asof_forward" -> ((s, dir) => {
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.rel.AsOf.asofJoin(views, purchases, "user_id", "ts", "ts",
        direction = "forward", toleranceUs = Some(1800L * 1000000L))
        .select(col("event_id"), col("user_id"),
          col("asof_event_id").as("purchase_event_id"),
          (unix_micros(col("asof_ts").cast("timestamp")) -
            unix_micros(col("ts").cast("timestamp"))).as("gap_us"))
        .orderBy("event_id")
    }),

    // f16: exactly-once streaming append into a live JDBC backend (Derby):
    // per-batch rows + ledger entry commit in one backend transaction;
    // replayed batches skip on the ledger hit. The sink receives the
    // BOUNDED ops slice (event_id < 100k — the serving-DB edge gets
    // slices/aggregates by design, and the bound is what lets ×10/×100
    // measure the Spark side instead of the single-node backend's serial
    // commit). Read-back ≡ the source slice (the oracle) proves no loss
    // and no duplication.
    "f16_stream_jdbc_sink" -> ((s, dir) =>
      EventWindows.eventsToJdbcExactlyOnce(s, dir).orderBy("event_id")),

    // f18: streaming INCREMENTAL materialized-view maintenance — each
    // micro-batch folds its per-(day, type) partial into a day-partitioned
    // state table, touching only the day partitions the batch hits.
    // Counts/exact-decimal sums are associative, so the converged state
    // equals the full batch aggregate (the oracle) under any batch split.
    "f18_stream_mview" -> ((s, dir) =>
      EventWindows.mviewMaintainStream(s, dir).orderBy("day", "event_type")),

    // f19: streaming trending terms — a live document stream maintains a
    // BUCKET-partitioned term-df state table (f18's IVM recipe on a
    // hash-partitioned key domain: each batch reads and swaps only the
    // buckets its terms hash into). Counts are associative, so the
    // converged top-k equals the batch df top-k (the oracle) under any
    // micro-batch split.
    "f19_stream_trending" -> ((s, dir) =>
      TrendingTerms.trendingStream(s, dir)),

    // f20: targeted backfill — drop one day of the f18 maintained view
    // and repair it by replaying ONLY that day through the same merge;
    // the repaired state equals the from-scratch aggregate (the oracle),
    // proving maintain and repair are one associative code path.
    "f20_stream_backfill" -> ((s, dir) =>
      EventWindows.mviewBackfill(s, dir).orderBy("day", "event_type"))
  )

  /** Shared oracle fragments: es = whole seconds since epoch (exact integer
    * bucket arithmetic; both engines assign by floor).
    */
  private val EsEvents =
    "SELECT event_type, user_id, value, ts, " +
      "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS es, " +
      "epoch_us(ts) AS us FROM events"

  private val SumVal = "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value"

  /** One oracle for the range-join semantics — f8 (batch) and f11 (real
    * stream-stream run) must stay identical by construction.
    */
  private val RangeJoinSql =
    "SELECT p.event_id AS p_id, p.user_id, v.event_id AS v_id " +
      "FROM (SELECT * FROM events WHERE event_type = 'purchase') p " +
      "JOIN (SELECT * FROM events WHERE event_type = 'view') v " +
      "ON p.user_id = v.user_id AND v.ts <= p.ts AND p.ts < v.ts + INTERVAL 5 MINUTE " +
      "ORDER BY p_id, v_id"

  val oracle: Map[String, String] = Map(
    "f1_tumbling_agg" ->
      (s"WITH e AS ($EsEvents) " +
        s"SELECT es - es % 600 AS epoch_start, event_type, count(*) AS n, $SumVal " +
        "FROM e GROUP BY 1, 2 ORDER BY 1, 2"),
    "f2_sliding_window" ->
      (s"WITH e AS ($EsEvents), " +
        "w AS (SELECT es - es % 300 AS epoch_start, event_type, value FROM e " +
        "UNION ALL SELECT es - es % 300 - 300, event_type, value FROM e) " +
        s"SELECT epoch_start, event_type, count(*) AS n, $SumVal " +
        "FROM w GROUP BY 1, 2 ORDER BY 1, 2"),
    "f3_session_window" ->
      (s"WITH e AS ($EsEvents), " +
        "flagged AS (SELECT user_id, value, es, us, CASE WHEN us - lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) >= 1800000000 OR lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS new_s FROM e), " +
        "sess AS (SELECT user_id, value, es, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM flagged) " +
        "SELECT user_id, min(es) AS session_start, count(*) AS n_events, $SumVal " +
        "FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start")
        .replace("$SumVal", SumVal),
    "f4_watermark_late" ->
      (s"WITH e AS ($EsEvents), m AS (SELECT max(us) AS mu FROM e) " +
        s"SELECT es - es % 600 AS epoch_start, event_type, count(*) AS n, $SumVal " +
        "FROM e, m WHERE (es - es % 600 + 600) * 1000000 <= mu - 900000000 " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "f6_stateful_running" ->
      ("SELECT user_id, count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, " +
        "max(epoch_us(ts)) AS last_us FROM events GROUP BY user_id ORDER BY user_id"),
    "f7_asof_join" ->
      ("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
        "v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') " +
        "SELECT p.event_id, p.user_id, v.event_id AS view_event_id, " +
        "epoch_us(p.ts) - epoch_us(v.ts) AS gap_us " +
        "FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts " +
        "ORDER BY p.event_id"),
    "f17_asof_forward" ->
      ("WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'), " +
        "p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') " +
        "SELECT v.event_id, v.user_id, p.event_id AS purchase_event_id, " +
        "epoch_us(p.ts) - epoch_us(v.ts) AS gap_us " +
        "FROM v ASOF JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts " +
        "WHERE epoch_us(p.ts) - epoch_us(v.ts) <= 1800000000 " +
        "ORDER BY v.event_id"),
    "f8_range_join" -> RangeJoinSql,
    "f9_gapfill" ->
      (s"WITH e AS ($EsEvents), " +
        s"sparse AS (SELECT es - es % 600 AS epoch_start, event_type, count(*) AS n, $SumVal FROM e GROUP BY 1, 2), " +
        "grid AS (SELECT unnest(range((SELECT min(epoch_start) FROM sparse), " +
        "(SELECT max(epoch_start) FROM sparse) + 1, 600)) AS epoch_start), " +
        "types AS (SELECT DISTINCT event_type FROM sparse) " +
        "SELECT g.epoch_start, t.event_type, coalesce(s.n, 0) AS n, " +
        "coalesce(s.sum_value, 0.0) AS sum_value " +
        "FROM grid g CROSS JOIN types t LEFT JOIN sparse s " +
        "ON s.epoch_start = g.epoch_start AND s.event_type = t.event_type " +
        "ORDER BY g.epoch_start, t.event_type"),
    "f5_props_json" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    "f10_stream_dedup" ->
      ("SELECT event_id, epoch_us(ts) AS us, user_id, event_type, value, props " +
        "FROM events ORDER BY event_id"),
    "f11_stream_range_join" -> RangeJoinSql,
    // identical rows to e60 by construction (same manifest, same docs)
    "f24_stream_split_route" -> graft.llm.QueriesE.sqlLeakageSplit,
    // identical rows to e67 by construction (same chunker definition)
    "f25_stream_chunk" -> graft.llm.QueriesE.sqlChunkWindows,
    // identical rows to e18/e64 by construction (same training, same probe)
    "f26_stream_ivf_ingest" -> graft.llm.QueriesE.sqlIvf,
    "f27_stream_quantiles" ->
      (s"WITH e AS ($EsEvents), m AS (SELECT max(us) AS mu FROM e), " +
        "w AS (SELECT es - es % 600 AS epoch_start, value FROM e, m " +
        "WHERE (es - es % 600 + 600) * 1000000 <= mu - 900000000) " +
        "SELECT epoch_start, count(*) AS n, " +
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS exact_p50, " +
        "TRUE AS p50_in_eps, " +
        "CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY value) AS DOUBLE) AS exact_p90, " +
        "TRUE AS p90_in_eps, TRUE AS sketch_err_ok, TRUE AS sketch_n_ok, " +
        "TRUE AS n_match FROM w GROUP BY epoch_start ORDER BY epoch_start"),
    // identical report to e76 by construction (same filter, same rollup)
    "f29_stream_decontaminate" -> graft.llm.QueriesE.sqlBloomReport,
    // identical scores to e80's relation by construction (same stats,
    // same arithmetic chain)
    "f30_stream_bm25" ->
      (s"WITH ${graft.llm.QueriesE.sqlBm25Ctes()} " +
        "SELECT doc_id, score FROM scored ORDER BY doc_id"),
    // identical top-10 to e80 by construction (streamed index, same probe)
    "f31_stream_postings" ->
      (s"WITH ${graft.llm.QueriesE.sqlBm25Ctes()} " +
        "SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10"),
    // identical top-10 to e80 by construction (compaction preserves the
    // posting multiset; the probe is f31's over the compacted layout)
    "f32_index_compaction" ->
      (s"WITH ${graft.llm.QueriesE.sqlBm25Ctes()} " +
        "SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10"),
    // identical top-10 again: the policy changes WHEN folds happen, never
    // what the index contains
    "f35_policy_compaction" ->
      (s"WITH ${graft.llm.QueriesE.sqlBm25Ctes()} " +
        "SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10"),
    // e95's definition serve verbatim: the stream-maintained index holds
    // the same posting union, so masked == folded == ranks 2..11
    "f36_stream_delete_serve" -> graft.llm.QueriesE.sqlBm25DeleteServe,
    // e94's definition serve verbatim: the streamed index holds rows
    // identical to the batch artifact, so masked == folded == adc minus
    // each query's rank-1
    "f37_stream_ivfpq_delete" -> graft.llm.QueriesE.sqlIvfPqDeleteServe(
      graft.llm.QueriesE.SqlIvfPqDefaultQs),
    // identical recall relation to e90 by construction (same trainings,
    // same probe, same ADC — only the index build path differs)
    "f34_stream_ivfpq_ingest" -> graft.llm.QueriesE.oracle("e90_ann_ivfpq"),
    // good rows reproduce the clean events table verbatim (the planted
    // classes are a pure function of event_id); error_payload_ok pins
    // every dead-letter row's error payload non-empty (vacuous TRUE on
    // good rows)
    "f33_stream_quarantine" ->
      ("SELECT event_id, " +
        "CASE WHEN event_id % 97 IN (11, 29) THEN 'quarantined' ELSE 'ok' END AS status, " +
        "CASE WHEN event_id % 97 = 29 THEN 'type_drift' " +
        "WHEN event_id % 97 = 11 THEN 'bad_props' END AS error_class, " +
        "CASE WHEN event_id % 97 IN (11, 29) THEN NULL ELSE event_type END AS event_type, " +
        // -1 sentinels, not NULL, in the numeric columns (NULL→NaN in the
        // driver compare's float columns, and NaN never equals NaN)
        "CASE WHEN event_id % 97 IN (11, 29) THEN -1.0 ELSE coalesce(value, -1.0) END AS value, " +
        "CASE WHEN event_id % 97 IN (11, 29) THEN CAST(-1 AS BIGINT) " +
        "ELSE coalesce(CAST(json_extract_string(props, '$.k') AS BIGINT), -1) END AS k, " +
        "TRUE AS error_payload_ok FROM events ORDER BY event_id"),
    "f28_stream_top_users" ->
      (s"WITH e AS ($EsEvents), m AS (SELECT max(us) AS mu FROM e), " +
        "w AS (SELECT es - es % 86400 AS epoch_start, user_id FROM e, m " +
        "WHERE (es - es % 86400 + 86400) * 1000000 <= mu - 900000000), " +
        "cnt AS (SELECT epoch_start, user_id, CAST(count(*) AS BIGINT) AS exact_n " +
        "FROM w GROUP BY 1, 2), " +
        "top AS (SELECT *, row_number() OVER (PARTITION BY epoch_start " +
        "ORDER BY exact_n DESC, user_id) AS rk FROM cnt) " +
        "SELECT epoch_start, user_id, exact_n, TRUE AS covered, TRUE AS est_ok, " +
        "TRUE AS err_bound_ok, TRUE AS n_match FROM top WHERE rk <= 3 " +
        "ORDER BY epoch_start, exact_n DESC, user_id"),
    "f23_stream_shard" -> {
      val hash = "(" + (1 to 8).map { j =>
        s"(strpos('0123456789abcdef', substr(shuffle_key, $j, 1)) - 1)::BIGINT * ${1L << (4 * (8 - j))}"
      }.mkString(" + ") + ")"
      "WITH k AS (SELECT doc_id, md5('ep1|' || doc_id) AS shuffle_key FROM documents) " +
        s"SELECT doc_id, shuffle_key, CAST($hash % 8 AS INT) AS shard " +
        "FROM k ORDER BY doc_id"
    },
    "f22_stream_pq_encode" ->
      ("WITH " + graft.llm.QueriesE.sqlPqCodeCtes + " " +
        "SELECT vec_id, " +
        (0 until graft.llm.QueriesE.PqM)
          .map(j => s"p${j}code.code AS code$j").mkString(", ") +
        " FROM p0code " +
        (1 until graft.llm.QueriesE.PqM)
          .map(j => s"JOIN p${j}code USING (vec_id) ").mkString +
        "ORDER BY vec_id"),
    "f21_stream_tokenize" ->
      ("WITH " + graft.llm.QueriesE.sqlBpeCtes(graft.llm.Bpe.Iterations) +
        s", tok AS (SELECT doc_id, CAST(sum(len(t)) AS BIGINT) AS n_tok " +
        s"FROM s${graft.llm.Bpe.Iterations} GROUP BY doc_id) " +
        "SELECT d.source, count(*) AS n_docs, " +
        "CAST(sum(coalesce(tk.n_tok, 0)) AS BIGINT) AS n_tokens " +
        "FROM documents d LEFT JOIN tok tk ON tk.doc_id = d.doc_id " +
        "GROUP BY d.source ORDER BY d.source"),
    "f13_stream_static_join" ->
      ("SELECT c_mktsegment AS segment, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events JOIN customer ON user_id = c_custkey " +
        "GROUP BY 1, 2 ORDER BY 1, 2"),
    "f14_stream_upsert" ->
      ("SELECT user_id, event_id, epoch_us(ts) AS us, event_type, value FROM events " +
        "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) = 1 " +
        "ORDER BY user_id"),
    // matched pairs + unmatched purchases sealed by the final watermark
    // (global wm = min of the two sides' max event time, minus the delay)
    "f15_stream_outer_join" ->
      ("WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'), " +
        "v AS (SELECT event_id AS v_id, user_id AS v_user, ts AS v_ts FROM events WHERE event_type = 'view'), " +
        "wm AS (SELECT least((SELECT max(p_ts) FROM p), (SELECT max(v_ts) FROM v)) - INTERVAL 15 MINUTE AS wm), " +
        "j AS (SELECT p.p_id, p.user_id, v.v_id, p.p_ts FROM p LEFT JOIN v " +
        "ON p.user_id = v.v_user AND v.v_ts <= p.p_ts AND p.p_ts < v.v_ts + INTERVAL 5 MINUTE) " +
        "SELECT p_id, user_id, coalesce(v_id, -1) AS v_id FROM j CROSS JOIN wm " +
        "WHERE v_id IS NOT NULL OR p_ts < wm ORDER BY p_id, v_id"),
    "f16_stream_jdbc_sink" ->
      ("SELECT event_id, user_id, epoch_us(ts) AS us, event_type, value " +
        "FROM events WHERE event_id < 100000 ORDER BY event_id"),
    // the maintained view must equal a from-scratch daily aggregate
    "f18_stream_mview" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    // the repaired view must equal the from-scratch daily aggregate
    "f20_stream_backfill" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    // the maintained term-df state must equal the from-scratch batch df
    "f19_stream_trending" ->
      ("WITH w0 AS (SELECT doc_id, unnest(list_transform(" +
        "range(len(string_split(text,' ')) - 1), " +
        "i -> array_to_string(string_split(text,' ')[i+1:i+2], ' '))) AS term " +
        "FROM documents), " +
        "terms AS (SELECT DISTINCT doc_id, term FROM w0) " +
        "SELECT term, count(*) AS df FROM terms GROUP BY term " +
        "ORDER BY df DESC, term LIMIT 20"),
    // finalized sessions only: session end (last event + 30 min gap) must
    // be ≤ the final watermark (max event time − 15 min delay)
    "f12_stream_session" ->
      (s"WITH e AS ($EsEvents), m AS (SELECT max(us) AS mu FROM e), " +
        "flagged AS (SELECT user_id, value, es, us, CASE WHEN us - lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) >= 1800000000 OR lag(us) OVER " +
        "(PARTITION BY user_id ORDER BY us) IS NULL THEN 1 ELSE 0 END AS new_s FROM e), " +
        "sess AS (SELECT user_id, value, es, us, sum(new_s) OVER " +
        "(PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), " +
        s"agg AS (SELECT user_id, min(es) AS session_start, count(*) AS n_events, $SumVal, " +
        "max(us) AS max_us FROM sess GROUP BY user_id, sid) " +
        "SELECT user_id, session_start, n_events, sum_value FROM agg, m " +
        "WHERE max_us + 1800000000 <= mu - 900000000 " +
        "ORDER BY user_id, session_start")
  )
}
