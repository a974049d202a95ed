package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.stream.EventWindows

/** Structured Streaming semantics that the batch oracle can't check:
  * watermark-driven late-data drops across micro-batches (SURVEY.md §2.4
  * f4, FIXTURES.md §5).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  case class Ev(ts: Timestamp, event_type: String, value: Double)
  private def at(min: Long) = new Timestamp(min * 60 * 1000)

  test("watermark drops late rows; append emits only finalized windows") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev](org.apache.spark.sql.Encoders.product[Ev], spark.sqlContext)
    val agg = EventWindows.tumblingStream(mem.toDF(), "15 minutes", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_sink").start()
    try {
      // batch 1: three events in window [0,10) + one at 25min → max=25,
      // watermark after batch = 10min → window [0,10) finalizes
      mem.addData(Ev(at(1), "a", 1.0), Ev(at(2), "a", 1.0), Ev(at(5), "a", 1.0),
        Ev(at(25), "a", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE event at 3min (window already finalized → dropped)
      // + one at 55min → watermark 40min → window [20,30) finalizes
      mem.addData(Ev(at(3), "a", 99.0), Ev(at(55), "a", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("wm_sink")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(rows.contains(0L), s"window [0,10) must be emitted; got $rows")
    assert(rows(0L) == ((3L, 3.0)), s"late row must NOT count: ${rows(0L)}")
    assert(rows.contains(1200L) && rows(1200L) == ((1L, 1.0)), "window [20,30) finalized")
    assert(!rows.contains(3000L), "window [50,60) still open (watermark 40min)")
  }

  test("checkpointed parquet sink resumes without duplicating committed batches") {
    import org.apache.spark.sql.types._
    val base = new java.io.File("/root/repo/target/fixtures/test/ckpt")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(base); base.mkdirs()
    val src = s"$base/src"; val out = s"$base/out"; val chk = s"$base/chk"
    val schema = StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType)))
    def writeBatch(lo: Long, hi: Long): Unit =
      spark.range(lo, hi).selectExpr("id", "timestamp_micros(id * 1000000) AS ts")
        .write.mode("append").parquet(src)
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).parquet(src)
      val q = EventWindows.toParquetSink(in, out, chk, availableNow = true)
      try q.awaitTermination() finally q.stop()
    }
    writeBatch(0, 5)
    runOnce()
    assert(spark.read.parquet(out).count() == 5)
    // "restart": a NEW query over the same checkpoint must process ONLY the
    // files added since the last committed batch — replaying batch 1 would
    // duplicate ids 0-4 in the sink
    writeBatch(5, 8)
    runOnce()
    val ids = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == (0L until 8L), s"exactly-once resume violated: $ids")
  }

  test("stream-stream interval join matches the batch range join on the same data") {
    import spark.implicits._
    val pMem = MemoryStream[(Long, Long, Timestamp)](
      org.apache.spark.sql.Encoders.product[(Long, Long, Timestamp)], spark.sqlContext)
    val vMem = MemoryStream[(Long, Long, Timestamp)](
      org.apache.spark.sql.Encoders.product[(Long, Long, Timestamp)], spark.sqlContext)
    val joined = EventWindows.attributionJoinStream(
      pMem.toDF().toDF("p_id", "user_id", "p_ts"),
      vMem.toDF().toDF("v_id", "v_user", "v_ts"))
      .select("p_id", "v_id")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_sink").start()
    val views = Seq((101L, 1L, at(1)), (102L, 2L, at(2)))
    val purchases = Seq(
      (201L, 1L, at(4)), // 3 min after view 101 -> pair
      (202L, 1L, at(6)), // exactly windowSec after 101: p_ts < v_ts+5min fails -> no pair
      (203L, 2L, at(3))) // 1 min after view 102 -> pair
    try {
      vMem.addData(views: _*); pMem.addData(purchases.take(1): _*)
      q.processAllAvailable()
      pMem.addData(purchases.drop(1): _*) // late-arriving purchases join buffered views
      q.processAllAvailable()
      // the EXECUTED streaming plan must be the equi-keyed symmetric hash
      // join operator — the smoke sweep can only see batch plans, so the
      // stream-stream join's shape is pinned here
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(exec.contains("StreamingSymmetricHashJoin"),
        s"expected StreamingSymmetricHashJoin in:\n$exec")
    } finally q.stop()
    val streamed = spark.table("ssj_sink").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch cross-check: the same data through the batch formulation
    val batch = purchases.toDF("p_id", "user_id", "p_ts")
      .join(views.toDF("v_id", "v_user", "v_ts"),
        org.apache.spark.sql.functions.expr(
          "user_id = v_user AND v_ts <= p_ts AND p_ts < v_ts + INTERVAL 300 SECONDS"))
      .select("p_id", "v_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed == Set((201L, 101L), (203L, 102L)))
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(Long, java.sql.Timestamp, Double)], spark.sqlContext)
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val out = EventWindows.userRunningStats(spark, events)
    val q = out.toDF().writeStream.outputMode("update")
      .format("memory").queryName("state_sink").start()
    try {
      mem.addData((1L, at(1), 10.0), (1L, at(2), 5.5))
      q.processAllAvailable()
      mem.addData((1L, at(3), 0.25), (2L, at(4), 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("state_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.maxBy(_._2) }
    assert(last(1L) == ((1L, 3L, 15.75)), s"state must span batches: ${last(1L)}")
    assert(last(2L) == ((2L, 1L, 1.0)))
  }

  test("quantile sketch state merges across micro-batches (f27)") {
    import spark.implicits._
    // one window's events split adversarially over three micro-batches:
    // the state-store buffer must MERGE (values from every batch count),
    // and with n < k the merged sketch is exact — p50 over 1..9 is 5
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(java.sql.Timestamp, Double)], spark.sqlContext)
    val sk = graft.functions.AggExpressions.quantileSketch(
      org.apache.spark.sql.functions.col("value"), Seq(0.5), k = 8)
    val out = mem.toDF().toDF("ts", "value")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "10 minutes").as("w"))
      .agg(sk.as("sk"))
      .selectExpr("w.start AS ws", "sk.values[0] AS p50", "sk.n AS n")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("qsk_sink").start()
    try {
      mem.addData((at(1), 9.0), (at(2), 1.0), (at(3), 4.0))
      q.processAllAvailable()
      mem.addData((at(4), 2.0), (at(5), 8.0), (at(6), 6.0))
      q.processAllAvailable()
      mem.addData((at(7), 3.0), (at(8), 7.0), (at(9), 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("qsk_sink").collect()
      .map(r => (r.getDouble(1), r.getLong(2))).maxBy(_._2)
    assert(last == ((5.0, 9L)),
      s"merged sketch must see all 9 values across 3 batches: $last")
  }

  test("topk sketch state merges across micro-batches (f28)") {
    import spark.implicits._
    // one window's items split adversarially over three micro-batches:
    // "hot" is light in every single batch but heavy overall, and c=2
    // forces decrement rounds — the merged state must still satisfy the
    // certified contract: n totals every batch, err <= n/(c+1), and a
    // true count above err guarantees presence with est <= true <= est+err
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, String)](
      org.apache.spark.sql.Encoders.product[(java.sql.Timestamp, String)], spark.sqlContext)
    val sk = graft.functions.AggExpressions.topkSketch(
      org.apache.spark.sql.functions.col("item"), c = 2)
    val out = mem.toDF().toDF("ts", "item")
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "10 minutes").as("w"))
      .agg(sk.as("sk"))
      .selectExpr("sk.items AS items", "sk.counts AS counts",
        "sk.err AS err", "sk.n AS n")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("topk_sink").start()
    try {
      mem.addData((at(1), "hot"), (at(2), "a"), (at(3), "hot"), (at(4), "b"))
      q.processAllAvailable()
      mem.addData((at(5), "c"), (at(6), "hot"), (at(7), "a"), (at(8), "hot"))
      q.processAllAvailable()
      mem.addData((at(9), "b"), (at(9), "hot"), (at(9), "c"), (at(9), "hot"))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("topk_sink").collect().map { r =>
      (r.getSeq[String](0), r.getSeq[Long](1), r.getLong(2), r.getLong(3))
    }.maxBy(_._4)
    val (items, counts, err, n) = last
    assert(n == 12L, s"merged n must count all three batches: $n")
    assert(err * 3 <= n, s"certified ceiling violated: err=$err n=$n")
    assert(err < 6L && items.contains("hot"),
      s"true(hot)=6 > err=$err must force presence: $items")
    val estHot = counts(items.indexOf("hot"))
    assert(estHot <= 6L && 6L <= estHot + err,
      s"bracketing violated: est=$estHot err=$err")
  }

  test("streaming dedup drops repeated event ids across batches") {
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(Long, java.sql.Timestamp, Double)], spark.sqlContext)
    val events = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventWindows.dedupStream(events).writeStream
      .outputMode("append").format("memory").queryName("dd_sink").start()
    try {
      mem.addData((1L, at(1), 1.0), (2L, at(2), 2.0), (1L, at(1), 1.0))
      q.processAllAvailable()
      mem.addData((2L, at(2), 2.0), (3L, at(3), 3.0)) // dup of batch-1 id
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("dd_sink").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
  }

  test("stream dedup keys include the event-time column (state eviction)") {
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, Double)](
      org.apache.spark.sql.Encoders.product[(Long, java.sql.Timestamp, Double)], spark.sqlContext)
    val events = mem.toDF().toDF("event_id", "ts", "value")
    // Spark only evicts dedup state whose event-time key falls behind the
    // watermark; deduping on event_id alone would grow state forever
    val keys = EventWindows.dedupStream(events).queryExecution.analyzed.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.Deduplicate =>
        d.keys.map(_.name)
    }.flatten
    assert(keys.contains("event_id") && keys.contains("ts"),
      s"dedup keys must include the watermark column, got $keys")
  }

  test("parquet file sink with checkpoint lands exactly-once output") {
    val base = "/root/repo/target/fixtures/test/sink"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val q = EventWindows.toParquetSink(
      EventWindows.readStreamEvents(spark, TestSpark.Sf), out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val n = spark.read.parquet(out).count()
    assert(n == 1000L, s"all sf0.001 events land once, got $n")
    // restart against the same checkpoint: no new data -> no duplicates
    val q2 = EventWindows.toParquetSink(
      EventWindows.readStreamEvents(spark, TestSpark.Sf), out, ckpt)
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 1000L, "restart must not duplicate")
  }

  test("upsertMerge converges to the global argmax over any batch split") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/upsert")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    val state = new java.io.File(root, "state"); val stage = new java.io.File(root, "stage")
    // rows as (user_id, event_id, us, event_type, value); the global winner
    // per user is independent of how rows split into batches
    val all = Seq(
      (1L, 10L, 100L, "view", 1.0), (1L, 11L, 300L, "purchase", 2.0),
      (2L, 20L, 500L, "view", 3.0), (2L, 21L, 500L, "view", 4.0), // ts tie → max event_id
      (3L, 30L, 50L, "click", 5.0))
    val expected = Map(1L -> 11L, 2L -> 21L, 3L -> 30L)
    // adversarial split: winners arrive in the FIRST batch, later batches
    // carry only losers — the merge must keep existing winners
    val batches = Seq(
      Seq(all(1), all(3)), // winners of users 1 and 2
      Seq(all(0), all(2)), // older rows for both
      Seq(all(4)))         // user 3's only row
    batches.foreach { b =>
      EventWindows.upsertMerge(
        b.toDF("user_id", "event_id", "us", "event_type", "value"),
        state.getPath, stage.getPath)
    }
    val got = spark.read.parquet(state.getPath).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(got == expected)
    // incrementality: a batch touching only user 3 must not rewrite the
    // state buckets of other users
    def bucketState() = Option(state.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSet
      }.toMap
    val u3Bucket = spark.sql("SELECT CAST(pmod(xxhash64(CAST(3 AS BIGINT)), 16) AS INT)")
      .collect()(0).getInt(0)
    val before = bucketState() - s"bucket=$u3Bucket"
    EventWindows.upsertMerge(
      Seq((3L, 29L, 10L, "view", 0.0)) // a loser row for user 3 only
        .toDF("user_id", "event_id", "us", "event_type", "value"),
        state.getPath, stage.getPath)
    assert(bucketState() - s"bucket=$u3Bucket" == before,
      "untouched buckets were rewritten")
    val got2 = spark.read.parquet(state.getPath).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("event_id")).toMap
    assert(got2 == expected, "loser row must not displace the winner")
  }

  test("trending mergeBatch converges to batch df over any split; untouched buckets stay") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/trending_ivm")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    val state = new java.io.File(root, "state")
    val stage = new java.io.File(root, "stage")
    // "x y" spans both batches (the merge must COMBINE, not replace);
    // "x y x y" dedups within doc 1 (df counts docs, not occurrences)
    val all = Seq(
      (1L, "x y x y"), (2L, "x y z w"),
      (3L, "x y only here"), (4L, "p q r s"))
    Seq(all.take(2), all.drop(2)).foreach { b =>
      stream.TrendingTerms.mergeBatch(b.toDF("doc_id", "text"),
        state.getPath, stage.getPath)
    }
    val got = spark.read.parquet(state.getPath)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
    assert(got("x y") == 3L, s"df('x y') combines across batches and dedups in-doc: $got")
    assert(got("p q") == 1L && got("z w") == 1L)
    // incrementality: a batch whose terms miss a bucket must not rewrite it
    def bucketState() = Option(state.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSet
      }.toMap
    val before = bucketState()
    val touched = {
      // one term -> exactly one bucket touched by the next merge
      stream.TrendingTerms.mergeBatch(Seq((5L, "x y")).toDF("doc_id", "text"),
      state.getPath, stage.getPath)
      spark.read.parquet(state.getPath).filter($"term" === "x y")
    }
    assert(touched.collect()(0).getAs[Long]("df") == 4L)
    val after = bucketState()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size == 1, s"exactly the one touched bucket was swapped: $changed")
    // replay safety: the same ledgered batch id folds once, not twice
    val replay = Seq((6L, "x y")).toDF("doc_id", "text")
    stream.TrendingTerms.mergeBatch(replay, state.getPath, stage.getPath, batchId = 7L)
    stream.TrendingTerms.mergeBatch(replay, state.getPath, stage.getPath, batchId = 7L)
    val dfXY = spark.read.parquet(state.getPath).filter($"term" === "x y")
      .collect()(0).getAs[Long]("df")
    assert(dfXY == 5L, s"replayed batch 7 must skip via the ledger, df = $dfXY")
  }

  test("trending replay after a mid-batch crash folds only the unmarked buckets") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/trending_crash")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    // terms spread over enough buckets that the crash lands mid-commit
    val batch = (1L to 8L).map(i => (i, s"alpha$i beta$i gamma$i")).toDF("doc_id", "text")
    def stateOf(tag: String): (java.io.File, java.io.File) =
      (new java.io.File(root, s"$tag/state"), new java.io.File(root, s"$tag/stage"))
    // reference: the batch folded once, no crash
    val (refState, refStage) = stateOf("ref")
    stream.TrendingTerms.mergeBatch(batch, refState.getPath, refStage.getPath, batchId = 3L)
    // crashed run: drive the same fold but die after the SECOND bucket
    // swap — exactly the state a kill mid-commit leaves (some buckets
    // folded AND marked, the rest untouched)
    val (crState, crStage) = stateOf("crash")
    val ledger = new java.io.File(crState, "_batches")
    val bl = new java.io.File(ledger, "b3.parts")
    val partial = stream.TrendingTerms.termPartial(batch, 16)
    var swaps = 0
    val boom = intercept[RuntimeException] {
      api.Database.mergeTouchedPartitions(partial, "bucket",
        crState.getPath, crStage.getPath,
        onSwapped = { v =>
          bl.mkdirs()
          new java.io.FileOutputStream(new java.io.File(bl, v)).close()
          swaps += 1
          if (swaps == 2) throw new RuntimeException("simulated crash")
        })(stream.TrendingTerms.foldDf)
    }
    assert(boom.getMessage == "simulated crash")
    assert(Option(bl.listFiles()).getOrElse(Array.empty).length == 2,
      "exactly the two swapped buckets are marked")
    // replay of batch 3: must fold ONLY the unmarked buckets, then the
    // state equals the crash-free reference exactly
    stream.TrendingTerms.mergeBatch(batch, crState.getPath, crStage.getPath, batchId = 3L)
    def snap(state: java.io.File): Map[(String, Int), Long] =
      spark.read.parquet(state.getPath).collect()
        .map(r => (r.getAs[String]("term"), r.getAs[Int]("bucket")) ->
          r.getAs[Long]("df")).toMap
    assert(snap(crState) == snap(refState),
      "crash + replay must converge to the crash-free state (no double count)")
    // and the completed-batch marker now short-circuits a second replay
    stream.TrendingTerms.mergeBatch(batch, crState.getPath, crStage.getPath, batchId = 3L)
    assert(snap(crState) == snap(refState))
  }

  test("upsert replay after a mid-batch crash converges via idempotent argmax") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/upsert_crash")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    def stateOf(tag: String): (java.io.File, java.io.File) =
      (new java.io.File(root, s"$tag/state"), new java.io.File(root, s"$tag/stage"))
    // batch 1 establishes prior state; batch 2 updates some users and adds
    // new ones, spread over enough buckets that a crash lands mid-commit
    val batch1 = (1L to 8L).map(u => (u, u * 100L, u * 10L, "view", 1.0))
      .toDF("user_id", "event_id", "us", "event_type", "value")
    val batch2 = (1L to 8L).map(u => (u, u * 100L + 1L, u * 10L + 5L, "click", 2.0))
      .union((9L to 12L).map(u => (u, u * 100L, u * 10L, "view", 3.0)))
      .toDF("user_id", "event_id", "us", "event_type", "value")
    // reference: both batches folded, no crash
    val (refState, refStage) = stateOf("ref")
    stream.EventWindows.upsertMerge(batch1, refState.getPath, refStage.getPath)
    stream.EventWindows.upsertMerge(batch2, refState.getPath, refStage.getPath)
    // crashed run: fold batch 1, then die after the SECOND bucket swap of
    // batch 2 — some buckets hold batch-2 winners, the rest batch-1 state
    val (crState, crStage) = stateOf("crash")
    stream.EventWindows.upsertMerge(batch1, crState.getPath, crStage.getPath)
    var swaps = 0
    val boom = intercept[RuntimeException] {
      api.Database.mergeTouchedPartitions(
        stream.EventWindows.upsertWinners(batch2, 16), "bucket",
        crState.getPath, crStage.getPath,
        onSwapped = { _ =>
          swaps += 1
          if (swaps == 2) throw new RuntimeException("simulated crash")
        })(stream.EventWindows.upsertFoldDf)
    }
    assert(boom.getMessage == "simulated crash")
    // replay of batch 2 (no ledger needed — argmax is idempotent): the
    // already-swapped buckets re-fold to the same winners, the rest catch up
    stream.EventWindows.upsertMerge(batch2, crState.getPath, crStage.getPath)
    def snap(state: java.io.File): Map[Long, (Long, Long, String, Double)] =
      spark.read.parquet(state.getPath).collect()
        .map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("event_id"), r.getAs[Long]("us"),
            r.getAs[String]("event_type"), r.getAs[Double]("value")))).toMap
    assert(snap(crState) == snap(refState),
      "crash + replay must converge to the crash-free state")
    // and a SECOND full replay of the same batch is a no-op (idempotence)
    stream.EventWindows.upsertMerge(batch2, crState.getPath, crStage.getPath)
    assert(snap(crState) == snap(refState))
  }

  test("mview replay after a mid-batch crash folds only the unmarked days") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/mview_crash")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    def d(day: Int, min: Long) = new Timestamp((day * 1440 + min) * 60 * 1000)
    def stateOf(tag: String): (java.io.File, java.io.File) =
      (new java.io.File(root, s"$tag/state"), new java.io.File(root, s"$tag/stage"))
    // batch 1 seeds days 1-2; batch 2 touches days 1-4 (two pre-existing,
    // two new) so the crash strands a mix of folded and unfolded days
    val batch1 = Seq(
      (d(1, 10), "view", 1.25), (d(2, 5), "click", 4.00)).toDF("ts", "event_type", "value")
    val batch2 = Seq(
      (d(1, 20), "view", 2.50), (d(2, 30), "click", 0.75),
      (d(3, 15), "view", 5.00), (d(4, 40), "view", 7.25)).toDF("ts", "event_type", "value")
    // reference: both batches folded, no crash
    val (refState, refStage) = stateOf("ref")
    stream.EventWindows.mviewMergeDaily(batch1, refState.getPath, refStage.getPath, batchId = 1L)
    stream.EventWindows.mviewMergeDaily(batch2, refState.getPath, refStage.getPath, batchId = 2L)
    // crashed run: batch 1 commits, batch 2 dies after the SECOND day swap
    // with its per-day markers written (the marker-before-crash is what
    // the onSwapped hook guarantees: marker exists IFF the swap completed)
    val (crState, crStage) = stateOf("crash")
    stream.EventWindows.mviewMergeDaily(batch1, crState.getPath, crStage.getPath, batchId = 1L)
    val dayLedger = new java.io.File(new java.io.File(crState, "_batches"), "b2.parts")
    var swaps = 0
    val boom = intercept[RuntimeException] {
      api.Database.mergeTouchedPartitions(
        stream.EventWindows.dailyPartial(batch2), "day",
        crState.getPath, crStage.getPath,
        onSwapped = { v =>
          dayLedger.mkdirs()
          new java.io.FileOutputStream(new java.io.File(dayLedger, v)).close()
          swaps += 1
          if (swaps == 2) throw new RuntimeException("simulated crash")
        })(stream.EventWindows.mviewFoldDf)
    }
    assert(boom.getMessage == "simulated crash")
    assert(Option(dayLedger.listFiles()).getOrElse(Array.empty).length == 2,
      "exactly the two swapped days are marked")
    // replay of batch 2: the ledger filters the marked days out of the
    // partial — WITHOUT it the additive sums would double-count them
    stream.EventWindows.mviewMergeDaily(batch2, crState.getPath, crStage.getPath, batchId = 2L)
    def snap(state: java.io.File): Map[(String, String), (Long, java.math.BigDecimal)] =
      spark.read.parquet(state.getPath).collect()
        .map(r => (r.getAs[Any]("day").toString, r.getAs[String]("event_type")) ->
          ((r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sv")))).toMap
    assert(snap(crState) == snap(refState),
      "crash + replay must converge to the crash-free state (no double count)")
    // the completed-batch marker short-circuits a second replay entirely
    stream.EventWindows.mviewMergeDaily(batch2, crState.getPath, crStage.getPath, batchId = 2L)
    assert(snap(crState) == snap(refState))
  }

  test("mviewMergeDaily converges to the full aggregate over any batch split") {
    import spark.implicits._
    val root = new java.io.File("/root/repo/target/fixtures/test/mview_ivm")
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
      f.delete(): Unit
    }
    wipe(root); root.mkdirs()
    val state = new java.io.File(root, "state"); val stage = new java.io.File(root, "stage")
    def d(day: Int, min: Long) = new Timestamp((day * 1440 + min) * 60 * 1000)
    // (ts, event_type, value): three days; day 2 appears in both batches so
    // the second merge must COMBINE with existing state, not replace it
    val all = Seq(
      (d(1, 10), "view", 1.25), (d(1, 20), "view", 2.50), (d(2, 5), "click", 4.00),
      (d(2, 30), "click", 0.75), (d(2, 40), "view", 3.00), (d(3, 15), "view", 5.00))
    val batches = Seq(all.take(3), all.drop(3))
    batches.foreach { b =>
      EventWindows.mviewMergeDaily(b.toDF("ts", "event_type", "value"),
        state.getPath, stage.getPath)
    }
    val got = spark.read.parquet(state.getPath)
      .collect().map(r => (r.getAs[Any]("day").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[java.math.BigDecimal]("sv").doubleValue())).toMap
    val expected = all.toDF("ts", "event_type", "value")
      .groupBy(org.apache.spark.sql.functions.to_date($"ts").cast("string").as("day"), $"event_type")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(graft.rel.Q.dec2($"value")).cast("double").as("sv"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected, s"state after split merges must equal the full aggregate:\n$got\nvs $expected")
    // incrementality: a batch touching only day 3 must not rewrite the
    // day=1/day=2 partitions (IVM cost is O(touched days), not O(history))
    def partState() = Option(state.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("day=")).map { dir =>
        dir.getName -> dir.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified()).toSet
      }.toMap
    val day3 = partState().keys.max // day=1970-01-04 sorts last
    val before = partState() - day3
    EventWindows.mviewMergeDaily(
      Seq((d(3, 50), "view", 1.00)).toDF("ts", "event_type", "value"),
      state.getPath, stage.getPath)
    assert(partState() - day3 == before, "untouched day partitions were rewritten")
    val day3N = spark.read.parquet(state.getPath)
      .filter($"day".cast("string") === day3.stripPrefix("day=") && $"event_type" === "view")
      .collect()(0)
    assert(day3N.getAs[Long]("n") == 2L &&
      day3N.getAs[java.math.BigDecimal]("sv").doubleValue() == 6.0,
      s"day-3 state must fold the new row: $day3N")
  }

  test("stream-static join enrichment equals the batch join (complete mode)") {
    val streamed = graft.stream.QueriesF.all("f13_stream_static_join")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = graft.rel.Q.events(spark, TestSpark.Sf)
      .join(spark.read.parquet(s"${TestSpark.Sf}/customer.parquet"),
        org.apache.spark.sql.functions.col("user_id") === org.apache.spark.sql.functions.col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(graft.rel.Q.dec2(
          org.apache.spark.sql.functions.col("value"))).cast("double").as("sv"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.nonEmpty)
    // full equality, not subset: a broadcast-join regression that drops
    // whole (segment, type) groups must fail here
    assert(streamed == batch)
  }

  test("f15 outer join emits matched pairs plus watermark-sealed null rows only") {
    import org.apache.spark.sql.functions._
    val out = graft.stream.QueriesF.all("f15_stream_outer_join")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch replica of the oracle predicate, computed in Spark
    val ev = graft.rel.Q.events(spark, TestSpark.Sf)
      .withColumn("ts", col("ts").cast("timestamp"))
    val (p, v) = graft.stream.EventWindows.purchasesViews(ev)
    val wm = p.agg(max("p_ts")).crossJoin(v.agg(max("v_ts")))
      .select(least(col("max(p_ts)"), col("max(v_ts)"))
        .cast("long").as("wmEpoch")).collect()(0).getLong(0) - 900L
    val batch = p.join(v, graft.stream.EventWindows.rangeJoinCond(300), "left_outer")
      .filter(col("v_id").isNotNull || col("p_ts").cast("long") < wm)
      .select(col("p_id"), col("user_id"), coalesce(col("v_id"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == batch)
    assert(out.exists(_._3 == -1L), "some purchases must be unmatched+sealed")
  }

  test("batch and streaming tumbling plans agree on the finalized subset") {
    val batch = graft.stream.QueriesF.all("f1_tumbling_agg")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val streamed = graft.stream.QueriesF.all("f4_watermark_late")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(streamed.nonEmpty, "stream must emit finalized windows")
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"stream window $k disagrees with batch: $v vs ${batch(k)}")
    }
    assert(streamed.size < batch.size, "tail windows past the watermark stay open")
  }

  test("f26 stream-built IVF index: probe partition-prunes to the probed lists") {
    val df = graft.stream.QueriesF.all("f26_stream_ivf_ingest")(spark, TestSpark.Sf)
    val top = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    graft.Caches.drain()
    assert(top.length == 5, "probe returns the top-5")
    // the scan over the stream-appended index must carry the list_id
    // partition filter — ingest-time maintenance must not cost the probe
    // its partition pruning
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      s"probe scan must partition-prune on list_id:\n$plan")
  }

  test("f31 stream-built posting index: probe partition-prunes to the terms' buckets") {
    val df = graft.stream.QueriesF.all("f31_stream_postings")(spark, TestSpark.Sf)
    val top = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    graft.Caches.drain()
    assert(top.length == 10, "probe returns the top-10")
    // the scan over the stream-appended index must carry the bucket
    // partition filter even under the extra batch=<id> level — ingest
    // must not cost the probe its pruning
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("bucket")),
      s"probe scan must partition-prune on bucket:\n$plan")
    // the streamed index serves e80's rows verbatim
    val batch = graft.llm.QueriesE.all("e80_bm25_retrieval")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    graft.Caches.drain()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq == batch.toSeq,
      "streamed index and batch scorer must agree bit-exactly")
  }

  test("f32 compacted posting index: rows identical, files shrunk, probe still prunes") {
    val df = graft.stream.QueriesF.all("f32_index_compaction")(spark, TestSpark.Sf)
    val top = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    graft.Caches.drain()
    assert(top.length == 10, "probe over the compacted index returns the top-10")
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("bucket")),
      s"compacted-index probe must still partition-prune on bucket:\n$plan")
    val batch = graft.llm.QueriesE.all("e80_bm25_retrieval")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    graft.Caches.drain()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq == batch.toSeq,
      "compacted index and batch scorer must agree bit-exactly")
    // the query body's own asserts already proved file-count shrink and
    // posting-multiset identity; re-check the final layout from outside:
    // exactly one batch dir remains and it carries the supersession marker
    val index = new java.io.File(graft.Scratch.root(TestSpark.Sf, "f32"), "index")
    val dirs = Option(index.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length == 1 &&
      new java.io.File(dirs(0), "_compacted_through").isFile,
      s"one marked batch dir after full compaction: ${dirs.map(_.getName).toSeq}")
  }

  test("f34 streamed IVFPQ index serves e90's recall relation from the compacted layout") {
    val df = graft.stream.QueriesF.all("f34_stream_ivfpq_ingest")(spark, TestSpark.Sf)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val plan = df.queryExecution.executedPlan.toString
    graft.Caches.drain()
    val batch = graft.llm.QueriesE.all("e90_ann_ivfpq")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.Caches.drain()
    assert(rows.toSeq == batch.toSeq,
      "streamed+compacted code index and batch artifact must agree bit-exactly")
    assert(plan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("list_id")),
      s"probe over the streamed index must partition-prune on list_id:\n$plan")
    val index = new java.io.File(graft.Scratch.root(TestSpark.Sf, "f34"), "index")
    val dirs = Option(index.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length == 1 &&
      new java.io.File(dirs(0), "_compacted_through").isFile,
      s"one marked batch dir after full compaction: ${dirs.map(_.getName).toSeq}")
  }

  test("f33 structured quarantine: both planted classes dead-lettered, good rows clean") {
    import org.apache.spark.sql.functions.col
    val df = graft.stream.QueriesF.all("f33_stream_quarantine")(spark, TestSpark.Sf)
    val rows = df.collect()
    graft.Caches.drain()
    val total = graft.rel.Q.events(spark, TestSpark.Sf).count()
    assert(rows.length == total, "every input row lands in exactly one sink")
    val byClass = rows.filter(_.getString(1) == "quarantined")
      .groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(byClass.keySet == Set("type_drift", "bad_props"),
      s"both corruption classes detected: $byClass")
    // every quarantined row keeps an addressable id (recovered from the
    // raw line for type-drift rows that lost their typed event_id)
    assert(rows.filter(_.getString(1) == "quarantined").forall(!_.isNullAt(0)),
      "dead-letter rows stay addressable by event_id")
    assert(rows.forall(_.getBoolean(6)), "every dead-letter error is non-empty")
    // good rows are the clean table verbatim (spot-check against batch)
    val ok = rows.filter(_.getString(1) == "ok")
      .map(r => r.getLong(0) -> ((r.getString(3), r.getDouble(4)))).toMap
    val clean = graft.rel.Q.events(spark, TestSpark.Sf)
      .filter(col("event_id") % 97 =!= 11 && col("event_id") % 97 =!= 29)
      .select(col("event_id"), col("event_type"), col("value"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(ok == clean, "good rows bit-identical to the clean run")
  }

  test("compactStreamIndex recovery deletes batches a crash left superseded") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("compact-crash").toFile
    def writeBatch(id: Long, ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(i => (i, i % 3)))
        .toDF("doc_id", "bucket")
        .write.partitionBy("bucket")
        .parquet(new java.io.File(root, s"batch=$id").getPath)
    writeBatch(0, Seq(1L, 2L, 3L))
    writeBatch(1, Seq(4L, 5L))
    writeBatch(2, Seq(6L))
    // simulate the crash window: batches 0..1 folded into batch=1 (marker
    // written, swap completed) but the process died BEFORE deleting the
    // superseded batch=0 — rows 1..5 exist twice on disk
    graft.api.Database.compactStreamIndex(spark, root.getPath, "bucket", upTo = 1L): Unit
    val folded = new java.io.File(root, "batch=1")
    assert(new java.io.File(folded, "_compacted_through").isFile)
    spark.createDataFrame(Seq((1L, 1L % 3), (2L, 2L % 3), (3L, 0L)))
      .toDF("doc_id", "bucket").write.partitionBy("bucket")
      .parquet(new java.io.File(root, "batch=0").getPath) // resurrect the leftover
    val dup = spark.read.parquet(root.getPath).count()
    assert(dup == 9, s"crash state holds duplicated rows, got $dup")
    // the next compaction's recovery pass must drop the superseded dir
    // FIRST, so the fold sees each row exactly once
    graft.api.Database.compactStreamIndex(spark, root.getPath, "bucket"): Unit
    val rows = spark.read.parquet(root.getPath)
      .select(col("doc_id")).orderBy(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.toSeq == (1L to 6L),
      s"recovered index holds each row exactly once: ${rows.toSeq}")
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.map(_.getName).toSeq == Seq("batch=2"),
      s"full compaction converges to the highest id: ${dirs.map(_.getName).toSeq}")
  }

  test("compactStreamIndex recovery restores a crash INSIDE swapDir (.bak orphan)") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("compact-crash2").toFile
    def writeBatch(id: Long, ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(i => (i, i % 3)))
        .toDF("doc_id", "bucket")
        .write.partitionBy("bucket")
        .parquet(new java.io.File(root, s"batch=$id").getPath)
    writeBatch(0, Seq(1L, 2L, 3L))
    writeBatch(1, Seq(4L, 5L))
    writeBatch(2, Seq(6L))
    // simulate a crash in swapDir's narrowest window: the live target was
    // renamed aside to batch=1.bak, the process died BEFORE the staged
    // dir took its place — batch=1 is GONE from the readable layout and
    // the compacted stage is stranded as batch=1.stage_tmp
    val target = new java.io.File(root, "batch=1")
    val bak = new java.io.File(root, "batch=1.bak")
    val stage = new java.io.File(root, "batch=1.stage_tmp")
    assert(target.renameTo(bak), "test setup: stage the target aside")
    spark.createDataFrame(Seq((1L, 1L), (2L, 2L), (3L, 0L), (4L, 1L), (5L, 2L)))
      .toDF("doc_id", "bucket").write.partitionBy("bucket")
      .parquet(stage.getPath)
    new java.io.FileOutputStream(
      new java.io.File(stage, "_compacted_through")).close()
    // the next compaction's recovery pass must restore the orphaned .bak
    // (rows 4..5 become visible again), reclaim the un-promoted stage,
    // and then fold normally — every row exactly once, nothing lost
    graft.api.Database.compactStreamIndex(spark, root.getPath, "bucket"): Unit
    val rows = spark.read.parquet(root.getPath)
      .select(col("doc_id")).orderBy(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.toSeq == (1L to 6L),
      s"recovered index holds each row exactly once: ${rows.toSeq}")
    assert(!bak.exists() && !stage.exists(), "crash residue fully reclaimed")
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.map(_.getName).toSeq == Seq("batch=2"),
      s"full compaction converges to the highest id: ${dirs.map(_.getName).toSeq}")
  }

  test("compactStreamIndex drops superseded .bak residue and uninflated counts") {
    val root = java.nio.file.Files.createTempDirectory("compact-crash3").toFile
    def writeBatch(id: Long, ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(i => (i, i % 3)))
        .toDF("doc_id", "bucket")
        .write.partitionBy("bucket")
        .parquet(new java.io.File(root, s"batch=$id").getPath)
    writeBatch(0, Seq(1L, 2L, 3L))
    writeBatch(1, Seq(4L, 5L))
    // simulate a crash AFTER the swap promoted the compacted dir but
    // BEFORE swapDir wiped the backup: primary exists (with marker), the
    // .bak holds the pre-compaction copy of the target's own rows
    val stale = new java.io.File(root, "batch=1.bak")
    spark.createDataFrame(Seq((4L, 1L), (5L, 2L)))
      .toDF("doc_id", "bucket").write.partitionBy("bucket")
      .parquet(stale.getPath)
    new java.io.FileOutputStream(
      new java.io.File(new java.io.File(root, "batch=1"),
        "_compacted_through")).close()
    val stats = graft.api.Database.compactStreamIndex(spark, root.getPath, "bucket")
    assert(!stale.exists(), "superseded .bak reclaimed when the primary exists")
    // counts are defined over parsed batch=<long> dirs only — the residue
    // (and the marker recovery's deletions) never inflate files_before
    val n = spark.read.parquet(root.getPath).count()
    assert(n == 2L, s"marker recovery dropped the superseded batch=0: $n")
    assert(stats("files_after") <= stats("files_before"),
      s"residue must not inflate the observability counts: $stats")
  }

  test("compactStreamIndexIfNeeded holds under budget, fires over it") {
    val root = java.nio.file.Files.createTempDirectory("compact-policy").toFile
    def writeBatch(id: Long, ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(i => (i, i % 3)))
        .toDF("doc_id", "bucket")
        .write.partitionBy("bucket")
        .parquet(new java.io.File(root, s"batch=$id").getPath)
    writeBatch(0, Seq(1L, 2L, 3L))
    // one committed dir: never folds regardless of budget
    assert(graft.api.Database.compactStreamIndexIfNeeded(spark, root.getPath,
      "bucket", maxDataFiles = 0L).isEmpty, "a single dir has nothing to fold")
    writeBatch(1, Seq(4L, 5L))
    val live = spark.read.parquet(root.getPath).inputFiles.length.toLong
    // under budget: holds
    assert(graft.api.Database.compactStreamIndexIfNeeded(spark, root.getPath,
      "bucket", maxDataFiles = live).isEmpty, "policy holds while under budget")
    // over budget: folds to one dir, rows intact
    val stats = graft.api.Database.compactStreamIndexIfNeeded(spark, root.getPath,
      "bucket", maxDataFiles = live - 1)
    assert(stats.exists(_("dirs_after") == 1L), s"policy fired and folded: $stats")
    val n = spark.read.parquet(root.getPath).count()
    assert(n == 5L, s"policy fold preserves every row: $n")
  }

  test("compactStreamIndexWithTombstones: bounded fold keeps the epoch, full fold drops rows and reclaims it") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("compact-tomb").toFile
    def writeBatch(id: Long, ids: Seq[Long]): Unit =
      spark.createDataFrame(ids.map(i => (i, i % 3)))
        .toDF("doc_id", "bucket")
        .write.partitionBy("bucket")
        .parquet(new java.io.File(root, s"batch=$id").getPath)
    writeBatch(0, Seq(1L, 2L, 3L))
    writeBatch(1, Seq(4L, 5L))
    writeBatch(2, Seq(6L))
    graft.api.Database.addTombstones(spark, root.getPath,
      Seq(2L, 6L).toDF("doc_id"), "doc_id")
    // bounded mid-stream fold (≤ 1): batch=2 is outside the fold and
    // still carries deleted row 6 — the logical mask must stay in force
    graft.api.Database.compactStreamIndexWithTombstones(spark, root.getPath,
      "bucket", "doc_id", upTo = 1L): Unit
    assert(new java.io.File(root, "_tombstones").isDirectory,
      "bounded fold keeps the epoch (later batches still carry deleted rows)")
    spark.catalog.refreshByPath(root.getPath)
    val afterBounded = spark.read.parquet(root.getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterBounded == Set(1L, 3L, 4L, 5L, 6L),
      s"folded prefix drops its tombstoned rows, unfolded batch keeps its own: $afterBounded")
    // full fold: every dir covered — rows physically gone, epoch reclaimed
    val s2 = graft.api.Database.compactStreamIndexWithTombstones(spark, root.getPath,
      "bucket", "doc_id")
    assert(s2("dirs_after") == 1L, s"$s2")
    assert(!new java.io.File(root, "_tombstones").exists(),
      "a full fold reclaims the epoch")
    val afterFull = spark.read.parquet(root.getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterFull == Set(1L, 3L, 4L, 5L), s"$afterFull")
    // the crash window between a full fold and the epoch delete — and
    // equally a single-batch stream: ONE live dir + a pending epoch.
    // Without foldSingle the rows could never be physically dropped
    graft.api.Database.addTombstones(spark, root.getPath,
      Seq(4L).toDF("doc_id"), "doc_id")
    val s3 = graft.api.Database.compactStreamIndexWithTombstones(spark, root.getPath,
      "bucket", "doc_id")
    assert(s3("dirs_after") == 1L, s"$s3")
    assert(!new java.io.File(root, "_tombstones").exists(),
      "a single-dir fold still reclaims the epoch")
    spark.catalog.refreshByPath(root.getPath)
    val afterSingle = spark.read.parquet(root.getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(afterSingle == Set(1L, 3L, 5L),
      s"single-dir fold physically drops the tombstoned row: $afterSingle")
  }

  test("f35 policy compaction serves e80's top-10 from the steady-state layout") {
    val df = graft.stream.QueriesF.all("f35_policy_compaction")(spark, TestSpark.Sf)
    val top = df.collect()
    graft.Caches.drain()
    val batch = graft.llm.QueriesE.all("e80_bm25_retrieval")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    graft.Caches.drain()
    assert(top.map(r => (r.getLong(0), r.getDouble(1))).toSeq == batch.toSeq,
      "policy-compacted index and batch scorer must agree bit-exactly")
    val index = new java.io.File(graft.Scratch.root(TestSpark.Sf, "f35"), "index")
    val dirs = Option(index.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length == 1 &&
      new java.io.File(dirs(0), "_compacted_through").isFile,
      s"one marked batch dir after the terminal policy pass: ${dirs.map(_.getName).toSeq}")
  }

  test("f37 stream IVFPQ delete: masked serve equals compacted serve, deleted ids absent") {
    val df = graft.stream.QueriesF.all("f37_stream_ivfpq_delete")(spark, TestSpark.Sf)
    val rows = df.collect()
    graft.Caches.drain()
    assert(rows.nonEmpty, "gate must serve rows")
    assert(rows.forall(_.getAs[Boolean]("not_deleted")),
      "no served row may carry a tombstoned vec_id in either phase")
    val byPhase = rows.groupBy(_.getAs[String]("phase")).map { case (p, rs) =>
      p -> rs.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("pos"),
        r.getAs[Long]("vec_id"))).toSet
    }
    assert(byPhase.keySet == Set("masked", "compacted"), s"${byPhase.keySet}")
    assert(byPhase("masked") == byPhase("compacted"),
      "tombstone mask and physical fold must serve identical results")
    // the fold left a single batch dir and no epoch in the stream root
    val index = new java.io.File(graft.Scratch.root(TestSpark.Sf, "f37"), "index")
    val dirs = Option(index.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
    assert(dirs.length == 1, s"${dirs.map(_.getName).toSeq}")
    assert(!new java.io.File(index, "_tombstones").exists(),
      "full fold reclaims the epoch")
  }

  test("f25 stream chunker equals the batch e67 chunk windows") {
    val streamed = graft.stream.QueriesF.all("f25_stream_chunk")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .toSet
    val batch = graft.llm.QueriesE.all("e67_chunk_windows")(spark, TestSpark.Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getString(4)))
      .toSet
    graft.Caches.drain()
    assert(streamed == batch, "ingest-time chunking must match the batch chunker")
  }

  test("f23 stream shard routing equals the batch e61 assignment") {
    val streamed = graft.stream.QueriesF.all("f23_stream_shard")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val batch = graft.llm.QueriesE.all("e61_shuffle_shard")(spark, TestSpark.Sf)
      .select("doc_id", "shuffle_key", "shard")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    graft.Caches.drain()
    assert(streamed == batch, "ingest-time routing must match the batch manifest")
  }
}
