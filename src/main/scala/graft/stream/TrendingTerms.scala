package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextExpressions

/** f19 — streaming trending-term maintenance: the streaming complement of
  * e39's document-frequency index. A live document stream folds per-batch
  * df partials into a BUCKET-PARTITIONED term-count state table; the
  * trending read is a top-k over the converged state.
  *
  * Scale design (the f14/f18 incremental recipe applied to an unbounded
  * key domain): terms don't partition by a natural range the way days do,
  * so the state hash-partitions by `xxhash64(term) mod nBuckets` and each
  * batch reads + atomically swaps ONLY the buckets its own terms hash
  * into — per-batch cost is O(touched state + batch), never O(full
  * vocabulary). Counts are associative, so the converged state equals the
  * from-scratch batch df under ANY split of the corpus into micro-batches
  * (unit-tested with an adversarial split; the declared query's oracle is
  * the batch formulation).
  *
  * Reference scope note: the reference engine has no streaming surface at
  * all (datum is request/response ETL) — this whole group is north-star
  * surface, same status as e38.
  */
object TrendingTerms {

  /** One maintenance step (the foreachBatch body, separated for unit
    * tests): per-doc distinct 2-gram terms come out of the scan (native
    * kernel — distinct by construction, no dedup shuffle), reduce to a
    * (term, df) partial with map-side combine, then merge into the
    * touched state buckets and swap them (backup-hop swap: no instant
    * where a bucket's previous state is deleted without the new state or
    * its .bak on disk).
    */
  def mergeBatch(batch: DataFrame, state: String, stage: String,
      nBuckets: Int = 16, batchId: Long = -1L): Unit =
    // counts are NOT idempotent (unlike f14's argmax), so a checkpoint
    // REPLAY must not re-fold state it already folded — the shared
    // two-level ledger (Database.mergeTouchedPartitionsExactlyOnce)
    // makes the plain-file multi-bucket commit exactly-once
    graft.api.Database.mergeTouchedPartitionsExactlyOnce(
      termPartial(batch, nBuckets), "bucket", state, stage,
      // repartition the folded state by its partition column before the
      // staged write (r19, the f32 compaction rationale): each touched
      // bucket lands as ONE file from one task instead of a sliver from
      // every agg task — up to tasks×buckets fewer file commits per
      // merge, and the steady-state layout a compacted index maintains
      batchId)((ex, p) => foldDf(ex, p).repartition(col("bucket")))

  /** The per-batch (term, df, bucket) partial (exposed for the
    * crash-replay test, which drives a fold that dies mid-swap).
    */
  private[graft] def termPartial(batch: DataFrame, nBuckets: Int): DataFrame =
    batch.select(col("doc_id"),
        explode(TextExpressions.distinctShingles(col("text"), 2)).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("bucket",
        pmod(xxhash64(col("term")), lit(nBuckets.toLong)).cast("int"))

  /** The merge folded into the touched buckets (shared by [[mergeBatch]]
    * and the crash-replay test).
    */
  private[graft] def foldDf(existing: Option[DataFrame],
      p: DataFrame): DataFrame =
    existing.fold(p)(p.unionByName(_))
      .groupBy("term", "bucket").agg(sum(col("df")).cast("long").as("df"))

  /** End-to-end: stream the corpus through [[mergeBatch]] (AvailableNow
    * micro-batches, checkpointed), then read the converged state and
    * return the top-`k` terms by (df DESC, term) — deterministic under
    * the total tie-break.
    */
  def trendingStream(spark: SparkSession, dir: String,
      outRoot: String = "/root/repo/target/fixtures/out/f19",
      // 8 shuffle partitions like the sibling stream gates (r19,
      // EventWindows.withShufflePartitions' rationale): the per-batch df
      // partial and the folded vocabulary are tiny relative to the core
      // count, so 32-way shuffles here are pure per-task overhead — and
      // the 32-task partitionBy write fanned up to 32×nBuckets small
      // file commits per merge. On a cluster this sizes to the state
      // volume, not the local core count.
      k: Int = 20): DataFrame = EventWindows.withShufflePartitions(spark, 8) {
    val state = s"$outRoot/state"
    val stage = s"$outRoot/stage"
    val chk = s"$outRoot/chk"
    wipe(state); wipe(stage); wipe(chk)
    graft.api.Fs.mkdirs(graft.api.Fs.path(outRoot))
    val q = graft.llm.Dedup.readStreamDocuments(spark, dir).writeStream
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        mergeBatch(batch, state, stage, batchId = id)
      }
      .start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(state)
      .select("term", "df")
      .orderBy(col("df").desc, col("term")).limit(k)
  }

  private def wipe(p: String): Unit = {
    graft.api.Fs.delete(graft.api.Fs.path(p)): Unit
  }
}
