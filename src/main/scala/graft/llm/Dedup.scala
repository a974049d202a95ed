package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (BASELINE.json
  * north star; the reference has no analogue — its "dedup" story is the
  * truncate-and-reload ETL idiom).
  *
  * Hashing is md5-based throughout: identical lowercase-hex output in every
  * engine, so DuckDB oracles reproduce signatures byte-for-byte, and at
  * cluster scale md5 is a cheap, uniformly-distributed shuffle key.
  *
  * Scale design:
  *  - exact dedup = a map-side-combined groupBy on the digest + join back
  *    (never a window — a hot digest would serialize onto one task); the
  *    shuffle carries (digest, id), never the document bodies;
  *  - minhash signatures are **array-native** (`transform`/`array_min`
  *    HOFs): computed inside the scan stage with NO explode and NO
  *    shuffle — the per-doc k×shingles work is embarrassingly parallel;
  *    only the final signature→cluster grouping shuffles k hashes per doc;
  *  - banded-LSH near-dup (minhashBands) shuffles (band-digest, id) pairs —
  *    candidate pairs emerge from equi-joins on band digest, the standard
  *    O(n·bands) alternative to the O(n²) pair join;
  *  - simhash is explode + one 32-column integer aggregate (partial
  *    map-side combine keeps the shuffle at 32 ints per doc).
  */
object Dedup {

  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles; empty array when the doc is shorter than n. */
  def shingles(text: Column, n: Int): Column = {
    val tok = tokens(text)
    when(size(tok) >= n,
      transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", slice(tok, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** k-permutation minhash signature columns s0..s(k-1) — min over
    * md5("j|" + shingle) per permutation j, computed array-native.
    */
  def minhashSig(sh: Column, k: Int): Seq[Column] =
    (0 until k).map { j =>
      array_min(transform(sh, x => md5(concat(lit(s"$j|"), x)))).as(s"s$j")
    }

  /** Exact-duplicate clustering: cluster id = min doc id sharing the text
    * digest. NULL text carries no equality evidence — such docs each stay
    * their own cluster (the left join misses on a null key, mirroring the
    * null-signature guard in [[minhashClusters]]).
    *
    * The per-digest min is a MAP-SIDE-COMBINED `groupBy.agg(min)` + join
    * back (the e30 recipe), NOT a window over the digest: a window forces
    * every row of one key onto a single task, so the canonical web-corpus
    * pathology — one boilerplate page duplicated 10⁸× — would serialize.
    * The aggregate reduces each hot key locally per partition and the join
    * back shuffles both sides on the same digest key Catalyst already
    * planned for the aggregate.
    */
  def exactClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.select(col(idCol), md5(col(textCol)).as("_digest"))
    val mins = keyed.filter(col("_digest").isNotNull)
      .groupBy("_digest").agg(min(col(idCol)).as("_min_id"))
    keyed.join(mins, Seq("_digest"), "left")
      .select(col(idCol), coalesce(col("_min_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_dup", col(idCol) =!= col("cluster_id"))
  }

  /** Near-duplicate clustering by full-signature equality: docs whose k
    * minhashes all agree land in one cluster (≈ Jaccard ≥ high threshold).
    * Signatures come from the native one-pass kernel (bit-identical to the
    * [[minhashSig]] HOF spec — pinned by LlmSpec — at a fraction of the
    * per-row cost).
    */
  def minhashClusters(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 4): DataFrame = {
    val sig = df.select(col(idCol),
      graft.functions.TextExpressions.minhashSig(col(textCol), n, k).as("_sig"))
    val sigCols = (0 until k).map(j => col("_sig").getItem(j).as(s"s$j"))
    val named = sig.select(col(idCol) +: sigCols: _*)
    val sigKey = (0 until k).map(j => s"s$j")
    // per-signature min id via map-side-combined aggregate + join back —
    // same hot-key rationale as [[exactClusters]]. Docs shorter than n
    // tokens have NULL signatures: they carry no similarity evidence and
    // each stay their own cluster (the null key joins to nothing; the
    // kernel emits all-or-nothing null signatures, so s0 is the witness).
    val mins = named.filter(col("s0").isNotNull)
      .groupBy(sigKey.map(col): _*).agg(min(col(idCol)).as("_min_id"))
    named.join(mins, sigKey, "left")
      .select(col(idCol),
        concat_ws("|", sigKey.map(col): _*).as("signature"),
        coalesce(col("_min_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_dup", col(idCol) =!= col("cluster_id"))
  }

  /** Per-doc LSH band digests `(id, band, digest)` — the rows a PERSISTED
    * near-dup index holds: `bands` small rows per doc, joinable on
    * (band, digest). Signatures come from the native one-pass kernel
    * ([[graft.functions.MinhashKernel]] — bit-identical to the HOF
    * formulation, ~50× cheaper). Factored out of [[minhashBandPairs]] so
    * an incremental ingest can band a delta and equi-join it against an
    * existing corpus's digests instead of re-banding everything.
    */
  def bandDigests(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val k = bands * rowsPerBand
    val sig = df.select(col(idCol),
        graft.functions.TextExpressions.minhashSig(col(textCol), n, k).as("_sig"))
      .filter(col("_sig").isNotNull) // short docs carry no similarity evidence
    sig.select(col(idCol), explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(concat_ws("|",
            (0 until rowsPerBand).map(r => col("_sig").getItem(b * rowsPerBand + r)): _*)).as("digest"))
      }: _*)).as("bd"))
      .select(col(idCol), col("bd.band"), col("bd.digest"))
  }

  /** Banded LSH candidate pairs: split a k=bands×rows signature into bands,
    * join on (band index, band digest). Returns candidate id pairs (a<b).
    * This is the scale path: O(n·bands) shuffle instead of O(n²) compare;
    * the tiny banded relation (bands rows × one digest per doc) feeds both
    * sides of the self-join — the signature pass runs once per side over
    * the scan, never per candidate.
    */
  def minhashBandPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val banded = bandDigests(df, idCol, textCol, n, bands, rowsPerBand)
      // both sides of the self-join read the cached digests instead of
      // re-running the signature pass over the corpus; the relation is
      // bands rows × (id, int, 32-char digest) per doc — small relative to
      // the documents themselves at any scale. Tracked: Caches.drain()
      // frees it once the caller has materialized the result.
      .transform(graft.Caches.persistTracked)
    val l = banded.as("l"); val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.digest") === col("r.digest") &&
        col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b")).distinct()
  }

  /** Connected components over an undirected candidate-pair graph:
    * cluster id = min node id reachable from each node. The standard
    * "near-dup pairs → dedup clusters" closure a training pipeline needs
    * (pairs alone under-remove: A~B, B~C must collapse to one cluster).
    *
    * Iterative min-label propagation: each round joins labels to the edge
    * list and takes the min of (own label, neighbours' labels), until a
    * fixpoint. Every round is one shuffle join + one aggregation —
    * the classic DataFrame connected-components shape; rounds needed =
    * graph diameter (near-dup clusters are shallow, typically ≤ 3).
    * The fixpoint (min id per component) is deterministic regardless of
    * iteration or partition order. The loop exits when a round changes
    * nothing; exceeding `maxIters` raises (a truncated propagation would
    * silently mislabel deep chains).
    *
    * Cache lifetime: the returned plan references the final `labels` frame
    * (and `minhashBandPairs`-style callers reference their digest caches);
    * unpersisting before the caller's action would force a full lineage
    * recompute, so they are registered with [[graft.Caches]] and freed by
    * the harness's per-query `drain()` after the result materializes.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
      pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    // iterate ONLY over nodes that appear in an edge: an isolated node's
    // label never changes, and in a dedup graph paired nodes are a small
    // fraction of the corpus — propagating labels for every document every
    // round would shuffle the whole id space per iteration for nothing.
    // Isolated nodes rejoin as their own cluster at the end.
    // seed with the first propagation round folded in (min of self and
    // direct neighbours): size-2 clusters — the common dedup case — are
    // already converged and pay only the no-change check
    var labels = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("_m"))
      .select(col("id"), least(col("id"), col("_m")).as("label")).persist()
    var converged = false
    var i = 0
    while (!converged && i <= maxIters) {
      // neighbour labels: edge dst carries its current label to src; every
      // iterated node has ≥1 neighbour, so the join is inner
      val nbr = edges.join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "nbr_label"), "dst")
        .groupBy(col("src").as("id")).agg(min("nbr_label").as("nbr_min"))
      val next = labels.join(nbr, "id")
        .select(col("id"), least(col("label"), col("nbr_min")).as("label"))
        .persist()
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.label") =!= col("o.label")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    // silently truncated propagation would return WRONG clusters (and
    // diverge from the oracle's full transitive closure) — fail loudly
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: not converged after $maxIters iterations " +
        "(component diameter exceeds maxIters — raise it)")
    edges.unpersist()
    graft.Caches.register(labels)
    nodes.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("label", "cluster_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** 32-bit simhash over whitespace tokens. Bit j (= 4·(p−1)+b) is set iff
    * the signed count of bit b of hex digit p of md5(token) is positive.
    * Integer arithmetic only ⇒ engine-portable.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .withColumn("h", md5(col("w")))
    val withDigits = (1 to 8).foldLeft(toks) { (d, p) =>
      d.withColumn(s"d$p", expr(s"instr('0123456789abcdef', substring(h, $p, 1)) - 1"))
    }
    val bitSums = (0 until 32).map { j =>
      val p = j / 4 + 1; val b = j % 4
      sum(when(shiftright(col(s"d$p"), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = withDigits.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 32).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sim.as("simhash"))
  }

  /** Rabin–Karp rolling-hash fingerprint (winnowing-style): polynomial
    * hash of every `w`-char window, fingerprint = the minimum hash. With
    * w=8 and base 31 the polynomial Σ c_j·31^(w−1−j) stays < 2⁶³ for ASCII
    * so the integer arithmetic is exact and engine-portable (no modulo).
    * Array-native (no explode): scan-local at any scale.
    */
  def rollingFingerprint(text: Column, w: Int = 8): Column = {
    val pows = Array.iterate(1L, w)(_ * 31L) // 31^0 .. 31^(w-1)
    val windowHash = (i: Column) =>
      (0 until w).map { j =>
        ascii(substr(text, i + lit(j + 1), lit(1))) * lit(pows(w - 1 - j))
      }.reduce(_ + _)
    when(length(text) >= w,
      array_min(transform(sequence(lit(0), length(text) - w), windowHash)))
      .otherwise(lit(null).cast("long"))
  }

  /** EXECUTABLE SPEC of winnowed substring fingerprints (Schleimer et al.
    * 2003): distinct minima of each `winnowW` consecutive `w`-codepoint
    * rolling hashes ([[rollingFingerprint]]'s polynomial), null when the
    * text is shorter than `w + winnowW − 1` codepoints. Kept as the
    * readable composable formulation the LlmSpec pins the native kernel
    * against — do NOT use in queries: CollapseProject inlines the hash
    * array's `transform` into the winnow lambda, re-materializing the
    * whole array per winnow position (O(len²·w) interpreted — measured 18
    * min over 500 sf0.01 docs). Production path:
    * [[graft.functions.TextExpressions.winnowFps]] (O(len), codegen'd).
    */
  def winnowFingerprints(text: Column, w: Int = 8, winnowW: Int = 4): Column = {
    val pows = Array.iterate(1L, w)(_ * 31L)
    val windowHash = (i: Column) =>
      (0 until w).map { j =>
        ascii(substr(text, i + lit(j + 1), lit(1))) * lit(pows(w - 1 - j))
      }.reduce(_ + _)
    val hs = transform(sequence(lit(0), length(text) - w), windowHash)
    when(length(text) >= w + winnowW - 1,
      array_distinct(transform(sequence(lit(0), length(text) - w - winnowW + 1),
        i => array_min(slice(hs, i + lit(1), lit(winnowW))))))
      .otherwise(lit(null).cast("array<bigint>"))
  }

  /** Document fingerprint: md5 of the 3 lexicographically-smallest shingle
    * digests (a min-k sketch — winnowing-style selection, stable under
    * content reordering). Array-native, no shuffle.
    */
  def fingerprint(text: Column, n: Int = 3): Column =
    md5(concat_ws("",
      slice(array_sort(transform(shingles(text, n), x => md5(x))), 1, 3)))

  /** The streaming schema of documents.parquet. */
  val docsSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
  }

  /** Read documents as a micro-batch stream from its parquet file. */
  def readStreamDocuments(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    spark.readStream.schema(docsSchema).parquet(s"$dir/documents.*")

  /** Bucket count of the persisted band-digest index: the index is laid
    * out as `bucket=<xxhash64(digest) mod IndexBuckets>/` parquet
    * partitions (the f19/mergeTouchedPartitions state recipe), so an
    * ingesting batch reads ONLY the buckets its own digests hash into —
    * per-batch IO is O(index/IndexBuckets × touched buckets), never the
    * whole corpus's digests. At 100 TB this constant scales up with the
    * corpus (buckets should hold ~1 HDFS block each — thousands of
    * buckets); at bench scale it stays small because every bucket dir
    * costs one file commit per ingesting batch. Digests are md5, so the
    * xxhash64 bucketing is uniform regardless of key skew.
    */
  val IndexBuckets = 16

  /** The index partition column for a digest. */
  def indexBucket(digest: Column): Column =
    pmod(xxhash64(digest), lit(IndexBuckets.toLong))

  /** The existing index partition dirs a batch's touched buckets map to —
    * factored out so tests can pin that a batch reads only its buckets.
    */
  private[graft] def touchedIndexDirs(index: String,
      buckets: Seq[Long]): Seq[String] =
    buckets.distinct.sorted.map(b => s"$index/bucket=$b")
      .filter(p => graft.api.Fs.isDir(graft.api.Fs.path(p)))

  /** One streaming near-dup INGEST step (the foreachBatch body, separated
    * for unit tests): band the batch with the native minhash kernel, flag
    * each doc that shares a band digest with the PERSISTED index (any
    * previously ingested doc) or with an earlier-id doc of its own batch,
    * append the flags, then fold the batch's digests into the index
    * (append-only, digest-bucketed — see [[IndexBuckets]]). Per-batch cost
    * is O(batch + touched index buckets + collisions): the corpus is never
    * re-banded AND never re-read wholesale — only the `bucket=` partitions
    * the batch's digests hash into are scanned for the index join. The
    * streaming twin of e33's incremental ingest.
    *
    * Determinism contract: with id-ordered arrival (a replayed corpus
    * file), the union of per-batch flags equals the global earlier-id
    * candidate rule — which is what the DuckDB oracle computes. Bucket
    * pruning cannot change the flags: an index row joining a batch row on
    * (band, digest) shares its digest, hence its bucket.
    */
  def ingestBatch(batch: DataFrame, index: String,
      flags: String): Unit = {
    val sp = batch.sparkSession
    // consumed by the flag joins, the touched-bucket collect, and the
    // index append
    val banded = bandDigests(batch, "doc_id", "text")
      .withColumn("bucket", indexBucket(col("digest"))).persist()
    try {
      val within = banded
        .select(col("band"), col("digest"), col("doc_id").as("idx_id"))
        .join(banded.select(col("band"), col("digest"), col("doc_id")),
          Seq("band", "digest"))
        .filter(col("idx_id") < col("doc_id"))
        .select(col("doc_id"), col("idx_id"))
      val touched = banded.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSeq // ≤ IndexBuckets values
      val dirs = touchedIndexDirs(index, touched)
      val pairs =
        if (dirs.isEmpty) within
        else within.unionByName(
          sp.read.option("basePath", index)
            .parquet(dirs: _*)
            .drop("bucket").withColumnRenamed("doc_id", "idx_id")
            .join(banded, Seq("band", "digest"))
            .select(col("doc_id"), col("idx_id")))
      pairs.groupBy("doc_id")
        .agg(countDistinct(col("idx_id")).as("n_matches"),
          min(col("idx_id")).as("first_match"))
        .write.mode("append").parquet(flags)
      // cluster rows by bucket before the partitioned append: without it
      // every task writes a sliver into every bucket dir (tasks × buckets
      // tiny files per batch); with it each bucket's rows land in one file
      banded.repartition(col("bucket"))
        .write.partitionBy("bucket").mode("append").parquet(index)
    } finally { banded.unpersist(); () }
  }

  /** Streaming near-dup ingest end-to-end: stream the corpus file through
    * [[ingestBatch]] (AvailableNow micro-batches, checkpointed) and read
    * back the accumulated flags — every doc that near-duplicates an
    * earlier-ingested one, with its match count and first match.
    * `outRoot` (index + flags + checkpoint root) is caller-supplied: a
    * library operator has no business hard-coding a scratch path.
    */
  def ingestStreamToParquet(spark: org.apache.spark.sql.SparkSession,
      dir: String, outRoot: String): DataFrame = {
    def wipe(p: String): Unit = { graft.api.Fs.delete(graft.api.Fs.path(p)): Unit }
    val index = s"$outRoot/index"
    val flags = s"$outRoot/flags"
    val chk = s"$outRoot/chk"
    wipe(index); wipe(flags); wipe(chk)
    graft.api.Fs.mkdirs(graft.api.Fs.path(outRoot))
    val q = readStreamDocuments(spark, dir).writeStream
      .option("checkpointLocation", chk)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, index, flags)
      }
      .start()
    try q.awaitTermination() finally q.stop()
    spark.read.parquet(flags)
  }
}
