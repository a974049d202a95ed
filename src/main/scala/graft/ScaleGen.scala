package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus replicator for scale rehearsals: writes a `factor`× copy of a
  * testdata scale-factor directory, preserving the join graph and the
  * per-replica data distribution.
  *
  * Key domains are shifted per replica by `stride = max(key)+1`, applied
  * consistently to BOTH sides of every join edge (custkey ↔ o_custkey /
  * user_id, orderkey ↔ l_orderkey, partkey/suppkey, doc_id ↔ vec_id), so
  * each replica is a self-consistent sub-corpus and every equi-join
  * produces exactly `factor`× the rows. The fixed dimensions
  * (region/nation) are copied once — TPC-H keeps them constant across
  * scale factors, and inflating them would distort broadcast-side sizes.
  *
  * Document text gets a replica-unique suffix on every token (replica 0
  * keeps the originals), so shingle/minhash/span structure repeats
  * per-replica instead of every doc gaining `factor−1` cross-replica
  * twins: dedup/LSH/dup-span work scales LINEARLY with the corpus, which
  * is the scaling hypothesis the rehearsal measures. Embeddings get the
  * VECTOR analogue of the token suffix: each replica's vectors pass
  * through a replica-specific signed permutation of the dimensions — an
  * orthogonal transform, so every WITHIN-replica inner product, norm,
  * cosine, and L2 distance is preserved exactly (near-dup structure,
  * k-means/IVF cluster geometry, and LSH occupancy repeat per replica),
  * while cross-replica twins disappear (a vector and its rotated copy
  * are ~orthogonal). Without this, every vector gains `factor−1` EXACT
  * twins and the near-dup PAIR RELATION itself is quadratic in the
  * factor — the r8 sf10 rehearsal hit exactly that wall (e8 spilled the
  * disk enumerating twin pairs that only the replication artifact
  * created). Replica 0 keeps the originals (vec_id 0, the fixed query
  * vector, is unchanged).
  *
  * **Skew mode** (4th arg `skew`): uniform replication never exercises
  * AQE's skew-join split or the salting levers — every key owns 1/n of
  * its table at any factor. With `skew`, ~30% of the fact rows funnel
  * onto ONE hot key per join edge (an existing replica-0 key, so the
  * join graph stays dangling-free): orders.o_custkey and events.user_id
  * → the first customer (one viral user), lineitem.l_orderkey → the
  * first order (one mega-order), documents.source → one hot domain (the
  * boilerplate-heavy crawl host). The 30% membership is a deterministic
  * per-row hash, so reruns see the identical corpus.
  *
  * Usage: `runMain graft.ScaleGen <srcSfDir> <dstDir> [factor=10] [skew]`.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val skew = args.length > 3 && args(3) == "skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).head.getLong(0) + 1L
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")
    def rep(df: DataFrame)(remap: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => remap(df, i)).reduce(_.unionByName(_))
    def shifted(df: DataFrame, i: Int, shifts: (String, Long)*): DataFrame =
      shifts.foldLeft(df) { case (d, (c, s)) =>
        d.withColumn(c, col(c) + lit(s * i)) }

    val K = stride(rd("customer"), "c_custkey")
    val O = stride(rd("orders"), "o_orderkey")
    val P = stride(rd("part"), "p_partkey")
    val S = stride(rd("supplier"), "s_suppkey")
    val D = math.max(stride(rd("documents"), "doc_id"),
      stride(rd("embeddings"), "vec_id"))
    val E = stride(rd("events"), "event_id")

    // skew targets: existing replica-0 keys, so every redirected FK still
    // has its dim row; 30% membership by deterministic per-row hash
    def minKey(df: DataFrame, c: String): Long =
      df.agg(min(col(c).cast("long"))).head.getLong(0)
    lazy val hotCust = minKey(rd("customer"), "c_custkey")
    lazy val hotOrder = minKey(rd("orders"), "o_orderkey")
    // hot by-name: the min-key aggregation jobs must only run in skew
    // mode (a by-value param would force the lazy vals on every call)
    def skewKey(df: DataFrame, keyCol: String, hot: => Long,
        mix: Seq[String]): DataFrame =
      if (!skew) df
      else df.withColumn(keyCol,
        when(pmod(xxhash64(mix.map(col): _*), lit(10)) < 3, lit(hot))
          .otherwise(col(keyCol)))

    write(rd("region"), "region")
    write(rd("nation"), "nation")
    write(rep(rd("customer"))((d, i) => shifted(d, i, "c_custkey" -> K)),
      "customer")
    write(rep(rd("supplier"))((d, i) => shifted(d, i, "s_suppkey" -> S)),
      "supplier")
    write(rep(rd("part"))((d, i) => shifted(d, i, "p_partkey" -> P)), "part")
    write(skewKey(rep(rd("orders"))((d, i) =>
      shifted(d, i, "o_orderkey" -> O, "o_custkey" -> K)),
      "o_custkey", hotCust, Seq("o_orderkey")), "orders")
    write(skewKey(rep(rd("lineitem"))((d, i) =>
      shifted(d, i, "l_orderkey" -> O, "l_partkey" -> P, "l_suppkey" -> S)),
      "l_orderkey", hotOrder, Seq("l_orderkey", "l_linenumber")),
      "lineitem")
    write(skewKey(rep(rd("events"))((d, i) =>
      shifted(d, i, "event_id" -> E, "user_id" -> K)),
      "user_id", hotCust, Seq("event_id")), "events")
    // signed-permutation rotation per replica: dim j reads source dim
    // (j + 7i) mod dims with a sign that flips on (j + i) mod 3 — both
    // vary with i, so no two replicas (factor ≤ ~192) share a transform.
    // Orthogonal ⇒ within-replica geometry is bit-preserved up to float
    // rounding-free reordering (it is a permutation + sign flip: EXACT).
    val dims = rd("embeddings").selectExpr("size(embedding)").head.getInt(0)
    write(rep(rd("embeddings")) { (d, i) =>
      val s = shifted(d, i, "vec_id" -> D)
      if (i == 0) s
      else s.withColumn("embedding", expr(
        s"transform(sequence(0, ${dims - 1}), j -> CAST(" +
          s"element_at(embedding, pmod(j + ${7 * i}, $dims) + 1) * " +
          s"(CASE WHEN pmod(j + $i, 3) = 0 THEN -1.0 ELSE 1.0 END) AS FLOAT))"))
    }, "embeddings")
    val docs = rep(rd("documents")) { (d, i) =>
      val s = shifted(d, i, "doc_id" -> D)
      if (i == 0) s
      else s
        .withColumn("text", regexp_replace(col("text"), "\\S+", s"$$0_r$i"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }
    write(
      if (!skew) docs
      else {
        // hot domain must be an EXISTING replica-0 source (the scaladoc /
        // SCALING.md invariant: every hot key is a real key, so per-source
        // queries see no synthetic host) — use the min source value, which
        // is deterministic for a fixed input corpus (r8 advisor finding)
        val hotSource = rd("documents").agg(min(col("source")))
          .head.getString(0)
        docs.withColumn("source",
          when(pmod(xxhash64(col("doc_id")), lit(10)) < 3,
            lit(hotSource)).otherwise(col("source")))
      },
      "documents")

    println(s"""{"scalegen":"$dst","factor":$factor,"skew":$skew}""")
    spark.stop()
  }
}
