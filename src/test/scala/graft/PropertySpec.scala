package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property layer (SURVEY.md §5.2 layer 3): algebraic laws over
  * the pure kernels — projection round-trips, text-kernel counting
  * invariants, exact-dedup model equivalence. The kernels are plain JVM
  * functions, so each property runs its full 100 generated cases without a
  * Spark job; only the dedup model property starts Spark, with a reduced
  * case count.
  */
object GraftProps extends Properties("graft") {

  // ---- Projection round-trips (hand-rolled LCC + Transverse Mercator) ----

  /** EPSG:2272 (PA South, US-ft) domain: roughly the state's extent. */
  private val paX = Gen.choose(2.35e6, 2.75e6)
  private val paY = Gen.choose(1.0e5, 4.9e5)

  property("transform 2272 -> 4326 -> 2272 is identity within 0.01 ft") =
    forAll(paX, paY) { (x, y) =>
      val (lon, lat) = graft.spatial.Projection.transform(x, y, 2272, 4326)
      val (x2, y2) = graft.spatial.Projection.transform(lon, lat, 4326, 2272)
      math.abs(x2 - x) < 0.01 && math.abs(y2 - y) < 0.01
    }

  property("projected -> projected routes through the hub and round-trips") =
    forAll(paX, paY) { (x, y) =>
      val (e, n) = graft.spatial.Projection.transform(x, y, 2272, 26918)
      val (x2, y2) = graft.spatial.Projection.transform(e, n, 26918, 2272)
      math.abs(x2 - x) < 0.02 && math.abs(y2 - y) < 0.02
    }

  property("2272 -> 3857 (web mercator) -> 2272 round-trips within 0.02 ft") =
    forAll(paX, paY) { (x, y) =>
      val (e, n) = graft.spatial.Projection.transform(x, y, 2272, 3857)
      val (x2, y2) = graft.spatial.Projection.transform(e, n, 3857, 2272)
      math.abs(x2 - x) < 0.02 && math.abs(y2 - y) < 0.02
    }

  property("2272 -> 5070 (conus albers) -> 2272 round-trips within 0.02 ft") =
    forAll(paX, paY) { (x, y) =>
      val (e, n) = graft.spatial.Projection.transform(x, y, 2272, 5070)
      val (x2, y2) = graft.spatial.Projection.transform(e, n, 5070, 2272)
      math.abs(x2 - x) < 0.02 && math.abs(y2 - y) < 0.02
    }

  // ---- Text kernels: counting invariants vs a direct model ----

  private val word: Gen[String] =
    Gen.chooseNum(0, 6).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val text: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  /** Random arcs: center, radius, three ccw angles with real separation
    * (near-collinear triples take the straight-line path by design).
    */
  private val arcCase: Gen[(Double, Double, Double, Double, Double, Double, Double)] = for {
    cx <- Gen.choose(-1e4, 1e4); cy <- Gen.choose(-1e4, 1e4)
    r <- Gen.choose(0.5, 2000.0)
    a0 <- Gen.choose(0.0, 2 * math.Pi)
    d1 <- Gen.choose(0.2, 2.0); d2 <- Gen.choose(0.2, 2.0)
    tolFrac <- Gen.choose(1e-3, 0.5)
  } yield (cx, cy, r, a0, a0 + d1, a0 + d1 + d2, tolFrac * r)

  property("curveToLineTol: every chord's sagitta stays within the tolerance") =
    forAll(arcCase) { case (cx, cy, r, a0, a1, a2, tol) =>
      def pt(a: Double) = (cx + r * math.cos(a), cy + r * math.sin(a))
      val (x0, y0) = pt(a0); val (x1, y1) = pt(a1); val (x2, y2) = pt(a2)
      val wkt = s"CIRCULARSTRING($x0 $y0, $x1 $y1, $x2 $y2)"
      val out = graft.spatial.Wkt.curveToLineTol(wkt, tol)
      val coords = out.stripPrefix("LINESTRING (").stripSuffix(")")
        .split(",").map { s =>
          val Array(x, y) = s.trim.split("\\s+").map(_.toDouble); (x, y)
        }
      // per consecutive pair: subtended angle around the TRUE center ->
      // sagitta r(1-cos(d/2)) must respect the bound (small fp slack: the
      // re-derived circumcenter differs from the generator's in the last
      // ulps, which perturbs the angles)
      val sagittaOk = coords.iterator.sliding(2).forall { w =>
        val (px, py) = w.head; val (qx, qy) = w.last
        val pa = math.atan2(py - cy, px - cx); val qa = math.atan2(qy - cy, qx - cx)
        var d = math.abs(qa - pa)
        if (d > math.Pi) d = 2 * math.Pi - d
        r * (1 - math.cos(d / 2)) <= tol * (1 + 1e-6) + 1e-9
      }
      // endpoints preserved (head exactly, tail to fp re-derivation)
      val endsOk = coords.head == ((x0, y0)) &&
        math.hypot(coords.last._1 - x2, coords.last._2 - y2) <= 1e-6 * r
      sagittaOk && endsOk
    }

  property("charPairs emits exactly max(|w|-1, 0) pairs per word, in order") =
    forAll(text) { t =>
      val got = graft.functions.MinhashKernel.charPairs(t)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val model = t.split(" ", -1).toSeq.flatMap(w => w.sliding(2).filter(_.length == 2))
      got == model
    }

  property("repetitionStats counters satisfy their defining bounds") =
    forAll(text) { t =>
      val r = graft.functions.MinhashKernel.repetitionStats(t)
      val tokens = t.split(" ", -1)
      val (top2, n2, n3, d3) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val grams2 = tokens.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      val modelTop = if (grams2.isEmpty) 0L
        else grams2.groupBy(identity).values.map(_.size).max.toLong
      n2 == math.max(tokens.length - 1, 0).toLong &&
        n3 == math.max(tokens.length - 2, 0).toLong &&
        top2 == modelTop && d3 <= n3 && (n3 == 0 || d3 >= 1)
    }

  property("minhash signature: k lowercase-hex minima, null iff < n tokens") =
    forAll(text) { t =>
      val sig = graft.functions.MinhashKernel.sig(t, 3, 8)
      val enough = t.split(" ", -1).length >= 3
      if (!enough) sig == null
      else sig.length == 8 && sig.forall(h => h.length == 32 &&
        h.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    }

  property("distinctShingles = first-occurrence-distinct sliding n-grams (model)") =
    forAll(text, Gen.chooseNum(1, 4)) { (t, n) =>
      val got = graft.functions.MinhashKernel.distinctShingles(t, n)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val toks = t.split(" ", -1).toSeq
      val model =
        if (toks.length < n) Nil
        else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
      got == model
    }

  property("posShingles = all sliding n-grams in position order (model)") =
    forAll(text, Gen.chooseNum(1, 4)) { (t, n) =>
      val got = graft.functions.MinhashKernel.posShingles(t, n)
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val toks = t.split(" ", -1).toSeq
      val model =
        if (toks.length < n) Nil
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      got == model
    }

  property("winnowFps = distinct sliding minima of the direct polynomial model") =
    forAll(text, Gen.chooseNum(2, 10), Gen.chooseNum(2, 5)) { (t, w, winnowW) =>
      val got = graft.functions.MinhashKernel.winnowFps(t, w, winnowW)
      val cps = t.codePoints().toArray
      if (cps.length < w + winnowW - 1) got == null
      else {
        val pows = Array.iterate(1L, w)(_ * 31L)
        val hs = (0 to cps.length - w)
          .map(i => (0 until w).map(j => cps(i + j) * pows(w - 1 - j)).sum)
        val model = (0 to hs.length - winnowW)
          .map(i => hs.slice(i, i + winnowW).min).distinct
        got.toLongArray().toSeq == model
      }
    }

  property("BpeKernel single merge = the greedy left-to-right scan model") =
    forAll(word, Gen.alphaLowerChar, Gen.alphaLowerChar) { (wrd, xc, yc) =>
      val (x, y) = (xc.toString, yc.toString)
      @annotation.tailrec
      def go(rem: List[String], acc: List[String]): List[String] = rem match {
        case a :: b :: rest if a == x && b == y => go(rest, (a + b) :: acc)
        case a :: rest => go(rest, a :: acc)
        case Nil => acc
      }
      graft.functions.BpeKernel.tokens(wrd, Array(s"$x|$y")).toSeq ==
        go(wrd.map(_.toString).toList, Nil).reverse
    }

  property("BpeKernel.tokens concatenation reconstructs the word; counts agree") =
    forAll(text, Gen.listOfN(3,
      for { a <- Gen.alphaLowerChar; b <- Gen.alphaLowerChar } yield s"$a|$b")) { (t, ms) =>
      val words = t.split(" ", -1).filter(_.nonEmpty)
      val toks = words.map(w => graft.functions.BpeKernel.tokens(w, ms.toArray))
      toks.zip(words).forall { case (ts, w) => ts.mkString == w } &&
        graft.functions.BpeKernel.tokenCount(t, ms.toArray) == toks.map(_.length.toLong).sum
    }

  // ---- Point-in-polygon: JTS covers vs the exact half-plane model ----

  /** Andrew monotone chain over integer points → CCW convex hull.
    * Integer cross products ⇒ the hull is exactly convex, so the d11
    * oracle's all-edges-cross-≥-0 test is a faithful model of covers().
    */
  private def hull(pts: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val s = pts.distinct.sorted
    if (s.length < 3) return Nil
    def cross(o: (Long, Long), a: (Long, Long), b: (Long, Long)): Long =
      (a._1 - o._1) * (b._2 - o._2) - (a._2 - o._2) * (b._1 - o._1)
    def chain(ps: Seq[(Long, Long)]): Seq[(Long, Long)] =
      ps.foldLeft(List.empty[(Long, Long)]) { (acc, p) =>
        var h = acc
        while (h.length >= 2 && cross(h(1), h.head, p) <= 0) h = h.tail
        p :: h
      }.reverse.dropRight(1)
    val lower = chain(s); val upper = chain(s.reverse)
    val h = lower ++ upper
    if (h.length < 3) Nil else h
  }

  private val intPt: Gen[(Long, Long)] =
    for { x <- Gen.chooseNum(-1000L, 1000L); y <- Gen.chooseNum(-1000L, 1000L) }
      yield (x, y)

  private val hullAndProbes: Gen[(Seq[(Long, Long)], List[(Long, Long)])] = for {
    raw <- Gen.listOfN(8, intPt)
    probes <- Gen.listOfN(12, intPt)
  } yield (hull(raw), probes)

  property("Wkt.covers agrees with the exact half-plane model on convex hulls") =
    forAll(hullAndProbes) { case (h, probes) =>
      h.isEmpty || {
        val wkt = (h :+ h.head).map { case (x, y) => s"$x $y" }
          .mkString("POLYGON ((", ", ", "))")
        def model(px: Long, py: Long): Boolean =
          (h :+ h.head).sliding(2).forall { e =>
            val (x1, y1) = e(0); val (x2, y2) = e(1)
            (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
          }
        // probe random points PLUS every vertex (boundary inclusivity)
        (probes ++ h).forall { case (px, py) =>
          graft.spatial.Wkt.covers(wkt, px.toDouble, py.toDouble) == model(px, py)
        }
      }
    }

}

/** Spark-backed model property, in its own Properties so it can run a
  * reduced case count (each case is a real Spark job).
  */
object GraftSparkProps extends Properties("graft-spark") {
  // default 10 (each case is a real Spark job); the round close raises
  // it via GRAFT_PROP_MIN for a one-time deeper fuzz of the skipping
  // soundness surface (the r14 verdict's NNF-hardening ask)
  override def overrideParameters(p: org.scalacheck.Test.Parameters):
      org.scalacheck.Test.Parameters = p.withMinSuccessfulTests(
    sys.env.get("GRAFT_PROP_MIN").flatMap(_.toIntOption).getOrElse(10))

  private val docList: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 20)
    texts <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
  } yield texts.zipWithIndex.map { case (txt, i) => (i.toLong, txt) }

  property("exactClusters cluster_id = min doc id sharing the text (model)") = {
    val spark = TestSpark.spark
    import spark.implicits._
    forAll(docList) { rows =>
      val got = graft.llm.Dedup
        .exactClusters(rows.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val model = rows.map { case (id, txt) =>
        id -> rows.filter(_._2 == txt).map(_._1).min
      }.toMap
      got == model
    }
  }

  /** Shared fixture for the skipping-soundness property: a multi-file
    * table with per-file bands on a numeric, a string (numeric-looking
    * AND wordy values), and a small-domain column, nulls in all three,
    * sidecar tracking all three — the full surface the DNF band check
    * and its type guard must stay conservative over.
    */
  private lazy val skipTbl: graft.api.Table = {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val root = "/root/repo/target/fixtures/test/skip_prop"
    new java.io.File(root).mkdirs()
    val db = graft.api.Datum.connect(s"parquet://$root")
    def sOf(k: Long): String =
      if (k % 11 == 0) null
      else if (k % 3 == 0) k.toString
      else if (k % 3 == 1) s"w${k % 17}"
      else (k * 7 % 1000).toString
    val rows: Seq[(java.lang.Long, String, java.lang.Long)] =
      (1L to 600L).map { k =>
        (if (k % 13 == 0) null else java.lang.Long.valueOf(k),
          sOf(k), java.lang.Long.valueOf(k % 7))
      }
    val df = rows.toDF("k", "s", "g")
    // three disjoint k-band files + the null-k rows in their own file,
    // so every generated range really exercises the skip decision
    df.filter(org.apache.spark.sql.functions.col("k") <= 200)
      .coalesce(1).write.mode("overwrite").parquet(db.pathOf("sp"))
    df.filter(org.apache.spark.sql.functions.col("k") > 200 &&
        org.apache.spark.sql.functions.col("k") <= 400)
      .coalesce(1).write.mode("append").parquet(db.pathOf("sp"))
    df.filter(org.apache.spark.sql.functions.col("k") > 400)
      .coalesce(1).write.mode("append").parquet(db.pathOf("sp"))
    df.filter(org.apache.spark.sql.functions.col("k").isNull)
      .coalesce(1).write.mode("append").parquet(db.pathOf("sp"))
    val t = db.table("sp")
    t.analyzeStats(Seq("k", "s", "g")): Unit
    t
  }

  private val skipOps = Gen.oneOf("=", "<", ">", "<=", ">=", "<>")
  private val skipInts = Gen.chooseNum(-50, 700)
  private val skipStrLit = Gen.oneOf("'100'", "'99'", "'300'", "'w3'",
    "'w15'", "'zz'", "''")
  private def skipAtom: Gen[String] = Gen.oneOf(
    for { c <- Gen.oneOf("k", "g"); op <- skipOps; v <- skipInts }
      yield s"$c $op $v",
    for { a <- skipInts; b <- skipInts } yield s"k BETWEEN $a AND $b",
    for { n <- Gen.chooseNum(1, 4); vs <- Gen.listOfN(n, skipInts) }
      yield s"k IN (${vs.mkString(", ")})",
    for { op <- skipOps; v <- skipStrLit } yield s"s $op $v",
    for { n <- Gen.chooseNum(1, 3); vs <- Gen.listOfN(n, skipStrLit) }
      yield s"s IN (${vs.mkString(", ")})",
    // cross-type shapes: the exact class the r13 verdict's latent
    // mis-prune lived in — the guard must keep these conservative
    for { op <- skipOps; v <- skipInts } yield s"s $op $v",
    for { op <- skipOps; v <- Gen.oneOf("'10'", "'300'") }
      yield s"k $op $v")
  private def skipExpr(depth: Int): Gen[String] =
    if (depth == 0) skipAtom
    else Gen.frequency(
      3 -> skipAtom,
      2 -> (for { a <- skipExpr(depth - 1); b <- skipExpr(depth - 1) }
        yield s"($a AND $b)"),
      2 -> (for { a <- skipExpr(depth - 1); b <- skipExpr(depth - 1) }
        yield s"($a OR $b)"),
      // NOT is load-bearing since the NNF rewrite (r15): negations now
      // EXTRACT bands instead of staying opaque, so the generator leans
      // on them — including NOT-of-IN/BETWEEN via NOT over the atoms
      2 -> skipExpr(depth - 1).map(e => s"(NOT $e)"),
      1 -> (for { v <- skipInts; w <- skipInts }
        yield s"k NOT BETWEEN $v AND $w"),
      1 -> (for { n <- Gen.chooseNum(1, 4); vs <- Gen.listOfN(n, skipInts) }
        yield s"k NOT IN (${vs.mkString(", ")})"))
  private val skipPreds: Gen[List[String]] =
    Gen.listOfN(8, skipExpr(2))

  property("file skipping is SOUND for arbitrary where texts: read(where) = full-scan filter") = {
    val tbl = skipTbl
    org.scalacheck.Prop.forAllNoShrink(skipPreds) { preds =>
      preds.forall { w =>
        // ANSI mode: a cross-type predicate may THROW on a malformed
        // cast ('w13' -> BIGINT). Skipping may legitimately avoid the
        // failing row (Spark's own row-group pruning does the same), so
        // a throwing FULL scan constrains nothing; a successful full
        // scan demands the pruned read return the identical multiset.
        val full = scala.util.Try(
          tbl.df.filter(org.apache.spark.sql.functions.expr(w))
            .select("k", "s", "g").collect().map(_.toString).sorted.toSeq)
        full match {
          case scala.util.Failure(_) => true
          case scala.util.Success(rows) =>
            val pruned = tbl.read(where = Some(w))
              .select("k", "s", "g").collect().map(_.toString).sorted.toSeq
            val ok = pruned == rows
            if (!ok) println(s"[skip-prop] MISMATCH on: $w " +
              s"(pruned ${pruned.size} rows, full ${rows.size})")
            ok
        }
      }
    }
  }

  private val keyedBatches: Gen[List[List[(Int, Long)]]] = for {
    n <- Gen.chooseNum(1, 18)
    rows <- Gen.listOfN(n, for {
      k <- Gen.chooseNum(0, 4); v <- Gen.chooseNum(1L, 9L)
    } yield (k, v))
    cut1 <- Gen.chooseNum(0, n)
    cut2 <- Gen.chooseNum(0, n)
  } yield {
    val (a, b) = (math.min(cut1, cut2), math.max(cut1, cut2))
    List(rows.take(a), rows.slice(a, b), rows.drop(b)).filter(_.nonEmpty)
  }

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 24).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))

  property("rollingFingerprint = min polynomial hash over 8-char windows (model)") = {
    val spark = TestSpark.spark
    import spark.implicits._
    forAll(asciiText) { t =>
      val got = Seq(t).toDF("text")
        .select(graft.llm.Dedup.rollingFingerprint(org.apache.spark.sql.functions.col("text")).as("rh"))
        .collect()(0)
      val w = 8
      val pows = Array.iterate(1L, w)(_ * 31L)
      if (t.length < w) got.isNullAt(0)
      else {
        val model = (0 to t.length - w).map { i =>
          (0 until w).map(j => t.charAt(i + j).toLong * pows(w - 1 - j)).sum
        }.min
        !got.isNullAt(0) && got.getLong(0) == model
      }
    }
  }

  property("mergeTouchedPartitions folds any batch sequence to the direct aggregate") = {
    val spark = TestSpark.spark
    import spark.implicits._
    var run = 0
    forAll(keyedBatches) { batches =>
      run += 1
      val root = new java.io.File(s"/root/repo/target/fixtures/test/mtp_prop/$run")
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
        f.delete(): Unit
      }
      wipe(root); root.mkdirs()
      val state = new java.io.File(root, "state")
      val stage = new java.io.File(root, "stage")
      batches.foreach { b =>
        val partial = b.toDF("bucket", "v")
          .groupBy("bucket").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
        graft.api.Database.mergeTouchedPartitions(partial, "bucket",
          state.getPath, stage.getPath) {
          (existing, p) =>
            existing.fold(p)(p.unionByName(_)).groupBy("bucket")
              .agg(org.apache.spark.sql.functions.sum($"s").as("s"))
        }
      }
      val got =
        if (!state.isDirectory) Map.empty[Int, Long]
        else spark.read.parquet(state.getPath)
          .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("s")).toMap
      val model = batches.flatten.groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sum }
      got == model
    }
  }

  private val termDocs: Gen[(List[(Long, String)], Int)] = for {
    n <- Gen.chooseNum(1, 12)
    texts <- Gen.listOfN(n, Gen.chooseNum(0, 5).flatMap(k =>
      Gen.listOfN(k + 2, Gen.oneOf("ax", "by", "cz", "dw", "ev")).map(_.mkString(" "))))
    cut <- Gen.chooseNum(0, n)
  } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, cut)

  /** b20's two-pass rewrite derives ntile/percent_rank/cume_dist
    * arithmetically from (row_number, group size) instead of windowing a
    * whole priority group onto one task. This property pins the closed
    * forms against Spark's OWN window functions under a total order —
    * bucket boundaries, the (rank−1)/(n−1) and rn/n double divisions —
    * for random sizes incl. n<4 (empty ntile buckets) and heavy ties in
    * the first sort key (broken by the unique second key).
    */
  property("b20 closed forms = Spark's rank windows under a total order") = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    forAll(Gen.chooseNum(1, 50), Gen.long) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val rows = (1 to n).map(k => (k.toLong, rnd.nextInt(8).toLong))
      val w = Window.orderBy(col("price"), col("k"))
      val got = rows.toDF("k", "price").select(
        row_number().over(w).as("rn"), ntile(4).over(w).as("q4"),
        percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd")).collect()
      got.forall { r =>
        val rn = r.getAs[Int]("rn").toLong
        val bs = n / 4; val rem = n % 4; val cut = rem.toLong * (bs + 1)
        val q4 =
          if (rn <= cut) (rn - 1) / (bs + 1) + 1
          else rem + (rn - cut - 1) / math.max(bs, 1) + 1
        val pr = if (n == 1) 0.0 else (rn - 1).toDouble / (n - 1).toDouble
        val cd = rn.toDouble / n.toDouble
        r.getAs[Int]("q4").toLong == q4 &&
          r.getAs[Double]("pr") == pr && r.getAs[Double]("cd") == cd
      }
    }
  }

  /** Q.topKPerGroup's two-phase recipe (local top-K per scan partition →
    * global top-K over the bounded survivors) must equal the one-window
    * top-K under ANY partitioning — the superset argument it rests on.
    */
  property("topKPerGroup = one-window top-K under ANY partitioning") = {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    forAll(Gen.chooseNum(1, 30), Gen.chooseNum(1, 8), Gen.long) {
      (n, parts, seed) =>
        val rnd = new scala.util.Random(seed)
        val rows = (1 to n).map(i =>
          (i.toLong, s"g${rnd.nextInt(3)}", rnd.nextInt(5).toLong))
        val df = rows.toDF("id", "g", "v").repartition(parts)
        val got = graft.rel.Q.topKPerGroup(df, "g", 2,
            Seq(col("v").desc, col("id")))
          .select("g", "id", "rank").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
        val model = rows.groupBy(_._2).flatMap { case (g, rs) =>
          rs.sortBy(r => (-r._3, r._1)).take(2).zipWithIndex
            .map { case (r, i) => (g, r._1, i + 1) }
        }.toSet
        got == model
    }
  }

  property("trending mergeBatch state = batch df under ANY split point") = {
    val spark = TestSpark.spark
    import spark.implicits._
    var run = 0
    forAll(termDocs) { case (rows, cut) =>
      run += 1
      val root = new java.io.File(s"/root/repo/target/fixtures/test/trend_prop/$run")
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
        f.delete(): Unit
      }
      wipe(root); root.mkdirs()
      val state = new java.io.File(root, "state")
      val stage = new java.io.File(root, "stage")
      Seq(rows.take(cut), rows.drop(cut)).filter(_.nonEmpty).foreach { b =>
        graft.stream.TrendingTerms.mergeBatch(b.toDF("doc_id", "text"),
        state.getPath, stage.getPath)
      }
      val got =
        if (!state.isDirectory) Map.empty[String, Long]
        else spark.read.parquet(state.getPath)
          .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df")).toMap
      val model = rows
        .flatMap { case (_, t) =>
          t.split(" ").toSeq.sliding(2).filter(_.length == 2).map(_.mkString(" ")).distinct }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      got == model
    }
  }
}

/** Pure-kernel sketch properties (no Spark) — full case count. */
object GraftSketchProps extends Properties("graft-sketch") {

  // ---- Bloom filter (BloomHelper byte-layout + one-sided error) ----

  private val bloomCase: Gen[(List[Long], List[Long], Int, Int)] = for {
    members <- Gen.listOf(Gen.long)
    probes <- Gen.listOf(Gen.long)
    mBits <- Gen.oneOf(64, 256, 4096)
    k <- Gen.chooseNum(1, 8)
  } yield (members, probes, mBits, k)

  property("bloom: every inserted value probes true (no false negatives)") =
    forAll(bloomCase) { case (members, _, mBits, k) =>
      val f = new Array[Byte](mBits / 8)
      members.foreach(graft.functions.BloomHelper.set(f, _, k))
      members.forall(graft.functions.BloomHelper.contains(f, _, k))
    }

  property("bloom: merged (byte-OR) filter = filter of the concatenation") =
    forAll(bloomCase) { case (members, others, mBits, k) =>
      val a = new Array[Byte](mBits / 8)
      val b = new Array[Byte](mBits / 8)
      val c = new Array[Byte](mBits / 8)
      members.foreach(graft.functions.BloomHelper.set(a, _, k))
      others.foreach(graft.functions.BloomHelper.set(b, _, k))
      (members ++ others).foreach(graft.functions.BloomHelper.set(c, _, k))
      val merged = a.indices.map(i => (a(i) | b(i)).toByte)
      merged.sameElements(c)
    }

  // ---- Misra–Gries heavy hitters (TopKBuffer certified guarantees) ----

  /** Zipf-ish item stream split into random partitions merged in random
    * order — the exact shape a partitioned aggregation produces.
    */
  private val mgCase: Gen[(List[List[String]], Int)] = for {
    n <- Gen.chooseNum(0, 400)
    items <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
      2 -> Gen.oneOf("a", "b", "c"),
      1 -> Gen.chooseNum(0, 50).map("t" + _)))
    nParts <- Gen.chooseNum(1, 6)
    assign <- Gen.listOfN(items.size, Gen.chooseNum(0, nParts - 1))
    c <- Gen.oneOf(2, 4, 8)
  } yield (items.zip(assign).groupBy(_._2).values.map(_.map(_._1)).toList, c)

  property("misra-gries: certified bounds hold under any partitioning/merge order") =
    forAll(mgCase) { case (parts, c) =>
      val bufs = parts.map { p =>
        val b = new graft.functions.TopKBuffer(c)
        p.foreach(b.insert)
        b
      }
      val merged = bufs.reduceOption { (x, y) => x.mergeWith(y); x }
        .getOrElse(new graft.functions.TopKBuffer(c))
      val truth = parts.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = parts.flatten.size.toLong
      val est = merged.counts.toMap
      merged.n == n &&
        merged.err * (c + 1) <= n && // certified error ceiling
        merged.counts.size <= c && // capacity respected
        truth.forall { case (item, t) =>
          val e = est.getOrElse(item, 0L)
          e <= t && t <= e + merged.err // bracketing, absent => est 0
        } &&
        est.keySet.subsetOf(truth.keySet) && // never invents items
        truth.forall { case (item, t) => // coverage of true heavy hitters
          t <= merged.err || est.contains(item)
        }
    }
}
