package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
object DbgC36 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    s.read.parquet(s"$dir/nation.parquet").count()
    var last = System.nanoTime()
    def lap(tag: String): Unit = {
      val now = System.nanoTime()
      println(f"[lap] $tag%-28s ${(now - last) / 1e9}%.2f s")
      last = now
    }
    val db = api.Datum.connect("parquet:///root/repo/target/fixtures/out")(s)
    val orders = s.read.parquet(s"$dir/orders.parquet")
    orders.filter(col("o_orderkey") <= 2400)
      .repartitionByRange(6, col("o_orderkey"))
      .write.mode("overwrite").parquet(db.pathOf("c36_orders"))
    val tbl = db.table("c36_orders")
    tbl.analyzeStats(Seq("o_orderkey")): Unit
    lap("seed+analyze")
    orders.filter(col("o_orderkey").between(600, 800))
      .select(col("o_orderkey").as("k"),
        (col("o_custkey") + 5000000).cast("long").as("new_cust"))
      .unionByName(orders.filter(col("o_orderkey").between(100, 200))
        .select((col("o_orderkey") + 9000000).cast("long").as("k"),
          col("o_custkey").cast("long").as("new_cust")))
      .coalesce(1).write.mode("overwrite").parquet(db.pathOf("c36_src"))
    orders.filter(col("o_orderkey") <= 100)
      .select((col("o_orderkey") + 900000).cast("long").as("k"),
        lit(0L).as("new_cust"))
      .coalesce(1).write.mode("overwrite").parquet(db.pathOf("c36_far"))
    lap("src writes")
    def fileMap(): Map[String, (Long, String)] =
      new java.io.File(tbl.path).listFiles().toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> (f.length(), md.map("%02x".format(_)).mkString)
        }.toMap
    val before = fileMap()
    lap("fileMap")
    val rc0 = db.execute(
      "MERGE INTO c36_orders t USING c36_far s ON t.o_orderkey = s.k " +
        "WHEN MATCHED THEN UPDATE SET o_custkey = s.new_cust")
      .collect()(0).getLong(0)
    lap("no-match merge")
    val aKey = orders.filter(col("o_orderkey").between(600, 800))
      .agg(min(col("o_orderkey")).cast("long")).collect()(0).getLong(0)
    val dup = scala.util.Try(db.execute(
      s"MERGE INTO c36_orders t USING (SELECT CAST($aKey AS BIGINT) AS k " +
        s"UNION ALL SELECT CAST($aKey AS BIGINT)) s ON t.o_orderkey = s.k " +
        "WHEN MATCHED THEN DELETE " +
        "WHEN NOT MATCHED THEN INSERT (o_orderkey) VALUES (s.k)").collect())
    lap("dup-abort merge")
    val rc = db.execute(
      "MERGE INTO c36_orders t USING c36_src s ON t.o_orderkey = s.k " +
        "WHEN MATCHED AND s.k % 10 = 0 THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET o_custkey = s.new_cust, " +
        "o_orderpriority = 'X-MERGED' " +
        "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_custkey, " +
        "o_orderpriority) VALUES (s.k, s.new_cust, 'X-INSERTED')")
      .collect()(0).getLong(0)
    lap("CDC merge")
    fileMap(); lap("fileMap2")
    val meta = tbl.aggFromStats("o_orderkey")
    lap("aggFromStats")
    orders.filter(col("o_orderkey") <= 2400)
      .select(concat(lit("D"), lpad(col("o_orderkey").cast("string"),
        7, "0")).as("doc_id"), col("o_custkey").cast("long").as("val"))
      .repartitionByRange(6, col("doc_id"))
      .write.mode("overwrite").parquet(db.pathOf("c36_sdocs"))
    val sdocs = db.table("c36_sdocs")
    sdocs.analyzeStats(Seq("doc_id")): Unit
    lap("sdocs seed+analyze")
    val loHi = sdocs.df.agg(min(col("doc_id")), max(col("doc_id"))).collect()(0)
    import s.implicits._
    Seq((loHi.getString(0), -5L), (loHi.getString(1), -5L),
      ("D9000001", 42L)).toDF("k", "nv")
      .coalesce(1).write.mode("overwrite").parquet(db.pathOf("c36_ssrc"))
    lap("ssrc")
    val cands = sdocs.mergeCandidateFiles(db.table("c36_ssrc").df,
      "s", "t", "t.doc_id = s.k", sdocs.currentDataFiles())
    lap("seam candidates")
    val rcS = db.execute(
      "MERGE INTO c36_sdocs t USING c36_ssrc s ON t.doc_id = s.k " +
        "WHEN MATCHED THEN UPDATE SET val = s.nv " +
        "WHEN NOT MATCHED THEN INSERT (doc_id, val) VALUES (s.k, s.nv)")
      .collect()(0).getLong(0)
    lap("string merge")
    val sAgg = sdocs.df.agg(count(lit(1)).cast("long"),
      sum(col("val")).cast("long")).collect()(0)
    lap("final aggs")
  }
}
