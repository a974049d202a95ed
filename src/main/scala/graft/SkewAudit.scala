package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed-corpus salting rehearsal: asserts the salted-join and
  * salted-aggregate equivalences ([[graft.rel.Skew]]) on a REALLY skewed
  * corpus (ScaleGen skew mode — one hot customer owns ~30% of orders).
  * The b10 gate + ApiSpec prove the identities on uniform gated data;
  * this main re-proves them exactly where salting earns its keep: the
  * hot key's partials spread over the salt buckets while the result
  * stays value-identical (decimal addition is associative, and a salted
  * join still meets every (fact, dim) pair exactly once).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<skew dir> runMain graft.SkewAudit`;
  * prints one JSON line, exits non-zero on any mismatch.
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale/sf1skew")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_totalprice")
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = o.join(c, "o_custkey").count()
    val salted = graft.rel.Skew.saltedJoin(o, c, "o_custkey", 8).count()
    val direct = o.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ssum = graft.rel.Skew
      .saltedSum(o, Seq("o_custkey"), col("o_totalprice"), "rev", 8)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ok = plain == salted && direct == ssum
    println(s"""{"skew_audit":"$sfDir","plain_join":$plain,""" +
      s""""salted_join":$salted,"groups":${direct.size},""" +
      s""""agg_equal":${direct == ssum},"ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
