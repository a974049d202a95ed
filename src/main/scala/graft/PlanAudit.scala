package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** At-scale plan-shape audit: EXECUTES each query against an arbitrary
  * scale directory and re-asserts the [[PlanPins]] invariants on the
  * POST-AQE final physical plan. The sf0.001 smoke audit
  * (QueriesSmokeSpec) checks the initial plan on tiny data; this main is
  * the scale rehearsal — AQE may re-plan joins/shuffles at 10–100× the
  * volume (demote a broadcast to shuffle join, coalesce partitions, split
  * a skewed join), and the pins must survive the re-plan.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=<dir> runMain graft.PlanAudit [query ...]`
  * (no args = every declared query). Prints one PASS/FAIL line per query
  * plus an `{"audit":…}` JSON summary; exits non-zero on any violation.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { name =>
      val res = try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.count() // materialize so AdaptiveSparkPlan reaches its final plan
        val plan = df.queryExecution.executedPlan.toString
        PlanPins.violations(name, plan)
      } catch {
        case NonFatal(e) => Seq(s"$name failed to run: $e")
      } finally Caches.drain()
      if (res.isEmpty) println(s"PASS $name")
      else { failed += 1; res.foreach(v => println(s"FAIL $v")) }
    }
    println(s"""{"audit":"plan-pins","sf":"$sfDir","queries":${names.size},"failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
