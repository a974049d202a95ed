package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): runs named declared
  * queries under a SparkListener that records every Spark job's wall time,
  * call site and description, plus the DRIVER-SIDE GAP since the previous
  * job ended (FS renames, listings, planning, byte audits). The per-job
  * decomposition tells an optimization exactly where a multi-statement
  * DML/maintenance gate spends its seconds — job count × fixed latency is
  * the cost model for the swap-heavy tail at any scale.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.JobProfile c36_sql_merge ..."
  * Dev tool only — never part of the driver contract.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    // A/B experiments (dev tool only): `SPARK_GRAFT_EXTRA_CONF=k=v;k=v`
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k.trim, v.trim)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class J(id: Int, site: String, desc: String, t0: Long,
        var t1: Long = 0L, nStages: Int = 0, nTasks: Int = 0)
    val jobs = mutable.ArrayBuffer.empty[J]
    val byId = mutable.HashMap.empty[Int, J]
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = lock.synchronized {
        val p = Option(e.properties)
        val stages = e.stageInfos
        val site = stages.lastOption.map(_.name.take(90)).getOrElse("")
        val desc = p.flatMap(x => Option(x.getProperty("spark.job.description"))).getOrElse("")
        val j = J(e.jobId, site, desc, System.nanoTime(),
          nStages = stages.size, nTasks = stages.map(_.numTasks).sum)
        jobs += j; byId(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = lock.synchronized {
        byId.get(e.jobId).foreach(_.t1 = System.nanoTime())
      }
    })

    // absorb session/codegen warm-up exactly like Bench so the first
    // profiled query measures the query
    try {
      spark.read.parquet(s"$sfDir/nation.parquet").count()
      graft.llm.QueriesE.warmTrainings(spark, sfDir)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[profile] warm-up failed (non-fatal): $e")
    }

    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to runs).foreach { r =>
        lock.synchronized { jobs.clear(); byId.clear() }
        val t0 = System.nanoTime()
        fn(spark, sfDir).count(): Unit
        val total = (System.nanoTime() - t0) / 1e9
        Caches.drain()
        val snap = lock.synchronized(jobs.toVector.sortBy(_.t0))
        val jobSum = snap.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e9
        println(f"%n== $name run$r: total $total%.3f s, ${snap.size} jobs " +
          f"(in-job $jobSum%.3f s, driver-side ${total - jobSum}%.3f s)")
        var prevEnd = t0
        snap.foreach { j =>
          val gap = (j.t0 - prevEnd) / 1e9
          val dur = math.max(0L, j.t1 - j.t0) / 1e9
          if (gap > 0.005)
            println(f"   -- gap $gap%7.3f s (driver)")
          println(f"   job ${j.id}%4d $dur%7.3f s ${j.nStages}%2dst ${j.nTasks}%4dt  ${j.site.take(80)}%-80s ${j.desc.take(40)}")
          prevEnd = math.max(prevEnd, j.t1)
        }
      }
    }
    spark.stop()
  }
}
