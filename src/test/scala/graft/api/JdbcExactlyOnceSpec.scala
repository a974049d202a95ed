package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once contract of the JDBC streaming sink primitive: replayed
  * batch ids are skipped (idempotence under Spark's post-restart batch
  * re-delivery), distinct ids append, and a failed append leaves neither
  * rows nor a ledger entry (atomicity — the replay then completes it).
  */
class JdbcExactlyOnceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("ID", "NAME")
  }

  test("replayed batch ids are skipped; distinct ids append") {
    val url = "jdbc:derby:memory:graftjdbceo;create=true"
    val jdb = Datum.connect(url).asInstanceOf[JdbcDatabase]
    jdb.store(df(Seq.empty), "EOT", "ignore")
    jdb.appendBatchExactlyOnce("EOT", df(Seq((1L, "a"), (2L, "b"))), 0L)
    jdb.appendBatchExactlyOnce("EOT", df(Seq((3L, "c"))), 1L)
    // post-crash replay: same batch id, same rows — must be a no-op
    jdb.appendBatchExactlyOnce("EOT", df(Seq((1L, "a"), (2L, "b"))), 0L)
    val got = jdb.table("EOT").df.collect()
      .map(r => (r.getAs[Long]("ID"), r.getAs[String]("NAME"))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")), s"got $got")
  }

  test("failed append rolls back rows AND ledger entry") {
    val url = "jdbc:derby:memory:graftjdbceo2;create=true"
    val jdb = Datum.connect(url).asInstanceOf[JdbcDatabase]
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      // NAME is too narrow for the second batch → INSERT..SELECT fails
      st.executeUpdate("CREATE TABLE EOF (ID BIGINT, NAME VARCHAR(2))")
      st.close()
    } finally conn.close()
    jdb.appendBatchExactlyOnce("EOF", df(Seq((1L, "ok"))), 0L)
    intercept[java.sql.SQLException] {
      jdb.appendBatchExactlyOnce("EOF", df(Seq((2L, "too-long"))), 1L)
    }
    val got = jdb.table("EOF").df.collect().map(_.getAs[Long]("ID")).toSet
    assert(got == Set(1L), "failed batch must leave no rows")
    // the replay of batch 1 with fitting rows must go through (no ledger
    // entry was committed by the failure)
    jdb.appendBatchExactlyOnce("EOF", df(Seq((2L, "o2"))), 1L)
    val got2 = jdb.table("EOF").df.collect().map(_.getAs[Long]("ID")).toSet
    assert(got2 == Set(1L, 2L))
  }
}
