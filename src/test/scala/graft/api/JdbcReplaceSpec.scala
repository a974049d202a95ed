package graft.api

import org.scalatest.funsuite.AnyFunSuite

/** White-box check of the JDBC staged replace: the INSERT..SELECT maps
  * columns BY NAME, so a replacement frame whose column order differs from
  * the backend DDL still lands every value in its own column. (In package
  * graft.api to reach the private[api] replaceTable primitive directly —
  * the public paths always pass DDL-ordered frames, which is exactly why
  * the positional hazard needs a direct probe.)
  */
class JdbcReplaceSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  implicit lazy val sp: org.apache.spark.sql.SparkSession = spark

  test("jdbc replace maps columns by name, not position") {
    val url = "jdbc:derby:memory:graftjdbcorder;create=true"
    val jdb = Datum.connect(url).asInstanceOf[JdbcDatabase]
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE ORDT (id BIGINT, name VARCHAR(8))")
      st.executeUpdate("INSERT INTO ORDT VALUES (1,'a')")
      st.close()
      // replacement rows with columns REVERSED relative to the DDL
      import spark.implicits._
      val reversed = Seq(("x", 7L), ("y", 8L)).toDF("NAME", "ID")
      jdb.replaceTable("ORDT", reversed)
      val rows = jdb.table("ORDT").df.orderBy("ID").collect()
      assert(rows.map(r => (r.getAs[Long]("ID"), r.getAs[String]("NAME"))).toSeq ==
        Seq((7L, "x"), (8L, "y")),
        "values must land in their named columns even when the frame is reordered")
    } finally conn.close()
  }
}
