package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §2.4 for the declared query
  * inventory. Queries live with their operator groups:
  * [[graft.rel.QueriesA]] (read surface), [[graft.rel.QueriesB]] (relational
  * core), [[graft.rel.QueriesC]] (write/DDL), [[graft.spatial.QueriesD]]
  * (WKT spatial), [[graft.llm.QueriesE]] (dedup/similarity/text),
  * [[graft.stream.QueriesF]] (event windows).
  */
object SparkEntry {
  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Star-join
    * revenue per region: all dimensions broadcast, fact scanned once.
    */
  def entry(spark: SparkSession): DataFrame =
    rel.QueriesB.all("b2_join_multiway")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rel.QueriesA.all ++ rel.QueriesB.all ++ rel.QueriesC.all ++
      spatial.QueriesD.all ++ llm.QueriesE.all ++ stream.QueriesF.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    rel.QueriesA.oracle ++ rel.QueriesB.oracle ++ rel.QueriesC.oracle ++
      spatial.QueriesD.oracle ++ llm.QueriesE.oracle ++ stream.QueriesF.oracle
}
