package graft.api

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Spark-native analogue of the reference `Database` adapter
  * (ref: datum/database.py:12-77, datum/postgis/database.py:7-126,
  * datum/oracle_stgeom/database.py:6-202).
  *
  * The reference holds a live DB connection and issues catalog SQL; here the
  * catalog is a parquet directory (`<root>/<table>.parquet`) plus the Spark
  * session catalog for views. All relational work the reference pushed to the
  * DB server is expressed as lazy DataFrame plans and optimized by Catalyst.
  *
  * Scale notes:
  *  - `tables` lists directory entries — O(#tables), no data I/O.
  *  - `execute` hands raw SQL to Spark's parser/optimizer; temp views are
  *    registered lazily so an unused 100 TB table costs nothing.
  *  - materialized views are parquet snapshots (the Spark analogue of
  *    `CREATE MATERIALIZED VIEW`, ref datum/postgis/database.py:118-126);
  *    refresh = rewrite, reads are plain scans that benefit from column
  *    pruning and predicate pushdown like any other table.
  */
class Database(val spark: SparkSession, val root: String,
    val format: String = "parquet") {

  // the reference's users write ST_* SQL against the backend
  // (datum/postgis/table.py:54-59 etc.) — restore that spelling for
  // db.execute / spark.sql
  graft.functions.GraftFunctions.register(spark)

  /** List base tables, sorted (ref datum/postgis/database.py:60-69 filters
    * BASE TABLE; datum/oracle_stgeom/database.py:52-61 sorts client-side and
    * anti-joins views — we exclude views by construction).
    */
  def tables: Seq[String] = {
    val d = new File(root)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(s".$format"))
      .map(_.getName.stripSuffix(s".$format"))
      .sorted.toSeq
  }

  /** `db.table(name)` / `db['name']` sugar (ref datum/database.py:28-30,53-55). */
  def table(name: String): Table = new Table(this, name)
  def apply(name: String): Table = table(name)

  def pathOf(name: String): String = {
    // "schema.table" maps to a subdirectory (ref datum/table.py:16-22).
    val rel = name.split("\\.", 2) match {
      case Array(s, t) => s"$s/$t"
      case Array(t)    => t
    }
    s"$root/$rel.$format"
  }

  /** Register all physical tables as temp views so raw SQL can reference
    * them (ref `db.execute`, datum/database.py:44-45 — the backend SQL
    * surface is replaced by the full Spark SQL surface).
    *
    * Always re-registers (createOrReplace): temp views are session-global,
    * so two Database instances over different roots would otherwise fight
    * over names and `execute` could silently read the other database's
    * table. The cost is one footer/schema read per table per call —
    * correctness over micro-optimization (the reference had per-connection
    * namespaces for free; this restores that semantic).
    */
  def registerAll(): Unit = tables.foreach(register)

  def register(name: String): Unit = {
    // one unreadable table (e.g. exotic parquet types in a session missing
    // a legacy read flag) must not take down SQL over every other table
    try load(name).createOrReplaceTempView(name)
    catch {
      case e: Exception =>
        System.err.println(s"[graft] skipping unreadable table '$name': ${e.getMessage}")
    }
  }

  /** Read a table in this database's format. csv/json get header +
    * schema inference — the "reflection" analogue for schemaless formats
    * (parquet reflects from footers for free).
    */
  private[api] def load(name: String): org.apache.spark.sql.DataFrame = format match {
    case "parquet" => spark.read.parquet(pathOf(name))
    case "csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(pathOf(name))
    case "json"    => spark.read.json(pathOf(name))
    case other     => throw new IllegalArgumentException(
      s"unsupported format '$other' (supported: parquet, csv, json)")
  }

  /** Save a DataFrame as a table of this database (the public "create
    * table as select" / export path; also the write primitive behind
    * Table.write/delete).
    */
  def store(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String, chunkSize: Int = 0): Unit =
    storeAt(df, pathOf(name), mode, chunkSize)

  /** Format-dispatched write to an explicit path (staging dirs etc.). */
  private[api] def storeAt(df: org.apache.spark.sql.DataFrame, path: String,
      mode: String = "overwrite", chunkSize: Int = 0): Unit = {
    val w0 = df.write.mode(mode)
    val w = if (chunkSize > 0) w0.option("maxRecordsPerFile", chunkSize.toLong) else w0
    format match {
      case "parquet" => w.parquet(path)
      case "csv"     => w.option("header", "true").csv(path)
      case "json"    => w.json(path)
      case other     => throw new IllegalArgumentException(
        s"unsupported format '$other' (supported: parquet, csv, json)")
    }
  }

  /** Raw SQL passthrough (ref datum/database.py:44-45;
    * datum/postgis/database.py:43-55). Returns a lazy DataFrame instead of
    * the reference's eager fetchall list-of-dicts.
    */
  def execute(stmt: String): DataFrame = { registerAll(); spark.sql(stmt) }

  /** Coarse → concrete types for CREATE TABLE
    * (ref datum/postgis/database.py:75-98: num→numeric, text→text,
    * date→date, geom→text WKT; auto `id serial PRIMARY KEY`).
    */
  def coarseToSpark(coarse: String): DataType = coarse match {
    case "num"  => DoubleType
    case "text" => StringType
    case "date" => TimestampType
    case "geom" => StringType // WKT interchange, per reference model
    case other  => throw new IllegalArgumentException(s"unknown coarse type '$other'")
  }

  /** Create an empty table from a coarse-typed column list, auto-prepending
    * an `id` column (ref datum/postgis/database.py:75-98). IF NOT EXISTS
    * semantics: existing table is left untouched.
    */
  def createTable(name: String, cols: Seq[(String, String)]): Unit = {
    val path = pathOf(name)
    if (!new File(path).exists()) {
      val schema = StructType(
        StructField("id", LongType, nullable = false) +:
          cols.map { case (n, c) => StructField(n, coarseToSpark(c)) })
      store(spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        name, "overwrite")
    }
  }

  def dropTable(name: String): Unit = {
    // ref datum/postgis/database.py:100-103 (DROP TABLE IF EXISTS)
    deleteRecursively(new File(pathOf(name)))
    if (spark.catalog.tableExists(name)) spark.catalog.dropTempView(name): Unit
  }

  /** Session-scoped logical view (ref datum/postgis/database.py:108-116). */
  def createView(name: String, select: String): Unit = {
    registerAll(); spark.sql(select).createOrReplaceTempView(name)
  }
  def dropView(name: String): Unit = spark.catalog.dropTempView(name)

  /** Materialized view = parquet snapshot of the SELECT, registered as a
    * table (ref datum/postgis/database.py:118-126). At cluster scale this is
    * the standard "derived table" pattern: pay the compute once, downstream
    * readers get columnar scans + stats.
    */
  def createMView(name: String, select: String): Unit = {
    registerAll()
    store(spark.sql(select), name, "overwrite")
    register(name)
  }
  def dropMView(name: String): Unit = dropTable(name)

  /** TRUNCATE analogue (ref datum/oracle_stgeom/database.py:196-202):
    * overwrite with an empty DataFrame of the same schema.
    */
  def truncate(name: String): Unit = table(name).delete()

  /** Bucketed managed table (catalog-resident, unlike the path-based
    * tables above): pre-shuffles data into `buckets` files per bucket key
    * so joins/aggregations on those keys execute with NO exchange —
    * co-located sort-merge. This is the physical-design lever for a fact
    * table joined on the same key by every query at 100 TB; bucket
    * metadata lives in the session catalog (persist it with a metastore
    * in production).
    */
  def createBucketedTable(name: String, df: DataFrame, buckets: Int,
      keys: Seq[String]): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across sessions but warehouse
    // dirs persist — clear to avoid LOCATION_ALREADY_EXISTS
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    deleteRecursively(new File(wh, name))
    df.write.bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*).saveAsTable(name)
  }

  /** Commit / close (ref datum/database.py:47-51). Parquet writes are
    * committed per-job by the output committer, so `save` is a no-op.
    */
  def save(): Unit = ()
  def close(): Unit = () // session lifecycle owned by caller

  private[api] def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
