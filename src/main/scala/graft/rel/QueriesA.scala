package graft.rel

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Datum

/** Group A — the reference's read surface (SURVEY.md §2.4.A), exercised
  * through the [[graft.api.Table]] façade so the declared queries cover the
  * same code path a library user gets (`table.read(fields, aliases, where,
  * sort, limit)`, ref datum/table.py:68-86).
  *
  * Scale notes: every query here compiles to a single parquet scan —
  * projection prunes ReadSchema, `where` lands in PushedFilters, and
  * sort+limit fuses into TakeOrderedAndProject (per-partition top-K, no
  * global sort shuffle). Verified via `.explain` in ReadSurfaceSpec.
  */
object QueriesA {
  private def db(s: SparkSession, dir: String) = {
    implicit val sp: SparkSession = s
    Datum.connect(s"parquet://$dir")
  }

  val all: Map[String, Q.Fn] = Map(
    // read(fields=[...], aliases={c_name→customer_name}) — ref projection+AS
    // (datum/postgis/table.py:140-149)
    "a1_read_project_alias" -> ((s, dir) =>
      db(s, dir).table("customer").read(
        fields = Seq("c_custkey", "c_name"),
        aliases = Map("c_name" -> "customer_name"),
        sort = Seq("c_custkey"))),

    // read(where=...) — raw SQL predicate passthrough
    // (ref datum/postgis/table.py:157-158)
    "a2_read_filter" -> ((s, dir) =>
      db(s, dir).table("orders").read(
        fields = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        where = Some("o_totalprice > 100000 AND o_orderstatus = 'O'"),
        sort = Seq("o_orderkey"))),

    // read(sort=[...], limit=n) — ref datum/postgis/table.py:159-166; the
    // oracle adapter dropped sort and pre-applied ROWNUM (bugs we fix)
    "a3_read_sort_limit" -> ((s, dir) =>
      db(s, dir).table("lineitem").read(
        fields = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"),
        sort = Seq("l_shipdate DESC", "l_orderkey", "l_linenumber"),
        limit = Some(100))),

    // table.count — ref datum/table.py:59-61 (uniform Long, unlike the
    // reference's property-vs-method inconsistency)
    "a4_count" -> ((s, dir) => {
      import s.implicits._
      Seq(db(s, dir).table("lineitem").count).toDF("n")
    }),

    // read() no-args = SELECT * (ref datum/postgis/table.py:156)
    "a5_read_star" -> ((s, dir) =>
      db(s, dir).table("nation").read(sort = Seq("n_nationkey"))),

    // ISO-8601 datetime serialization with microseconds + forced UTC offset
    // (ref strftime('%Y-%m-%dT%H:%M:%S.%f+00:00'),
    // datum/oracle_stgeom/table.py:355-358)
    "a6_iso_dates" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      graft.rel.Q.events(s, dir)
        .select(col("event_id"),
          date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'+00:00'").as("iso"))
        .orderBy("event_id").limit(500)
    }),

    // a7: one-pass column profile (the dataset card: rows, per-column
    // nulls / exact distincts, numeric min/max) through the façade —
    // long-form (column, metric, value) rows, one aggregate job.
    "a7_profile" -> ((s, dir) =>
      db(s, dir).table("customer").profile()),

    // a8: coarse-type reflection (SURVEY §1.2 — the reference's
    // num/text/date/geom type system, datum/postgis/table.py metadata):
    // Table.metadata maps each parquet field to its coarse class. The
    // scratch a8cat table exercises the CATALOG-declared categories the
    // physical type can't express — postgis `name` and oracle `nclob`
    // (sidecar coarse.<field> overrides) and the bytea→text binary rule.
    // The oracle is the literal expected mapping, so a regression in the
    // type lattice (e.g. TIMESTAMP_NTZ falling out of "date") fails the
    // gate, not just a unit test. Footer-only — no data scan.
    "a8_metadata_reflect" -> ((s, dir) => {
      val d = db(s, dir)
      // catalog-type fixture: string/binary columns whose sidecar declares
      // the reference's catalog-only categories
      val root = "/root/repo/target/fixtures/out"
      new java.io.File(root).mkdirs()
      val cat = graft.api.Datum.connect(s"parquet://$root")(s)
      import s.implicits._
      Seq((1L, "pg_class", "long unicode body", Array[Byte](1, 2)))
        .toDF("id", "internal_name", "big_doc", "payload")
        .write.mode("overwrite").parquet(cat.pathOf("a8cat"))
      java.nio.file.Files.writeString(
        new java.io.File(root, "a8cat.parquet.properties").toPath,
        "coarse.internal_name=name\ncoarse.big_doc=nclob\n")
      val rows = (Seq("supplier", "orders").map(tn => tn -> d.table(tn)) :+
        ("a8cat" -> cat.table("a8cat"))).flatMap { case (tn, t) =>
        t.metadata.map { case (f, c) => (tn, f, c) }
      }
      rows.toDF("tbl", "field", "coarse").orderBy("tbl", "field")
    }),

    // a9: raw-file ingestion via Spark's built-in `binaryFile` source —
    // the entry point of the multimodal tier: media arrives as FILES, not
    // parquet rows. The fixture stage writes each doc's UTF-8 bytes as a
    // .bin file (bounded driver loop — 40 fixture files, not the measured
    // operator); the measured operator is the binaryFile scan itself:
    // (path, length, content) per file, digested in-scan via md5(hex(…))
    // — hex is uppercase in both engines, so the digest is portable
    // without any blob-to-string cast. At 100 TB this scan is Spark's
    // standard file-listing + per-file read: embarrassingly parallel,
    // partition count follows maxPartitionBytes. The oracle re-derives
    // every (file, n_bytes, digest) from the documents table — an
    // end-to-end staging+ingest check, not a read-back tautology.
    "a9_binaryfile_ingest" -> ((s, dir) => {
      val out = new java.io.File("/root/repo/target/fixtures/out/a9_media_" +
        dir.replaceAll("[^A-Za-z0-9]", "_"))
      graft.api.Database.wipeDir(out.getPath); out.mkdirs()
      Q.t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), col("text")).collect()
        .foreach { r =>
          java.nio.file.Files.write(
            new java.io.File(out, f"doc${r.getLong(0)}%05d.bin").toPath,
            r.getString(1).getBytes("UTF-8")): Unit
        }
      s.read.format("binaryFile").load(out.getPath)
        .select(element_at(split(col("path"), "/"), -1).as("file"),
          col("length").as("n_bytes"),
          md5(hex(col("content"))).as("digest"))
        .orderBy("file")
    })
  )

  val oracle: Map[String, String] = Map(
    "a9_binaryfile_ingest" ->
      ("SELECT 'doc' || lpad(doc_id::VARCHAR, 5, '0') || '.bin' AS file, " +
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, " +
        "md5(hex(encode(text))) AS digest " +
        "FROM documents WHERE doc_id < 40 ORDER BY file"),
    "a1_read_project_alias" ->
      "SELECT c_custkey, c_name AS customer_name FROM customer ORDER BY c_custkey",
    "a2_read_filter" ->
      ("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders " +
        "WHERE o_totalprice > 100000 AND o_orderstatus = 'O' ORDER BY o_orderkey"),
    "a3_read_sort_limit" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate " +
        "FROM lineitem ORDER BY l_shipdate DESC, l_orderkey, l_linenumber LIMIT 100"),
    "a4_count" -> "SELECT count(*) AS n FROM lineitem",
    "a5_read_star" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "a6_iso_dates" ->
      ("SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f+00:00') AS iso " +
        "FROM events ORDER BY event_id LIMIT 500"),
    "a8_metadata_reflect" ->
      ("SELECT * FROM (VALUES " +
        "('a8cat', 'id', 'num'), ('a8cat', 'internal_name', 'name'), " +
        "('a8cat', 'big_doc', 'nclob'), ('a8cat', 'payload', 'text'), " +
        "('orders', 'o_custkey', 'num'), ('orders', 'o_orderdate', 'date'), " +
        "('orders', 'o_orderkey', 'num'), ('orders', 'o_orderpriority', 'text'), " +
        "('orders', 'o_orderstatus', 'text'), ('orders', 'o_totalprice', 'num'), " +
        "('supplier', 's_acctbal', 'num'), ('supplier', 's_name', 'text'), " +
        "('supplier', 's_nationkey', 'num'), ('supplier', 's_suppkey', 'num')" +
        ") t(tbl, field, coarse) ORDER BY tbl, field"),
    "a7_profile" -> {
      // mirror of Table.profile over the customer schema: rows row, then
      // per column nulls/distinct (+ min/max for numerics)
      val numeric = Set("c_custkey", "c_nationkey", "c_acctbal")
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      val rows = "SELECT '*' AS \"column\", 'rows' AS metric, " +
        "CAST(count(*) AS DOUBLE) AS value FROM customer"
      val per = cols.flatMap { c =>
        Seq(
          s"SELECT '$c', 'nulls', CAST(count(*) - count($c) AS DOUBLE) FROM customer",
          s"SELECT '$c', 'distinct', CAST(count(DISTINCT $c) AS DOUBLE) FROM customer") ++
          (if (numeric(c)) Seq(
            s"SELECT '$c', 'min', CAST(min($c) AS DOUBLE) FROM customer",
            s"SELECT '$c', 'max', CAST(max($c) AS DOUBLE) FROM customer")
          else Nil)
      }
      (rows +: per).mkString(" UNION ALL ") + " ORDER BY \"column\", metric"
    }
  )
}
