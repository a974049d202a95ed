package graft.api

import org.apache.spark.sql.SparkSession

/** Entry point mirroring the reference's `datum.connect(url)`
  * (ref: datum/__init__.py:3-8, datum/database.py:12-20, datum/util.py:8-17).
  *
  * The reference dispatches on URL scheme to a backend adapter
  * (postgis / oracle-stgeom). Here the "backend" is a Spark data source:
  * `parquet://<dir>` (primary; a directory holding `<table>.parquet`) — the
  * scheme map is open for extension (jdbc, delta, ...) the same way the
  * reference's ADAPTER_CLASS_MAP is.
  *
  * Scale note: `connect` is metadata-only — no eager I/O. Table handles are
  * lazy DataFrames; nothing is scanned until an action runs, so a 100 TB
  * warehouse costs nothing to "connect" to.
  */
object Datum {
  /** Parse `scheme://path` (ref datum/util.py:8-17 `parse_url`). */
  def parseUrl(url: String): (String, String) = url.split("://", 2) match {
    case Array(scheme, rest) => (scheme, rest)
    case Array(path)         => ("parquet", path) // bare dir = parquet root
  }

  def connect(url: String)(implicit spark: SparkSession): Database = {
    val (scheme, path) = parseUrl(url)
    scheme match {
      case "parquet" | "file" => new Database(spark, path)
      // the scheme map is open like the reference's ADAPTER_CLASS_MAP:
      // csv/json directories of <table>.<ext> (header + declared-or-inferred
      // schema). Parquet stays the recommended scale format (columnar,
      // predicate pushdown, stats); csv/json are ingest/interchange tiers.
      case "csv" | "json"     => new Database(spark, path, scheme)
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported scheme '$other' (supported: parquet, csv, json). " +
            "Ref behavior: datum/database.py:16-20 KeyError on unknown scheme.")
    }
  }
}
