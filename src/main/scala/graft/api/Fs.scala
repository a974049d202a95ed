package graft.api

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** The engine's filesystem seam for the STATE layer — staged swaps,
  * crash recovery, compaction, ledgers, vacuum: `Database.swapDir` /
  * `replaceAt` / `vacuum` / `compactStreamIndex` /
  * `compactStreamIndexIfNeeded` / `mergeTouchedPartitions` (+ the
  * exactly-once ledger), `QueriesE.deleteFromIvfPqIndex` /
  * `compactIvfPqDeletes`, and the posting-index delete lifecycle — AND
  * (since r13) the METADATA tier: snapshot manifests
  * (`Table.snapshot/versions/readVersion/diffVersions/restore`), the
  * `.stats` skipping sidecar and its pruned reads, the `.properties`
  * catalog sidecar, `Database.tables`/DDL, and the layout helpers every
  * maintenance job sizes itself with
  * (`partitionColsOf`/`leafDirsOf`/`dataBytes`) — AND (since r14) the
  * STREAM-INDEX / INCREMENTAL-DEDUP state layer: the upsert/mview/
  * trending merge steps (`EventWindows.upsertMerge` /
  * `mviewMergeDaily` / `TrendingTerms.mergeBatch`), every stream
  * index/state/sink root (f10/f14/f18/f19/f26/f31/f33–f37),
  * `Dedup.ingestBatch`/`ingestStreamToParquet`, and e89/e100's
  * partitioned index state. Every rename/list/delete in those paths
  * goes through `org.apache.hadoop.fs.FileSystem`, so the identical
  * protocol runs on `file://` (the local[32] test contract), `hdfs://`,
  * and `s3a://` warehouses — `java.io.File` renames exist only on a
  * local JVM and have no meaning where a 100 TB warehouse actually
  * lives. Deliberately OUT of scope: query-fixture scratch setup
  * (mkdirs/wipes of local Scratch roots in test fixtures and local-path
  * gates), which is local[32]-only by design.
  *
  * ATOMICITY CONTRACT: the backup-hop swap protocol assumes `rename` is
  * atomic, which holds on local FS and HDFS (a NameNode metadata op).
  * Object stores (S3A) implement directory rename as copy+delete —
  * NOT atomic and O(bytes) — so there the protocol *narrows* each crash
  * window instead of closing it; the recovery sweeps still converge
  * (they key on name suffixes, not rename atomicity), but a true S3
  * deployment should flip a manifest pointer (the `.versions` recipe)
  * instead of renaming data dirs. Each primitive's Scaladoc carries this
  * caveat where it applies.
  *
  * The `FileSystem` instance comes from the path's own scheme plus the
  * active session's Hadoop conf (falling back to a default `Configuration`
  * in session-free unit tests); `FileSystem.get` caches per (scheme,
  * authority, ugi), so `of` is a map lookup in steady state.
  */
object Fs {
  /** Hadoop conf for FS resolution, cached per session instance:
    * `newHadoopConf()` clones the full session conf (thousands of
    * entries) and the vacuum/compaction walks do an FS op per directory,
    * so rebuilding it per call is measurable overhead. The fallback chain
    * is active session → default session (covers non-session threads —
    * stream maintenance callbacks, test setup — which would otherwise
    * drop s3a credentials and `fs.defaultFS` by landing on a bare
    * `Configuration`) → bare `Configuration` only when no session exists
    * at all (session-free unit tests).
    *
    * SNAPSHOT SEMANTICS: the conf is captured ONCE per session instance —
    * a runtime `spark.conf.set(...)` of a Hadoop key (e.g. s3a
    * credentials) made AFTER the first Fs operation is NOT reflected
    * here (deliberate: per-call `newHadoopConf()` clones thousands of
    * entries on every directory of a vacuum walk). Set Hadoop keys
    * before the first state-layer operation, or call
    * [[invalidateConfCache]] after changing them.
    */
  @volatile private var cachedConf: (AnyRef, Configuration) = null

  /** Drop the cached Hadoop conf so the next Fs operation re-snapshots
    * the active session's conf — call after a runtime
    * `spark.conf.set` of a Hadoop/filesystem key (see snapshot
    * semantics above).
    */
  def invalidateConfCache(): Unit = { cachedConf = null }
  private def conf: Configuration = {
    val sess = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .orNull
    val c = cachedConf
    if (c != null && (c._1 eq sess)) c._2
    else {
      val built =
        if (sess != null) sess.sessionState.newHadoopConf()
        else new Configuration()
      cachedConf = (sess, built)
      built
    }
  }

  def of(p: Path): FileSystem = p.getFileSystem(conf)

  def path(s: String): Path = new Path(s)
  def child(parent: String, name: String): Path = new Path(parent, name)

  /** Fully-qualified form (scheme + authority) of `p` under its own FS —
    * the stable spelling for prefix-stripping a file path down to its
    * table-root-relative name (listStatus returns qualified paths; a
    * caller-built root is usually scheme-less, so qualify before
    * comparing).
    */
  def qualify(p: Path): Path = {
    val fs = of(p)
    p.makeQualified(fs.getUri, fs.getWorkingDirectory)
  }

  def status(p: Path): FileStatus = of(p).getFileStatus(p)

  def exists(p: Path): Boolean = of(p).exists(p)

  def isDir(p: Path): Boolean = {
    val fs = of(p)
    fs.exists(p) && fs.getFileStatus(p).isDirectory
  }

  def isFile(p: Path): Boolean = {
    val fs = of(p)
    fs.exists(p) && fs.getFileStatus(p).isFile
  }

  /** Children of `p` (empty if `p` is missing or not a directory). */
  def list(p: Path): Seq[FileStatus] = {
    val fs = of(p)
    if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty
  }

  /** Recursive delete; true only if something existed and was removed. */
  def delete(p: Path): Boolean = {
    val fs = of(p)
    fs.exists(p) && fs.delete(p, true)
  }

  def mkdirs(p: Path): Unit = { of(p).mkdirs(p); () }

  /** Rename, Hadoop semantics: false on failure — EXCEPT that an existing
    * `dst` throws. Hadoop's raw `rename` moves `src` INTO an existing dir
    * `dst` and reports true (unlike `File.renameTo`, which fails), so a
    * call site that skipped the pre-wipe would silently nest a directory
    * inside the destination instead of erroring. Every state-layer
    * protocol wipes or vacates `dst` first; making the violated
    * precondition loud turns a latent layout corruption into an
    * immediate, attributable failure.
    */
  def rename(src: Path, dst: Path): Boolean = {
    val fs = of(src)
    if (fs.exists(dst))
      throw new java.io.IOException(
        s"Fs.rename: destination $dst exists — Hadoop would nest $src " +
          "inside it; wipe or vacate the destination first")
    fs.rename(src, dst)
  }

  def renameOrThrow(src: Path, dst: Path, what: String): Unit =
    if (!rename(src, dst))
      throw new java.io.IOException(s"$what: cannot rename $src -> $dst")

  /** Create an empty marker file (overwrites). */
  def touch(p: Path): Unit = of(p).create(p, true).close()

  /** Write a small text file fully, overwriting (manifests / sidecar
    * properties — never data). NOT atomic on any store: callers that need
    * crash-safety stage + rename (the swap protocols) or tolerate a torn
    * small write (the `.properties` sidecar — rewritten idempotently).
    */
  def writeUtf8(p: Path, s: String): Unit = {
    val out = of(p).create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** Create-if-absent write of a small text file — the lease primitive:
    * `create(overwrite = false)` is atomic on local/HDFS (one winner
    * among concurrent creators); object stores only approximate it
    * (S3A's conditional create landed late and consistency varies), the
    * documented caveat on every lease user. False = already exists /
    * lost the race.
    */
  def createNewUtf8(p: Path, s: String): Boolean =
    try {
      val out = of(p).create(p, false)
      try out.write(s.getBytes("UTF-8")) finally out.close()
      true
    } catch { case _: java.io.IOException => false }

  /** Read a small text file fully (manifests — never data). */
  def readUtf8(p: Path): String = {
    val in = of(p).open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }
}
