package graft

/** Scratch-dir convention for queries that materialize serving artifacts
  * (persisted indexes, stream checkpoints, staged sinks): a root DERIVED
  * FROM the input corpus dir, outside the source checkout. Base =
  * `$GRAFT_SCRATCH` if set, else `<java.io.tmpdir>/graft-scratch`; the
  * input dir's path is flattened into one segment so concurrent
  * rehearsals over different corpora (sf0.1 vs target/scale/sf10) never
  * collide, and a scale rehearsal never writes inside the repo checkout.
  * The flattening alone is not injective (`/a/b` and `/a_b` both flatten
  * to `_a_b`), so a short MD5 of the RAW path is appended — distinct
  * input dirs are guaranteed distinct roots (ADVICE r10).
  */
object Scratch {
  def root(inputDir: String, name: String): String = {
    val base = sys.env.getOrElse("GRAFT_SCRATCH",
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft-scratch").getPath)
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(inputDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    new java.io.File(new java.io.File(base,
      inputDir.replaceAll("[^A-Za-z0-9.-]", "_") + "-" + tag), name).getPath
  }
}
