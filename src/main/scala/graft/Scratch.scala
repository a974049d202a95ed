package graft

/** Scratch-dir convention for queries that materialize serving artifacts
  * (persisted indexes, stream checkpoints, staged sinks): a root DERIVED
  * FROM the input corpus dir, outside the source checkout. Base =
  * `$GRAFT_SCRATCH` if set, else `<java.io.tmpdir>/graft-scratch`; the
  * input dir's path is flattened into one segment so concurrent
  * rehearsals over different corpora (sf0.1 vs target/scale/sf10) never
  * collide, and a scale rehearsal never writes inside the repo checkout.
  */
object Scratch {
  def root(inputDir: String, name: String): String = {
    val base = sys.env.getOrElse("GRAFT_SCRATCH",
      new java.io.File(System.getProperty("java.io.tmpdir"), "graft-scratch").getPath)
    new java.io.File(new java.io.File(base,
      inputDir.replaceAll("[^A-Za-z0-9.-]", "_")), name).getPath
  }
}
