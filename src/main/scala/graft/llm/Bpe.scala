package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.BpeExpressions
import graft.rel.Q._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016,
  * arXiv:1508.07909) — the iterative half on top of the per-row
  * [[graft.functions.BpeKernel]] segmentation kernels.
  *
  * One iteration = one corpus-wide map-side-combined pair count (the only
  * corpus-scale shuffle; the pair key space is vocabulary², tiny) + one
  * single-row argmax collect; the chosen merge rides into the next
  * iteration's kernel as a literal (`addReferenceObj` — broadcast-style,
  * never a join). That is exactly how production distributed BPE trainers
  * shape the work at 100 TB: per-iteration cost is one aggregation over
  * the corpus, and the model state (the merge table) is O(vocab), driver-
  * resident. The merge count is a declared small constant here; a real
  * 50k-merge run would checkpoint the segmented corpus every few hundred
  * merges instead of re-deriving it from rank 0 each scan — the same
  * recipe, different constants.
  *
  * Determinism: argmax tie-break is (count DESC, pair ASC) — both engines
  * compare ASCII pair keys bytewise, so the DuckDB oracle (an unrolled
  * CTE chain applying each merge with a `list_reduce` greedy fold)
  * selects the identical merge at every rank.
  */
object Bpe {
  /** Training iterations for the e54/e55 gate queries (shared with their
    * unrolled DuckDB oracles — the two sides cannot drift).
    */
  val Iterations = 3

  /** Rank-ordered learned merges `(merge_rank, pair, n)` with their
    * selection-time corpus counts. Session-memoized per data dir: e54
    * reports it, e55 re-tokenizes under it — trained once.
    */
  def mergesDf(s: SparkSession, dir: String, k: Int = Iterations): DataFrame =
    graft.Caches.memo(s"bpe-merges|$dir|$k") {
      import s.implicits._
      val docs = graft.Caches.persistTracked(
        t(s, dir, "documents").select(col("text")))
      var merges = Vector.empty[String]
      val rows = Vector.newBuilder[(Long, String, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= k && !exhausted) {
        val top = docs
          .select(explode(BpeExpressions.bpePairs(col("text"), merges)).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(1)
          .collect()
        if (top.isEmpty) exhausted = true // no adjacent pairs left anywhere
        else {
          rows += ((rank.toLong, top(0).getString(0), top(0).getLong(1)))
          merges = merges :+ top(0).getString(0)
          rank += 1
        }
      }
      rows.result().toDF("merge_rank", "pair", "n")
    }

  /** The learned pair keys in rank order (driver-side, O(k)). */
  def merges(s: SparkSession, dir: String, k: Int = Iterations): Seq[String] =
    mergesDf(s, dir, k).orderBy("merge_rank").collect()
      .map(_.getAs[String]("pair")).toSeq
}
