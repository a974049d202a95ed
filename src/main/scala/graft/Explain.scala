package graft

import org.apache.spark.sql.SparkSession

/** Physical-plan audit: prints `explain("formatted")` for representative
  * queries so pushdown / broadcast / whole-stage-codegen properties can be
  * reviewed (SURVEY.md §4.2 "free — verify, don't build").
  *
  * Usage: sbt "runMain graft.Explain [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("a2_read_filter", "a3_read_sort_limit", "b2_join_multiway",
        "b5_group_agg", "b10_skew_salted_agg", "b22_exists_subquery",
        "c7_partition_pruning",
        "e4_similarity_topk", "e7_ngram_jaccard", "e8_embed_neardup",
        "e9_ann_lsh", "e17_neardup_lsh", "e39_inverted_index",
        "e42_simhash_lsh",
        "f1_tumbling_agg", "f7_asof_join", "f8_range_join")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
