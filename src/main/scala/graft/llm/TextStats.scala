package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (BASELINE.json north
  * star): language-ID, quality scoring, token counting, fingerprinting.
  * All are scalar per-row expressions (built-in functions only — fully
  * codegen'd, no shuffle, no UDF) so they run inside the parquet scan stage
  * at any scale.
  *
  * Determinism: counts are integers; ratios are single IEEE divisions of
  * exact integers; score combination uses one fixed operation order — a SQL
  * engine evaluating the same formula shape reproduces results bit-exactly.
  */
object TextStats {

  /** Marker-word profiles for the n-gram/stopword language heuristic.
    * (The synthetic corpus shares one vocabulary across langs, so these
    * profiles are arbitrary-but-fixed disjoint word sets; on real text they
    * would be per-language stopword lists. The *operator* — profile
    * scoring + argmax with deterministic tie-break — is the deliverable.)
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("data", "stream", "hash", "merge"),
    "es" -> Seq("table", "row", "scan", "sort"),
    "fr" -> Seq("query", "join", "filter", "group"),
    "zh" -> Seq("spark", "batch", "key", "value"))

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Predicted language = argmax marker-count, ties broken by profile
    * order (en > de > es > fr > zh).
    */
  def langId(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val counts = LangMarkers.map { case (l, ws) => l -> markerCount(toks, ws) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit(LangMarkers.last._1)) { case ((l, c), els) =>
      when(c === best, lit(l)).otherwise(els)
    }
  }

  /** Quality score ∈ [0,1]: length saturation + low punctuation + stopword
    * presence (the standard cheap quality gates for corpus filtering).
    * score = 0.4·min(1, chars/500) + 0.3·(1 − punct_ratio) + 0.3·stop_ratio
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = Dedup.tokens(text)
    val alpha = length(regexp_replace(text, "[^a-z ]", ""))
    val punctRatio = (length(text) - alpha).cast("double") / length(text).cast("double")
    val stop = Seq("the", "a", "of", "and", "to")
    val stopRatio = size(filter(toks, t => t.isin(stop.map(_.asInstanceOf[Any]): _*)))
      .cast("double") / size(toks).cast("double")
    lit(0.4) * least(lit(1.0), nChars.cast("double") / lit(500.0)) +
      lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * stopRatio
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column = size(Dedup.tokens(text)).cast("long")

  /** BPE-ish subword-boundary token count: alpha runs, digit runs, and
    * individual other non-space characters (the regex family BPE
    * pre-tokenizers use).
    */
  def regexTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long")
}
