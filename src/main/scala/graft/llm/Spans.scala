package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextExpressions

/** Span-level dedup/decontamination operators (the ExactSubstr family,
  * Lee et al. 2022 "Deduplicating Training Data Makes Language Models
  * Better") as LIBRARY functions — the machinery behind e62/e63/e65/e66,
  * public so a pipeline can compose span surgery over any (id, text)
  * frame, not just the declared queries.
  *
  * Scale shapes, by construction:
  *  - positional grams ride the native [[TextExpressions.posShingles]]
  *    kernel (one scan pass, no interpreted HOF lambdas);
  *  - cross-doc duplication is a min≠max id aggregate — ONE
  *    map-side-combined shuffle on the gram hash, never count-distinct's
  *    two;
  *  - span merging windows are PER-DOC (group size bounded by one doc's
  *    token count — never a corpus-wide key);
  *  - scrubbing narrows to affected docs FIRST (left-semi), so the word
  *    explode is O(affected tokens), not O(corpus).
  */
object Spans {

  /** Positional word k-gram relation `(idCol, pos, g = md5(gram))` over
    * `docs(idCol, textCol)` — one kernel pass per row, `pos` is the
    * 0-based start-word offset.
    */
  def posGrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5): DataFrame =
    docs.select(col(idCol),
      posexplode(TextExpressions.posShingles(col(textCol), k)))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        md5(col("col")).as("g"))

  /** Merge `(idCol, pos)` gram-start marks into maximal per-doc spans:
    * each mark covers [pos, pos+k-1]; marks whose intervals overlap or
    * touch merge into one span. Returns
    * `(idCol, span_start, span_end, span_tokens)`.
    */
  def mergeSpans(marks: DataFrame, k: Int = 5,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy("pos")
    val brk = coalesce((col("pos") > lag(col("pos"), 1).over(w) + k).cast("int"), lit(0))
    marks.withColumn("brk", brk)
      .withColumn("span", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("span"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        (max(col("pos")) + (k - 1) - min(col("pos")) + 1).as("span_tokens"))
      .select(idCol, "span_start", "span_end", "span_tokens")
  }

  /** Cross-document maximal duplicate spans: every word k-gram appearing
    * in ≥2 docs marks its start, marks merge per doc (e62's relation).
    */
  def dupSpans(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5): DataFrame = {
    val grams = posGrams(docs, idCol, textCol, k)
      .transform(graft.Caches.persistTracked) // feeds both sides of the semi-join
    val dup = grams.groupBy("g")
      .agg(min(idCol).as("lo"), max(idCol).as("hi"))
      .filter(col("lo") =!= col("hi")).select("g")
    mergeSpans(grams.join(dup, Seq("g"), "left_semi").select(idCol, "pos"),
      k, idCol)
  }

  /** Exact spans of `evalDocs` text inside `train` docs (e65's relation):
    * the eval side's distinct gram set BROADCASTS, so marking is a
    * map-side semi-join over the training scan — no shuffle of the
    * training corpus.
    */
  def contamSpans(train: DataFrame, evalDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 5): DataFrame = {
    val ev = evalDocs
      .select(explode(TextExpressions.distinctShingles(col(textCol), k)).as("gs"))
      .select(md5(col("gs")).as("g")).distinct()
    val marks = posGrams(train, idCol, textCol, k)
      .join(broadcast(ev), Seq("g"), "left_semi")
      .select(idCol, "pos")
    mergeSpans(marks, k, idCol)
  }

  /** Cut `spans` out of `docs` and account for the surgery: returns
    * `(idCol, n_before, n_after, scrubbed_md5)` for each AFFECTED doc
    * (a doc whose every token is covered vanishes — the correct surgical
    * outcome). `scrubbed_md5` digests the surviving words joined by a
    * single space, in original order.
    */
  def scrub(docs: DataFrame, spans: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val affected = docs
      .join(spans.select(idCol).distinct(), Seq(idCol), "left_semi")
    val words = affected
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos").cast("long").as("pos"), col("col").as("w"))
    val kept = words.alias("w").join(spans.alias("s"),
      col(s"w.$idCol") === col(s"s.$idCol") &&
        col("w.pos") >= col("s.span_start") && col("w.pos") <= col("s.span_end"),
      "left_anti")
    val agg = kept.groupBy(idCol)
      .agg(count(lit(1)).as("n_after"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ")).as("scrubbed_md5"))
    agg.join(affected.select(col(idCol),
        TextStats.wsTokens(col(textCol)).cast("long").as("n_before")), idCol)
      .select(idCol, "n_before", "n_after", "scrubbed_md5")
  }
}
