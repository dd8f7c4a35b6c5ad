package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level reporting and batching operators for a training-data
  * pipeline over `documents(doc_id, text, lang, source, n_chars)`. No
  * reference counterpart (SURVEY §2.8 north-star).
  */
object CorpusOps {

  /** Corpus composition report: per (source, lang), document and token
    * counts plus each stratum's share of all corpus tokens — the mixing
    * dashboard a data team reads before setting [[TextAnalysis.mixSample]]
    * rates. Two aggregates (stratum, then a 1-row global total joined back
    * by broadcast); the corpus is scanned once. */
  def corpusStats(docs: DataFrame): DataFrame = {
    val g = docs
      .select(col("source"), col("lang"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    g.crossJoin(broadcast(g.agg(sum(col("n_tokens")).as("total"))))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total"), 4)
          .as("token_share"))
  }

  /** Deterministic offset-bin sequence packing: within each source, docs are
    * laid end-to-end in doc_id order and each doc is assigned the
    * `maxTokens`-sized bin its FIRST token falls in — the stride-packing
    * approximation of training-sequence assembly (greedy first-fit is
    * inherently sequential; offset binning is one window cumsum, scales, and
    * is deterministic across engines and retries). Output (doc_id, source,
    * n_tokens, pack_id).
    *
    * Scale note: the window partitions by source — a single giant source
    * serializes into one partition's sort. At 100 TB, pre-split hot sources
    * on a salt that the pack_id offset arithmetic folds back in, or pack per
    * (source, date) strata. */
  def packSequences(docs: DataFrame, maxTokens: Long = 512): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / lit(maxTokens).cast("double"))
          .cast("long").as("pack_id"))
  }
}
