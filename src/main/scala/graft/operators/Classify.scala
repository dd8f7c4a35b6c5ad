package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine trainable classification: multinomial Naive Bayes over word
  * unigrams, trained AND served as one declarative plan — no model export,
  * no driver-side fit loop. No reference counterpart (SURVEY §2.8
  * north-star): the training-data use case is a fastText-class quality /
  * language gate you can retrain on every corpus snapshot because training
  * IS a groupBy.
  *
  * Numeric discipline: every weight is an integer micro-log
  * (round(ln(p)·1e6) as BIGINT — the [[TextAnalysis]] Zipf-fit precedent),
  * so scoring is exact integer addition and the argmax is engine-portable;
  * the only cross-engine float surface is the ln() call itself on
  * bit-identical double ratios. Laplace (add-one) smoothing; unseen test
  * words take the per-class default weight ln(1/(ct+V)).
  *
  * Scale shape: training is two hash aggregates (word×class counts, class
  * totals). Serving joins test tokens to the weight table on (class, word)
  * — vocab×L rows, a plain shuffle join — with the L-row class frame and
  * the priors broadcast. Nothing quadratic, nothing on the driver.
  */
object Classify {

  /** Token frame: (doc_id, lang, word), multinomial — multiplicity kept. */
  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      explode(filter(split(col("text"), " "), t => length(t) > 0))
        .as("word"))

  /** Train on doc_id % 5 ≠ 0, predict lang for the held-out fifth, return
    * the labeled confusion matrix (actual, predicted, n). Deterministic
    * end-to-end: integer scores, (score desc, class asc) argmax
    * tie-break. Test documents with no tokens have no evidence and drop
    * out (score would be the bare prior for every class — a coin toss a
    * confusion matrix should not launder).
    *
    * Honest readout on the driver's synthetic corpus: all five lang labels
    * draw from one shared 31-word vocabulary with near-uniform
    * frequencies, so there is NO lexical signal and NB correctly collapses
    * to the class prior (42/100 vs the 41/100 predict-en baseline at
    * sf0.01). That is the audit value of a trained-classifier confusion
    * matrix: it detects when labels are unlearnable from the features —
    * see ClassifySpec for the separable-vocabulary proof that the same
    * plan learns when signal exists. */
  def nbLangidConfusion(docs: DataFrame): DataFrame = {
    val tok = tokens(docs)
    val train = tok.filter(col("doc_id") % 5 =!= 0)
    val test = tok.filter(col("doc_id") % 5 === 0)
      .withColumnRenamed("lang", "actual")

    val c = train.groupBy("lang", "word").agg(count(lit(1)).as("c"))
    val ct = c.groupBy("lang").agg(sum("c").as("ct"))
    val vocab = c.select("word").distinct().agg(count(lit(1)).as("v"))
    val denom = ct.crossJoin(vocab) // (lang, ct, v): L rows

    val microLog = (x: org.apache.spark.sql.Column) =>
      round(log(x) * 1e6).cast("long")
    val w = c.join(denom.select("lang", "ct", "v"), "lang")
      .select(col("lang").as("cand"), col("word"),
        microLog((col("c") + 1).cast("double") /
          (col("ct") + col("v")).cast("double")).as("w"))
    val dw = denom.select(col("lang").as("cand"),
      microLog(lit(1.0) / (col("ct") + col("v")).cast("double")).as("dw"))

    val dTrain = docs.filter(col("doc_id") % 5 =!= 0)
    val pw = dTrain.groupBy("lang").agg(count(lit(1)).as("nd"))
      .crossJoin(dTrain.agg(count(lit(1)).as("ndt")))
      .select(col("lang").as("cand"),
        microLog(col("nd").cast("double") / col("ndt").cast("double"))
          .as("pw"))

    val scored = test
      .crossJoin(broadcast(dw))
      .join(w, Seq("cand", "word"), "left")
      .groupBy("doc_id", "actual", "cand")
      .agg(sum(coalesce(col("w"), col("dw"))).as("sw"))
      .join(broadcast(pw), "cand")
      .withColumn("score", col("sw") + col("pw"))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("cand"))))
      .filter(col("rk") === 1)
      .groupBy(col("actual"), col("cand").as("predicted"))
      .agg(count(lit(1)).as("n"))
  }
}
