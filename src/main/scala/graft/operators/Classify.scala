package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  private val microLog = (x: Column) => round(log(x) * 1e6).cast("long")

  /** NB fit + serve over generic token relations — the core the langid
    * and quality classifiers share. `trainTok` = (cls, word) occurrences
    * (multiplicity kept), `testTok` = (doc_id, actual, word), `clsDocs` =
    * (cls, nd) training DOC counts for the priors. Returns the scored
    * frame (doc_id, actual, cand, score) — integer micro-log sums, one
    * row per (held-out doc, candidate class); callers argmax with the
    * (score desc, class asc) tie-break. */
  private def nbScores(trainTok: DataFrame, testTok: DataFrame,
                       clsDocs: DataFrame): DataFrame = {
    // the word×class count table feeds THREE consumers (class totals,
    // vocab size, the weight join) — checkpoint the vocab-sized frame
    // so the training aggregate runs once. EAGER (r16): a lazy
    // checkpoint read by concurrent consumers inside one job can race
    // the first materialization and recompute partitions — the funnel
    // idle-spread finding; eagerness pins the aggregate to exactly one
    // run
    val c = trainTok.groupBy("cls", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = true)
    val ct = c.groupBy("cls").agg(sum("c").as("ct"))
    val vocab = c.select("word").distinct().agg(count(lit(1)).as("v"))
    val denom = ct.crossJoin(vocab) // (cls, ct, v): L rows

    val w = c.join(denom.select("cls", "ct", "v"), "cls")
      .select(col("cls").as("cand"), col("word"),
        microLog((col("c") + 1).cast("double") /
          (col("ct") + col("v")).cast("double")).as("w"))
    val dw = denom.select(col("cls").as("cand"),
      microLog(lit(1.0) / (col("ct") + col("v")).cast("double")).as("dw"))
    val pw = clsDocs.crossJoin(clsDocs.agg(sum("nd").as("ndt")))
      .select(col("cls").as("cand"),
        microLog(col("nd").cast("double") / col("ndt").cast("double"))
          .as("pw"))

    testTok
      .crossJoin(broadcast(dw))
      .join(w, Seq("cand", "word"), "left")
      .groupBy("doc_id", "actual", "cand")
      .agg(sum(coalesce(col("w"), col("dw"))).as("sw"))
      .join(broadcast(pw), "cand")
      .withColumn("score", col("sw") + col("pw"))
  }

  /** Deterministic argmax over [[nbScores]] output. */
  private def argmax(scored: DataFrame): DataFrame = scored
    .withColumn("rk", row_number().over(
      Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("cand"))))
    .filter(col("rk") === 1)
    .select(col("doc_id"), col("actual"), col("cand").as("predicted"))

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
    val tok = tokens(docs).withColumnRenamed("lang", "cls")
    val train = tok.filter(col("doc_id") % 5 =!= 0)
    val test = tok.filter(col("doc_id") % 5 === 0)
      .withColumnRenamed("cls", "actual")
    val clsDocs = docs.filter(col("doc_id") % 5 =!= 0)
      .groupBy(col("lang").as("cls")).agg(count(lit(1)).as("nd"))
    argmax(nbScores(train, test, clsDocs))
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** ONE-SCAN signal base for the quality classifier (r17 optimization):
    * the integer signals that feed BOTH the rule-gate label and the
    * discretized feature tokens, computed in a single pass over the
    * corpus. Before r17 the family ran [[TextAnalysis.gopherFilter]]
    * (tokenize + 2-gram the whole corpus) AND a separate feature scan
    * (tokenize + 2-gram the whole corpus AGAIN), then shuffled the
    * exploded 4×-row feature frame into a doc_id join against the labels
    * — two full text scans and one exchange to attach a verdict both
    * scans had derived from the same arrays (guide §2.3/§2.4: project
    * early, never shuffle to re-attach what one scan already knows).
    * Now: one projection builds `words`/`g2` once, one row per doc with
    * six integers + the verdict, eagerly checkpointed (~7 numeric
    * columns, the narrowest frame the family ever materializes); labels
    * and features are row-local maps over the checkpoint.
    *
    * The `cls` verdict is expression-for-expression
    * [[TextAnalysis.gopherFilter]]'s `keep` at default thresholds (same
    * 4dp-rounded signals, same comparisons) — pinned by
    * ClassifySpec. */
  private def qualitySignals(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("n_chars"),
        TextAnalysis.tokens(col("text")).as("words"),
        TextAnalysis.wordNgrams(col("text"), 2).as("g2"))
      .select(col("doc_id"), col("n_chars"),
        size(col("words")).cast("long").as("n_tokens"),
        round((col("n_chars") - (size(col("words")) - 1))
          / size(col("words")), 4).as("mean_tok_len"),
        size(filter(col("words"),
          w => w.isin(TextAnalysis.enStop.map(lit): _*)))
          .cast("long").as("stop_cnt"),
        size(col("g2")).cast("long").as("n2"),
        size(array_distinct(col("g2"))).cast("long").as("nd2"))
      .select(col("doc_id"), col("n_chars"), col("n_tokens"),
        col("stop_cnt"), col("n2"), col("nd2"),
        TextAnalysis.keepExpr(col("n_tokens"), col("stop_cnt"),
          TextAnalysis.rep2Of(col("n2"), col("nd2")), col("mean_tok_len"))
          .cast("int").as("cls"))
      .localCheckpoint(eager = true) // eager: see nbScores' race note

  /** Per-doc DISCRETIZED quality-feature tokens + the rule-gate label,
    * both read off the one-scan [[qualitySignals]] checkpoint. Each doc
    * emits exactly four categorical feature tokens, every bucket an
    * INTEGER computation (DIV, never float division) so both engines
    * bucket identically:
    *   nt: token-count decade (capped 30)  st: stopword pairs (capped 20)
    *   ml: mean token length in tenths (capped 120)
    *   rp: duplicated-2-gram share in 5% steps
    * Label: the gate's keep verdict as int. */
  private def qualityLabeled(docs: DataFrame): (DataFrame, DataFrame) = {
    val sig = qualitySignals(docs)
    val labels = sig.select(col("doc_id"), col("cls"))
    val ft = sig.select(col("doc_id"), explode(array(
      concat(lit("nt:"),
        least(expr("n_tokens DIV 10"), lit(30L)).cast("string")),
      concat(lit("st:"),
        least(expr("stop_cnt DIV 2"), lit(20L)).cast("string")),
      concat(lit("ml:"),
        when(col("n_tokens") > 0,
          least(expr("((n_chars - (n_tokens - 1)) * 10) DIV n_tokens"),
            lit(120L))).otherwise(lit(0L)).cast("string")),
      concat(lit("rp:"),
        when(col("n2") > 0, expr("((n2 - nd2) * 20) DIV n2"))
          .otherwise(lit(0L)).cast("string")))).as("word"),
      col("cls"))
    (ft, labels)
  }

  /** The quality-NB scored frame every consumer reads — (doc_id, actual,
    * cand, score), checkpointed once (it feeds argmax, the margin agg,
    * and the ROC sweep; run-once-read-many). */
  private def qualityScored(docs: DataFrame): DataFrame = {
    val (ft, labels) = qualityLabeled(docs)
    val train = ft.filter(col("doc_id") % 5 =!= 0).select("cls", "word")
    val test = ft.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("cls").as("actual"), col("word"))
    val clsDocs = labels.filter(col("doc_id") % 5 =!= 0)
      .groupBy("cls").agg(count(lit(1)).as("nd"))
    nbScores(train, test, clsDocs).localCheckpoint(eager = true)
  }

  /** margin = score(keep) − score(drop) per held-out doc, exact integer
    * micro-logs: (doc_id, actual, margin). */
  private def qualityMargin(scored: DataFrame): DataFrame =
    scored.groupBy("doc_id", "actual").agg(
      (max(when(col("cand") === 1, col("score"))) -
        max(when(col("cand") === 0, col("score")))).as("margin"))

  /** TRAINED quality gate, per-doc serving view: NB fit on 4/5 of the
    * corpus over the discretized quality features against the rule-gate
    * labels, served on the held-out fifth. Output per held-out doc:
    * (doc_id, actual, predicted, margin) — margin = score(keep) −
    * score(drop), an exact integer micro-log difference; |margin| is the
    * confidence a curation owner thresholds when routing borderline docs
    * to review instead of auto-gating. */
  def nbQualityScores(docs: DataFrame): DataFrame = {
    val scored = qualityScored(docs)
    argmax(scored)
      .join(qualityMargin(scored).select("doc_id", "margin"), "doc_id")
      .select(col("doc_id"), col("actual"), col("predicted"),
        col("margin"))
  }

  /** Held-out confusion matrix of the trained quality gate vs the rule
    * gate — the readout that says whether the learned filter can stand
    * in for the rules (diagonal mass) and which failure direction it
    * leans (false-keep vs false-drop). Reads the argmax over the shared
    * scored frame directly — the margin aggregate+join the per-doc
    * serving view pays is irrelevant to a 2×2 count and is skipped. */
  def nbQualityConfusion(docs: DataFrame): DataFrame =
    argmax(qualityScored(docs))
      .groupBy("actual", "predicted")
      .agg(count(lit(1)).as("n"))

  /** Decision-threshold SWEEP of the trained quality gate — the tuning
    * table the dedup side already has three of (threshold/band/width):
    * the confusion matrix fixes ONE operating point (argmax ⇔ margin >
    * 0); a curation owner setting an auto-keep bar wants the whole
    * precision/recall frontier. For each threshold t (whole natural-log
    * units over the integer micro-log margin), predict keep iff
    * margin > t·1e6 — at t = 0 this reproduces the argmax operating
    * point exactly (score ties argmax to class 0, and margin > 0 is
    * false on a tie). Output per threshold: (threshold, tp, fp, fn, tn,
    * precision, recall) — counts exact, rates 4dp, precision NULL where
    * nothing is predicted keep.
    *
    * Scale shape: the scoring chain runs ONCE (the shared checkpointed
    * frame); the sweep is a |thresholds| × |held-out docs| conditional
    * aggregate over a broadcast thresholds frame — the
    * [[Dedup.thresholdSweep]] discipline. */
  def nbQualityRoc(docs: DataFrame,
                   thresholds: Seq[Long] = -10L to 10L): DataFrame = {
    require(thresholds.nonEmpty, "nbQualityRoc: at least one threshold")
    val margin = qualityMargin(qualityScored(docs))
    val th = docs.sparkSession.range(1)
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"))
    val p = broadcast(th).crossJoin(margin)
      .withColumn("pred",
        (col("margin") > col("threshold") * 1000000L).cast("int"))
    p.groupBy("threshold")
      .agg(
        sum(when(col("actual") === 1 && col("pred") === 1, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("actual") === 0 && col("pred") === 1, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("actual") === 1 && col("pred") === 0, 1L)
          .otherwise(0L)).as("fn"),
        sum(when(col("actual") === 0 && col("pred") === 0, 1L)
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4))
          .as("recall"))
  }

  /** CALIBRATION curve of the trained quality gate — the audit that
    * decides whether [[nbQualityScores]]' margin is USABLE as a routing
    * confidence (auto-gate the extremes, human-review the middle), not
    * just an argmax: held-out docs bucketed by margin in whole
    * natural-log units (micro-log DIV 1e6 via floor of an exact double
    * division — both engines floor identically; clamped to ±10), and
    * per bucket the empirical keep rate vs the predicted one. A
    * well-calibrated gate shows keep_rate rising monotonically through
    * 0; a flat curve says the margin carries no information and
    * thresholding it is theater. Everything except the final 4dp rate
    * is exact integer arithmetic.
    *
    * Scale shape: the [[nbQualityScores]] plan (two training
    * aggregates + one vocab-keyed scoring join) and then one ≤21-row
    * aggregate — nothing new crosses an exchange. */
  def nbQualityCalibration(docs: DataFrame): DataFrame =
    nbQualityScores(docs)
      .withColumn("bucket",
        least(greatest(floor(col("margin").cast("double") / 1e6)
          .cast("long"), lit(-10L)), lit(10L)))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"),
        sum(col("actual").cast("long")).as("n_keep_actual"),
        sum(col("predicted").cast("long")).as("n_pred_keep"),
        round(avg(col("actual").cast("double")), 4).as("keep_rate"))
}
