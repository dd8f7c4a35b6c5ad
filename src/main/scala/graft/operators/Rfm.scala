package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM customer segmentation — the classic recency/frequency/monetary
  * scoring every retention/analytics stack ships, built on the exact
  * integer-rank quantile machinery this repo already trusts
  * (`doc_quality_buckets`): per customer, days since last order (against
  * the CORPUS max date, so the report is reproducible, not wall-clock),
  * order count, and lifetime spend in exact cents; each metric scored
  * 1–5 by quintile cutoffs read at integer ranks off the metric's own
  * value histogram. No ntile() over the customer table: cutoffs come
  * from histogram cumsums (distinct-value-sized windows — bounded for
  * recency/frequency; monetary's histogram can approach customer
  * cardinality, the same documented dial as quality_buckets' exact path,
  * with percentile_approx as the sketch twin at 100 TB).
  *
  * Portability: cutoffs are `min value whose cumulative count reaches
  * rank_k = max(1, (k·n) DIV 5)` — pure integer decisions; scores are
  * integer comparisons against those cutoffs (higher-better for F/M,
  * inverted for recency); `rfm` concatenates the three digits.
  */
object Rfm {

  /** 1-row frame of the four ascending quintile cutoffs of `v` in
    * `hist(v, c)`, at integer ranks max(1, k·n DIV 5). */
  private def ascCuts(hist: DataFrame): DataFrame = {
    // r18: the monetary histogram approaches customer cardinality, so
    // the cumulative count comes from the two-level DataQuality.cumHist
    // instead of a single-partition Window.orderBy sort (VERDICT item 8).
    val cum = DataQuality.cumHist(hist, "v", Seq("c" -> "cum"))
      .crossJoin(broadcast(hist.agg(sum(col("c")).as("n"))))
    // rank_k = max(1, (k·n) DIV 5) as pure integer arithmetic, the
    // bucketByCuts `(… div …)` pattern
    val cuts = (1 to 4).map(k =>
      min(when(col("cum") >= expr(s"greatest(n * $k, 5) div 5"),
        col("v"))).as(s"c$k"))
    cum.agg(cuts.head, cuts.tail: _*)
  }

  private def scoreAsc(v: Column): Column =
    lit(1) + (1 to 4).map(k =>
      when(v > col(s"c$k"), 1).otherwise(0): Column).reduce(_ + _)

  def rfm(orders: DataFrame): DataFrame = {
    val refDate = orders.agg(max(col("o_orderdate")).as("ref"))
    val base = orders
      .crossJoin(broadcast(refDate))
      .groupBy(col("o_custkey"))
      .agg(
        min(datediff(col("ref"), col("o_orderdate"))).cast("long")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        sum((col("o_totalprice").cast("decimal(18,2)") *
          lit(100).cast("decimal(3,0)")).cast("long")).as("monetary_c"))
    // r18: the per-customer aggregate feeds three value histograms, each
    // histogram's cut frame AND the final scoring pass — checkpoint it
    // once instead of re-running the orders aggregate per consumer.
    val baseCk = base.localCheckpoint(eager = false)
    def hist(c: String): DataFrame =
      baseCk.groupBy(col(c).as("v")).agg(count(lit(1)).as("c"))
    val rCuts = ascCuts(hist("recency_days"))
    val fCuts = ascCuts(hist("frequency"))
    val mCuts = ascCuts(hist("monetary_c"))
    val scored = baseCk
      .crossJoin(broadcast(rCuts))
      .withColumn("r_score",
        (lit(6) - scoreAsc(col("recency_days"))).cast("long"))
      .drop("c1", "c2", "c3", "c4")
      .crossJoin(broadcast(fCuts))
      .withColumn("f_score", scoreAsc(col("frequency")).cast("long"))
      .drop("c1", "c2", "c3", "c4")
      .crossJoin(broadcast(mCuts))
      .withColumn("m_score", scoreAsc(col("monetary_c")).cast("long"))
      .drop("c1", "c2", "c3", "c4")
    scored.select(col("o_custkey"), col("recency_days"), col("frequency"),
      col("monetary_c"), col("r_score"), col("f_score"), col("m_score"),
      (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .as("rfm"))
  }
}
