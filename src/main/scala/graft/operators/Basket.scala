package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association mining — the classic co-occurrence lift
  * report over (order, part) baskets: which parts appear together more
  * often than their individual popularities predict. For a pair (a, b)
  * over N orders, lift = (n_ab·N)/(n_a·n_b) — an EXACT integer rational,
  * so both engines divide identical BIGINTs and the 4dp rounding happens
  * BEFORE the top-k ordering with (part_a, part_b) ties
  * (round-before-decide, the tfidf determinism recipe).
  *
  * Scale shape: baskets dedupe to DISTINCT (order, part) first, the pair
  * generation is a SELF-EQUI-JOIN on the order key (never a cartesian —
  * per-order fanout is bounded by basket size, the interval-join
  * contract), per-part and per-pair supports are two aggregates, and a
  * minimum pair-support threshold kills the hapax-pair noise before the
  * global TakeOrdered. */
object Basket {

  def basketLift(lineitem: DataFrame, minPairSupport: Long = 5,
                 topK: Int = 20): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("part"))
      .distinct()
    val partN = baskets.groupBy("part").agg(count(lit(1)).as("n_part"))
    val orders = baskets.agg(countDistinct(col("okey")).as("n_orders"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.okey") === col("b.okey") && col("a.part") < col("b.part"))
      .groupBy(col("a.part").as("part_a"), col("b.part").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs
      .join(partN.select(col("part").as("part_a"),
        col("n_part").as("n_a")), "part_a")
      .join(partN.select(col("part").as("part_b"),
        col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(orders))
      .select(col("part_a"), col("part_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        // n_ab·N ~ 1e20 at lake-scale order counts — assemble both
        // products in DECIMAL(38,0) (the filter-agreement discipline)
        round((col("n_ab").cast("decimal(38,0)") *
            col("n_orders").cast("decimal(38,0)")).cast("double") /
          (col("n_a").cast("decimal(38,0)") *
            col("n_b").cast("decimal(38,0)")).cast("double"), 4)
          .as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(topK)
  }
}
