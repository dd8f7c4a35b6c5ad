package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for data skipping — the lakehouse-side lever a
  * 100 TB table has besides partitioning and bucketing: ORDER the rows so
  * that per-file min/max statistics (parquet footers, Delta/Iceberg file
  * stats) prune most files for selective predicates.
  *
  * A single-column sort gives perfect pruning on that column and none on any
  * other; Z-ORDERING (Morton-interleaving the bits of two columns) trades a
  * little locality on each column for usable locality on both — the
  * standard multi-dimensional clustering recipe (Delta OPTIMIZE ZORDER BY,
  * Iceberg rewrite with zorder). Everything here is exact integer
  * arithmetic on quantized values, so the DuckDB oracle derives identical
  * file assignments and the skipping report is engine-portable.
  *
  * Scale shape: file assignment is a PURE MAP (quantize → interleave →
  * take the top prefix bits); no global sort or window anywhere. At write
  * time the production path is `repartitionByRange(zCol)` +
  * `sortWithinPartitions` — Spark's range exchange, parallel by
  * construction; the prefix-bits file id here is that same range
  * partitioning with fixed boundaries, which keeps the REPORT deterministic
  * and oracle-checkable. The min/max file stats the report aggregates are
  * exactly what parquet footers give for free at read time.
  */
object Layout {

  /** Morton/Z-value: interleave the low `bits` bits of two quantized
    * non-negative columns — a's bit j lands at 2j, b's at 2j+1. 2·bits
    * integer terms, all inside whole-stage codegen. */
  def zValue(qa: Column, qb: Column, bits: Int): Column =
    (0 until bits).map { j =>
      (shiftright(qa, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j))) +
        (shiftright(qb, j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1)))
    }.reduce(_ + _)

  /** Quantize `v` into [0, 2^bits) against broadcast corpus bounds
    * (`mn`/`mx` columns): floor((v − mn)·2^bits / (mx − mn + 1)); the +1
    * keeps the max value in range. The quotient is floored EXPLICITLY on
    * both engines (Spark `/` is double division; exact below 2^53 — key
    * spreads wider than that get a coarser pre-scale first). */
  def quantize(v: Column, mn: Column, mx: Column, bits: Int): Column =
    floor(((v - mn) * lit(1L << bits)) / (mx - mn + lit(1L))).cast("long")

  /** The data-skipping effectiveness report: lay `df` out two ways —
    * `linear_a` (range-partitioned on `colA` alone: the top
    * `filePrefixBits` bits of quantized a) and `zorder` (the top bits of
    * the Morton value) — compute each file's min/max stats for BOTH
    * columns, then probe each layout with `nProbes` evenly-spaced point
    * predicates per column and count the files whose [min, max] range
    * cannot be pruned. Output one row per (layout, probe_col):
    * `n_files`, `avg_touched` (mean files read per probe), `touch_share`
    * (4dp) — the table that says what Z-ordering buys the secondary
    * column and what it costs the primary.
    *
    * Plan: one bounds aggregate (broadcast back), one map pass deriving
    * quantized values + both file ids, two ≤2^filePrefixBits-row file-stat
    * aggregates, and a tiny probes×files cross product — the corpus is
    * scanned twice (bounds + stats) and never shuffled beyond the
    * file-keyed partial agg. */
  def zorderSkippingReport(df: DataFrame, colA: String, colB: String,
                           bits: Int = 8, filePrefixBits: Int = 6,
                           nProbes: Int = 16): DataFrame = {
    require(filePrefixBits >= 1 && filePrefixBits <= bits,
      "file prefix must fit in one dimension's bits")
    val bounds = df.agg(
      min(col(colA)).cast("long").as("a_mn"),
      max(col(colA)).cast("long").as("a_mx"),
      min(col(colB)).cast("long").as("b_mn"),
      max(col(colB)).cast("long").as("b_mx"))
    val q = df.crossJoin(broadcast(bounds)).select(
      quantize(col(colA).cast("long"), col("a_mn"), col("a_mx"), bits)
        .as("qa"),
      quantize(col(colB).cast("long"), col("b_mn"), col("b_mx"), bits)
        .as("qb"))
    val withFiles = q.select(col("qa"), col("qb"),
      shiftright(col("qa"), bits - filePrefixBits).as("file_lin"),
      shiftright(zValue(col("qa"), col("qb"), bits),
        2 * bits - filePrefixBits).as("file_z"))
    def stats(fileCol: String, layout: String): DataFrame =
      withFiles.groupBy(col(fileCol).as("file"))
        .agg(min(col("qa")).as("a_lo"), max(col("qa")).as("a_hi"),
          min(col("qb")).as("b_lo"), max(col("qb")).as("b_hi"))
        .withColumn("layout", lit(layout))
    val files = stats("file_lin", "linear_a")
      .unionByName(stats("file_z", "zorder"))
    // nProbes evenly-spaced quantized points per dimension — fixed probe
    // set, so the report never depends on a sampled workload
    val step = (1L << bits) / nProbes
    val probes = files.sparkSession.range(nProbes)
      .select((col("id") * step).as("p"))
    val touched = files.crossJoin(broadcast(probes))
      .groupBy(col("layout"))
      .agg(
        countDistinct(col("file")).as("n_files"),
        sum(when(col("a_lo") <= col("p") && col("p") <= col("a_hi"), 1L)
          .otherwise(0L)).as("touch_a"),
        sum(when(col("b_lo") <= col("p") && col("p") <= col("b_hi"), 1L)
          .otherwise(0L)).as("touch_b"))
    val perCol = touched.select(col("layout"), lit(colA).as("probe_col"),
        col("n_files"), col("touch_a").as("touches"))
      .unionByName(touched.select(col("layout"), lit(colB).as("probe_col"),
        col("n_files"), col("touch_b").as("touches")))
    perCol.select(col("layout"), col("probe_col"), col("n_files"),
      round(col("touches").cast("double") / nProbes, 4).as("avg_touched"),
      round(col("touches").cast("double") / nProbes /
        col("n_files"), 4).as("touch_share"))
  }

  /** Hilbert index of two quantized `bits`-bit columns, staged as one
    * withColumn round per bit (the classic xy2d walk: per level, the
    * quadrant digit (3·rx)⊕ry joins the index and the frame
    * flips/transposes for the next level). STAGED, not nested, on
    * purpose: each round reads the previous round's x/y several times,
    * and building the whole walk as one nested expression would multiply
    * the tree per level (the corpus_bpe_encode 3^k plan-size bug);
    * per-round projections keep the plan linear in `bits` — Catalyst's
    * CollapseProject declines to inline multiply-referenced non-trivial
    * aliases. All integer arithmetic; the oracle unrolls the identical
    * rounds as chained CTEs. Temp columns are dropped; `out` holds the
    * index in [0, 4^bits). */
  def withHilbert(df: DataFrame, qa: String, qb: String, bits: Int,
                  out: String): DataFrame = {
    val nMinus1 = lit((1L << bits) - 1)
    var cur = df.withColumn("_hx", col(qa)).withColumn("_hy", col(qb))
      .withColumn(out, lit(0L))
    for (j <- bits - 1 to 0 by -1) {
      val rx = shiftright(col("_hx"), j).bitwiseAND(lit(1L))
      val ry = shiftright(col("_hy"), j).bitwiseAND(lit(1L))
      cur = cur
        .withColumn("_rx", rx).withColumn("_ry", ry)
        .withColumn(out, col(out) + lit(1L << (2 * j)) *
          (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        .withColumn("_nx", when(col("_ry") === 1, col("_hx"))
          .otherwise(when(col("_rx") === 1, nMinus1 - col("_hy"))
            .otherwise(col("_hy"))))
        .withColumn("_ny", when(col("_ry") === 1, col("_hy"))
          .otherwise(when(col("_rx") === 1, nMinus1 - col("_hx"))
            .otherwise(col("_hx"))))
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
        .drop("_rx", "_ry", "_nx", "_ny")
    }
    cur.drop("_hx", "_hy")
  }

  /** [[zorderSkippingReport]] extended with the HILBERT layout — the
    * measured three-way dial (linear | Morton | Hilbert) a table-layout
    * decision reads: Hilbert's d-order neighbors are always
    * grid-adjacent (no Morton "seams" where the curve jumps across the
    * key space), so per-file min/max boxes are tighter in the worst case
    * at the cost of a deeper file-id computation. Same probe harness,
    * same pure-map file assignment, one extra staged-rounds projection;
    * output one row per (layout, probe_col) over all three layouts. */
  def hilbertSkippingReport(df: DataFrame, colA: String, colB: String,
                            bits: Int = 8, filePrefixBits: Int = 6,
                            nProbes: Int = 16): DataFrame = {
    require(filePrefixBits >= 1 && filePrefixBits <= bits,
      "file prefix must fit in one dimension's bits")
    val bounds = df.agg(
      min(col(colA)).cast("long").as("a_mn"),
      max(col(colA)).cast("long").as("a_mx"),
      min(col(colB)).cast("long").as("b_mn"),
      max(col(colB)).cast("long").as("b_mx"))
    val q = df.crossJoin(broadcast(bounds)).select(
      quantize(col(colA).cast("long"), col("a_mn"), col("a_mx"), bits)
        .as("qa"),
      quantize(col(colB).cast("long"), col("b_mn"), col("b_mx"), bits)
        .as("qb"))
    val withFiles = withHilbert(q, "qa", "qb", bits, "_hd")
      .select(col("qa"), col("qb"),
        shiftright(col("qa"), bits - filePrefixBits).as("file_lin"),
        shiftright(zValue(col("qa"), col("qb"), bits),
          2 * bits - filePrefixBits).as("file_z"),
        shiftright(col("_hd"), 2 * bits - filePrefixBits).as("file_h"))
    def stats(fileCol: String, layout: String): DataFrame =
      withFiles.groupBy(col(fileCol).as("file"))
        .agg(min(col("qa")).as("a_lo"), max(col("qa")).as("a_hi"),
          min(col("qb")).as("b_lo"), max(col("qb")).as("b_hi"))
        .withColumn("layout", lit(layout))
    val files = stats("file_lin", "linear_a")
      .unionByName(stats("file_z", "zorder"))
      .unionByName(stats("file_h", "hilbert"))
    val step = (1L << bits) / nProbes
    val probes = files.sparkSession.range(nProbes)
      .select((col("id") * step).as("p"))
    val touched = files.crossJoin(broadcast(probes))
      .groupBy(col("layout"))
      .agg(
        countDistinct(col("file")).as("n_files"),
        sum(when(col("a_lo") <= col("p") && col("p") <= col("a_hi"), 1L)
          .otherwise(0L)).as("touch_a"),
        sum(when(col("b_lo") <= col("p") && col("p") <= col("b_hi"), 1L)
          .otherwise(0L)).as("touch_b"))
    val perCol = touched.select(col("layout"), lit(colA).as("probe_col"),
        col("n_files"), col("touch_a").as("touches"))
      .unionByName(touched.select(col("layout"), lit(colB).as("probe_col"),
        col("n_files"), col("touch_b").as("touches")))
    perCol.select(col("layout"), col("probe_col"), col("n_files"),
      round(col("touches").cast("double") / nProbes, 4).as("avg_touched"),
      round(col("touches").cast("double") / nProbes /
        col("n_files"), 4).as("touch_share"))
  }
}
