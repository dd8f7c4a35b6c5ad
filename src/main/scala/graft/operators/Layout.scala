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
}
