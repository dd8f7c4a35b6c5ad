package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure `DataFrame => DataFrame` combinators re-expressing the reference's
  * record-at-a-time CDR processing as declarative Spark SQL plans.
  *
  * Conventions:
  *  - raw input is a single string column (default `value`);
  *  - `parseDelim` materializes a `f: array<string>` column; downstream
  *    combinators address fields by the reference's 0-based indexes;
  *  - delimiters are literal strings (escaped before hitting Spark's
  *    regex-based `split`);
  *  - all combinators are driver-side plan constructors — nothing here
  *    collects, loops over rows, or breaks whole-stage codegen.
  */
object CdrOps {

  /** Escape a literal delimiter for Spark's regex-based split. */
  private def rx(delim: String): String =
    java.util.regex.Pattern.quote(delim)

  /** Split `value` into a field array, KEEPING trailing empty fields
    * (limit -1). The reference relies on Scala `split` which drops trailing
    * empties (reference: src/DesenPross.scala:181 — the 44-field sample ends
    * in `|`); we standardize on keeping them (SURVEY §2.9.10) and document
    * arity accordingly. */
  def parseDelim(df: DataFrame, delim: String, in: String = "value",
                 out: String = "f"): DataFrame =
    df.withColumn(out, split(col(in), rx(delim), -1))

  /** 0-based field accessor over the parsed array (reference `colRey`,
    * src/DesenPross.scala:53-64, minus its "ERROR" fallback — see
    * [[fieldOrError]]). `element_at` is 1-based, hence the +1. */
  def field(i: Int, f: String = "f"): Column = element_at(col(f), i + 1)

  /** Field accessor with the reference's lenient out-of-range behavior:
    * `colRey` returns the literal "ERROR" instead of throwing
    * (reference: src/DesenPross.scala:62). */
  def fieldOrError(i: Int, f: String = "f"): Column =
    coalesce(try_element_at(col(f), lit(i + 1)), lit("ERROR"))

  /** Dirty-data filter: keep records whose arity matches the spec
    * (reference: src/ProcessSums.scala:435, 过滤掉脏数据). */
  def arityFilter(df: DataFrame, fieldCount: Int, f: String = "f"): DataFrame =
    df.filter(size(col(f)) === lit(fieldCount))

  /** MD5-mask the given 0-based field positions in place, leaving every other
    * field untouched (reference `strRen`/`strRens`,
    * src/DesenPross.scala:94-115,146-153). Out-of-range indexes are no-ops by
    * construction (SURVEY §2.9.8); empty fields still hash — `md5("") =
    * d41d8cd98f00b204e9800998ecf8427e` (SURVEY §2.9.9). */
  def maskFields(df: DataFrame, idxs: Seq[Int], f: String = "f"): DataFrame = {
    val wanted = idxs.map(i => lit(i)).toArray
    df.withColumn(f, transform(col(f), (x, i) =>
      when(i.isin(wanted.toIndexedSeq: _*), md5(x)).otherwise(x)))
  }

  /** Drop the given 0-based field positions, rebuilding the record without
    * them (reference `strReplace`/`strReplaces` 屏蔽,
    * src/DesenPross.scala:123-142,157-165 — its shift-by-position index
    * arithmetic disappears here because we filter by original index). */
  def dropFields(df: DataFrame, idxs: Seq[Int], f: String = "f"): DataFrame = {
    val dropped = idxs.map(i => lit(i)).toArray
    df.withColumn(f, filter(col(f), (_, i) =>
      !i.isin(dropped.toIndexedSeq: _*)))
  }

  /** Project the parsed array down to the given 0-based positions, in the
    * given order (reference `processData` 44→10 projection,
    * src/DesenPross.scala:167-176). */
  def projectFields(df: DataFrame, idxs: Seq[Int], f: String = "f"): DataFrame =
    df.withColumn(f, array(idxs.map(i => element_at(col(f), i + 1)): _*))

  /** Re-join the field array back into a delimited line. */
  def rejoin(df: DataFrame, delim: String, f: String = "f",
             out: String = "value"): DataFrame =
    df.withColumn(out, concat_ws(delim, col(f)))

  /** Derive the 2-char record-type routing column (reference: 11 per-prefix
    * `filter(_.startsWith(tag))` legs over a cached stream,
    * src/StreamingSocketProcess.scala:138-159 — here a single pass that
    * Catalyst can fan out or `partitionBy`). */
  def withRecordType(df: DataFrame, in: String = "value"): DataFrame =
    df.withColumn("record_type", substring(col(in), 1, 2))

  /** One routing leg: records of a single logical table. */
  def routeTo(df: DataFrame, prefix: String, in: String = "value"): DataFrame =
    df.filter(col(in).startsWith(prefix))

  /** Composite LAC,CI enrichment key (reference: `result(lac) + "," +
    * result(ci)`, src/ProcessSums.scala:439). */
  def lookupKey(lacIdx: Int, ciIdx: Int, f: String = "f"): Column =
    concat_ws(",", field(lacIdx, f), field(ciIdx, f))

  /** Broadcast inner equi-join against a small code-map dimension, dropping
    * records with no match — the reference probes a broadcast HashMap and
    * drops records whose lookup yields "" (reference `processTable`,
    * src/ProcessSums.scala:434-448; broadcast at
    * src/StreamingSocketProcess.scala:112-120). `dim` must have columns
    * (`key`, `dimValue`); rows with empty values count as no-match. */
  def enrichLookup(fact: DataFrame, dim: DataFrame, factKey: Column,
                   dimValue: String = "dim_value"): DataFrame = {
    val d = dim.filter(col(dimValue) =!= "")
    fact.join(broadcast(d), factKey === d("key"), "inner").drop("key")
  }

  /** Load a TSV code map as a (key, dim_value) dimension DataFrame —
    * the reference's driver-side HashMap loaders re-expressed
    * (readFromHDFS11: key=c0,c1 val=c2 arity==3,
    * src/StreamingSocketProcess.scala:46-59; readFromHDFS22: key=c1,c2
    * val=c5, src/ProcessSums.scala:61-74). Instead of collecting to
    * the driver we keep it a DataFrame and let `broadcast()` ship it.
    *
    * `strict = true` is the guarded contract: rows must match `arity`
    * exactly. `strict = false` is the reference's LIVE 7-col variant — its
    * arity guard is commented out (src/StreamingSocketProcess.scala:68-70),
    * so under/over-arity rows are kept as long as the key/value positions
    * exist (the reference would crash on rows missing them; we drop those —
    * a loader must not fail the job on one short line). */
  def loadCodeMap(df: DataFrame, keyIdxs: (Int, Int), valIdx: Int,
                  arity: Int, f: String = "f",
                  strict: Boolean = true): DataFrame = {
    val kept =
      if (strict) arityFilter(df, arity, f)
      else df.filter(
        size(col(f)) > lit(keyIdxs._1 max keyIdxs._2 max valIdx))
    kept.select(
      concat_ws(",", field(keyIdxs._1, f), field(keyIdxs._2, f)).as("key"),
      field(valIdx, f).as("dim_value"))
  }

  /** Per-key content aggregation: the bag of records for a key as one
    * newline-joined string (reference's buffer-accumulate writers,
    * src/ProcessSums.scala:237-331, src/ProcessSum1.scala:268-301 — their
    * prepend order and adjacency-run grouping are explicitly NOT part of the
    * contract, SURVEY §2.9.2-3; we sort for determinism). */
  def groupConcat(df: DataFrame, key: Column, valueCol: String = "value")
      : DataFrame =
    df.groupBy(key.as("group_key"))
      .agg(
        array_join(array_sort(collect_list(col(valueCol))), "\n")
          .as("content"),
        count(lit(1)).as("n"))

  /** The flagship enrichment pipeline (reference's intended-but-disabled
    * core, SURVEY §2.9.1): parse → arity-filter → mask → key → broadcast
    * inner join → project `(masked phones…, starttime, area, tag)`.
    * Output columns: phone1_m[, phone2_m], starttime, area, tag. */
  def enrichPipeline(lines: DataFrame, spec: TableSpec, dim: DataFrame)
      : DataFrame = {
    val parsed = parseDelim(routeTo(lines, spec.prefix), spec.delim)
    val clean = arityFilter(parsed, spec.fieldCount)
    val keyed = clean.withColumn("la_ci", lookupKey(spec.lacCol, spec.ciCol))
    val joined = enrichLookup(keyed, dim, col("la_ci"))
    val phones = spec.maskCols.zipWithIndex.map { case (c, i) =>
      md5(field(c)).as(s"phone${i + 1}_m")
    }
    joined.select(
      phones ++ Seq(
        field(spec.starttimeCol).as("starttime"),
        col("dim_value").as("area"),
        lit(spec.tag).as("tag")): _*)
  }
}
