package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty strings to a clean
  * dictionary by edit distance, WITHOUT the all-pairs compare. No reference
  * counterpart (SURVEY §2.8 north-star family) — a training-data pipeline
  * needs this to canonicalize scraped entity mentions (site names, licenses,
  * authors) against a registry before dedup/attribution can group by them.
  *
  * Scale shape: the classic blocking design — candidates share a cheap
  * deterministic BLOCKING key (here: first character; real deployments use
  * phonetic keys or key unions), so per-query comparisons are bounded by
  * block size, never |queries|×|dictionary|. The O(|a|·|b|) Levenshtein DP
  * runs only inside blocks, and the dictionary side of the join is
  * broadcast (an entity registry is dimension-sized; drop the hint if yours
  * is not). Best-match selection is one per-query window: deterministic
  * (lev asc, name asc) tie-break, so results are engine-portable.
  */
object Linkage {

  /** Deterministic "dirty" variant of a clean name, keyed by id — three
    * mangle classes (delete 2nd char / duplicate 3rd char / vowel shift in
    * the tail), NONE touching the first character, so the blocking key
    * survives the noise the way a robust real-world key must. Used to
    * derive a self-evaluating linkage benchmark from any name column. */
  def mangle(name: Column, id: Column): Column = {
    val tail = name.substr(lit(2), length(name))
    when(id % 3 === 0,
      concat(name.substr(lit(1), lit(1)), name.substr(lit(3), length(name))))
      .when(id % 3 === 1,
        concat(name.substr(lit(1), lit(3)), name.substr(lit(3), length(name))))
      .otherwise(
        concat(name.substr(lit(1), lit(1)), replace(tail, lit("e"), lit("a"))))
  }

  /** Link each query row to its best dictionary entry within the block.
    *
    * `queries`: (q_id, q_name, …carried columns); `dictionary`: (name),
    * names distinct. Output: input columns + (matched_name, lev) — one row
    * per query that found a match at distance ≤ `maxLev`; queries whose
    * block holds no candidate within the cap drop out (count them via
    * [[linkEval]], which left-joins back to the full query set).
    *
    * The `lev ≤ maxLev` filter sits ON the joined frame so Spark evaluates
    * it as a join residual — candidate volume is block-bounded before any
    * DP runs on oversized pairs. */
  def linkEntities(queries: DataFrame, dictionary: DataFrame,
                   maxLev: Int = 3): DataFrame = {
    val d = dictionary.select(col("name"),
      substring(col("name"), 1, 1).as("block"))
    val scored = queries
      .withColumn("block", substring(col("q_name"), 1, 1))
      .join(broadcast(d), "block")
      .withColumn("lev", levenshtein(col("q_name"), col("name")).cast("long"))
      .filter(col("lev") <= maxLev)
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("lev"), col("name"))))
      .filter(col("rk") === 1)
      .drop("rk", "block")
      .withColumnRenamed("name", "matched_name")
  }

  /** Self-evaluating accuracy rollup per mangle class: requires `queries`
    * to carry `true_name` (the clean form the mangle was derived from).
    * Left join keeps unmatched queries in the denominator — an ER report
    * that silently drops them overstates accuracy. All-integer output
    * (accuracy in 1e-4 units). */
  def linkEval(queries: DataFrame, dictionary: DataFrame,
               maxLev: Int = 3): DataFrame = {
    val matched = linkEntities(queries, dictionary, maxLev)
      .select(col("q_id"), col("matched_name"))
    queries.join(matched, Seq("q_id"), "left")
      .groupBy((col("q_id") % 3).as("mangle"))
      .agg(count(lit(1)).as("n_queries"),
        count(col("matched_name")).as("n_matched"),
        sum(when(col("matched_name") === col("true_name"), 1L)
          .otherwise(0L)).as("n_correct"))
      .withColumn("accuracy_e4", expr("(10000 * n_correct) DIV n_queries"))
  }
}
