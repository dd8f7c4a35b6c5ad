package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `ExpressionUtils` is `private[sql]` in Spark 4's classic module, so
  * the (two-line) conversion lives in this package — the standard pattern
  * for Spark extension libraries that ship their own `Expression`s. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build-side of Spark's own runtime-filter machinery, exposed as an
    * aggregate Column: a bloom filter over `hash` values (must be an
    * `xxhash64(...)` LONG — the same contract `InjectRuntimeFilter` uses).
    * Sized for `estimatedItems` with `numBits` bits; the serialized sketch
    * is the aggregate's BINARY result. */
  def bloomFilterAgg(hash: Column, estimatedItems: Long,
                     numBits: Long): Column =
    column(new BloomFilterAggregate(expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe-side: `might_contain(bloom, xxhash64(value))`. `bloom` must be a
    * foldable BINARY or a scalar subquery ([[scalarSubquery]]) — the same
    * analysis rule Spark's runtime filters satisfy. Codegen'd; false
    * positives possible, false negatives impossible. */
  def mightContain(bloom: Column, hash: Column): Column =
    column(BloomFilterMightContain(expression(bloom), expression(hash)))

  /** A 1-row/1-column Dataset as a lazy scalar subquery expression — lets a
    * driver-bounded artifact (a bloom sketch, a fitted parameter) flow into
    * another plan WITHOUT a collect at plan-construction time. The plan is
    * analyzed here so the subquery drops into the outer query fully
    * resolved, exactly how `InjectRuntimeFilter` plants bloom subqueries. */
  def scalarSubquery(ds: Dataset[_]): Column =
    column(ScalarSubquery(ds.queryExecution.analyzed))
}
