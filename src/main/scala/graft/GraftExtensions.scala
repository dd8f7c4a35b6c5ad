package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, TopKByScore}

/** Session extension registering graft's custom Catalyst expressions for SQL
  * users: `spark.sql("SELECT dot_product(a, b) ...")`.
  *
  * Activate with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * on the session builder (or `spark.sql.extensions` in spark-defaults) —
  * the standard injection point for third-party Catalyst extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product",
        "dot_product(a, b) - codegen'd double dot product of two numeric " +
          "arrays; NULL on length mismatch or null element.", ""),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, null,
        "top_k_by_score",
        "top_k_by_score(score, id, k) - aggregate: the k best (score, id) " +
          "pairs per group under score DESC, id ASC, as an ordered " +
          "array<struct<score,c_id>>; k must be a literal.", ""),
      (children: Seq[Expression]) => {
        require(children.length == 3 && children(2).foldable,
          "top_k_by_score(score, id, k): k must be a foldable literal")
        val k = children(2).eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"top_k_by_score: integer k expected, got $other")
        }
        TopKByScore(children(0), children(1), k)
      }))
  }
}
