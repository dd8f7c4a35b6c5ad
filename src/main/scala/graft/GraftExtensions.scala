package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.DotProduct

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
  }
}
