package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns — the hot loop of every
  * similarity/near-dup operator as a whole-stage-codegen'd Catalyst
  * expression instead of an interpreted `aggregate(zip_with(...))` fold
  * (higher-order functions never enter codegen; per-element lambda dispatch
  * costs ~100× the multiply-add it wraps).
  *
  * Semantics mirror the HOF formulation bit-for-bit so the DuckDB oracle
  * parity is preserved: elements promoted to double, strict left-to-right
  * accumulation, NULL if the inputs are NULL, have different lengths (the
  * zip_with pad-with-null behavior), or contain a NULL element.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(l: NumericType, _), ArrayType(r: NumericType, _))
          if l == r =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product needs two arrays of the same numeric type, got " +
            s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val et = elemType(left)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val p = et match {
        case FloatType  => x.getFloat(i).toDouble * y.getFloat(i).toDouble
        case DoubleType => x.getDouble(i) * y.getDouble(i)
        case IntegerType => x.getInt(i).toDouble * y.getInt(i).toDouble
        case LongType   => x.getLong(i).toDouble * y.getLong(i).toDouble
        case _ => return null
      }
      acc += p
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = elemType(left) match {
      case FloatType   => "getFloat"
      case DoubleType  => "getDouble"
      case IntegerType => "getInt"
      case LongType    => "getLong"
      case t => throw new IllegalStateException(s"unsupported $t")
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Identifiers MUST come from freshName: `a`/`b` are the children's
      // VALUE code, which is only sometimes a bare variable — e.g. a
      // foldable child arrives as `((ArrayData) references[1])`, and
      // splicing that into an identifier is a Janino syntax error that
      // silently drops the whole projection to interpreted mode.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd dot product; drop-in for
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)`. */
  def dotNative(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(
      GraftShims.expression(a), GraftShims.expression(b)))
}
