package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** dot(a, b) in double precision as ONE JITed static call. The Column shape
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) is CodegenFallback with
  * per-element interpreted lambdas — at 10^8+ vectors the brute-force cosine
  * baseline scan would be interpretation-bound. Accumulation is left-to-right
  * in doubles, bit-identical to the previous fold (the ANN oracles depend on
  * it: DuckDB's list_dot_product accumulates the same way).
  *
  * Null semantics: null input array => null; arrays of DIFFERENT LENGTHS =>
  * null — a truncated/corrupt embedding must surface as a null/violation, not
  * rank normally on a plausible common-prefix dot (zip_with-fold parity).
  * Null ELEMENTS inside an array read as 0 — the embedding contract is dense
  * vectors (the fold would have nulled the whole dot instead). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _                                    => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<double|float> x array<double|float>, got " +
        s"${left.dataType.catalogString} x ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null on length mismatch, even for non-null inputs
  override def prettyName: String = "dot_product"

  // resolved-only: never read child dataTypes at construction time
  private def lFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else DotProduct.compute(x, y, lFloat, rFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProduct.compute($a, $b, $lFloat, $rFloat);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Static so generated code can call it. */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    graftbridge.toColumn(DotProduct(graftbridge.toExpression(a), graftbridge.toExpression(b)))
}
