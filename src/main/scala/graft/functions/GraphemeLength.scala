package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Grapheme-cluster-exact string length (V14): Ecto's `validate_length`
  * counts GRAPHEMES by default, while Spark's `length()` counts codepoints —
  * they diverge on combining marks, emoji ZWJ sequences, etc. This native
  * Catalyst expression closes that gap without a UDF: `doGenCode` emits a
  * static call, so it stays inside whole-stage codegen.
  *
  * (SURVEY §4 "custom Expression — optional, 2 candidates": this is (a).)
  */
case class GraphemeLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"grapheme_length expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "grapheme_length"

  override def nullSafeEval(v: Any): Any =
    GraphemeLength.count(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraphemeLength.count($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): GraphemeLength =
    copy(child = newChild)
}

object GraphemeLength {
  /** Static so generated code can call it; BreakIterator is not thread-safe,
    * hence per-thread instances. */
  private val iterators = ThreadLocal.withInitial[java.text.BreakIterator](() =>
    java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT))

  def count(s: String): Int = {
    val it = iterators.get()
    it.setText(s)
    var n = 0
    while (it.next() != java.text.BreakIterator.DONE) n += 1
    n
  }

  def apply(c: Column): Column =
    graftbridge.toColumn(GraphemeLength(graftbridge.toExpression(c)))
}
