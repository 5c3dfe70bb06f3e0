package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native codegen Expression —
  * the canonical first step of web-scale text ingestion (the same logical
  * text arrives composed and decomposed; exact dedup, fingerprints and token
  * counts all diverge without it), and one Spark has no built-in for.
  * `doGenCode` emits one static call so the scan projection stays inside
  * whole-stage codegen; the fast path is `isNormalized` (a cheap scan that
  * avoids allocating for already-normalized text — the overwhelmingly common
  * case in practice, where most content is ASCII or already NFC).
  */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  // constructor-time option validation is fine (form is a literal, not the
  // child's unresolved dataType)
  require(UnicodeNormalize.forms.contains(form),
    s"unicode_normalize form must be one of ${UnicodeNormalize.forms.keys.mkString(", ")}; got '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.UnicodeNormalize.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[functions] val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Static so generated code can call it. Returns the input object untouched
    * when already normalized (no copy, no UTF8String re-encode). */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = forms(form)
    val str = s.toString
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }

  def apply(c: Column, form: String = "NFC"): Column =
    graftbridge.toColumn(UnicodeNormalize(graftbridge.toExpression(c), form))
}
