package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen expressions for duplicated-span detection (exact substring
  * dedup at token n-gram granularity — the distributed shape of Lee et al.
  * 2022's "Deduplicating Training Data Makes Language Models Better" suffix
  * dedup). Both run as one JITed static call per row; the per-token loops
  * would be interpreted per element as HOF lambdas (see CLAUDE.md).
  */

/** POSITIONAL hashed word n-grams: `out(i)` = hash of the n-gram starting at
  * token `i` — no dedup, the array index IS the position (contrast
  * [[NgramHashes]], which emits distinct shingles for set semantics). Same
  * tokenizer ([[TextTok.words]]), hash (Spark xxhash64, seed 42), and
  * short-document fallback (< n tokens => ONE whole-text gram at position 0)
  * as NgramHashes, so the two views of a document agree. */
case class NgramHashesAt(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_hashes_at needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes_at expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes_at"

  override def nullSafeEval(v: Any): Any =
    NgramHashesAt.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHashesAt.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesAt =
    copy(child = newChild)
}

object NgramHashesAt {
  /** Static so generated code can call it. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = TextTok.words(text.toString)
    def hash(s: String): Long = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
    if (toks.length < n) {
      new GenericArrayData(Array(hash(toks.mkString(" "))))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s <= toks.length - n) {
        sb.setLength(0)
        var w = 0
        while (w < n) { if (w > 0) sb.append(' '); sb.append(toks(s + w)); w += 1 }
        out(s) = hash(sb.toString)
        s += 1
      }
      new GenericArrayData(out)
    }
  }

  def apply(c: Column, n: Int): Column =
    graftbridge.toColumn(NgramHashesAt(graftbridge.toExpression(c), n))
}

/** Per-document span scrub: given the token positions where DUPLICATED
  * n-grams start, remove every token covered by one of them and report
  * (total_tokens, dup_tokens, scrubbed). A start `s` covers tokens
  * [s, min(s+n-1, ntokens-1)] — for short documents (< n tokens) the single
  * whole-text gram at 0 covers everything, matching [[NgramHashesAt]]'s
  * fallback. `scrubbed` re-joins surviving tokens with single spaces
  * (whitespace-normalizing, like every token-level operator here). Starts
  * need not be sorted or distinct; null-strict — callers coalesce the
  * no-duplicates case to an empty array. */
case class SpanScrub(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  require(n >= 1, s"span_scrub needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"span_scrub expects (string, array<int>), got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = SpanScrub.schema
  override def prettyName: String = "span_scrub"

  override def nullSafeEval(text: Any, starts: Any): Any =
    SpanScrub.compute(text.asInstanceOf[UTF8String], starts.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, s) => s"graft.functions.SpanScrub.compute($t, $s, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanScrub =
    copy(left = newLeft, right = newRight)
}

object SpanScrub {
  val schema: StructType = StructType(Seq(
    StructField("total_tokens", LongType, nullable = false),
    StructField("dup_tokens", LongType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  /** Static so generated code can call it. */
  def compute(text: UTF8String, starts: ArrayData, n: Int): InternalRow = {
    val toks = TextTok.words(text.toString)
    val nt = toks.length
    val covered = new Array[Boolean](nt)
    var i = 0
    while (i < starts.numElements()) {
      val s = starts.getInt(i)
      if (s >= 0 && s < nt) {
        var p = s
        val end = math.min(s + n - 1, nt - 1)
        while (p <= end) { covered(p) = true; p += 1 }
      }
      i += 1
    }
    var dup = 0L
    val sb = new java.lang.StringBuilder(text.numBytes())
    var first = true
    i = 0
    while (i < nt) {
      if (covered(i)) dup += 1L
      else {
        if (!first) sb.append(' ')
        sb.append(toks(i))
        first = false
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nt.toLong, dup, UTF8String.fromString(sb.toString)))
  }

  def apply(text: Column, starts: Column, n: Int): Column =
    graftbridge.toColumn(
      SpanScrub(graftbridge.toExpression(text), graftbridge.toExpression(starts), n))
}
