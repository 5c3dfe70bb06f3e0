package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen text-statistics expressions. Same rationale as
  * SignatureExprs: the Column-tree versions of these per-row loops are
  * higher-order functions — CodegenFallback, lambdas interpreted per element,
  * never CSE'd. Measured on sf0.1 documents: the HOF shingle pipeline put
  * q_decontaminate at 3.3 s and the distinct x filter top-word fold put
  * q_text_repetition at 5.9 s (~1.2 ms/row); both drop to one JITed static
  * call per row here.
  */

/** Distinct hashed word n-gram shingles — bit-identical to
  * `transform(array_distinct(TextOps.shingles(text, n)), xxhash64)` (Spark's
  * xxhash64 on strings = XXH64.hashUTF8String, seed 42), including the
  * whole-text fallback shingle for documents shorter than n tokens. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_hashes needs n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(v: Any): Any =
    NgramHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/** Shared whitespace tokenizer for the native text expressions — exactly
  * `split("\\s+")` with empties dropped (the same token stream TextOps.tokens
  * and the DuckDB oracles use). */
private[functions] object TextTok {
  def words(s: String): Array[String] = {
    val toks0 = s.split("\\s+")
    var nonEmpty = 0
    var i = 0
    while (i < toks0.length) { if (toks0(i).nonEmpty) nonEmpty += 1; i += 1 }
    if (nonEmpty == toks0.length) toks0
    else {
      val toks = new Array[String](nonEmpty)
      i = 0; var j = 0
      while (i < toks0.length) { if (toks0(i).nonEmpty) { toks(j) = toks0(i); j += 1 }; i += 1 }
      toks
    }
  }
}

object NgramHashes {
  /** Static so generated code can call it. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = TextTok.words(text.toString)
    def hash(s: String): Long = XXH64.hashUTF8String(UTF8String.fromString(s), 42L)
    if (toks.length < n) {
      new GenericArrayData(Array(hash(toks.mkString(" "))))
    } else {
      val seen = new java.util.HashSet[String](toks.length * 2)
      val out = new java.util.ArrayList[java.lang.Long](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s <= toks.length - n) {
        sb.setLength(0)
        var w = 0
        while (w < n) { if (w > 0) sb.append(' '); sb.append(toks(s + w)); w += 1 }
        val sh = sb.toString
        if (seen.add(sh)) out.add(hash(sh))
        s += 1
      }
      val arr = new Array[Long](out.size)
      var k = 0
      while (k < arr.length) { arr(k) = out.get(k); k += 1 }
      new GenericArrayData(arr)
    }
  }

  def apply(c: Column, n: Int): Column =
    graftbridge.toColumn(NgramHashes(graftbridge.toExpression(c), n))
}

/** One-pass within-document repetition statistics:
  * (top_word_count, n_tokens, distinct_bigrams, n_bigrams) — exact string
  * multiplicities (no hashing shortcuts), matching the Gopher-style filters'
  * integer numerators/denominators. */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = RepetitionStats.schema
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

object RepetitionStats {
  val schema: StructType = StructType(Seq(
    StructField("top_word_count", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))

  /** Static so generated code can call it. */
  def compute(text: UTF8String): InternalRow = {
    val toks0 = text.toString.split("\\s+")
    val counts = new java.util.HashMap[String, Int]()
    var nTokens = 0L
    var top = 0L
    var i = 0
    var prev: String = null
    val bigrams = new java.util.HashSet[String]()
    var nBigrams = 0L
    while (i < toks0.length) {
      val t = toks0(i)
      if (t.nonEmpty) {
        nTokens += 1
        val c = counts.merge(t, 1, Integer.sum)
        if (c > top) top = c
        if (prev != null) { bigrams.add(prev + " " + t); nBigrams += 1 }
        prev = t
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](top, nTokens, bigrams.size.toLong, nBigrams))
  }

  def apply(c: Column): Column =
    graftbridge.toColumn(RepetitionStats(graftbridge.toExpression(c)))
}

/** One-pass language-ID evidence argmax: per-language stopword hit counts
  * over lowercased whitespace tokens, best language by (count, earliest in
  * table), zero evidence -> "und" (never expression-null: defineCodeGen's
  * null tracking follows the CHILD only, so the helper must be total).
  * Bit-identical to the Column shape `array_max(array(struct(size(filter(
  * tokens(lower(text)), isin(sw))), -i, lang)))` it replaces — which was k
  * interpreted HOF filters re-walking the token array per language (the
  * largest remaining interpreted-HOF battery line at 0.65 s). Here: one
  * token->language-bitmask hash map, one JITed pass. */
case class LangIdBest(child: Expression, table: Seq[(String, Seq[String])])
    extends UnaryExpression {
  require(table.nonEmpty && table.size <= 64, "lang_id takes 1..64 languages")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val model = new LangIdBest.Model(table)

  override def nullSafeEval(v: Any): Any = model.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("langIdModel", model, classOf[LangIdBest.Model].getName)
    defineCodeGen(ctx, ev, c => s"$m.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdBest =
    copy(child = newChild)
}

object LangIdBest {
  /** Precompiled evidence table: token -> bitmask of languages listing it.
    * Serializable so executors and generated code share one instance. */
  final class Model(table: Seq[(String, Seq[String])]) extends Serializable {
    private val langs: Array[UTF8String] =
      table.map(t => UTF8String.fromString(t._1)).toArray
    private val und = UTF8String.fromString("und")
    private val mask = {
      val m = new java.util.HashMap[String, java.lang.Long]()
      table.zipWithIndex.foreach { case ((_, sw), i) =>
        sw.foreach(w => m.merge(w, java.lang.Long.valueOf(1L << i),
          (a, b) => java.lang.Long.valueOf(a.longValue | b.longValue)))
      }
      m
    }
    def compute(text: UTF8String): UTF8String = {
      val toks = TextTok.words(text.toLowerCase.toString)
      val counts = new Array[Int](langs.length)
      var i = 0
      while (i < toks.length) {
        val m = mask.get(toks(i))
        if (m != null) {
          var bits = m.longValue
          while (bits != 0L) {
            counts(java.lang.Long.numberOfTrailingZeros(bits)) += 1
            bits &= bits - 1
          }
        }
        i += 1
      }
      var best = 0; var bi = -1; var l = 0
      // strict > keeps the EARLIEST language on ties (the (count, -index)
      // struct-argmax order of the Column version)
      while (l < counts.length) { if (counts(l) > best) { best = counts(l); bi = l }; l += 1 }
      if (bi < 0) und else langs(bi)
    }
  }

  def apply(c: Column, table: Seq[(String, Seq[String])]): Column =
    graftbridge.toColumn(LangIdBest(graftbridge.toExpression(c), table))
}
