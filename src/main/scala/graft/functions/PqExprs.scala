package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization encode: unit-normalize the vector, split it into
  * `m` contiguous subvectors, and emit for each the index of the L2-nearest
  * subspace centroid — one byte per subspace (`kSub` <= 256), so a 64-float
  * vector (256 B) becomes 8 B: the 32x memory compression that lets a
  * 10^9-vector index live in executor memory. One JITed static call per row
  * (the HOF-lambda shape would be CodegenFallback AND re-evaluate the
  * normalization per element — see CLAUDE.md).
  *
  * Determinism contract (the q_ann_pq oracle recomputes all of it):
  * normalization is element / norm (a division, not a multiply by the
  * reciprocal — different rounding); zero vectors skip normalization and
  * encode raw; L2^2 accumulates left-to-right in double; argmin ties keep the
  * SMALLEST centroid index (strict `<`). */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<double|float>, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  // never touch child.dataType at construction (unresolved children)
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("codebooks", books, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqEncode.compute($c, $b, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Static so generated code can call it. */
  def compute(emb: ArrayData, books: Array[Array[Array[Double]]], isFloat: Boolean): Array[Byte] = {
    val n = emb.numElements()
    val u = new Array[Double](n)
    var i = 0
    var sq = 0.0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      u(i) = x
      sq += x * x
      i += 1
    }
    val norm = math.sqrt(sq)
    if (norm != 0.0) {
      i = 0
      while (i < n) { u(i) = u(i) / norm; i += 1 }
    }
    val m = books.length
    // fail loudly on a codebook/vector mismatch (dim not m*sub): a silent
    // truncated encode would mis-rank every query against this index
    if (m * books(0)(0).length != n)
      throw new IllegalArgumentException(
        s"pq_encode: vector has $n dims but the codebook covers " +
          s"${m} x ${books(0)(0).length} — index built for a different dimension")
    val codes = new Array[Byte](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cents = books(mi)
      val sub = cents(0).length
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0.0
        var s = 0
        while (s < sub) {
          val diff = u(off + s) - c(s)
          d += diff * diff
          s += 1
        }
        if (d < bestD) { bestD = d; best = j } // ties: smallest index
        j += 1
      }
      codes(mi) = best.toByte
      off += sub
      mi += 1
    }
    codes
  }

  def apply(c: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    graftbridge.toColumn(PqEncode(graftbridge.toExpression(c), codebooks))
}

/** Asymmetric-distance (ADC) score over PQ codes: the query is NOT quantized;
  * its per-subspace dot products with every centroid are precomputed on the
  * driver into an m x kSub table, and each row's score is the sum of m table
  * lookups — 8 array reads + 8 adds per candidate instead of a 64-element
  * dot. Summation is over subspaces left-to-right (the oracle mirrors the
  * grouping: per-subspace dots first, then the m-term sum). */
case class PqAdcScore(child: Expression, table: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects binary codes, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"

  @transient private lazy val tbl: Array[Array[Double]] = table.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqAdcScore.compute(v.asInstanceOf[Array[Byte]], tbl)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("adcTable", tbl, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqAdcScore.compute($c, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {
  /** Static so generated code can call it. */
  def compute(codes: Array[Byte], table: Array[Array[Double]]): Double = {
    // fail loudly on an m mismatch (e.g. an index built with m=8 scored with
    // an m=4 table): a silently truncated sum mis-ranks instead of erroring
    if (codes.length != table.length)
      throw new IllegalArgumentException(
        s"pq_adc_score: ${codes.length} codes vs ${table.length}-subspace ADC table" +
          " — codes and query table come from different quantizers")
    var s = 0.0
    var mi = 0
    val m = codes.length
    while (mi < m) {
      s += table(mi)(codes(mi) & 0xFF)
      mi += 1
    }
    s
  }

  def apply(c: Column, table: Seq[Seq[Double]]): Column =
    graftbridge.toColumn(PqAdcScore(graftbridge.toExpression(c), table))
}

/** Per-ROW ADC table: [[PqAdcScore]]'s driver-side table, computed for every
  * row of a DataFrame column instead of once for a literal query — the piece
  * that turns ADC from a point-lookup tool into a JOIN tool (a delta of new
  * vectors scored against a corpus of PQ codes). table(mi)(j) = dot of the
  * unit-normalized input's mi-th subvector with codebook centroid j, exactly
  * [[graft.ops.Similarity.pqAdcTable]]'s arithmetic (divide-by-norm
  * normalization, zero vectors skipped, left-to-right accumulation), so a
  * literal-query score and a column-query score of the same pair agree
  * bit-for-bit. Cost: dim x kSub multiplies ONCE per row — alias it in its
  * own projection and reuse; never rebuild it per candidate. */
case class PqAdcTableExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_table expects array<double|float>, got ${other.catalogString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_table"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val books: Array[Array[Array[Double]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    PqAdcTableExpr.compute(v.asInstanceOf[ArrayData], books, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("codebooks", books, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqAdcTableExpr.compute($c, $b, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdcTableExpr =
    copy(child = newChild)
}

object PqAdcTableExpr {
  /** Static so generated code can call it. */
  def compute(emb: ArrayData, books: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val n = emb.numElements()
    val u = new Array[Double](n)
    var i = 0
    var sq = 0.0
    while (i < n) {
      val x = if (isFloat) emb.getFloat(i).toDouble else emb.getDouble(i)
      u(i) = x
      sq += x * x
      i += 1
    }
    val norm = math.sqrt(sq)
    if (norm != 0.0) {
      i = 0
      while (i < n) { u(i) = u(i) / norm; i += 1 }
    }
    val m = books.length
    if (m * books(0)(0).length != n)
      throw new IllegalArgumentException(
        s"pq_adc_table: vector has $n dims but the codebook covers " +
          s"${m} x ${books(0)(0).length} — index built for a different dimension")
    val rows = new Array[Any](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cents = books(mi)
      val sub = cents(0).length
      val row = new Array[Double](cents.length)
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var d = 0.0
        var s = 0
        while (s < sub) { d += u(off + s) * c(s); s += 1 }
        row(j) = d
        j += 1
      }
      rows(mi) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      off += sub
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  def apply(c: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    graftbridge.toColumn(PqAdcTableExpr(graftbridge.toExpression(c), codebooks))
}

/** [[PqAdcScore]] with the table as a COLUMN (a [[PqAdcTableExpr]] output)
  * instead of a literal — the join-side score: sum over subspaces of
  * table(mi)(code(mi)), same left-to-right accumulation, same loud m-mismatch
  * failure. m lookups + m adds per candidate pair; the 64-element dot never
  * runs in the join. */
case class PqAdcScorePair(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score_pair expects (binary, array<array<double>>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score_pair"

  override def nullSafeEval(codes: Any, table: Any): Any =
    PqAdcScorePair.compute(codes.asInstanceOf[Array[Byte]], table.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, t) => s"graft.functions.PqAdcScorePair.compute($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScorePair =
    copy(left = newLeft, right = newRight)
}

object PqAdcScorePair {
  /** Static so generated code can call it. */
  def compute(codes: Array[Byte], table: ArrayData): Double = {
    if (codes.length != table.numElements())
      throw new IllegalArgumentException(
        s"pq_adc_score_pair: ${codes.length} codes vs ${table.numElements()}-subspace " +
          "ADC table — codes and query table come from different quantizers")
    var s = 0.0
    var mi = 0
    val m = codes.length
    while (mi < m) {
      s += table.getArray(mi).getDouble(codes(mi) & 0xFF)
      mi += 1
    }
    s
  }

  def apply(codes: Column, table: Column): Column =
    graftbridge.toColumn(PqAdcScorePair(
      graftbridge.toExpression(codes), graftbridge.toExpression(table)))
}
