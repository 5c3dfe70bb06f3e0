package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen signature expressions for the dedup hot paths.
  *
  * Why not Column trees: higher-order functions (transform/aggregate/zip_with)
  * are CodegenFallback AND their lambdas are interpreted per element — the
  * 120-bit simhash vote fold costs ~tokens x 120 interpreted evals per row
  * (measured ~1.8 ms/row at sf0.1), and HOF subtrees are never CSE'd. These
  * expressions run the same math as one JITed static call, so the projection
  * stays inside whole-stage codegen (`*(n)` span in the executed plan).
  *
  * Bit-compatibility contracts (tests + the DuckDB oracle rely on them):
  *  - SimHashSig == the documented md5 construction: ONE md5 per whitespace
  *    token; words = base-16 parse of hex chars 1-15 and 16-30 (60 bits each);
  *    +-1 votes per bit; sign fold.
  *  - MinHashSig == pmod(xxhash64(shingle, seed=42), p) folded through k
  *    deterministic (a,b) permutations — identical values to the previous
  *    aggregate/zip_with Column pipeline (XXH64.hashUTF8String is exactly
  *    Spark's xxhash64 on strings).
  */
case class SimHashSig(child: Expression, words: Int = SimHashSig.Words)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects string, got ${child.dataType.catalogString}")
    else if (words < 1) TypeCheckResult.TypeCheckFailure(
      s"simhash_sig needs words >= 1, got $words")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(v: Any): Any =
    SimHashSig.compute(v.asInstanceOf[UTF8String], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c, $words)")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  val BitsPerWord = 60
  /** Default width: two 60-bit words (120 bits) — the q_dedup_simhash oracle
    * construction. Wider signatures (see [[compute]]) keep bucket values
    * ~log2(corpus) bits at 10^9+ docs: chunk width = bits/(maxHamming+1), so
    * at maxHamming=8, 120 bits gives 13-bit chunks (~10^5 docs/bucket-value
    * at 10^9 docs) while words=4 gives 26-bit chunks. */
  val Words = 2
  val Bits: Int = BitsPerWord * Words

  private val mds = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static so generated code can call it. Word construction (engine-portable,
    * md5-derived): words 2j and 2j+1 come from digest d_j, where d_0 =
    * md5(token) — bit-identical to the fixed-width original — and d_j =
    * md5(token || "#" || j) for j >= 1; each digest yields two 60-bit words
    * from hex chars 1-15 and 16-30. */
  def compute(text: UTF8String, words: Int): ArrayData = {
    val bits = BitsPerWord * words
    val votes = new Array[Int](bits)
    val toks = text.toString.split("\\s+")
    val md = mds.get()
    val digests = (words + 1) / 2
    var ti = 0
    while (ti < toks.length) {
      val t = toks(ti)
      if (t.nonEmpty) {
        var dj = 0
        while (dj < digests) {
          val material = if (dj == 0) t else t + "#" + dj
          val dig = md.digest(material.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // hex chars 1-15: bytes 0-6 then the high nibble of byte 7
          var w0 = 0L
          var i = 0
          while (i < 7) { w0 = (w0 << 8) | (dig(i) & 0xffL); i += 1 }
          w0 = (w0 << 4) | ((dig(7) & 0xffL) >>> 4)
          // hex chars 16-30: low nibble of byte 7 then bytes 8-14
          var w1 = dig(7) & 0x0fL
          i = 8
          while (i < 15) { w1 = (w1 << 8) | (dig(i) & 0xffL); i += 1 }
          val base0 = 2 * dj * BitsPerWord
          val base1 = base0 + BitsPerWord
          var k = 0
          while (k < BitsPerWord) {
            votes(base0 + k) += (if (((w0 >>> k) & 1L) == 1L) 1 else -1)
            if (base1 < bits)
              votes(base1 + k) += (if (((w1 >>> k) & 1L) == 1L) 1 else -1)
            k += 1
          }
          dj += 1
        }
      }
      ti += 1
    }
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var sig = 0L
      var k = 0
      while (k < BitsPerWord) {
        if (votes(w * BitsPerWord + k) > 0) sig |= (1L << k)
        k += 1
      }
      out(w) = sig
      w += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column): Column = apply(c, Words)
  def apply(c: Column, words: Int): Column =
    graftbridge.toColumn(SimHashSig(graftbridge.toExpression(c), words))
}

/** MinHash signature (k longs) over word n-gram shingles — one JITed pass:
  * tokenize, slide the n-gram window, xxhash64 each shingle once, fold all k
  * permutation minima. Replaces the aggregate/zip_with Column fold (which was
  * CodegenFallback and the #2 bench line). */
case class MinHashSig(child: Expression, shingleN: Int, numHashes: Int, seed: Long,
    portable: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects string, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(v: Any): Any =
    MinHashSig.compute(v.asInstanceOf[UTF8String], shingleN, numHashes, seed, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSig.compute($c, $shingleN, $numHashes, ${seed}L, $portable)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31-1; a*h stays < 2^62 (no overflow). */
  val MersennePrime31 = 2147483647L

  /** Deterministic (a, b) permutation coefficients — the same splitmix-style
    * LCG the Column pipeline used; cached per (k, seed). */
  def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) =
    cache.computeIfAbsent((k, seed), { _ =>
      var s = seed
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 33 }
      val a = new Array[Long](k); val b = new Array[Long](k)
      var i = 0
      while (i < k) { a(i) = next() % (MersennePrime31 - 1) + 1; b(i) = next() % MersennePrime31; i += 1 }
      (a, b)
    })

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  private val mds = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** ENGINE-PORTABLE raw shingle hash: the first 15 hex chars of md5 parsed
    * as a 60-bit positive long — the same md5-derived randomness discipline
    * as SimHashSig/Sharding, so any engine (the DuckDB oracle included)
    * reproduces it from `md5(shingle)` alone. */
  def md5Raw60(s: String): Long = {
    val dig = mds.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var w0 = 0L
    var i = 0
    while (i < 7) { w0 = (w0 << 8) | (dig(i) & 0xffL); i += 1 }
    (w0 << 4) | ((dig(7) & 0xffL) >>> 4)
  }

  /** Static so generated code can call it. Spark's xxhash64 on strings is
    * XXH64.hashUTF8String with seed 42 — values are bit-identical to the
    * previous pmod(xxhash64(shingle), p) Column pipeline. `portable = true`
    * swaps the raw shingle hash for [[md5Raw60]] (everything else — the
    * (a,b) permutations, the Mersenne modulus — is already reproducible from
    * SQL literals): use it when another engine must recompute the signature
    * bit-for-bit; xxhash64 stays the fast default. */
  def compute(text: UTF8String, n: Int, k: Int, seed: Long,
      portable: Boolean = false): ArrayData = {
    val (as, bs) = coeffs(k, seed)
    val toks = TextTok.words(text.toString)
    val acc = Array.fill(k)(MersennePrime31)
    def fold(shingle: String): Unit = {
      val raw =
        if (portable) md5Raw60(shingle)
        else XXH64.hashUTF8String(UTF8String.fromString(shingle), 42L)
      val h = ((raw % MersennePrime31) + MersennePrime31) % MersennePrime31
      var c = 0
      while (c < k) {
        val v = (as(c) * h + bs(c)) % MersennePrime31
        if (v < acc(c)) acc(c) = v
        c += 1
      }
    }
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s <= toks.length - n) {
        sb.setLength(0)
        var w = 0
        while (w < n) { if (w > 0) sb.append(' '); sb.append(toks(s + w)); w += 1 }
        fold(sb.toString)
        s += 1
      }
    } else {
      fold(toks.mkString(" "))
    }
    new GenericArrayData(acc)
  }

  def apply(c: Column, shingleN: Int, numHashes: Int, seed: Long): Column =
    apply(c, shingleN, numHashes, seed, portable = false)

  def apply(c: Column, shingleN: Int, numHashes: Int, seed: Long,
      portable: Boolean): Column =
    graftbridge.toColumn(
      MinHashSig(graftbridge.toExpression(c), shingleN, numHashes, seed, portable))
}
