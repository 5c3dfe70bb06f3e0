package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale model: brute-force cosine is ONE narrow scan + a top-k aggregate
  * (no shuffle of vectors, only of k-sized heaps via TakeOrdered) — the right
  * baseline up to ~10^8 rows/query batch. The LSH path (random hyperplane
  * signatures) buckets vectors so a query touches only matching buckets —
  * the 100 TB path; signatures are deterministic from a seed so the index is
  * reproducible and checkpoint-friendly.
  */
object Similarity {

  /** dot(a, b) in double precision (stable across engines vs float accum). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors of a literal query vector.
    * The filter/projection is codegen'd; `orderBy().limit(k)` becomes
    * TakeOrderedAndProject — each partition keeps only k rows. */
  def topKCosine(df: DataFrame, idCol: String, embCol: String, query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol).as("id"), cosine(col(embCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cosine").desc, col("id").asc)))
      .select("rank", "id", "cosine")
  }

  /** Deterministic random hyperplanes (seeded LCG on the driver). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Seq.fill(numPlanes)(Seq.fill(dim)(next()))
  }

  /** Sign-of-dot-product signature: numPlanes-bit bucket id as a long. */
  def lshSignature(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, array(p.map(lit): _*)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: group vectors by hyperplane signature; a query probes
    * its own bucket plus all buckets within `probeHamming` sign flips, then
    * ranks candidates by exact cosine. Recall grows with probes; cost stays
    * ~candidates instead of ~corpus. */
  def lshTopKCosine(
      df: DataFrame, idCol: String, embCol: String, query: Seq[Double], k: Int,
      numPlanes: Int = 12, probeHamming: Int = 2, seed: Long = 42L): DataFrame = {
    val dim = query.size
    val planes = hyperplanes(numPlanes, dim, seed)
    val indexed = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      lshSignature(col(embCol), planes).as("sig"))
    // query signature computed on the driver (tiny)
    val qSig = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    // all signatures within probeHamming bit flips of qSig
    def sigsWithin(h: Int): Seq[Long] = {
      def flips(bits: Seq[Int]): Long = bits.map(1L << _).sum ^ qSig
      val idxs = 0 until numPlanes
      (0 to h).flatMap {
        case 0 => Seq(qSig)
        case 1 => idxs.map(i => flips(Seq(i)))
        case 2 => for (i <- idxs; j <- idxs if j > i) yield flips(Seq(i, j))
        case n => idxs.combinations(n).map(c => flips(c)).toSeq
      }
    }
    val candidates = indexed.filter(col("sig").isin(sigsWithin(probeHamming): _*))
    val q = array(query.map(lit): _*)
    candidates.select(col("id"), cosine(col("emb"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cosine").desc, col("id").asc)))
      .select("rank", "id", "cosine")
  }

  // ---------------------------------------------------------------------------
  // IVF (inverted-file) index: k-means coarse quantizer + probe-limited search.
  // The scale path for 10^9+ vectors: each query scans only `nprobe` cells
  // instead of the corpus. Training is distributed (assignment is a codegen'd
  // argmin over centroid literals; centroid update explodes to (cluster, dim)
  // pairs and averages — k*dim rows collected to the driver, never vectors).
  // Deterministic: centroids init from the k smallest ids, fixed iterations.
  // ---------------------------------------------------------------------------

  /** Unit-normalize as a two-projection shape: the norm (an aggregate) must be
    * an alias in its OWN projection — embedding it inside the per-element
    * transform lambda re-evaluates the whole 64-op aggregate per element
    * (measured ~5 ms/row: 64 elems x 16 centroids x 64-op norm). */
  private def withUnit(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(embCol).as("emb"), norm(col(embCol)).as("__n"))
      .select(col("id"), col("emb"),
        transform(col("emb"), x => x.cast(DoubleType) / col("__n")).as("u"))

  /** Cell assignment = argmax of raw dot(emb, centroid): centroids are kept
    * unit-norm, and cosine order is invariant to the row's own norm — so no
    * per-row normalization is needed at assignment time at all. ONE nested
    * literal for the centroid matrix keeps the Catalyst tree tiny. */
  private def nearestCentroid(emb: Column, centroids: Seq[Seq[Double]]): Column = {
    val cAll = typedlit(centroids)
    array_max(zip_with(cAll, sequence(lit(0), lit(centroids.size - 1)),
      (c, i) => struct(dot(emb, c).as("d"), i.as("idx")))).getField("idx")
  }

  /** Train the coarse quantizer: deterministic init (k smallest ids), `iters`
    * Lloyd rounds on unit-normalized vectors. */
  def ivfTrain(df: DataFrame, idCol: String, embCol: String, k: Int, iters: Int = 3): Seq[Seq[Double]] = {
    val v = withUnit(df, idCol, embCol)
    var centroids: Seq[Seq[Double]] = v.orderBy("id").limit(k)
      .select("u").collect().map(_.getSeq[Double](0).toSeq).toSeq
    for (_ <- 1 to iters) {
      val assigned = v.select(nearestCentroid(col("u"), centroids).as("cl"), col("u"))
      val sums = assigned
        .select(col("cl"), posexplode(col("u")).as(Seq("dim", "x")))
        .groupBy("cl", "dim").agg(avg(col("x")).as("m"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      centroids = centroids.zipWithIndex.map { case (old, i) =>
        val dim = old.size
        val cand = (0 until dim).map(d => sums.getOrElse((i, d), old(d)))
        val n = math.sqrt(cand.map(x => x * x).sum)
        if (n > 0) cand.map(_ / n) else old // keep unit-norm (cosine geometry)
      }
    }
    centroids
  }

  /** IVF-bucketed top-k cosine: assign corpus to cells once, then scan only the
    * `nprobe` cells nearest to the query. */
  def ivfTopKCosine(
      df: DataFrame, idCol: String, embCol: String, query: Seq[Double], k: Int,
      numCells: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val centroids = ivfTrain(df, idCol, embCol, numCells, iters)
    val qn = math.sqrt(query.map(x => x * x).sum)
    val qu = query.map(_ / qn)
    val probeCells = centroids.zipWithIndex
      .map { case (c, i) => (c.zip(qu).map { case (a, b) => (a - b) * (a - b) }.sum, i) }
      .sorted.take(nprobe).map(_._2)
    // assignment works on the raw embedding (argmax dot vs unit centroids)
    val indexed = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      nearestCentroid(col(embCol).cast("array<double>"), centroids).as("cell"))
    val q = array(qu.map(lit): _*)
    indexed.filter(col("cell").isin(probeCells: _*))
      .select(col("id"), cosine(col("emb"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id").asc)
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cosine").desc, col("id").asc)))
      .select("rank", "id", "cosine")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Exact O(n^2) flavor
    * for verification; LSH-bucketed flavor for scale (pairs only form inside a
    * bucket — brute force within buckets of similar vectors). */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, embCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(embCol).as("emb"))
    val a = v.withColumnsRenamed(Map("id" -> "id_a", "emb" -> "emb_a"))
    val b = v.withColumnsRenamed(Map("id" -> "id_b", "emb" -> "emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  def cosineNearDupPairsLsh(
      df: DataFrame, idCol: String, embCol: String, threshold: Double,
      numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val v = df.select(col(idCol).as("id"), col(embCol).as("emb"),
      lshSignature(col(embCol), planes).as("sig"))
    val a = v.withColumnsRenamed(Map("id" -> "id_a", "emb" -> "emb_a", "sig" -> "sig_a"))
    val b = v.withColumnsRenamed(Map("id" -> "id_b", "emb" -> "emb_b", "sig" -> "sig_b"))
    a.join(b, col("sig_a") === col("sig_b") && col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
