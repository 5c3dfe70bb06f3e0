package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset sharding primitives for training pipelines: deterministic
  * train/val/test assignment and shard-local sequence packing. Both are pure
  * Column/window transforms — no shuffle beyond the declared partitioning,
  * no driver-side state.
  */
object Sharding {

  /** Uniform [0,1) hash of a key — md5-derived (not xxhash) so ANY engine
    * reproduces the assignment, and keyed on the VALUE so it is stable under
    * repartitioning, reordering, resharding, and re-runs. */
  def unitHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long").cast("double") / 4294967296.0

  /** Uniform shard id in [0, numShards) from the same md5 value hash —
    * integer mod (never a float bucket boundary), so any engine reproduces it
    * bit-for-bit. The standard fine-grained window/write partitioning key:
    * compose it with a coarse label (split, source, ...) so no window ever
    * funnels a whole corpus through one partition. */
  def shardColumn(key: Column, numShards: Int, salt: String = ""): Column = {
    require(numShards > 0, "numShards must be positive")
    pmod(conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long"), lit(numShards.toLong))
  }

  /** Adds a `split` column assigning each row to a named split with the given
    * weights (normalized; need not sum to 1). Assignment depends only on
    * (key, salt): growing the corpus never moves an existing row between
    * splits, and bumping `salt` re-rolls the whole assignment.
    *
    * A null key RAISES (fail loud): a null would otherwise hash to null and
    * silently fall through every bound into the last-declared split — a
    * skewed, surprising default for the rows least likely to be intended
    * input. Filter or coalesce nulls explicitly before splitting. */
  def hashSplit(
      df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
      salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "at least one split")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    val total = weights.map(_._2).sum
    val bounds = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = unitHash(col(keyCol), salt)
    val assigned = weights.map(_._1).zip(bounds).init
      .foldRight(lit(weights.last._1): Column) {
        case ((name, bound), acc) => when(u < bound, lit(name)).otherwise(acc)
      }
    df.withColumn("split",
      when(col(keyCol).isNull,
        raise_error(lit(s"hashSplit: null key in column '$keyCol'")))
        .otherwise(assigned))
  }

  /** Adds a `bin` column packing rows into fixed-cost bins WITHIN each shard
    * (the pack-then-truncate layout: bin = exclusive-prefix-sum(cost) /
    * budget over the shard's `orderCol` order). The window is per-shard by
    * design — packing a 100 TB corpus happens within shards (a global order
    * would funnel everything through one partition); compose a fine-grained
    * shard key (e.g. split + [[shardColumn]]) so no shard value carries a
    * corpus-sized partition, and reuse shardCols as the packed output's write
    * partitioning.
    *
    * The frame is an explicit ROWS exclusive-prefix (`rowsBetween(
    * unboundedPreceding, -1)`), not the default RANGE frame: RANGE makes
    * orderCol ties share a peers-inclusive sum, mis-assigning bins whenever
    * orderCol repeats. `orderCol` must still be UNIQUE within each shard for
    * the assignment to be deterministic (tied rows would pack in an arbitrary
    * engine-dependent order) — doc ids are the natural choice. */
  def packByCostBudget(
      df: DataFrame, shardCols: Seq[String], orderCol: String, costCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shardCols.nonEmpty, "at least one shard column")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bin",
      floor(coalesce(sum(col(costCol)).over(w), lit(0L)) / budget.toDouble).cast("long"))
  }

  /** Single-shard-column convenience overload. */
  def packByCostBudget(
      df: DataFrame, shardCol: String, orderCol: String, costCol: String,
      budget: Long): DataFrame =
    packByCostBudget(df, Seq(shardCol), orderCol, costCol, budget)

  /** The integer form of [[unitHash]]: uniform in [0, 2^32) from the same
    * md5 value hash. Sampling decisions compare THIS against a precomputed
    * integer threshold (floor(fraction * 2^32)) — an integer compare has no
    * float-boundary ambiguity, so every engine reproduces the row set. */
  def intHash(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long")

  private def threshold(fraction: Double): Long =
    math.floor(fraction * 4294967296.0).toLong

  /** Deterministic per-stratum Bernoulli sample: keeps a row iff the md5 value
    * hash of its key falls under its stratum's fraction — the training-mix
    * curation primitive (e.g. keep 50% of 'en', 10% of everything else).
    * Value-keyed like [[hashSplit]]: stable under repartitioning and corpus
    * growth, `salt` re-rolls, and the same key always gets the same verdict.
    * Strata not in `fractions` (including null) use `defaultFraction`.
    * One codegen'd filter — no shuffle, no sampling state, pushes down to the
    * scan like any predicate. Null keys raise (same contract as hashSplit). */
  def stratifiedSample(
      df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = ""): DataFrame = {
    require((defaultFraction +: fractions.values.toSeq).forall(f => f >= 0 && f <= 1),
      "fractions must be in [0, 1]")
    val h = intHash(col(keyCol), salt)
    val thr = fractions.toSeq.sortBy(_._1).foldRight(lit(threshold(defaultFraction)): Column) {
      case ((s, f), acc) => when(col(strataCol) === s, lit(threshold(f))).otherwise(acc)
    }
    df.filter(
      when(col(keyCol).isNull,
        raise_error(lit(s"stratifiedSample: null key in column '$keyCol'")))
        .otherwise(h < thr))
  }

  /** Deterministic per-stratum corpus mixing by fractional repetition weight:
    * each row appears floor(w) times plus one more iff the md5 value hash
    * falls under frac(w) — so a stratum weighted 2.5 contributes each row 2
    * or 3 times (expected 2.5x), 0.25 keeps a quarter of rows once, and 0
    * drops the stratum. Output gains a `copy` column (0-based repetition
    * index) so downstream exact dedup does not collapse the planned repeats.
    * The explode is narrow (no shuffle); weights are per-VALUE-key stable
    * like [[stratifiedSample]]. Strata not in `weights` (including null) use
    * `defaultWeight`. Null keys raise. */
  def sampleByWeights(
      df: DataFrame, keyCol: String, strataCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = ""): DataFrame = {
    require((defaultWeight +: weights.values.toSeq).forall(_ >= 0),
      "weights must be non-negative")
    val h = intHash(col(keyCol), salt)
    def copiesOf(w: Double): Column = {
      val whole = math.floor(w).toLong
      lit(whole) + when(h < lit(threshold(w - whole)), 1L).otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1).foldRight(copiesOf(defaultWeight)) {
      case ((s, w), acc) => when(col(strataCol) === s, copiesOf(w)).otherwise(acc)
    }
    df.withColumn("__copies",
        when(col(keyCol).isNull,
          raise_error(lit(s"sampleByWeights: null key in column '$keyCol'")))
          .otherwise(copies))
      .filter(col("__copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }
}
