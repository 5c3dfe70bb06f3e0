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
}
