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

  /** Adds a `split` column assigning each row to a named split with the given
    * weights (normalized; need not sum to 1). Assignment depends only on
    * (key, salt): growing the corpus never moves an existing row between
    * splits, and bumping `salt` re-rolls the whole assignment. */
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
    df.withColumn("split", assigned)
  }

  /** Adds a `bin` column packing rows into fixed-cost bins WITHIN each shard
    * (the pack-then-truncate layout: bin = exclusive-prefix-sum(cost) /
    * budget over the shard's `orderCol` order). The window is per-shard by
    * design — packing a 100 TB corpus happens within shards (a global order
    * would funnel everything through one partition); shardCol also becomes
    * the natural write partitioning for the packed output. */
  def packByCostBudget(
      df: DataFrame, shardCol: String, orderCol: String, costCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
    df.withColumn("bin",
      floor((sum(col(costCol)).over(w) - col(costCol)) / budget.toDouble).cast("long"))
  }
}
