package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism compensation for compute-heavy scans.
  *
  * A scan's task count comes from the file layout (splits of
  * `spark.sql.files.maxPartitionBytes`), not from the cost of the expressions
  * evaluated over it: a small single-file table yields ONE task, so a
  * signature / regex / dot-product pass over it runs on one core while the
  * rest of the cluster idles. At production scale inputs carry far more
  * splits than the cluster has slots and [[spread]] is a no-op — the
  * condition derives from the plan's actual partitioning, never a constant
  * tuned for one deployment (spark_optimization_guide §2: partitioning must
  * be scale-adaptive).
  */
object Adaptive {

  /** `df` with at least `defaultParallelism` partitions: a round-robin
    * repartition when the current plan yields fewer, `df` unchanged
    * otherwise (and always unchanged for streaming frames, whose
    * partitioning is the micro-batch engine's business). The explicit
    * partition count keeps AQE from coalescing the exchange back below the
    * core count — coalescing targets bytes, and a compute-heavy projection
    * over few bytes is exactly the case this exists for. Row values are
    * untouched; callers must be row-order-independent (every graft operator
    * output is — aggregates, joins, or sorted-array builds).
    *
    * Call it on a NARROW projection (just the columns the heavy compute
    * needs) so the exchange carries keys and text, not the whole row —
    * guide §2.3, project before the exchange. */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current = df.rdd.getNumPartitions
    if (current > 0 && current < target) df.repartition(target) else df
  }
}
