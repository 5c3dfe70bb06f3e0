package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One record of the duplicate-audit stream: the first occurrence of a digest
  * emits keep=true; later occurrences emit keep=false with the running count. */
case class DedupEvent(id: Long, digest: String, keep: Boolean, dup_count: Long)

/** Streaming exact dedup for ingest pipelines: state is keyed by the 32-byte
  * content digest — rows shuffle by digest only (never text), and the state
  * store grows with DISTINCT content, not stream length.
  *
  * Two flavors:
  *  - [[dedupExactStream]]: Spark-first — the built-in streaming
  *    `dropDuplicates` keeps incremental state for us. Use this one.
  *  - [[dedupAuditStream]]: custom state via flatMapGroupsWithState for what
  *    the built-in can't express — every record is emitted WITH its keep
  *    decision and the running duplicate count per digest (an ingest audit
  *    trail). Demonstrates the KeyValueGroupedDataset custom-state seam.
  *
  * Production note: bound state with a watermark on an event-time column +
  * `dropDuplicatesWithinWatermark`, or a GroupStateTimeout — unbounded exact
  * dedup state is a deliberate choice here (content digests ARE the identity).
  */
object StreamingDedup {

  /** First occurrence per content digest survives, across micro-batches. */
  def dedupExactStream(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__digest", sha2(col(textCol), 256))
      .dropDuplicates("__digest")
      .drop("__digest")

  /** Audit stream: (id, digest, keep, dup_count) per input record. Within a
    * micro-batch the smallest id of a new digest is the keeper (deterministic
    * regardless of arrival order). */
  def dedupAuditStream(df: DataFrame, idCol: String, textCol: String): Dataset[DedupEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), sha2(col(textCol), 256).as("digest"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupEvent](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (digest: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val sorted = rows.map(_._1).toSeq.sorted
          val seenBefore = state.getOption.getOrElse(0L)
          val events = sorted.zipWithIndex.map { case (id, i) =>
            val priorDups = seenBefore + i
            DedupEvent(id, digest, keep = priorDups == 0L, dup_count = priorDups)
          }
          state.update(seenBefore + sorted.size)
          events.iterator
      }
  }
}
