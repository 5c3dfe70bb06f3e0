package graft.streaming

import graft.ops.Decontaminate
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming benchmark decontamination: a document's verdict depends only on
  * its own n-grams and the STATIC probe (benchmark) set, so the operator is
  * stateless across micro-batches — `foreachBatch` over the batch operator is
  * the idiomatic Structured Streaming shape here, not a stateful stream agg
  * (whose state would buy nothing and grow with the stream). The probe's
  * hashed n-grams are computed once and persisted; each trigger pays one
  * batch-side shingle pass plus the hash join (probe side broadcast when
  * small, which a benchmark set is).
  */
object StreamingDecontaminate {

  /** Configured writer that, per micro-batch, hands `sink` the batch MINUS
    * documents colliding with the probe set at >= minHits shared n-grams.
    * Caller starts/stops the query (and sets trigger/checkpoint options).
    *
    * `sink` must MATERIALIZE its DataFrame before returning (write/collect/
    * foreach): the micro-batch is persisted around the two references the
    * operator makes (flag pass + anti-join — unpersisted, each would re-read
    * the source) and is unpersisted when `sink` returns. The probe's hashed
    * n-grams stay cached for the life of the query; they are released only
    * with the session (a benchmark probe is small by construction). */
  def decontaminateStream(
      stream: DataFrame, idCol: String, textCol: String,
      probe: DataFrame, probeIdCol: String, probeTextCol: String,
      n: Int = 13, minHits: Long = 1L)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val probeHashed =
      Decontaminate.probeHashes(probe, probeIdCol, probeTextCol, n).persist()
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val b = batch.persist()
      try sink(Decontaminate.decontaminateAgainst(b, idCol, textCol, probeHashed, n, minHits), batchId)
      finally b.unpersist()
    }
  }
}
