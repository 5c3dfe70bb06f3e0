package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One record of the duplicate-audit stream: the first occurrence of a digest
  * emits keep=true; later occurrences emit keep=false with the running count. */
case class DedupEvent(id: Long, digest: String, keep: Boolean, dup_count: Long)

/** One near-duplicate pair found by the streaming SimHash path (id_a < id_b). */
case class NearDupPair(id_a: Long, id_b: Long, hamming: Int)

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

  /** Streaming SimHash NEAR-dup detection: the same banding as the batch path
    * (graft.ops.Dedup.simhashBands — one native codegen signature Expression
    * per doc, maxHamming+1 disjoint chunks => within-state recall 1.0 by
    * pigeonhole), lifted to custom keyed state: each (band, hash) bucket keeps
    * the (id, signature) pairs seen so far, and every arriving doc is
    * hamming-verified against its bucket's state — so a near-dup is detected
    * the moment its partner arrives, across micro-batches.
    *
    * Scale contract mirrors the batch path: state carries 16-byte signatures
    * (never text), buckets are capped at `maxBucket` (a saturated bucket stops
    * accumulating and emitting — degenerate corpora can't OOM the state
    * store; audit via the batch oversizeBuckets on a sample). A pair that
    * matches in several bands is emitted once per matching band — dedupe
    * downstream (`dropDuplicates` over (id_a, id_b)) or in the sink; chaining
    * a second stateful dedup here would pin this operator to specific
    * multi-stateful support, so the choice is left to the caller.
    *
    * State grows with distinct (bucket, doc) pairs; bound it for endless
    * streams by keying retention upstream (e.g. filter to a rolling corpus)
    * or periodically restarting the query from a compacted corpus — signature
    * state has no event-time, so watermark eviction does not apply. */
  def simhashNearDupStream(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket): Dataset[NearDupPair] = {
    val spark = df.sparkSession
    import spark.implicits._
    // fail at ANALYSIS, not on the first micro-batch: ANSI mode makes a
    // string->long cast of a UUID-shaped id crash the running query
    val idType = df.schema(idCol).dataType
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
          org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"simhashNearDupStream needs an integral id column; '$idCol' is " +
        s"${idType.catalogString} — hash non-numeric ids first (e.g. xxhash64($idCol))")
    def dist(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    graft.ops.Dedup
      .simhashBands(df.select(col(idCol).cast("long").as(idCol), col(textCol)),
        idCol, textCol, maxHamming)
      .select(col("id"), col("sig"), col("band_idx"), col("band_hash"))
      .as[(Long, Seq[Long], Int, Long)]
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], NearDupPair](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Long, Seq[Long], Int, Long)],
            state: GroupState[Seq[(Long, Seq[Long])]]) =>
          val prior = state.getOption.getOrElse(Seq.empty)
          if (prior.size >= maxBucket) Iterator.empty // saturated: excluded, like the batch cap
          else {
            // deterministic within-batch order; drop repeated ids (re-ingest)
            val fresh = rows.map(r => (r._1, r._2)).toSeq
              .distinctBy(_._1).sortBy(_._1)
              .filterNot(f => prior.exists(_._1 == f._1))
            val out = Seq.newBuilder[NearDupPair]
            var seen = prior
            // a doc that would overflow the bucket neither verifies nor
            // stores — the cap cuts emission and accumulation at the SAME
            // doc, so a pair is never detected-or-missed depending on which
            // micro-batch boundary the saturation landed on
            for ((id, sig) <- fresh if seen.size < maxBucket) {
              for ((pid, psig) <- seen) {
                val h = dist(sig, psig)
                if (h <= maxHamming)
                  out += NearDupPair(math.min(pid, id), math.max(pid, id), h)
              }
              seen = seen :+ ((id, sig))
            }
            state.update(seen)
            out.result().iterator
          }
      }
  }

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

  /** Streaming NEAR-dup corpus dedup against a persisted MinHash signature
    * index (graft.ops.Dedup.minhashIndexBuild): each micro-batch plays a
    * snapshot delta — it is deduped against the index (earlier corpus always
    * wins; within-batch clusters keep the min id), survivors go to `sink`,
    * and the survivors' SIGNATURES are appended to the index so later
    * batches dedup against earlier ones.
    *
    * The cross-batch state is the INDEX ON DISK, not stream state: executor
    * state never grows with the corpus (a 10^9-doc history is ~0.5 TB of
    * parquet, not state-store memory), and a restarted query resumes against
    * exactly the committed index. The append runs AFTER `sink` returns, so a
    * failed batch re-processes with the index unchanged (at-least-once:
    * re-delivery re-dedups to the same survivors). Build the index before
    * starting — on the existing corpus, or on an EMPTY frame of the right
    * schema for a from-scratch stream.
    *
    * `sink` must materialize its DataFrame before returning (write/collect);
    * the survivor frame is persisted across `sink` and the signature append
    * and unpersisted when both finish.
    *
    * Storage hygiene: deltaDedupIndexed creates eager localCheckpoint blocks
    * (delta signatures + candidate pairs) that the ContextCleaner would only
    * release when the driver GCs the frame references — a long-running stream
    * would accumulate executor storage blocks between GC cycles. Each batch
    * therefore snapshots the persistent-RDD id set before the dedup and
    * explicitly unpersists every id that appeared, once the batch is done
    * (foreachBatch runs batches sequentially, so the diff only ever contains
    * this batch's blocks — do not run concurrent checkpoint-creating jobs on
    * the same session while the stream is active). */
  def deltaDedupStream(
      stream: DataFrame, idCol: String, textCol: String, indexDir: String,
      threshold: Double = 0.8,
      maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket,
      broadcastNewKeys: Boolean = true)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val sc = batch.sparkSession.sparkContext
      val rddsBefore = sc.getPersistentRDDs.keySet
      val b = batch.persist()
      try {
        val kept = graft.ops.Dedup
          .deltaDedupIndexed(b, idCol, textCol, indexDir, threshold, maxBucket, broadcastNewKeys)
          .persist() // read by sink AND the signature append
        try {
          sink(kept, batchId)
          graft.ops.Dedup.minhashIndexAppend(kept, idCol, textCol, indexDir)
        } finally kept.unpersist()
      } finally {
        b.unpersist()
        graft.ops.Dedup.releaseCheckpointsSince(sc, rddsBefore)
      }
    }

  /** [[deltaDedupStream]]'s SEMANTIC twin over a persisted IVF index
    * ([[graft.ops.Similarity.ivfBuildIndex]] layout, or IVF-PQ via
    * `usePqCodes`): each micro-batch of vectors dedups against the indexed
    * corpus (earlier vectors always win; within-batch clusters keep the min
    * id), survivors go to `sink` and append to the index assigned/encoded
    * with the index's OWN stored quantizers — a stream can never fork them.
    * Cross-batch state is the index on disk (restart-safe, partition-pruned
    * reads — a micro-batch touching 5 of 100k cells scans 5/100k of the
    * corpus); same at-least-once contract and checkpoint-release hygiene as
    * the lexical stream. Build the index before starting ([[graft.ops
    * .Similarity.ivfBuildIndex]] / [[graft.ops.Similarity.ivfPqBuildIndex]]
    * on the existing corpus — unlike the lexical index, the IVF quantizer
    * must train on real vectors, so a from-scratch stream seeds the index
    * from its first snapshot instead of an empty frame). */
  def semanticDeltaDedupStream(
      stream: DataFrame, idCol: String, embCol: String, indexDir: String,
      threshold: Double,
      maxCell: Int = graft.ops.Dedup.DefaultMaxBucket,
      usePqCodes: Boolean = false, pqAdcMargin: Double = 0.2,
      pqMaxRefineIds: Int = 1 << 14)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val sc = batch.sparkSession.sparkContext
      val rddsBefore = sc.getPersistentRDDs.keySet
      val b = batch.persist()
      try {
        val kept =
          (if (usePqCodes)
             graft.ops.Similarity.semanticDeltaDedupPqIndexed(
               b, idCol, embCol, indexDir, threshold, maxCell,
               pqAdcMargin, pqMaxRefineIds)
           else
             graft.ops.Similarity.semanticDeltaDedupIndexed(
               b, idCol, embCol, indexDir, threshold, maxCell))
            .persist() // read by sink AND the index append
        try {
          sink(kept, batchId)
          if (usePqCodes)
            graft.ops.Similarity.ivfPqIndexAppend(kept, idCol, embCol, indexDir)
          else
            graft.ops.Similarity.ivfIndexAppend(kept, idCol, embCol, indexDir)
        } finally kept.unpersist()
      } finally {
        b.unpersist()
        graft.ops.Dedup.releaseCheckpointsSince(sc, rddsBefore)
      }
    }
}
