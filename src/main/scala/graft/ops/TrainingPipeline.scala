package graft.ops

import graft.dsl.SchemaSpec
import graft.run.Validator
import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Per-stage row accounting for one [[TrainingPipeline.run]] (docs removed BY
  * that stage; every stage sees the previous stage's survivors).
  * `nearDupDroppedBuckets`/`nearDupDroppedIds` surface the MinHash LSH bucket
  * cap's exclusions (the one recall cap in the pipeline) — the operators'
  * no-silent-caps contract survives composition. */
case class PipelineReport(
    input: Long,
    invalid: Long,
    exactDups: Long,
    nearDups: Long,
    contaminated: Long,
    lowQuality: Long,
    output: Long,
    nearDupDroppedBuckets: Long = 0L,
    nearDupDroppedIds: Long = 0L,
    mixedRows: Long = 0L) {
  def removed: Long = invalid + exactDups + nearDups + contaminated + lowQuality
}

/** `corpus` reads from the one cached frame [[run]] created; call
  * [[unpersist]] once the caller's action on `corpus` (write/collect) is done. */
case class PipelineResult(corpus: DataFrame, report: PipelineReport,
    private[ops] val cached: Seq[DataFrame] = Nil) {
  /** Releases the pipeline's cached frames (the deduped corpus + the small
    * flagged-id / probe-hash sets). After this, actions on `corpus` recompute
    * the full lineage. */
  def unpersist(): Unit = cached.foreach(_.unpersist())
}

/** End-to-end training-data preprocessing — a thin composition of the
  * library's operators in their canonical order; it adds NO logic of its own,
  * so each stage keeps its documented scale contract:
  *
  *   normalize (NFC) + PII scrub  -> one codegen'd projection
  *   (optional) line scrub        -> corpus-frequency boilerplate-line removal
  *   validate                     -> compiled rule pipeline; invalid rows drop
  *   exact dedup                  -> digest hash-aggregate
  *   near-dup dedup               -> MinHash LSH pairs (AUDITED bucket cap)
  *                                   -> connected components -> keep cluster
  *                                   minimum
  *   decontaminate                -> n-gram hash join vs the benchmark probe
  *   quality filter               -> integer quality + repetition signals
  *   (optional) corpus mixing     -> per-stratum fractional repetition
  *                                   weights (sampleByWeights), applied
  *                                   BEFORE the split so all copies of a
  *                                   document share one split (no leakage)
  *   split (+ optional packing)   -> md5 hash split; cost-budget bins packed
  *                                   per (split, shard) — `packShards` md5
  *                                   hash buckets, so no split funnels its
  *                                   whole corpus through one window partition
  *
  * Accounting rides the work instead of re-running it: ONE persist of the
  * corpus (post-exact-dedup — the frame every later stage re-reads), intake
  * counts as an `Observation` on that frame's materializing action, and every
  * other stage counted from its SMALL side output (loser-id / flagged-id
  * sets), never a second full-corpus pass. The only persisted non-corpus
  * frames are those id sets, the probe hashes, and — when the line scrub is
  * on — the pre-scrub projection, held only until the corpus cache
  * materializes (the scrub reads its input three times). */
object TrainingPipeline {

  def run(
      docs: DataFrame, idCol: String, textCol: String,
      schema: Option[SchemaSpec] = None,
      probe: Option[(DataFrame, String, String)] = None,
      maxLineFreq: Option[Long] = None,
      shingleN: Int = 3, minhashThreshold: Double = 0.9,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      decontamN: Int = 13, decontamMinHits: Long = 1L,
      minQualityScore: Long = 0L, maxTopWordPct: Int = 100,
      mixStrataCol: Option[String] = None,
      mixWeights: Map[String, Double] = Map.empty, mixDefaultWeight: Double = 1.0,
      splits: Seq[(String, Double)] = Seq("train" -> 1.0), splitSalt: String = "",
      packBudget: Option[Long] = None, packShards: Int = 64): PipelineResult = {

    val cleaned0 = docs.withColumn(textCol,
      TextOps.scrubPii(TextOps.normalizeUnicode(col(textCol))))
    // optional boilerplate-LINE pass (RefinedWeb-style): scrubs lines occurring
    // > maxLineFreq corpus-wide; edits text in place (no doc removed), so it
    // carries no PipelineReport row — downstream digests/signatures see the
    // scrubbed text. scrubCommonLines reads its input THREE times (line-freq
    // aggregate, posexplode side, final doc join), so the normalize+PII
    // projection is persisted for the duration of the cache-materializing
    // action below instead of being recomputed per pass.
    val cleaned = maxLineFreq match {
      case Some(f) => Dedup.scrubCommonLines(cleaned0.persist(), idCol, textCol, f)
      case None    => cleaned0
    }

    // validate; count input and survivors with ONE observation riding the
    // cache-materializing count below (no separate full pass per count)
    val intake = Observation(s"graft_pipeline_intake_${seq.incrementAndGet()}")
    val annotated = schema match {
      case Some(spec) => Validator.validate(spec, cleaned).annotated
      case None       => cleaned.withColumn("valid", lit(true))
    }
    val observed = annotated
      .observe(intake, count(lit(1)).as("n_input"),
        coalesce(sum(when(col("valid"), 1L).otherwise(0L)), lit(0L)).as("n_valid"))
      .filter(col("valid"))
    val valid = (schema match {
      case Some(_) => observed.drop("violations", "valid")
      case None    => observed.drop("valid")
    })

    // exact dedup, fused into THE one persisted corpus frame: everything
    // downstream (signature scan, Jaccard verify, decontamination join,
    // quality filter, the caller's action) re-reads this cache instead of
    // re-running scrub+validate+dedup per stage
    val exact = Dedup.exactDedup(valid, idCol, textCol).persist()
    val nExact = exact.count() // materializes the cache; fires `intake`
    val (nInput, nValid) = intakeCounts(intake, annotated)
    // everything downstream reads the `exact` cache; the pre-scrub projection
    // (persisted only for the line-scrub's multi-pass window) can go now —
    // intakeCounts' recompute fallback has already run if it was going to
    if (maxLineFreq.isDefined) cleaned0.unpersist()

    // near-dup: audited pairs (bucket-cap drops ride the same job), cluster
    // via connected components (runs its own bounded actions), count the
    // LOSER set — small by construction, checkpoint-backed via the CC fixpoint
    val audited = Dedup.minhashNearDupsAudited(
      exact, idCol, textCol, shingleN = shingleN, threshold = minhashThreshold,
      maxBucket = maxBucket)
    val nearLosers = Components.nearDupGroups(audited.pairs)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    val nNearRemoved = nearLosers.count()
    val near = exact.join(nearLosers, Seq(idCol), "left_anti")
    // CC's checksum actions already ran on `pairs`, so the audit observation
    // has fired; these resolve without a recompute pass
    val (nDropBuckets, nDropIds) = (audited.droppedBuckets, audited.droppedIds)

    // decontamination: persist the SMALL flagged-id set (computing it costs a
    // corpus n-gram scan — don't pay it twice: once for the count, once in
    // the caller's action) and the probe hashes it joins against
    val (decon, nContam, deconCached) = probe match {
      case Some((p, pid, ptext)) =>
        val probeHashed = Decontaminate.probeHashes(p, pid, ptext, decontamN).persist()
        val flagged = Decontaminate
          .ngramCollisionsAgainst(near, idCol, textCol, probeHashed, decontamN, decontamMinHits)
          .select(col("id").as(idCol)).distinct().persist()
        val n = flagged.count()
        (near.join(flagged, Seq(idCol), "left_anti"), n, Seq(flagged, probeHashed))
      case None => (near, 0L, Nil)
    }

    // integer-threshold quality gate: composite score floor + Gopher-style
    // top-word dominance cap (top_word_count * 100 <= pct * n_tokens)
    val q = TextOps.qualitySignals(col(textCol))
    val r = TextOps.repetitionSignals(col(textCol))
    val kept = decon.filter(
      q.getField("quality_score") >= minQualityScore &&
        r.getField("top_word_count") * 100 <= r.getField("n_tokens") * maxTopWordPct)
    val nKept = kept.count() // one cached-corpus pass + the small anti-joins

    // optional per-stratum corpus mixing (fractional repetition weights):
    // applied BEFORE the split so every copy of a document — keyed on the
    // same id — lands in the SAME split (a copy in train and its original in
    // test would be leakage by construction). The mixed-row count is the one
    // accounting value that cannot ride another action: counting it costs
    // one extra cached-corpus pass, paid only when mixing is requested.
    // The mixing salt is DERIVED from the split salt, never equal to it:
    // both decisions hash md5(id || salt), so sharing the salt would make
    // "survives a fractional weight w" identical to "unit hash < w" — and the
    // split bounds partition that same unit hash, so every fractionally-kept
    // row would land in the first split(s) and the later splits would see an
    // effective weight of floor(w). A distinct suffix decorrelates them.
    val (mixed, nMixedRows) = mixStrataCol match {
      case Some(sc) =>
        val m = Sharding.sampleByWeights(kept, idCol, sc, mixWeights, mixDefaultWeight,
          splitSalt + "#mix")
        (m, m.count())
      case None => (kept, nKept)
    }

    val split = Sharding.hashSplit(mixed, idCol, splits, splitSalt)
    val corpus = packBudget match {
      case Some(b) =>
        // fine-grained composite shard key: a bare `split` (1-3 values) would
        // sort each split's ENTIRE corpus in one window partition; (split,
        // md5-shard) keeps every partition 1/packShards of a split, and the
        // pair is the packed output's natural write partitioning.
        // With mixing on, id repeats across copies — the packing order key
        // must stay unique per shard, so (id, copy) composes into __ord;
        // without mixing the id keeps its own (typed) ordering as before.
        val (ordered, orderCol) = mixStrataCol match {
          case Some(_) => (split.withColumn("__ord",
            concat(col(idCol).cast("string"), lit("#"), col("copy"))), "__ord")
          case None => (split, idCol)
        }
        Sharding.packByCostBudget(
          ordered
            .withColumn("shard", Sharding.shardColumn(col(idCol), packShards, splitSalt))
            .withColumn("__cost", TextOps.tokenCountBpeIsh(col(textCol)).cast("long")),
          Seq("split", "shard"), orderCol, "__cost", b)
          .drop("__cost", "__ord")
      case None => split
    }

    PipelineResult(corpus, PipelineReport(
      input = nInput,
      invalid = nInput - nValid,
      exactDups = nValid - nExact,
      nearDups = nNearRemoved,
      contaminated = nContam,
      lowQuality = nExact - nNearRemoved - nContam - nKept,
      output = nKept,
      nearDupDroppedBuckets = nDropBuckets,
      nearDupDroppedIds = nDropIds,
      mixedRows = nMixedRows),
      cached = exact +: deconCached)
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong()

  /** Intake counts from the observation, with the repo's standard grace-wait +
    * explicit-recompute fallback (AQE empty-relation pruning or a lagging
    * listener bus — see Dedup.AuditedPairs). */
  private def intakeCounts(obs: Observation, annotated: DataFrame): (Long, Long) = {
    val waitSec = java.lang.Long.getLong("spark.graft.auditWaitSec", 2L)
    val completed =
      try {
        scala.concurrent.Await.ready(obs.future,
          scala.concurrent.duration.Duration(waitSec, "s")); true
      } catch { case _: java.util.concurrent.TimeoutException => false }
    val m = if (completed) obs.get else Map.empty[String, Any]
    if (m.contains("n_input"))
      (m("n_input").asInstanceOf[Long], m("n_valid").asInstanceOf[Long])
    else {
      System.err.println(
        s"[graft] pipeline intake observation not delivered within ${waitSec}s — " +
          "recomputing input/valid counts with an explicit aggregate pass")
      val row = annotated.agg(count(lit(1)).as("n_input"),
        coalesce(sum(when(col("valid"), 1L).otherwise(0L)), lit(0L)).as("n_valid"))
        .collect().head
      (row.getLong(0), row.getLong(1))
    }
  }
}
