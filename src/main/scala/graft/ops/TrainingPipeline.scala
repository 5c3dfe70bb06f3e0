package graft.ops

import graft.dsl.SchemaSpec
import graft.run.Validator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage row accounting for one [[TrainingPipeline.run]] (docs removed BY
  * that stage; every stage sees the previous stage's survivors). */
case class PipelineReport(
    input: Long,
    invalid: Long,
    exactDups: Long,
    nearDups: Long,
    contaminated: Long,
    lowQuality: Long,
    output: Long) {
  def removed: Long = invalid + exactDups + nearDups + contaminated + lowQuality
}

case class PipelineResult(corpus: DataFrame, report: PipelineReport)

/** End-to-end training-data preprocessing — a thin composition of the
  * library's operators in their canonical order; it adds NO logic of its own,
  * so each stage keeps its documented scale contract:
  *
  *   normalize (NFC) + PII scrub  -> one codegen'd projection
  *   validate                     -> compiled rule pipeline; invalid rows drop
  *   exact dedup                  -> digest hash-aggregate
  *   near-dup dedup               -> MinHash LSH pairs -> connected
  *                                   components -> keep cluster minimum
  *   decontaminate                -> n-gram hash join vs the benchmark probe
  *   quality filter               -> integer quality + repetition signals
  *   split (+ optional packing)   -> md5 hash split; per-split cost-budget bins
  *
  * Each stage's removals are counted (one count per stage on a persisted
  * frame — this is a batch-pipeline facade, auditability over the last drop
  * of throughput; callers chasing a single-action plan compose the operators
  * directly). */
object TrainingPipeline {

  def run(
      docs: DataFrame, idCol: String, textCol: String,
      schema: Option[SchemaSpec] = None,
      probe: Option[(DataFrame, String, String)] = None,
      shingleN: Int = 3, minhashThreshold: Double = 0.9,
      decontamN: Int = 13, decontamMinHits: Long = 1L,
      minQualityScore: Long = 0L, maxTopWordPct: Int = 100,
      splits: Seq[(String, Double)] = Seq("train" -> 1.0), splitSalt: String = "",
      packBudget: Option[Long] = None): PipelineResult = {

    val cleaned = docs.withColumn(textCol,
      TextOps.scrubPii(TextOps.normalizeUnicode(col(textCol)))).persist()
    val nInput = cleaned.count()

    val valid = schema match {
      case Some(spec) => Validator.validate(spec, cleaned).validRows.persist()
      case None       => cleaned
    }
    val nValid = if (schema.isDefined) valid.count() else nInput

    val exact = Dedup.exactDedup(valid, idCol, textCol).persist()
    val nExact = exact.count()

    val pairs = Dedup.minhashNearDups(
      exact, idCol, textCol, shingleN = shingleN, threshold = minhashThreshold)
    val near = Components.dedupByPairs(exact, idCol, pairs).persist()
    val nNear = near.count()

    val decon = probe match {
      case Some((p, pid, ptext)) =>
        Decontaminate.decontaminate(near, idCol, textCol, p, pid, ptext,
          decontamN, decontamMinHits).persist()
      case None => near
    }
    val nDecon = if (probe.isDefined) decon.count() else nNear

    // integer-threshold quality gate: composite score floor + Gopher-style
    // top-word dominance cap (top_word_count * 100 <= pct * n_tokens)
    val q = TextOps.qualitySignals(col(textCol))
    val r = TextOps.repetitionSignals(col(textCol))
    val kept = decon.filter(
      q.getField("quality_score") >= minQualityScore &&
        r.getField("top_word_count") * 100 <= r.getField("n_tokens") * maxTopWordPct)
      .persist()
    val nKept = kept.count()

    val split = Sharding.hashSplit(kept, idCol, splits, splitSalt)
    val corpus = packBudget match {
      case Some(b) =>
        Sharding.packByCostBudget(
          split.withColumn("__cost", TextOps.tokenCountBpeIsh(col(textCol)).cast("long")),
          "split", idCol, "__cost", b).drop("__cost")
      case None => split
    }

    PipelineResult(corpus, PipelineReport(
      input = nInput,
      invalid = nInput - nValid,
      exactDups = nValid - nExact,
      nearDups = nExact - nNear,
      contaminated = nNear - nDecon,
      lowQuality = nDecon - nKept,
      output = nKept))
  }
}
