package graft

import graft.ops.TrainingPipeline
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The spark-submit entry point for the INCREMENTAL training-data pipeline —
  * the operational twin of [[RunValidation]] for the corpus side: each
  * invocation plays ONE snapshot delta through
  * [[graft.ops.TrainingPipeline.runDelta]] against the work dir's persisted
  * dedup indexes, writes the delta's surviving (split, packed) corpus under a
  * content-addressed output dir, and prints one JSON summary line.
  *
  * Re-invoking after a kill RESUMES (StageStore loads the committed prefix);
  * re-invoking an identical delta is a committed no-op (all stages load, the
  * output dir rewrites byte-stable content); a `--deletions` pass compacts
  * both indexes under a bumped corpus epoch before the delta runs.
  *
  * {{{
  * spark-submit --class graft.RunPipeline graft.jar \
  *   --input /data/snapshot_0421      \  // parquet delta: (doc_id, text[, emb])
  *   --work  /data/graft_corpus       \  // indexes + stage checkpoints + outputs
  *   [--id doc_id] [--text text]      \
  *   [--emb emb]                      \  // enables semantic delta dedup
  *   [--use-pq] [--pq-m 8] [--pq-ksub 16] [--pq-margin 0.2] \  // IVF-PQ semantic index
  *   [--probe /data/benchmarks]       \  // decontamination probe (pid, ptext)
  *   [--probe-id pid] [--probe-text ptext] \
  *   [--deletions /data/withdrawn]    \  // ids to withdraw BEFORE this delta
  *   [--require lang,text]            \  // required non-null string columns -> `invalid`
  *   [--minhash-threshold 0.9] [--semantic-threshold 0.99] [--cells 1024] \
  *   [--min-quality 0] [--max-top-word-pct 100] \
  *   [--splits train=0.98,val=0.02] [--pack-budget 8192] [--out <dir>]
  * }}}
  *
  * Scale shape: every stage is the library operator with its documented
  * contract — the delta never re-reads old corpus text (MinHash band-
  * partitioned index) or raw old vectors (IVF cell pruning; 8-byte PQ codes
  * under `--use-pq`), appends land strictly after their stage commits, and
  * the output write is the only full pass over the survivors.
  */
object RunPipeline {

  final case class Args(
      input: String = "", work: String = "",
      id: String = "doc_id", text: String = "text",
      emb: Option[String] = None,
      probe: Option[String] = None, probeId: String = "pid", probeText: String = "ptext",
      deletions: Option[String] = None,
      require_ : Seq[String] = Nil,
      usePq: Boolean = false,
      pqM: Int = 8, pqKSub: Int = 16, pqMargin: Double = 0.2,
      minhashThreshold: Double = 0.9,
      semanticThreshold: Double = 0.99, cells: Int = 1024,
      minQuality: Long = 0L, maxTopWordPct: Int = 100,
      splits: Seq[(String, Double)] = Seq("train" -> 1.0),
      packBudget: Option[Long] = None,
      out: Option[String] = None)

  def parse(argv: Array[String]): Args = {
    def loop(a: Args, rest: List[String]): Args = rest match {
      case "--input" :: v :: t => loop(a.copy(input = v), t)
      case "--work" :: v :: t => loop(a.copy(work = v), t)
      case "--id" :: v :: t => loop(a.copy(id = v), t)
      case "--text" :: v :: t => loop(a.copy(text = v), t)
      case "--emb" :: v :: t => loop(a.copy(emb = Some(v)), t)
      case "--probe" :: v :: t => loop(a.copy(probe = Some(v)), t)
      case "--probe-id" :: v :: t => loop(a.copy(probeId = v), t)
      case "--probe-text" :: v :: t => loop(a.copy(probeText = v), t)
      case "--deletions" :: v :: t => loop(a.copy(deletions = Some(v)), t)
      case "--require" :: v :: t => loop(a.copy(require_ = v.split(",").toSeq), t)
      case "--use-pq" :: t => loop(a.copy(usePq = true), t)
      case "--pq-m" :: v :: t => loop(a.copy(pqM = v.toInt), t)
      case "--pq-ksub" :: v :: t => loop(a.copy(pqKSub = v.toInt), t)
      case "--pq-margin" :: v :: t => loop(a.copy(pqMargin = v.toDouble), t)
      case "--minhash-threshold" :: v :: t => loop(a.copy(minhashThreshold = v.toDouble), t)
      case "--semantic-threshold" :: v :: t => loop(a.copy(semanticThreshold = v.toDouble), t)
      case "--cells" :: v :: t => loop(a.copy(cells = v.toInt), t)
      case "--min-quality" :: v :: t => loop(a.copy(minQuality = v.toLong), t)
      case "--max-top-word-pct" :: v :: t => loop(a.copy(maxTopWordPct = v.toInt), t)
      case "--pack-budget" :: v :: t => loop(a.copy(packBudget = Some(v.toLong)), t)
      case "--out" :: v :: t => loop(a.copy(out = Some(v)), t)
      case "--splits" :: v :: t =>
        val parsed = v.split(",").toSeq.map { s =>
          s.split("=") match {
            case Array(n, w) if n.nonEmpty =>
              val weight = try w.toDouble catch {
                case _: NumberFormatException => throw new IllegalArgumentException(
                  s"--splits weight for '$n' is not a number: $w")
              }
              require(weight > 0 && !weight.isInfinite,
                s"--splits weight for '$n' must be positive and finite, got $w")
              (n, weight)
            case _ => throw new IllegalArgumentException(
              s"--splits expects name=weight[,name=weight], got: $v")
          }
        }
        loop(a.copy(splits = parsed), t)
      case Nil => a
      case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val a = loop(Args(), argv.toList)
    require(a.input.nonEmpty, "--input is required")
    require(a.work.nonEmpty, "--work is required")
    require(a.usePq == false || a.emb.isDefined, "--use-pq requires --emb")
    a
  }

  /** Library-callable core (main() wraps it with a session). Returns the
    * summary JSON it also prints. */
  def run(spark: SparkSession, a: Args): String = {
    val delta = spark.read.parquet(a.input)
    val probe = a.probe.map(p =>
      (spark.read.parquet(p), a.probeId, a.probeText))
    val deletions = a.deletions.map(d =>
      spark.read.parquet(d).select(col(a.id)))

    // --require col[,col] builds a minimal validation spec: the named string
    // columns must be present and non-null; violating docs count as `invalid`
    // (richer SchemaSpec rules are a library-level concern — code, not flags).
    // Fail fast on a missing or non-string column — resolving a typo to NULL
    // would silently invalidate the ENTIRE delta and commit an empty corpus
    a.require_.foreach { c =>
      val f = delta.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"--require column '$c' is not in the input schema " +
            s"(${delta.schema.fieldNames.mkString(", ")})"))
      require(f.dataType == org.apache.spark.sql.types.StringType,
        s"--require column '$c' is ${f.dataType.simpleString}, not string — " +
          "the minimal CLI spec validates string columns only")
    }
    val schema = if (a.require_.isEmpty) None else Some(graft.dsl.SchemaSpec(
      "delta", a.require_.map(c => graft.dsl.Field.string(c).req),
      keyColumns = Seq(a.id)))

    val result = TrainingPipeline.runDelta(
      delta, a.id, a.text, a.work,
      schema = schema,
      // the require list keys the stages (a changed list must not load stale
      // verdicts) and its columns' VALUES join the fingerprint (a data
      // correction in them is a new snapshot)
      paramsKey = if (a.require_.isEmpty) "" else s"require=${a.require_.mkString(",")}",
      extraFingerprintCols = a.require_,
      probe = probe, embCol = a.emb, deletions = deletions,
      minhashThreshold = a.minhashThreshold,
      minQualityScore = a.minQuality, maxTopWordPct = a.maxTopWordPct,
      semanticThreshold = a.semanticThreshold, numCells = a.cells,
      usePqCodes = a.usePq, pqM = a.pqM, pqKSub = a.pqKSub,
      pqAdcMargin = a.pqMargin,
      splits = a.splits, packBudget = a.packBudget)

    // content-addressed output dir: an identical resubmission rewrites the
    // same location with the same content instead of piling up copies. The
    // address is runDelta's OWN stage-namespace tag (computed once, up front,
    // embedding-aware, multiset-robust) — never a second scan of the input
    val outDir = a.out.getOrElse(s"${a.work}/out/delta_${result.tag}")
    // static overwrite: a stale split partition absent from this rewrite
    // must not survive (CLAUDE.md whole-layout-overwrite rule)
    result.corpus.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy("split").parquet(outDir)

    val r = result.report
    val loaded = result.stages.count(_.loaded)
    val computed = result.stages.size - loaded
    val json =
      s"""{"input":${r.input},"invalid":${r.invalid},"exact_dups":${r.exactDups},""" +
        s""""near_dups":${r.nearDups},"contaminated":${r.contaminated},""" +
        s""""low_quality":${r.lowQuality},"semantic_dups":${r.semanticDups},""" +
        s""""output":${r.output},"dropped_buckets":${r.nearDupDroppedBuckets},""" +
        s""""dropped_ids":${r.nearDupDroppedIds},""" +
        s""""stages_loaded":$loaded,"stages_computed":$computed,""" +
        s""""out":"${outDir.replace("\\", "\\\\").replace("\"", "\\\"")}"}"""
    println(json)
    json
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .getOrCreate()
    try run(spark, a) finally spark.stop()
  }
}
