package graft.checkpoint

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Content-addressed commit log for multi-stage pipeline state (the
  * stage-level analogue of [[CheckpointedRunner]]'s per-bucket manifest).
  *
  * Each stage owns two locations under one `workDir`:
  *   - `workDir/<stage>/`       — the stage's persisted DATA (a parquet
  *     corpus checkpoint or a small loser-id set); absent for counts-only
  *     stages.
  *   - `workDir/_meta/<stage>/` — a 1-row parquet: the stage's content KEY
  *     (chained fingerprint of input + every upstream parameter) and its
  *     report counts. Written strictly AFTER the data, so the meta row is the
  *     commit point: a kill mid-stage leaves no meta and the stage recomputes
  *     from scratch (overwriting any partial data) on the next invocation.
  *
  * Completion is content-addressed, never positional: [[load]] returns the
  * committed counts only when the stored key equals the caller's key, so a
  * changed input fingerprint or parameter invalidates the stage — and,
  * because keys CHAIN (each stage's key embeds its predecessor's), everything
  * downstream of a change invalidates with it. Matching state is never
  * recomputed and never rewritten: resume leaves completed stages'
  * files untouched on disk (byte-identical), the property the resume tests
  * pin.
  */
object StageStore {

  private val metaSchema: StructType = StructType(Seq(
    StructField("stage", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("counts", MapType(StringType, LongType), nullable = false)))

  /** Where a stage persists its data (callers write/read this themselves). */
  def dataDir(workDir: String, stage: String): String = s"$workDir/$stage"

  private def metaDir(workDir: String, stage: String): String =
    s"$workDir/_meta/$stage"

  /** Committed counts for `stage`, iff a meta row exists AND its key matches
    * (same input content, same upstream parameters). Any read problem —
    * missing dir, partial write without _SUCCESS, schema drift — means "not
    * committed": the safe direction is always recompute, never a stale load. */
  def load(spark: SparkSession, workDir: String, stage: String, key: String): Option[Map[String, Long]] = {
    val dir = new org.apache.hadoop.fs.Path(metaDir(workDir, stage))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) None
    else
      try {
        spark.read.schema(metaSchema).parquet(dir.toString).collect().headOption
          .filter(r => r.getString(0) == stage && r.getString(1) == key)
          .map(_.getMap[String, Long](2).toMap)
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Commit `stage` under `key`. Call strictly after the stage's data write
    * (if any) — this row is what makes the data trustworthy on resume. */
  def commit(spark: SparkSession, workDir: String, stage: String, key: String,
      counts: Map[String, Long]): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(Seq(Row(stage, key, counts)).asJava, metaSchema)
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(metaDir(workDir, stage))
  }
}
