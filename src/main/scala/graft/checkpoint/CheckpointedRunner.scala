package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N9: resumable per-partition execution with a self-owned manifest playing the
  * role of an Iceberg manifest of completed partition IDs (no Iceberg runtime
  * jar ships in this sandbox — SURVEY §7.3; the seam is this object's API, so a
  * real catalog can replace the parquet manifest without touching callers).
  *
  * Design for 100 TB: work is keyed by a deterministic bucket id
  * `pmod(xxhash64(keys), numBuckets)`. `stage()` lays the input out partitioned
  * by that bucket once, so each resume processes ONLY pending buckets with true
  * partition pruning (never a re-scan of completed data). Output per bucket is
  * idempotent (dynamic partition overwrite + deterministic sort), so a kill at
  * any point resumes to identical final output.
  */
object CheckpointedRunner {

  /** Manifest row per completed bucket. `wall_ms` is the wall time of the
    * (multi-bucket) JOB that completed the bucket — shared by every row of one
    * run invocation, NOT per-bucket work (buckets complete together in one
    * write job; summing wall_ms across rows double-counts). */
  val manifestSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("run_id", StringType),
    StructField("input_path", StringType),
    StructField("rows", LongType),
    StructField("violations", LongType),
    StructField("wall_ms", LongType),
    StructField("status", StringType)))

  /** One-time layout pass: bucket the input by key hash and write it
    * partitioned by bucket (lineage root for all later runs). */
  def stage(df: DataFrame, keyCols: Seq[String], numBuckets: Int, stagingDir: String): Unit = {
    df.withColumn("bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast(IntegerType))
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(stagingDir)
  }

  def completedBuckets(spark: SparkSession, manifestDir: String): Set[Int] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.schema(manifestSchema).parquet(manifestDir)
      .filter(col("status") === "done")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
  }

  /** Process ALL pending buckets in ONE write job (the round-1 version looped
    * buckets on the driver with a coalesce(1) write and two rescans per bucket
    * — 1024 sequential single-task jobs at 100 TB / 1024 buckets).
    *
    * Shape: one partition-pruned scan of the pending buckets -> process ->
    * re-derive each output row's bucket from its key columns -> one
    * dynamic-overwrite write hash-clustered by bucket (each bucket lands
    * contiguous + sorted in exactly one task => byte-stable resume), then TWO
    * cheap aggregate jobs (input rows per bucket, sink rows per bucket) feed
    * the manifest — never a per-bucket rescan.
    *
    * Kill semantics: the manifest commits strictly after the write job, so a
    * kill anywhere re-processes only uncommitted buckets on resume and the
    * dynamic overwrite makes the redo idempotent.
    *
    * @param process  bucket-scoped DataFrame => violations DataFrame; its
    *                 output must retain `keyCols` (bucket is re-derived)
    * @param sortCols deterministic output order within a bucket
    * @param keyCols  the bucketing keys used in [[stage]]
    * @return buckets processed in this invocation
    */
  def run(
      spark: SparkSession,
      stagingDir: String,
      manifestDir: String,
      outDir: String,
      numBuckets: Int,
      process: DataFrame => DataFrame,
      sortCols: Seq[String],
      runId: String,
      keyCols: Seq[String],
      maxBuckets: Int = Int.MaxValue): Seq[Int] = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val done = completedBuckets(spark, manifestDir)
    val pending = (0 until numBuckets).filterNot(done).take(maxBuckets)
    if (pending.isEmpty) return Seq.empty
    val t0 = System.nanoTime()
    val staged = spark.read.parquet(stagingDir)
    // partition-pruned scan: only pending bucket directories are read
    val in = staged.filter(col("bucket").isin(pending: _*))
    val bucketOf =
      pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast(IntegerType)
    // Guard the re-derived bucket INSIDE the write job (zero extra passes):
    // if process() altered or re-mapped key values, a row would hash to a
    // non-pending bucket and the dynamic partition overwrite would silently
    // replace a COMPLETED bucket's committed output with partial data. A
    // per-row raise_error fails the write job before its commit (and before
    // the manifest append), so completed buckets stay intact.
    val guardedBucket = when(bucketOf.isin(pending: _*), bucketOf)
      .otherwise(raise_error(concat(
        lit("CheckpointedRunner: process() emitted a row whose keys map to non-pending bucket "),
        bucketOf.cast(StringType),
        lit(s" (pending: ${pending.mkString(",")}) — its output must retain the staged key columns"))))
    val out = process(in.drop("bucket")).withColumn("bucket", guardedBucket)
    out
      .repartition(math.max(pending.size, 1), col("bucket"))
      .sortWithinPartitions((col("bucket") +: sortCols.map(col)): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(outDir)
    // manifest metrics from two column-pruned aggregates over the SAME data
    // the job touched (input buckets + the small sink), not per-bucket rescans
    val rowsByBucket = in.groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val violsByBucket = spark.read.parquet(outDir)
      .filter(col("bucket").isin(pending: _*))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wallMs = (System.nanoTime() - t0) / 1000000
    import scala.jdk.CollectionConverters._
    val manifestRows = pending.map { b =>
      org.apache.spark.sql.Row(b, runId, stagingDir,
        rowsByBucket.getOrElse(b, 0L), violsByBucket.getOrElse(b, 0L), wallMs, "done")
    }
    spark.createDataFrame(manifestRows.asJava, manifestSchema)
      .write.mode(SaveMode.Append).parquet(manifestDir)
    pending
  }
}
