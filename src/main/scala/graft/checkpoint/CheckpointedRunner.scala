package graft.checkpoint

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
    * write job; summing wall_ms across rows double-counts). `fingerprint` is
    * the order-independent content fingerprint of the bucket's INPUT at the
    * time it was validated (null for runs launched without one) — the
    * content-addressed completion key [[incrementalRun]] matches against. */
  val manifestSchema: StructType = StructType(Seq(
    StructField("bucket", IntegerType, nullable = false),
    StructField("run_id", StringType),
    StructField("input_path", StringType),
    StructField("rows", LongType),
    StructField("violations", LongType),
    StructField("wall_ms", LongType),
    StructField("status", StringType),
    StructField("fingerprint", LongType)))

  /** One-time layout pass: bucket the input by key hash and write it
    * partitioned by bucket (lineage root for all later runs). */
  def stage(df: DataFrame, keyCols: Seq[String], numBuckets: Int, stagingDir: String): Unit =
    stage(df, keyCols, numBuckets, stagingDir, rowHash = None)

  /** [[stage]] that also records a per-bucket fingerprint SIDECAR
    * (`_fingerprints/` — underscore-prefixed, so data reads skip it): the
    * ingest pays one narrow post-write scan, and every later
    * [[incrementalRun]] selects changed buckets from the 1-row-per-bucket
    * sidecar instead of re-scanning the table — the role Iceberg manifest
    * stats play. A static-overwrite re-stage wipes the sidecar with the rest
    * of the layout, so it can never go stale. */
  def stage(
      df: DataFrame, keyCols: Seq[String], numBuckets: Int, stagingDir: String,
      rowHash: Option[Column]): Unit = {
    df.withColumn("bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast(IntegerType))
      .write.mode(SaveMode.Overwrite)
      // STATIC overwrite per-write: a full snapshot replaces the whole staged
      // layout, including buckets that have no rows in the new snapshot
      // (run() sets the session to dynamic mode, which would otherwise leave
      // disappeared buckets' old partitions in place on re-stage)
      .option("partitionOverwriteMode", "static")
      .partitionBy("bucket").parquet(stagingDir)
    rowHash.foreach { h =>
      val spark = df.sparkSession
      bucketFingerprints(spark.read.parquet(stagingDir), h)
        .coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$stagingDir/$FingerprintSidecar")
    }
  }

  /** Hidden sidecar directory name (underscore => invisible to data reads). */
  val FingerprintSidecar: String = "_fingerprints"

  /** Per-run lineage + metrics view over the append-only manifest: one row
    * per run_id with buckets completed, input rows, violations, and the run's
    * wall time (wall_ms is per-JOB, shared by a run's rows — max, not sum).
    * The operational answer to "what did each invocation do": a driver-side
    * aggregate over the tiny manifest, ordered newest-wall-cost last only by
    * run_id string — timestamps are deliberately not part of the manifest
    * (byte-stable resume). */
  def runHistory(spark: SparkSession, manifestDir: String): DataFrame =
    spark.read.schema(manifestSchema).parquet(manifestDir)
      .groupBy("run_id")
      .agg(
        count(lit(1)).as("buckets"),
        sum(col("rows")).as("input_rows"),
        sum(col("violations")).as("violations"),
        max(col("wall_ms")).as("wall_ms"),
        min(col("input_path")).as("input_path"))
      .orderBy("run_id")

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
    * Completion model: ANY `done` manifest row marks a bucket complete,
    * forever — correct for the one-snapshot resume workflow this implements.
    * For inputs that evolve across snapshots use [[incrementalRun]]
    * exclusively on a given manifest: mixing the two would let a bucket
    * committed (even as empty) by an incremental run be skipped here although
    * its content has since changed.
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
    val done = completedBuckets(spark, manifestDir)
    val pending = (0 until numBuckets).filterNot(done).take(maxBuckets)
    runCore(spark, stagingDir, manifestDir, outDir, numBuckets, process,
      sortCols, runId, keyCols, pending, statsByBucket = None)
  }

  private def runCore(
      spark: SparkSession,
      stagingDir: String,
      manifestDir: String,
      outDir: String,
      numBuckets: Int,
      process: DataFrame => DataFrame,
      sortCols: Seq[String],
      runId: String,
      keyCols: Seq[String],
      pending: Seq[Int],
      statsByBucket: Option[Map[Int, (Long, Long)]]): Seq[Int] = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
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
    // Delete pending buckets' EXISTING output partitions before the write:
    // dynamic overwrite only replaces partitions that receive rows, so a
    // re-validated bucket whose new output is EMPTY (all violations fixed)
    // would otherwise keep its stale rows forever — and the sink aggregate
    // below would even count them into the manifest. Pre-delete is
    // kill-idempotent: a pending bucket is by definition uncommitted or
    // stale, and a kill after the delete leaves it pending for the resume.
    locally {
      val outRoot0 = new org.apache.hadoop.fs.Path(outDir)
      val fs0 = outRoot0.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs0.exists(outRoot0)) {
        val pendingSet = pending.toSet
        fs0.listStatus(outRoot0).iterator
          .map(_.getPath).filter(_.getName.startsWith("bucket="))
          .filter(p => pendingSet.contains(p.getName.stripPrefix("bucket=").toInt))
          .foreach(fs0.delete(_, true))
      }
    }
    out
      .repartition(math.max(pending.size, 1), col("bucket"))
      .sortWithinPartitions((col("bucket") +: sortCols.map(col)): _*)
      .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(outDir)
    // manifest metrics from column-pruned aggregates over the SAME data the
    // job touched (input buckets + the small sink), not per-bucket rescans;
    // incremental callers already hold per-bucket (rows, fingerprint) from
    // their pending-selection scan, so the input aggregate is skipped there
    val rowsByBucket = statsByBucket match {
      case Some(stats) => stats.view.mapValues(_._1).toMap
      case None => in.groupBy("bucket").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val fpByBucket: Map[Int, java.lang.Long] =
      statsByBucket.fold(Map.empty[Int, java.lang.Long])(
        _.view.mapValues(v => java.lang.Long.valueOf(v._2)).toMap)
    val violsByBucket =
      try spark.read.parquet(outDir)
        .filter(col("bucket").isin(pending: _*))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      catch {
        // a sink with no rows at all has no parquet footers to infer a
        // schema from (every pending bucket validated clean and any stale
        // partitions were pre-deleted) — that IS the zero-violations case
        case _: org.apache.spark.sql.AnalysisException => Map.empty[Int, Long]
      }
    val wallMs = (System.nanoTime() - t0) / 1000000
    appendManifest(spark, manifestDir, pending.map { b =>
      org.apache.spark.sql.Row(b, runId, stagingDir,
        rowsByBucket.getOrElse(b, 0L), violsByBucket.getOrElse(b, 0L), wallMs,
        "done", fpByBucket.getOrElse(b, null))
    })
    pending
  }

  private def appendManifest(
      spark: SparkSession, manifestDir: String,
      rows: Seq[org.apache.spark.sql.Row]): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, manifestSchema)
      .write.mode(SaveMode.Append).parquet(manifestDir)
  }

  // --------------------------------------------------------------------------
  // Incremental (snapshot-diff) revalidation
  // --------------------------------------------------------------------------

  /** The bucket id of a row, exactly as [[stage]] assigns it. */
  def bucketExpr(keyCols: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(numBuckets)).cast(IntegerType)

  /** Default 64-bit row hash for content fingerprints: xxhash64 over every
    * non-bucket column, in sorted-name order (schema column order must not
    * change the fingerprint). */
  def defaultRowHash(df: DataFrame): Column =
    xxhash64(df.columns.sorted.filterNot(_ == "bucket").map(col): _*)

  /** Per-bucket content fingerprint: (bucket, n_rows, fingerprint) with
    * fingerprint = bit_xor of `rowHash` — order-independent, because
    * validation semantics don't depend on row order within a bucket, and an
    * order-sensitive digest would flag every compaction/rewrite as a change.
    * bit_xor alone cancels PAIRS of identical rows, so the row count always
    * rides next to it; fooling the pair requires a 64-bit hash collision.
    * One column-pruned aggregate scan (only the hashed columns are read);
    * a catalog that maintains per-partition content digests in metadata
    * (Iceberg) can supply this frame without any scan — this is the seam. */
  def bucketFingerprints(staged: DataFrame, rowHash: Column): DataFrame =
    staged.groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), bit_xor(rowHash).as("fingerprint"))

  /** Changed-bucket report between two snapshots of the same logical table:
    * one row per bucket whose content differs — `status` is 'added' (bucket
    * has rows only now), 'removed' (only before), or 'changed'. Unchanged
    * buckets produce no row, so at 10^12 files the output is proportional to
    * the CHANGE, not the table. `bucketOf`/`rowHash` default to the staged
    * layout's xxhash64 forms; pass engine-portable hashes (md5-derived) when
    * another system must reproduce the report bit-for-bit. */
  def snapshotDiff(
      cur: DataFrame, prev: DataFrame, bucketOf: Column, rowHash: Column): DataFrame = {
    def fp(df: DataFrame) = bucketFingerprints(df.withColumn("bucket", bucketOf), rowHash)
    val c = fp(cur).withColumnsRenamed(Map("n_rows" -> "n_cur", "fingerprint" -> "fp_cur"))
    val p = fp(prev).withColumnsRenamed(Map("n_rows" -> "n_prev", "fingerprint" -> "fp_prev"))
    c.join(p, Seq("bucket"), "full_outer")
      .withColumn("status",
        when(col("n_prev").isNull, lit("added"))
          .when(col("n_cur").isNull, lit("removed"))
          .when(col("n_cur") =!= col("n_prev") || col("fp_cur") =!= col("fp_prev"),
            lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("bucket"), col("status"))
  }

  /** [[snapshotDiff]] with the staged layout's own bucket/row hashes. */
  def snapshotDiff(
      cur: DataFrame, prev: DataFrame, keyCols: Seq[String], numBuckets: Int): DataFrame =
    snapshotDiff(cur, prev, bucketExpr(keyCols, numBuckets), defaultRowHash(cur))

  /** Latest committed (rows, fingerprint) per done bucket. A bucket may have
    * several done rows (one per snapshot that revalidated it); completion is
    * content-addressed, so ANY done row matching the current content counts —
    * no row ordering or manifest mutation needed. */
  private def doneFingerprints(
      spark: SparkSession, manifestDir: String): Set[(Int, Long, Long)] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.schema(manifestSchema).parquet(manifestDir)
      .filter(col("status") === "done" && col("fingerprint").isNotNull)
      .select("bucket", "rows", "fingerprint").distinct()
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
  }

  /** Incremental, content-addressed [[run]]: validate ONLY buckets whose
    * current staged content has no committed manifest row with a matching
    * (rows, fingerprint). Re-staging a new table snapshot therefore
    * revalidates exactly the changed buckets — unchanged buckets' outputs are
    * untouched on disk (byte-identical), removed buckets' outputs are deleted
    * and committed as empty, and nothing is ever re-validated twice for the
    * same content. Completion never requires mutating old manifest rows
    * (append-only, like an Iceberg snapshot log).
    *
    * Cost model: one column-pruned fingerprint scan of the staged table
    * (only `rowHash`'s columns are read) + the validation job over changed
    * buckets only. The per-bucket (rows, fingerprint) from the selection scan
    * is reused for the manifest — no second input aggregate.
    *
    * @param rowHash 64-bit row hash for fingerprints; defaults to xxhash64
    *                over all staged columns in sorted-name order */
  def incrementalRun(
      spark: SparkSession,
      stagingDir: String,
      manifestDir: String,
      outDir: String,
      numBuckets: Int,
      process: DataFrame => DataFrame,
      sortCols: Seq[String],
      runId: String,
      keyCols: Seq[String],
      rowHash: Option[Column] = None,
      maxBuckets: Int = Int.MaxValue): Seq[Int] = {
    // selection source: the stage-time sidecar when present (1 row per
    // bucket — no table scan), else one column-pruned fingerprint scan.
    // Mixing hash functions across snapshots degrades to one full
    // revalidation (fingerprints mismatch => everything pending), never to
    // a false skip.
    val sidecar = new org.apache.hadoop.fs.Path(stagingDir, FingerprintSidecar)
    val sidecarFs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current =
      (if (sidecarFs.exists(sidecar)) spark.read.parquet(sidecar.toString)
       else {
         val staged = spark.read.parquet(stagingDir)
         bucketFingerprints(staged, rowHash.getOrElse(defaultRowHash(staged)))
       }).collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val done = doneFingerprints(spark, manifestDir)
    val doneBuckets = done.map(_._1)
    // removed: bucket has an output partition on disk but no staged rows now —
    // delete the stale partition and commit the bucket as empty. Keyed off ONE
    // listing of the output dir (not manifest history), so it is idempotent
    // across remove/re-add/remove cycles.
    val outRoot = new org.apache.hadoop.fs.Path(outDir)
    val fs = outRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val written: Set[Int] =
      if (!fs.exists(outRoot)) Set.empty
      else fs.listStatus(outRoot).iterator.map(_.getPath.getName)
        .filter(_.startsWith("bucket=")).map(_.stripPrefix("bucket=").toInt).toSet
    val removed = written.filterNot(current.contains).toSeq.sorted
    if (removed.nonEmpty) {
      removed.foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(outRoot, s"bucket=$b"), true)
      }
      appendManifest(spark, manifestDir, removed.map { b =>
        org.apache.spark.sql.Row(b, runId, stagingDir, 0L, 0L, 0L, "done",
          java.lang.Long.valueOf(0L))
      })
    }
    val pending = (0 until numBuckets).filter(b =>
      current.get(b).exists { case (n, fp) => !done.contains((b, n, fp)) })
      .take(maxBuckets)
    runCore(spark, stagingDir, manifestDir, outDir, numBuckets, process,
      sortCols, runId, keyCols, pending, statsByBucket = Some(current))
  }
}
