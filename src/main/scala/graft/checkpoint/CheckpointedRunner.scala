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

  /** Process all pending buckets, committing one manifest row per completed
    * bucket so a kill between buckets loses at most the in-flight bucket.
    *
    * @param process bucket-scoped DataFrame => violations DataFrame to persist
    * @param sortCols deterministic output order within a bucket (byte-stable resume)
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
      maxBuckets: Int = Int.MaxValue): Seq[Int] = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val done = completedBuckets(spark, manifestDir)
    val pending = (0 until numBuckets).filterNot(done).take(maxBuckets)
    val staged = spark.read.parquet(stagingDir)
    for (b <- pending) {
      val t0 = System.nanoTime()
      // partition-pruned scan: only bucket=b directories are read
      val in = staged.filter(col("bucket") === b).drop("bucket")
      val out = process(in)
      val rows = in.count()
      val sorted = out
        .withColumn("bucket", lit(b))
        .sortWithinPartitions(sortCols.map(col): _*)
        .coalesce(1)
        .sortWithinPartitions(sortCols.map(col): _*)
      sorted.write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(outDir)
      val nViol = spark.read.parquet(outDir).filter(col("bucket") === b).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      import scala.jdk.CollectionConverters._
      val row = new org.apache.spark.sql.catalyst.expressions.GenericRow(
        Array[Any](b, runId, stagingDir, rows, nViol, wallMs, "done"))
      spark.createDataFrame(
        List(org.apache.spark.sql.Row.fromSeq(row.toSeq)).asJava, manifestSchema)
        .write.mode(SaveMode.Append).parquet(manifestDir)
    }
    pending
  }
}
