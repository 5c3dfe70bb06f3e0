package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Append-only lifecycle log for the persisted dedup indexes (`_versions/`
  * inside the index dir, underscore-prefixed so data reads skip it): one row
  * per build / append / compact event with the index's compaction EPOCH and
  * the row count after the event.
  *
  * The epoch is the staleness contract between an index and the corpus it
  * shadows: every corpus deletion pass bumps the corpus manifest epoch and
  * compacts the index AT that epoch, so an index whose max recorded epoch is
  * BEHIND the corpus epoch provably missed a deletion pass — its stale
  * entries of deleted documents would still win against future deltas (the
  * exact failure compaction exists to prevent), so delta operators refuse it
  * via [[requireAtLeast]] instead of silently over-dropping. Appends record
  * the index's CURRENT epoch (they never advance it); an index that predates
  * versioning reads as epoch 0, matching an un-deleted-from corpus.
  */
object IndexVersions {

  val Sidecar = "_versions"

  private val schema = StructType(Seq(
    StructField("epoch", LongType, nullable = false),
    StructField("event", StringType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  private def path(indexDir: String) = s"$indexDir/$Sidecar"

  private def exists(spark: SparkSession, indexDir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(indexDir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The full (epoch, event, rows) history — empty (typed) if the index
    * predates versioning. */
  def read(spark: SparkSession, indexDir: String): DataFrame =
    if (exists(spark, indexDir)) spark.read.schema(schema).parquet(path(indexDir))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Current compaction epoch: max recorded, 0 for a pre-versioning index. */
  def epoch(spark: SparkSession, indexDir: String): Long = {
    val r = read(spark, indexDir).agg(max(col("epoch"))).collect().head
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Record one lifecycle event (one-row append — the log is tiny and the
    * sidecar is never rewritten, so a concurrent reader can't lose history). */
  def record(spark: SparkSession, indexDir: String, epoch: Long, event: String,
      rows: Long): Unit = {
    import spark.implicits._
    Seq((epoch, event, rows)).toDF("epoch", "event", "rows")
      .coalesce(1).write.mode("append").parquet(path(indexDir))
  }

  /** Refuse an index whose compaction epoch is behind the corpus manifest
    * epoch — see the class doc for why using it anyway silently over-drops. */
  def requireAtLeast(spark: SparkSession, indexDir: String, atLeast: Long,
      what: String): Unit = {
    val e = epoch(spark, indexDir)
    require(e >= atLeast,
      s"$what at $indexDir is at compaction epoch $e, older than the corpus " +
        s"manifest epoch $atLeast — it may hold stale entries of deleted " +
        "documents that would wrongly win against new deltas; re-compact it " +
        "with the corpus' surviving ids (a deletions-bearing runDelta does " +
        "this) before delta dedup")
  }
}
