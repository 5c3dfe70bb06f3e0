package graft.streaming

import graft.suite.Checks
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming distribution-drift detection: per event-time window, build the
  * categorical histogram with Spark's own watermarked stateful aggregation
  * (partial+final, state = one counter per (window, category) — bounded by
  * the category cardinality, never the stream), and score each FINALIZED
  * window's histogram against a static baseline snapshot with the same PSI
  * the batch check uses ([[graft.suite.Checks.psi]]).
  *
  * Append output mode means a window reaches the scoring stage exactly once,
  * when the watermark passes it — so each window is scored on its complete
  * histogram, and the driver-side PSI fold touches only (windows x
  * categories) rows per micro-batch, the same bounded-histogram contract as
  * the batch drift check.
  */
object StreamingDrift {

  val reportSchema: StructType = StructType(Seq(
    StructField("window_start", TimestampType),
    StructField("window_end", TimestampType),
    StructField("psi", DoubleType, nullable = false),
    StructField("drifted", BooleanType, nullable = false),
    StructField("rows", LongType, nullable = false)))

  /** Configured writer that hands `sink` one drift-report DataFrame per
    * micro-batch: (window_start, window_end, psi, drifted, rows) — one row
    * per window finalized in that batch (often none; windows close when the
    * watermark passes). Caller starts/stops the query. */
  def driftStream(
      stream: DataFrame, tsCol: String, categoricalCol: String,
      baseline: Map[String, Long], windowDuration: String,
      watermarkDelay: String, psiThreshold: Double = 0.2)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val counts = stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(categoricalCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("key"), col("cnt"))
    counts.writeStream.outputMode("append").foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      // finalized (window, key, cnt) rows — bounded by categories per window
      val rows = batch.collect()
      val reports = rows
        .groupBy(r => (r.getTimestamp(0), r.getTimestamp(1)))
        .toSeq.sortBy(_._1._1.getTime)
        .map { case ((ws, we), hs) =>
          val hist = hs.map(r =>
            Option(r.getString(2)).getOrElse(Checks.NullCategoryKey) -> r.getLong(3)).toMap
          val psi = Checks.psi(baseline, hist)
          Row(ws, we, psi, psi > psiThreshold, hist.values.sum)
        }
      import scala.jdk.CollectionConverters._
      sink(spark.createDataFrame(reports.asJava, reportSchema), batchId)
    }
  }
}
