package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video travel as opaque `binary`
  * columns with a typed metadata struct. The Spark-side mechanics — schema,
  * binary slicing, per-partition batch shape, partitioning by media size —
  * are real and tested; the codec step is a DETERMINISTIC FAKE (this container
  * ships no image/audio libraries). Swap `fakeDecode*` for a real codec UDF /
  * mapInArrow stage in production; every call site is marked.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("byte_size", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Wrap a source column into (media binary, meta struct). */
  def ingest(df: DataFrame, idCol: String, payload: Column, mediaType: String): DataFrame =
    df.select(
      col(idCol),
      payload.cast(BinaryType).as("media"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(payload.cast(BinaryType)).cast(LongType).as("byte_size"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** FAKE DECODE (deterministic stand-in for an image codec): derives
    * plausible dimensions from the byte size. Real impl: decode header bytes. */
  def fakeDecodeImageMeta(media: Column, meta: Column): Column = {
    val size = meta.getField("byte_size")
    struct(
      meta.getField("media_type").as("media_type"),
      size.as("byte_size"),
      ((size * 37L) % 1920L + 16L).cast(IntegerType).as("width"),
      ((size * 91L) % 1080L + 16L).cast(IntegerType).as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  /** FAKE FEATURE EXTRACT: fixed-length feature vector from binary content —
    * deterministic byte-window hashes in [-1, 1]. Real impl: a model forward
    * pass via mapInArrow with batched tensors. */
  def fakeFeatures(media: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(media, i), lit(2000001L)).cast(DoubleType) - 1000000.0) / 1000000.0)

  /** Frame-sampling plumbing: n evenly spaced byte windows of `frameBytes`
    * bytes as array<struct<frame_idx,bytes>> — real byte-slicing on the binary
    * column (a real video codec would seek keyframes instead). */
  def frames(df: DataFrame, idCol: String, mediaCol: String, n: Int, frameBytes: Int): DataFrame = {
    val total = octet_length(col(mediaCol)).cast(LongType)
    val idxs = (0 until n).map { i =>
      val off = when(total > frameBytes,
        (total - frameBytes) * i / math.max(n - 1, 1)).otherwise(lit(0L)).cast(IntegerType)
      struct(lit(i).as("frame_idx"),
        col(mediaCol).substr(off + 1, lit(frameBytes)).as("bytes"))
    }
    df.select(col(idCol), array(idxs: _*).as("frames"))
  }

  /** One decoded media record produced by the batched decode stage. */
  case class DecodedMedia(
      id: Long, byte_size: Long, width: Int, height: Int, features: Array[Double])

  /** Batched decode plumbing — the Scala analog of a Pandas-UDF/mapInPandas
    * stage: one partition is processed as a stream of fixed-size BATCHES so a
    * real codec/model can amortize per-call setup (native handles, model
    * weights) across `batchSize` records, exactly like an Arrow batch. The
    * decode itself is a DETERMINISTIC FAKE (no codec libs in this container) —
    * swap `decodeOne`; the partitioning, batch shape, and Encoder plumbing are
    * real and tested.
    */
  def decodeBatched(
      df: DataFrame, idCol: String, mediaCol: String, featureDim: Int,
      batchSize: Int = 64): org.apache.spark.sql.Dataset[DecodedMedia] = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[DecodedMedia]
    df.select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(mediaCol))
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (codec init / model session)
          batch.map { case (id, bytes) => decodeOne(id, bytes, featureDim) }
        }
      }
  }

  /** FAKE single-record decode used by [[decodeBatched]] — deterministic
    * function of the payload bytes. */
  private def decodeOne(id: Long, bytes: Array[Byte], featureDim: Int): DecodedMedia = {
    val size = bytes.length.toLong
    val features = Array.tabulate(featureDim) { i =>
      // cheap deterministic byte-window hash in [-1, 1]
      var h = 1125899906842597L + i
      var j = i % math.max(bytes.length, 1)
      val end = math.min(j + 16, bytes.length)
      while (j < end) { h = 31 * h + bytes(j); j += 1 }
      ((h % 2000001L).toDouble / 2000000.0)
    }
    DecodedMedia(id, size, ((size * 37) % 1920 + 16).toInt, ((size * 91) % 1080 + 16).toInt, features)
  }

  /** Resize plumbing (FAKE): deterministic downsample marker — keeps byte_size
    * bookkeeping exact so partition sizing logic is testable. */
  def fakeResize(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width"); val h = meta.getField("height")
    val scaleNum = least(lit(maxW) * 1000 / greatest(w, lit(1)), lit(maxH) * 1000 / greatest(h, lit(1)), lit(1000))
    // floor+cast back to LongType: Column `/` is DOUBLE division, and a double
    // byte_size would break schema equality with mediaMetaType / ingest structs
    struct(
      meta.getField("media_type").as("media_type"),
      floor(meta.getField("byte_size") * scaleNum * scaleNum / 1000000L).cast(LongType).as("byte_size"),
      floor(w * scaleNum / 1000).cast(IntegerType).as("width"),
      floor(h * scaleNum / 1000).cast(IntegerType).as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }
}
