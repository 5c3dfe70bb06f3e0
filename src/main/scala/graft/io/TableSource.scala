package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** N1 seam: the north_rule names an Iceberg source-code table, but this
  * sandbox ships no Iceberg runtime jar (/opt/spark/jars inspected) — so the
  * engine reads through this provider interface instead of a hard-coded
  * format. `ParquetTableSource` + `CheckpointedRunner`'s manifest together
  * play the Iceberg role (partitioned layout + manifest of completed
  * partitions); an `IcebergTableSource` reading `spark.read.format("iceberg")
  * .load(catalogTable)` drops in behind this trait without touching callers.
  */
trait TableSource {
  def read(spark: SparkSession): DataFrame
  def name: String
}

final case class ParquetTableSource(
    path: String,
    expectedSchema: Option[StructType] = None) extends TableSource {
  def name: String = path
  def read(spark: SparkSession): DataFrame = {
    val df = spark.read.parquet(path)
    expectedSchema.foreach { want =>
      val got = df.schema
      val missing = want.fields.filterNot(f => got.exists(g =>
        g.name == f.name && g.dataType == f.dataType))
      require(missing.isEmpty,
        s"table $path missing/mistyped columns: ${missing.map(_.name).mkString(",")}")
    }
    df
  }
}

/** Placeholder wiring for a real Iceberg catalog: constructor shape and the
  * time-travel/pruning options a catalog reader would forward. Fails fast in
  * this sandbox (no runtime jar) rather than silently misreading. */
final case class IcebergTableSource(
    catalogTable: String,
    snapshotId: Option[Long] = None) extends TableSource {
  def name: String = catalogTable
  def read(spark: SparkSession): DataFrame = {
    val reader = snapshotId.foldLeft(spark.read.format("iceberg")) {
      (r, id) => r.option("snapshot-id", id.toString)
    }
    reader.load(catalogTable)
  }
}

/** Bucketed staging: persist a snapshot as a catalog table hash-BUCKETED
  * (and sorted) on a key set, so every later keyed check on those columns —
  * uniqueness, keyed aggregates, co-located self-joins — satisfies its
  * distribution requirement straight off the scan and plans with NO shuffle.
  * At 10^12 rows the one-time bucketed write replaces a full shuffle in
  * EVERY subsequent keyed pass over the snapshot; this is the file-source
  * equivalent of an Iceberg table's bucket partition transform, behind the
  * same seam. Pass `path` to keep the data outside the session warehouse
  * (external table). */
object BucketedStage {
  def stage(df: DataFrame, keys: Seq[String], buckets: Int, table: String,
      path: Option[String] = None): Unit = {
    require(keys.nonEmpty, "bucketed staging needs at least one key column")
    val w0 = df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
    path.fold(w0)(p => w0.option("path", p)).saveAsTable(table)
  }
}

object TableSource {
  /** The canonical input_hint shape. */
  def codeTable(spark: SparkSession): StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("repo", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("commit", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.StringType)))
}
