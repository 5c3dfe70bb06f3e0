package graft

import graft.fixtures.GoldenFixtures
import graft.fixtures.GoldenFixtures.{cases, schemas}
import graft.run.Validator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parity harness for the golden corpus (FIXTURES.md §A): writes
  * fixtures/cases.parquet, replays every case through the engine from its raw
  * params_json (string-typed params, exactly like Ecto's external input), and
  * asserts exact violation-row parity + the sha256(params_json) invariant.
  */
class GoldenFixturesSpec extends SparkSpec {
  import spark.implicits._

  /** string-typed param schema per schema_id (external params arrive untyped). */
  private val paramTypes: Map[String, StructType] = Map(
    "person" -> StructType(Seq(
      StructField("first_name", StringType), StructField("last_name", StringType),
      StructField("favorite_colors", ArrayType(StringType)), StructField("age", StringType))),
    "character" -> StructType(Seq(
      StructField("type", StringType), StructField("age", StringType))),
    "when_schema" -> StructType(Seq(
      StructField("rating", StringType), StructField("score", StringType))),
    "derive_schema" -> StructType(Seq(
      StructField("rating", StringType), StructField("score", StringType))),
    "enum_schema" -> StructType(Seq(StructField("genre", StringType))),
    "book" -> bookParams, "book_b" -> bookParams)

  private lazy val authorT = StructType(Seq(StructField("first_name", StringType), StructField("last_name", StringType), StructField("bio", StringType)))
  private lazy val bookParams = StructType(Seq(
    StructField("title", StringType),
    StructField("author", authorT),
    StructField("coauthors", ArrayType(authorT)),
    StructField("genre", StringType)))

  private lazy val casesDf = {
    val df = cases.map(c => (
      c.caseId, c.schemaId, c.paramsJson, c.expectValid,
      c.expectedErrors.map(e => (e.constraintId, e.reason))))
      .toDF("case_id", "schema_id", "params_json", "expect_valid", "expected_errors")
      .withColumn("content_sha256", sha2(col("params_json"), 256))
    df.write.mode("overwrite").parquet("fixtures/cases.parquet")
    spark.read.parquet("fixtures/cases.parquet")
  }

  test("golden corpus: exact violation-row parity for every reference example") {
    val bydSchema = cases.groupBy(_.schemaId)
    for ((schemaId, groupCases) <- bydSchema) {
      val spec = schemas(schemaId)
      val pt = paramTypes(schemaId)
      val input = casesDf.filter(col("schema_id") === schemaId)
        .select(col("case_id"), col("expect_valid"), col("expected_errors"),
          from_json(col("params_json"), pt).as("p"))
        .select(col("case_id") +: col("expect_valid") +: col("expected_errors") +:
          pt.fields.map(f => col(s"p.${f.name}").as(f.name)).toSeq: _*)

      groupCases.foreach { c =>
        val bound = input.filter(col("case_id") === c.caseId)
        val r = Validator.validate(spec, bound, c.bindings)
        val got = r.violations.select("constraint_id", "reason")
          .as[(String, String)].collect().toSet
        val want = c.expectedErrors.map(e => (e.constraintId, e.reason)).toSet
        assert(got === want, s"case ${c.caseId}")
        val valid = r.annotated.select("valid").as[Boolean].collect().head
        assert(valid === c.expectValid, s"case ${c.caseId} valid flag")
      }
    }
  }

  test("derive ordering: character 'ELF' is downcased before block, upcased after (P1->X2->P2)") {
    val spec = schemas("character")
    val df = Seq(("k1", "ELF", "500")).toDF("case_id", "type", "age")
    val r = Validator.validate(spec, df, Map("max_elf_age" -> 400, "max_human_age" -> 120))
    // block saw "elf" (derive ran first)... but Block runs BEFORE derive in
    // 0.6.0 pack order — so block sees raw "ELF", which is NOT in [elf, human]
    val got = r.violations.select("constraint_id").as[String].collect().toSet
    assert(got.contains("type.block.1"),
      "0.6.0 order: Block before PreTransforms — raw value hits the block")
    // map still applied to coerced output
    assert(r.coerced.select("type").as[String].collect().head === "ELF")
  }

  test("sha256(params_json) invariant is stable across write/read") {
    val reread = casesDf.withColumn("recomputed", sha2(col("params_json"), 256))
    assert(reread.filter(col("recomputed") =!= col("content_sha256")).count() === 0)
  }

  test("re-validation of coerced output is idempotent (C2: changeset-of-changeset)") {
    val spec = schemas("person")
    val df = Seq(("k1", "Alice", "Jones", Seq("red"), "30"))
      .toDF("case_id", "first_name", "last_name", "favorite_colors", "age")
    val first = Validator.validate(spec, df, Map("max_age" -> 100))
    val second = Validator.validate(spec, first.coerced, Map("max_age" -> 100))
    assert(second.violations.count() === 0)
    assert(second.coerced.collect().toSeq === first.coerced.collect().toSeq)
  }
}
