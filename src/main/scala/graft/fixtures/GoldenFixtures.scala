package graft.fixtures

import graft.dsl._
import org.apache.spark.sql.functions._

/** Golden case corpus (FIXTURES.md §A): the reference's executable examples —
  * README + notebook cells with recorded outputs, its only de-facto test
  * corpus — re-encoded as data. Each case: a schema id, input params (JSON),
  * bindings, and the exact expected violation set
  * (field, constraint_id, reason).
  *
  * The parity harness (GoldenFixturesSpec) writes these to
  * fixtures/cases.parquet, runs the engine over each case's params, and
  * asserts exact violation-row parity plus sha256(params_json) stability.
  */
object GoldenFixtures {

  case class Expected(constraintId: String, reason: String)
  case class GoldenCase(
      caseId: String,
      schemaId: String,
      paramsJson: String,
      bindings: Map[String, Any],
      expectValid: Boolean,
      expectedErrors: Seq[Expected])

  // ---- schemas under test, keyed by schema_id --------------------------------

  /** README.md:219-260 Person. */
  val person: SchemaSpec = SchemaSpec("person", Seq(
    Field.string("first_name").req.lenMin(5).lenMax(10),
    Field.string("last_name").req.lenMin(5).lenMax(10),
    Field.array("favorite_colors", FString()).subsetOf("red", "blue", "green"),
    Field.integer("age").req.gt(0).lt((ctx: Ctx) => ctx.b("max_age"))),
    keyColumns = Seq("case_id"))

  /** README.md:161-195 Character (block validations). */
  val character: SchemaSpec = SchemaSpec("character", Seq(
    Field.string("type").req
      .derived(ctx => lower(ctx("type")))
      .blockClauses(BlockClause.failWhen(
        ctx => !ctx("type").isin("elf", "human"), "Expected elf or human"))
      .mapped(ctx => upper(ctx("type"))),
    Field.integer("age").req.blockClauses(
      BlockClause.failWhen(ctx => ctx("age") < 0, "Nobody can have a negative age"),
      BlockClause.failWhen(
        ctx => ctx("type") === "elf" && ctx("age") > ctx.b("max_elf_age"),
        "Attention! The elf has become a bug! Should be dead already!"),
      BlockClause.failWhen(
        ctx => ctx("type") === "human" && ctx("age") > ctx.b("max_human_age"),
        "Expected human to be younger"))),
    keyColumns = Seq("case_id"))

  /** feature_guide.livemd:1545-1565 when-rules. */
  val whenSchema: SchemaSpec = SchemaSpec("when_schema", Seq(
    Field.integer("rating").req,
    Field.integer("score").req.gt(0).lt(100)
      .when(ctx => ctx("score") > ctx("rating"))),
    keyColumns = Seq("case_id"))

  /** feature_guide.livemd:1459-1484 derive (0.6.0 code-as-written gating). */
  val deriveSchema: SchemaSpec = SchemaSpec("derive_schema", Seq(
    Field.integer("rating").req,
    Field.integer("score").derived(ctx => ctx("rating") * 2)),
    keyColumns = Seq("case_id"))

  /** README.md:362-377 Enum dump round-trip. */
  val enumSchema: SchemaSpec = SchemaSpec("enum_schema", Seq(
    Field.enum("genre", "biography" -> 0, "science_fiction" -> 1, "fantasy" -> 2,
      "mystery" -> 3).req),
    keyColumns = Seq("case_id"))

  /** feature_guide.livemd:66-196 Book / Book_b (required vs optional embeds). */
  private val authorSchema = SchemaSpec("author", Seq(
    Field.string("first_name").req,
    Field.string("last_name").req,
    Field.string("bio")))
  val book: SchemaSpec = SchemaSpec("book",
    fields = Seq(
      Field.string("title").req,
      Field.enum("genre", "biography" -> 0, "science_fiction" -> 1,
        "fantasy" -> 2, "mystery" -> 3)),
    embeds = Seq(
      EmbedSpec("author", authorSchema, required = true),
      EmbedSpec("coauthors", authorSchema, many = true)),
    keyColumns = Seq("case_id"))
  val bookB: SchemaSpec = book.copy(name = "book_b",
    embeds = Seq(
      EmbedSpec("author", authorSchema), // NOT required (Book_b)
      EmbedSpec("coauthors", authorSchema, many = true)))

  val schemas: Map[String, SchemaSpec] = Map(
    "book" -> book,
    "book_b" -> bookB,
    "person" -> person,
    "character" -> character,
    "when_schema" -> whenSchema,
    "derive_schema" -> deriveSchema,
    "enum_schema" -> enumSchema)

  // ---- cases -------------------------------------------------------------------

  val cases: Seq[GoldenCase] = Seq(
    GoldenCase("readme-person-parameterized", "person",
      """{"first_name":"Bob","last_name":"Smith","favorite_colors":["red","blue","pink"],"age":"101"}""",
      Map("max_age" -> 100), expectValid = false, Seq(
        Expected("first_name.min", "should be at least 5 character(s)"),
        Expected("favorite_colors.subset", "has an invalid entry"),
        Expected("age.less_than", "must be less than 100"))),
    GoldenCase("readme-person-valid", "person",
      """{"first_name":"Alice","last_name":"Jones","favorite_colors":["red"],"age":"30"}""",
      Map("max_age" -> 100), expectValid = true, Nil),
    GoldenCase("readme-person-missing-required", "person",
      """{"first_name":"Alice"}""",
      Map("max_age" -> 100), expectValid = false, Seq(
        Expected("last_name.required", "can't be blank"),
        Expected("age.required", "can't be blank"))),
    GoldenCase("readme-person-cast-error", "person",
      """{"first_name":"Alice","last_name":"Jones","age":"ten"}""",
      // cast failure yields ONLY "is invalid": Ecto's validate_required skips
      // fields already carrying an error (reference: lib/changeset.ex:45)
      Map("max_age" -> 100), expectValid = false, Seq(
        Expected("age.cast", "is invalid"))),

    GoldenCase("readme-character-elf-ok", "character",
      """{"type":"elf","age":"10"}""",
      Map("max_elf_age" -> 400, "max_human_age" -> 120), expectValid = true, Nil),
    GoldenCase("readme-character-orc", "character",
      """{"type":"orc","age":"10"}""",
      Map("max_elf_age" -> 400, "max_human_age" -> 120), expectValid = false, Seq(
        Expected("type.block.1", "Expected elf or human"))),
    GoldenCase("readme-character-old-elf", "character",
      """{"type":"elf","age":"500"}""",
      Map("max_elf_age" -> 400, "max_human_age" -> 120), expectValid = false, Seq(
        Expected("age.block.2", "Attention! The elf has become a bug! Should be dead already!"))),
    GoldenCase("notebook-character-negative-age", "character",
      """{"type":"human","age":"-1"}""",
      Map("max_elf_age" -> 400, "max_human_age" -> 120), expectValid = false, Seq(
        Expected("age.block.1", "Nobody can have a negative age"))),

    GoldenCase("notebook-when-fail", "when_schema",
      """{"rating":"80","score":"50"}""",
      Map.empty, expectValid = false, Seq(
        Expected("score.when", "Failed `:when` validation"))),
    GoldenCase("notebook-when-pass", "when_schema",
      """{"rating":"40","score":"50"}""",
      Map.empty, expectValid = true, Nil),

    // 0.6.0 code-as-written: score absent from input => derive skipped, score null
    GoldenCase("notebook-derive-gated", "derive_schema",
      """{"rating":"10"}""",
      Map.empty, expectValid = true, Nil),
    GoldenCase("notebook-derive-present", "derive_schema",
      """{"rating":"10","score":"1"}""",
      Map.empty, expectValid = true, Nil),

    // feature_guide.livemd:66-196 — embeds required matrix
    GoldenCase("notebook-book-valid", "book",
      """{"title":"Harry Potter","author":{"first_name":"J.K.","last_name":"Rowling"},"genre":"fantasy"}""",
      Map.empty, expectValid = true, Nil),
    GoldenCase("notebook-book-missing-author", "book",
      """{"title":"The old man and the sea"}""",
      Map.empty, expectValid = false, Seq(
        Expected("author.required", "can't be blank"))),
    GoldenCase("notebook-book-partial-author", "book",
      """{"title":"Harry Potter","author":{"first_name":"J.K."},"genre":"fantasy"}""",
      Map.empty, expectValid = false, Seq(
        Expected("author.last_name.required", "can't be blank"))),
    // Book_b quirk: optional embed, partially initialized => nested required fires
    GoldenCase("notebook-bookb-partial-author", "book_b",
      """{"title":"Harry Potter","author":{"first_name":"J.K."},"genre":"fantasy"}""",
      Map.empty, expectValid = false, Seq(
        Expected("author.last_name.required", "can't be blank"))),
    // ... whereas absent altogether passes (empty struct materialized)
    GoldenCase("notebook-bookb-absent-author", "book_b",
      """{"title":"Harry Potter","genre":"fantasy"}""",
      Map.empty, expectValid = true, Nil),
    GoldenCase("notebook-book-bad-coauthor", "book",
      """{"title":"T","author":{"first_name":"A","last_name":"B"},"coauthors":[{"first_name":"C","last_name":"D"},{"first_name":"E"}]}""",
      Map.empty, expectValid = false, Seq(
        Expected("coauthors[1].last_name.required", "can't be blank"))),

    GoldenCase("readme-enum-key", "enum_schema",
      """{"genre":"biography"}""", Map.empty, expectValid = true, Nil),
    GoldenCase("readme-enum-dumped-value", "enum_schema",
      """{"genre":"1"}""", Map.empty, expectValid = true, Nil),
    GoldenCase("readme-enum-invalid", "enum_schema",
      """{"genre":"poetry"}""", Map.empty, expectValid = false, Seq(
        Expected("genre.cast", "is invalid"))))
}
