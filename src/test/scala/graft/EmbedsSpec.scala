package graft

import graft.dsl._
import graft.run.Validator
import org.apache.spark.sql.functions._

/** C4: nested embeds — struct + array-of-struct validation, required embeds,
  * parent-field bindings (reference: lib/changeset.ex:52-58, Book example
  * notebooks/feature_guide.livemd:66-196).
  */
case class Author(first_name: String, last_name: String, bio: String)
case class BookRow(id: Int, title: String, author: Author, coauthors: Seq[Author])

class EmbedsSpec extends SparkSpec {
  import spark.implicits._

  val authorSchema = SchemaSpec("author", Seq(
    Field.string("first_name").req,
    Field.string("last_name").req,
    Field.string("bio")))

  val book = SchemaSpec(
    "book",
    fields = Seq(Field.string("title").req),
    embeds = Seq(
      EmbedSpec("author", authorSchema, required = true),
      EmbedSpec("coauthors", authorSchema, many = true)),
    keyColumns = Seq("id"))

  private def viols(r: graft.run.ValidationResult): Set[(Int, String, String)] =
    r.violations.collect().map(row => (row.getInt(0), row.getString(1), row.getString(2))).toSet

  test("embeds_one: nested required subfields validate with dotted constraint ids") {
    val df = Seq(
      BookRow(1, "Dune", Author("Frank", "Herbert", null), Nil),
      BookRow(2, "NoAuthorName", Author(null, "X", "bio"), Nil)).toDF()
    val r = Validator.validate(book, df)
    assert(viols(r) === Set((2, "author.first_name.required", "can't be blank")))
  }

  test("embeds_one!: missing required embed => can't be blank; nested rules skipped") {
    val df = Seq(
      (1, "T", null.asInstanceOf[(String, String, String)])
    ).toDF("id", "title", "author")
    val r = Validator.validate(book, df)
    assert(viols(r) === Set((1, "author.required", "can't be blank")))
  }

  test("embeds_many: per-element validation with indexed constraint ids; null -> []") {
    val df = Seq(
      BookRow(1, "T", Author("A", "B", null),
        Seq(Author("C", "D", null), Author(null, "E", null), Author("F", null, null)))).toDF()
    val r = Validator.validate(book, df)
    assert(viols(r) === Set(
      (1, "coauthors[1].first_name.required", "can't be blank"),
      (1, "coauthors[2].last_name.required", "can't be blank")))
    // null coauthors defaults to [] (reference: lib/schema.ex:21-22)
    val df2 = spark.sql("SELECT 1 AS id, 'T' AS title, named_struct('first_name','A','last_name','B','bio','') AS author, CAST(NULL AS ARRAY<STRUCT<first_name:STRING,last_name:STRING,bio:STRING>>) AS coauthors")
    val r2 = Validator.validate(book, df2)
    assert(r2.coerced.select(size($"coauthors")).as[Int].collect().head === 0)
    assert(r2.violations.count() === 0)
  }

  test("nested rules see parent fields as bindings (cross-level)") {
    val child = SchemaSpec("line", Seq(
      Field.integer("qty").req.when(ctx => ctx("qty") <= ctx.b("cap"))))
    val parent = SchemaSpec("order",
      fields = Seq(Field.integer("cap").req),
      embeds = Seq(EmbedSpec("line", child)),
      keyColumns = Seq("id"))
    val df = spark.sql(
      "SELECT 1 AS id, 10 AS cap, named_struct('qty', 50) AS line " +
        "UNION ALL SELECT 2, 100, named_struct('qty', 50)")
    val r = Validator.validate(parent, df)
    assert(viols(r) === Set((1, "line.qty.when", "Failed `:when` validation")))
  }

  test("missing embed column: non-required materializes empty struct (defaults_to_struct)") {
    val spec = SchemaSpec("s",
      fields = Seq(Field.string("t")),
      embeds = Seq(EmbedSpec("meta", authorSchema)),
      keyColumns = Seq("id"))
    val df = Seq((1, "x")).toDF("id", "t")
    val r = Validator.validate(spec, df)
    assert(r.violations.count() === 0)
    val row = r.coerced.select("meta.*").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }
}
