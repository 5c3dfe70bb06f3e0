package graft

import graft.dsl._
import graft.run.Validator
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests (SURVEY §5): cast idempotence, required/present invariants,
  * union order-stability, pack filtering, byte-length counting.
  * Properties run over batched generated inputs (one Spark job per property,
  * not per sample).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("cast idempotence: re-validating coerced output adds no violations (C2)") {
    val spec = SchemaSpec("p", Seq(
      Field.integer("a").gt(-1000000),
      Field.float("b"),
      Field.boolean("c"),
      Field.string("d").lenMax(100)),
      keyColumns = Seq("id"))
    val samples = Gen.listOfN(200, for {
      a <- Gen.oneOf(Gen.chooseNum(-99999, 99999).map(_.toString), Gen.alphaStr, Gen.const(null: String))
      b <- Gen.oneOf(Gen.chooseNum(-1e6, 1e6).map(_.toString), Gen.alphaStr)
      c <- Gen.oneOf("true", "false", "1", "0", "yes", "")
      d <- Gen.alphaStr.map(_.take(80))
    } yield (a, b, c, d)).sample.get
    val df = samples.zipWithIndex.map { case ((a, b, c, d), i) => (i, a, b, c, d) }
      .toDF("id", "a", "b", "c", "d")
    val first = Validator.validate(spec, df)
    val second = Validator.validate(spec, first.coerced)
    assert(second.violations.count() === 0,
      "coerced output must re-validate cleanly (typed values, no cast errors)")
  }

  test("required xor present: exactly one of value/required-violation per row") {
    val spec = SchemaSpec("p", Seq(Field.string("v").req), keyColumns = Seq("id"))
    val samples = Gen.listOfN(300, Gen.oneOf(
      Gen.const(null: String), Gen.const(""), Gen.alphaNumStr.map(s => s.take(10)))).sample.get
    val df = samples.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
    val r = Validator.validate(spec, df)
    val joined = r.annotated.select($"id", $"v", size($"violations").as("nv"))
      .as[(Int, String, Int)].collect()
    joined.foreach { case (id, v, nv) =>
      val blank = v == null || v.isEmpty
      assert((nv == 1) == blank && (nv == 0) == !blank, s"row $id v=$v nv=$nv")
    }
  }

  test("union eager order-stability: integer-castable strings always take branch b0") {
    val u = FUnion(Seq(FInteger, FFloat))
    val spec = SchemaSpec("p", Seq(Field.of("v", u)), keyColumns = Seq("id"))
    val ints = Gen.listOfN(100, Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)).sample.get
    val df = ints.zipWithIndex.map { case (v, i) => (i, v.toString) }.toDF("id", "v")
    val r = Validator.validate(spec, df)
    val branches = r.annotated.select(u.branchName($"v")).as[String].collect()
    assert(branches.forall(_ == "integer"))
  }

  test("only/except pack filtering (M1): disabled packs emit nothing; both given => error") {
    val fields = Seq(
      Field.integer("x").gt(100).when(ctx => ctx("x") > 50)
        .blockClauses(BlockClause.failWhen(ctx => ctx("x") < 10, "small")))
    val df = Seq((1, 5L)).toDF("id", "x") // violates gt, when, and block
    val all = Validator.validate(SchemaSpec("p", fields, keyColumns = Seq("id")), df)
    assert(all.violations.count() === 3)
    val noValidators = Validator.validate(
      SchemaSpec("p", fields, keyColumns = Seq("id"), except = Some(Seq(RulePacks.EctoValidations))), df)
    assert(noValidators.violations.select("constraint_id").as[String].collect().toSet ===
      Set("x.when", "x.block.1"))
    val onlyBlock = Validator.validate(
      SchemaSpec("p", fields, keyColumns = Seq("id"), only = Some(Seq(RulePacks.Block))), df)
    assert(onlyBlock.violations.select("constraint_id").as[String].collect().toSet ===
      Set("x.block.1"))
    intercept[IllegalArgumentException] {
      SchemaSpec("p", fields, keyColumns = Seq("id"),
        only = Some(Seq("block")), except = Some(Seq("when")))
    }
    intercept[IllegalArgumentException] {
      SchemaSpec("p", fields, keyColumns = Seq("id"), only = Some(Seq("bogus_pack")))
    }
  }

  test("V14 length counting units: bytes vs characters diverge on multibyte text") {
    val spec = SchemaSpec("p", Seq(
      Field.string("s").lenMax(4),
      Field.binary("b").from("s2").lenMax(4)),
      keyColumns = Seq("id"))
    // "héllo" = 5 chars, 6 UTF-8 bytes
    val df = Seq((1, "héllo", "héllo")).toDF("id", "s", "s2")
    val r = Validator.validate(spec, df)
    val got = r.violations.as[(Int, String, String)].collect().toSet
    assert(got === Set(
      (1, "s.max", "should be at most 4 character(s)"),
      (1, "b.max", "should be at most 4 byte(s)")))
  }

  test("violation array order is pipeline order within a row") {
    val spec = SchemaSpec("p", Seq(
      Field.integer("x").req.gt(100)
        .blockClauses(BlockClause.failWhen(ctx => ctx("x") < 10, "small"))
        .when(ctx => ctx("x") > 50)),
      keyColumns = Seq("id"))
    val df = Seq((1, 5L)).toDF("id", "x")
    val arr = Validator.validate(spec, df).annotated
      .select($"violations.constraint_id").as[Seq[String]].collect().head
    // scalar triggers (cast/required -> when -> validators) are grouped ahead
    // of block arrays for the zero-allocation valid-row fast path; rule
    // EVALUATION still follows reference pack order (values thread through
    // block -> derive -> when -> validators -> map), and violation rows are
    // set-compared, so in-array order is presentation only
    assert(arr.toSet === Set("x.block.1", "x.when", "x.greater_than"))
    assert(arr.indexOf("x.when") < arr.indexOf("x.greater_than"))
  }

  test("V14 graphemes: custom codegen Expression counts clusters, not codepoints") {
    import graft.functions.GraphemeLength
    // "e" + combining acute = 2 codepoints, 1 grapheme; emoji flag = 2 codepoints
    val df = Seq((1, "e\u0301abc"), (2, "plain")).toDF("id", "s")
    val rows = df.select($"id", length($"s"), GraphemeLength($"s")).as[(Int, Int, Int)].collect().toSet
    assert(rows === Set((1, 5, 4), (2, 5, 5)))
    // wired into LengthV via .graphemes: 4 graphemes passes lenMax(4), 5 codepoints would not
    val spec = SchemaSpec("p", Seq(Field.string("s").lenMax(4).graphemes), keyColumns = Seq("id"))
    val r = Validator.validate(spec, df)
    assert(r.violations.as[(Int, String, String)].collect().toSet ===
      Set((2, "s.max", "should be at most 4 character(s)")))
    // stays inside whole-stage codegen (has doGenCode, not CodegenFallback)
    val dir = java.nio.file.Files.createTempDirectory("g").toString
    df.write.parquet(dir + "/t")
    val plan = spark.read.parquet(dir + "/t").select(GraphemeLength($"s"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Project") && l.contains("*(")), plan)
  }

  test("user-authored RulePack: violations flow through the normal pipeline, order preserved") {
    // the extension-authoring seam (reference lib/extension.ex:238-272): a pack
    // emitting triggers + a template field, registered alongside the built-ins
    object BannedPack extends RulePack {
      val name = "banned"
      override def templateFields: Seq[FieldSpec] =
        Seq(Field.string("audit_src").withDefault("banned-pack"))
      override def templateAttributes: Map[String, Any] = Map("pack_version" -> 1)
      def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
          ctx: Ctx, prefix: Column): RulePack.Result =
        f.ftype match {
          case _: FString if f.name != "audit_src" => RulePack.Result(triggers = Seq(
            graft.dsl.Trigger(st.inChanges && st.value.contains("zz"),
              concat(prefix, lit(s"${f.name}.banned")), lit("contains banned token"))))
          case _ => RulePack.Result.empty
        }
    }
    val fields = Seq(Field.string("s").lenMax(3))
    val df = Seq((1, "zzzz"), (2, "ok")).toDF("id", "s") // row 1 fails lenMax AND banned
    val spec = SchemaSpec("p", fields, keyColumns = Seq("id"),
      packs = RulePack.defaults :+ BannedPack)
    val r = Validator.validate(spec, df)
    assert(r.violations.as[(Int, String, String)].collect().toSet === Set(
      (1, "s.max", "should be at most 3 character(s)"),
      (1, "s.banned", "contains banned token")))
    // pipeline order: packs run in registration order => validator trigger first
    val arr = r.annotated.filter($"id" === 1)
      .select($"violations.constraint_id").as[Seq[String]].collect().head
    assert(arr.indexOf("s.max") < arr.indexOf("s.banned"))
    val flipped = SchemaSpec("p", fields, keyColumns = Seq("id"),
      packs = BannedPack +: RulePack.defaults)
    val arr2 = Validator.validate(flipped, df).annotated.filter($"id" === 1)
      .select($"violations.constraint_id").as[Seq[String]].collect().head
    assert(arr2.indexOf("s.banned") < arr2.indexOf("s.max"))
    // template field + attribute contributed by the pack
    assert(spec.allFields.map(_.name) === Seq("s", "audit_src"))
    assert(r.coerced.select("audit_src").distinct().as[String].collect().toSeq === Seq("banned-pack"))
    assert(spec.allAttributes("pack_version") === 1)
    // only/except honor REGISTERED packs, not just built-ins
    val onlyBanned = Validator.validate(spec.copy(only = Some(Seq("banned"))), df)
    assert(onlyBanned.violations.select("constraint_id").as[String].collect().toSet ===
      Set("s.banned"))
    intercept[IllegalArgumentException] { // unregistered name still rejected
      SchemaSpec("p", fields, keyColumns = Seq("id"), only = Some(Seq("banned")))
    }
    // inline embeds inherit the parent's REGISTERED packs, not just the
    // built-in filters: the custom pack fires on embed fields, and a parent
    // only-filter naming it doesn't crash the embed's own validation
    val embSchema = SchemaSpec("child", Seq(Field.string("note")))
    val parent = SchemaSpec("p2", fields, keyColumns = Seq("id"),
      embeds = Seq(EmbedSpec("child", embSchema, inline = true)),
      packs = RulePack.defaults :+ BannedPack,
      only = Some(Seq("banned", RulePacks.EctoValidations)))
    val df2 = Seq((1, "ok", "zz inside")).toDF("id", "s", "note")
      .withColumn("child", struct($"note")).drop("note")
    val r2 = Validator.validate(parent, df2)
    assert(r2.violations.select("constraint_id").as[String].collect().toSet ===
      Set("child.note.banned"))
    // an inline embed that EXPLICITLY lists the five built-ins by hand has
    // opted out of the parent's custom packs (identity sentinel, not value
    // equality: the hand-built Seq is == RulePack.defaults but not eq)
    val optOut = SchemaSpec("child", Seq(Field.string("note")),
      packs = Seq(BlockPack, PreTransformsPack, WhenPack, EctoValidationsPack, PostTransformsPack))
    val parent2 = SchemaSpec("p3", fields, keyColumns = Seq("id"),
      embeds = Seq(EmbedSpec("child", optOut, inline = true)),
      packs = RulePack.defaults :+ BannedPack)
    val r3 = Validator.validate(parent2, df2)
    assert(!r3.violations.select("constraint_id").as[String].collect().toSet
      .contains("child.note.banned"))
  }

  test("M4 template fields merge in; M5 reflections; P7 attributes") {
    val template = Seq(Field.string("audit_tag").withDefault("none"))
    val spec = SchemaSpec("p",
      fields = Seq(Field.integer("x").req.blockClauses(
        BlockClause.failWhen(ctx => ctx("x") < 0, "neg"))),
      keyColumns = Seq("id"),
      templateFields = template,
      attributes = Map("primary_key" -> false, "schema_prefix" -> "graft"))
    // reflections (reference __schema__/1)
    assert(spec.requiredFields === Seq("x"))
    assert(spec.blocks.keySet === Set("x"))
    assert(spec.extensions === RulePacks.All)
    assert(spec.attributes("schema_prefix") === "graft")
    // template field participates in the pipeline (default applied)
    val df = Seq((1, 5L)).toDF("id", "x")
    val r = Validator.validate(spec, df)
    assert(r.coerced.columns.toSeq === Seq("id", "x", "audit_tag"))
    assert(r.coerced.select("audit_tag").as[String].collect().head === "none")
  }

  test("M3 pack-declared field options: eager default/required/validator; values route to the pack") {
    // the extension option DSL seam (reference lib/flint/extension/dsl.ex:1-57
    // declaration, lib/schema.ex:85-128 field-declaration-time enforcement)
    object DivPack extends RulePack {
      val name = "div"
      override val options = Seq(
        OptionSpec("divisible_by", validator = Some { case n: Int => n > 0; case _ => false }),
        OptionSpec("strictness", default = Some("warn"), required = true,
          validator = Some { case s: String => s == "warn" || s == "fail"; case _ => false }))
      def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
          ctx: Ctx, prefix: Column): RulePack.Result =
        spec.fieldOption(f, "divisible_by") match {
          case Some(n: Int) => RulePack.Result(triggers = Seq(Trigger(
            st.inChanges && st.value.isNotNull && pmod(st.value, lit(n)) =!= 0,
            concat(prefix, lit(s"${f.name}.divisible_by")), lit(s"must be divisible by $n"))))
          case _ => RulePack.Result.empty
        }
    }
    val packs = RulePack.defaults :+ DivPack
    val spec = SchemaSpec("p", Seq(Field.integer("n").opt("divisible_by", 3)),
      keyColumns = Seq("id"), packs = packs)
    // resolution: given value, and the required option filled from its default
    assert(spec.fieldOption(spec.field("n"), "divisible_by") === Some(3))
    assert(spec.fieldOption(spec.field("n"), "strictness") === Some("warn"))
    assert(spec.fieldOptions(spec.field("n")) ===
      Map("divisible_by" -> 3, "strictness" -> "warn"))
    val df = Seq((1, 9), (2, 10)).toDF("id", "n")
    val viols = Validator.validate(spec, df).violations
      .as[(Int, String, String)].collect().toSet
    assert(viols === Set((2, "n.divisible_by", "must be divisible by 3")))
    // a field WITHOUT the option: the pack contributes nothing
    val spec2 = SchemaSpec("p", Seq(Field.integer("n")), keyColumns = Seq("id"), packs = packs)
    assert(spec2.fieldOption(spec2.field("n"), "divisible_by") === None)
    assert(Validator.validate(spec2, df).violations.count() === 0)
    // unknown option name => schema-build error listing the declared ones
    val eUnknown = intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n").opt("divisibleby", 3)),
        keyColumns = Seq("id"), packs = packs)
    }
    assert(eUnknown.getMessage.contains("divisibleby") &&
      eUnknown.getMessage.contains("divisible_by"))
    // failing validator => build error with the reference's raise text
    val eBad = intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n").opt("divisible_by", 0)),
        keyColumns = Seq("id"), packs = packs)
    }
    assert(eBad.getMessage.contains("Value 0 for option divisible_by on field n failed validation"))
    // wrong TYPE fails the validator too (type adherence by convention)
    intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n").opt("divisible_by", "three")),
        keyColumns = Seq("id"), packs = packs)
    }
    // bad DEFAULTED value: giving an invalid override of the defaulted option
    intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n").opt("strictness", "explode")),
        keyColumns = Seq("id"), packs = packs)
    }
    // required option with NO default => missing is a build-time error
    object ReqPack extends RulePack {
      val name = "reqp"
      override val options = Seq(OptionSpec("unit", required = true))
      def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
          ctx: Ctx, prefix: Column): RulePack.Result = RulePack.Result.empty
    }
    val eReq = intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n")), keyColumns = Seq("id"),
        packs = RulePack.defaults :+ ReqPack)
    }
    assert(eReq.getMessage.contains("Required option unit on field n not found"))
    // filtering the pack out via except makes its options unknown again
    intercept[IllegalArgumentException] {
      SchemaSpec("p", Seq(Field.integer("n").opt("divisible_by", 3)),
        keyColumns = Seq("id"), packs = packs, except = Some(Seq("div")))
    }
  }

  test("sampling invariants: nested thresholds, eager parameter validation") {
    import graft.ops.Sharding
    val df = spark.range(2000).select($"id", lit("s").as("g"))
    // threshold sampling is NESTED: the f1-sample is a subset of the
    // f2-sample whenever f1 <= f2 (same key, same salt) — growing a sampling
    // budget only ADDS documents, it never swaps any
    def ids(f: Double) = Sharding.stratifiedSample(df, "id", "g", Map.empty, f, "n")
      .select("id").as[Long].collect().toSet
    val (s25, s50, s75) = (ids(0.25), ids(0.5), ids(0.75))
    assert(s25.subsetOf(s50) && s50.subsetOf(s75))
    assert(s25.nonEmpty && s75.size < 2000)
    // out-of-range parameters fail at CALL time, not mid-job
    intercept[IllegalArgumentException] {
      Sharding.stratifiedSample(df, "id", "g", Map("s" -> 1.5))
    }
    intercept[IllegalArgumentException] {
      Sharding.stratifiedSample(df, "id", "g", Map.empty, defaultFraction = -0.1)
    }
    intercept[IllegalArgumentException] {
      Sharding.sampleByWeights(df, "id", "g", Map("s" -> -2.0))
    }
    // expected-rate sanity for fractional weights: E[rows] = n * w
    val n = Sharding.sampleByWeights(df, "id", "g", Map.empty, defaultWeight = 1.5, salt = "n")
      .count()
    assert(n > 2000 * 1.35 && n < 2000 * 1.65, s"rows $n for weight 1.5")
  }
}