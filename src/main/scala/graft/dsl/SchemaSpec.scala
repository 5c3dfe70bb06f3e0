package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType}

/** Expression context handed to user rule lambdas: resolves sibling field
  * columns (current pipeline values) and run-level bindings (compiled to
  * literals). Mirrors the reference's `bindings ++ changes` eval environment
  * (reference: lib/extension.ex:185-204) — except compiled once on the driver
  * into a Catalyst tree instead of interpreted per row.
  */
trait Ctx {
  /** Current value of a sibling (or own) field at this pipeline stage. */
  def apply(field: String): Column
  /** Run-level binding as a literal Column. */
  def b(name: String): Column
}

object Ctx {
  def apply(values: Map[String, Column], bindings: Map[String, Any]): Ctx = new Ctx {
    def apply(field: String): Column =
      values.getOrElse(field, throw new IllegalArgumentException(
        s"unknown field '$field' in rule expression; known: ${values.keys.mkString(",")}"))
    def b(name: String): Column = bindings.get(name) match {
      case Some(c: Column) => c
      case Some(v)         => lit(v)
      case None => throw new IllegalArgumentException(s"unknown binding '$name'")
    }
  }
}

/** A validator operand: a compile-time literal or an expression over
  * bindings + previously-cast fields (parameterized validations,
  * reference: lib/flint/extensions/ecto_validations.ex:133-148, README.md:214-266).
  */
sealed trait Operand {
  def column(ctx: Ctx): Column
  /** For %{number}/%{count} interpolation in reason strings. */
  def reasonText(ctx: Ctx): Column
}
case class LitOp(v: Any) extends Operand {
  def column(ctx: Ctx): Column = lit(v)
  def reasonText(ctx: Ctx): Column = lit(v.toString)
}
case class ExprOp(e: Ctx => Column) extends Operand {
  def column(ctx: Ctx): Column = e(ctx)
  def reasonText(ctx: Ctx): Column = e(ctx).cast("string")
}
object Operand {
  import scala.language.implicitConversions
  implicit def fromInt(v: Int): Operand = LitOp(v)
  implicit def fromLong(v: Long): Operand = LitOp(v)
  implicit def fromDouble(v: Double): Operand = LitOp(v)
  implicit def fromExpr(e: Ctx => Column): Operand = ExprOp(e)
}

/** Per-field validators (reference: lib/flint/extensions/ecto_validations.ex:87-106).
  * Each compiles to `(predicate, constraint_id suffix, reason)`; a violation row
  * is emitted when the field is in "changes" (present + cast ok), its current
  * value is non-null, and the predicate is false — Ecto validators skip nil.
  */
sealed trait Validator {
  def kind: String
  /** predicate that must hold (true == valid) */
  def pred(value: Column, ctx: Ctx): Column
  def reason(value: Column, ctx: Ctx): Column
}

case class NumberV(kind: String, operand: Operand) extends Validator {
  private val msgPrefix = kind match {
    case "greater_than"             => "must be greater than "
    case "less_than"                => "must be less than "
    case "less_than_or_equal_to"    => "must be less than or equal to "
    case "greater_than_or_equal_to" => "must be greater than or equal to "
    case "equal_to"                 => "must be equal to "
    case "not_equal_to"             => "must be not equal to "
  }
  def pred(value: Column, ctx: Ctx): Column = {
    val n = operand.column(ctx)
    kind match {
      case "greater_than"             => value > n
      case "less_than"                => value < n
      case "less_than_or_equal_to"    => value <= n
      case "greater_than_or_equal_to" => value >= n
      case "equal_to"                 => value === n
      case "not_equal_to"             => value =!= n
    }
  }
  def reason(value: Column, ctx: Ctx): Column =
    concat(lit(msgPrefix), operand.reasonText(ctx))
}

/** :format — Java regex (reference PCRE regexes translate at DSL-build time). */
case class FormatV(pattern: String) extends Validator {
  val kind = "format"
  def pred(value: Column, ctx: Ctx): Column = regexp_like(value, lit(pattern))
  def reason(value: Column, ctx: Ctx): Column = lit("has invalid format")
}

case class InclusionV(values: Seq[Any]) extends Validator {
  val kind = "inclusion"
  def pred(value: Column, ctx: Ctx): Column = value.isin(values: _*)
  def reason(value: Column, ctx: Ctx): Column = lit("is invalid")
}

case class ExclusionV(values: Seq[Any]) extends Validator {
  val kind = "exclusion"
  def pred(value: Column, ctx: Ctx): Column = !value.isin(values: _*)
  def reason(value: Column, ctx: Ctx): Column = lit("is reserved")
}

/** :subset_of — array field fully contained in the allowed set. */
case class SubsetV(allowed: Seq[Any]) extends Validator {
  val kind = "subset"
  def pred(value: Column, ctx: Ctx): Column =
    size(array_except(value, array(allowed.map(lit): _*))) === 0
  def reason(value: Column, ctx: Ctx): Column = lit("has an invalid entry")
}

/** :is/:min/:max length — `unit` is "characters" | "bytes" | "items"
  * (Ecto validate_length count: graphemes/codepoints/bytes; arrays count items).
  * NOTE: characters == codepoints here (Spark `length`); grapheme-exact
  * counting would need a custom Expression — documented divergence (SURVEY V14).
  */
case class LengthV(kind: String, n: Operand, unit: String = "characters") extends Validator {
  private def len(value: Column): Column = unit match {
    case "bytes"     => octet_length(value)
    case "items"     => size(value)
    case "graphemes" => graft.functions.GraphemeLength(value) // V14 Ecto default, custom codegen Expression
    case _           => length(value)
  }
  def pred(value: Column, ctx: Ctx): Column = {
    val c = n.column(ctx)
    kind match {
      case "is"  => len(value) === c
      case "min" => len(value) >= c
      case "max" => len(value) <= c
    }
  }
  def reason(value: Column, ctx: Ctx): Column = {
    val noun = unit match {
      case "items" => "item(s)"
      case "bytes" => "byte(s)"
      case _       => "character(s)" // graphemes included: Ecto's default :count wording
    }
    val mid = kind match {
      case "is"  => if (unit == "items") "should have " else "should be "
      case "min" => if (unit == "items") "should have at least " else "should be at least "
      case "max" => if (unit == "items") "should have at most " else "should be at most "
    }
    concat(lit(mid), n.reasonText(ctx), lit(" " + noun))
  }
}

/** Arbitrary per-field predicate supplied as a Column lambda (escape hatch for
  * rule classes beyond the reference's option set). */
case class PredV(kind: String, p: (Column, Ctx) => Column, msg: String) extends Validator {
  def pred(value: Column, ctx: Ctx): Column = p(value, ctx)
  def reason(value: Column, ctx: Ctx): Column = lit(msg)
}

/** One `condition -> expression` clause of a `do` block
  * (reference: lib/flint/extensions/block.ex:35-131). `result` evaluates to
  * null (pass) or an error-message string.
  */
case class BlockClause(cond: Ctx => Column, result: Ctx => Column)
object BlockClause {
  /** Common shape: condition true => fixed error message; condition false => pass.
    * (Matches the reference examples where a truthy condition guards a message.) */
  def failWhen(cond: Ctx => Column, msg: String): BlockClause =
    BlockClause(cond, _ => lit(msg))
  /** condition true and msgWhenBad non-null => error. */
  def check(cond: Ctx => Column, result: Ctx => Column): BlockClause =
    BlockClause(cond, result)
}

/** One declared field (reference: lib/schema.ex:56-137 `field`/`field!` +
  * extension options).
  */
case class FieldSpec(
    name: String,
    ftype: FType = FString(),
    required: Boolean = false,
    default: Option[Any] = None,
    validators: Seq[Validator] = Nil,
    whenRule: Option[Ctx => Column] = None,      // X1 :when
    block: Seq[BlockClause] = Nil,               // X2 do-block
    derive: Option[Ctx => Column] = None,        // P1 :derive
    mapFn: Option[Ctx => Column] = None,         // P2 :map
    jsonName: Option[String] = None,             // P4 name:
    omitEmpty: Boolean = false,                  // P4 omitempty:
    ignore: Boolean = false,                     // P4 ignore:
    virtual: Boolean = false,                    // C5 passthrough
    inputColumn: Option[String] = None,          // source column (defaults to name)
    /** M3: pack-declared extra options, as given (resolution against the
      * enabled packs' [[OptionSpec]] declarations — defaults, required,
      * validators — happens eagerly at [[SchemaSpec]] build). */
    extraOptions: Map[String, Any] = Map.empty
) {
  def input: String = inputColumn.getOrElse(name)
  // fluent builders
  def req: FieldSpec = copy(required = true)
  def withDefault(v: Any): FieldSpec = copy(default = Some(v))
  def gt(n: Operand): FieldSpec = v(NumberV("greater_than", n))
  def lt(n: Operand): FieldSpec = v(NumberV("less_than", n))
  def ge(n: Operand): FieldSpec = v(NumberV("greater_than_or_equal_to", n))
  def le(n: Operand): FieldSpec = v(NumberV("less_than_or_equal_to", n))
  def eqTo(n: Operand): FieldSpec = v(NumberV("equal_to", n))
  def neTo(n: Operand): FieldSpec = v(NumberV("not_equal_to", n))
  def format(pattern: String): FieldSpec = v(FormatV(pattern))
  def in(values: Any*): FieldSpec = v(InclusionV(values))
  def notIn(values: Any*): FieldSpec = v(ExclusionV(values))
  def subsetOf(values: Any*): FieldSpec = v(SubsetV(values))
  def lenIs(n: Operand): FieldSpec = v(LengthV("is", n, lenUnit))
  def lenMin(n: Operand): FieldSpec = v(LengthV("min", n, lenUnit))
  def lenMax(n: Operand): FieldSpec = v(LengthV("max", n, lenUnit))
  def when(rule: Ctx => Column): FieldSpec = copy(whenRule = Some(rule))
  def blockClauses(cs: BlockClause*): FieldSpec = copy(block = cs)
  def derived(e: Ctx => Column): FieldSpec = copy(derive = Some(e))
  def mapped(e: Ctx => Column): FieldSpec = copy(mapFn = Some(e))
  def json(name: String = null, omitempty: Boolean = false, skip: Boolean = false): FieldSpec =
    copy(jsonName = Option(name), omitEmpty = omitempty, ignore = skip)
  def from(col: String): FieldSpec = copy(inputColumn = Some(col))
  /** M3: set a pack-declared option (e.g. `.opt("divisible_by", 3)`) —
    * validated at schema build against the enabled packs' declarations. */
  def opt(name: String, value: Any): FieldSpec =
    copy(extraOptions = extraOptions + (name -> value))
  /** Ecto-exact :count => :graphemes for this field's length validators (V14). */
  def graphemes: FieldSpec = copy(validators = validators.map {
    case LengthV(k, n, _) => LengthV(k, n, "graphemes")
    case v                => v
  })
  private def v(x: Validator): FieldSpec = copy(validators = validators :+ x)
  // dispatch on the CAST column's Spark type, not FType.underlying: the
  // underlying() unwrap stops at any dumpOverride (a dump-typing concern),
  // which would give a dump-customized FCustom-over-FArray field length unit
  // "characters" and an AnalysisException at validate time
  private def lenUnit: String = ftype.sparkType match {
    case _: ArrayType  => "items"
    case _: BinaryType => "bytes"
    case _             => "characters"
  }
}

object Field {
  def string(name: String): FieldSpec = FieldSpec(name, FString())
  def stringLenient(name: String): FieldSpec = FieldSpec(name, FString(lenient = true))
  def integer(name: String): FieldSpec = FieldSpec(name, FInteger)
  def float(name: String): FieldSpec = FieldSpec(name, FFloat)
  def decimal(name: String): FieldSpec = FieldSpec(name, FDecimal)
  def boolean(name: String): FieldSpec = FieldSpec(name, FBoolean)
  def date(name: String): FieldSpec = FieldSpec(name, FDate)
  def datetime(name: String): FieldSpec = FieldSpec(name, FUtcDatetime)
  def binary(name: String): FieldSpec = FieldSpec(name, FBinary)
  def array(name: String, elem: FType): FieldSpec = FieldSpec(name, FArray(elem))
  def map(name: String, value: FType, key: FType = FString()): FieldSpec =
    FieldSpec(name, FMap(value, key))
  def time(name: String): FieldSpec = FieldSpec(name, FTime)
  def timeUsec(name: String): FieldSpec = FieldSpec(name, FTimeUsec)
  def `enum`(name: String, mapping: (String, Any)*): FieldSpec = FieldSpec(name, FEnum(mapping))
  def union(name: String, branches: FType*): FieldSpec = FieldSpec(name, FUnion(branches))
  def unionLazy(name: String, branches: FType*): FieldSpec =
    FieldSpec(name, FUnion(branches, lazyInfer = true))
  def of(name: String, t: FType): FieldSpec = FieldSpec(name, t)
}

/** An embedded sub-schema field (C4): embeds_one => nullable struct,
  * embeds_many => array<struct>. Nested rules see parent fields as bindings
  * (reference: lib/changeset.ex:52-58).
  */
case class EmbedSpec(
    name: String,
    schema: SchemaSpec,
    many: Boolean = false,
    required: Boolean = false,
    inputColumn: Option[String] = None,
    /** P4 name: — JSON key rename; embeds are always serialized (the reference
      * checks `key in embeds` before ignore/omitempty, json.ex:129-137). */
    jsonName: Option[String] = None,
    /** Inline do-block embeds inherit the parent schema's extension filters
      * (reference: lib/schema.ex:369-387, inherit at :372/:382); module embeds
      * keep their own. */
    inline: Boolean = false) {
  def input: String = inputColumn.getOrElse(name)
  def jsonKey: String = jsonName.getOrElse(name)
}

/** Built-in rule-pack names, mirroring the reference's default extension
  * pipeline and its declaration order (reference: lib/flint.ex:12-24
  * default_extensions). The packs themselves are [[RulePack]] instances
  * (dsl/RulePack.scala) — users register their own via `SchemaSpec.packs`. */
object RulePacks {
  val Block = "block"
  val PreTransforms = "pre_transforms"   // :derive
  val When = "when"
  val EctoValidations = "ecto_validations"
  val PostTransforms = "post_transforms" // :map
  val All: Seq[String] = Seq(Block, PreTransforms, When, EctoValidations, PostTransforms)
}

/** A compiled-spec-level schema: ordered fields + rule packs, the Scala
  * counterpart of `use Flint.Schema ... embedded_schema do ... end`
  * (reference: lib/schema.ex:392-415). `keyColumns` are carried into every
  * violation row (north_star shape: (repo, path, constraint_id, reason)).
  *
  * `only`/`except` filter the rule packs like the reference's
  * `use Flint.Schema, only: [...]` / `except: [...]`; giving both is an error
  * (reference: lib/flint.ex:9-10, 26-51).
  */
case class SchemaSpec(
    name: String,
    fields: Seq[FieldSpec],
    embeds: Seq[EmbedSpec] = Nil,
    keyColumns: Seq[String] = Nil,
    bindings: Map[String, Any] = Map.empty,
    /** version-drift flag (SURVEY §1.3): derive even when field absent from input. */
    deriveAlways: Boolean = false,
    only: Option[Seq[String]] = None,
    except: Option[Seq[String]] = None,
    /** M4: extension-template fields appended to the declared ones
      * (reference: lib/extension.ex:207-229, lib/schema.ex:508-516). */
    templateFields: Seq[FieldSpec] = Nil,
    /** P7: schema-level attributes (Embedded extension: primary_key,
      * schema_prefix, ... — reflectable metadata, no runtime behavior;
      * reference: lib/flint/extensions/embedded.ex:24-27). */
    attributes: Map[String, Any] = Map.empty,
    /** The changeset pipeline, in execution order: the five built-ins plus any
      * user-registered [[RulePack]]s (the reference's `use Flint.Schema,
      * extensions: [...]`, lib/extension.ex:238-272). `only`/`except` filter
      * this list by pack name. */
    packs: Seq[RulePack] = RulePack.defaults) {
  require(fields.nonEmpty || embeds.nonEmpty, s"schema $name has no fields")
  require(only.isEmpty || except.isEmpty,
    "only one of `only` or `except` may be given") // reference: lib/flint.ex:9-10
  private val packNames = packs.map(_.name)
  require(packNames.distinct.size == packNames.size,
    s"duplicate rule pack(s): ${packNames.diff(packNames.distinct).mkString(",")}")
  private val unknownPack = (only.toSeq.flatten ++ except.toSeq.flatten).filterNot(packNames.contains)
  require(unknownPack.isEmpty, s"unknown rule pack(s): ${unknownPack.mkString(",")}")
  private val dup = (fields.map(_.name) ++ embeds.map(_.name)).groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
  require(dup.isEmpty, s"duplicate field(s) in $name: ${dup.mkString(",")}")

  /** Registered packs that survive the only/except filter, execution order. */
  def enabledPacks: Seq[RulePack] = packs.filter(p => packEnabled(p.name))

  // ---- M3 pack-declared field options: eager resolution + validation --------
  // (reference declares options in the extension DSL, lib/flint/extension/
  // dsl.ex:1-57, and enforces default/required/validator at field-declaration
  // macro time, lib/schema.ex:85-128; the Scala analog of "declaration time"
  // is SchemaSpec construction — a bad option never reaches validate())
  private val declaredOptions: Map[String, OptionSpec] = {
    val all = enabledPacks.flatMap(p => p.options.map(o => p.name -> o))
    val dupOpt = all.groupBy(_._2.name).collect { case (n, vs) if vs.size > 1 => n }
    require(dupOpt.isEmpty,
      s"option(s) declared by more than one enabled pack: ${dupOpt.mkString(",")}")
    all.map { case (_, o) => o.name -> o }.toMap
  }
  private val resolvedFieldOptions: Map[String, Map[String, Any]] = allFields.map { f =>
    val unknown = f.extraOptions.keys.filterNot(declaredOptions.contains)
    require(unknown.isEmpty,
      s"unknown option(s) ${unknown.mkString(",")} on field ${f.name} in schema $name; " +
        s"enabled packs declare: ${declaredOptions.keys.toSeq.sorted.mkString(",")}")
    val resolved = declaredOptions.values.flatMap { o =>
      val value = f.extraOptions.get(o.name).orElse(o.default)
      if (o.required && value.isEmpty)
        throw new IllegalArgumentException( // reference raise text, lib/schema.ex:112-116
          s"Required option ${o.name} on field ${f.name} not found.")
      value.foreach { v =>
        if (!o.validator.forall(_(v)))
          throw new IllegalArgumentException( // reference raise text, lib/schema.ex:119-125
            s"Value $v for option ${o.name} on field ${f.name} failed validation.")
      }
      value.map(o.name -> _)
    }.toMap
    f.name -> resolved
  }.toMap

  /** M3: a field's resolved pack-declared option (given value, else the
    * declaring pack's default). Packs read this inside [[RulePack.apply]]. */
  def fieldOption(field: FieldSpec, option: String): Option[Any] =
    resolvedFieldOptions.getOrElse(field.name, Map.empty).get(option)

  /** All resolved pack-declared options of a field (M5 reflection flavor). */
  def fieldOptions(field: FieldSpec): Map[String, Any] =
    resolvedFieldOptions.getOrElse(field.name, Map.empty)

  /** All fields incl. schema- and pack-level extension templates, in
    * declaration order (M4); declared fields win name collisions. */
  def allFields: Seq[FieldSpec] =
    fields ++ (templateFields ++ enabledPacks.flatMap(_.templateFields))
      .filterNot(t => fields.exists(_.name == t.name))
      .distinctBy(_.name)

  /** P7: declared attributes over pack-contributed ones. */
  def allAttributes: Map[String, Any] =
    enabledPacks.flatMap(_.templateAttributes).toMap ++ attributes

  // M5 reflections (reference: lib/schema.ex:563-567 __schema__/1)
  def requiredFields: Seq[String] =
    allFields.filter(_.required).map(_.name) ++ embeds.filter(_.required).map(_.name)
  def blocks: Map[String, Seq[BlockClause]] =
    allFields.filter(_.block.nonEmpty).map(f => f.name -> f.block).toMap
  def extensions: Seq[String] = enabledPacks.map(_.name)

  def packEnabled(pack: String): Boolean = (only, except) match {
    case (Some(o), _) => o.contains(pack)
    case (_, Some(e)) => !e.contains(pack)
    case _            => true
  }

  def withBindings(b: (String, Any)*): SchemaSpec = copy(bindings = bindings ++ b)
  def field(n: String): FieldSpec = fields.find(_.name == n).getOrElse(
    throw new IllegalArgumentException(s"no field $n in schema $name"))
}
