package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A scalar violation trigger: fires -> one (constraint_id, reason) entry.
  * Kept unmaterialized so the hot path can OR all the fire conditions first
  * and only build arrays for rows that actually violate something. */
case class Trigger(fire: Column, cid: Column, reason: Column)

/** Violation-array building blocks shared by the compiler and rule packs. */
object Viols {
  val ViolStruct: DataType =
    StructType(Seq(StructField("constraint_id", StringType), StructField("reason", StringType)))

  def empty: Column = array().cast(ArrayType(ViolStruct))

  def entry(cid: Column, reason: Column): Column =
    struct(cid.as("constraint_id"), reason.as("reason"))

  /** One violation wrapped as a 0/1-element array for uniform concat.
    * Deliberately NOT a higher-order function (filter/lambda) — HOFs are
    * CodegenFallback in Spark and would evict the whole projection from
    * whole-stage codegen; when/array/concat stay codegen'd. */
  def entryArr(fire: Column, cid: Column, reason: Column): Column =
    when(coalesce(fire, lit(false)), array(entry(cid, reason))).otherwise(empty)
}

/** One user-authorable changeset-time pipeline stage — the Scala seam for the
  * reference's extension-authoring DSL (reference: lib/extension.ex:238-272
  * `defmacro __using__`, lib/flint/extension/dsl.ex:1-57 option/attribute
  * declarations + the changeset callback). A pack contributes:
  *   - template fields appended to every schema that enables it (M4),
  *   - template attributes (P7),
  *   - per-field work at its pipeline position: violation [[Trigger]]s,
  *     whole violation-array columns, and/or a rewritten field value.
  *
  * Packs run in SchemaSpec.packs declaration order (the reference folds
  * extensions in declaration order, lib/flint.ex:12-24); `only`/`except`
  * filter by [[name]]. Everything is compiled ONCE on the driver into
  * Catalyst Column trees — a pack never sees rows.
  */
trait RulePack extends Serializable {
  def name: String

  /** M3 for user packs: NEW field options this pack declares — `Field(...)
    * .opt(name, value)` accepts them, and they are resolved (given value or
    * default) and validated EAGERLY at [[SchemaSpec]] build, exactly like the
    * reference's extension `option` DSL (reference:
    * lib/flint/extension/dsl.ex:1-57 declaration, lib/schema.ex:85-128
    * enforcement at field-declaration time). The pack reads resolved values in
    * [[apply]] via `spec.fieldOption(field, name)`. */
  def options: Seq[OptionSpec] = Nil

  /** M4: fields this pack appends to every schema using it
    * (reference: lib/extension.ex:207-229). */
  def templateFields: Seq[FieldSpec] = Nil

  /** P7: schema-level attributes this pack contributes
    * (reference: lib/flint/extensions/embedded.ex:24-27). */
  def templateAttributes: Map[String, Any] = Map.empty

  /** Per-field compile hook. `state.value` is the field's CURRENT pipeline
    * value (prior packs' rewrites applied); `ctx` resolves sibling fields at
    * this stage plus run bindings; `prefix` is the embed-scope constraint-id
    * prefix. Return triggers / violation arrays / a value rewrite. */
  def apply(spec: SchemaSpec, field: FieldSpec, state: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result
}

/** One pack-declared field option (reference: lib/flint/extension/dsl.ex:1-57
  * — name/default/required/validator; the reference's `eval` flag is n/a by
  * design: Scala option values are already evaluated). `validator` receives
  * the given (or defaulted) value and doubles as the type check, per the
  * reference's convention. Enforcement is eager — a missing required option
  * or a failing validator throws at [[SchemaSpec]] construction with the
  * reference's raise text (lib/schema.ex:108-128). */
case class OptionSpec(
    name: String,
    default: Option[Any] = None,
    required: Boolean = false,
    validator: Option[Any => Boolean] = None)

object RulePack {
  /** A field's state when a pack runs: current value + membership in
    * "changes" (present in input and cast succeeded). */
  case class FieldState(value: Column, inChanges: Column)

  case class Result(
      triggers: Seq[Trigger] = Nil,
      violArrays: Seq[Column] = Nil,
      newValue: Option[Column] = None)
  object Result { val empty: Result = Result() }

  /** The reference's default extension pipeline, in its declaration order
    * (reference: lib/flint.ex:12-24; Block precedes PreTransforms in 0.6.0 —
    * preserved quirk, SURVEY §3). */
  val defaults: Seq[RulePack] =
    Seq(BlockPack, PreTransformsPack, WhenPack, EctoValidationsPack, PostTransformsPack)
}

/** X2/X3 do-block clauses: indexed, accumulating; a clause whose condition
  * errors (null) emits the generic message; a truthy clause whose expression
  * is nil RESETS earlier same-field errors
  * (reference: lib/flint/extensions/block.ex:35-131, reset at :80-82). */
object BlockPack extends RulePack {
  val name: String = RulePacks.Block
  def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result =
    if (f.block.isEmpty) RulePack.Result.empty
    else {
      val blockArr = f.block.zipWithIndex.foldLeft(Viols.empty) { case (acc, (cl, i)) =>
        val cond = cl.cond(ctx)
        val msg = cl.result(ctx)
        val cid = concat(prefix, lit(s"${f.name}.block.${i + 1}"))
        val genericReason =
          lit(s"Error evaluating expression in Clause #${i + 1} of `do:` block")
        when(cond.isNull, array_append(acc, Viols.entry(cid, genericReason)))
          .when(cond,
            when(msg.isNull, Viols.empty) // pass => reset (X3)
              .otherwise(array_append(acc, Viols.entry(cid, msg))))
          .otherwise(acc)
      }
      RulePack.Result(violArrays =
        Seq(when(st.inChanges, blockArr).otherwise(Viols.empty)))
    }
}

/** P1 :derive — code-as-written gates on membership in changes
  * (reference: lib/flint/extensions/pre_transforms.ex:61-69); deriveAlways
  * exposes the documented always-derive behavior (SURVEY §1.3). */
object PreTransformsPack extends RulePack {
  val name: String = RulePacks.PreTransforms
  def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result = f.derive match {
    case Some(e) if spec.deriveAlways => RulePack.Result(newValue = Some(e(ctx)))
    case Some(e) => RulePack.Result(newValue = Some(when(st.inChanges, e(ctx)).otherwise(st.value)))
    case None    => RulePack.Result.empty
  }
}

/** X1 :when — falsy OR eval-failure (null) => "Failed `:when` validation"
  * (reference: lib/flint/extensions/when.ex:42-83). */
object WhenPack extends RulePack {
  val name: String = RulePacks.When
  def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result = f.whenRule match {
    case Some(rule) => RulePack.Result(triggers = Seq(Trigger(
      st.inChanges && !coalesce(rule(ctx), lit(false)),
      concat(prefix, lit(s"${f.name}.when")), lit("Failed `:when` validation"))))
    case None => RulePack.Result.empty
  }
}

/** V1-V16 Ecto validators — skip nil values; one violation per failed
  * validator (reference: lib/flint/extensions/ecto_validations.ex:87-106). */
object EctoValidationsPack extends RulePack {
  val name: String = RulePacks.EctoValidations
  def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result =
    RulePack.Result(triggers = f.validators.map { v =>
      Trigger(
        st.inChanges && st.value.isNotNull && !coalesce(v.pred(st.value, ctx), lit(false)),
        concat(prefix, lit(s"${f.name}.${v.kind}")), v.reason(st.value, ctx))
    })
}

/** P2 :map — post-transform applied to fields in changes. */
object PostTransformsPack extends RulePack {
  val name: String = RulePacks.PostTransforms
  def apply(spec: SchemaSpec, f: FieldSpec, st: RulePack.FieldState,
      ctx: Ctx, prefix: Column): RulePack.Result = f.mapFn match {
    case Some(e) => RulePack.Result(newValue = Some(when(st.inChanges, e(ctx)).otherwise(st.value)))
    case None    => RulePack.Result.empty
  }
}
