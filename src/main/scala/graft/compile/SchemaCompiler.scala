package graft.compile

import graft.dsl._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles a [[SchemaSpec]] into Catalyst `Column` trees: one pass per
  * partition, no shuffle, no UDFs — every rule class lands inside whole-stage
  * codegen. The per-row result is (coerced values, violations array), the
  * columnar equivalent of the reference's `Ecto.Changeset`
  * (reference: lib/changeset.ex:15-69).
  *
  * Pipeline order matches the reference's extension fold
  * (reference: lib/flint.ex:13-23, lib/changeset.ex:46-50):
  *   cast -> required -> Block -> derive -> when -> validators -> map
  * (note Block runs BEFORE derive in 0.6.0 — preserved quirk, SURVEY §3).
  */
object SchemaCompiler {

  val ViolStruct: DataType =
    StructType(Seq(StructField("constraint_id", StringType), StructField("reason", StringType)))

  private def emptyViols: Column = array().cast(ArrayType(ViolStruct))

  private def entry(cid: Column, reason: Column): Column =
    struct(cid.as("constraint_id"), reason.as("reason"))

  /** One violation wrapped as a 0/1-element array for uniform concat.
    * Deliberately NOT a higher-order function (filter/lambda) — HOFs are
    * CodegenFallback in Spark and would evict the whole projection from
    * whole-stage codegen; when/array/concat stay codegen'd. */
  private def entryArr(fire: Column, cid: Column, reason: Column): Column =
    when(coalesce(fire, lit(false)), array(entry(cid, reason))).otherwise(emptyViols)

  /** Resolve a raw input column + its Spark type; None type == column absent. */
  type Resolver = String => (Column, Option[DataType])

  def resolverFor(df: DataFrame): Resolver = { name =>
    df.schema.fields.find(_.name == name) match {
      case Some(f) => (df(f.name), Some(f.dataType))
      case None    => (lit(null), None)
    }
  }

  private def resolverForStruct(c: Column, st: StructType): Resolver = { name =>
    st.fields.find(_.name == name) match {
      case Some(f) => (c.getField(f.name), Some(f.dataType))
      case None    => (lit(null), None)
    }
  }

  /** A scalar violation trigger: fires -> one (constraint_id, reason) entry.
    * Kept unmaterialized so the hot path can OR all the fire conditions first
    * and only build arrays for rows that actually violate something. */
  case class Trigger(fire: Column, cid: Column, reason: Column)

  /** Core recursive compile over one record scope (top-level row or embedded
    * struct). Returns final values for all fields + scalar violation triggers
    * + violation-array columns (blocks, embeds_many elements).
    *
    * @param prefix constraint-id prefix ("", "author.", dynamic for embeds_many)
    * @param parentValues parent-record fields visible as bindings in child rules
    *                     (reference: lib/changeset.ex:52-58 `bindings ++ to_bindings`)
    */
  def compileScope(
      spec: SchemaSpec,
      resolve: Resolver,
      bindings: Map[String, Any],
      prefix: Column,
      parentValues: Map[String, Column]): (Map[String, Column], Seq[Trigger], Seq[Column]) = {

    val allBindings = bindings ++ parentValues

    // ---- stage 1+2: cast + default + required/cast violations -------------
    case class CastOut(value: Column, inChanges: Column, viols: Seq[Trigger])
    val casted: Seq[(FieldSpec, CastOut)] = spec.allFields.map { f =>
      val (raw, inTypeOpt) = resolve(f.input)
      if (f.virtual) {
        // C5: passthrough untouched, no rules
        (f, CastOut(raw, lit(false), Nil))
      } else {
        val present = inTypeOpt match {
          case Some(_: StringType) => raw.isNotNull && (raw =!= lit("")) // Ecto empty_values [""]
          case Some(_)             => raw.isNotNull
          case None                => lit(false)
        }
        val castedRaw = inTypeOpt match {
          case Some(t) => f.ftype.castExpr(raw, t)
          case None    => lit(null).cast(f.ftype.sparkType)
        }
        val castedVal = when(present, castedRaw)
        val inChanges = present && castedVal.isNotNull
        val withDefault = f.default match {
          case Some(d) => coalesce(castedVal, lit(d).cast(f.ftype.sparkType))
          case None    => castedVal
        }
        val castFailed = present && castedVal.isNull
        val castViol = Trigger(
          castFailed,
          concat(prefix, lit(s"${f.name}.cast")), lit("is invalid"))
        // Ecto's validate_required skips fields that already carry an error
        // (is_nil(errors[field]) guard), so a failed cast yields ONLY
        // "is invalid" — never both (reference: lib/changeset.ex:45).
        val reqViol =
          if (!f.required) Nil
          else Seq(Trigger(withDefault.isNull && !castFailed,
            concat(prefix, lit(s"${f.name}.required")), lit("can't be blank")))
        (f, CastOut(withDefault, inChanges, castViol +: reqViol))
      }
    }

    var values: Map[String, Column] = casted.map { case (f, c) => f.name -> c.value }.toMap
    var triggers: Seq[Trigger] = casted.flatMap(_._2.viols)
    var viols: Seq[Column] = Nil

    def ctx: Ctx = Ctx(values, allBindings)

    // ---- stage 3: Block (runs before derive — 0.6.0 order) ----------------
    // X3 quirk: a passing truthy clause resets earlier same-field block errors
    // (reference: lib/flint/extensions/block.ex:80-82).
    for ((f, c) <- casted if f.block.nonEmpty && spec.packEnabled(RulePacks.Block)) {
      val blockArr = f.block.zipWithIndex.foldLeft(emptyViols) { case (acc, (cl, i)) =>
        val cond = cl.cond(ctx)
        val msg = cl.result(ctx)
        val cid = concat(prefix, lit(s"${f.name}.block.${i + 1}"))
        val genericReason =
          lit(s"Error evaluating expression in Clause #${i + 1} of `do:` block")
        when(cond.isNull, array_append(acc, entry(cid, genericReason)))
          .when(cond,
            when(msg.isNull, emptyViols)                    // pass => reset (X3)
              .otherwise(array_append(acc, entry(cid, msg))))
          .otherwise(acc)
      }
      viols = viols :+ when(c.inChanges, blockArr).otherwise(emptyViols)
    }

    // ---- stage 4: derive (P1) ---------------------------------------------
    // code-as-written gates on membership in changes (pre_transforms.ex:61-69);
    // deriveAlways exposes the documented always-derive behavior (SURVEY §1.3).
    val postDerive = casted.map { case (f, c) =>
      f.name -> (f.derive match {
        case Some(_) if !spec.packEnabled(RulePacks.PreTransforms) => values(f.name)
        case Some(e) if spec.deriveAlways => e(ctx)
        case Some(e)                      => when(c.inChanges, e(ctx)).otherwise(values(f.name))
        case None                         => values(f.name)
      })
    }.toMap
    values = postDerive

    // ---- stage 5: when (X1) -----------------------------------------------
    // falsy OR eval-failure (null) => "Failed `:when` validation"
    // (reference: lib/flint/extensions/when.ex:42-83).
    for ((f, c) <- casted if spec.packEnabled(RulePacks.When); rule <- f.whenRule) {
      triggers = triggers :+ Trigger(
        c.inChanges && !coalesce(rule(ctx), lit(false)),
        concat(prefix, lit(s"${f.name}.when")), lit("Failed `:when` validation"))
    }

    // ---- stage 6: validators (V1-V16) -------------------------------------
    // Ecto validators skip nil values; one violation row per failed validator.
    for ((f, c) <- casted if spec.packEnabled(RulePacks.EctoValidations); v <- f.validators) {
      val value = values(f.name)
      triggers = triggers :+ Trigger(
        c.inChanges && value.isNotNull && !coalesce(v.pred(value, ctx), lit(false)),
        concat(prefix, lit(s"${f.name}.${v.kind}")), v.reason(value, ctx))
    }

    // ---- stage 7: map (P2) -------------------------------------------------
    val postMap = casted.map { case (f, c) =>
      f.name -> (f.mapFn match {
        case Some(_) if !spec.packEnabled(RulePacks.PostTransforms) => values(f.name)
        case Some(e) => when(c.inChanges, e(ctx)).otherwise(values(f.name))
        case None    => values(f.name)
      })
    }.toMap
    values = postMap

    // ---- embeds (C4): recurse ----------------------------------------------
    for (e <- spec.embeds) {
      // inline do-block embeds inherit the parent's extension-pack filters
      // (reference: lib/schema.ex:369-387); module embeds keep their own
      val childSchema =
        if (e.inline && e.schema.only.isEmpty && e.schema.except.isEmpty)
          e.schema.copy(only = spec.only, except = spec.except)
        else e.schema
      val (raw, tOpt) = resolve(e.input)
      tOpt match {
        case Some(st: StructType) if !e.many =>
          val childResolve = resolverForStruct(raw, st)
          val (childValues, childTriggers, childViols) = compileScope(
            childSchema, childResolve, bindings,
            concat(prefix, lit(s"${e.name}.")), values)
          val childStruct = struct(e.schema.fields.map(f => childValues(f.name).as(f.name)): _*)
          // embeds_one defaults_to_struct: missing non-required embed => struct of nulls
          val materialized =
            if (e.required) when(raw.isNotNull, childStruct)
            else coalesce(when(raw.isNotNull, childStruct),
              struct(e.schema.fields.map(f => lit(null).cast(f.ftype.sparkType).as(f.name)): _*))
          values = values + (e.name -> materialized)
          triggers = triggers ++ childTriggers.map(t => t.copy(fire = raw.isNotNull && t.fire))
          viols = viols ++ childViols.map(v => when(raw.isNotNull, v).otherwise(emptyViols))
          if (e.required)
            triggers = triggers :+ Trigger(raw.isNull,
              concat(prefix, lit(s"${e.name}.required")), lit("can't be blank"))

        case Some(ArrayType(st: StructType, _)) if e.many =>
          // per-element recursion via transform with index; element index is
          // baked into the constraint id: name[i].field.kind
          val parentVals = values
          val perElem = transform(raw, (x, i) => {
            val childResolve = resolverForStruct(x, st)
            val elemPrefix = concat(prefix, lit(s"${e.name}["), i.cast(StringType), lit("]."))
            val (childValues, childTriggers, childViols) =
              compileScope(childSchema, childResolve, bindings, elemPrefix, parentVals)
            val elemViols = childTriggers.map(t => entryArr(t.fire, t.cid, t.reason)) ++ childViols
            struct(
              struct(e.schema.fields.map(f => childValues(f.name).as(f.name)): _*).as("value"),
              (if (elemViols.isEmpty) emptyViols else concat(elemViols: _*)).as("viols"))
          })
          val coercedArr = transform(perElem, x => x.getField("value"))
          // embeds_many always defaults to [] (reference: lib/schema.ex:21-22)
          values = values + (e.name -> coalesce(coercedArr,
            array().cast(ArrayType(StructType(
              e.schema.fields.map(f => StructField(f.name, f.ftype.sparkType)))))))
          viols = viols :+ coalesce(flatten(transform(perElem, x => x.getField("viols"))), emptyViols)
          if (e.required)
            viols = viols :+ entryArr(raw.isNull,
              concat(prefix, lit(s"${e.name}.required")), lit("can't be blank"))

        case _ =>
          // absent embed column
          if (e.required)
            triggers = triggers :+ Trigger(lit(true),
              concat(prefix, lit(s"${e.name}.required")), lit("can't be blank"))
          else if (!e.many)
            values = values + (e.name -> struct(
              e.schema.fields.map(f => lit(null).cast(f.ftype.sparkType).as(f.name)): _*))
          else
            values = values + (e.name -> array().cast(ArrayType(StructType(
              e.schema.fields.map(f => StructField(f.name, f.ftype.sparkType))))))
      }
    }

    (values, triggers, viols)
  }

  /** All violations of a row as one array<struct<constraint_id,reason>> column.
    *
    * Hot-path shape: all scalar triggers are OR'd into one boolean first, and
    * the per-trigger arrays are only built when some trigger fires — a valid
    * row (the overwhelming majority at scale) allocates NOTHING beyond the
    * shared empty-array constant. */
  def violationsArray(spec: SchemaSpec, df: DataFrame, extraBindings: Map[String, Any] = Map.empty): Column = {
    val (_, triggers, viols) = compileScope(spec, resolverFor(df), spec.bindings ++ extraBindings, lit(""), Map.empty)
    val scalarPart =
      if (triggers.isEmpty) None
      else {
        val anyFire = triggers.map(t => coalesce(t.fire, lit(false))).reduce(_ || _)
        Some(when(anyFire, concat(triggers.map(t => entryArr(t.fire, t.cid, t.reason)): _*))
          .otherwise(emptyViols))
      }
    val parts = scalarPart.toSeq ++ viols
    if (parts.isEmpty) emptyViols else if (parts.size == 1) parts.head else concat(parts: _*)
  }

  /** Coerced (cast+default+derive+map) values, keyed by field name. */
  def coercedValues(spec: SchemaSpec, df: DataFrame, extraBindings: Map[String, Any] = Map.empty): Map[String, Column] = {
    val (values, _, _) = compileScope(spec, resolverFor(df), spec.bindings ++ extraBindings, lit(""), Map.empty)
    values
  }
}
