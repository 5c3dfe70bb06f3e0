package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Field type: cast (raw input -> embedded) and dump (embedded -> serialized)
  * expressed as Catalyst `Column` transforms, so the whole pipeline stays inside
  * whole-stage codegen (no UDFs).
  *
  * Mirrors the semantics of the reference's Ecto type layer
  * (reference: lib/type.ex, lib/flint/types/): `cast` is strict per input
  * type (an integer param does NOT cast to :string), a null result on a
  * non-null input marks a cast violation ("is invalid"), and `dump` produces
  * the serialized (JSON-shaped) representation (`embed_as`).
  */
sealed trait FType extends Serializable {
  def name: String
  def sparkType: DataType

  /** Coerce an input column of Spark type `in` to this type.
    * Null on non-null input == cast failure (reference: lib/changeset.ex:32-34).
    */
  def castExpr(c: Column, in: DataType): Column

  /** Serialized representation (reference: lib/schema.ex:44-46 dump). */
  def dumpExpr(c: Column): Column = c

  protected def nullOf: Column = lit(null).cast(sparkType)
}

object FType {
  /** Unwrap FCustom delegation chains (no dump override => the dump IS the
    * base's) so behavior that dispatches on the type class — length units,
    * composite-vs-scalar JSON dumps — treats a custom type like the type it
    * extends (reference: lib/type.ex deftype delegates everything not
    * overridden). A custom dump override is opaque: unwrapping stops there. */
  @annotation.tailrec
  def underlying(t: FType): FType = t match {
    case FCustom(_, base, _, None, _) => underlying(base)
    case other                        => other
  }

  private[dsl] def isNumeric(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
        _: FloatType | _: DoubleType | _: DecimalType => true
    case _ => false
  }
  private[dsl] def isIntegral(dt: DataType): Boolean = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
    case _ => false
  }
}

/** :string — Ecto casts binaries only; numbers do not become strings
  * (reference: union.ex:178 type witness). `lenient=true` relaxes to
  * Spark-style to-string coercion for table work.
  */
case class FString(lenient: Boolean = false) extends FType {
  val name = "string"
  val sparkType: DataType = StringType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: StringType => c
    case _ if lenient  => c.cast(StringType)
    case _             => nullOf
  }
}

/** :integer — accepts integrals and integer-looking strings; floats error
  * (Ecto cast(:integer, 1.0) => :error).
  *
  * String parsing avoids try_cast's failure path on the common shapes:
  * try_cast raises AND catches a per-row exception on every unparsable
  * string (measured 13.5x slower than a succeeding cast) — and unparsable
  * values are THE hot path of a validation engine. A regex pre-screen sends
  * definitely-valid strings through a plain (non-throwing: <= 18 digits
  * cannot overflow) cast and definitely-invalid ones straight to null; only
  * the rare middle (control-char padding, >= 19 digits) pays the exception,
  * which also keeps the semantics EXACTLY try_cast's — Spark trims chars
  * <= 0x20 and accepts optional sign + ASCII digits only (verified against
  * try_cast on the edge corpus in ValidatorSpec). */
case object FInteger extends FType {
  val name = "integer"
  val sparkType: DataType = LongType
  def castExpr(c: Column, in: DataType): Column = in match {
    case dt if FType.isIntegral(dt) => c.cast(LongType)
    case _: StringType =>
      // \z, not $: Java's $ also matches just before a FINAL line terminator
      // (U+2028/U+2029/U+0085), so "123"+U+2028 would take the plain-cast
      // branch and THROW under ANSI (Spark trims only chars <= 0x20)
      when(c.rlike("^[+-]?[0-9]{1,18}\\z"), c.cast(LongType))
        .when(!c.rlike("^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*\\z"), nullOf)
        .otherwise(c.try_cast(LongType))
    case _ => nullOf
  }
}

/** Fast rejection for string->floating casts: a castable string (JDK-parse
  * semantics — decimals, exponents, hex floats, d/f suffixes, Inf/NaN) must,
  * after <= 0x20 trimming and an optional sign, START with a digit, '.', or
  * inf/nan letters. Anything else is null WITHOUT try_cast's raise-and-catch
  * failure path (measured 13.5x a succeeding cast; unparsable values are the
  * validation hot path). Strings passing the screen still go through
  * try_cast, so acceptance semantics stay exactly Spark's. */
private[dsl] object FloatScreen {
  val maybeValid = "^[\\x00-\\x20]*[+-]?([0-9.]|[iI][nN][fF]|[nN][aA][nN])"
}

/** :float — accepts numerics and numeric strings. */
case object FFloat extends FType {
  val name = "float"
  val sparkType: DataType = DoubleType
  def castExpr(c: Column, in: DataType): Column = in match {
    case dt if FType.isNumeric(dt) => c.cast(DoubleType)
    case _: StringType =>
      when(!c.rlike(FloatScreen.maybeValid), nullOf).otherwise(c.try_cast(DoubleType))
    case _ => nullOf
  }
}

/** :decimal — dumped as string in JSON (reference README Book example). */
case object FDecimal extends FType {
  val name = "decimal"
  val sparkType: DataType = DecimalType(38, 18)
  def castExpr(c: Column, in: DataType): Column = in match {
    // try_cast on the numeric branch too: ANSI mode (Spark 4 default) makes a
    // plain cast THROW on decimal(38,18) overflow (e.g. a double >= 1e20),
    // crashing the job — the contract is bad input => violation row, not failure
    case dt if FType.isNumeric(dt) => c.try_cast(sparkType)
    case _: StringType =>
      when(!c.rlike(FloatScreen.maybeValid), nullOf).otherwise(c.try_cast(sparkType))
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column = c.cast(StringType)
}

/** :boolean — accepts booleans and "true"/"false"/"1"/"0" strings. */
case object FBoolean extends FType {
  val name = "boolean"
  val sparkType: DataType = BooleanType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: BooleanType => c
    case _: StringType =>
      when(lower(c).isin("true", "1"), lit(true))
        .when(lower(c).isin("false", "0"), lit(false))
        .otherwise(nullOf)
    case _ => nullOf
  }
}

/** Fast rejection for string->date/timestamp casts (same exception-path issue
  * as [[FloatScreen]]): a castable DATE string starts, after <= 0x20
  * trimming, with an optional sign + digit (ISO shapes, extended years).
  * Special words (now/today/epoch/yesterday/tomorrow) are NOT accepted by
  * casts since Spark 3.2 (typed literals only) — verified empirically and
  * pinned by the edge corpus in ValidatorSpec, so letters reject outright.
  * Timestamps additionally accept a time-only form with a literal leading
  * 'T' — uppercase at position 0 only ("t10:00" and " T10:00" are both
  * rejected by the parser; also verified empirically). */
private[dsl] object DateScreen {
  val maybeValidDate = "^[\\x00-\\x20]*[+-]?[0-9]"
  val maybeValidTs = "^[\\x00-\\x20]*[+-]?[0-9]|^T"
}

case object FDate extends FType {
  val name = "date"
  val sparkType: DataType = DateType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: DateType   => c
    case _: StringType =>
      when(!c.rlike(DateScreen.maybeValidDate), nullOf).otherwise(c.try_cast(DateType))
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column = c.cast(StringType)
}

/** :naive_datetime — wall-clock, no zone (TimestampNTZ). */
case object FNaiveDatetime extends FType {
  val name = "naive_datetime"
  val sparkType: DataType = TimestampNTZType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: TimestampNTZType | _: TimestampType => c.cast(sparkType)
    case _: StringType =>
      when(!c.rlike(DateScreen.maybeValidTs), nullOf).otherwise(c.try_cast(sparkType))
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column = c.cast(StringType)
}

/** :utc_datetime. */
case object FUtcDatetime extends FType {
  val name = "utc_datetime"
  val sparkType: DataType = TimestampType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: TimestampType | _: TimestampNTZType => c.cast(sparkType)
    case _: StringType =>
      when(!c.rlike(DateScreen.maybeValidTs), nullOf).otherwise(c.try_cast(sparkType))
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column = c.cast(StringType)
}

/** Shared wall-clock string parsing for :time/:time_usec. Spark's pattern
  * fraction section `[.SSSSSS]` is width-exact, but Ecto's Time.cast accepts
  * 1..6 fractional digits ("13:45:02.123" => 123000 usec) and truncates
  * beyond 6 — normalize the fraction to exactly 6 digits before parsing. */
private[dsl] object TimeParse {
  def parse(c: Column): Column = {
    val frac = regexp_extract(c, "\\.(\\d+)$", 1)
    val norm = when(frac === "", c).otherwise(concat(
      regexp_replace(c, "\\.\\d+$", ""), lit("."),
      rpad(substring(frac, 1, 6), 6, "0")))
    try_to_timestamp(concat(lit("1970-01-01 "), norm), lit("yyyy-MM-dd HH:mm:ss[.SSSSSS]"))
  }
}

/** :time — seconds precision (Ecto :time; reference: lib/flint/types/union.ex:169
  * witness). Spark 4's TIME type is config-gated off by default, so values are
  * canonical "HH:mm:ss" STRINGS: ordering, grouping, and round-trips all hold,
  * and any engine reproduces them (documented divergence, SURVEY §1.2).
  * Invalid wall-clock input ("25:00:00") => cast violation. */
case object FTime extends FType {
  val name = "time"
  val sparkType: DataType = StringType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: StringType                          => date_format(TimeParse.parse(c), "HH:mm:ss")
    case _: TimestampType | _: TimestampNTZType => date_format(c, "HH:mm:ss")
    case _                                      => nullOf
  }
}

/** :time_usec — microsecond precision (union.ex:170). */
case object FTimeUsec extends FType {
  val name = "time_usec"
  val sparkType: DataType = StringType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: StringType                          => date_format(TimeParse.parse(c), "HH:mm:ss.SSSSSS")
    case _: TimestampType | _: TimestampNTZType => date_format(c, "HH:mm:ss.SSSSSS")
    case _                                      => nullOf
  }
}

/** :map — element-wise key/value cast; any failing entry fails the whole cast
  * (Ecto map-cast semantics; reference: union.ex:175 type witness). Two keys
  * casting to the SAME output key also fail the cast (a violation row) rather
  * than tripping spark.sql.mapKeyDedupPolicy=EXCEPTION at runtime.
  *
  * Codegen note: map casts are built from HOFs (CodegenFallback), so a schema
  * containing a :map field runs its validation projection interpreted — the
  * price of per-entry cast semantics; keep :map fields out of the hottest
  * schemas or pre-normalize the column upstream. */
case class FMap(value: FType, key: FType = FString()) extends FType {
  val name = s"map<${key.name},${value.name}>"
  val sparkType: DataType = MapType(key.sparkType, value.sparkType)
  def castExpr(c: Column, in: DataType): Column = in match {
    case mt: MapType =>
      val ks = map_keys(c); val vs = map_values(c)
      val ks2 = transform(ks, k => key.castExpr(k, mt.keyType))
      val vs2 = transform(vs, v => value.castExpr(v, mt.valueType))
      // a cast failure shows up as a new null in the casted array
      val badK = size(filter(ks2, k => k.isNotNull)) < size(filter(ks, k => k.isNotNull))
      val badV = size(filter(vs2, v => v.isNotNull)) < size(filter(vs, v => v.isNotNull))
      val dupK = size(array_distinct(ks2)) =!= size(ks2)
      when(!coalesce(badK || badV || dupK, lit(false)), map_from_arrays(ks2, vs2))
        .otherwise(nullOf)
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column =
    map_from_arrays(
      transform(map_keys(c), k => key.dumpExpr(k)),
      transform(map_values(c), v => value.dumpExpr(v)))
}

case object FBinary extends FType {
  val name = "binary"
  val sparkType: DataType = BinaryType
  def castExpr(c: Column, in: DataType): Column = in match {
    case _: BinaryType => c
    case _: StringType => c.cast(BinaryType)
    case _             => nullOf
  }
}

/** {:array, t} — element-wise cast; any failing element fails the whole cast
  * (Ecto array-cast semantics).
  */
case class FArray(elem: FType) extends FType {
  val name = s"array<${elem.name}>"
  val sparkType: DataType = ArrayType(elem.sparkType)
  def castExpr(c: Column, in: DataType): Column = in match {
    case ArrayType(et, _) =>
      val bad = exists(c, x => x.isNotNull && elem.castExpr(x, et).isNull)
      when(!coalesce(bad, lit(false)), transform(c, x => elem.castExpr(x, et)))
        .otherwise(nullOf)
    case _ => nullOf
  }
  override def dumpExpr(c: Column): Column = transform(c, x => elem.dumpExpr(x))
}

/** Flint.Types.Enum with keyword mapping: cast accepts embedded key OR dumped
  * value -> key; dump emits the mapped value
  * (reference: lib/flint/types/enum.ex:1-3, README.md:362-377 `embed_as: :dump`).
  * Unmappable input => cast violation.
  */
case class FEnum(mapping: Seq[(String, Any)]) extends FType {
  require(mapping.nonEmpty, "enum mapping must be non-empty")
  val name = "enum"
  val sparkType: DataType = StringType
  /** key-or-dumped-value -> key lookup, deduped on the driver: a dumped value
    * that stringifies to an existing key (e.g. ("1" -> 1)) would otherwise be a
    * duplicate map key, and spark.sql.mapKeyDedupPolicy=EXCEPTION throws at
    * runtime. Keys win over values (cast prefers the embedded key). */
  private def keyByAny: Column = {
    val entries = scala.collection.mutable.LinkedHashMap[String, String]()
    mapping.foreach { case (k, _) => entries.getOrElseUpdate(k, k) }
    mapping.foreach { case (k, v) => entries.getOrElseUpdate(v.toString, k) }
    map(entries.toSeq.flatMap { case (from, to) => Seq(lit(from), lit(to)) }: _*)
  }
  def castExpr(c: Column, in: DataType): Column =
    try_element_at(keyByAny, c.cast(StringType))
  override def dumpExpr(c: Column): Column =
    try_element_at(map(mapping.flatMap { case (k, v) => Seq(lit(k), lit(v).cast(StringType)) }: _*), c)
}

/** Flint.Types.Union (oneof:) — represented as a struct of nullable branches
  * plus a `branch` tag; eager mode takes the first branch whose cast succeeds,
  * in declared order; all-null => cast violation
  * (reference: lib/flint/types/union.ex:68-90).
  * Lazy (type-preserving) mode first tries the branch matching the input's
  * native type (union.ex:168-183 inference witnesses).
  */
case class FUnion(branches: Seq[FType], lazyInfer: Boolean = false) extends FType {
  require(branches.nonEmpty, "union needs at least one branch")
  val name = "union"
  val sparkType: DataType = StructType(
    StructField("branch", StringType) +:
      branches.zipWithIndex.map { case (b, i) => StructField(s"b$i", b.sparkType) })

  private def branchMatchesNative(b: FType, in: DataType): Boolean = (b, in) match {
    case (FInteger, dt) if FType.isIntegral(dt)                  => true
    case (FFloat, _: FloatType | _: DoubleType)                  => true
    case (_: FString, _: StringType)                             => true
    case (FBoolean, _: BooleanType)                              => true
    case (FDecimal, _: DecimalType)                              => true
    case _                                                        => false
  }

  def castExpr(c: Column, in: DataType): Column = {
    val ordered =
      if (lazyInfer) {
        val (native, rest) = branches.zipWithIndex.partition { case (b, _) => branchMatchesNative(b, in) }
        native ++ rest
      } else branches.zipWithIndex
    val tag = ordered.foldRight(lit(null).cast(StringType)) { case ((b, i), acc) =>
      when(b.castExpr(c, in).isNotNull, lit(s"b$i")).otherwise(acc)
    }
    when(tag.isNotNull, struct(
      tag.as("branch") +: branches.zipWithIndex.map { case (b, i) =>
        when(tag === lit(s"b$i"), b.castExpr(c, in)).otherwise(lit(null).cast(b.sparkType)).as(s"b$i")
      }: _*)).otherwise(nullOf)
  }

  /** dump: first non-null branch via ITS OWN dumper (reference routes composite
    * branches through their dumper, union.ex:93-107). The union dump column is
    * a string; scalar branch dumps cast losslessly, composite branch dumps
    * (array/map/nested union) are JSON-encoded — `[1,2]`, not a Scala
    * stringification of the internal value. */
  override def dumpExpr(c: Column): Column =
    coalesce(branches.zipWithIndex.map { case (b, i) =>
      val d = b.dumpExpr(c.getField(s"b$i"))
      // a nested FUnion's own dumpExpr already yields a string
      FType.underlying(b) match {
        case _: FArray | _: FMap => to_json(d)
        case _                   => d.cast(StringType)
      }
    }: _*)

  /** Which branch name a cast value took, e.g. "integer"/"float". */
  def branchName(c: Column): Column = {
    val m = map(branches.zipWithIndex.flatMap { case (b, i) => Seq(lit(s"b$i"), lit(b.name)) }: _*)
    element_at(m, c.getField("branch"))
  }
}

/** C11 parameterized custom types with DEFAULTS (reference: lib/type.ex:42-166
  * `use Flint.Type, extends: ...` whose init/1 merges call-site opts over the
  * declared ones — the Category/NewUID README examples): the template holds
  * default params; apply() merges overrides and builds the concrete type.
  *
  * {{{
  * val Category = FTypeTemplate("category", Map("values" -> Seq("folder", "file")),
  *   (p) => FEnum(p("values").asInstanceOf[Seq[String]].map(v => v -> v)))
  * Category()                                   // default values
  * Category("values" -> Seq("a", "b"))          // field-site override
  * }}}
  */
case class FTypeTemplate(
    name: String,
    defaults: Map[String, Any],
    make: Map[String, Any] => FType) {
  def apply(params: (String, Any)*): FType = make(defaults ++ params)
}

/** Custom type (C11, reference lib/type.ex deftype/extends): delegate to a base
  * type, override cast/dump with plain Column lambdas.
  */
case class FCustom(
    name: String,
    base: FType,
    castOverride: Option[(Column, DataType) => Column] = None,
    dumpOverride: Option[Column => Column] = None,
    sparkTypeOverride: Option[DataType] = None)
    extends FType {
  val sparkType: DataType = sparkTypeOverride.getOrElse(base.sparkType)
  def castExpr(c: Column, in: DataType): Column =
    castOverride.map(_(c, in)).getOrElse(base.castExpr(c, in))
  override def dumpExpr(c: Column): Column =
    dumpOverride.map(_(c)).getOrElse(base.dumpExpr(c))
}
