package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalar function layer — every named scalar the reference applies
  * (SURVEY.md §2.8, X1–X19), expressed as pure codegen-friendly Column
  * expressions (no UDFs). Citations are file:line into /root/reference.
  *
  * These compose inside a single `select`, so Catalyst folds them into one
  * whole-stage-codegen projection — the 100 TB-scale answer to the
  * reference's row-at-a-time Python lambdas.
  */
object Scalars {

  /** X1 `true_or_false` (utils.py:149-157): 1 → true, anything else → false. */
  def trueOrFalse(c: Column): Column = coalesce(c === 1, lit(false))

  /** X2 `account_status` (utils.py:160-168): 1 → INACTIVE, 0 → ACTIVE. */
  def accountStatus(c: Column): Column =
    when(c === 1, "INACTIVE").when(c === 0, "ACTIVE")

  /** X3 `create_epoch` (utils.py:171-175): timestamp → epoch seconds. */
  def createEpoch(c: Column): Column = unix_timestamp(c)

  /** Epoch milliseconds (json_structure:70 `createdAtEpoch`). */
  def createEpochMillis(c: Column): Column = unix_millis(c)

  /** X4 `dollars_to_cents` (utils.py:178-180): `int(d * 100)`.
    * Double `d*100` is not exactly representable (1.01*100 = 100.999...), so
    * a raw cast truncates wrongly; round to the nearest cent first. */
  def dollarsToCents(c: Column): Column =
    round(c * 100, 0).cast(LongType)

  /** X5 memberType (members.py:77-79): license_type 1 → MEDICAL else REC. */
  def memberType(licenseType: Column): Column =
    when(licenseType === 1, "MEDICAL").otherwise("RECREATIONAL")

  /** X6 `_set_name` (employees.py:116-124): both names null → login,
    * otherwise "first last" (sane semantics: skip the null half via
    * concat_ws rather than rendering Python's "None Smith"). */
  def setName(first: Column, last: Column, login: Column): Column =
    when(first.isNull && last.isNull, login)
      .otherwise(concat_ws(" ", first, last))

  /** X7 `_set_email` PII mask (employees.py:127-132). The reference uses
    * Faker (nondeterministic); we need reproducible output for the oracle,
    * so the surrogate is a hash-derived address. */
  def maskEmail(email: Column): Column =
    concat(substring(md5(email.cast("string")), 1, 12), lit("@example.org"))

  /** X8 null-DOB default (members.py:135-138): null → epoch 0. */
  def dobOrEpoch0(dob: Column): Column =
    coalesce(dob, to_timestamp(lit("1970-01-01 00:00:00")))

  /** X9 physician-name cleanup (physicians.py:93-96): strip a leading
    * `Dr` / `Dr.` / `Drs` title, case-insensitive, then trim. */
  def stripDoctorTitle(name: Column): Column =
    trim(regexp_replace(name, "(?i)^(Dr(?:.)?s|(?:Dr.?))", ""))

  /** X10 `_map_categories` (menu_items.py:29-33, 277-304): category
    * normalization. The reference's `singularize` NLP call only ever sees
    * three inputs (Seeds/Drinks/Edibles) → literal map. */
  def mapCategory(category: Column, sativa: Column, indica: Column): Column = {
    val canon = lower(category)
    when(canon === "cannabis",
      when(sativa > 0 && indica > 0,
        when(sativa > 80, "Sativa").when(indica > 80, "Indica"))
        .otherwise("Hybrid"))
      .when(canon === "paraphernalia", "Gear")
      .when(canon === "tincture", "Tinctures")
      .when(canon === "prerolled", "Preroll")
      .when(category === "Seeds", "Seed")
      .when(category === "Drinks", "Drink")
      .when(category === "Edibles", "Edible")
      .when(category.isin("Flower", "Concentrate", "Gear", "Topicals"), category)
      .otherwise("Other")
  }

  /** X11 `_active` (menu_items.py:210-216): on_hold == 1 → true. */
  def activeFlag(onHold: Column): Column = coalesce(onHold === 1, lit(false))

  /** X12 S3 URL construction (menu_items.py:117-128, settings.py:118-128):
    * null-propagating template fill. */
  def imageUrl(bucket: String, id: Column, size: String, file: Column): Column =
    when(file.isNotNull,
      concat_ws("/", lit(bucket), id.cast("string"), lit(size), file))

  /** X16 tax percent (settings.py:171-176): true division by 100. */
  def taxPercent(amount: Column): Column = amount / 100.0

  /** F5 falsy-strip for the `keys` maps (members.py:119-122 and 5 siblings):
    * petl removes entries whose value is falsy — None, 0, or ''. */
  def stripFalsy(m: Column): Column =
    map_filter(m, (_, v) => v.isNotNull && v =!= "0" && v =!= "")

  /** X13-style guarded struct: null out the whole struct when the gate
    * column is null (vendors.py:74-75, physicians.py:115-116). */
  def structWhenPresent(gate: Column, s: Column): Column =
    when(gate.isNotNull, s)
}
