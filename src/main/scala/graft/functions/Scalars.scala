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

  /** X2 `account_status` (utils.py:160-168): 1 → INACTIVE, 0 → ACTIVE.
    * Out-of-domain: the reference returns Python `False`; we return NULL
    * (sane semantics, documented divergence — inputs are 0/1 in practice
    * and the oracle SQL uses the same NULL behavior). */
  def accountStatus(c: Column): Column =
    when(c === 1, "INACTIVE").when(c === 0, "ACTIVE")

  /** X3 `create_epoch` (utils.py:171-175): timestamp → epoch seconds. */
  def createEpoch(c: Column): Column = unix_timestamp(c)

  /** Epoch milliseconds (json_structure:70 `createdAtEpoch`). Parquet
    * scans yield TIMESTAMP_NTZ, which unix_millis rejects — cast through
    * TIMESTAMP (identity instant under the fixed UTC session zone). */
  def createEpochMillis(c: Column): Column = unix_millis(c.cast("timestamp"))

  /** X4 `dollars_to_cents` (utils.py:178-180): `int(d * 100)`.
    * Python's int() truncates the double product toward zero —
    * int(19.99*100) == 1998, not 1999. Spark's double→long cast has
    * identical truncate-toward-zero semantics, so `(c*100).cast(long)`
    * reproduces the reference bit-for-bit on DOUBLE inputs. Oracle twin:
    * `CAST(trunc(c*100) AS BIGINT)` (DuckDB's cast rounds; trunc() first). */
  def dollarsToCents(c: Column): Column =
    (c * 100).cast(LongType)

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

  /** X8b employees' fixed DOB constant (employees.py:76-78):
    * every employee gets 1970-01-01 02:30:00. */
  def employeeDob: Column = to_timestamp(lit("1970-01-01 02:30:00"))

  /** X14 phone-array assembly (vendors.py:82-89, physicians.py:98-105):
    * `[{name, number, default:true}]`, whole array null when number is. */
  def phoneArray(name: String, number: Column): Column =
    when(number.isNotNull,
      array(struct(lit(name).as("name"), number.as("number"),
        lit(true).as("default"))))

  /** X17 netMarijuana (menu_items.py:142-144): `int(medicine_amount)` only
    * when unitOfMeasure == 2 (the reference's py2 `is 2` works for small
    * ints; semantics are plain equality). */
  def netMarijuana(uom: Column, medicineAmount: Column): Column =
    when(uom === 2, medicineAmount.cast("int"))

  /** X9 physician-name cleanup (physicians.py:93-96): strip a leading
    * `Dr` / `Dr.` / `Drs` title, case-insensitive, then trim. */
  def stripDoctorTitle(name: Column): Column =
    trim(regexp_replace(name, "(?i)^(Dr(?:.)?s|(?:Dr.?))", ""))

  /** X10 `_map_categories` (menu_items.py:29-33, 277-304): category
    * normalization. The reference's `singularize` NLP call only ever sees
    * three inputs (Seeds/Drinks/Edibles) → literal map. */
  /** The reference's pass-through whitelist (menu_items.py:30-33). */
  val CatMap: Seq[String] = Seq(
    "Indica", "Sativa", "Hybrid", "Edible", "Concentrate", "Drink", "Clone",
    "Seed", "Tinctures", "Gear", "Topicals", "Preroll", "Wax", "Hash")

  def mapCategory(category: Column, sativa: Column, indica: Column): Column = {
    val canon = lower(category)
    // Non-cannabis flow (menu_items.py:293-304): paraphernalia/tincture/
    // prerolled remap, 3-entry plural singularization, CAT_MAP pass-through,
    // everything else (including 'Cannabis' falling through) → Other.
    val fallThrough =
      when(canon === "paraphernalia", "Gear")
        .when(canon === "tincture", "Tinctures")
        .when(canon === "prerolled", "Preroll")
        .when(category === "Seeds", "Seed")
        .when(category === "Drinks", "Drink")
        .when(category === "Edibles", "Edible")
        .when(category.isin(CatMap: _*), category)
        .otherwise("Other")
    // Cannabis flow (menu_items.py:284-291): both %s set → threshold pick,
    // neither >80 → falls through all later ifs → 'Other' ('cannabis'
    // matches none of them and 'Cannabis' ∉ CAT_MAP); not both set → Hybrid.
    when(canon === "cannabis",
      when(sativa > 0 && indica > 0,
        when(sativa > 80, "Sativa").when(indica > 80, "Indica")
          .otherwise("Other"))
        .otherwise("Hybrid"))
      .otherwise(fallThrough)
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
    * petl removes entries whose value is falsy — None, 0, 0.0, False, ''.
    * Our maps are MapType(String,String); numeric zeros stringify as "0" /
    * "0.0" and booleans as "true"/"false", so the string-side predicate
    * covers every falsy rendering the engine can produce. */
  def stripFalsy(m: Column): Column =
    map_filter(m, (_, v) =>
      v.isNotNull && v =!= "" && v =!= "0" && v =!= "0.0" &&
        lower(v) =!= "false")

  /** X13-style guarded struct: null out the whole struct when the gate
    * column is null (vendors.py:74-75, physicians.py:115-116). */
  def structWhenPresent(gate: Column, s: Column): Column =
    when(gate.isNotNull, s)
}
