package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Entities

/** The reference's ACTUAL end-to-end deliverable (etl_import.py:21-64,
  * json_structure:1-87): one nested JSON import payload per organization
  * — six entity extracts + validated/imported flags + extractedDate + a
  * zeroed per-entity summary — written to `mmj-{org}.json` and a
  * document store.
  *
  * Re-expressed Spark-first as ONE declarative plan over ALL
  * organizations at once (the reference runs once per org with per-row
  * Mongo round-trips; here every org's payload is assembled in the same
  * distributed job and the org spine is a broadcast of the bounded
  * region dim):
  *
  *   entity extracts (the six oracle-green `*_doc` registry plans,
  *   reused verbatim as the single source of truth)
  *     → nested camelCase doc structs (field order = the reference's
  *       `json.dumps(sort_keys=True)`: ALPHABETICAL at every level)
  *     → per-org `collect_list` + deterministic id-sort
  *     → org-spine left joins (empty orgs keep empty arrays)
  *     → payload struct + summary + flags
  *     → `to_json` (one document per org) → one `mmj-{org}.json` each.
  *
  * Determinism: the reference stamps `int(time.time())`; here
  * `extractedEpoch` is an injectable parameter pinned to
  * [[ImportJob.PinnedExtractEpoch]] so payload bytes, oracle rows, and
  * golden files are reproducible. Formatting: compact single-line JSON
  * (Spark's native serialization) instead of `indent=4` — the sorted
  * key order is preserved, the pretty-printing whitespace is dropped
  * deliberately (at 100 TB it is ~30% inert bytes).
  *
  * Scale posture: each entity table groups ONCE on its org key (plain
  * hash aggregation); the org-level join tree is over ≤#orgs rows. The
  * one-document-per-org shape is the REFERENCE's contract — an org's
  * full member list in a single JSON value is inherent to it; an org too
  * large for one document should ship the S5 JSONL sink per entity
  * instead (same extracts, no contract change). */
object ImportJob {

  /** Pinned extraction stamp (2023-11-14T22:13:20Z) — the deterministic
    * stand-in for the reference's `int(time.time())`. */
  val PinnedExtractEpoch = 1700000000L

  /** (id → organizationId) for customer-keyed entities (members,
    * physicians): org-{regionkey} through the nation dim — a slim
    * 2-column scan joined to the broadcast nation table. */
  private def orgOfCustomer(s: SparkSession, d: String): DataFrame =
    graft.Tables.customer(s, d)
      .select(col("c_custkey").as("id"), col("c_nationkey"))
      .join(broadcast(graft.Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("id"),
        concat(lit("org-"), col("n_regionkey")).as("organizationId"))

  /** (id → organizationId) for supplier-keyed entities (employees,
    * vendors). */
  private def orgOfSupplier(s: SparkSession, d: String): DataFrame =
    graft.Tables.supplier(s, d)
      .select(col("s_suppkey").as("id"), col("s_nationkey"))
      .join(broadcast(graft.Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("id"),
        concat(lit("org-"), col("n_regionkey")).as("organizationId"))

  /** Deterministic id-ascending order for a collected doc array —
    * collect_list order is partition-dependent; every payload array is
    * sorted by the entity id before serialization. */
  private def sortedById(docs: Column): Column =
    array_sort(docs, (l, r) =>
      when(l.getField("id") < r.getField("id"), -1)
        .when(l.getField("id") > r.getField("id"), 1)
        .otherwise(0))

  /** Members as nested docs: (organizationId, doc). Field expressions
    * come from the oracle-green `members_doc` flattened extract — the
    * nested shape re-assembles the SAME columns (keys map rebuilt from
    * the sorted `keys_kv` encoding), so flattened oracle and nested
    * payload cannot drift apart. */
  def memberDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("members_doc")(s, d)
      .join(orgOfCustomer(s, d), Seq("id"))
      .select(col("organizationId"), struct(
        struct(col("addr_city").as("city"),
          col("addr_country").as("country")).as("address"),
        col("balance_cents").as("balanceCents"),
        date_format(col("dob"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("dateOfBirth"),
        col("id"),
        when(length(col("keys_kv")) > 0,
          str_to_map(col("keys_kv"), lit(","), lit("="))).as("keys"),
        col("member_type").as("memberType"),
        col("name"),
        col("status"),
        col("tax_exempt").as("taxExempt")).as("doc"))

  def employeeDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("employees_doc")(s, d)
      .join(orgOfSupplier(s, d), Seq("id"))
      .select(col("organizationId"), struct(
        date_format(col("dob"), "yyyy-MM-dd'T'HH:mm:ss")
          .as("dateOfBirth"),
        col("email"),
        col("id"),
        col("name"),
        col("role"),
        col("status")).as("doc"))

  /** Products: the testdata analog of dispensary scoping — part has no
    * nation edge, so org = p_partkey mod the 5-region universe
    * (deterministic, oracle-expressible; documented divergence from the
    * reference's dispensary_id). */
  def productDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("menu_items_doc")(s, d)
      .select(concat(lit("org-"), col("id") % 5).as("organizationId"),
        struct(
          col("active"),
          col("category"),
          col("id"),
          col("image_url").as("imageUrl"),
          col("name"),
          col("net_mj").as("netMj"),
          col("price_cents").as("priceCents"),
          col("share_on_wm").as("shareOnWm"),
          col("uom")).as("doc"))

  def vendorDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("vendors_doc")(s, d)
      .join(orgOfSupplier(s, d), Seq("id"))
      .select(col("organizationId"), struct(
        when(col("addr_city").isNotNull, struct(
          col("addr_city").as("city"),
          col("addr_country").as("country"),
          col("addr_line1").as("line1"))).as("address"),
        col("email"),
        col("id"),
        col("licence"),
        col("name"),
        when(col("phone_number").isNotNull, array(struct(
          col("phone_default").as("default"),
          col("phone_name").as("name"),
          col("phone_number").as("number")))).as("phone"),
        col("website")).as("doc"))

  def physicianDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("physicians_doc")(s, d)
      .join(orgOfCustomer(s, d), Seq("id"))
      .select(col("organizationId"), struct(
        when(col("addr_line1").isNotNull || col("addr_city").isNotNull,
          array(struct(col("addr_city").as("city"),
            col("addr_line1").as("line1")))).as("address"),
        col("id"),
        col("name"),
        when(col("phone_number").isNotNull, array(struct(
          lit(true).as("default"),
          col("phone_name").as("name"),
          col("phone_number").as("number")))).as("phone"),
        col("specialty")).as("doc"))

  def settingsDocs(s: SparkSession, d: String): DataFrame =
    Entities.queries("settings_doc")(s, d)
      .select(col("organization").as("organizationId"), struct(
        struct(col("points_per_dollar").as("pointsPerDollar"),
          col("pp_enabled").as("ppEnabled")).as("crm"),
        col("id"),
        col("logo_url").as("logoUrl"),
        struct(col("limit_monthly").as("monthly"),
          col("limit_two_week").as("twoWeek")).as("medicalLimits"),
        col("menu_show_tax").as("menuShowTax"),
        struct(col("tax_name").as("name"),
          col("tax_pct").as("pct")).as("tax")).as("doc"))

  /** One zeroed per-entity summary block (etl_import.py:33-58). */
  private def summaryStruct: Column = {
    def entity = struct(array().cast("array<string>").as("errors"),
      lit(0).as("validated"))
    struct(entity.as("employees"), entity.as("members"),
      entity.as("physicians"), entity.as("products"),
      entity.as("settings"), entity.as("vendors"))
  }

  /** The assembled payload: ONE row per organization, nested exactly as
    * etl_import.py:21-58 (keys alphabetical at every level — the
    * reference's sort_keys=True). Empty orgs keep empty entity arrays
    * (left joins off the bounded region spine). */
  def payloads(s: SparkSession, d: String,
      extractedEpoch: Long = PinnedExtractEpoch): DataFrame = {
    def grouped(docs: DataFrame, name: String): DataFrame =
      docs.groupBy("organizationId")
        .agg(sortedById(collect_list(col("doc"))).as(name))
    val spine = graft.Tables.region(s, d)
      .select(concat(lit("org-"), col("r_regionkey"))
        .as("organizationId"))
    val joined = spine
      .join(grouped(memberDocs(s, d), "members"),
        Seq("organizationId"), "left")
      .join(grouped(employeeDocs(s, d), "employees"),
        Seq("organizationId"), "left")
      .join(grouped(productDocs(s, d), "products"),
        Seq("organizationId"), "left")
      .join(grouped(vendorDocs(s, d), "vendors"),
        Seq("organizationId"), "left")
      .join(grouped(physicianDocs(s, d), "physicians"),
        Seq("organizationId"), "left")
      .join(grouped(settingsDocs(s, d), "settings"),
        Seq("organizationId"), "left")
    // An org with no rows for an entity keeps an EMPTY list (the
    // reference's extract returns []), not null — the typed empty
    // array literal comes from the joined schema, since array() alone
    // resolves to array<string> and coalesce would reject it.
    def nonNull(c: String): Column =
      coalesce(col(c), array().cast(joined.schema(c).dataType))
    joined.select(col("organizationId"), struct(
      nonNull("employees").as("employees"),
      lit(extractedEpoch).as("extractedDate"),
      lit(false).as("imported"),
      nonNull("members").as("members"),
      col("organizationId"),
      nonNull("physicians").as("physicians"),
      nonNull("products").as("products"),
      nonNull("settings").as("settings"),
      summaryStruct.as("summary"),
      lit(false).as("validated"),
      nonNull("vendors").as("vendors")).as("payload"))
  }

  /** The document-store leg of the import through the NATIVE connector
    * surface (r17 VERDICT item 3): the same (content-hash `_id`,
    * serialized payload) rows [[graft.sinks.Sinks.insertDocCollection]]
    * lands, but written via `format("graft-docs")` so commit
    * adjudication — task retries, speculative attempts, replayed batch
    * jobs — is the CONNECTOR's commit protocol, not caller code. A
    * replayed `batchId` replaces its own `batch_id=` partition
    * (idempotent restart); a new extraction lands under a new id. */
  def writeImportDocsV2(s: SparkSession, d: String, store: String,
      batchId: Long = 0L,
      extractedEpoch: Long = PinnedExtractEpoch): Unit =
    payloads(s, d, extractedEpoch)
      .select(graft.sinks.Sinks.docId(col("payload")).as("_id"),
        to_json(col("payload")).as("doc"))
      .write.format("graft-docs")
      .option("path", store)
      .option("batchId", batchId)
      .mode("append").save()

  /** The flattened registry/oracle twin of [[payloads]]: one row per
    * org with the payload's audit flags, stamp, and per-entity counts —
    * what a DuckDB oracle can hash-compare (the nested bytes themselves
    * are pinned by ImportJobSpec's independent re-serialization). */
  def flattenedSummary(s: SparkSession, d: String): DataFrame =
    payloads(s, d).select(
      col("organizationId").as("organization_id"),
      col("payload.validated").as("validated"),
      col("payload.imported").as("imported"),
      col("payload.extractedDate").as("extracted_epoch"),
      size(col("payload.members")).cast("long").as("n_members"),
      size(col("payload.employees")).cast("long").as("n_employees"),
      size(col("payload.products")).cast("long").as("n_products"),
      size(col("payload.vendors")).cast("long").as("n_vendors"),
      size(col("payload.physicians")).cast("long").as("n_physicians"),
      size(col("payload.settings")).cast("long").as("n_settings"))

  /** Incremental import diff — the repeated-extract operation the
    * reference's `imports` collection implies (every run inserts a new
    * full payload; the operational question is what CHANGED since the
    * last one). Classifies each entity row of the CURRENT extract
    * against the PREVIOUS import snapshot by full-document content
    * hash: md5 over the complete flattened doc (explicit column list,
    * chr(1) separator, chr(2) null sentinel — every column cast to
    * string with engine-identical rendering: no raw doubles in the
    * hashed entities) — the entity-grain analogue of [[graft.sinks.
    * Sinks.docId]]. One full-outer join per entity on id, then per-org
    * counts: inserted / deleted / changed / unchanged.
    *
    * The previous snapshot is derived DETERMINISTICALLY from the
    * current extract (the cdc_merge pattern, so the DuckDB oracle
    * reproduces it): rows with id%11==0 are absent from prev
    * (⇒ inserted), id%13==0 carry a perturbed hash (⇒ changed), and
    * id%17==0 are ghost-duplicated at id+10⁷ (⇒ deleted; testdata ids
    * stay far below 10⁷ — a deployment diffs two real snapshots and
    * needs no offset). Covered entities span all three org
    * attributions: members (customer→nation org), vendors
    * (supplier→nation org), products (partkey mod-5 org).
    *
    * Scale: each entity is one extract scan + one co-partitioned
    * full-outer join on id + a per-org aggregation; nothing quadratic,
    * nothing driver-side. */
  def importDelta(s: SparkSession, d: String): DataFrame = {
    def h(cols: Seq[Column]): Column =
      md5(concat_ws("\u0001",
        cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*))
    def delta(cur0: DataFrame, hashCols: Seq[String], entity: String)
        : DataFrame = {
      val cur = cur0.select(col("id"), col("organizationId"),
        h(hashCols.map(col)).as("__h"))
      val prevBase = cur.filter(col("id") % 11 =!= 0)
      val prev = prevBase
        .select(col("id"), col("organizationId"),
          when(col("id") % 13 === 0, md5(concat(col("__h"), lit("x"))))
            .otherwise(col("__h")).as("__h"))
        .unionByName(prevBase.filter(col("id") % 17 === 0)
          .select((col("id") + 10000000L).as("id"),
            col("organizationId"), col("__h")))
      prev.as("p")
        .join(cur.as("c"), col("p.id") === col("c.id"), "full_outer")
        .select(
          coalesce(col("c.organizationId"), col("p.organizationId"))
            .as("organization_id"),
          when(col("p.id").isNull, "inserted")
            .when(col("c.id").isNull, "deleted")
            .when(col("p.__h") =!= col("c.__h"), "changed")
            .otherwise("unchanged").as("cls"))
        .groupBy("organization_id")
        .agg(
          sum(when(col("cls") === "inserted", 1L).otherwise(0L))
            .cast("long").as("n_inserted"),
          sum(when(col("cls") === "deleted", 1L).otherwise(0L))
            .cast("long").as("n_deleted"),
          sum(when(col("cls") === "changed", 1L).otherwise(0L))
            .cast("long").as("n_changed"),
          sum(when(col("cls") === "unchanged", 1L).otherwise(0L))
            .cast("long").as("n_unchanged"))
        .select(lit(entity).as("entity"), col("organization_id"),
          col("n_inserted"), col("n_deleted"), col("n_changed"),
          col("n_unchanged"))
    }
    val members = Entities.queries("members_doc")(s, d)
      .join(orgOfCustomer(s, d), Seq("id"))
    val vendors = Entities.queries("vendors_doc")(s, d)
      .join(orgOfSupplier(s, d), Seq("id"))
    val products = Entities.queries("menu_items_doc")(s, d)
      .withColumn("organizationId",
        concat(lit("org-"), col("id") % 5))
    delta(members, Seq("id", "name", "member_type", "status",
        "tax_exempt", "dob", "balance_cents", "addr_city",
        "addr_country", "keys_kv"), "members")
      .unionByName(delta(vendors, Seq("id", "name", "addr_line1",
        "addr_city", "addr_country", "phone_name", "phone_number",
        "phone_default", "licence", "email", "website"), "vendors"))
      .unionByName(delta(products, Seq("id", "name", "category",
        "price_cents", "share_on_wm", "uom", "active", "net_mj",
        "image_url"), "products"))
  }

  /** Pre-import validation report — the check the reference's
    * summary.errors arrays imply but never populate (etl_import.py
    * zeroes them unconditionally): per org + entity + rule violation
    * counts over the same extracts the payload ships. Rules are the
    * obvious import blockers in this schema: members with a
    * missing/epoch-0 DOB or negative balance, vendors missing their
    * licence or phone, products with no price or no image. One scan +
    * one aggregation per entity; the union is rule-rows only. */
  def validationReport(s: SparkSession, d: String): DataFrame = {
    def rules(df: DataFrame, entity: String,
        rs: Seq[(String, Column)]): DataFrame =
      df.select(col("organizationId") +: rs.map { case (n, c) =>
          when(c, 1L).otherwise(0L).as(n) }: _*)
        .groupBy("organizationId")
        .agg(sum(rs.head._1).as(rs.head._1),
          rs.tail.map(r => sum(r._1).as(r._1)): _*)
        .select(col("organizationId"),
          explode(map(rs.flatMap(r => Seq(lit(r._1), col(r._1))): _*))
            .as(Seq("rule", "n_violations")))
        .select(lit(entity).as("entity"),
          col("organizationId").as("organization_id"), col("rule"),
          col("n_violations").cast("long").as("n_violations"))
    val members = Entities.queries("members_doc")(s, d)
      .join(orgOfCustomer(s, d), Seq("id"))
    val vendors = Entities.queries("vendors_doc")(s, d)
      .join(orgOfSupplier(s, d), Seq("id"))
    val products = Entities.queries("menu_items_doc")(s, d)
      .withColumn("organizationId", concat(lit("org-"), col("id") % 5))
    rules(members, "members", Seq(
        "missing_dob" -> (col("dob") ===
          to_timestamp(lit("1970-01-01 00:00:00"))),
        "negative_balance" -> (col("balance_cents") < 0L)))
      .unionByName(rules(vendors, "vendors", Seq(
        "missing_licence" -> col("licence").isNull,
        "missing_phone" -> col("phone_number").isNull)))
      .unionByName(rules(products, "products", Seq(
        "missing_price" -> col("price_cents").isNull,
        "missing_image" -> col("image_url").isNull)))
  }

  /** Write one `mmj-{org}.json` per organization under `outDir` —
    * etl_import.py:59-61's file contract. The JSON documents are
    * written partition-parallel (text sink partitioned by org), then
    * each org's single part file is renamed to its `mmj-{org}.json`
    * name — a driver-side METADATA pass (one list + one rename per org,
    * no data read), the same O(#orgs) cost any partitioned-export job
    * pays. Returns the written file paths. */
  def writeImportFiles(s: SparkSession, d: String, outDir: String,
      extractedEpoch: Long = PinnedExtractEpoch): Seq[String] = {
    val stage = s"$outDir/_stage"
    payloads(s, d, extractedEpoch)
      .select(col("organizationId"),
        to_json(col("payload"), Map("ignoreNullFields" -> "false"))
          .as("value"))
      .repartition(col("organizationId"))
      .write.mode("overwrite").partitionBy("organizationId").text(stage)
    val conf = s.sparkContext.hadoopConfiguration
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    val fs = stagePath.getFileSystem(conf)
    val out = fs.listStatus(stagePath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("organizationId="))
      .map { dir =>
        val orgId = dir.getPath.getName.stripPrefix("organizationId=")
        val part = fs.listStatus(dir.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-")
            && f.getLen > 0)
        require(part.length == 1,
          s"writeImportFiles: expected one part file for $orgId, " +
            s"got ${part.length}")
        val dest =
          new org.apache.hadoop.fs.Path(s"$outDir/mmj-${orgId}.json")
        if (fs.exists(dest)) fs.delete(dest, false)
        fs.rename(part.head.getPath, dest)
        dest.toUri.getPath
      }.sorted
    fs.delete(stagePath, true)
    out
  }
}
