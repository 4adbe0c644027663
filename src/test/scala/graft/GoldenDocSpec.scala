package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars._
import graft.sinks.Sinks

/** Golden-document test (SURVEY §5.3): assemble a nested member document
  * from fixture rows and pin the exact JSON — the shape spec is the
  * reference's json_structure:1-30 (keys map, address array, enum fields,
  * ISO dates), field order fixed by struct order. */
class GoldenDocSpec extends SparkSpec {
  import spark.implicits._

  private def memberDoc = {
    val src = Seq(
      (42L, "Ann Lee", 1, 0, Some("12 Elm St"), "Springfield", "IL", 77L),
      (43L, "Bo Ray", 0, 1, None, "Shelbyville", "IL", 0L))
      .toDF("id", "name", "license_type", "locked", "line1", "city",
        "state", "membership_id")
    val keys = stripFalsy(map(
      lit("membershipId"), $"membership_id".cast("string"),
      lit("state"), $"state"))
    src.select(struct(
      $"id",
      $"name",
      memberType($"license_type").as("memberType"),
      accountStatus($"locked").as("status"),
      when($"line1".isNotNull,
        array(struct($"line1".as("line1"), $"city".as("city"))))
        .as("address"),
      keys.as("keys")).as("doc"))
  }

  test("member document JSON matches the golden shape") {
    val out = memberDoc
      .select(to_json($"doc", Map("ignoreNullFields" -> "false")))
      .as[String].collect().sorted
    assert(out(0) ==
      """{"id":42,"name":"Ann Lee","memberType":"MEDICAL","status":"ACTIVE","address":[{"line1":"12 Elm St","city":"Springfield"}],"keys":{"membershipId":"77","state":"IL"}}""")
    // falsy membership_id (0) stripped from keys; null address null'd out
    assert(out(1) ==
      """{"id":43,"name":"Bo Ray","memberType":"RECREATIONAL","status":"INACTIVE","address":null,"keys":{"state":"IL"}}""")
  }

  test("vendor document JSON: gated address struct + phone array + trio") {
    // Shape spec: json_structure:31-52 (vendors with nested address,
    // phone array, licence/email/website trio).
    val src = Seq(
      (7L, "Acme Supply", Some("12 Main St"), "Springfield",
        Some("555-0100"), Some("LIC-7")),
      (8L, "Null Corp", None, "Shelbyville", None, None))
      .toDF("id", "name", "line1", "city", "phone", "licence")
    val doc = src.select(struct(
      $"id", $"name",
      structWhenPresent($"line1", struct($"line1".as("line1"),
        $"city".as("city"))).as("address"),
      phoneArray("business", $"phone").as("phone"),
      when($"licence".isNotNull && $"phone".isNotNull, $"licence")
        .as("licence")).as("doc"))
    val out = doc.select(to_json($"doc", Map("ignoreNullFields" -> "false")))
      .as[String].collect().sorted
    assert(out(0) ==
      """{"id":7,"name":"Acme Supply","address":{"line1":"12 Main St","city":"Springfield"},"phone":[{"name":"business","number":"555-0100","default":true}],"licence":"LIC-7"}""")
    assert(out(1) ==
      """{"id":8,"name":"Null Corp","address":null,"phone":null,"licence":null}""")
  }

  test("product document JSON: category + cents + weightPricing nesting") {
    // Shape spec: json_structure:53-87 (products with locationProduct
    // details, weightPricing, createdAtEpoch).
    val src = Seq(
      (3L, "OG Kush", "Cannabis", 90, 5, 19.99, true),
      (4L, "Grinder", "Paraphernalia", 0, 0, 7.5, false))
      .toDF("id", "name", "cat", "sativa", "indica", "price", "active")
    val doc = src.select(struct(
      $"id", $"name",
      mapCategory($"cat", $"sativa", $"indica").as("category"),
      struct($"active".as("active"),
        struct(dollarsToCents($"price").as("gram")).as("weightPricing"))
        .as("locationProductDetails")).as("doc"))
    val out = doc.select(to_json($"doc")).as[String].collect().sorted
    assert(out(0) ==
      """{"id":3,"name":"OG Kush","category":"Sativa","locationProductDetails":{"active":true,"weightPricing":{"gram":1998}}}""")
    assert(out(1) ==
      """{"id":4,"name":"Grinder","category":"Gear","locationProductDetails":{"active":false,"weightPricing":{"gram":750}}}""")
  }

  test("docId is deterministic content hash (S6 unique-id semantics)") {
    val ids = memberDoc.select(Sinks.docId($"doc")).as[String].collect()
    val again = memberDoc.select(Sinks.docId($"doc")).as[String].collect()
    assert(ids.toSeq == again.toSeq && ids.distinct.size == 2)
  }
}
