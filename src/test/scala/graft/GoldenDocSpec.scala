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

  test("docId is deterministic content hash (S6 unique-id semantics)") {
    val ids = memberDoc.select(Sinks.docId($"doc")).as[String].collect()
    val again = memberDoc.select(Sinks.docId($"doc")).as[String].collect()
    assert(ids.toSeq == again.toSeq && ids.distinct.size == 2)
  }
}
