package graft

import org.apache.spark.sql.functions._

/** Contract tests for the global PPJoin pair (r15 VERDICT item 3 +
  * ADVICE): `dedup_ppjoin_sets` is the set-level form and
  * `dedup_ppjoin_g` is exactly its expansion through the membership
  * table — sum(doc_pairs) at set level == doc-pair row count — and
  * token-EMPTY documents pair with nothing (their identical empty sets
  * must not surface as J=1.0 intra "pairs"; the naive shared-token
  * oracle emits no row for them, Jaccard 0/0 is not 1). */
class PpjoinSetsSpec extends SparkSpec {
  import spark.implicits._

  // Corpus engineered for all three row classes at t = 0.95:
  //  docs 1,3 — identical 39-token sets (one exact-dup clique),
  //  doc  2  — the 40-token superset (J = 39/40 = 0.975 vs the clique),
  //  docs 4,5 — token-empty (must be invisible to both queries),
  //  doc  6  — unrelated (must not pair).
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ppjoin-sets").toString
    val t39 = (1 to 39).map("tok" + _).mkString(" ")
    val t40 = (1 to 40).map("tok" + _).mkString(" ")
    Seq((1L, t39), (2L, t40), (3L, t39), (4L, ""), (5L, "   "),
      (6L, "alpha beta gamma"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_ppjoin_sets: one cross row, one clique row, nothing " +
      "for empty or unrelated docs") {
    val rows = SparkEntry.queries("dedup_ppjoin_sets")(spark, dir)
      .orderBy("set_a", "set_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(rows == Seq(
      (1L, 1L, 39L, 39L, 1.0, 2L, 2L, 1L),       // clique {1,3}
      (1L, 2L, 39L, 40L, 0.975, 2L, 1L, 2L)))    // {1,3} × {2}
  }

  test("dedup_ppjoin_g is the membership expansion of the set form: " +
      "sum(doc_pairs) == doc-pair row count, empty docs absent") {
    val pairs = SparkEntry.queries("dedup_ppjoin_g")(spark, dir)
    val got = pairs.select("left_id", "right_id", "jacc")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 3L, 1.0), (1L, 2L, 0.975), (2L, 3L, 0.975)))
    val declared = SparkEntry.queries("dedup_ppjoin_sets")(spark, dir)
      .agg(sum("doc_pairs")).as[Long].head()
    assert(declared == pairs.count(),
      "set-level doc_pairs must equal the expanded pair count")
  }
}
