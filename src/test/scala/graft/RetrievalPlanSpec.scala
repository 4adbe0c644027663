package graft

import org.apache.spark.sql.functions._

/** Invariants of the r14 retrieval/planning batch that the DuckDB
  * oracle can't express as hash equality (the oracle pins the VALUES;
  * these pin the CONTRACTS the values must satisfy on any corpus).  */
class RetrievalPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("rag_hybrid_rrf: fused list is rrf-descending, at most 20 rows, " +
      "and every doc carries at least one source rank") {
    val rows = queries.Similarity.queries("rag_hybrid_rrf")(spark, sf)
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .select("doc_id", "lex_rnk", "sem_rnk", "rrf_micro")
      .collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(r => !r.isNullAt(1) || !r.isNullAt(2)))
    // A doc on BOTH lists at the best ranks must beat any single-list
    // doc: 1/(60+1)+1/(60+50) > 1/(60+1).
    val both = rows.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = rows.filter(r => r.isNullAt(1) || r.isNullAt(2))
    if (both.nonEmpty && single.nonEmpty) {
      val bestBoth = both.map(_.getLong(3)).max
      assert(bestBoth > single.map(_.getLong(3)).min)
    }
  }

  test("emb_bitext_mine: margin >= 1 by construction (top1 is the max " +
      "of the averaged set) and keep == margin >= 1.05") {
    val rows = queries.Similarity.queries("emb_bitext_mine")(spark, sf)
      .select("lang", "margin", "keep").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != "en")
      val m = r.getDouble(1)
      assert(m >= 1.0, s"ratio margin below 1: $m")
      assert(r.getBoolean(2) == (m >= 1.05))
    }
  }

  test("scale_range_bounds: 7 bounds, each within one date-bucket of " +
      "its row-balanced target") {
    val b = queries.Relational.queries("scale_range_bounds")(spark, sf)
      .select("bucket", "target_pos", "rows_through").collect()
      .sortBy(_.getLong(0))
    assert(b.map(_.getLong(0)).toSeq == (1L to 7L))
    val maxDate = Tables.orders(spark, sf)
      .groupBy("o_orderdate").count().agg(max("count")).head.getLong(0)
    b.foreach { r =>
      val over = r.getLong(2) - r.getLong(1)
      assert(over >= 0 && over < maxDate,
        s"bucket ${r.getLong(0)}: cum ${r.getLong(2)} vs target " +
          s"${r.getLong(1)} exceeds one-date slack $maxDate")
    }
  }

  test("mm_av_sync: every frame lands in a window; silence implies a " +
      "NULL segment and voiced implies a segment id") {
    val rows = queries.TextOps.queries("mm_av_sync")(spark, sf)
      .select("window_idx", "segment_id", "voiced").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.isNullAt(0), "frame with no matched audio window")
      if (r.getBoolean(2)) assert(!r.isNullAt(1))
      else assert(r.isNullAt(1))
    }
  }

  test("ev_disorder_report: quantiles are ordered and bounded by the max") {
    val r = queries.EventOps.queries("ev_disorder_report")(spark, sf).head()
    val share = r.getAs[Double]("late_share")
    assert(share >= 0.0 && share <= 1.0)
    val p50 = r.getAs[Double]("p50_ms")
    val p95 = r.getAs[Double]("p95_ms")
    val p99 = r.getAs[Double]("p99_ms")
    val mx = r.getAs[Long]("max_late_ms").toDouble
    assert(p50 <= p95 && p95 <= p99)
    // max_late_ms is integer-truncated, so allow < 1ms slack
    assert(p99 <= mx + 1.0)
  }

  test("samp_epoch_plan: epochs capped at 4, planned shares sum to ~1") {
    val rows = queries.TextOps.queries("samp_epoch_plan")(spark, sf)
      .select("epochs", "planned_share").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(0) <= 4.0))
    val tot = rows.map(_.getDouble(1)).sum
    assert(math.abs(tot - 1.0) < 1e-4, s"shares sum to $tot")
  }
}
