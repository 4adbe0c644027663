package graft

import org.apache.spark.sql.functions._

/** Pins the accuracy contract of agg_approx_distinct (which has no
  * DuckDB oracle — sketch estimates are engine-specific): HLL++ at rsd
  * 0.02 must land within 5 % of the exact distinct count, and the
  * estimate must be identical regardless of partitioning (HLL merges
  * are max-based, hence order-independent). */
class ApproxDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact and partition-invariant") {
    val df = (1 to 20000).map(i => (i % 7, i % 3001)).toDF("grp", "key")
    def run(parts: Int) =
      df.repartition(parts).groupBy("grp").agg(
        count_distinct($"key").as("exact_nd"),
        approx_count_distinct($"key", 0.02).as("approx_nd"))
        .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val r2 = run(2)
    val r16 = run(16)
    assert(r2 == r16) // merge-order invariance
    r2.values.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("hll_union_agg over per-day partial sketches equals the sketch " +
      "of the union (the sketch_hll_union rollup contract)") {
    // 30 days × overlapping user ranges: day d sees users [d*50, d*50+999]
    // → total distinct = 29*50 + 1000 = 2450.
    val rows = for (d <- 0 until 30; u <- 0 until 1000)
      yield (d, (d * 50 + u).toLong)
    val df = rows.toDF("day", "user_id")
    val merged = df.groupBy("day").agg(hll_sketch_agg($"user_id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("nd"))
      .as[Long].head()
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg($"user_id")))
      .as[Long].head()
    // Merging partials must be EXACTLY the single-pass sketch (HLL
    // register merge is a max — lossless), not merely close.
    assert(merged == direct, s"merged $merged vs direct $direct")
    assert(math.abs(merged - 2450).toDouble / 2450 < 0.05, s"nd=$merged")
  }
}
