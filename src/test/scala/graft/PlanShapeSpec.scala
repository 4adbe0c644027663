package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Physical-plan shape guards for the scale-critical operators: these
  * assert the ABSENCE of the degenerate strategies (cartesian products,
  * nested-loop joins, unexpected join nodes) that a refactor could
  * silently reintroduce while every value-level test stays green. */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def phys(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin compiles to window-over-union: no join operator at all") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7L))
      .toDF("k", "ts", "payload")
    val left = Seq((1L, ts("2024-01-01 11:00:00"), 1L))
      .toDF("k", "ts", "event_id")
    val p = phys(GraftOps.asofJoin(left, right, "k", "ts", Seq("payload")))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
  }

  test("minhash candidate pairs plan has no cartesian and no self-join") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w"))
      .toDF("doc_id", "text")
    val p = phys(GraftOps.minhashCandidatePairs(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"pairs must be bucket-local:\n$p")
  }

  test("candidatePairsFromBands bucket-cap window shares the bucket " +
      "groupBy's exchange: no extra shuffle, no pre-count join") {
    val bands = Seq((1L, 0, "A"), (2L, 0, "A"), (3L, 1, "B"))
      .toDF("doc_id", "band_idx", "band_hash")
    val p = phys(GraftOps.candidatePairsFromBands(bands, "doc_id"))
    assert(p.contains("Window"), s"bucket-size count must be a window:\n$p")
    assert(!p.contains("Join"),
      s"cap must not re-join a pre-counted hot set (double compute):\n$p")
    // Exactly two hashpartitioning exchanges end-to-end: one shuffling
    // the band table by its bucket key (shared by the count window AND
    // the collect groupBy via subset-clustering reuse), one for the
    // final pair distinct. A third would mean the salt column broke
    // partitioning reuse.
    val n = "Exchange hashpartitioning".r.findAllMatchIn(p).size
    assert(n == 2, s"expected 2 exchanges, found $n:\n$p")
  }

  test("cappedKeyPairCounts: the self-join key always carries the salt " +
      "column — no raw-key equi-join, no nested loops") {
    val rows = Seq((1L, "A"), (2L, "A"), (3L, "B"))
      .toDF("media_id", "fhash")
    val p = phys(GraftOps.cappedKeyPairCounts(rows, "fhash", "media_id"))
    // The salt window runs upstream of the helper's internal eager
    // localCheckpoint (one materialization feeds both join sides), so
    // it is not visible in this plan; the __sub requirement on every
    // bucket-key join is the load-bearing assertion.
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    // Any join on the content key must be salted: the (key, __sub)
    // composite is what bounds a hot bucket to cap² pairs.
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.nonEmpty, s"pair join missing:\n$p")
    assert(joinLines.exists(l => l.contains("__sub")),
      s"pair join lost its salt key:\n$p")
    assert(joinLines.forall(l =>
        !l.contains("fhash") || l.contains("__sub")),
      s"join keyed on the raw key without its salt:\n" +
        joinLines.mkString("\n"))
  }

  test("dedup_first_in_horizon and mm_frame_dedup route pairs through " +
      "the capped generators: no join keyed on an unsalted band/frame " +
      "hash") {
    // The r12 regression shape: a raw equi-join on the band (or frame
    // content) hash emits |bucket|² rows before any filter — one hot
    // hash goes quadratic at 100 TB. Any join carrying the bucket key
    // (band or frame hash) must also carry the __sub salt — the cap
    // that bounds a hot bucket to cap² pairs.
    for (name <- Seq("dedup_first_in_horizon", "mm_frame_dedup")) {
      val p = phys(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      val joinLines = p.linesIterator
        .filter(l => l.contains("Join")).toSeq
      val bucketJoins = joinLines
        .filter(l => l.contains("band_hash") || l.contains("fhash"))
      // The salt in the join key IS the cap; dedup_first_in_horizon's
      // count window runs upstream of an eager localCheckpoint so it
      // is not visible in this plan — the __sub requirement on every
      // bucket-key join is the load-bearing assertion.
      assert(bucketJoins.nonEmpty,
        s"$name: expected a salted bucket-key join:\n$p")
      assert(bucketJoins.forall(_.contains("__sub")),
        s"$name: a join is keyed on the unsalted bucket hash:\n" +
          joinLines.mkString("\n"))
    }
  }

  test("the r14 pair paths carry the salt too: image bands, audio " +
      "signatures, and the event-time horizon gate") {
    // Same invariant as above for the three round-14 generators: the
    // image aHash band key (bkey), the audio signature key (sig), and
    // the ts-horizon band key must never appear in a join without the
    // __sub salt riding along.
    val cases = Seq(
      ("mm_image_dedup", Seq("bkey")),
      ("mm_audio_dedup", Seq("sig")),
      ("dedup_first_in_horizon_ts", Seq("band_hash")))
    for ((name, keys) <- cases) {
      val p = phys(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      val joinLines = p.linesIterator
        .filter(l => l.contains("Join")).toSeq
      val bucketJoins = joinLines
        .filter(l => keys.exists(l.contains))
      assert(bucketJoins.nonEmpty,
        s"$name: expected a salted bucket-key join:\n$p")
      assert(bucketJoins.forall(_.contains("__sub")),
        s"$name: a join is keyed on the unsalted bucket key:\n" +
          joinLines.mkString("\n"))
    }
  }

  test("dedup_ppjoin_g: global exact-threshold join plans equi-joins " +
      "only — no cartesian, no nested loop, set collapse upstream") {
    // The unscoped ≥0.95 entry (r14 VERDICT item 7): every join in the
    // candidate/verify/expansion tree must key on term, setid, or the
    // pair ids — a refactor that loses a join key degenerates to a
    // nested loop over the corpus and this guard is what catches it.
    val p = phys(SparkEntry.queries("dedup_ppjoin_g")(
      spark, "/root/testdata/sf0.001"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("interval join binning avoids nested-loop strategies") {
    val q = SparkEntry.queries("j12_range_join")(
      spark, "/root/testdata/sf0.001")
    val p = phys(q)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"inequality-only join would plan BNLJ:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("substringSpans: bucket-local pairs, no self-join, no cartesian") {
    val docs = Seq((1L, (1 to 20).map("t" + _).mkString(" ")),
      (2L, (5 to 24).map("t" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val p = phys(GraftOps.substringSpans(docs, "doc_id", "text"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"pair generation must be in-bucket combinations, not a self-join:\n$p")
  }

  test("bloomPrefilterJoin probe side: one single-row broadcast, no " +
      "probe-side shuffle before the exact join") {
    val probe = (1 to 200).map(i => (i.toLong % 50, s"p$i")).toDF("k", "pv")
    val build = Seq((3L, "b3"), (7L, "b7")).toDF("bk", "bv")
    val p = phys(graft.operators.ScaleOps
      .bloomPrefilterJoin(probe, "k", build, "bk"))
    // The filter is ONE broadcast row (word→bits map) crossed with the
    // probe — a nested-loop over exactly one row, NOT hash joins per
    // seed, and no Exchange may sit between the probe scan and the
    // exact join (the whole point: only bloom survivors reach a join).
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"probe side must not shuffle before the exact join:\n$p")
    assert(p.contains("map_from_entries") || p.contains("xxhash64"), p)
  }

  test("decontaminate broadcasts the benchmark side") {
    val docs = Seq((1L, "a b c d e f g h i"), (20L, "a b c d e f g h i"))
      .toDF("doc_id", "text")
    val p = phys(GraftOps.decontaminate(
      docs.filter($"doc_id" =!= 20L), docs.filter($"doc_id" === 20L),
      "doc_id", "text", 8))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ev_rfm's repeated per-user subtree is deduplicated at runtime " +
      "by AQE exchange reuse — the events scan does not multiply") {
    // ev_rfm deliberately does NOT materialize its shared `rfm` table
    // (both cuts measured slower; Scaladoc records the A/B). The scale
    // safety claim is that AQE replaces the identical repeated
    // exchanges with ReusedExchange at execution — assert it on the
    // EXECUTED plan, where adaptive reuse is visible (the static plan
    // shows the naive duplication).
    val df = SparkEntry.queries("ev_rfm")(spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange"),
      s"executed plan must reuse the shared per-user exchange:\n" +
        p.linesIterator.take(60).mkString("\n"))
  }

  test("txt_ngram_novelty first-owner is a partial-aggregable min on " +
      "the gram key — no raw-gram window partition anywhere in the plan") {
    // A Window.partitionBy(g) forces every row of a hot gram into one
    // task (no partial aggregation path exists for windows); the
    // aggregate form map-side-combines a ubiquitous gram to <=1 row
    // per map task. Assert the skew-prone shape cannot come back.
    val q = SparkEntry.queries("txt_ngram_novelty")(
      spark, "/root/testdata/sf0.001")
    val p = phys(q)
    assert(!p.contains("Window"),
      s"first-owner must be an aggregate, not a raw-gram window:\n$p")
    assert(p.contains("partial_min"),
      s"gram min must run map-side (partial_min) pre-shuffle:\n$p")
  }

  test("per-stratum rank<=k sampling gets WindowGroupLimit: each map " +
      "partition pre-truncates to k before the exchange") {
    // The samp_reservoir shape: rank inside stratum by a frozen hash
    // order, keep rank <= k. Catalyst must rewrite the filtered
    // row_number into WindowGroupLimit (partial mode runs BEFORE the
    // shuffle) — that rewrite is the 100 TB contract: without it the
    // exchange carries the whole corpus instead of <= k rows per
    // stratum per input partition.
    import org.apache.spark.sql.expressions.Window
    val docs = (1 to 300).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val w = Window.partitionBy("source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    val p = phys(docs
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter($"pick_rank" <= 20))
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k must plan a WindowGroupLimit:\n$p")
    assert(p.contains("Partial"),
      s"the group-limit must run map-side (Partial) pre-shuffle:\n$p")
  }
}
