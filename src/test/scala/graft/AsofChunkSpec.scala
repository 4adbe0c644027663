package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.api.GraftOps

/** Unit fixtures for the round-4 operators: as-of join semantics
  * (inclusive match, no-predecessor null, per-key isolation), range-join
  * bin coverage, chunking boundaries, int8 quantization rounding, and
  * the distributed global-rank used by shuf_deterministic/w4_ntile. */
class AsofChunkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoin picks latest at-or-before per key, null when none") {
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 10:30:00"), 200L))
      .toDF("user_id", "ts", "click_id")
    val left = Seq(
      (1L, ts("2024-01-01 10:30:00"), 10L), // between the two clicks
      (1L, ts("2024-01-01 11:00:00"), 11L), // exactly at click 101 (tie)
      (2L, ts("2024-01-01 10:00:00"), 20L), // before any click for key 2
      (3L, ts("2024-01-01 12:00:00"), 30L)) // key with no clicks at all
      .toDF("user_id", "ts", "event_id")
    val out = GraftOps.asofJoin(left, right, "user_id", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(out(10L).contains(100L)) // strictly-before match
    assert(out(11L).contains(101L)) // tie is inclusive: same-ts right wins
    assert(out(20L).isEmpty)        // no predecessor
    assert(out(30L).isEmpty)        // key absent from right
  }

  test("asofJoin: matched row's genuine NULL payload survives; all " +
      "payloads come from the one matched row") {
    // Key 1: the LATEST right row (11:00) has a null v and a distinct tag.
    // A per-column last(ignoreNulls) would back-fill v=5 from 10:00 and
    // mix tags across rows; the struct-carry must return (null, "b").
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5L), "a"),
      (1L, ts("2024-01-01 11:00:00"), None, "b"))
      .toDF("user_id", "ts", "v", "tag")
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    val out = GraftOps.asofJoin(left, right, "user_id", "ts", Seq("v", "tag"))
      .select("asof_v", "asof_tag").as[(Option[Long], String)].collect()
    assert(out.toSeq == Seq((None, "b")),
      s"expected matched-row verbatim (null, b), got ${out.toSeq}")
  }

  test("asofJoin rejects payload/left column-name collisions clearly") {
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 5L))
      .toDF("user_id", "ts", "event_id") // collides with left's event_id
    val left = Seq((1L, ts("2024-01-01 12:00:00"), 10L))
      .toDF("user_id", "ts", "event_id")
    val e = intercept[IllegalArgumentException] {
      GraftOps.asofJoin(left, right, "user_id", "ts", Seq("event_id"))
    }
    assert(e.getMessage.contains("event_id"))

    // A chained as-of: the left already carries asof_v from a previous
    // join — the output alias collides and must fail fast too.
    val left2 = Seq((1L, ts("2024-01-01 12:00:00"), 9L))
      .toDF("user_id", "ts", "asof_v")
    val right2 = Seq((1L, ts("2024-01-01 10:00:00"), 5L))
      .toDF("user_id", "ts", "v")
    val e2 = intercept[IllegalArgumentException] {
      GraftOps.asofJoin(left2, right2, "user_id", "ts", Seq("v"))
    }
    assert(e2.getMessage.contains("asof_v"))
  }

  test("asofJoin does not leak matches across keys") {
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 1L))
      .toDF("user_id", "ts", "click_id")
    val left = Seq((2L, ts("2024-01-01 10:00:00"), 2L))
      .toDF("user_id", "ts", "event_id")
    val out = GraftOps.asofJoin(left, right, "user_id", "ts", Seq("click_id"))
    assert(out.count() == 1 && out.filter($"asof_click_id".isNull).count() == 1)
  }

  test("chunk_docs splits on exact 64-token boundaries") {
    // 130 tokens -> chunks of 64, 64, 2.
    val text = (1 to 130).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
    df.createOrReplaceTempView("chunk_fixture")
    val toks = split(trim($"text"), "\\s+")
    val out = df.select($"doc_id", toks.as("toks"),
        size(toks).cast("long").as("n"))
      .select($"doc_id", $"n",
        posexplode(transform(
          sequence(lit(0L), floor(($"n" - 1) / 64).cast("long")),
          i => array_join(slice($"toks", (i * 64 + 1).cast("int"), lit(64)),
            " "))).as(Seq("chunk_id", "chunk_text")))
      .select($"chunk_id".cast("long"),
        least(lit(64L), $"n" - $"chunk_id" * 64).as("n_tokens"),
        size(split($"chunk_text", " ")).cast("long").as("actual"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._2)).toSeq == Seq((0L, 64L), (1L, 64L), (2L, 2L)))
    assert(out.forall(r => r._2 == r._3)) // declared == actual token count
  }

  test("quantization reconstruction error respects the half-step bound") {
    // Each dimension's error is at most 0.5/scale, so
    // l2_err <= sqrt(dim) * 0.5/scale for any input vector.
    val rnd = new scala.util.Random(3)
    val vecs = (1L to 50L).map(i =>
      i -> Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val out = GraftOps.quantizeInt8(
      vecs.toDF("vec_id", "embedding")
        .select($"vec_id", transform($"embedding",
          x => x.cast("double")).as("v")),
      "vec_id", "v")
      .select("vec_id", "scale", "l2_err")
      .as[(Long, Double, Double)].collect()
    out.foreach { case (id, scale, err) =>
      assert(err <= math.sqrt(16) * 0.5 / scale + 1e-6,
        s"vec $id: err $err vs bound ${math.sqrt(16) * 0.5 / scale}")
    }
  }

  test("int8 quantization codes are bounded and round half away from zero") {
    val df = Seq((1L, Array(1.0f, -1.0f, 0.5f, -0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val v = transform($"embedding", x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val out = df.select($"vec_id", v.as("v"),
        when(mx > 0, lit(127.0) / mx).otherwise(lit(1.0)).as("scale"))
      .select(transform($"v", x =>
        (x * $"scale" + when(x >= 0, 0.5).otherwise(-0.5)).cast("long"))
        .as("codes"))
      .as[Seq[Long]].head()
    assert(out == Seq(127L, -127L, 64L, -64L, 0L)) // 63.5 rounds away -> 64
    assert(out.forall(c => c >= -127 && c <= 127))
  }

  test("asofJoin equals the naive per-row latest-lookup on random data") {
    // Differential test: 60 left rows × 40 right rows over 8 keys with
    // colliding timestamps; the distributed union-window formulation
    // must agree with a literal Scala reference implementation.
    val rnd = new scala.util.Random(42)
    val right = (0 until 40).map { i =>
      (rnd.nextInt(8).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong)
    }.distinct
    // Unique (key, ts) on the right — the operator's documented
    // determinism precondition.
    val rightU = right.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val left = (100 until 160).map { i =>
      (rnd.nextInt(10).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toLong)
    }
    val out = GraftOps.asofJoin(
      left.toDF("user_id", "ts", "event_id"),
      rightU.toDF("user_id", "ts", "click_id"),
      "user_id", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    val naive = left.map { case (k, t, id) =>
      val preceding = rightU.filter(r => r._1 == k && !r._2.after(t))
      id -> (if (preceding.isEmpty) None
             else Some(preceding.maxBy(r => (r._2.getTime, r._3))._3))
    }.toMap
    // maxBy tiebreak on click_id is irrelevant post-dedup (unique ts per
    // key) but keeps the reference total.
    assert(out == naive)
  }

  test("chunkTokens concatenation rebuilds the original token stream") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 30L).map { i =>
      i -> (0 until rnd.nextInt(200)).map(j => s"w$j").mkString(" ")
    }
    val out = GraftOps.chunkTokens(
      docs.toDF("doc_id", "text"), "doc_id", "text", 64)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_text")
      .as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).mkString(" ")).toMap
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      if (toks.isEmpty) assert(!out.contains(id)) // token-less: no chunks
      else assert(out(id) == toks, s"doc $id")
    }
  }

  test("distributed global rank matches single-partition row_number") {
    import org.apache.spark.sql.expressions.Window
    val docs = (1L to 500L).toDF("doc_id")
    val keyed = docs
      .select($"doc_id", md5($"doc_id".cast("string")).as("k"))
      .withColumn("bkt", conv(substring($"k", 1, 2), 16, 10).cast("int"))
    val wIn = Window.partitionBy("bkt").orderBy("k", "doc_id")
    val counts = keyed.groupBy("bkt").agg(count(lit(1)).as("cnt"))
    val wCum = Window.orderBy($"bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = counts.select($"bkt",
      coalesce(sum("cnt").over(wCum), lit(0L)).as("off"))
    val distributed = keyed.join(broadcast(offs), Seq("bkt"))
      .select($"doc_id", ($"off" + row_number().over(wIn)).as("pos"))
    val global = keyed.select($"doc_id",
      row_number().over(Window.orderBy("k", "doc_id")).cast("long").as("pos"))
    assert(distributed.except(global).count() == 0 &&
      global.except(distributed).count() == 0)
  }
}
