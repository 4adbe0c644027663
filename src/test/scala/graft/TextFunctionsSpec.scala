package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empties; empty text → []") {
    val out = Seq("a  b c", "", "   ").toDF("t")
      .select(tokens($"t")).as[Seq[String]].collect()
    assert(out.toSeq == Seq(Seq("a", "b", "c"), Nil, Nil))
  }

  test("shingles: fewer than n tokens → empty; overlapping 3-grams") {
    val out = Seq("a b c d", "a b").toDF("t")
      .select(shingles(tokens($"t"), 3)).as[Seq[String]].collect()
    assert(out.toSeq == Seq(Seq("a b c", "b c d"), Nil))
  }

  test("minhashSig: identical docs share signatures; empty docs collide") {
    val df = Seq("x y z w", "x y z w", "", "").toDF("t")
      .select(minhashSig(shingles(tokens($"t"), 3), 8).as("sig"))
    val sigs = df.as[Seq[String]].collect()
    assert(sigs(0) == sigs(1) && sigs(2) == sigs(3))
    assert(sigs(0) != sigs(2) && sigs.forall(_.size == 8))
  }

  test("langId: stopword argmax with und fallback") {
    val out = Seq("the cat of the hat", "el que de la", "der und das ist",
      "zzz qqq").toDF("t")
      .select(langId(tokens($"t"))).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("fingerprint is case/whitespace-normalized") {
    val out = Seq("Hello  World", "hello world", "helloworld").toDF("t")
      .select(fingerprint($"t")).as[String].collect()
    assert(out(0) == out(1) && out(0) != out(2))
  }

  test("lshBands: equal signatures → equal band hashes (bucketing key)") {
    val df = Seq("p q r s t", "p q r s t").toDF("t")
      .select(explode(lshBands(minhashSig(shingles(tokens($"t"), 3), 8), 8))
        .as("b"))
      .select($"b.band_idx", $"b.band_hash")
    val bands = df.as[(Int, String)].collect().toSeq
    assert(bands.size == 8 && bands.distinct.size == 4)
  }

  test("scrubPii redacts phones/emails/IPs, counts on raw text, " +
      "leaves clean text untouched") {
    val docs = Seq(
      (1L, "call 55-123-456-7890 or mail a.b+c@ex-1.example.org now"),
      (2L, "host 192.168.0.1 and 10.0.0.255 up"),
      (3L, "no pii here, just words and 1234 numbers"))
      .toDF("id", "text")
    val out = graft.api.GraftOps.scrubPii(docs, "id", "text")
      .as[(Long, String, Long, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(out(0) ==
      ((1L, "call [PHONE] or mail [EMAIL] now", 1L, 1L, 0L)))
    assert(out(1) == ((2L, "host [IP] and [IP] up", 0L, 0L, 2L)))
    assert(out(2) ==
      ((3L, "no pii here, just words and 1234 numbers", 0L, 0L, 0L)))
  }

  test("canonicalizeUrl: case, default ports, trailing slash, tracking " +
      "params, param order, fragments") {
    val cases = Seq(
      // scheme+host lowercase, :80 stripped for http, path case KEPT
      "HTTP://WWW.Ex.COM:80/Page/1?id=2" ->
        "http://www.ex.com/Page/1?id=2",
      // :443 stripped only for https; :8080 never stripped
      "https://ex.com:443/a" -> "https://ex.com/a",
      "http://ex.com:8080/a" -> "http://ex.com:8080/a",
      "https://ex.com:80/a" -> "https://ex.com:80/a",
      // trailing slashes collapse; bare root collapses to host-only
      "http://ex.com/a/b///" -> "http://ex.com/a/b",
      "http://ex.com/" -> "http://ex.com",
      // tracking stripped wherever it sits; survivors sorted
      "http://ex.com/p?utm_source=x&b=2&a=1&gclid=99#sec" ->
        "http://ex.com/p?a=1&b=2",
      "http://ex.com/p?fbclid=zz" -> "http://ex.com/p",
      // a param NAMED like a prefix of a tracker is kept
      "http://ex.com/p?utm=keep&fbclid2=keep" ->
        "http://ex.com/p?fbclid2=keep&utm=keep",
      // non-hierarchical forms pass through UNCHANGED — collapsing
      // them to a shared "://" would merge unrelated docs in dedup
      "example.com/a?utm_source=x" -> "example.com/a?utm_source=x",
      "mailto:User@Ex.COM" -> "mailto:User@Ex.COM",
      "//host/protocol-relative" -> "//host/protocol-relative")
    val got = cases.map(_._1).toDF("url")
      .select(graft.api.GraftOps.canonicalizeUrl($"url")).as[String]
      .collect().toSeq
    got.zip(cases).foreach { case (g, (in, want)) =>
      assert(g == want, s"canonicalizeUrl($in) = $g, want $want")
    }
  }

  test("txt_classifier_score: margin matches an independent JVM replay " +
      "of the hashing trick; keep == margin > 0; margin bounded") {
    val d = "/root/testdata/sf0.001"
    val out = graft.queries.TextOps.queries("txt_classifier_score")(
        spark, d)
      .select($"doc_id", $"n_tokens", $"margin", $"keep")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, m, k) =>
      assert(n > 0 && m >= -1.0 && m <= 1.0 && k == (m > 0))
    }
    // Independent replay: MessageDigest md5 + the integer milli-weight
    // formula + HALF_UP micro-quantization — none of the Spark
    // expression chain, so a silent change to either side breaks here.
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(term: String): Long = {
      md.reset()
      val hex = md.digest(term.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val b = java.lang.Long.parseLong(hex.substring(0, 4), 16)
      (b * 2654435761L) % 2001L - 1000L
    }
    val expect = graft.Tables.documents(spark, d)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val toks = Option(text).getOrElse("").trim
          .split("\\s+").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else {
          val wsum = toks.map(weight).sum
          val micro = new java.math.BigDecimal(wsum * 1000.0 / toks.length)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue
          Some(id -> ((toks.length.toLong, micro / 1000000.0)))
        }
      }.toMap
    assert(out.length == expect.size)
    out.foreach { case (id, n, m, _) =>
      val (en, em) = expect(id)
      assert(n == en && m == em, s"doc $id: got ($n, $m), want ($en, $em)")
    }
  }

  test("tok_fertility: 4-char-chunk replay per language; fertility > 1 " +
      "and sensitive to word length") {
    val d = "/root/testdata/sf0.001"
    val got = graft.queries.TextOps.queries("tok_fertility")(spark, d)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = graft.Tables.documents(spark, d)
      .select(coalesce($"lang", lit("")), $"text").as[(String, String)]
      .collect()
    val expect = docs.groupBy(_._1).map { case (lang, rows) =>
      val words = rows.flatMap(_._2.trim.split("\\s+").filter(_.nonEmpty))
      lang -> ((rows.length.toLong, words.length.toLong,
        words.map(w => (w.length + 3L) / 4L).sum))
    }
    expect.foreach { case (lang, (nd, nw, ns)) =>
      if (nw > 0) {
        val (_, gd, gw, gs, fert) = got(lang)
        assert(gd == nd && gw == nw && gs == ns, s"lang $lang counts")
        val micro = new java.math.BigDecimal(ns * 1000.0 / nw)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
        assert(fert == micro / 1000.0, s"lang $lang fertility")
        assert(fert > 1.0, s"lang $lang fertility degenerate")
      }
    }
  }

  test("txt_perplexity_bucket: four buckets cover all scored docs with " +
      "near-quartile counts and monotone mean NLL") {
    val rows = graft.queries.TextOps.queries("txt_perplexity_bucket")(
        spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    val n = rows.map(_._2).sum
    // quartile cuts: no bucket may hold more than half or be empty
    rows.foreach { case (b, c, _) =>
      assert(c > 0 && c <= n / 2 + 1, s"bucket $b count $c of $n")
    }
    val means = rows.map(_._3).toSeq
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      "mean NLL must be monotone across buckets")
  }
}
