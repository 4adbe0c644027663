package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis layer for the LLM-data-pipeline extensions (north star:
  * dedup, language-ID, quality scoring, token counting, fingerprinting over
  * the `documents` table). Everything is a pure, codegen-friendly Column
  * expression — no UDFs — so whole-stage codegen keeps the hot path fused
  * at 100 TB scale. Hashes are md5 hex strings (identical in Spark and
  * DuckDB), which makes every operator oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokenization; empty tokens dropped so "" → []. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: whitespace tokens further split
    * on letter/digit/punct boundaries (a cheap stand-in for a real BPE
    * vocab; deterministic + SQL-expressible). */
  def subwordCount(text: Column): Column =
    size(filter(split(trim(text), "[^A-Za-z0-9]+"), t => t =!= ""))

  /** Frozen hashed-feature weight of one token in integer MILLI-units —
    * the txt_classifier_score model (md5-prefix bucket in a 2^16
    * feature space, Knuth-multiplier weight in [-1000, 1000]). */
  def classifierWeightMilli(term: Column): Column =
    (conv(substring(md5(term), 1, 4), 16, 10).cast("long")
      * lit(2654435761L)) % lit(2001L) - lit(1000L)

  /** ROW-LOCAL classifier margin in integer MICRO-units (null when the
    * text has no tokens): one aggregate over the token array — zero
    * shuffle, stream-safe (no explode/groupBy), bit-identical to the
    * grouped formulation because both sum the same integer weights.
    * Margin quantization: wsum·1000/n is correctly-rounded IEEE
    * division whose decimal ties (x.5) are exactly representable, and
    * both engines round ties away from zero — so round(·, 0) is
    * cross-engine bitwise where round(wsum/1000.0/n, 6) double-rounds
    * (parity run caught doc 420: -0.1450375 split across engines). */
  def classifierMarginMicro(text: Column): Column = {
    val toks = tokens(text)
    val wsum = aggregate(toks, lit(0L),
      (acc, t) => acc + classifierWeightMilli(t))
    when(size(toks) > 0,
      round((wsum * 1000L).cast("double") / size(toks), 0).cast("long"))
  }

  /** Word n-gram shingles from a token array; [] when fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature as k lexicographic minima of md5-hex slices: two
    * md5 digests per shingle (plain + "8:"-seeded) cut into four 8-hex
    * (32-bit) slices each → 8 hash functions for 2 digest computations.
    * Using hex *substrings* as hash values keeps Spark and the DuckDB
    * oracle bit-identical (no integer-overflow semantics to reconcile).
    * Empty shingle sets get the seed-only digest slices so empty docs
    * collide with each other, never with real docs.
    * (TextOps.signatures is the fan-out formulation of the same function —
    * explode + min() aggregate — used by the registered queries so each
    * digest is computed exactly once per shingle.) */
  def minhashSlice(digest: Column, j: Int): Column =
    substring(digest, (j % 4) * 8 + 1, 8)

  def minhashSig(shingleCol: Column, numHashes: Int): Column = {
    require(numHashes <= 8, "slice scheme yields at most 8 hashes")
    array((0 until numHashes).map { j =>
      val prefix = if (j < 4) "" else "8:"
      coalesce(
        array_min(transform(shingleCol,
          s => minhashSlice(md5(concat(lit(prefix), s)), j))),
        minhashSlice(md5(lit(prefix)), j))
    }: _*)
  }

  /** LSH band keys: adjacent pairs of signature entries hashed together.
    * rows-per-band = 2 → bands = numHashes/2. Candidate pairs are generated
    * ONLY within a (band_idx, band_hash) bucket — never all-pairs — which is
    * the property that keeps near-dedup tractable at 100 TB. */
  def lshBands(sig: Column, numHashes: Int): Column =
    array((0 until numHashes / 2).map { b =>
      struct(lit(b).as("band_idx"),
        md5(concat_ws("|", element_at(sig, 2 * b + 1),
          element_at(sig, 2 * b + 2))).as("band_hash"))
    }: _*)

  /** Count of punctuation chars (quality-scoring feature). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Tokens found in `stops` (stopword-ratio feature / language evidence). */
  def stopwordHits(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops: _*)))

  /** Tiny per-language stopword profiles for the heuristic language-ID.
    * Real deployments swap in char-trigram profiles; the shape (N counters
    * → argmax) is the same and stays a single codegen'd projection. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "ein"))

  /** Heuristic language-ID: argmax of stopword hits, ties → first profile
    * order (en, es, de), zero evidence → "und" (undetermined). */
  def langId(toks: Column): Column = {
    val scores = LangProfiles.map { case (lang, stops) =>
      lang -> stopwordHits(toks, stops)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, "und")) { case (acc, (lang, s)) =>
      acc.when(s === best, lang)
    }
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text (content-defined identity for exact dedup). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(lower(text))))

  /** 64-bit SimHash as a 16-hex-char string. Per token, md5's first 16 hex
    * chars supply 64 bits; each bit contributes +1/-1; the sign of the per-
    * bit sum forms the output bit. Columnar (explode-free) formulation:
    * fold over the token array per bit-nibble would explode expression size,
    * so callers use the exploded groupBy form in queries — this helper maps
    * a token to its 16-nibble md5 prefix. */
  def tokenHashPrefix(tok: Column): Column = substring(md5(tok), 1, 16)
}
