package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface
  * (builder brief; no reference counterpart — the reference is AR-only).
  * All are compositions of codegen'd built-ins over the `documents`
  * table's whitespace-tokenized text: no UDFs, so the whole analysis
  * stays inside whole-stage codegen and scales as a pure map over the
  * scan.
  */
object TextOps {

  /** Tiny English-ish stopword set present in the testdata vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a")

  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords: _*)))

  /** Occurrences of one exact token (language-ID marker counting). */
  def occurrences(text: Column, word: String): Column =
    size(filter(tokens(text), t => t === lit(word)))

  /** Distinct n-token shingles (1-based positions; <n tokens → empty).
    * The `when` guard matters: Spark's `sequence(1, 0)` would count DOWN.
    *
    * The outer single-element `transform` is a LET BINDING: it evaluates
    * the token split ONCE per row and exposes it as the lambda variable.
    * Inlining `split` directly would re-evaluate it for every
    * `element_at` in every shingle position (n × positions splits per
    * row — measured 10 s for the 8-gram decontamination scan at sf0.1;
    * 1.1 s with the binding), because common-subexpression elimination
    * does not reach inside lambda bodies.
    */
  def shingles(text: Column, n: Int = 3): Column =
    element_at(
      transform(array(tokens(text)), t =>
        array_distinct(
          when(size(t) >= n,
            transform(sequence(lit(1), size(t) - (n - 1)),
              i => concat_ws(" ",
                (0 until n).map(k => element_at(t, i + k)): _*)))
            .otherwise(array().cast("array<string>")))), 1)

  /** ALL n-token windows (stride 1, repeats kept — unlike [[shingles]],
    * which is distinct-per-doc). The non-distinct variant is what corpus
    * n-gram frequency counting needs: a phrase repeated inside one doc
    * counts every occurrence. Same single-element `transform` let
    * binding as [[shingles]] (CSE does not reach lambda bodies).
    */
  def ngramsAll(text: Column, n: Int): Column =
    element_at(
      transform(array(tokens(text)), t =>
        when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ",
              (0 until n).map(k => element_at(t, i + k)): _*)))
          .otherwise(array().cast("array<string>"))), 1)

  /** Shannon entropy of the doc's unigram distribution, in nats:
    * H = ln(n) − (Σ_t tf·ln(tf))/n over term frequencies tf. Low entropy
    * flags repetitive/templated text (the information-theoretic
    * complement of [[graft.operators.Curation.repetitionStats]]'s n-gram
    * ratios); high entropy ≈ diverse vocabulary.
    *
    * Determinism: the Σ folds term contributions in SORTED distinct-token
    * order via an explicit `aggregate` — the same sorted-fold idiom as
    * the k-means trainer. The result is rounded to 6 dp: Spark's log()
    * is StrictMath.log (fdlibm), which differs from DuckDB's libm ln in
    * the last ULP on ~2% of arguments (probed — Math.log happens to
    * MATCH libm here, but Spark doesn't call it), so raw ln surfaces
    * need the same 6-dp rounding as every other float surface.
    * The outer single-element `transform` is the usual
    * let binding (CSE does not reach lambda bodies). Per-row cost is
    * O(distinct · n) array scans — still a pure map over the scan, no
    * shuffle; the explode+groupBy alternative trades that for a corpus
    * shuffle keyed by (doc, token).
    */
  def tokenEntropy(text: Column): Column =
    element_at(
      transform(array(tokens(text)), t => {
        val n = size(t).cast("double")
        val s = aggregate(
          transform(array_sort(array_distinct(t)),
            d => size(filter(t, x => x === d)).cast("double")),
          lit(0.0), (a, f) => a + f * log(f))
        round(log(n) - s / n, 6)
      }), 1)

  /** Text normalization for dedup preprocessing: case-fold, strip
    * non-alphanumerics to spaces, collapse whitespace runs, trim — the
    * standard canonicalization applied before exact/near dedup so that
    * punctuation and casing variants collapse to one key. Pure codegen'd
    * regex chain; the DuckDB twin is the same two regexp_replace calls
    * with the 'g' flag.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** BPE-ish token count: maximal letter runs and digit runs, the shape a
    * byte-pair pre-tokenizer produces — counted with a codegen'd regex,
    * no tokenizer library in the loop.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0)))

  /** Polynomial rolling hash over characters (base 131 mod 1e9+7) — the
    * classic document-fingerprint primitive, as a pure fold so any engine
    * with a list-reduce reproduces it (the DuckDB oracle does).
    */
  def rollingHash(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => (h * 131L + ascii(c)) % 1000000007L)

  /** Exact-dup fingerprint: md5 hex (lowercase in Spark and DuckDB). */
  def fingerprintMd5(text: Column): Column = md5(text.cast("binary"))

  /** 60-bit integer fingerprint: first 15 hex digits of md5 → BIGINT.
    * Chosen over xxhash64 because it is reproducible in any engine with
    * md5 — the differential oracle needs cross-engine agreement.
    */
  def fingerprint64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Winnowing fingerprints (the MOSS local-fingerprinting scheme,
    * simplified to min-per-window): hash every k-gram IN ORDER
    * (non-distinct — position matters), slide a w-hash window over the
    * stream, keep each window's minimum hash, distinct the kept set.
    * Guarantees: any shared run of ≥ k+w−1 tokens between two docs
    * yields at least one SHARED fingerprint, while each doc keeps only
    * ~1/w of its hashes — the sub-quadratic robust alternative to
    * comparing full shingle sets, and the standard plagiarism/near-dup
    * index key. Shorter-than-w hash streams keep their single minimum
    * (the scheme's at-least-one-fingerprint guarantee); <k tokens →
    * empty.
    *
    * Same md5-derived hashes and pure array expressions as everything
    * else in this file: no shuffle, fully codegen'd, DuckDB-replicable.
    * The single-element `transform`s are let bindings (see [[shingles]]
    * — CSE does not reach lambda bodies).
    */
  def winnow(text: Column, k: Int = 3, w: Int = 4): Column =
    element_at(
      transform(array(transform(ngramsAll(text, k), g => fingerprint64(g))),
        hs =>
          when(size(hs) >= w,
            array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
              i => array_min(slice(hs, i, lit(w))))))
            .when(size(hs) > 0, array(array_min(hs)))
            .otherwise(array().cast("array<long>"))), 1)

  /** Feature-hashing ("hashing trick") vectorizer: text → a dense
    * `dim`-wide signed-count vector, v[j] = Σ over token occurrences
    * with bucket(t) = j of sign(t) — the Weinberger et al. '09 scheme
    * that turns raw text into a fixed-width feature vector with NO
    * vocabulary table (the bridge from the text surface to the
    * knn/quantizer family without an embedding model in the loop).
    * Bucket and sign come from independent md5 salts, so the vector is
    * a pure integer function of the text — exactly reproducible in the
    * oracle, no float anywhere.
    *
    * The inner single-element `transform` is the usual let binding: the
    * per-token (bucket, sign) pairs are hashed ONCE and reused across
    * all `dim` output positions (CSE does not reach lambda bodies);
    * per-row cost is O(tokens) hashes + O(dim·tokens) integer adds —
    * a pure map over the scan, no shuffle.
    */
  def hashVector(text: Column, dim: Int = 32): Column =
    element_at(
      transform(array(transform(tokens(text), tok => struct(
          pmod(fingerprint64(concat(tok, lit(":fh"))), lit(dim.toLong))
            .as("i"),
          when(pmod(fingerprint64(concat(tok, lit(":fs"))), lit(2L)) === 1,
            lit(1L)).otherwise(lit(-1L)).as("s")))),
        hs => transform(sequence(lit(0), lit(dim - 1)),
          j => aggregate(hs, lit(0L),
            (a, h) => a + when(h.getField("i") === j, h.getField("s"))
              .otherwise(lit(0L))))), 1)

  /** Native fused form of [[winnow]] (graft.expressions
    * .WinnowFingerprints): one loop, one reused MessageDigest, no
    * intermediate Catalyst arrays — bit-identical output, spec-gated.
    * Requires GraftExtensions on the session; [[winnow]] stays as the
    * no-extensions fallback and cross-check anchor.
    */
  def winnowNative(text: Column, k: Int = 3, w: Int = 4): Column =
    call_function("graft_winnow", text, lit(k), lit(w))

  /** Native fused form of [[hashVector]] (graft.expressions.HashVector):
    * one O(tokens) pass instead of O(dim·tokens) lambda folds —
    * bit-identical output, spec-gated, same fallback story as
    * [[winnowNative]].
    */
  def hashVectorNative(text: Column, dim: Int = 32): Column =
    call_function("graft_hash_vector", text, lit(dim))
}
