package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between raw ingest and tokenization (builder brief; no reference
  * counterpart): benchmark decontamination, repetition-based quality
  * filtering, and tf-idf term extraction. Everything is a composition of
  * codegen'd built-ins — no UDFs — with integer or exactly-mirrorable
  * arithmetic so each operator carries a DuckDB differential.
  */
object Curation {

  /** Benchmark decontamination stats: for every training doc, the number
    * of DISTINCT n-token shingles it shares with the evaluation corpus.
    * A training doc overlapping an eval doc on even one long-enough
    * shingle is contaminated (the n-gram-overlap rule used by LLM data
    * pipelines; n≈8–13 tokens in practice).
    *
    * Plan: both sides explode to distinct shingles; the join is an
    * equi-join ON THE SHINGLE — the eval side is a benchmark suite
    * (thousands of docs), so its shingle set broadcasts, and the
    * training corpus streams map-side with no shuffle of the big side.
    * The aggregation shuffles only (doc_id, count) partials.
    */
  def contaminationStats(train: DataFrame, eval: DataFrame,
                         n: Int = 8): DataFrame = {
    val trainSh = train.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), n)).as("shingle"))
    val evalSh = eval
      .select(explode(TextOps.shingles(col("text"), n)).as("shingle"))
      .distinct()
    trainSh.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The clean corpus: training docs with NO shingle overlap with the
    * eval set (left_anti against the contaminated ids — one broadcast
    * join, the corpus never shuffles).
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    n: Int = 8): DataFrame =
    train.join(broadcast(contaminationStats(train, eval, n)
      .select(col("doc_id"))), Seq("doc_id"), "left_anti")

  /** Repetition-based quality stats (the Gopher-style filter family),
    * integer-exact: per doc, total/max-frequency token counts and
    * total/distinct bigram counts, plus the keep verdict —
    * keep iff the top token is ≤ 20% of all tokens
    * (5·max_token_n ≤ n_tokens) AND ≥ 60% of bigrams are distinct
    * (10·n_distinct_bigrams ≥ 6·n_bigrams). Fractions stay as integer
    * cross-multiplications so both engines agree exactly.
    *
    * Plan: one explode + (doc, token) count + per-doc max — shuffles
    * keyed by doc_id with map-side partials; the bigram stats are a pure
    * projection (array ops in codegen).
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val maxTok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as("max_token_n"))
    val bigrams = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      (TextOps.tokenCount(col("text")) - 1).as("n_bigrams"),
      size(TextOps.shingles(col("text"), 2)).as("n_distinct_bigrams"))
    bigrams.join(maxTok, Seq("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("max_token_n"),
        col("n_bigrams"), col("n_distinct_bigrams"),
        (col("max_token_n") * 5 <= col("n_tokens") &&
          col("n_distinct_bigrams") * 10 >= col("n_bigrams") * 6)
          .as("keep"))
  }

  /** Concat-and-chunk sequence packing — the standard LLM-training
    * batching step: per shard, documents are concatenated in doc_id
    * order and the stream is cut into fixed `seqLen`-token sequences;
    * each doc is tagged with its start offset and the sequence index it
    * begins in.
    *
    * The shard key (doc_id % shards) makes this scale-safe: the
    * cumulative-sum window partitions BY SHARD — bounded state, one
    * shuffle on the shard key, no global ordering anywhere. Shards pack
    * independently, which is also what a multi-worker data loader wants.
    */
  def packSequences(docs: DataFrame, seqLen: Int = 512,
                    shards: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .withColumn("start_offset",
        (sum(col("n_tokens")).over(w) - col("n_tokens")).cast("long"))
      .withColumn("seq_idx", floor(col("start_offset") / seqLen).cast("long"))
  }

  /** PACKING-EFFICIENCY AUDIT — the padding-waste comparison that
    * decides a batching strategy before any tokens move: pad-per-doc
    * (every document alone in ⌈n/L⌉ sequences, tail padded — the
    * fine-tuning default) vs concat-and-chunk per shard (the
    * [[packSequences]] layout, where only each shard's final sequence
    * pads). Emits (strategy, n_seqs, n_tokens, padded_tokens,
    * efficiency) — efficiency = real tokens / slot tokens, the number
    * that becomes wasted accelerator hours at training time.
    *
    * All-integer arithmetic (ceil as `(n + L−1) div L` integer
    * division, mirrored as `//` in the twin) until one final double
    * division rounded 6 dp. Scale shape: one corpus scan, one
    * |shards|-row aggregate — nothing data-sized ever shuffles except
    * the (doc → shard-total) partials.
    */
  def packEfficiency(docs: DataFrame, seqLen: Int = 512,
                     shards: Int = 32): DataFrame = {
    val t = docs.select(col("doc_id"),
      (col("doc_id") % shards).as("shard"),
      TextOps.tokenCount(col("text")).cast("long").as("n"))
    val perDoc = t.agg(
      sum(expr(s"(n + ${seqLen - 1}) div $seqLen")).as("n_seqs"),
      sum(col("n")).as("n_tokens"))
    val concat = t.groupBy(col("shard")).agg(sum(col("n")).as("tot"))
      .agg(sum(expr(s"(tot + ${seqLen - 1}) div $seqLen")).as("n_seqs"),
        sum(col("tot")).as("n_tokens"))
    def fin(df: DataFrame, name: String) =
      df.select(lit(name).as("strategy"), col("n_seqs"),
        col("n_tokens"),
        (col("n_seqs") * seqLen - col("n_tokens")).as("padded_tokens"),
        round(col("n_tokens").cast("double")
          / (col("n_seqs") * seqLen).cast("double"), 6).as("efficiency"))
    fin(perDoc, "pad_per_doc").unionByName(fin(concat, "concat_shard"))
  }

  /** Top-k tf-idf terms per document: tf = in-doc term count, df =
    * corpus document frequency, score = tf · ln(N / df) rounded to 6 dp
    * (probed: JVM Math.log and DuckDB ln are bit-identical on this
    * platform, including under the HotSpot intrinsic — see the oracle).
    * Ties rank by (score DESC, df ASC, token ASC), fully deterministic.
    *
    * Plan: one explode → (doc, token) counts; df is a token-keyed
    * aggregate of the same exploded frame — both shuffle once on their
    * key with map-side partials; N is a 1-row broadcast; the per-doc
    * top-k window partitions by doc_id (bounded state per key).
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
    val tf = tok.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, Seq("token")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("score"))
    scored
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("df").asc, col("token").asc)))
      .filter(col("rnk") <= k)
  }

  /** Classifier-style quality score — the model-based filtering shape
    * (fastText/logreg quality classifiers in web-corpus pipelines):
    * a linear model over extracted features, thresholded into a keep
    * verdict. The coefficients here are FIXED STAND-INS for trained
    * weights (the container trains nothing), chosen to reward length
    * and lexical diversity and penalize stopword stuffing — the real
    * pipeline swaps the constants for its model, the plumbing (feature
    * extraction → dense dot → threshold, all codegen'd per-row, no
    * shuffle) is the shipped part.
    *
    * Cross-engine exact: integer features, double ratios with mirrored
    * op order, and ln (probed bit-identical JVM↔DuckDB on the tfidf
    * path); score rounded to 6 dp like every float surface here.
    */
  def qualityScore(docs: DataFrame, threshold: Double = 1.4): DataFrame = {
    val nTok = TextOps.tokenCount(col("text")).cast("double")
    val nDis = TextOps.distinctTokenCount(col("text")).cast("double")
    val nStop = TextOps.stopwordCount(col("text")).cast("double")
    val score = round(
      lit(0.3) * log(nTok) +
        lit(2.0) * (nDis / nTok) -
        lit(1.5) * (nStop / nTok), 6)
    docs.select(col("doc_id"), score.as("q_score"),
      (score >= threshold).as("keep"))
  }

  /** Token-budget truncation: cap every document at `maxTokens`
    * whitespace tokens (the context-length guard applied before
    * packing). The text is ALWAYS rebuilt from the token slice — never
    * "original text if short" — so both engines canonicalize whitespace
    * identically and the output is a pure function of the token array.
    * Plan: a pure projection in whole-stage codegen, no shuffle.
    */
  def truncateTokens(docs: DataFrame, maxTokens: Int = 64): DataFrame =
    docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).as("n_tokens"),
      array_join(slice(TextOps.tokens(col("text")), 1, maxTokens), " ")
        .as("text_trunc"))
      .withColumn("truncated", col("n_tokens") > maxTokens)

  /** Cohort-style corpus top n-grams: total occurrences (repeats
    * COUNTED — ngramsAll, not the distinct shingles) of every `n`-token
    * window, keeping the top `k` under the total order
    * (count DESC, ngram ASC) — the deterministic tie-break makes the
    * cutoff set engine-independent.
    *
    * Plan: explode → keyed hash agg with map-side partials → global
    * top-k via TakeOrderedAndProject (each partition forwards only its
    * k best rows; no global sort, no single-partition window).
    */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame =
    docs.select(explode(TextOps.ngramsAll(col("text"), n)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram").asc)
      .limit(k)

  /** Gopher-style RULE-BASED quality filter (Rae et al. 2021 §A1.1
    * shape): hard per-document heuristics, each an integer-exact
    * predicate so the verdict carries a float-free differential —
    *
    *   r_len:   word count within [minTokens, maxTokens];
    *   r_meanw: mean word length within [3, 10] chars, compared as
    *            3·n ≤ Σlen ≤ 10·n (no division);
    *   r_alpha: ≥ 80% of words contain an alphabetic character
    *            (5·n_alpha ≥ 4·n);
    *   r_stop:  at least `minStopHits` stopword occurrences (Gopher's
    *            required-word rule).
    *
    * `pass` is the conjunction. Emitting each rule's verdict (not just
    * the AND) is deliberate: corpus curation wants per-rule rejection
    * rates to tune thresholds. Pure per-row codegen'd expressions — the
    * filter is a map over the scan, no shuffle at any scale.
    */
  def gopherRules(docs: DataFrame, minTokens: Int = 30,
                  maxTokens: Int = 100000,
                  minStopHits: Int = 2): DataFrame = {
    val t = TextOps.tokens(col("text"))
    val stats = docs.select(col("doc_id"),
      size(t).as("n_tokens"),
      aggregate(transform(t, length(_)), lit(0), _ + _).as("sum_len"),
      size(filter(t, x => x.rlike("[a-z]"))).as("n_alpha"),
      TextOps.stopwordCount(col("text")).as("n_stop"))
    stats
      .withColumn("r_len",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      .withColumn("r_meanw",
        col("sum_len") >= col("n_tokens") * 3 &&
          col("sum_len") <= col("n_tokens") * 10)
      .withColumn("r_alpha", col("n_alpha") * 5 >= col("n_tokens") * 4)
      .withColumn("r_stop", col("n_stop") >= minStopHits)
      .withColumn("pass",
        col("r_len") && col("r_meanw") && col("r_alpha") && col("r_stop"))
  }

  /** Overlapping-window CHUNKING — the retrieval/embedding prep step:
    * split each doc into `size`-token chunks starting every `stride`
    * tokens (stride < size ⇒ overlap = size − stride, so no boundary
    * sentence is ever cut from both sides). Chunk k covers tokens
    * [k·stride, k·stride + size); the final chunk truncates at the doc
    * end. Pure per-row array expressions over the token split — a map
    * over the scan, no shuffle; the explode multiplies rows by
    * ~n/stride, which is the output's actual size, not overhead.
    */
  def chunkOverlap(docs: DataFrame, size: Int = 32,
                   stride: Int = 24): DataFrame =
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), org.apache.spark.sql.functions.size(col("t")) - 1,
          lit(stride))).as("start"))
      .select(col("doc_id"), (col("start") / stride).cast("int").as("chunk_id"),
        array_join(slice(col("t"), col("start") + 1, lit(size)), " ")
          .as("chunk_text"),
        least(col("start") + size,
          org.apache.spark.sql.functions.size(col("t")))
          .minus(col("start")).as("n_tokens"))

  /** CONTRASTIVE (anchor, positive) pair prep — the dual-encoder
    * training shape: adjacent overlapping chunks of the SAME document
    * are positives (they share `size − stride` tokens — the standard
    * self-supervised positive without any labeler), every other pair
    * in the batch is an in-batch negative at training time, so the
    * data op only has to emit positives plus a deterministic
    * content-hash shuffle key (correlated neighbors must not land in
    * the same batch — hash order decorrelates without RNG).
    *
    * Scale shape: [[chunkOverlap]]'s shuffle-free chunk stream, then
    * ONE self equi-join on (doc_id, chunk_id+1) — keyed, never
    * cross-doc. The shuffle key is a pure projection.
    */
  def contrastivePairs(docs: DataFrame, size: Int = 32,
                       stride: Int = 24): DataFrame = {
    val ch = chunkOverlap(docs, size, stride)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
    ch.select(col("doc_id"), col("chunk_id"),
        col("chunk_text").as("anchor"))
      .join(ch.select(col("doc_id"),
        (col("chunk_id") - 1).as("chunk_id"),
        col("chunk_text").as("positive")), Seq("doc_id", "chunk_id"))
      .select(col("doc_id"), col("chunk_id"), col("anchor"),
        col("positive"),
        TextOps.fingerprint64(concat_ws("|",
          col("doc_id").cast("string"), col("chunk_id").cast("string")))
          .as("shuffle_key"))
  }

  /** T5-style SPAN-CORRUPTION masking — deterministic pretraining prep:
    * every `period`-th position starts a `span`-token masked run; the
    * input side replaces each run with one `<extra_id_k>` sentinel
    * (k = span index within the doc), the target side is the
    * complementary sentinel+tokens sequence the model must produce.
    * Position-rule masking (p mod period < span) instead of RNG keeps
    * the pair a pure function of the text — reproducible across
    * engines, runs and retries, which is what a training-data BUILD
    * step (as opposed to a training-time augmentation) needs. Pure
    * array expressions; no shuffle.
    */
  def spanMask(docs: DataFrame, period: Int = 15, span: Int = 3)
      : DataFrame = {
    val masked = (p: Column) => p % period < span
    val sentinel = (p: Column) =>
      concat(lit("<extra_id_"), (p / period).cast("int"), lit(">"))
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
      .select(col("doc_id"),
        array_join(filter(transform(col("t"),
          (tok, p) => when(p % period === 0, sentinel(p))
            .when(masked(p), lit(null).cast("string"))
            .otherwise(tok)), _.isNotNull), " ").as("masked_text"),
        array_join(filter(transform(col("t"),
          (tok, p) => when(p % period === 0,
              concat(sentinel(p), lit(" "), tok))
            .when(masked(p), tok)
            .otherwise(lit(null).cast("string"))), _.isNotNull), " ")
          .as("target_text"),
        org.apache.spark.sql.functions.size(
          filter(transform(col("t"), (_, p) => masked(p)), x => x))
          .as("n_masked"))
  }

  /** ROBUST outlier flagging per source — corpus-quality monitoring
    * with median/MAD instead of mean/stddev (one truncation-bug batch
    * of near-empty docs would drag a mean-based gate toward itself;
    * the median ignores it): a doc is an outlier when its token count
    * deviates from its source's median by more than `k`×MAD
    * (MAD = median absolute deviation). Every statistic is an INTEGER
    * (percentile_disc picks an existing count; |x − med| is integer
    * arithmetic), so the whole gate is exact cross-engine — no float
    * tolerance anywhere.
    *
    * Plan: two tiny per-source aggregates (|sources| rows each)
    * broadcast back onto the scan — the group-wise twin of the
    * quartiles boundary-broadcast idiom; no window, no corpus shuffle.
    */
  def outlierDocs(docs: DataFrame, k: Int = 5): DataFrame = {
    val t = docs.select(col("doc_id"), col("source"),
      TextOps.tokenCount(col("text")).as("n_tokens"))
    // percentile_disc returns DOUBLE; it PICKS an existing count, so
    // the int cast is exact and keeps the whole gate integer-typed.
    val med = t.groupBy(col("source"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_tokens)")
        .cast("int").as("med"))
    val dev = t.join(broadcast(med), Seq("source"))
      .withColumn("adev", abs(col("n_tokens") - col("med")))
    val mad = dev.groupBy(col("source"))
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
        .cast("int").as("mad"))
    dev.join(broadcast(mad), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("med"), col("mad"),
        (col("adev") > lit(k) * col("mad")).as("is_outlier"))
  }

  /** DSIR-style importance weights (Xie et al. '23, "Data Selection
    * for Language Models via Importance Resampling"): score every raw
    * document by how much its hashed-n-gram feature distribution looks
    * like a TARGET distribution vs the RAW corpus distribution —
    *
    *   weight(d) = Σ_{g ∈ bigrams(d)} [ ln p̂_target(bucket(g))
    *                                   − ln p̂_raw(bucket(g)) ]
    *
    * with p̂ the add-one-smoothed bucket frequencies over `buckets`
    * hashed-bigram buckets (the hashing trick bounds model size to
    * `buckets` counters regardless of corpus vocabulary — the same
    * device as [[graft.functions.TextOps.hashVector]]). High-weight
    * documents are the ones importance resampling keeps. The target
    * here is every `targetEvery`-th document (standing in for the
    * high-quality exemplar set), so the whole trainer+scorer is a pure
    * function of the corpus the DuckDB oracle replicates.
    *
    * Float surface: λ(bucket) is four ln calls in a fixed
    * parenthesization (probed bit-identical JVM↔DuckDB); the per-doc
    * sum folds λ values VALUE-sorted (sorted-fold idiom; equal values
    * are interchangeable under +), rounded to 6 dp at the edge.
    *
    * Scale shape: one tokenization pass → bucket counts are two
    * `buckets`-row aggregates (map-side partial; a hot bigram is a hot
    * counter, never a hot join key); the λ table (≤ `buckets` rows)
    * broadcasts onto the per-doc bucket stream; one groupBy(doc_id)
    * closes the sum. No corpus self-join anywhere — at 100 TB this is
    * two scans and one keyed shuffle.
    */
  def dsirWeights(docs: DataFrame, targetEvery: Int = 50,
                  buckets: Int = 1024): DataFrame = {
    val bg = docs.select(col("doc_id"),
        explode(TextOps.ngramsAll(col("text"), 2)).as("bigram"))
      .select(col("doc_id"),
        pmod(TextOps.fingerprint64(col("bigram")), lit(buckets.toLong))
          .as("bucket"))
    val isTarget = col("doc_id") % targetEvery === 0
    val counts = bg
      .groupBy(col("bucket"))
      .agg(sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
        sum(when(isTarget, 0L).otherwise(1L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("rt"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        ((log(col("ct") + 1.0) - log((col("tt") + buckets).cast("double"))) -
          (log(col("cr") + 1.0) - log((col("rt") + buckets).cast("double"))))
          .as("lam"))
    bg.join(broadcast(lam), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"),
        round(aggregate(sort_array(collect_list(col("lam"))),
          lit(0.0), _ + _), 6).as("weight"))
      .select(col("doc_id"), col("n_features"), col("weight"))
  }

  /** Dataset-card profile — the per-source summary block every released
    * corpus publishes (docs, token volume, language spread, exact-dup
    * rate): one row per source, all-integer so the differential is
    * exact.
    *
    * Plan: a window count over the text fingerprint marks global
    * exact-dups (the [[Dedup]] fingerprint shuffle, reused as a flag
    * instead of a drop), then ONE groupBy(source) closes every metric —
    * two keyed shuffles total, output |sources| rows. n_langs is an
    * exact COUNT(DISTINCT lang): the per-source language set is
    * dozens, so the expansion Spark plans for it is bounded; a
    * high-cardinality dimension would swap in [[Sketch]]'s KMV/HLL
    * estimate on the same plan.
    */
  /** Dictionary KEYWORD/PHRASE tagging — the taxonomy/blocklist pass:
    * count per-document hits against a curated term dictionary
    * (topic taxonomies, unsafe-content blocklists, PII keyword lists),
    * where terms may be single tokens or two-token phrases. Downstream
    * filters threshold `n_hits` per topic; the dictionary is an
    * external artifact in production and a fixed literal here so the
    * oracle replicates it.
    *
    * Plan: the dictionary BROADCASTS (it is human-curated — thousands
    * of rows at most); the corpus explodes once into unigrams and once
    * into positional bigrams (stride-1 windows, repeats kept — hit
    * COUNTS are the contract), and one broadcast equi-join + one
    * doc-keyed aggregate close it. No shuffle ever carries the corpus
    * against itself; a hot term is a hot aggregate cell, map-side
    * combined.
    */
  def keywordTags(docs: DataFrame,
                  dict: Seq[(String, String)] = DefaultTagDict): DataFrame = {
    val d = docs.sparkSession.createDataFrame(dict).toDF("term", "topic")
    val uni = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("term"))
    val bi = docs.select(col("doc_id"),
      explode(TextOps.ngramsAll(col("text"), 2)).as("term"))
    uni.unionByName(bi)
      .join(broadcast(d), Seq("term"))
      .groupBy(col("doc_id"), col("topic"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Fixed demo taxonomy over the testdata vocabulary: engine-,
    * storage-, and streaming-themed terms incl. two 2-token phrases.
    */
  val DefaultTagDict: Seq[(String, String)] = Seq(
    "scan" -> "engine", "join" -> "engine", "filter" -> "engine",
    "agg" -> "engine", "hash join" -> "engine", "sort merge" -> "engine",
    "table" -> "storage", "column" -> "storage", "row" -> "storage",
    "stream" -> "streaming", "window" -> "streaming",
    "batch" -> "streaming")

  /** DOMAIN BALANCING cap (the RefinedWeb/CCNet release step): keep at
    * most `maxPerDomain` documents per source, preferring the
    * highest-quality members — an over-represented domain (one crawler
    * -friendly site) must not dominate the mixture, and the cap must
    * never discard a clean doc while keeping a worse one from the same
    * domain. Quality here is the repo's integer proxy (distinct-token
    * count, as [[Dedup.clusterRepresentatives]] uses); ties break to
    * the smaller doc_id so both engines pick identical survivors.
    * Returns the SURVIVORS with their per-domain rank — `filter` on
    * nothing: the output IS the balanced corpus selector.
    *
    * Plan: one projection computes the score, one window partitioned
    * by source ranks it (never global — a domain is one partition key,
    * and a hot domain is exactly the skewed-window case the rank-only
    * frame handles with a single ordered scan per key), one filter.
    */
  def domainCap(docs: DataFrame, maxPerDomain: Int = 15): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("source"),
        TextOps.distinctTokenCount(col("text")).as("score"))
      .withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= maxPerDomain)
  }

  def corpusProfile(docs: DataFrame): DataFrame = {
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp"))
    docs
      .select(col("source"), col("lang"),
        TextOps.tokenCount(col("text")).as("n_toks"),
        TextOps.fingerprint64(col("text")).as("fp"))
      .withColumn("is_dup", (count(lit(1)).over(wFp) > 1).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("is_dup")).as("n_dup_docs"))
  }

  /** PER-LANGUAGE QUALITY RANK BLEND — rank-aggregation signal
    * ensembling (the Borda-style combine web-corpus pipelines use when
    * raw quality signals live on incomparable scales): each signal is
    * normalized to its percent-rank WITHIN THE DOCUMENT'S LANGUAGE —
    * cross-language score comparison is meaningless (stopword lists,
    * length norms differ) and per-language ranking is what per-lang
    * quota cuts consume — then blended by plain averaging. Signals:
    * token count ↑, distinct-token count ↑, stopword count ↓ (the
    * [[qualityScore]] features, rank-normalized instead of
    * linear-weighted — the two compose as independent filters).
    *
    * DETERMINISM: every window orders by (signal, doc_id) — total
    * order, so percent_rank emits the exact rational (rank−1)/(n−1)
    * with no tie ambiguity; ranks are rounded to 6 dp, the blend is
    * the same left-to-right 3-term sum in both engines.
    *
    * Scale shape: one projection (integer per-row token stats), then
    * THREE windows over the SAME lang partition key — one shuffle,
    * partitioning reused across all three sorts. A language is a
    * coarse partition at corpus scale; if one lang dominates, the
    * quota machinery downstream ([[domainCap]]) is the consumer and
    * the window becomes the documented per-key bound — at 100 TB this
    * runs per (lang, shard) with a merge, or swaps percent_rank for
    * the broadcast-boundary decile machinery (q_price_deciles) when a
    * single language outgrows a partition.
    */
  def qualityRankBlend(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("lang"),
      TextOps.tokenCount(col("text")).as("n_tok"),
      TextOps.distinctTokenCount(col("text")).as("n_dis"),
      TextOps.stopwordCount(col("text")).as("n_stop"))
    def w(c: Column) = Window.partitionBy(col("lang"))
      .orderBy(c, col("doc_id").asc)
    base.select(col("doc_id"), col("lang"),
        round(percent_rank().over(w(col("n_tok").asc)), 6).as("r_len"),
        round(percent_rank().over(w(col("n_dis").asc)), 6).as("r_lex"),
        round(percent_rank().over(w(col("n_stop").desc)), 6).as("r_stop"))
      .withColumn("composite",
        round((col("r_len") + col("r_lex") + col("r_stop")) / 3.0, 6))
  }

  /** OOV-RATE CURVE — the vocabulary-sizing read for tokenizer/embedding
    * table design: for each candidate vocabulary size V (the top-V
    * corpus tokens by frequency), what fraction of all token
    * occurrences falls outside the vocabulary? The elbow of this curve
    * is where adding vocab entries stops buying coverage — the number
    * a tokenizer budget decision actually needs (the BPE family here
    * solves the complementary subword question).
    *
    * DETERMINISM: top-V is (count DESC, token ASC) — total order; the
    * per-V numbers are integer occurrence counts; the only float is
    * the final division, rounded to 6 dp.
    *
    * Scale shape: one token-keyed count aggregate, then a DISTRIBUTED
    * top-Vmax (TakeOrderedAndProject — never a global sort of the
    * vocabulary); the ≤Vmax-row ranked vocab broadcasts onto the token
    * stream for ONE keyed left join, and all V cutoffs are conditional
    * sums inside ONE corpus-wide aggregate (a 1-row frame exploded to
    * |Vs| rows by a literal struct array — the keyColumnProfile
    * idiom). The corpus is tokenized once and scanned twice (count +
    * join), never per-V. The only window is a row_number over the
    * ≤Vmax-row top frame — bounded by construction.
    */
  def oovRateCurve(docs: DataFrame,
                   vocabSizes: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vMax = vocabSizes.max
    val tok = docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
    val top = tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok").asc).limit(vMax)
    val ranked = top.withColumn("vrank", row_number().over(
      Window.orderBy(col("tf").desc, col("tok").asc)))
    val agg = tok
      .join(broadcast(ranked.select(col("tok"), col("vrank"))),
        Seq("tok"), "left")
      .agg(count(lit(1)).as("n_tokens"),
        vocabSizes.map(v =>
          sum(when(col("vrank").isNull || col("vrank") > v, 1L)
            .otherwise(0L)).as(s"oov_$v")): _*)
    agg.select(explode(array(vocabSizes.map(v =>
        struct(lit(v).as("vocab_size"), col("n_tokens"),
          col(s"oov_$v").as("n_oov"))): _*)).as("r"))
      .select(col("r.vocab_size").as("vocab_size"),
        col("r.n_tokens").as("n_tokens"), col("r.n_oov").as("n_oov"),
        round(col("r.n_oov").cast("double") /
          col("r.n_tokens").cast("double"), 6).as("oov_rate"))
  }

  /** GREEDY SOURCE-COVERAGE RANKING — the data-buying read: rank
    * sources by MARGINAL distinct-shingle contribution under greedy
    * forward selection (the classic submodular-coverage greedy, which
    * is (1−1/e)-optimal for coverage — Nemhauser et al. '78). Round r
    * picks the source adding the most yet-uncovered 3-gram shingles;
    * output (rank, source, new_shingles, cum_shingles) for the first
    * `rounds` picks. Two sources that re-crawl the same pages rank
    * far apart here even when raw sizes match — exactly what
    * [[graft.operators.Dedup.sourceOverlap]]'s pairwise Jaccard hints
    * at, made into a purchase ORDER.
    *
    * Determinism: marginals are exact integer counts; the per-round
    * argmax tie-breaks (count DESC, source ASC) — both engines share
    * the total order. Each pick is a 1-row collect (a driver-sized
    * training decision, the BPE-argmax precedent); a picked source's
    * remaining marginal is zero, so it drops out of later rounds
    * structurally, not via an exclusion list.
    *
    * Scale shape: ONE distinct (source, shingle) index built from the
    * corpus (the decontaminate/jaccard shingle machinery), then per
    * round one shingle-keyed left-anti join against the covered set +
    * one |sources|-row count — `rounds` × two keyed jobs, never a
    * corpus re-scan. The covered set is localCheckpoint'd per round
    * (iterative-lineage discipline).
    */
  def sourceCoverageGreedy(docs: DataFrame, rounds: Int = 5,
                           n: Int = 3): DataFrame = {
    val ss = docs.select(col("source"),
        explode(TextOps.shingles(col("text"), n)).as("sh"))
      .distinct().localCheckpoint()
    var covered: DataFrame = null
    var picked = Vector.empty[(Int, String, Long)]
    for (r <- 1 to rounds) {
      val remaining =
        if (covered == null) ss
        else ss.join(covered, Seq("sh"), "left_anti")
      val top = remaining.groupBy(col("source"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("source")).limit(1).collect()
      if (top.nonEmpty) {
        val src = top(0).getString(0)
        picked = picked :+ ((r, src, top(0).getLong(1)))
        val newCov = ss.filter(col("source") === src).select(col("sh"))
        covered = (if (covered == null) newCov
          else covered.unionByName(newCov)).localCheckpoint()
      }
    }
    val cum = picked.scanLeft(0L)(_ + _._3).tail
    docs.sparkSession.createDataFrame(
      picked.zip(cum).map { case ((r, s, c), cm) => (r, s, c, cm) })
      .toDF("rank", "source", "new_shingles", "cum_shingles")
  }

  /** DISTINCTIVE TERMS per source — the "Fightin' Words" log-odds
    * ratio with a Dirichlet prior (Monroe, Colaresi & Quinn '08): for
    * each (source, token), δ = ln((y_s+α)/(n_s+αV−y_s−α)) −
    * ln((y_r+α)/(n_r+αV−y_r−α)) against the REST of the corpus,
    * scored by z = δ/√(1/(y_s+α) + 1/(y_r+α)). Unlike raw tf-idf,
    * the prior shrinks rare-token noise and the variance term
    * downweights small counts — the standard "what vocabulary makes
    * this source different" read for corpus triage.
    *
    * Determinism: all counts are exact integers; δ and z are a fixed
    * chain of double ops (ln / √ / identical parenthesization,
    * mirrored verbatim in the DuckDB twin — the tfidf ln-parity
    * precedent); ranking is on the ROUNDED z with a token tie-break,
    * so cross-engine order is total.
    *
    * Scale shape: one (source, token) keyed aggregate with map-side
    * partials (a hot token is a hot counter); the global token frame
    * is vocabulary-sized and joins back on token (the tf⋈df shape);
    * per-source totals and the 1-row (N, V) frame broadcast. The
    * per-source top-k runs as a source-partitioned window —
    * WindowGroupLimit keeps k rows per partition before the exchange.
    */
  def distinctiveTerms(docs: DataFrame, alpha: Double = 0.5,
                       k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val ys = tok.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("y_s"))
    val yg = ys.groupBy(col("token")).agg(sum(col("y_s")).as("y_g"))
    val ns = ys.groupBy(col("source")).agg(sum(col("y_s")).as("n_s"))
    val totals = yg.agg(sum(col("y_g")).as("n_tot"),
      count(lit(1)).as("vocab"))
    def lodds(y: Column, n: Column): Column =
      log((y.cast("double") + lit(alpha)) /
        (n.cast("double") + lit(alpha) * col("vocab").cast("double")
          - y.cast("double") - lit(alpha)))
    val scored = ys.join(yg, Seq("token"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("y_r", col("y_g") - col("y_s"))
      .withColumn("n_r", col("n_tot") - col("n_s"))
      .withColumn("z", round(
        (lodds(col("y_s"), col("n_s"))
          - lodds(col("y_r"), col("n_r")))
        / sqrt(lit(1.0) / (col("y_s").cast("double") + lit(alpha))
          + lit(1.0) / (col("y_r").cast("double") + lit(alpha))), 6))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("z").desc, col("token").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("source"), col("token"), col("y_s"), col("y_r"),
        col("z"))
  }

  /** END-TO-END CURATION FUNNEL — the retention report every corpus
    * pipeline publishes (CCNet/Gopher shape): docs and tokens
    * surviving each cleaning stage, composed from this file's own
    * operators over the standard injected-duplicate corpus:
    *
    *   0 all          the corpus (exact copies of every 40th doc
    *                  injected — [[Dedup.withExactDuplicates]]'s
    *                  device, source column kept for stage 4);
    *   1 quality      [[gopherRules]]' conjunction;
    *   2 langid       the stopword-density language gate
    *                  (n_stop·100 ≥ n_tokens·12 ⇒ 'en');
    *   3 exact_dedup  min-doc_id keeper per md5 fingerprint AMONG
    *                  STAGE-2 SURVIVORS (a real pipeline dedups what
    *                  remains, not the raw feed);
    *   4 domain_cap   ≤ `capPerSource` docs per source by the salted
    *                  content-hash lottery (deterministic, engine-
    *                  portable rank).
    *
    * Scale shape: one flag projection over the scan (cached — five
    * stage aggregates consume it, then released), one keyed
    * fingerprint aggregate + semi-join, one source-partitioned rank
    * window, and five 1-row aggregates unioned. All counts integer;
    * the output is 5 rows regardless of corpus size.
    */
  def curationFunnel(docs: DataFrame, capPerSource: Int = 10)
      : DataFrame = {
    val corpus = docs.select(col("doc_id"), col("text"), col("source"))
      .unionByName(docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"),
          col("source")))
    val t = TextOps.tokens(col("text"))
    val flagged = corpus.select(col("doc_id"), col("text"),
        col("source"), size(t).as("n_tokens"),
        aggregate(transform(t, length(_)), lit(0), _ + _).as("sum_len"),
        size(filter(t, x => x.rlike("[a-z]"))).as("n_alpha"),
        TextOps.stopwordCount(col("text")).as("n_stop"))
      .withColumn("q_pass",
        col("n_tokens") >= 30 && col("n_tokens") <= 100000 &&
          col("sum_len") >= col("n_tokens") * 3 &&
          col("sum_len") <= col("n_tokens") * 10 &&
          col("n_alpha") * 5 >= col("n_tokens") * 4 &&
          col("n_stop") >= 2)
      .withColumn("is_en", col("n_stop") * 100 >= col("n_tokens") * 12)
      .cache()
    val s1 = flagged.filter(col("q_pass"))
    val s2 = s1.filter(col("is_en"))
    val s2f = s2.withColumn("fp", TextOps.fingerprintMd5(col("text")))
    val keep = s2f.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val s3 = s2f.join(keep, Seq("fp", "doc_id"), "left_semi")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    val s4 = s3
      .withColumn("hk",
        md5(concat(col("doc_id").cast("string"), lit(":cap"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= capPerSource)
    def stage(df: DataFrame, id: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).as("n_tokens"))
        .select(lit(id).as("stage"), lit(name).as("stage_name"),
          col("n_docs"), col("n_tokens"))
    val out = stage(flagged, 0, "all")
      .unionByName(stage(s1, 1, "quality"))
      .unionByName(stage(s2, 2, "langid"))
      .unionByName(stage(s3, 3, "exact_dedup"))
      .unionByName(stage(s4, 4, "domain_cap"))
      .localCheckpoint()
    flagged.unpersist()
    out
  }
}
