package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextOps

/** Document deduplication for the training-data pipeline surface: exact
  * (hash groupBy), exact n-gram Jaccard via a shingle inverted index, and
  * MinHash-LSH banding. Designs follow the published MinHash/LSH
  * literature (Broder '97; see PAPERS.md) — never all-pairs:
  *
  *  - exact Jaccard joins docs only through shared shingles (inverted
  *    index); at scale add a document-frequency cap on shingles to bound
  *    the hottest posting lists (`maxDocFreq`);
  *  - MinHash-LSH compares only docs whose signature bands collide, and
  *    the exact-verify step computes intersections per CANDIDATE pair via
  *    semi-joins on the shingle index, not over the full corpus.
  *
  * The testdata has no natural near-dups (random word soup), so the
  * `with*Duplicates` helpers inject deterministic dups — a copy with the
  * first token dropped (J ≈ 0.98 on shingle sets) or an exact copy —
  * making every dedup query self-validating against a DuckDB exact-
  * Jaccard oracle.
  */
object Dedup {

  /** Corpus ∪ near-dup copies (first token dropped) of every Nth doc. */
  def withNearDuplicates(docs: DataFrame, everyN: Int = 50,
                         idOffset: Long = 1000000L): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % everyN === 0)
        .select((col("doc_id") + idOffset).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1)").as("text")))

  /** Corpus ∪ exact copies of every Nth doc. */
  def withExactDuplicates(docs: DataFrame, everyN: Int = 40,
                          idOffset: Long = 2000000L): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % everyN === 0)
        .select((col("doc_id") + idOffset).as("doc_id"), col("text")))

  /** Exact dedup: one hash-groupBy; keeper = min doc_id per fingerprint.
    * Map-side partial agg + one shuffle on the fingerprint.
    */
  def exactDuplicateGroups(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(TextOps.fingerprintMd5(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** (doc_id, shingle) inverted index — distinct shingles per doc. */
  def shingleIndex(corpus: DataFrame, n: Int = 3): DataFrame =
    corpus.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), n)).as("shingle"))

  private def sizes(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))

  /** Join pair-intersections to set sizes and keep pairs with
    * Jaccard ≥ num/den — pure integer arithmetic (den*inter ≥ num*union),
    * so the differential compare is float-free.
    */
  private def jaccardSelect(inter: DataFrame, sh: DataFrame,
                            num: Int, den: Int): DataFrame = {
    val sz = sizes(sh)
    inter
      .join(sz.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("union_n",
        col("sa.sz") + col("sb.sz") - col("intersect_n"))
      .filter(col("intersect_n") * den >= col("union_n") * num)
      .select(col("doc_a"), col("doc_b"), col("intersect_n"), col("union_n"))
  }

  /** Jaccard CONTAINMENT pairs — the asymmetric near-dup relation
    * (Broder's containment c(A,B) = |A∩B| / |A|): doc_sub's shingle set
    * is ≥ num/den inside doc_sup's. Catches what symmetric Jaccard
    * misses — a short doc quoted wholesale inside a long one (quote
    * farms, scraped snippets, boilerplate wrappers) has J ≈ |A|/|B| ≈ 0
    * but containment ≈ 1. Ordered pairs: (a contained-in b) and
    * (b contained-in a) are independent verdicts, both emitted when true.
    *
    * Same inverted-index shape as [[exactJaccardPairs]] (equi-join on
    * the shingle key, never corpus×corpus) with the same `maxDocFreq`
    * hot-shingle cap; the threshold compare is pure integer
    * (den·inter ≥ num·|A|) so the differential is float-free.
    *
    * Unlike [[exactJaccardPairs]], the cap defaults ON
    * (`Some(50)`, matching [[winnowCandidatePairs]]): the containment
    * self-join is the one place a boilerplate-hot shingle degrades
    * quadratically at corpus scale, because the asymmetric relation
    * can't even rely on the `doc_a < doc_b` halving (VERDICT r6 #4).
    * Sizes (`|A|`, the containment denominator) always come from the
    * UNCAPPED index, so the cap only thins candidate generation.
    */
  def containmentPairs(corpus: DataFrame, num: Int = 9, den: Int = 10,
                       maxDocFreq: Option[Int] = Some(50)): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val shAll = shingleIndex(corpus).cache()
    val sh = (maxDocFreq.fold(shAll) { m =>
      val rare = shAll.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= m)
        .select(col("shingle"))
      shAll.join(rare, Seq("shingle"))
    }).cache()
    // Prefix filter on the SUB side (r7, the [[prefixFilteredPairs]]
    // principle adapted to the asymmetric relation): c(A,B) ≥ t needs
    // |A∩B| ≥ ⌈t·|A|⌉ ≥ ⌈t·|A_capped|⌉, so a qualifying pair must
    // collide within A's first p = |A_c| − ⌈t·|A_c|⌉ + 1 rarest capped
    // shingles. Only the SUB side prunes to its prefix — the SUP side
    // keeps its full capped postings (B is unconstrained below t·|A|) —
    // which still cuts the candidate join from Σ df² to Σ df_pref·df.
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val szc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("szc"))
    val pref = sh.join(dfreq, Seq("shingle"))
      .withColumn("r", row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .join(szc, Seq("doc_id"))
      .filter(col("r") <=
        col("szc") - floor((col("szc") * num + (den - 1)) / den) + 1)
      .select(col("shingle"), col("doc_id"))
    val szu = sizes(shAll)
    val cand = pref.as("pa")
      .join(sh.as("pb"),
        col("pa.shingle") === col("pb.shingle") &&
          col("pa.doc_id") =!= col("pb.doc_id"))
      .select(col("pa.doc_id").as("doc_sub"), col("pb.doc_id").as("doc_sup"))
      .distinct()
      // size prune: |A∩B| ≤ |B_capped|, so den·|B_c| ≥ num·|A_uncapped|
      .join(szu.select(col("doc_id").as("doc_sub"), col("sz").as("sz_sub")),
        Seq("doc_sub"))
      .join(szc.select(col("doc_id").as("doc_sup"), col("szc").as("szc_sup")),
        Seq("doc_sup"))
      .filter(col("szc_sup") * den >= col("sz_sub") * num)
      .select(col("doc_sub"), col("doc_sup"))
    val inter = cand
      .join(sh.as("sa"), col("doc_sub") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_sup") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_sub"), col("doc_sup"))
      .agg(count(lit(1)).as("intersect_n"))
    inter
      .join(szu.withColumnRenamed("doc_id", "doc_sub"), Seq("doc_sub"))
      .filter(col("intersect_n") * den >= col("sz") * num)
      .select(col("doc_sub"), col("doc_sup"), col("intersect_n"),
        col("sz").as("sub_sz"))
  }

  /** Exact n-gram Jaccard near-dup pairs via the inverted index.
    * `maxDocFreq`: at scale, drop shingles appearing in more than this
    * many docs before pairing — bounds the quadratic blowup of hot
    * shingles at a tiny recall cost (they carry almost no signal). Off by
    * default so the result is exactly the oracle's.
    */
  def exactJaccardPairs(corpus: DataFrame, num: Int = 7, den: Int = 10,
                        maxDocFreq: Option[Int] = None): DataFrame = {
    // The index feeds pairing AND sizes — cache it or every consumer
    // re-runs scan+explode+distinct (plan-audit finding, PLANS.md).
    val shAll = shingleIndex(corpus).cache()
    // The cap is an ANTI join against the HOT set (df > m), not an
    // inner join against the rare set (r8): hot is tiny (empty below
    // saturation), so it broadcasts, and the explicit broadcast lets
    // ReuseExchange serve BOTH self-join sides from one df aggregate —
    // caching the capped postings instead gets the cache population
    // RACED by the two sides inside one job (the PLANS.md
    // probe-batching lesson; measured 17.4→25.9 s on q_dedup_pipeline
    // at sf0.1), and an uncached inner-join form re-runs the aggregate
    // per side (+5.4 s).
    val sh = maxDocFreq.fold(shAll) { m =>
      val hot = shAll.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > m)
        .select(col("shingle"))
      shAll.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("intersect_n"))
    jaccardSelect(inter, shAll, num, den)
  }

  /** Edit-distance near-dup pairs: candidates = doc pairs sharing at
    * least one n-token shingle (n = 8 keeps the candidate set tight —
    * same generation as benchmark decontamination), verified with exact
    * Levenshtein ≤ `maxDist`. A third dedup modality besides set overlap
    * (Jaccard/MinHash) and bit signatures (SimHash): catches small
    * EDITS — dropped words, typos — that set measures under-weigh.
    *
    * Plan: shingle equi-join for candidates (never all-pairs), then the
    * DP Levenshtein only on the few survivors. Both engines implement
    * the classic DP, so the oracle is exact.
    */
  def editDistancePairs(corpus: DataFrame, maxDist: Int = 40,
                        n: Int = 8): DataFrame = {
    val sh = corpus.select(col("doc_id"),
      explode(graft.functions.TextOps.shingles(col("text"), n)).as("shingle"))
    val cands = sh.join(
        sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_id") < col("doc_b"))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
    val texts = corpus.select(col("doc_id"), col("text"))
    cands
      .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")),
        Seq("doc_a"))
      .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** MinHash signatures: `numHashes` independent hash functions simulated
    * by salting xxhash64; one groupBy produces the whole signature row.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 64): DataFrame = {
    val mins = (0 until numHashes).map(k =>
      min(xxhash64(lit(k), col("shingle"))).as(s"h$k"))
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: hash each band of r consecutive signature slots; docs
    * colliding in ANY band become candidate pairs. b=16, r=4 puts the
    * S-curve threshold near J ≈ 0.5 with miss-probability ~2e-12 at
    * J = 0.95.
    */
  def lshCandidatePairs(sigs: DataFrame, numHashes: Int = 64,
                        bands: Int = 16): DataFrame = {
    val r = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(((b * r until (b + 1) * r).map(j => col(s"h$j")) :+
          lit(b)): _*).as("bh"))
    }
    val buckets = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    buckets.as("x")
      .join(buckets.as("y"), Seq("band", "bh"))
      .where(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Full MinHash-LSH dedup: band-bucket candidates, then EXACT Jaccard
    * verification computed per candidate pair through the shingle index
    * (two semi-joins + groupBy — never corpus×corpus). Output contract is
    * identical to exactJaccardPairs, so one DuckDB oracle checks both the
    * exact and the LSH path (LSH recall at the injected J≈0.98 dups is
    * 1 − ~2e-12).
    */
  def minhashVerifiedPairs(corpus: DataFrame, num: Int = 7, den: Int = 10,
                           numHashes: Int = 64, bands: Int = 16): DataFrame = {
    // One materialization feeds signatures, per-candidate intersections
    // (both join sides) and set sizes — uncached, the plan re-scans and
    // re-explodes the corpus four times (plan-audit finding, PLANS.md).
    val sh = shingleIndex(corpus).cache()
    val sz = sizes(sh)
    // r15 size-bound prune (VERDICT r14 #5 — the winnowVerifiedPairs
    // device applied to the LSH path): J ≤ min(|A|,|B|)/max(|A|,|B|),
    // so a candidate with den·min < num·max can never reach num/den
    // and dropping it is OUTPUT-IDENTICAL — before it fans out into
    // per-shingle intersection rows. On the saturated sf1 substrate
    // the band buckets pair many same-boilerplate, different-length
    // docs; the prune kills those at two broadcast-scale size joins.
    val cand = lshCandidatePairs(minhashSignatures(sh, numHashes),
        numHashes, bands)
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) * den >=
        greatest(col("sz_a"), col("sz_b")) * num)
      .select(col("doc_a"), col("doc_b"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"))
    jaccardSelect(inter, sh, num, den)
  }

  /** Winnow-seeded VERIFIED pairs: winnow-fingerprint collisions
    * generate candidates ([[winnowCandidatePairs]], minShared=1 for
    * recall), exact Jaccard verifies them through the shingle index —
    * the third candidate generator under the exactJaccardPairs output
    * contract, next to the exact index and MinHash-LSH. Its edge over
    * MinHash: no signature computation at all — the winnow set IS the
    * index, ~1/w the postings of the exact index (r5 bench: the winnow
    * index builds in half the exact path's time). The winnowing
    * guarantee (any shared ≥ k+w−1-token run collides) makes recall 1.0
    * on meaningful overlaps; a J ≥ num/den pair with NO shared 6-token
    * run cannot exist for near-dup-length docs, which is why the same
    * DuckDB oracle gates all three paths pair-identically.
    *
    * Cost control under minShared=1 (VERDICT r6 #2): single-collision
    * candidates are ~3× the minShared=2 volume and most are junk pairs
    * between very differently-sized docs. Before the expensive
    * shingle-intersect join, prune with the exact size bound
    * J = |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|): any pair with
    * den·min(szA,szB) < num·max(szA,szB) CANNOT reach the threshold, so
    * dropping it cannot change the output. The prune costs two joins
    * against the tiny per-doc size frame (one row per doc — broadcast
    * scale), and kills the spurious candidates before they fan out into
    * per-shingle intersection rows.
    */
  def winnowVerifiedPairs(corpus: DataFrame, num: Int = 7, den: Int = 10,
                          k: Int = 3, w: Int = 4,
                          minShared: Int = 1): DataFrame = {
    val sh = shingleIndex(corpus).cache()
    val sz = sizes(sh)
    val cand = winnowCandidatePairs(corpus, k, w, minShared)
      .select(col("doc_a"), col("doc_b"))
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) * den >=
        greatest(col("sz_a"), col("sz_b")) * num)
      .select(col("doc_a"), col("doc_b"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"))
    jaccardSelect(inter, sh, num, den)
  }

  /** Prefix-filtered exact Jaccard pairs — the set-similarity-join
    * prefix principle (PPJoin family; Xiao et al. '08, Chaudhuri et
    * al. '06): under ANY global total order on shingles, a pair with
    * J ≥ t = num/den must collide within each doc's FIRST
    * p = |d| − ⌈t·|d|⌉ + 1 ordered shingles, because J ≥ t forces
    * |A∩B| ≥ ⌈t·|A|⌉ and skipping A's whole prefix leaves only
    * |A| − p < ⌈t·|A|⌉ shared slots. So only prefix postings feed the
    * candidate self-join — ~(1−t) of the index — and ordering by
    * ASCENDING document frequency makes those the RAREST shingles: the
    * boilerplate-hot keys that dominate the exact index's join cost
    * sit at the tail of every doc's order and never pair anything.
    *
    * Fourth candidate generator under the [[exactJaccardPairs]] output
    * contract (exact index, MinHash-LSH, winnow): candidates are a
    * provable superset of true pairs, the size-bound prune and exact
    * verification are unchanged, so the same DuckDB oracle gates all
    * four pair-identically. vs the exact index at t = 0.7: candidate
    * join work drops from Σ df² over all shingles to Σ df² over the
    * coldest ~30% of postings — the published result, with recall
    * exactly 1 by construction. The per-doc prefix ranking is one
    * window partitioned by doc_id (never global).
    *
    * Honest small-scale note (same story as TopK.bruteTopKAgg): at
    * sf0.1 this benches 3.2 s vs the exact path's 2.7 s — the
    * substrate's shingles are near-unique (df ≈ 1), so Σ df² is tiny
    * and the prefix machinery (document-frequency aggregate + per-doc
    * rank window) costs more than it saves. Its win is asymptotic:
    * candidate work scales with Σ df² over prefix postings, which is
    * what dominates on real corpora with boilerplate-hot shingles.
    * Both paths stay under one oracle so the cheap one anchors the
    * scalable one.
    *
    * `maxDocFreq` (r8): the same hot-shingle cap as
    * [[exactJaccardPairs]] / [[containmentPairs]], and for the same
    * measured reason — the r8 sf1 probe's vocabulary-SATURATED
    * substrate (every doc shares n-grams with thousands) grew prefix
    * candidate pairs 142× on 10× docs, and prefix ordering alone
    * cannot save a corpus whose RAREST shingles are still hot. When
    * set, the prefix rank runs over the capped postings (capped sizes
    * for p — the prefix guarantee transfers to the capped projection
    * of each set) while the size-band prune, exact verification, and
    * Jaccard sizes all stay on the UNCAPPED index, so reported pairs
    * are exact; the documented recall trade is pairs discoverable ONLY
    * through boilerplate-hot shingles — exactly [[exactJaccardPairs]]'
    * contract, which shares this oracle.
    */
  def prefixFilteredPairs(corpus: DataFrame, num: Int = 7,
                          den: Int = 10,
                          maxDocFreq: Option[Int] = None): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val shAll = shingleIndex(corpus).cache()
    val sh = (maxDocFreq.fold(shAll) { m =>
      val rare = shAll.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") <= m)
        .select(col("shingle"))
      shAll.join(rare, Seq("shingle"))
    }).cache()
    val sz = sizes(shAll)
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    val szc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("szc"))
    val pref = sh.join(dfreq, Seq("shingle"))
      .withColumn("r", row_number().over(
        W.partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))))
      .join(szc, Seq("doc_id"))
      // p = szc − ⌈szc·num/den⌉ + 1; integer ceil as (szc·num + den−1) div den
      .filter(col("r") <=
        col("szc") - floor((col("szc") * num + (den - 1)) / den) + 1)
      .select(col("shingle"), col("doc_id"))
    val cand = pref.as("pa")
      .join(pref.as("pb"),
        col("pa.shingle") === col("pb.shingle") &&
          col("pa.doc_id") < col("pb.doc_id"))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
      .distinct()
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
        Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
        Seq("doc_b"))
      .filter(least(col("sz_a"), col("sz_b")) * den >=
        greatest(col("sz_a"), col("sz_b")) * num)
      .select(col("doc_a"), col("doc_b"))
    val inter = cand
      .join(shAll.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shAll.as("sb"),
        col("doc_b") === col("sb.doc_id") &&
          col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("intersect_n"))
    jaccardSelect(inter, shAll, num, den)
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's shingles that
    * occur in NO other document — the inverse signal of boilerplate.
    * High-novelty docs carry content the corpus hasn't seen (what a
    * data-mixing recipe upweights); near-zero novelty marks templated /
    * scraped material worth a closer dedup look. Related to
    * memorization analysis: corpus-unique n-grams are exactly the ones
    * a model can only learn from this document.
    *
    * Plan: the inverted index feeds a document-frequency aggregate
    * (keyed on shingle, map-side partials), joined back onto the index
    * and re-aggregated per doc — two keyed shuffles, counts only,
    * never pairs. Ratio is one double division rounded to 6 dp.
    */
  def noveltyScores(corpus: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingleIndex(corpus, n).cache()
    // r15 (VERDICT r14 #5): join back ONLY the df==1 keys. The old
    // index⋈df join moved every posting of every HOT shingle through
    // a shuffle keyed by a Zipf-skewed vocabulary — on a boilerplate-
    // saturated corpus that is nearly the whole index landing on a few
    // hot keys. The novel-key join has exactly one row per key on each
    // side by construction (df==1), so it cannot skew, and under
    // saturation the novel set is tiny. Output-identical: n_novel
    // counts the same df==1 postings; docs with none coalesce to 0
    // through the left join.
    val uniq = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df")).filter(col("df") === 1)
      .select(col("shingle"))
    val novel = sh.join(uniq, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_shingles"), 6).as("novelty"))
  }

  /** Near-dup pairs → duplicate CLUSTERS: connected components over the
    * pair graph, canonical member = the component's min doc_id. This is
    * the step that turns pairwise similarity into an actual dedup
    * decision (keep one per cluster).
    *
    * Iterative min-label propagation to the fixpoint: each node adopts
    * the smallest label among itself and its neighbors, repeated until
    * no label changes. Rounds = graph diameter (near-dup components are
    * shallow in practice); each round is one join + one groupBy —
    * shuffle-partitionable, no driver-side data, only a driver-side
    * convergence check per round.
    */
  def duplicateClusters(pairs: DataFrame,
                        maxRounds: Int = 50,
                        localEdgeCap: Long = 2000000L): DataFrame = {
    // HYBRID FINISH (r13, the boruvkaTrace template generalized): if
    // the pair graph fits under the cap, the unique min-label CC
    // fixpoint comes from one driver union-find — zero propagation
    // rounds, zero per-round checkpoint+count jobs. Near-dup pair
    // graphs are pairs-sized (tiny vs the corpus) at every harness sf;
    // above the cap the documented distributed loop below runs
    // unchanged, so the 100 TB path is identical to r12. Output
    // identity (not trace identity) is the correctness argument: both
    // paths compute THE fixpoint, which is unique — HybridFinishSpec
    // pins them equal.
    //
    // r13 ADVICE restructure, corrected by the r14 anchor measurement:
    // the pair frame keeps its ONE lazy checkpoint (the gate count
    // materializes it; the driver collect and the loop's symmetrizing
    // union both read the same blocks) and the 2× union is NOT
    // persisted at all — the first r14 attempt cached the union
    // instead, which left the expensive pair chain UNPERSISTED so each
    // union branch re-ran it (q_dedup_clusters 1.42 → 3.25 s anchored;
    // reverted same round). One persisted copy total on both paths.
    val und = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .localCheckpoint(false)
    if (localEdgeCap > 0 && LocalFinish.allLong(und, "a", "b") &&
        und.count() <= localEdgeCap) {
      Console.err.println("[graft] duplicateClusters: driver finish")
      val out = LocalFinish.minComponents(und, "a", "b",
        "doc_id", "canonical_id")
      LocalFinish.release(und) // collected; blocks are dead (ADVICE r15)
      return out
    }
    val edges = und
      .unionByName(und.select(col("b").as("a"), col("a").as("b")))
    // Per-round LAZY localCheckpoint + one count action (r9) — the
    // same discipline as [[graft.operators.Graph]].pageRank and
    // cc-star's inner star: the count materializes the checkpoint
    // inside its own job (still ONE action per round), lineage
    // truncates, and the next round reads block storage. The pre-r9
    // form cached each round and `unpersist()`ed the previous frame —
    // but a non-cascading unpersist INVALIDATES the dependent cache
    // entry, so every round (and every downstream consumer of the
    // returned frame) recomputed the whole chain back to the pair
    // generation: measured 58.5 s to count the 656-row result at
    // sf0.1, and O(rounds²) work inside the loop itself (PLANS.md
    // "duplicateClusters lineage leak"). Old checkpoint blocks are
    // freed by the ContextCleaner as round frames go out of scope.
    // (The r8 probe-batching dead end — TWO rounds per probe, 2.5-5×
    // slower — was a different restructuring and stays rejected; see
    // PLANS.md "Probe-batching probe".)
    var labels = edges.select(col("a").as("doc_id"))
      .distinct().withColumn("label", col("doc_id"))
      .localCheckpoint(false)
    var converged = false
    var r = 0
    while (!converged && r < maxRounds) {
      val next = edges
        .join(labels, edges("b") === labels("doc_id"))
        .select(col("a").as("doc_id"), col("label"))
        .unionByName(labels)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
        .join(labels.withColumnRenamed("label", "old"), "doc_id")
        .withColumn("changed", col("label") =!= col("old"))
        .drop("old")
        .localCheckpoint(false)
      converged = next.filter(col("changed")).count() == 0
      labels = next.drop("changed")
      r += 1
    }
    // The kCore round-accounting discipline (VERDICT r9 #6): the
    // fixpoint's cost is round-count-bound at scale, so the count is
    // part of the perf record.
    Console.err.println(
      s"[graft] duplicateClusters: $r rounds (cap $maxRounds)")
    labels.select(col("doc_id"), col("label").as("canonical_id"))
  }

  /** END-TO-END dedup PIPELINE audit — the three-stage funnel a corpus
    * release actually runs (exact → near-dup → keep one per cluster),
    * composed from this file's primitives and reported as
    * (stage_id, stage, n_docs) so the release note's "removed X% exact,
    * Y% near" line falls straight out. Stage 2 keeps the min doc_id
    * per text fingerprint; stage 3 keeps [[clusterRepresentatives]]'
    * quality-picked representative per exact-Jaccard cluster (the
    * REP CHOICE doesn't change the count — only which doc survives).
    *
    * Scale shape: the composition inherits each stage's documented
    * plan — one fingerprint shuffle, the bounded shingle-pair index,
    * label propagation + one window — and each stage MATERIALIZES
    * EXACTLY ONCE: `c` and `kept` are persisted for the audit's
    * lifetime (spill-safe MEMORY_AND_DISK), the three stage counts are
    * taken off the persisted frames while the label-propagation loop
    * (already an eager fixpoint) reuses the same cache, and both are
    * unpersisted before returning. Pre-r8 each consumer of `kept`
    * re-ran the fingerprint shuffle + self-join 3-4× (VERDICT r7 #1 —
    * the waste multiplied at scale). The returned frame is the three
    * already-computed audit rows — nothing re-executes downstream.
    */
  def dedupPipelineAudit(corpus: DataFrame): DataFrame = {
    // Stage wall-times go to stderr (VERDICT r8 #2): the audit is the
    // catalog's slowest query and the only way to separate WORK from
    // iterative round-latency in a loaded driver run is to see which
    // segment absorbed the wall-clock. Four segments: the raw count
    // (scan + persist of `c`), the clusterRepresentatives call (the
    // eager label-propagation fixpoint — the scheduler-bound part),
    // then the two audit counts off the already-persisted frames.
    def timed[A](label: String, sb: StringBuilder)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      sb.append(" %s=%.2fs".formatLocal(java.util.Locale.ROOT,
        label, (System.nanoTime() - t0) / 1e9))
      r
    }
    val stages = new StringBuilder("[graft] dedupPipelineAudit stages:")
    val c = corpus.select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val kept = c.groupBy(TextOps.fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(c, Seq("doc_id"))
      .select(col("doc_id"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRaw = timed("raw_count", stages)(c.count())
    // Same maxDocFreq=50 hot-shingle cap as the standalone catalog
    // entries (r8): a no-op at oracle scales, bounds the Σ df² pair
    // stream when the post-exact-dedup corpus is still boilerplate-
    // saturated — the audit's near-dup stage is this pipeline's only
    // unbanded pair generator.
    val reps = timed("cluster_fixpoint", stages)(
      clusterRepresentatives(kept,
        exactJaccardPairs(kept, maxDocFreq = Some(50))))
    val nExact = timed("exact_count", stages)(kept.count())
    val nNear = timed("near_count", stages)(
      reps.filter(col("is_rep")).count())
    kept.unpersist()
    c.unpersist()
    Console.err.println(stages.toString)
    corpus.sparkSession
      .createDataFrame(Seq((1, "raw", nRaw), (2, "exact", nExact),
        (3, "near_dup", nNear)))
      .toDF("stage_id", "stage", "n_docs")
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * (Kiveris et al. '14, "Connected Components in MapReduce and
    * Beyond") — the O(log²·) -round alternative to
    * [[duplicateClusters]]'s min-label propagation, whose round count
    * is the component DIAMETER. Near-dup clusters are shallow, so the
    * propagation version wins there; this is the right primitive when
    * components can be long chains (citation graphs, web link graphs,
    * entity-resolution chains), where diameter ≫ log n.
    *
    * Each round, every node u relinks neighbors to m = min(N(u)∪{u}):
    * large-star relinks the strictly larger neighbors, small-star the
    * strictly smaller ones; both keep (u, m) so connectivity is
    * preserved, and the edge list re-symmetrizes between rounds. The
    * fixpoint is a star graph per component centered on its min, read
    * out as (doc_id, canonical_id) — the same contract as
    * [[duplicateClusters]], gated by the same transitive-closure
    * oracle.
    *
    * Scale shape per round: one keyed aggregate (neighborhood min,
    * map-side combined — a hot node is a hot MIN cell) + one equi-join
    * of that |nodes|-row frame back onto the edges; `localCheckpoint`
    * truncates the iterative lineage exactly like [[graft.operators.Graph]]'s
    * PageRank loop. Nothing ever moves but (long, long) edges.
    */
  def connectedComponentsStar(pairs: DataFrame,
                              localEdgeCap: Long = 2000000L): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    // HYBRID FINISH (r13): same gate as [[duplicateClusters]] — the
    // star rounds converge to the same unique min-label CC fixpoint,
    // so a cap-gated driver union-find is output-identical while
    // skipping every star round AND the per-round exceptAll
    // convergence probe (two extra jobs each). sym() drops self-loop
    // pairs on both paths (a node with only self-loops is absent from
    // this operator's output, unlike duplicateClusters').
    //
    // r13 ADVICE restructure, corrected by the r14 anchor measurement:
    // the driver path gates and collects the ONE lazily-checkpointed
    // pair frame (union-find needs no symmetrization), and the
    // distributed round-0 sym() reads the same blocks — the first r14
    // attempt eagerly checkpointed sym() instead, which made the
    // UNDER-cap path pay the 2× distinct shuffle it never needs
    // (q_dedup_cc_star 1.47 → 2.28 s anchored; reverted same round).
    // One persisted copy total on both paths.
    val und = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint(false)
    if (localEdgeCap > 0 && LocalFinish.allLong(und, "a", "b") &&
        und.count() <= localEdgeCap) {
      Console.err.println("[graft] connectedComponentsStar: driver finish")
      val out = LocalFinish.minComponents(und, "a", "b",
        "doc_id", "canonical_id")
      LocalFinish.release(und) // collected; blocks are dead (ADVICE r15)
      return out
    }
    var edges = sym(und).localCheckpoint()
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val m = e.groupBy(col("a")).agg(min(col("b")).as("mn"))
        .select(col("a"), least(col("a"), col("mn")).as("m"))
      val relinked = e.join(m, Seq("a"))
        .filter(if (large) col("b") > col("a") else col("b") < col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      sym(relinked.unionByName(
        m.select(col("a"), col("m").as("b"))))
    }
    var converged = false
    var rounds = 0
    while (!converged && rounds < 32) { // log²-bound safety, not a tuning
      rounds += 1
      // The inner star's output is LAZILY localCheckpoint'ed: its two
      // references inside the outer star (the neighborhood-min groupBy
      // leg and the relink join leg) then share one materialization
      // instead of each recomputing the inner star — the checkpoint
      // write happens inside the probe job, lineage still truncates.
      // (Batching TWO double-rounds per exceptAll probe was tried in
      // r8 and benched flat-to-worse — see PLANS.md "Probe-batching
      // probe"; one double-round per probe stays.)
      val s1 = star(edges, large = true).localCheckpoint(false)
      val next = star(s1, large = false).localCheckpoint()
      // set equality: same size + one-sided difference empty
      converged = next.count() == edges.count() &&
        next.exceptAll(edges).isEmpty
      edges = next
    }
    require(converged, s"cc-star did not converge in $rounds rounds")
    edges.groupBy(col("a")).agg(min(col("b")).as("mn"))
      .select(col("a").as("doc_id"),
        least(col("a"), col("mn")).as("canonical_id"))
  }

  /** Jaccard THRESHOLD-CALIBRATION curve — how a dedup threshold is
    * actually chosen: pair counts at every candidate threshold τ ∈
    * {0.5 … 0.9} from ONE pair-generation pass at the loosest τ (each
    * tighter threshold is a filter over the same (intersect, union)
    * pairs, so the sweep costs one extra projection, not five index
    * joins). Read the curve's elbow, pick τ, ship; re-run on a new
    * corpus slice before trusting the old τ there.
    */
  def jaccardThresholdCurve(corpus: DataFrame,
                            maxDocFreq: Option[Int] = None): DataFrame =
    exactJaccardPairs(corpus, num = 5, den = 10, maxDocFreq = maxDocFreq)
      .select(explode(array((5 to 9).map(lit(_)): _*)).as("tau_tenths"),
        col("intersect_n"), col("union_n"))
      .filter(col("intersect_n") * 10 >= col("union_n") * col("tau_tenths"))
      .groupBy(col("tau_tenths")).agg(count(lit(1)).as("n_pairs"))

  /** DEDUP-METHOD AGREEMENT audit — the meta-quality number a pipeline
    * publishes when swapping near-dup detectors: how many candidate
    * pairs do exact n-gram Jaccard (J ≥ 7/10) and SimHash banding
    * (Hamming ≤ 3) agree on, and how many does each find alone? The
    * two measure different similarity structures (set overlap vs
    * weighted-profile angle), so divergence is signal, not error —
    * a rising `_only` count on a new corpus slice says the cheap
    * detector's threshold needs re-calibration before it replaces the
    * expensive one.
    *
    * Plan: both pair generators run their documented banded plans;
    * ONE full-outer join on the (doc_a, doc_b) key — pair sets, tiny
    * relative to the corpus — and a three-cell conditional aggregate.
    */
  def dedupMethodAgreement(corpus: DataFrame,
                           maxDocFreq: Option[Int] = None): DataFrame = {
    val j = exactJaccardPairs(corpus, maxDocFreq = maxDocFreq)
      .select(col("doc_a"), col("doc_b"), lit(1).as("in_j"))
    val s = simhashBandPairs(corpus)
      .select(col("doc_a"), col("doc_b"), lit(1).as("in_s"))
    j.join(s, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(when(col("in_j").isNotNull && col("in_s").isNotNull, 1L)
          .otherwise(0L)).as("n_both"),
        sum(when(col("in_s").isNull && col("in_j").isNotNull, 1L)
          .otherwise(0L)).as("n_jaccard_only"),
        sum(when(col("in_j").isNull && col("in_s").isNotNull, 1L)
          .otherwise(0L)).as("n_simhash_only"))
  }

  /** Cluster → REPRESENTATIVE selection — the decision step after
    * clustering: keep exactly one document per near-dup cluster, the
    * highest-quality member (here: distinct-token count, the repo's
    * integer quality proxy; ties break to the smaller doc_id).
    * CCNet/RefinedWeb-style pipelines keep the best-scored member, not
    * the arbitrary min-id one — dedup should never delete the clean
    * copy and keep the boilerplate-ridden one.
    *
    * Docs in no cluster are their own canonical and their own rep, so
    * `filter(is_rep)` IS the deduplicated corpus.
    *
    * Scale shape: [[duplicateClusters]]'s label propagation plus one
    * left join of the (small) cluster map onto the corpus and one
    * window partitioned by canonical_id — cluster-sized groups, never
    * a global sort.
    */
  def clusterRepresentatives(corpus: DataFrame,
                             pairs: DataFrame): DataFrame = {
    val clusters = duplicateClusters(pairs)
    corpus
      .select(col("doc_id"),
        TextOps.distinctTokenCount(col("text")).as("score"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("canonical_id",
        coalesce(col("canonical_id"), col("doc_id")))
      .withColumn("is_rep", row_number().over(
        Window.partitionBy(col("canonical_id"))
          .orderBy(col("score").desc, col("doc_id").asc)) === 1)
      .select(col("doc_id"), col("canonical_id"), col("score"),
        col("is_rep"))
  }

  /** SimHash (Charikar '02): per-token 60-bit md5-derived hash, bit-wise
    * ±1 vote weighted by token multiplicity, sign → signature bit.
    * md5-based (not xxhash64) so the oracle can reproduce it exactly.
    *
    * Shape: token occurrences collapse to (doc, token, count) first, and
    * the md5 is computed once per DISTINCT token via a broadcast-joined
    * vocabulary table — sum over the multiset equals the count-weighted
    * sum exactly (integers), but the hash work drops from O(occurrences)
    * to O(vocabulary). Bench effect at sf0.1: 10.0 s → see BASELINE.md.
    */
  def simhashSignatures(corpus: DataFrame, bits: Int = 60): DataFrame = {
    val tok = corpus
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val weighted = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("w"))
    val vocab = tok.select(col("tok")).distinct()
      .withColumn("h", TextOps.fingerprint64(col("tok")))
    val joined = weighted.join(broadcast(vocab), Seq("tok"))
    val votes = (0 until bits).map(j =>
      sum((shiftright(col("h"), j) % 2 * 2 - 1) * col("w")).as(s"s$j"))
    val sig = (0 until bits)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    joined.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup PAIRS by BAND PROBING — the pairing step the
    * signature alone doesn't give: split the 60-bit signature into
    * `bands` equal slices; by pigeonhole, two signatures within
    * Hamming distance `radius` < bands share at least one identical
    * band, so candidates come from `bands` slice equi-joins (never
    * all-pairs) and exact popcount-of-XOR verifies. Recall within the
    * radius is STRUCTURAL (the pigeonhole bound), precision is the
    * exact verify — the same candidates-then-verify contract as the
    * MinHash path, on the signature that costs O(vocabulary) to build.
    *
    * Scale shape: signatures are one long per doc; the band join keys
    * on (band_index, slice) — a hot slice means near-identical
    * boilerplate, the same data-quality signal as a hot shingle — and
    * the verify is one integer instruction per candidate.
    */
  def simhashBandPairs(corpus: DataFrame, radius: Int = 3,
                       bands: Int = 4, bits: Int = 60): DataFrame = {
    require(radius < bands, "pigeonhole needs radius < bands")
    val width = bits / bands
    val mask = (1L << width) - 1
    val sig = simhashSignatures(corpus, bits)
    val sliced = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map(k =>
        struct(lit(k).as("k"),
          shiftright(col("simhash"), k * width).bitwiseAND(lit(mask))
            .as("slice"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"),
        col("b.k").as("k"), col("b.slice").as("slice"))
    val cand = sliced.select(col("doc_id").as("doc_a"),
        col("simhash").as("sa"), col("k"), col("slice"))
      .join(sliced.select(col("doc_id").as("doc_b"),
        col("simhash").as("sb"), col("k"), col("slice")),
        Seq("k", "slice"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sa"), col("sb"))
      .distinct()
    cand.select(col("doc_a"), col("doc_b"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .filter(col("hamming") <= radius)
  }

  /** Duplicate-passage detection: every `n`-token window (distinct per
    * doc) that appears in MORE THAN ONE document, with how many docs
    * share it and the smallest carrying doc_id — the corpus-level
    * "repeated boilerplate passage" scan (C4/RefinedWeb-style line dedup
    * generalized to token windows, since the substrate docs are
    * single-line). Long windows (default 16 tokens) make cross-doc
    * repeats meaningful duplication rather than common phrases.
    *
    * Plan: explode distinct windows per doc → ONE keyed hash aggregate
    * on the window text (map-side partials; never all-pairs). At 100 TB
    * the aggregate is the classic inverted-index build; a hot window
    * (site-wide boilerplate) is one hot key — cap it with the same
    * maxDocFreq pre-filter exactJaccardPairs uses if skew shows.
    */
  def duplicatePassages(corpus: DataFrame, n: Int = 16): DataFrame =
    corpus.select(col("doc_id"),
      explode(TextOps.shingles(col("text"), n)).as("passage"))
      .groupBy(col("passage"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_docs") > 1)

  /** Winnowing-based near-dup candidate pairs: docs sharing ≥ `minShared`
    * winnow fingerprints ([[graft.functions.TextOps.winnow]]). The
    * inverted-index probe shape of [[exactJaccardPairs]], but the index
    * holds only ~1/w of the k-gram postings (each fingerprint is a
    * window MINIMUM) — the cheaper first-pass candidate generator at
    * corpus scale, with the same `maxDocFreq` hot-key cap. Winnowing
    * guarantees any shared ≥ k+w−1-token run still collides, so recall
    * on meaningful overlaps survives the 1/w compression; pairs are
    * CANDIDATES — the caller verifies with exact Jaccard/Levenshtein on
    * this bounded set, as the MinHash path does.
    */
  def winnowCandidatePairs(corpus: DataFrame, k: Int = 3, w: Int = 4,
                           minShared: Int = 2,
                           maxDocFreq: Int = 50): DataFrame = {
    val fps = corpus.select(col("doc_id"),
      explode(TextOps.winnowNative(col("text"), k, w)).as("fp"))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq).select(col("fp"))
    val pruned = fps.join(rare, Seq("fp"))
    val a = pruned.select(col("fp"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("fp"), col("doc_id").as("doc_b"))
    a.join(b, Seq("fp"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }

  /** CROSS-SOURCE overlap matrix: for every source pair, how many
    * distinct winnow fingerprints the two sources share, their
    * per-source fingerprint totals, and the resulting Jaccard — the
    * corpus-composition audit that decides whether two acquisition
    * streams are independent or re-crawls of each other (a mixing
    * recipe that double-weights two 90%-overlapping sources is really
    * upweighting one source; this matrix is how you notice BEFORE
    * training).
    *
    * Scale shape: the corpus is touched once for fingerprints, then
    * COLLAPSED to the (source, fp) distinct frame — the inverted index
    * at source granularity, ~1/w of the corpus token volume and
    * shrinking with per-source repetition. The self-join is keyed on
    * fp with per-key fan-out bounded by |sources| (not doc frequency
    * — a fingerprint row exists once per SOURCE no matter how many
    * docs carry it), so no doc-freq cap is needed; output is
    * |sources|²-bounded. Pairs sharing nothing are absent (their
    * Jaccard is 0 by definition).
    */
  def sourceOverlap(corpus: DataFrame, k: Int = 3,
                    w: Int = 4): DataFrame = {
    val fps = corpus.select(col("source"),
        explode(TextOps.winnowNative(col("text"), k, w)).as("fp"))
      .distinct()
      .cache()
    val totals = fps.groupBy(col("source")).agg(count(lit(1)).as("n_fps"))
    fps.select(col("fp"), col("source").as("source_a"))
      .join(fps.select(col("fp"), col("source").as("source_b")), Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .join(broadcast(totals.select(col("source").as("source_a"),
        col("n_fps").as("n_a"))), Seq("source_a"))
      .join(broadcast(totals.select(col("source").as("source_b"),
        col("n_fps").as("n_b"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared_fps"),
        col("n_a"), col("n_b"),
        round(col("shared_fps").cast("double") /
          (col("n_a") + col("n_b") - col("shared_fps")).cast("double"), 6)
          .as("jaccard"))
  }

  /** The C4-style CLEANER composed from [[duplicatePassages]] (VERDICT
    * r4 #5): drop every document that carries a corpus-duplicated
    * `n`-token window WITHOUT being that window's canonical (smallest
    * doc_id) carrier. Exactly one copy of each repeated passage
    * survives; docs whose every window is unique are untouched. Doc
    * granularity, not span excision — the substrate docs are single
    * passages, and dropping (like `Curation.decontaminate`) keeps the
    * output a subset of the input, which is what a filter stage in a
    * training pipeline wants.
    *
    * Plan: re-explode windows, equi-join them to the duplicated-passage
    * index (shuffle on the passage key — the inverted-index probe, never
    * all-pairs), distinct the offender ids, LEFT ANTI join back. At
    * 100 TB both shuffles key on passage/doc_id with map-side partials;
    * a boilerplate-hot passage is one hot key, capped the same way as
    * exactJaccardPairs.maxDocFreq if skew shows.
    */
  def dropDuplicatePassageDocs(corpus: DataFrame, n: Int = 16): DataFrame = {
    val dup = duplicatePassages(corpus, n)
      .select(col("passage"), col("min_doc_id"))
    val offenders = corpus
      .select(col("doc_id"), explode(TextOps.shingles(col("text"), n))
        .as("passage"))
      .join(dup, Seq("passage"))
      .filter(col("doc_id") =!= col("min_doc_id"))
      .select(col("doc_id")).distinct()
    corpus.join(offenders, Seq("doc_id"), "left_anti")
  }

  /** INCREMENTAL snapshot dedup — the daily-ingest stage: flag each row
    * of a new batch whose exact content fingerprint already exists in
    * the previous snapshot (so the pipeline appends only genuinely new
    * documents). One distinct on the snapshot's fingerprints + one
    * equi-join keyed by fingerprint — the streaming-ingest analog of
    * [[exactDuplicateGroups]], composable day over day because the
    * fingerprint set is itself mergeable state.
    */
  def snapshotDupFlags(batch: DataFrame, snapshot: DataFrame): DataFrame = {
    val seen = snapshot
      .select(TextOps.fingerprintMd5(col("text")).as("fp")).distinct()
      .withColumn("dup_of_prev", lit(true))
    batch
      .select(col("doc_id"), TextOps.fingerprintMd5(col("text")).as("fp"))
      .join(seen, Seq("fp"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_of_prev"), lit(false)).as("dup_of_prev"))
  }

  /** EXACT SUBSTRING dedup (Lee et al. '21, "Deduplicating Training
    * Data Makes Language Models Better" — the ExactSubstr setting):
    * report every MAXIMAL region of ≥ `k` consecutive tokens that some
    * OTHER document also contains verbatim, at arbitrary offsets in
    * both. The passage family ([[duplicatePassages]]/[[excisePassages]])
    * stops at fixed-window granularity; this operator merges the
    * duplicated windows into maximal spans with boundaries and the
    * recovered span text — the artifact a substring-dedup release
    * audit actually reads (where is the boilerplate, how long is it).
    *
    * The suffix-array machinery of the paper is replaced by the
    * n-gram-anchored equivalence that holds at token granularity: a
    * token position lies inside a shared ≥k-token substring IFF it is
    * covered by some cross-document-duplicated k-token window, so the
    * union of duplicated anchor windows reconstructs exactly the
    * maximal shared regions — no suffix array needed, and the
    * candidate plan stays banded (anchors join through the window
    * text, never doc×doc).
    *
    * Plan: positional k-windows (one per token, stride 1) equi-join the
    * duplicated-window index ([[duplicatePassages]] — one keyed
    * aggregate; a boilerplate-hot window is one hot key, same story as
    * [[exactJaccardPairs]] `maxDocFreq`); surviving anchor positions
    * merge gaps-and-islands style under a PER-DOC window (two
    * partitioned window functions, never global): a break opens where
    * the gap to the previous anchor exceeds `k` (union of [p, p+k−1]
    * windows stays contiguous through overlap and adjacency), islands
    * aggregate to (span_start, span_end), and the span text is sliced
    * back out of the token array by position — one keyed join per doc,
    * no re-scan of the corpus text.
    */
  def exactSubstringSpans(corpus: DataFrame, k: Int = 8): DataFrame = {
    val dup = duplicatePassages(corpus, k).select(col("passage"))
    val anchors = corpus.select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), k)))
      .select(col("doc_id"), col("pos"), col("col").as("passage"))
      .join(dup, Seq("passage"))
      .select(col("doc_id"), col("pos"))
    anchorSpans(anchors, corpus, k)
  }

  /** Gaps-and-islands merge of anchor-window positions into maximal
    * spans with recovered text — the shared tail of
    * [[exactSubstringSpans]] (cross-document anchors) and
    * [[selfRepeatSpans]] (within-document anchors). Two partitioned
    * window functions + one keyed join back to the token arrays.
    */
  private def anchorSpans(anchors: DataFrame, corpus: DataFrame,
                          k: Int): DataFrame = {
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = anchors
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byPos) <= k, lit(0))
          .otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(byPos))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"))
    val toks = corpus.select(col("doc_id"),
      TextOps.tokens(col("text")).as("t"))
    spans.join(toks, Seq("doc_id"))
      .select(col("doc_id"), col("span_start"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        array_join(slice(col("t"), col("span_start") + 1,
          col("span_end") - col("span_start") + 1), " ").as("span_text"))
  }

  /** EXACT-SUBSTRING EXCISION — the apply side of
    * [[exactSubstringSpans]] and the faithful ExactSubstr contract
    * (Lee et al. keep ONE occurrence of each duplicated substring,
    * not zero): cut every token covered by a cross-document-duplicated
    * `k`-window EXCEPT in the window's canonical holder (min doc_id —
    * already computed by [[duplicatePassages]]' aggregate, so the keep
    * rule costs nothing extra). Docs keep their row; `n_removed`
    * counts excised tokens — the same output contract as
    * [[excisePassages]], whose keep-nothing policy this refines.
    *
    * Plan: identical shape to [[excisePassages]] — positional windows
    * equi-join the duplicated-window index (now carrying min_doc_id),
    * the non-canonical matches explode to covered positions, one
    * distinct, surviving tokens anti-join and fold back per doc.
    */
  def exciseSubstrings(corpus: DataFrame, k: Int = 8): DataFrame = {
    val dup = duplicatePassages(corpus, k)
      .select(col("passage"), col("min_doc_id"))
    val wins = corpus.select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), k)))
      .select(col("doc_id"), col("pos"), col("col").as("passage"))
    val covered = wins.join(dup, Seq("passage"))
      .filter(col("doc_id") =!= col("min_doc_id"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("tpos"))
      .distinct()
    val toks = corpus.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos").as("tpos"), col("col").as("tok"))
    val rebuilt = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("tpos"), col("tok")))),
        _.getField("tok")), " ").as("kept"))
    val removed = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nrm"))
    corpus.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept"), lit("")).as("text_clean"),
        coalesce(col("nrm"), lit(0L)).as("n_removed"))
  }

  /** WITHIN-document repeat spans — the self-repetition detector for
    * generated/templated text (decoding loops, boilerplate blocks
    * repeated inside ONE document), the intra-doc complement of
    * [[exactSubstringSpans]]: maximal regions covered by a `k`-token
    * window that occurs at ≥2 DISTINCT POSITIONS of the same doc.
    * [[graft.operators.Curation]]'s repetition score flags HOW
    * repetitive a doc is; this localizes WHERE, with the repeated
    * text recovered — what a cleanup pass actually excises.
    *
    * Plan: positional windows aggregate per (doc, window-text) — a
    * doc-keyed shuffle, never cross-doc — positions of multiply-
    * occurring windows explode back out, and the island merge is the
    * shared [[anchorSpans]] tail.
    */
  def selfRepeatSpans(corpus: DataFrame, k: Int = 3): DataFrame = {
    val anchors = corpus.select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), k)))
      .select(col("doc_id"), col("pos"), col("col").as("passage"))
      .groupBy(col("doc_id"), col("passage"))
      .agg(collect_list(col("pos")).as("ps"))
      .filter(size(col("ps")) > 1)
      .select(col("doc_id"), explode(col("ps")).as("pos"))
    anchorSpans(anchors, corpus, k)
  }

  /** SHARD-BOUNDARY STITCH candidates — the inverse problem of
    * chunking: given a corpus of FRAGMENTS whose provenance metadata
    * was lost (the classic ingest accident: documents split across
    * shard/file boundaries and re-ingested as independent rows),
    * recover candidate adjacency purely from content. Fragment A is a
    * stitch candidate onto fragment B when A's LAST `k` tokens equal
    * B's FIRST `k` tokens verbatim — the overlap window chunkers
    * (e.g. [[graft.operators.Curation.chunkOverlap]], size−stride
    * tokens) or boundary-overlapped shard writers leave behind.
    *
    * Plan: one projection extracts each fragment's head-gram and
    * tail-gram (two strings per fragment, never the token stream),
    * then ONE equi-join keyed on the gram text pairs tails with heads
    * — banded exactly like [[exactSubstringSpans]]'s anchor join:
    * only fragments sharing a boundary gram ever meet, and a
    * boilerplate-hot gram is one hot key (same `maxDocFreq`-style cap
    * story if a corpus needs it). Fragments shorter than `k` cannot
    * witness a full boundary and are filtered before the join.
    */
  def stitchCandidates(frags: DataFrame, k: Int = 8): DataFrame = {
    val t = frags
      .select(col("frag_id"), TextOps.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= k)
    val heads = t.select(col("frag_id").as("frag_b"),
      array_join(slice(col("t"), 1, k), " ").as("gram"))
    val tails = t.select(col("frag_id").as("frag_a"),
      array_join(slice(col("t"), -k, k), " ").as("gram"))
    tails.join(heads, Seq("gram"))
      .filter(col("frag_a") =!= col("frag_b"))
      .select(col("frag_a"), col("frag_b"), col("gram"))
  }

  /** C4-style SPAN EXCISION — the surgical alternative to
    * [[dropDuplicatePassageDocs]]: instead of discarding a whole
    * document that carries a corpus-duplicated `n`-token window, cut
    * ONLY the tokens covered by such windows and keep the rest. This is
    * what production pipelines do to long documents where one repeated
    * boilerplate block (a license header, a nav bar) would otherwise
    * cost the entire doc. Every doc survives with its row; `n_removed`
    * counts excised tokens (0 for untouched docs); the rebuilt text
    * joins the surviving tokens with single spaces in original order.
    *
    * Plan: positional windows (posexplode over the token array) equi-join
    * the duplicated-passage index on the window text; covered token
    * positions come from a bounded `sequence(pos, pos+n−1)` explode and
    * one distinct; surviving tokens anti-join (doc_id, pos) and fold back
    * with a per-doc sorted collect — every shuffle keys on doc_id or the
    * passage string with map-side partials, never all-pairs. A
    * boilerplate-hot passage is one hot key, same cap story as
    * [[exactJaccardPairs]] `maxDocFreq`.
    */
  def excisePassages(corpus: DataFrame, n: Int = 16): DataFrame = {
    val dup = duplicatePassages(corpus, n).select(col("passage"))
    // 0-based window start positions, repeats kept (position matters).
    val wins = corpus.select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), n)))
      .select(col("doc_id"), col("pos"), col("col").as("passage"))
    val covered = wins.join(dup, Seq("passage"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("tpos"))
      .distinct()
    val toks = corpus.select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))))
      .select(col("doc_id"), col("pos").as("tpos"), col("col").as("tok"))
    val rebuilt = toks.join(covered, Seq("doc_id", "tpos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("tpos"), col("tok")))),
        _.getField("tok")), " ").as("kept"))
    val removed = covered.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nrm"))
    corpus.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept"), lit("")).as("text_clean"),
        coalesce(col("nrm"), lit(0L)).as("n_removed"))
  }

  /** Duplicate-CLUSTER size distribution: how big are the duplicate
    * families — a corpus of pairwise twins (size-2 clusters) needs a
    * different fix than one giant boilerplate component (one
    * template stamped everywhere). Runs [[duplicateClusters]]' exact
    * min-label fixpoint, then two tiny keyed aggregates; output is
    * histogram-sized.
    */
  def clusterSizeDist(pairs: DataFrame): DataFrame =
    duplicateClusters(pairs)
      .groupBy(col("canonical_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  /** DUPLICATION-RATE profile per source — which slice of the corpus
    * is paying the dedup bill: per source, how many docs sit in ≥ 1
    * verified near-dup pair. THE triage read before spending on a
    * source-specific fix (one boilerplate-heavy crawl can own most of
    * the duplicate mass), and the per-source acceptance check after.
    *
    * Runs the [[exactJaccardPairs]] contract (hot-shingle cap stated
    * explicitly — the r9 composition rule) on the near-dup corpus,
    * flags pair members, and maps injected ids back through the
    * `idOffset` arithmetic to the source column. One distinct over
    * the pair frame, two keyed joins (the doc→source frame is
    * dimension-small), one keyed aggregate.
    */
  def dupRateBySource(docs: DataFrame, num: Int = 7, den: Int = 10,
                      maxDocFreq: Option[Int] = Some(50),
                      idOffset: Long = 1000000L): DataFrame = {
    val corpus = withNearDuplicates(docs, idOffset = idOffset)
    val pairs = exactJaccardPairs(corpus, num, den, maxDocFreq)
    val flagged = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("flag", lit(1L))
    // Injected copies map back as doc_id − idOffset; originals map to
    // themselves. The conditional (not a modulo) keeps the mapping
    // correct for corpora whose native ids exceed idOffset (r9
    // advisor: a `% idOffset` silently mis-attributes those).
    val withSrc = corpus.select(col("doc_id"),
        when(col("doc_id") >= idOffset, col("doc_id") - idOffset)
          .otherwise(col("doc_id")).as("orig_id"))
      .join(docs.select(col("doc_id").as("orig_id"), col("source")),
        Seq("orig_id"))
    withSrc.join(flagged, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("flag"), lit(0L))).as("n_dup_docs"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        round(col("n_dup_docs").cast("double")
          / col("n_docs").cast("double"), 6).as("dup_rate"))
  }

  /** LSH S-CURVE DESIGN TABLE — the analytic banding-choice tool
    * (Broder; the MMDS tuning chart): for every (bands b, rows r)
    * factorization of the signature budget, P(candidate | J) =
    * 1 − (1 − Jʳ)ᵇ over a J grid. Read beside
    * [[jaccardThresholdCurve]]'s MEASURED pair counts, it picks the
    * banding whose S-curve knee sits at the corpus's chosen τ before
    * any signatures are computed. Deterministic cross-engine: the
    * powers are REPEATED LEFT-ASSOCIATED MULTIPLICATION (no pow(),
    * whose last ULP may differ), the grid is i·0.05 in double — the
    * identical op tree both engines.
    */
  def lshSCurve(numHashes: Int = 16): DataFrame = {
    def power(x: org.apache.spark.sql.Column, n: Int)
        : org.apache.spark.sql.Column =
      (2 to n).foldLeft(x)((acc, _) => acc * x)
    val configs = Seq(16, 8, 4, 2).filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
    configs.map { case (b, r) =>
      val base = org.apache.spark.sql.SparkSession.active.range(1, 20)
        .select(col("id").cast("int").as("i"),
          (col("id").cast("double") * lit(0.05)).as("j"))
      base.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
        round(col("j"), 6).as("j"),
        round(lit(1.0) - power(lit(1.0) - power(col("j"), r), b), 6)
          .as("p_candidate"))
    }.reduce(_.unionByName(_))
  }

  /** PLANTED-TRUTH DEDUP EVALUATION — measured recall of the
    * verified near-dup chain against pairs KNOWN BY CONSTRUCTION:
    * [[withNearDuplicates]] injects (m, m+idOffset) perturbed copies,
    * so the truth set is exact and the pipeline's recall is a
    * measurement, not an estimate (the labeled complement to
    * [[dedupMethodAgreement]]'s method-vs-method comparison and
    * [[jaccardThresholdCurve]]'s τ calibration). found pairs outside
    * the truth set are ORGANIC near-dups, not errors —
    * `found_share_planted` reads how much of the detected mass the
    * injection explains. Recall < 1 is honest signal: a copy of a
    * very short doc falls below the Jaccard bar when its dropped
    * first token is a large share of its shingles.
    *
    * Scale shape: the pair chain is the cost; the truth frame is
    * |corpus|/everyN rows (broadcast semi-join); three 1-row counts
    * cross-joined (allowlisted).
    */
  def plantedPairEval(docs: DataFrame, everyN: Int = 50,
                      idOffset: Long = 1000000L): DataFrame = {
    val found = minhashVerifiedPairs(withNearDuplicates(docs, everyN,
      idOffset)).localCheckpoint(false)
    val truth = docs.filter(col("doc_id") % everyN === 0)
      .select(col("doc_id").as("doc_a"),
        (col("doc_id") + idOffset).as("doc_b"))
    val matched = found.join(broadcast(truth), Seq("doc_a", "doc_b"),
      "left_semi").agg(count(lit(1)).as("n_matched"))
    truth.agg(count(lit(1)).as("n_truth"))
      .crossJoin(broadcast(found.agg(count(lit(1)).as("n_found"))))
      .crossJoin(broadcast(matched))
      .select(col("n_truth"), col("n_found"), col("n_matched"),
        round(col("n_matched").cast("double")
          / col("n_truth").cast("double"), 6).as("recall"),
        round(col("n_matched").cast("double")
          / col("n_found").cast("double"), 6).as("found_share_planted"))
  }

  /** TRAIN/HELDOUT SPLIT-LEAKAGE AUDIT — the contamination check a
    * split must pass BEFORE the heldout slice can be called an eval
    * set: near-duplicate pairs ([[exactJaccardPairs]]' verified
    * contract) classified by which side of a deterministic id split
    * their endpoints land on. `cross_split` pairs are the leakage —
    * a train doc whose near-copy sits in heldout inflates every
    * metric computed there (the split-level complement of
    * [[graft.operators.Curation.decontaminate]]'s external-benchmark
    * check). Output: (split_class, n_pairs, share).
    *
    * The split is `doc_id % heldoutMod == 0` — deterministic,
    * mirrorable, and NOT content-derived (a content-hash split would
    * send exact copies to the same side by construction and hide
    * exactly the pairs this audit exists to count).
    *
    * Scale shape: the pair chain's cost IS the query ([[exactJaccardPairs]]
    * — index-bounded, hot-shingle-capped); classification adds two
    * integer mods per pair, one |classes|-row aggregate, a 1-row
    * total broadcast (allowlisted).
    */
  def splitLeakage(corpus: DataFrame, heldoutMod: Int = 7,
                   maxDocFreq: Option[Int] = Some(50)): DataFrame = {
    def held(c: org.apache.spark.sql.Column) = c % heldoutMod === 0
    val cl = exactJaccardPairs(corpus, maxDocFreq = maxDocFreq)
      .select(
        when(held(col("doc_a")) && held(col("doc_b")), "within_heldout")
          .when(!held(col("doc_a")) && !held(col("doc_b")),
            "within_train")
          .otherwise("cross_split").as("split_class"))
    // ≤3 rows, two consumers (rows + total) — materialize so the
    // pair chain runs once (the modularity `per` discipline).
    val c = cl.groupBy(col("split_class"))
      .agg(count(lit(1)).as("n_pairs")).localCheckpoint()
    c.crossJoin(broadcast(c.agg(sum(col("n_pairs")).as("tot"))))
      .select(col("split_class"), col("n_pairs"),
        round(col("n_pairs").cast("double") / col("tot"), 6).as("share"))
  }

  /** CONTENT-DEFINED CHUNKING dedup audit (the Rabin-boundary device
    * under every storage deduplicator, LBFS/Data Domain lineage) —
    * the STORAGE-dedup read beside the similarity family: cut each
    * document where a rolling k-gram hash ≡ 0 (mod `maskMod`), so an
    * insertion reshuffles only its LOCAL chunks (fixed-width chunking
    * would shift every later boundary), then measure per source how
    * much of the token volume survives chunk-level dedup.
    *
    * Expected chunk length ≈ maskMod grams; boundaries, chunk slices
    * and fingerprints are pure array expressions over the scan (the
    * winnow hash chain reused verbatim — no shuffle before the chunk
    * explode). Readout per source: chunk counts, token volumes, and
    * dedup_share = 1 − distinct_tokens/total_tokens, all exact
    * integers until the one division.
    */
  def cdcChunkStats(docs: DataFrame, k: Int = 3,
                    maskMod: Long = 16L): DataFrame = {
    // Single-element-transform LET BINDINGS (the TextOps idiom): the
    // token array and the gram-hash array are each bound once — a
    // bare `element_at(hs, i)` inside the boundary filter re-derives
    // EVERY md5 per element (measured 52 s at sf0.1; 2.4e9 hashes).
    val chunksCol = element_at(
      transform(array(TextOps.tokens(col("text"))), tv => {
        val grams = when(size(tv) >= k,
            transform(sequence(lit(1), size(tv) - (k - 1)),
              i => concat_ws(" ",
                (0 until k).map(j => element_at(tv, i + j)): _*)))
          .otherwise(array().cast("array<string>"))
        element_at(
          transform(
            array(transform(grams, g => TextOps.fingerprint64(g))),
            hsv => {
              // Gram i a boundary -> chunk ends at token i + k - 1.
              // (sequence(1, 0) counts DOWN in Spark — guard empty.)
              val idx = when(size(hsv) > 0,
                  sequence(lit(1), size(hsv)))
                .otherwise(array().cast("array<int>"))
              val cuts = transform(
                filter(idx, i =>
                  pmod(element_at(hsv, i), lit(maskMod)) === 0L),
                i => i + lit(k - 1))
              expr_chunks(tv, cuts)
            }), 1)
      }), 1)
    val chunks = docs.select(col("source"),
        explode(chunksCol).as("chunk"))
      .filter(col("chunk") =!= "")
      .select(col("source"),
        TextOps.fingerprint64(col("chunk")).as("fp"),
        size(TextOps.tokens(col("chunk"))).cast("long").as("toks"))
    val per = chunks.groupBy(col("source"), col("fp"))
      .agg(count(lit(1)).as("n"), max(col("toks")).as("toks"))
    per.groupBy(col("source"))
      .agg(sum(col("n")).as("n_chunks"),
        count(lit(1)).as("n_distinct"),
        sum(col("n") * col("toks")).as("total_tokens"),
        sum(col("toks")).as("distinct_tokens"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        col("total_tokens"), col("distinct_tokens"),
        round(lit(1.0) - col("distinct_tokens").cast("double")
          / col("total_tokens").cast("double"), 6).as("dedup_share"))
  }

  /** Chunk texts from token array `t` and ascending cut positions:
    * slices (start, end] zipped from [0]++cuts and cuts++[size]. */
  private def expr_chunks(t: Column, cuts: Column): Column =
    zip_with(
      concat(array(lit(0)), cuts),
      concat(cuts, array(size(t))),
      (s, e) => when(e > s, concat_ws(" ", slice(t, s + 1, e - s)))
        .otherwise(lit("")))
}
