package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Byte-pair-encoding TOKENIZER TRAINING (Sennrich et al. '16, the
  * subword scheme behind every modern LM vocabulary): `rounds`
  * greedy pair merges over the corpus's character sequences, emitting
  * the learned merge table — the trained artifact a tokenizer ships.
  *
  * The distributed shape is the one that scales: the CORPUS is
  * touched exactly once (a word-frequency aggregate); every training
  * round then runs on the WEIGHTED VOCABULARY (|V| rows — thousands,
  * while the corpus is billions), which is how reference BPE trainers
  * work (count words first, merge over (word, freq) pairs). Per
  * round: one pair-explode + keyed aggregate over |V| rows, one
  * TakeOrderedAndProject argmax (count DESC, then (left, right)
  * lexicographic — the deterministic tie-break both engines share),
  * one broadcast of the 1-row winner onto the vocab for the merge
  * fold. Each round ends in `localCheckpoint()` — the iterative-
  * lineage discipline (Graph.pageRank) — which also materializes the
  * 1-row winner ONCE before its two consumers (merge + output union)
  * read it, so no frame races a cache (PLANS.md r8 self-join rule).
  *
  * Merge semantics are the exact leftmost-greedy fold: scanning left
  * to right, an adjacent (l, r) merges to `lr`, and the merged symbol
  * immediately rejoins the stream (so `x x x x` under (x, x) →
  * `xx xx`, not `xx x x`). Both engines implement the SAME fold — a
  * Spark `aggregate` over the symbol array, a DuckDB `list_reduce`
  * over a delimited string — so every round of the trainer sits
  * inside the differential, not just the final table. No end-of-word
  * marker: merges never cross word boundaries by construction, and
  * the testdata vocabulary carries no markers to separate.
  */
object Bpe {

  /** (round, l, r, pair_n): the first `rounds` BPE merges learned from
    * `docs.text`, in training order. Rounds past pair exhaustion emit
    * nothing (the argmax frame is empty and every later round stays
    * empty) — the merge table is simply shorter than `rounds`, in both
    * engines.
    */
  def trainMerges(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val wc = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    var words = wc
      .withColumn("syms", filter(split(col("w"), ""), x => x =!= ""))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (r <- 1 to rounds) {
      // sequence(1, size-1) needs size >= 2: Spark's sequence DESCENDS
      // when start > stop, so 1-symbol words must be filtered, not
      // sliced (DuckDB's generate_series is empty there — equivalent).
      val pairs = words.filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("pair_n"))
      val best = pairs
        .orderBy(col("pair_n").desc, col("l"), col("r")).limit(1)
        .select(lit(r).as("round"), col("l"), col("r"), col("pair_n"))
        .localCheckpoint()
      merges += best
      words = words.crossJoin(broadcast(best))
        .withColumn("syms", expr(
          """aggregate(slice(syms, 2, size(syms) - 1),
            |  array(element_at(syms, 1)),
            |  (acc, s) -> CASE WHEN element_at(acc, -1) = l AND s = r
            |    THEN concat(slice(acc, 1, size(acc) - 1),
            |      array(concat(l, r)))
            |    ELSE concat(acc, array(s)) END)""".stripMargin))
        .select(col("w"), col("n"), col("syms"))
        .localCheckpoint()
    }
    merges.reduce(_.unionByName(_))
  }

  /** Segment `docs.text` with a learned merge table: re-run the same
    * leftmost-greedy fold per word for each merge IN TRAINING ORDER,
    * then count the resulting subword units over the corpus — the
    * apply-side of [[trainMerges]] (output: (sym, n) subword
    * frequencies). `mergesLocal` is the collected merge table (it is
    * `rounds` rows — driver-sized by definition, like a broadcast
    * codebook).
    */
  def applyMerges(docs: DataFrame,
                  mergesLocal: Seq[(String, String)]): DataFrame =
    foldWords(docs, mergesLocal)
      .select(col("n"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("n")).as("n"))

  /** The corpus vocabulary folded under a learned merge table:
    * (w, n, syms) — one row per distinct word with its corpus
    * frequency and final subword segmentation. Shared tail of
    * [[applyMerges]] and [[segmentedWords]].
    */
  private def foldWords(docs: DataFrame,
                        mergesLocal: Seq[(String, String)]): DataFrame = {
    val base = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("syms", filter(split(col("w"), ""), x => x =!= ""))
    // One fold per merge, with a lineage cut per round: each fold
    // references `syms` three times, so chaining them as one nested
    // expression grows the tree 3^rounds-fold — codegen/serialization
    // death, not a data problem (the frame is |V| rows). Same
    // discipline as the trainer loop.
    mergesLocal.foldLeft(base.localCheckpoint()) {
      case (df, (l, r)) =>
        df.withColumn("syms", expr(
          s"""aggregate(slice(syms, 2, size(syms) - 1),
             |  array(element_at(syms, 1)),
             |  (acc, s) -> CASE WHEN element_at(acc, -1) = '$l' AND s = '$r'
             |    THEN concat(slice(acc, 1, size(acc) - 1),
             |      array(concat('$l', '$r')))
             |    ELSE concat(acc, array(s)) END)""".stripMargin))
          .localCheckpoint()
    }
  }

  /** Per-word segment COUNT under a learned merge table: (w, n_syms)
    * over the corpus vocabulary — the apply-side lookup fertility
    * audits join against.
    */
  def segmentedWords(docs: DataFrame,
                     mergesLocal: Seq[(String, String)]): DataFrame =
    foldWords(docs, mergesLocal)
      .select(col("w"), size(col("syms")).as("n_syms"))

  /** TOKENIZER FERTILITY per language: subword units emitted per word
    * (Σ n_w·|segments(w)| / Σ n_w within each `langCol` group) under a
    * learned merge table — THE standard tokenizer-equity audit: a
    * vocabulary trained on a corpus dominated by one language
    * fragments the others into more units per word, inflating their
    * effective sequence length and training cost, and this is the
    * number that shows it (fertility 1.0 = every word is one token).
    *
    * Scale shape: the vocabulary segmentation table is |V| rows
    * (broadcast); the per-language word counts are one keyed
    * aggregate over the token explode; the fertility division is one
    * |langs|-row projection. Integer sums end-to-end; one rounded
    * division per language at the output edge.
    */
  /** MaxMatch (greedy longest-prefix) SUBWORD SEGMENTATION — the
    * WordPiece INFERENCE algorithm (Song et al. '21, "Fast WordPiece
    * Tokenization": greedy longest-match-first), the second tokenizer
    * family beside the BPE merge fold. Vocabulary = the corpus's
    * `vocabK` most frequent substrings of length 2..`maxSub`
    * (frequency-truncated, occurrence-weighted; deterministic
    * tie-break count DESC then substring ASC via
    * TakeOrderedAndProject) plus EVERY single character — so
    * segmentation always terminates with no UNK.
    *
    * The segmentation itself is the distributed formulation: instead
    * of scanning each word left-to-right (the sequential paper
    * algorithm, O(len) steps), build the per-position JUMP TABLE —
    * (word, pos) → pos + longest-match-length, an equi-join of the ≤
    * `maxSub` candidate prefixes per position against the broadcast
    * vocabulary — and POINTER-DOUBLE it: composing the jump function
    * with itself k times covers 2^k pieces, so `ceil(log2(maxLen))`
    * keyed self-joins segment EVERY word simultaneously regardless of
    * corpus size (the classic parallel list-ranking device; the
    * DuckDB twin walks the same vocabulary sequentially with a
    * recursive CTE and must land on identical piece counts).
    *
    * Scale shape: corpus touched once (word-frequency aggregate);
    * everything after runs on the WEIGHTED VOCABULARY (|V| distinct
    * words × avg length rows). The candidate join is keyed on the
    * prefix string against a broadcast vocab; each doubling is a
    * keyed (word, pos) self-join on a |V|·len-row frame with an
    * eager localCheckpoint (lineage discipline).
    *
    * Output: the `topWords` most frequent words (freq DESC, word ASC)
    * with their exact greedy piece count — the per-word fertility
    * read that prices a vocabulary before shipping it.
    */
  def maxMatchSegment(docs: DataFrame, vocabK: Int = 64,
                      maxSub: Int = 4, topWords: Int = 20): DataFrame = {
    val w = docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val subs = w.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  filter(transform(sequence(2, $maxSub), l ->
           |    if(i + l - 1 <= length(word),
           |       substring(word, i, l), null)),
           |    x -> x is not null)))""".stripMargin)).as("sub"))
      .groupBy(col("sub")).agg(sum(col("freq")).as("c"))
      .orderBy(col("c").desc, col("sub")).limit(vocabK)
      .select(col("sub"))
    val chars = w.select(explode(expr(
        "transform(sequence(1, length(word)), i -> " +
          "substring(word, i, 1))")).as("sub"))
      .distinct()
    val vocab = subs.unionByName(chars).distinct()
    val positions = w.select(col("word"),
      explode(expr("sequence(1, length(word))")).as("pos"))
    val jump0 = positions.select(col("word"), col("pos"), explode(expr(
        s"""filter(transform(sequence(1, $maxSub), l ->
           |  if(pos + l - 1 <= length(word),
           |     substring(word, pos, l), null)),
           |  x -> x is not null)""".stripMargin)).as("sub"))
      .join(broadcast(vocab), Seq("sub"))
      .groupBy(col("word"), col("pos"))
      .agg(max(length(col("sub"))).as("bl"))
      .select(col("word"), col("pos"),
        (col("pos") + col("bl")).as("nxt"), lit(1L).as("cnt"))
    val end = w.select(col("word"),
      (length(col("word")) + 1).as("pos"),
      (length(col("word")) + 1).as("nxt"), lit(0L).as("cnt"))
    var f = jump0.unionByName(end).localCheckpoint(false)
    // 2^6 = 64 pieces ≥ any word the tokens() contract admits (a
    // piece is ≥ 1 char; doubling count is a constant, not data).
    for (_ <- 1 to 6) {
      f = f.as("a")
        .join(f.as("b"), col("a.word") === col("b.word") &&
          col("a.nxt") === col("b.pos"))
        .select(col("a.word").as("word"), col("a.pos").as("pos"),
          col("b.nxt").as("nxt"),
          (col("a.cnt") + col("b.cnt")).as("cnt"))
        .localCheckpoint(false)
    }
    w.join(f.filter(col("pos") === 1), Seq("word"))
      .select(col("word"), col("freq"), col("cnt").cast("int")
        .as("n_pieces"))
      .orderBy(col("freq").desc, col("word")).limit(topWords)
  }

  /** UNIGRAM-LM SUBWORD TOKENIZER (Kudo '18, the SentencePiece
    * unigram model) trained by HARD (Viterbi) EM — the third
    * tokenizer family beside the BPE merge fold and the MaxMatch
    * greedy scan, and the one that required a determinism design:
    * soft EM's forward-backward is a float sum-product no cross-engine
    * differential can pin, but VITERBI EM is a pure (min, +) fold,
    * and in FIXED-POINT INTEGER costs it is bit-exact everywhere.
    *
    * The determinism contract, shared verbatim by the DuckDB twin:
    *   - piece costs are integers: cost(v) = round(10⁶ · ln((total+V)
    *     /(count_v+1))) — add-one-smoothed negative log-probs, scaled
    *     and rounded ONCE (the ln-parity precedent); every path cost
    *     is then an exact integer sum.
    *   - the per-position DP state is ONE encoded long,
    *     cost·2¹⁶ + n_pieces·2⁸ + (255 − piece_len), so the integer
    *     MIN is simultaneously the canonical tie-break (cheapest,
    *     then fewest pieces, then longest last piece) — no struct
    *     comparators, no engine-specific ordering.
    *   - the E-step segmentation is exact Viterbi under those costs;
    *     the M-step recounts pieces from the segmentation
    *     (occurrence-weighted) and re-derives costs. Two EM rounds.
    * Encoding bounds: valid for words ≤ 255 chars and per-piece costs
    * ≤ ~3·10⁷ (10⁶·ln of any realistic mass ratio) — path cost stays
    * far below 2⁴⁷, so the shifted sum cannot overflow a long.
    *
    * Scale shape ([[trainMerges]]'s discipline): the corpus is
    * touched ONCE (word-frequency aggregate); everything else runs on
    * the weighted vocabulary (|V| rows). The DP is a per-row fold —
    * pure projection, zero shuffle; the trained codebook (≤ vocabK +
    * alphabet rows) collects to the driver between rounds exactly
    * like the BPE merge table. The DuckDB twin re-derives the SAME
    * integers through a SEQUENTIAL recursive-CTE DP — different
    * formulation, identical encoded states, which is the
    * differential's point.
    */
  def unigramSegment(docs: DataFrame, vocabK: Int = 64,
                     maxSub: Int = 4, topWords: Int = 20): DataFrame = {
    val w = wordFreq(docs).localCheckpoint()
    val cost1 = unigramRound1Costs(w, vocabK, maxSub)
    viterbiSegment(w, cost1, maxSub)
      .select(col("word"), col("freq"),
        size(col("pieces")).cast("int").as("n_pieces"), col("path_cost"))
      .orderBy(col("freq").desc, col("word")).limit(topWords)
  }

  /** The unigram trainer's re-estimated piece table after EM round 1:
    * (piece, cnt, cost) — Viterbi-weighted piece counts and the
    * add-one-smoothed integer costs the round-2 segmentation uses.
    * The cost column is computed IN SPARK SQL (round∘ln∘÷) so the
    * whole M-step sits inside the differential, not the driver.
    */
  def unigramVocab(docs: DataFrame, vocabK: Int = 64,
                   maxSub: Int = 4): DataFrame = {
    val w = wordFreq(docs).localCheckpoint()
    val cb0 = collectCodebook(unigramCodebook0(w, vocabK, maxSub))
    val seg1 = viterbiSegment(w, costsFrom(cb0), maxSub)
    val cnts = seg1.select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("n"))
    val full = w.sparkSession.createDataFrame(cb0).toDF("piece", "c0")
      .join(cnts, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("n"), lit(0L)).as("cnt"))
    val tot = full.agg(sum(col("cnt")).as("tot"),
      count(lit(1)).as("v"))
    full.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(lit(1000000.0) * log((col("tot") + col("v")).cast("double")
          / (col("cnt") + lit(1L)).cast("double")), 0).cast("long")
          .as("cost"))
  }

  /** Per-language fertility under the trained UNIGRAM tokenizer —
    * the [[fertilityByLang]] equity audit with the Viterbi-EM
    * segmentation in place of the BPE fold, so the two tokenizer
    * families' per-language costs compare on the same number. Same
    * shapes: |V|-row segmentation table broadcast onto one
    * (lang, word) keyed aggregate, integer sums, one division per
    * language.
    */
  def unigramFertilityByLang(docs: DataFrame, vocabK: Int = 64,
                             maxSub: Int = 4,
                             langCol: String = "lang"): DataFrame = {
    val w = wordFreq(docs).localCheckpoint()
    val segs = viterbiSegment(w, unigramRound1Costs(w, vocabK, maxSub),
        maxSub)
      .select(col("word").as("wd"), size(col("pieces")).as("n_syms"))
    val lw = docs.select(col(langCol),
        explode(TextOps.tokens(col("text"))).as("wd"))
      .filter(col("wd") =!= "")
      .groupBy(col(langCol), col("wd")).agg(count(lit(1)).as("nw"))
    lw.join(broadcast(segs), Seq("wd"))
      .groupBy(col(langCol))
      .agg(sum(col("nw")).as("n_words"),
        sum(col("nw") * col("n_syms")).as("n_subwords"))
      .select(col(langCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
  }

  /** (word, freq) over the corpus — the weighted vocabulary every
    * tokenizer trainer here runs on.
    */
  private def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Occurrence-weighted substring counts, lengths 1..maxSub. */
  private def subCounts(w: DataFrame, maxSub: Int): DataFrame =
    w.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  filter(transform(sequence(1, $maxSub), l ->
           |    if(i + l - 1 <= length(word),
           |       substring(word, i, l), null)),
           |    x -> x is not null)))""".stripMargin)).as("sub"))
      .groupBy(col("sub")).agg(sum(col("freq")).as("c"))

  /** Initial unigram vocabulary with seed counts: top `vocabK`
    * substrings of length ≥ 2 (count DESC, sub ASC — the MaxMatch
    * truncation) plus EVERY single character (guaranteed coverage, so
    * Viterbi always completes with no UNK).
    */
  private def unigramCodebook0(w: DataFrame, vocabK: Int,
                               maxSub: Int): DataFrame = {
    val sc = subCounts(w, maxSub).localCheckpoint()
    sc.filter(length(col("sub")) >= 2)
      .orderBy(col("c").desc, col("sub")).limit(vocabK)
      .unionByName(sc.filter(length(col("sub")) === 1))
  }

  private def collectCodebook(df: DataFrame): Seq[(String, Long)] =
    df.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq.sortBy(_._1)

  /** Add-one-smoothed fixed-point costs from (piece, count):
    * round(10⁶ · ln((total + V)/(count + 1))). Driver-side over the
    * collected codebook (≤ vocabK + alphabet rows); the DuckDB twin
    * computes the identical longs in SQL.
    */
  private def costsFrom(counts: Seq[(String, Long)]): Seq[(String, Long)] = {
    val tot = counts.map(_._2).sum
    val v = counts.size
    counts.map { case (p, c) =>
      p -> Math.round(1000000.0 *
        Math.log((tot + v).toDouble / (c + 1).toDouble))
    }
  }

  /** Round-1 Viterbi counts over the full init vocabulary (zeroes
    * kept), all collect points driver-sized codebooks.
    */
  private def unigramRound1Counts(w: DataFrame, vocabK: Int,
                                  maxSub: Int): Seq[(String, Long)] = {
    val cb0 = collectCodebook(unigramCodebook0(w, vocabK, maxSub))
    val seg1 = viterbiSegment(w, costsFrom(cb0), maxSub)
    val c1 = seg1
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    cb0.map { case (p, _) => p -> c1.getOrElse(p, 0L) }
  }

  private def unigramRound1Costs(w: DataFrame, vocabK: Int,
                                 maxSub: Int): Seq[(String, Long)] =
    costsFrom(unigramRound1Counts(w, vocabK, maxSub))

  /** VOCABULARY PRUNING round — the SentencePiece trainer's other
    * half: after the round-1 E-step, drop the `pruneK` LOWEST-COUNT
    * multi-character pieces (count ASC, piece ASC — deterministic;
    * single characters are never pruned, so coverage survives) and
    * re-segment under the re-normalized costs. Low-count pieces carry
    * almost no likelihood mass, so removing them shrinks the model
    * with negligible corpus-cost increase — the standard
    * train-big-then-prune regime. Same chain shapes as
    * [[unigramSegment]]; output contract identical.
    */
  def unigramPruneSegment(docs: DataFrame, vocabK: Int = 64,
                          maxSub: Int = 4, pruneK: Int = 32,
                          topWords: Int = 20): DataFrame = {
    val w = wordFreq(docs).localCheckpoint()
    val counts = unigramRound1Counts(w, vocabK, maxSub)
    val drop = counts.filter(_._1.length >= 2)
      .sortBy { case (p, c) => (c, p) }.take(pruneK).map(_._1).toSet
    val kept = counts.filterNot { case (p, _) => drop(p) }
    viterbiSegment(w, costsFrom(kept), maxSub)
      .select(col("word"), col("freq"),
        size(col("pieces")).cast("int").as("n_pieces"), col("path_cost"))
      .orderBy(col("freq").desc, col("word")).limit(topWords)
  }

  private def sqlStr(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Exact Viterbi segmentation of the weighted vocabulary under an
    * integer cost table: per word, a left-to-right (min, +) DP fold
    * over positions (state = the encoded long above), then a
    * backtrace fold extracting the canonical pieces. Pure projection
    * — the cost table rides along as a map literal (a broadcast
    * codebook), nothing shuffles.
    */
  private[graft] def viterbiSegment(w: DataFrame,
      costs: Seq[(String, Long)], maxSub: Int): DataFrame = {
    val mapSql = "map(" + costs.map { case (p, c) =>
      s"${sqlStr(p)}, CAST($c AS BIGINT)" }.mkString(", ") + ")"
    val dp =
      s"""aggregate(sequence(1, length(word)),
         |  array(cast(255 as bigint)),
         |  (acc, j) -> concat(acc, array(array_min(filter(transform(
         |    transform(sequence(1, $maxSub), l -> named_struct(
         |      'l', l,
         |      'c', if(l <= j, try_element_at($mapSql,
         |             substring(word, j - l + 1, l)),
         |           cast(null as bigint)))),
         |    t -> if(t.c is null, cast(null as bigint),
         |      (element_at(acc, j - t.l + 1) div 65536 + t.c) * 65536
         |      + ((element_at(acc, j - t.l + 1) % 65536) div 256 + 1)
         |        * 256
         |      + (255 - t.l))),
         |    x -> x is not null)))))""".stripMargin
    val bt =
      s"""aggregate(sequence(1, length(word)),
         |  named_struct('pos', length(word),
         |    'ps', cast(array() as array<string>)),
         |  (acc, i) -> if(acc.pos <= 0, acc, named_struct(
         |    'pos', acc.pos
         |      - (255 - cast(element_at(states, acc.pos + 1) % 256 as int)),
         |    'ps', concat(array(substring(word,
         |      acc.pos
         |        - (255 - cast(element_at(states, acc.pos + 1) % 256 as int))
         |        + 1,
         |      255 - cast(element_at(states, acc.pos + 1) % 256 as int))),
         |      acc.ps))),
         |  a -> a.ps)""".stripMargin
    w.withColumn("states", expr(dp))
      .withColumn("pieces", expr(bt))
      .withColumn("path_cost",
        expr("element_at(states, length(word) + 1) div 65536"))
  }

  def fertilityByLang(docs: DataFrame,
                      mergesLocal: Seq[(String, String)],
                      langCol: String = "lang"): DataFrame = {
    val segs = segmentedWords(docs, mergesLocal)
    val lw = docs
      .select(col(langCol), explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col(langCol), col("w")).agg(count(lit(1)).as("nw"))
    lw.join(broadcast(segs), Seq("w"))
      .groupBy(col(langCol))
      .agg(sum(col("nw")).as("n_words"),
        sum(col("nw") * col("n_syms")).as("n_subwords"))
      .select(col(langCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
  }
}
