package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup
import graft.queries.Tables

/** Training-data pipeline operator catalog: text analysis and document
  * deduplication over the `documents` table (builder brief; these have no
  * reference counterpart — correctness anchors are exact DuckDB twins,
  * kept float-free by integer-arithmetic thresholds and md5-derived
  * hashes).
  */
object PipelineCatalog {
  type Q = RelationalCatalog.Q

  // ------------------------------------------------------------ SQL twins

  /** BPE trainer chain: word-frequency base, then 8 unrolled merge
    * rounds — p_i (weighted adjacent-pair counts), b_i (the 1-row
    * argmax winner), w_i (the vocabulary re-segmented by the
    * leftmost-greedy fold, a list_reduce over a '|'-delimited
    * accumulator so a merged symbol rejoins the stream immediately).
    */
  /** Shared CTE prefix for the Fellegi-Sunter twins: the blocked
    * planted-truth candidate set of `EntityMatch.fsCandidates` — the
    * deterministic interior char-drop feed WITH its origin name, the
    * name-deduped catalog, the two-key block union, and the 4-field
    * comparison vector.
    */
  private val FsCandidatesSql: String =
    """WITH cat AS (
      |  SELECT MIN(p_partkey) AS matched_key, p_name AS matched_name,
      |    substr(lower(p_name), 1, 3) AS ck1,
      |    right(lower(p_name), 3) AS ck2
      |  FROM part GROUP BY p_name),
      |d0 AS (
      |  SELECT p_partkey AS dirty_id, p_name AS orig_name, p_name,
      |    (p_partkey % (length(p_name) - 2)) + 2 AS pos
      |  FROM part WHERE p_partkey % 7 = 0),
      |dk0 AS (
      |  SELECT dirty_id, orig_name,
      |    concat(substr(p_name, 1, CAST(pos - 1 AS INT)),
      |      substr(p_name, CAST(pos + 1 AS INT))) AS dirty_name
      |  FROM d0),
      |dk AS (
      |  SELECT dirty_id, orig_name, dirty_name,
      |    substr(lower(dirty_name), 1, 3) AS dk1,
      |    right(lower(dirty_name), 3) AS dk2
      |  FROM dk0),
      |cand0 AS (
      |  SELECT DISTINCT dirty_id, orig_name, dirty_name, matched_key,
      |    matched_name
      |  FROM (
      |    SELECT dk.dirty_id, dk.orig_name, dk.dirty_name,
      |      cat.matched_key, cat.matched_name
      |    FROM dk JOIN cat ON dk.dk1 = cat.ck1
      |      AND abs(length(dk.dirty_name)
      |        - length(cat.matched_name)) <= 2
      |    UNION ALL
      |    SELECT dk.dirty_id, dk.orig_name, dk.dirty_name,
      |      cat.matched_key, cat.matched_name
      |    FROM dk JOIN cat ON dk.dk2 = cat.ck2
      |      AND abs(length(dk.dirty_name)
      |        - length(cat.matched_name)) <= 2)),
      |cand AS (
      |  SELECT dirty_id, matched_key,
      |    matched_name = orig_name AS is_match,
      |    CASE WHEN substr(lower(dirty_name), 1, 3)
      |      = substr(lower(matched_name), 1, 3) THEN 1 ELSE 0 END
      |      AS a_first3,
      |    CASE WHEN right(lower(dirty_name), 3)
      |      = right(lower(matched_name), 3) THEN 1 ELSE 0 END
      |      AS a_last3,
      |    CASE WHEN length(dirty_name) = length(matched_name)
      |      THEN 1 ELSE 0 END AS a_len,
      |    CASE WHEN levenshtein(dirty_name, matched_name) <= 1
      |      THEN 1 ELSE 0 END AS a_lev1
      |  FROM cand0)""".stripMargin

  private val bpeCtes = {
    def round(i: Int) =
      s"""p$i AS MATERIALIZED (
         |  SELECT l, r, CAST(SUM(n) AS BIGINT) AS pair_n FROM (
         |    SELECT n, syms[i] AS l, syms[i + 1] AS r FROM (
         |      SELECT n, syms, unnest(generate_series(1, len(syms) - 1)) AS i
         |      FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (
         |  SELECT $i AS round, l, r, pair_n FROM p$i
         |  ORDER BY pair_n DESC, l, r LIMIT 1),
         |w$i AS MATERIALIZED (
         |  SELECT w, n, string_split(list_reduce(syms, (acc, x) ->
         |    CASE WHEN x = b.r AND (acc = b.l OR ends_with(acc, '|' || b.l))
         |      THEN CASE WHEN acc = b.l THEN b.l || b.r
         |        ELSE left(acc, length(acc) - length(b.l)) || b.l || b.r END
         |      ELSE acc || '|' || x END), '|') AS syms
         |  FROM w${i - 1} CROSS JOIN b$i b)""".stripMargin
    s"""tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wc AS MATERIALIZED (
       |  SELECT w, COUNT(*) AS n FROM tok WHERE w <> '' GROUP BY 1),
       |w0 AS MATERIALIZED (
       |  SELECT w, n, list_filter(string_split(w, ''), x -> x <> '') AS syms
       |  FROM wc),
       |${(1 to 8).map(round).mkString(",\n")}""".stripMargin
  }

  /** Unigram-LM Viterbi-EM twin (Bpe.unigramSegment / unigramVocab):
    * the SEQUENTIAL formulation of the trainer's per-word DP. States
    * are the SAME encoded longs as the Spark fold
    * (cost·2¹⁶ + n_pieces·2⁸ + (255 − len)), so LEAST over candidates
    * is the identical canonical tie-break; the DP walks positions via
    * a recursive CTE with one LEFT JOIN per piece length (candidates
    * END at the new position, so no truncated-substring false
    * matches), the backtrace is a second recursive CTE over the final
    * state list, and the M-step re-derives the identical
    * round(10⁶·ln((tot+V)/(cnt+1))) integer costs.
    */
  private def uniDpSql(k: Int, costTable: String): String = {
    val maxSub = 4
    val joins = (1 to maxSub).map { l =>
      s"""  LEFT JOIN $costTable p$l ON d.j + 1 >= $l
         |    AND p$l.piece = substr(d.word, d.j - ${l - 2}, $l)""".stripMargin
    }.mkString("\n")
    val cands = (1 to maxSub).map { l =>
      val prev = s"d.states[d.j - ${l - 2}]"
      s"""CASE WHEN p$l.cost IS NOT NULL THEN
         |      ($prev // 65536 + p$l.cost) * 65536
         |      + (($prev % 65536) // 256 + 1) * 256 + ${255 - l} END""".stripMargin
    }.mkString(",\n    ")
    s"""dp$k(word, j, states) AS (
       |  SELECT word, 0, [CAST(255 AS BIGINT)] FROM w
       |  UNION ALL
       |  SELECT d.word, d.j + 1, list_append(d.states, least(
       |    $cands))
       |  FROM dp$k d
       |$joins
       |  WHERE d.j < len(d.word)),
       |fin$k AS MATERIALIZED (
       |  SELECT word, states FROM dp$k WHERE j = len(word)),
       |bt$k(word, pos, pieces) AS (
       |  SELECT word, len(word), CAST([] AS VARCHAR[]) FROM w
       |  UNION ALL
       |  SELECT b.word,
       |    b.pos - (255 - CAST(f.states[b.pos + 1] % 256 AS INT)),
       |    list_prepend(substr(b.word,
       |      b.pos - (255 - CAST(f.states[b.pos + 1] % 256 AS INT)) + 1,
       |      255 - CAST(f.states[b.pos + 1] % 256 AS INT)), b.pieces)
       |  FROM bt$k b JOIN fin$k f USING (word)
       |  WHERE b.pos > 0),
       |seg$k AS MATERIALIZED (
       |  SELECT word, pieces FROM bt$k WHERE pos = 0)""".stripMargin
  }

  private val unigramCtes =
    s"""w AS MATERIALIZED (
       |  SELECT tok AS word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(text, ' ')) AS tok
       |    FROM documents)
       |  WHERE tok <> '' GROUP BY 1),
       |subs AS MATERIALIZED (
       |  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS sub,
       |    CAST(SUM(freq) AS BIGINT) AS c
       |  FROM w, range(1, 256) r(i), range(1, 5) s(l)
       |  WHERE i + l - 1 <= len(word)
       |  GROUP BY 1),
       |top2 AS (SELECT sub, c FROM (
       |    SELECT sub, c, row_number() OVER (ORDER BY c DESC, sub) AS rn
       |    FROM subs WHERE len(sub) >= 2)
       |  WHERE rn <= 64),
       |vocab0 AS MATERIALIZED (SELECT sub AS piece, c FROM top2
       |  UNION ALL SELECT sub, c FROM subs WHERE len(sub) = 1),
       |vt0 AS (SELECT CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS v
       |  FROM vocab0),
       |cost0 AS MATERIALIZED (SELECT piece,
       |    CAST(round(1000000.0 * ln(CAST(tot + v AS DOUBLE)
       |      / CAST(c + 1 AS DOUBLE)), 0) AS BIGINT) AS cost
       |  FROM vocab0 CROSS JOIN vt0),
       |${uniDpSql(1, "cost0")},
       |cnt1 AS MATERIALIZED (
       |  SELECT piece, CAST(SUM(freq) AS BIGINT) AS n FROM (
       |    SELECT w.freq, unnest(s.pieces) AS piece
       |    FROM seg1 s JOIN w USING (word))
       |  GROUP BY 1),
       |full1 AS MATERIALIZED (
       |  SELECT c0.piece, COALESCE(c1.n, CAST(0 AS BIGINT)) AS cnt
       |  FROM cost0 c0 LEFT JOIN cnt1 c1 USING (piece)),
       |vt1 AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v
       |  FROM full1),
       |cost1 AS MATERIALIZED (SELECT piece,
       |    CAST(round(1000000.0 * ln(CAST(tot + v AS DOUBLE)
       |      / CAST(cnt + 1 AS DOUBLE)), 0) AS BIGINT) AS cost
       |  FROM full1 CROSS JOIN vt1)""".stripMargin

  /** One DoReMi multiplicative-weights step twin (Mixing.doremiWeights):
    * expected loss and the renormalizer as source-ordered folds, the
    * update as the shared (1 + η·excess) product tree.
    */
  private def doremiStepSql(t: Int): String = {
    val prev = s"dom${t - 1}"
    s"""el$t AS MATERIALIZED (SELECT list_reduce(list(w * lnorm ORDER BY source),
       |    (a, b) -> a + b) AS el FROM $prev),
       |up$t AS MATERIALIZED (SELECT source, n_docs, lnorm,
       |    w * (1.0 + 0.5 * (lnorm - el)) AS w
       |  FROM $prev CROSS JOIN el$t),
       |z$t AS MATERIALIZED (SELECT list_reduce(list(w ORDER BY source),
       |    (a, b) -> a + b) AS z FROM up$t),
       |dom$t AS MATERIALIZED (SELECT source, n_docs, lnorm, w / z AS w
       |  FROM up$t CROSS JOIN z$t)""".stripMargin
  }

  /** Corpus with injected NEAR-duplicates (Dedup.withNearDuplicates). */
  private val corpusNearSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         substr(text, strpos(text, ' ') + 1) AS text
      |  FROM documents WHERE doc_id % 50 = 0)""".stripMargin

  /** Corpus with injected EXACT duplicates (Dedup.withExactDuplicates). */
  private val corpusExactSql =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 40 = 0)""".stripMargin

  /** Distinct 3-token shingles per doc (TextOps.shingles twin). */
  private val shinglesSql =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
      |ex AS (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i FROM toks),
      |sh AS (SELECT DISTINCT doc_id,
      |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      |       FROM ex)""".stripMargin

  /** CTE chain ending in `pairs` — exact-Jaccard near-dup pairs at
    * J ≥ 7/10, shared by the pair queries and the clustering oracle.
    */
  private val pairsCteSql =
    s"""$corpusNearSql,
       |$shinglesSql,
       |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersect_n
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT doc_a, doc_b, intersect_n,
       |    sa.sz + sb.sz - intersect_n AS union_n
       |  FROM inter
       |  JOIN sz sa ON inter.doc_a = sa.doc_id
       |  JOIN sz sb ON inter.doc_b = sb.doc_id
       |  WHERE intersect_n * 10 >= (sa.sz + sb.sz - intersect_n) * 7)""".stripMargin

  /** Shared bigram-LM CTE chain ending in
    * `lm(doc_id, n_bigrams, avg_logp)` — the trainer+scorer twin of
    * LangModel.bigramScore, used by both q_lm_score and q_lm_buckets.
    */
  private val lmCtesSql =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (
      |  SELECT doc_id, i - 1 AS pos, t[i] || ' ' || t[i+1] AS bigram,
      |    t[i] AS w1
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |        FROM toks)),
      |c2 AS (SELECT bigram, COUNT(*) AS n2 FROM bg GROUP BY 1),
      |c1 AS (SELECT w1, COUNT(*) AS n1 FROM bg GROUP BY 1),
      |v AS (
      |  SELECT COUNT(DISTINCT tok) AS vsz
      |  FROM (SELECT unnest(t) AS tok FROM toks)),
      |lp AS (
      |  SELECT bg.doc_id, bg.pos,
      |    ln(CAST(c2.n2 + 1 AS DOUBLE) / CAST(c1.n1 + v.vsz AS DOUBLE))
      |      AS logp
      |  FROM bg JOIN c2 USING (bigram) JOIN c1 ON bg.w1 = c1.w1
      |  CROSS JOIN v),
      |agg AS (
      |  SELECT doc_id, COUNT(*) AS n_bigrams,
      |    list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) AS s
      |  FROM lp GROUP BY 1),
      |lm AS (
      |  SELECT doc_id, n_bigrams, round(s / n_bigrams, 6) AS avg_logp
      |  FROM agg)""".stripMargin

  /** Naive Bayes CTE chain (TextClassify.naiveBayes twin) ending in
    * `fin(doc_id, actual, cls, score, rk)` — rk = 1 rows are the
    * verdicts. Shared by q_nb_classifier (verdict projection) and
    * q_nb_eval (per-class confusion tail).
    */
  /** The calibration-bin CTE chain (TextClassify.nbCalibration twin)
    * ending in `calib(bin, n_docs, n_correct, accuracy, mean_margin)`
    * — shared by q_nb_calibration and the isotonic fit on top.
    */
  private lazy val calibCtesSql =
    s"""$nbCtesSql,
       |top1 AS (SELECT doc_id, cls AS pred, actual, score AS s1
       |         FROM fin WHERE rk = 1),
       |top2 AS (SELECT doc_id, score AS s2 FROM fin WHERE rk = 2),
       |mrg AS (
       |  SELECT (t1.pred = t1.actual) AS correct,
       |    CAST(round((s1 - s2) * 1e6) AS BIGINT) AS mfp
       |  FROM top1 t1 JOIN top2 USING (doc_id)),
       |bb AS (
       |  SELECT CAST(least(mfp // 2000000, 9) AS INT) AS bin,
       |    correct, mfp
       |  FROM mrg),
       |calib AS MATERIALIZED (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_correct,
       |    round(CAST(SUM(CASE WHEN correct THEN 1 ELSE 0 END)
       |        AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
       |    round(CAST(SUM(mfp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |      / 1e6, 6) AS mean_margin
       |  FROM bb GROUP BY 1)""".stripMargin

  private val nbCtesSql =
    """toks AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t
      |  FROM documents),
      |ptoks AS (
      |  SELECT doc_id, lang AS cls, i - 1 AS pos, t[i] AS tok
      |  FROM (SELECT doc_id, lang, t, unnest(range(1, len(t) + 1)) AS i
      |        FROM toks)),
      |train AS (SELECT * FROM ptoks WHERE doc_id % 5 <> 0),
      |test AS (SELECT doc_id, cls AS actual, pos, tok FROM ptoks
      |         WHERE doc_id % 5 = 0),
      |ct AS (SELECT cls, tok, COUNT(*) AS n_tc FROM train GROUP BY 1, 2),
      |ctot AS (SELECT cls, COUNT(*) AS n_c FROM train GROUP BY 1),
      |v AS (SELECT COUNT(DISTINCT tok) AS vsz FROM train),
      |td AS (SELECT lang AS cls, COUNT(*) AS n_docs FROM documents
      |       WHERE doc_id % 5 <> 0 GROUP BY 1),
      |ta AS (SELECT COUNT(*) AS n_all FROM documents
      |       WHERE doc_id % 5 <> 0),
      |pri AS (SELECT cls, ln(CAST(n_docs AS DOUBLE) / n_all)
      |          AS log_prior
      |        FROM td CROSS JOIN ta),
      |sc AS (
      |  SELECT te.doc_id, te.actual, p.cls, te.pos,
      |    ln(CAST(COALESCE(ct.n_tc, 0) + 1 AS DOUBLE)
      |       / CAST(ctot.n_c + v.vsz AS DOUBLE)) AS logp
      |  FROM test te CROSS JOIN (SELECT cls FROM pri) p
      |  LEFT JOIN ct ON ct.cls = p.cls AND ct.tok = te.tok
      |  JOIN ctot ON ctot.cls = p.cls CROSS JOIN v),
      |pc AS (
      |  SELECT doc_id, actual, cls,
      |    list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) AS s
      |  FROM sc GROUP BY 1, 2, 3),
      |fin AS (
      |  SELECT pc.doc_id, pc.actual, pc.cls,
      |    pri.log_prior + pc.s AS score,
      |    row_number() OVER (PARTITION BY pc.doc_id
      |      ORDER BY pri.log_prior + pc.s DESC, pc.cls) AS rk
      |  FROM pc JOIN pri ON pc.cls = pri.cls)""".stripMargin

  /** BM25 CTE chain (Retrieval.bm25TopK twin) ending in the ranked list
    * `bmr(query_id, doc_id, rnk, score)` — shared by q_bm25 (top-5 cut)
    * and q_hybrid_rrf (top-10 lexical leg). Also defines `toks`, which
    * the RRF dense leg reuses.
    */
  private val bm25CtesSql =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |st AS (
      |  SELECT COUNT(*) AS n_docs, SUM(len(t)) AS total_dl FROM toks),
      |qi AS (
      |  SELECT doc_id AS query_id, t, unnest(range(1, len(t) + 1)) AS i
      |  FROM toks WHERE doc_id % 100 = 0 AND doc_id < 1000000),
      |qf AS (
      |  SELECT query_id, t[i] AS token, MIN(i) AS fp
      |  FROM qi GROUP BY 1, 2),
      |q AS (
      |  SELECT query_id, token FROM (
      |    SELECT query_id, token, row_number() OVER (
      |      PARTITION BY query_id ORDER BY fp) AS rn FROM qf)
      |  WHERE rn <= 3),
      |tok AS (
      |  SELECT doc_id, len(t) AS dl, unnest(t) AS token FROM toks),
      |mt AS (
      |  SELECT doc_id, token, dl FROM tok
      |  WHERE token IN (SELECT DISTINCT token FROM q)),
      |tf AS (
      |  SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl
      |  FROM mt GROUP BY 1, 2),
      |df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      |ts AS (
      |  SELECT q.query_id, tf.doc_id,
      |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
      |      * (tf * (1.2 + 1.0))
      |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
      |          / (CAST(total_dl AS DOUBLE) / n_docs))) AS ts
      |  FROM tf JOIN df USING (token) JOIN q USING (token)
      |  CROSS JOIN st),
      |sc AS (
      |  SELECT query_id, doc_id,
      |    CAST(round(list_reduce(list_sort(list(ts)), (x, y) -> x + y),
      |      6) AS DECIMAL(18,6)) AS score
      |  FROM ts GROUP BY 1, 2),
      |bmr AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY score DESC, doc_id) AS INT) AS rnk FROM sc)""".stripMargin

  /** The shared oracle for both the inverted-index exact path and the
    * MinHash-LSH path.
    */
  private val jaccardPairsSql =
    s"""WITH $pairsCteSql
       |SELECT doc_a, doc_b, intersect_n, union_n FROM pairs""".stripMargin

  /** Clustering oracle: recursive transitive closure over the pair
    * graph; canonical = min reachable id (incl. self).
    */
  private val clustersSql =
    s"""WITH RECURSIVE $pairsCteSql,
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
       |SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
       |FROM reach GROUP BY a""".stripMargin

  /** SimHash twin: generated 60-bit vote/assemble SQL. */
  private val simhashSql = {
    val votes = (0 until 60)
      .map(j => s"SUM(((h >> $j) & 1) * 2 - 1) AS s$j").mkString(", ")
    val sig = (0 until 60)
      .map(j => s"CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END")
      .mkString(" + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM tok),
       |v AS (SELECT doc_id, $votes FROM h GROUP BY doc_id)
       |SELECT doc_id, $sig AS simhash FROM v""".stripMargin
  }

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // Token counting: whitespace tokenizer + BPE-ish regex runs.
    "q_doc_tokens" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.distinctTokenCount(col("text")).as("n_distinct_tokens"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe_tokens"))),

    // Quality scoring: integer length/diversity/stopword stats + bucket.
    "q_doc_quality" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        length(col("text")).as("n_chars"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.distinctTokenCount(col("text")).as("n_distinct_tokens"),
        TextOps.stopwordCount(col("text")).as("n_stop"))
        .withColumn("quality",
          when(col("n_tokens") >= 40 &&
            col("n_distinct_tokens") * 100 >= col("n_tokens") * 30, "good")
            .when(col("n_tokens") >= 10, "fair")
            .otherwise("poor"))),

    // Language-ID heuristic: stopword-ratio threshold (n-gram-free stub —
    // the substrate text is synthetic; the operator shape is the point).
    "q_doc_langid" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.stopwordCount(col("text")).as("n_stop"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
        .withColumn("predicted",
          when(col("n_stop") * 100 >= col("n_tokens") * 12, "en")
            .otherwise("und"))),

    // Document fingerprinting: md5, 60-bit integer, and rolling hash.
    "q_doc_fingerprint" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.fingerprintMd5(col("text")).as("fp_md5"),
        TextOps.fingerprint64(col("text")).as("fp64"),
        TextOps.rollingHash(col("text")).as("fp_rolling"))),

    // Exact dedup over a corpus with injected exact copies.
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exactDuplicateGroups(
        Dedup.withExactDuplicates(Tables.documents(s, d)))),

    // The spark.sql TEXT surface over the documents view (VERDICT r9
    // #5): exact-dup groups as SQL text — the same injected corpus,
    // md5 fingerprint groupBy, HAVING n > 1; one oracle gates both.
    "q_sql_dedup_exact" -> ((s, d) => {
      graft.queries.Views.register(s, d)
      s.sql("""
        WITH corpus AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id, text
          FROM documents WHERE doc_id % 40 = 0)
        SELECT md5(text) AS fingerprint, MIN(doc_id) AS keeper_doc_id,
          COUNT(*) AS n
        FROM corpus GROUP BY 1 HAVING COUNT(*) > 1""")
    }),

    // Exact n-gram Jaccard near-dup pairs (shingle inverted index).
    // maxDocFreq=50 (r8): a strict no-op at oracle scales (max
    // word-trigram df measured 7 at sf0.01, 26 at sf0.1) that bounds
    // the Σ df² pair stream on boilerplate-saturated corpora — the
    // sf1 probe's saturated substrate ran this entry UNCAPPED at
    // 27.8-203 s (cache-state-dependent) vs ~10 s capped.
    "q_dedup_jaccard" -> ((s, d) =>
      Dedup.exactJaccardPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)),
        maxDocFreq = Some(50))),

    // Train/heldout split-leakage audit: the verified near-dup pairs
    // classified by a deterministic id split — cross_split pairs are
    // eval contamination. Same substrate and pair contract as
    // q_dedup_jaccard.
    "q_split_leakage" -> ((s, d) =>
      Dedup.splitLeakage(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // MinHash-LSH near-dup pairs (banded buckets + exact verify) — same
    // contract, same oracle as q_dedup_jaccard.
    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashVerifiedPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // Winnow-seeded verified pairs — third candidate generator under the
    // SAME oracle as the exact and MinHash paths (pair-identical).
    "q_dedup_winnow_verified" -> ((s, d) =>
      Dedup.winnowVerifiedPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // Prefix-filtered pairs (PPJoin prefix principle) — fourth candidate
    // generator under the same oracle: only each doc's rarest
    // |d|−⌈t·|d|⌉+1 shingles feed the candidate join. maxDocFreq=50
    // (r8, matching the exact-index entry): on a vocabulary-saturated
    // corpus even the rarest prefix shingles go hot and candidates grew
    // 142× on 10× docs in the sf1 probe — the cap bounds that, a no-op
    // at oracle scales.
    "q_dedup_prefix" -> ((s, d) =>
      Dedup.prefixFilteredPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)),
        maxDocFreq = Some(50))),

    // Per-doc n-gram novelty: fraction of a doc's shingles occurring in
    // no other doc — the inverse-boilerplate / memorization signal.
    "q_novelty" -> ((s, d) =>
      Dedup.noveltyScores(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // Edit-distance near-dup pairs: 8-shingle candidates + exact
    // Levenshtein (the injected near-dups differ by one leading token).
    "q_dedup_edit" -> ((s, d) =>
      Dedup.editDistancePairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // SimHash 60-bit signatures (md5-derived, oracle-reproducible).
    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashSignatures(Tables.documents(s, d))),

    // Pairs → clusters: connected components by iterative min-label
    // propagation; oracle is a recursive transitive closure.
    "q_dedup_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(
        Dedup.minhashVerifiedPairs(
          Dedup.withNearDuplicates(Tables.documents(s, d))))),

    // SimHash pairs by band probing: 4×15-bit slice joins (pigeonhole:
    // hamming ≤ 3 < 4 bands ⇒ ≥1 identical slice) + exact popcount
    // verify — the pairing step on top of q_dedup_simhash's signature.
    "q_dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashBandPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // Three-stage dedup funnel audit (raw → exact → near-dup reps)
    // over a substrate carrying BOTH injected exact and near dups —
    // the release-note "removed X% exact, Y% near" line.
    "q_dedup_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val corpus = Dedup.withNearDuplicates(docs).unionByName(
        docs.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      Dedup.dedupPipelineAudit(corpus)
    }),

    // Same components, alternating large-star/small-star (log²-round
    // MapReduce CC) — same substrate, same transitive-closure oracle,
    // different round complexity (diameter vs log²).
    "q_dedup_cc_star" -> ((s, d) =>
      Dedup.connectedComponentsStar(
        Dedup.minhashVerifiedPairs(
          Dedup.withNearDuplicates(Tables.documents(s, d))))),

    // Deterministic sampling flag + stable train/val/test split — two
    // INDEPENDENT hash draws (split key salted), reproducible across
    // runs, retries and engines.
    "q_sample_split" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("sampled",
          graft.operators.Sampling.hashBucket(col("doc_id")) < 20)
        .withColumn("split", graft.operators.Sampling.splitAssign(
          concat(col("doc_id").cast("string"), lit(":split"))))),

    // Benchmark decontamination: training docs sharing any 8-token
    // shingle with the (derived) eval suite, with shared-shingle counts.
    // The eval set is a tail-substring of every 50th doc — guaranteed
    // long-n-gram overlap with its source, the planted contamination.
    // doc_id < 1e6 pins the eval PANEL to the base key universe: an
    // eval suite is fixed-size, it does not grow with the training
    // corpus (no-op at oracle scales; fixes the panel×corpus coupling
    // the r8 sf1 probe flagged on the retrieval family).
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val eval = docs
        .filter(col("doc_id") % 50 === 0 && col("doc_id") < 1000000L)
        .select(expr("substring(text, instr(text, ' ') + 1)").as("text"))
      graft.operators.Curation.contaminationStats(docs, eval)
    }),

    // Repetition-based quality filter (Gopher-style), integer-exact.
    "q_repetition" -> ((s, d) =>
      graft.operators.Curation.repetitionStats(Tables.documents(s, d))),

    // Top-3 tf-idf terms per doc (real ln idf — probed bit-identical
    // between JVM Math.log and DuckDB ln, incl. the HotSpot intrinsic).
    "q_tfidf" -> ((s, d) =>
      graft.operators.Curation.tfidfTopK(Tables.documents(s, d))),

    // Distinctive terms per source (Monroe et al. "Fightin' Words"
    // log-odds with a Dirichlet prior): exact counts, fixed ln/√
    // double chain mirrored verbatim, ranking on the ROUNDED z —
    // the shrinkage-aware alternative to tf-idf for source triage.
    "q_distinctive_terms" -> ((s, d) =>
      graft.operators.Curation.distinctiveTerms(Tables.documents(s, d))),

    // JSONL sink/source ROUND-TRIP: write the corpus as JSON lines,
    // re-read with a declared schema, return the re-read rows — the
    // oracle (plain parquet read) gates that the text survives JSON
    // encoding byte-exactly.
    "q_docs_jsonl" -> ((s, d) => {
      val path = Tables.roundTripPath("jsonl", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").json(path)
      s.read.schema("doc_id BIGINT, text STRING").json(path)
        .select(col("doc_id"), col("text"))
    }),

    // ORC sink/source ROUND-TRIP: the third on-disk format family
    // (columnar like parquet, distinct reader/writer path) under the
    // same parquet-truth oracle.
    "q_docs_orc" -> ((s, d) => {
      val path = Tables.roundTripPath("orc", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").orc(path)
      s.read.schema("doc_id BIGINT, text STRING").orc(path)
        .select(col("doc_id"), col("text"))
    }),

    // Concat-and-chunk sequence packing: per-shard cumulative offsets
    // and fixed-length sequence assignment (the LLM batching step).
    "q_pack_sequences" -> ((s, d) =>
      graft.operators.Curation.packSequences(Tables.documents(s, d))),

    // Padding-waste audit: pad-per-doc vs concat-and-chunk, all
    // integer (ceil = integer div) until one rounded division.
    "q_pack_efficiency" -> ((s, d) =>
      graft.operators.Curation.packEfficiency(Tables.documents(s, d))),

    // CSV sink/source ROUND-TRIP (the S1 family's on-disk gate): write
    // the corpus as headered CSV, re-read with the declared schema.
    "q_docs_csv" -> ((s, d) => {
      val path = Tables.roundTripPath("csv", d)
      Tables.documents(s, d).select(col("doc_id"), col("text"))
        .write.mode("overwrite").option("header", "true").csv(path)
      s.read.schema("doc_id BIGINT, text STRING")
        .option("header", "true").csv(path)
        .select(col("doc_id"), col("text"))
    }),

    // Corpus vocabulary: term frequency + document frequency per token.
    "q_vocab" -> ((s, d) => {
      val tok = Tables.documents(s, d).select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      tok.groupBy(col("tok")).agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
    }),

    // PSI distribution drift between the even- and odd-id document
    // halves over n_chars: fixed 100-wide bins, add-one-smoothed
    // shares, bin-ordered contribution fold — the population-level
    // drift monitor (embeddingDrift's no-id-alignment complement).
    "q_psi_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Profile.psiDrift(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "n_chars")
    }),

    // PSI unrolled over epoch-week periods vs the first one — the
    // drift monitor as the time series a dashboard plots; reference
    // period scores exactly 0.
    "q_psi_timeline" -> ((s, d) =>
      graft.operators.Profile.psiTimeline(Tables.events(s, d))),

    // Two-sample Kolmogorov–Smirnov statistic between the R- and
    // N-returnflag extended-price distributions: the BINLESS drift
    // read beside q_psi_drift — exact empirical CDFs at every
    // observed value via the two-level prefix sum (bucket offsets
    // from a ≤256-row window + keyed in-bucket cumulatives), never a
    // data-wide global window.
    "q_ks_drift" -> ((s, d) =>
      graft.operators.Profile.ksDrift(Tables.lineitem(s, d),
        "l_extendedprice", "l_returnflag", "R", "N")),

    // DoReMi-style domain reweighting: per-source cross-entropy under
    // the corpus unigram LM (1e-9 fixed-point ln sums in DECIMAL —
    // exact past the bigint ceiling), then 5 multiplicative-weights
    // steps from the proportional baseline, each upweighting domains
    // whose loss exceeds the current mix's expected loss. Trainer AND
    // every reweighting step inside the differential.
    "q_doremi_mix" -> ((s, d) =>
      graft.operators.Mixing.doremiWeights(
        Tables.documents(s, d), "source")),

    // Per-language quality rank blend: three signals percent-ranked
    // within the doc's language ((signal, doc_id) total order — no tie
    // ambiguity), averaged. One shuffle, three windows on the same
    // partition key.
    "q_quality_rank_blend" -> ((s, d) =>
      graft.operators.Curation.qualityRankBlend(Tables.documents(s, d))),

    // OOV-rate curve over candidate vocab sizes V ∈ {5, 10, 20}:
    // fraction of token occurrences outside the top-V vocabulary — the
    // vocabulary-sizing elbow read. Distributed top-V (take-ordered,
    // never a vocab-wide global sort), one broadcast join, all cutoffs
    // in one aggregate pass. (Cutoffs sized to the synthetic corpus's
    // 31-token unigram vocabulary so every curve point is non-trivial;
    // a natural corpus uses 10^4-10^5 — a parameter, same plan.)
    "q_oov_rate" -> ((s, d) =>
      graft.operators.Curation.oovRateCurve(Tables.documents(s, d))),

    // BPE tokenizer training: 8 greedy pair merges over the corpus's
    // character sequences — corpus touched once (word-frequency agg),
    // every round runs on the weighted vocabulary; the 1-row argmax
    // winner broadcasts onto the merge fold. Every round is inside
    // the differential.
    "q_bpe_merges" -> ((s, d) =>
      graft.operators.Bpe.trainMerges(Tables.documents(s, d))),

    // MaxMatch (WordPiece-inference) greedy subword segmentation:
    // frequency-truncated substring vocab (k=64, len 2..4 + every
    // char) and the POINTER-DOUBLED jump-table segmentation — the
    // parallel formulation of the paper's sequential scan; the
    // DuckDB twin walks the same vocab with a recursive CTE.
    "q_maxmatch_segment" -> ((s, d) =>
      graft.operators.Bpe.maxMatchSegment(Tables.documents(s, d))),

    // Unigram-LM tokenizer (Kudo '18) by Viterbi HARD EM — the third
    // tokenizer family, made cross-engine-deterministic by fixed-point
    // integer piece costs and a single encoded-long DP state whose
    // integer MIN is the canonical tie-break. Two EM rounds, every
    // step inside the differential (the twin re-runs the DP as a
    // sequential recursive CTE).
    "q_unigram_segment" -> ((s, d) =>
      graft.operators.Bpe.unigramSegment(Tables.documents(s, d))),

    // The trainer's M-step artifact: Viterbi-weighted piece counts
    // and re-estimated integer costs after round 1 (cost arithmetic
    // in Spark SQL, not the driver).
    "q_unigram_vocab" -> ((s, d) =>
      graft.operators.Bpe.unigramVocab(Tables.documents(s, d))),

    // Tokenizer-equity audit under the unigram model — the
    // q_bpe_fertility number for the second trained family, so the
    // two tokenizers compare per language on the same metric.
    "q_unigram_fertility" -> ((s, d) =>
      graft.operators.Bpe.unigramFertilityByLang(Tables.documents(s, d))),

    // SentencePiece-style vocabulary PRUNE round: drop the 32
    // lowest-count multi-char pieces after round-1 counts (chars
    // never pruned — coverage survives), re-segment under the
    // renormalized costs.
    "q_unigram_prune" -> ((s, d) =>
      graft.operators.Bpe.unigramPruneSegment(Tables.documents(s, d))),

    // LSH banding design table: P(candidate | J) = 1 − (1 − Jʳ)ᵇ for
    // every (b, r) split of a 16-slot signature — powers as repeated
    // left-associated multiplication (no pow() ULP surface).
    "q_lsh_scurve" -> ((s, d) =>
      graft.operators.Dedup.lshSCurve()),

    // BPE apply-side: segment the corpus with the just-trained merge
    // table (collected — it is 8 rows of trained parameters, a
    // codebook) and count the resulting subword units.
    "q_bpe_segment" -> ((s, d) => {
      val m = graft.operators.Bpe.trainMerges(Tables.documents(s, d))
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.Bpe.applyMerges(Tables.documents(s, d), m)
    }),

    // Tokenizer fertility per language under the just-trained BPE-8
    // table: subword units per word within each language — the
    // tokenizer-equity audit (a vocab trained on a mixed corpus
    // fragments minority-language words into more units). Trainer,
    // segmentation fold, and the per-language division all inside the
    // differential.
    "q_bpe_fertility" -> ((s, d) => {
      val m = graft.operators.Bpe.trainMerges(Tables.documents(s, d))
        .orderBy(col("round")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      graft.operators.Bpe.fertilityByLang(Tables.documents(s, d), m)
    }),

    // Length-bucketed batching prep: docs per 32-token bucket.
    "q_length_buckets" -> ((s, d) =>
      Tables.documents(s, d)
        .select(floor(TextOps.tokenCount(col("text")) / 32)
          .cast("int").as("len_bucket"))
        .groupBy(col("len_bucket")).agg(count(lit(1)).as("n_docs"))),

    // Text normalization for dedup preprocessing: a deterministically
    // mutated raw corpus (upper-cased head + punctuation tail, built
    // identically in the oracle) pushed through case-fold / punct-strip /
    // whitespace-collapse.
    "q_text_normalize" -> ((s, d) => {
      val raw = concat(upper(expr("substring(text, 1, 20)")),
        expr("substring(text, 21, 1000000)"), lit(" -- EOF!!"))
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.normalize(raw).as("norm_text"))
        .withColumn("n_tokens_norm",
          TextOps.tokenCount(col("norm_text")))
    }),

    // Token-budget truncation: cap every doc at 64 tokens.
    "q_truncate_tokens" -> ((s, d) =>
      graft.operators.Curation.truncateTokens(Tables.documents(s, d))),

    // Corpus top bigrams by TOTAL occurrences, deterministic cutoff.
    "q_top_ngrams" -> ((s, d) =>
      graft.operators.Curation.topNgrams(Tables.documents(s, d))),

    // Duplicate-passage scan: 8-token windows shared by >1 doc (the
    // near-dup-injected corpus guarantees cross-doc repeats).
    "q_dedup_passages" -> ((s, d) =>
      Dedup.duplicatePassages(
        Dedup.withNearDuplicates(Tables.documents(s, d)), 8)),

    // Classifier-style quality score: linear model over extracted
    // features (fixed stand-in weights), thresholded keep verdict.
    "q_quality_score" -> ((s, d) =>
      graft.operators.Curation.qualityScore(Tables.documents(s, d))),

    // Winnowing-based near-dup candidates: ≥2 shared winnow fingerprints
    // over the near-dup-injected corpus (1/w-compressed inverted index).
    "q_dedup_winnow" -> ((s, d) =>
      Dedup.winnowCandidatePairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // Cross-source winnow-fingerprint overlap matrix: shared distinct
    // fingerprints, per-source totals, Jaccard for every source pair —
    // the corpus-composition audit (are two acquisition streams
    // independent or re-crawls?). All 190 pairs are non-empty on this
    // substrate (probed: 3.6k shared fps at sf0.01), so the
    // differential actually exercises the intersection arithmetic.
    "q_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d))),

    // Greedy source-coverage ranking: the submodular-coverage greedy
    // over distinct 3-gram shingles — first 5 picks with exact
    // integer marginals (count DESC, source ASC argmax each round).
    "q_source_coverage" -> ((s, d) =>
      graft.operators.Curation.sourceCoverageGreedy(
        Tables.documents(s, d))),

    // KMV distinct sketch: per-lang distinct-doc estimate at k=64 (langs
    // hold >64 docs, so the ESTIMATION path fires, not the exact one).
    "q_kmv_distinct" -> ((s, d) =>
      graft.operators.Sketch.kmvDistinctByGroup(
        Tables.documents(s, d).select(col("lang"), col("doc_id")),
        "lang", "doc_id", 64)),

    // HyperLogLog (m=64 registers): distinct users per event type, the
    // register-based sketch next to KMV's order-statistics one; exact
    // countDistinct rides along so the differential also gates accuracy.
    "q_hll_distinct" -> ((s, d) =>
      graft.operators.Sketch.hllDistinctByGroup(
        Tables.events(s, d).select(col("event_type"), col("user_id")),
        "event_type", "user_id")),

    // Count-min heavy hitters: top-20 exact token counts next to their
    // CMS estimates (3×256 cells) — overestimates and all are part of
    // the differential contract.
    "q_heavy_hitters" -> ((s, d) =>
      graft.operators.Sketch.cmsHeavyHitters(Tables.documents(s, d))),

    // Per-language CMS heavy hitters: each lang gets its own counter
    // matrix and top-5 — the multi-tenant sketch (one hot tenant
    // can't evict the others' hitters).
    "q_heavy_hitters_by_lang" -> ((s, d) =>
      graft.operators.Sketch.cmsHeavyHittersByGroup(
        Tables.documents(s, d), "lang")),

    // Jaccard CONTAINMENT pairs (asymmetric near-dup): doc_sub's shingle
    // set ≥ 9/10 inside doc_sup's — catches short-inside-long quoting
    // that symmetric Jaccard misses. Near-dup injected corpus: the
    // trimmed copy is fully contained in its source.
    "q_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(
        Dedup.withNearDuplicates(Tables.documents(s, d)))),

    // C4-style passage EXCISION: cut corpus-duplicated 8-token windows
    // out of each doc (every doc survives; n_removed counts cut tokens).
    "q_dedup_passages_excise" -> ((s, d) =>
      Dedup.excisePassages(
        Dedup.withNearDuplicates(Tables.documents(s, d)), 8)),

    // Exact SUBSTRING dedup (Lee et al. ExactSubstr, r9): maximal
    // cross-document shared regions of ≥8 tokens at arbitrary offsets,
    // with boundaries and the recovered span text — anchor-window
    // islands, never a suffix array, never doc×doc.
    "q_dedup_substring" -> ((s, d) =>
      Dedup.exactSubstringSpans(
        Dedup.withNearDuplicates(Tables.documents(s, d)), 8)),

    // Shard-boundary stitch recovery (r9): chunk the corpus with
    // 8-token overlaps, drop the provenance, and recover candidate
    // adjacency purely from content — A's last 8 tokens == B's first
    // 8. One head/tail projection + one gram-keyed join, never
    // fragment×fragment.
    "q_stitch_chunks" -> ((s, d) =>
      Dedup.stitchCandidates(
        graft.operators.Curation.chunkOverlap(Tables.documents(s, d))
          .select((col("doc_id") * 10000 + col("chunk_id")).as("frag_id"),
            col("chunk_text").as("text")), 8)),

    // Domain balancing cap (r9): at most 15 docs per source, best
    // quality first (distinct-token score, doc_id tiebreak) — the
    // survivors table with per-domain ranks, one partitioned window.
    "q_domain_cap" -> ((s, d) =>
      graft.operators.Curation.domainCap(Tables.documents(s, d))),

    // Exact-substring EXCISION (r9): the apply side of
    // q_dedup_substring with the faithful ExactSubstr keep-one rule —
    // duplicated 8-windows cut everywhere EXCEPT the min-doc holder.
    "q_substring_excise" -> ((s, d) =>
      Dedup.exciseSubstrings(
        Dedup.withNearDuplicates(Tables.documents(s, d)), 8)),

    // Dedup-method agreement audit (r9): exact-Jaccard pairs vs
    // SimHash band pairs, one full-outer join, three counts. The
    // jaccard leg carries the standard maxDocFreq=50 hot-shingle cap
    // (no-op at oracle scale, exactly like q_dedup_jaccard's; without
    // it the saturated-sf1 probe measured 27× on 10× data — the r8
    // pair-density lesson re-confirmed on a composed query).
    "q_dedup_agreement" -> ((s, d) =>
      Dedup.dedupMethodAgreement(
        Dedup.withNearDuplicates(Tables.documents(s, d)),
        maxDocFreq = Some(50))),

    // Planted-truth dedup eval: measured recall of the MinHash
    // verified chain against the INJECTED (m, m+offset) pairs —
    // ground truth by construction, not estimate.
    "q_dedup_planted_eval" -> ((s, d) =>
      Dedup.plantedPairEval(Tables.documents(s, d))),

    // Jaccard threshold-calibration curve (r9): pair counts at τ ∈
    // {0.5..0.9} from ONE loose-threshold pair pass — the elbow read
    // that picks a corpus's dedup threshold. Standard hot-shingle cap.
    "q_dedup_thresholds" -> ((s, d) =>
      Dedup.jaccardThresholdCurve(
        Dedup.withNearDuplicates(Tables.documents(s, d)),
        maxDocFreq = Some(50))),

    // Within-doc repeat spans (r9): maximal regions covered by a
    // 3-token window occurring at >=2 positions of the SAME doc — the
    // self-repetition localizer (q_repetition scores it, this says
    // WHERE, with the repeated text recovered).
    "q_dedup_selfrepeat" -> ((s, d) =>
      Dedup.selfRepeatSpans(Tables.documents(s, d), 3)),

    // Dictionary keyword/phrase tagging (r9): per-doc topic hit
    // counts against a broadcast taxonomy incl. 2-token phrases.
    "q_keyword_tags" -> ((s, d) =>
      graft.operators.Curation.keywordTags(Tables.documents(s, d))),

    // Bigram-LM quality score (perplexity-filter shape): add-one
    // smoothed bigram model trained ON the corpus, docs scored by mean
    // ln P — trainer AND scorer inside one oracle-replicated plan.
    "q_lm_score" -> ((s, d) =>
      graft.operators.LangModel.bigramScore(Tables.documents(s, d))),

    // Kneser-Ney-style absolute-discount bigram scoring: D = 0.75 off
    // every seen bigram, redistributed via continuation counts
    // (distinct-context, not frequency) — the measured-best smoothing
    // family next to q_lm_score's add-one baseline. Full trainer
    // inside the differential.
    "q_lm_kn" -> ((s, d) =>
      graft.operators.LangModel.knBigramScore(Tables.documents(s, d))),

    // LM-score quartile buckets (boundary-broadcast, never ntile) —
    // the quality-based mixing prep over the bigram-LM scores.
    "q_lm_buckets" -> ((s, d) =>
      graft.operators.LangModel.lmQualityBuckets(Tables.documents(s, d))),

    // Top-50 bigram collocations by PMI with a count>=5 support floor.
    "q_bigram_pmi" -> ((s, d) =>
      graft.operators.LangModel.bigramPmi(Tables.documents(s, d))),

    // Per-class precision/recall/F1 of the trained NB classifier on
    // its held-out slice — the ship/no-ship eval beside q_kappa's
    // chance-corrected global read. Composes on the verdict frame.
    "q_nb_eval" -> ((s, d) =>
      graft.operators.TextClassify.classifierEval(
        graft.operators.TextClassify.naiveBayes(Tables.documents(s, d)))),

    // Windowed symmetric PPMI (±2) top-50 — the distributional-
    // semantics co-occurrence matrix (word2vec/GloVe prep), built from
    // n-gram endpoints (projection-only pair generation, no self-join).
    "q_ppmi_window" -> ((s, d) =>
      graft.operators.LangModel.ppmiWindow(Tables.documents(s, d))),

    // Trained multinomial Naive Bayes classifier (fastText/CCNet
    // quality-filter shape): add-one token likelihoods + doc-count
    // prior trained on the doc_id%5!=0 slice, held-out docs scored by
    // argmax log-posterior. Trainer AND scorer inside one
    // oracle-replicated plan; position-sorted ln fold per (doc, class).
    "q_nb_classifier" -> ((s, d) =>
      graft.operators.TextClassify.naiveBayes(Tables.documents(s, d))),

    // Margin-calibration (reliability) bins for the trained NB
    // classifier: test docs binned by the argmax margin (top minus
    // runner-up log-posterior, 1e-6 fixed point, 2-nat integer DIV
    // buckets), per-bin accuracy — does the confidence a gating
    // threshold cuts on actually predict correctness.
    // Content-defined chunking dedup audit: Rabin-boundary chunks
    // (k-gram hash % 16 == 0), per-source chunk-level dedup share.
    "q_cdc_chunks" -> ((s, d) =>
      graft.operators.Dedup.cdcChunkStats(Tables.documents(s, d))),

    // Isotonic calibration of the margin bins: the PAVA solution via
    // the minimax closed form on <= 10 bins — a fixed plan both
    // engines share, no sequential pooling loop.
    "q_isotonic" -> ((s, d) =>
      graft.operators.TextClassify.isotonicCalibration(
        Tables.documents(s, d))),

    "q_nb_calibration" -> ((s, d) =>
      graft.operators.TextClassify.nbCalibration(Tables.documents(s, d))),

    // One-vs-rest AUC/Gini per class for the trained NB classifier:
    // margin ranking via exact doubled midranks (Mann-Whitney U
    // identity), 1e-6-snapped margins, per-class rank windows.
    "q_nb_auc" -> ((s, d) =>
      graft.operators.TextClassify.nbAuc(Tables.documents(s, d))),

    // Confident-learning label-noise matrix (Northcutt et al.):
    // margin-based self-confidence vs rational class thresholds
    // (cross-multiplied — no float mean), integer argmax, |C|² counts;
    // off-diagonal = suspected mislabels.
    "q_label_noise" -> ((s, d) =>
      graft.operators.TextClassify.labelNoise(Tables.documents(s, d))),

    // Robust per-source outlier flags: median/MAD on token counts,
    // all-integer statistics (exact differential, no float tolerance).
    "q_outlier_docs" -> ((s, d) =>
      graft.operators.Curation.outlierDocs(Tables.documents(s, d))),

    // BM25 top-5 retrieval for corpus-derived queries: the sparse
    // lexical complement of the dense ANN family; corpus tokens are
    // broadcast-semi-joined to query terms before the tf shuffle.
    "q_bm25" -> ((s, d) =>
      graft.operators.Retrieval.bm25TopK(Tables.documents(s, d))),

    // RAKE keyphrases: stopword-free token runs scored by summed
    // word degree/frequency in 1e-6 fixed point, exact top-15.
    "q_rake" -> ((s, d) =>
      graft.operators.Retrieval.rakeKeyphrases(Tables.documents(s, d))),

    // Distinctive phrases (Monroe '08 log-odds, informative Dirichlet
    // prior) over the RAKE candidate runs: English slice vs rest,
    // top-20 by |z| with the rounded-DECIMAL rank boundary.
    "q_distinctive_phrases" -> ((s, d) =>
      graft.operators.Retrieval.distinctivePhrases(
        Tables.documents(s, d))),

    // Query-likelihood Dirichlet retrieval over the same derived
    // query panel: matching-terms log decomposition + doc-length
    // prior, sorted-fold sum, DECIMAL(18,6) rank boundary.
    "q_ql_dirichlet" -> ((s, d) =>
      graft.operators.Retrieval.qlDirichletTopK(Tables.documents(s, d))),

    // Hybrid retrieval: BM25 (lexical) + hashed-vector cosine (dense)
    // top-10 lists fused by reciprocal-rank 1/(60+rank), re-ranked —
    // the production hybrid-search shape, no score calibration needed.
    "q_hybrid_rrf" -> ((s, d) =>
      graft.operators.Retrieval.rrfFusion(Tables.documents(s, d))),

    // RM3 pseudo-relevance-feedback expansion terms: top feedback-doc
    // tokens per query minus the query's own terms — the recall
    // lever over the same BM25 first pass.
    "q_query_expansion" -> ((s, d) =>
      graft.operators.Retrieval.rm3ExpansionTerms(Tables.documents(s, d))),

    // RM3 second pass: the expansion terms re-scored through the
    // identical BM25 chain, blended 0.6/0.4 with the first pass —
    // the complete pseudo-relevance-feedback loop.
    "q_rm3_rescore" -> ((s, d) =>
      graft.operators.Retrieval.rm3Rescore(Tables.documents(s, d))),

    // The spark.sql TEXT surface, retrieval depth (VERDICT r9 #5's
    // named example): the full BM25 chain as SQL text over the
    // documents view — term-for-term the bm25TopK operation tree
    // (same literals unfolded, same sorted ln-term fold, same 6-dp
    // DECIMAL edge), so the same oracle gates both.
    "q_sql_bm25" -> ((s, d) => {
      graft.queries.Views.register(s, d)
      s.sql("""
        WITH toks AS (
          SELECT doc_id, split(text, ' ') AS t FROM documents),
        stats AS (
          SELECT count(*) AS n_docs,
            sum(cast(size(t) AS bigint)) AS total_dl
          FROM toks),
        qterms AS (
          SELECT doc_id AS query_id,
            explode(slice(array_distinct(t), 1, 3)) AS token
          FROM toks WHERE doc_id % 100 = 0 AND doc_id < 1000000),
        tok AS (
          SELECT /*+ BROADCAST(qt) */ c.doc_id, c.dl, c.token
          FROM (SELECT doc_id, size(t) AS dl, explode(t) AS token
                FROM toks) c
          JOIN (SELECT DISTINCT token FROM qterms) qt USING (token)),
        tf AS (
          SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
          FROM tok GROUP BY 1, 2),
        dfx AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        ts AS (
          SELECT /*+ BROADCAST(dfx, q, stats) */ q.query_id,
            tf.doc_id,
            ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
              * (tf * (1.2 + 1.0))
              / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
                  / (cast(total_dl AS double) / n_docs))) AS ts
          FROM tf JOIN dfx USING (token) JOIN qterms q USING (token)
          CROSS JOIN stats),
        sc AS (
          SELECT query_id, doc_id,
            cast(round(aggregate(sort_array(collect_list(ts)),
              cast(0 AS double), (a, x) -> a + x), 6)
              AS DECIMAL(18,6)) AS score
          FROM ts GROUP BY 1, 2),
        r AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, doc_id) AS rnk FROM sc)
        SELECT query_id, doc_id, rnk, score FROM r WHERE rnk <= 5""")
    }),

    // Cluster → representative: keep the best (distinct-token count,
    // tie min doc_id) member per near-dup cluster; filter(is_rep) IS
    // the deduplicated corpus. Quality-aware keep, not min-id keep.
    "q_cluster_rep" -> ((s, d) => {
      val corpus = Dedup.withNearDuplicates(Tables.documents(s, d))
      Dedup.clusterRepresentatives(
        corpus, Dedup.minhashVerifiedPairs(corpus))
    }),

    // DSIR importance weights: hashed-bigram log-likelihood-ratio vs
    // the target slice (every 50th doc) — the importance-resampling
    // data-selection score, trainer inside the differential.
    "q_dsir_weights" -> ((s, d) =>
      graft.operators.Curation.dsirWeights(Tables.documents(s, d))),

    // Fuzzy entity resolution: a deterministic char-drop dirty feed
    // matched to the part catalog via two-key blocking + Levenshtein
    // verify + best-match resolve; all integer/string-exact.
    "q_entity_match" -> ((s, d) => {
      val parts = Tables.part(s, d)
      graft.operators.EntityMatch.resolve(
        graft.operators.EntityMatch.dirtyFeed(parts, "p_partkey", "p_name"),
        parts, "p_partkey", "p_name")
    }),

    // Fellegi-Sunter linkage weights trained on the planted-truth
    // candidate pairs: per-field m/u with add-half smoothing and the
    // ln-likelihood-ratio agree/disagree weights — trainer inside
    // the differential, closed-form on a 4-row frame.
    "q_fs_weights" -> ((s, d) =>
      graft.operators.EntityMatch.fellegiSunterWeights(
        Tables.part(s, d), "p_partkey", "p_name")),

    // The trained weights applied back: per-pair integer sum of 1e6
    // fixed-point field weights, top-20 on the exact score order,
    // planted truth riding along as the separation read-out.
    "q_fs_scores" -> ((s, d) =>
      graft.operators.EntityMatch.fellegiSunterScores(
        Tables.part(s, d), "p_partkey", "p_name")),

    // Sorted-neighborhood linkage (Hernández–Stolfo): the second
    // blocking family over the same dirty feed — block-local sort,
    // rank+j equi-join window (|records|·window candidates, never a
    // quadratic range join), exact Levenshtein verify.
    "q_sorted_neighborhood" -> ((s, d) => {
      val parts = Tables.part(s, d)
      graft.operators.EntityMatch.sortedNeighborhood(
        graft.operators.EntityMatch.dirtyFeed(parts, "p_partkey", "p_name"),
        parts, "p_partkey", "p_name")
    }),

    // Rendezvous (HRW) shard router: argmax salted hash over 16 shards
    // — the stable assignment that moves only 1/(n+1) of keys on
    // reshard (spec gates the movement property exactly).
    "q_shard_assign" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        graft.operators.Shard.rendezvousShard(col("doc_id"), 16)
          .as("shard"))),

    // KMV/theta-sketch set intersection: distinct click∩purchase users
    // estimated from two 64-hash sketches; exact count rides along.
    "q_kmv_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.operators.Sketch.kmvIntersectEstimate(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"), "user_id")
    }),

    // KMV/theta A-NOT-B: distinct clickers who never made a >99
    // purchase, from two sketches — the set-algebra completion (union
    // = merge, intersect, difference); exact count rides along. (The
    // unthresholded pair is degenerate on this substrate: every user
    // has every event type, so A\B = ∅.)
    "q_kmv_diff" -> ((s, d) => {
      val ev = Tables.events(s, d)
      graft.operators.Sketch.kmvDifferenceEstimate(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase" && col("value") > 99),
        "user_id")
    }),

    // Mergeable HLL rollup: per-(type, day) register shards merged by
    // register-wise MAX into the whole-period estimate. max∘max = max
    // makes the merge bit-identical to the direct sketch — the rollup
    // property warehouses exchange sketch columns for — and exactly
    // that is what the differential gates (the oracle computes shards
    // then merges, like the plan does).
    "q_hll_merge" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("event_type"),
        to_date(col("ts")).as("day"), col("user_id"))
      graft.operators.Sketch.hllMergeEstimate(
          graft.operators.Sketch.hllRegisterShards(
            ev, "event_type", "day", "user_id"))
        .join(ev.groupBy(col("event_type").cast("string").as("g"))
          .agg(countDistinct(col("user_id")).as("exact_n")), Seq("g"))
        .select(col("g").as("event_type"), col("zeros"),
          col("estimate"), col("exact_n"))
    }),

    // HDR-histogram quantile sketch: p50/p95/p99 of extended price per
    // return flag from integer log₂+4-bit bin counts — ≤3% relative
    // error, bin-count state, float-free surface end to end.
    "q_quantile_sketch" -> ((s, d) =>
      graft.operators.Sketch.hdrQuantiles(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice")),

    // Sketch-driven decile bucketing: every order tagged with its
    // total-price decile from the bin-count sketch — the global-sort-
    // free ntile (9 boundary bins broadcast, one array fold per row).
    "q_price_deciles" -> ((s, d) =>
      graft.operators.Sketch.hdrDecileBuckets(
        Tables.orders(s, d), "o_orderkey", "o_totalprice")),

    // Incremental snapshot dedup: a batch (odd docs + re-crawled copies
    // of every 20th even doc) flagged against the previous snapshot's
    // fingerprint set — the daily-ingest dedup stage.
    "q_dedup_incremental" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 2 === 0)
      val batch = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"))
        .unionByName(prev.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      Dedup.snapshotDupFlags(batch, prev)
    }),

    // Trained language-ID: per-lang top-20 token profiles learned from
    // the labeled corpus, docs scored by profile hits, argmax predict.
    "q_langid_trained" -> ((s, d) =>
      graft.operators.LangModel.trainedLangId(Tables.documents(s, d))),

    // Classifier agreement: Cohen's κ of the trained lang-ID against
    // the gold labels — chance-corrected accuracy from one confusion
    // aggregate; generic over any two label frames.
    "q_kappa" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.query.Analytics.cohenKappa(
        graft.operators.LangModel.trainedLangId(docs)
          .select(col("doc_id"), col("predicted")),
        docs.select(col("doc_id"), col("lang")),
        "doc_id", "predicted", "lang")
    }),

    // Token-budget cut: the deterministic hash-ordered document prefix
    // summing to ≤ 25k tokens, via the two-level prefix sum (bucket
    // totals → constant-size bucket window → boundary bucket only).
    "q_token_budget" -> ((s, d) =>
      graft.operators.Sampling.tokenBudgetSample(
        Tables.documents(s, d), 25000L)),

    // Overlapping-window chunking (size 32, stride 24): the
    // retrieval/embedding prep step; explode is the output size itself.
    "q_chunk_overlap" -> ((s, d) =>
      graft.operators.Curation.chunkOverlap(Tables.documents(s, d))),

    // T5-style span corruption (period 15, span 3): deterministic
    // masked-input/target pair build for pretraining data.
    "q_span_mask" -> ((s, d) =>
      graft.operators.Curation.spanMask(Tables.documents(s, d))),

    // Contrastive (anchor, positive) pairs: adjacent overlapping
    // chunks of the same doc + a content-hash shuffle key — the
    // dual-encoder prep (negatives are in-batch at training time).
    "q_contrastive_pairs" -> ((s, d) =>
      graft.operators.Curation.contrastivePairs(Tables.documents(s, d))),

    // Largest-remainder apportionment of an exact 1000-doc budget
    // across sources — Hamilton's method, Σ alloc == budget always,
    // all-integer arithmetic.
    "q_apportion" -> ((s, d) =>
      graft.operators.Mixing.apportion(
        Tables.documents(s, d), "source", 1000L)),

    // UniMax budget allocation: greedy min-max-epochs spend of half
    // the corpus tokens under a 4-epoch cap, collapsed to one
    // ranking window by the monotone integer crossing test.
    "q_unimax" -> ((s, d) =>
      graft.operators.Mixing.unimax(Tables.documents(s, d))),

    // Temperature-derived mixing recipe (α = ½): shares ∝ √n_s, then
    // the same broadcast plan + salted lottery as q_corpus_mix.
    "q_mix_temperature" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      graft.operators.Mixing.mixPlan(docs, "source", "doc_id",
        graft.operators.Mixing.temperatureTargets(docs, "source"))
        .select(col("doc_id"), col("source"), col("p"), col("keep"))
    }),

    // Snapshot CDC diff: yesterday (doc_id %3≠0) vs today (%5≠0, every
    // 7th doc revised) compared by text fingerprint — the change feed
    // that lets every downstream stage touch only the delta.
    "q_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val prev = docs.filter(col("doc_id") % 3 =!= 0)
      val curr = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      graft.operators.Cdc.snapshotDiff(prev, curr, "doc_id", "text")
    }),

    // Compaction planner: per-(source,lang) pseudo-file stats bin-packed
    // to ~50k-char output groups, partition-local (OPTIMIZE bin-pack).
    "q_compaction_bins" -> ((s, d) => {
      val files = Tables.documents(s, d)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
      graft.operators.Layout.compactionBins(
        files, Seq("source"), "lang", "bytes", 50000L)
    }),

    // Dataset-card profile: per-source docs / token volume / language
    // spread / exact-dup count — all-integer, two keyed shuffles.
    "q_corpus_profile" -> ((s, d) =>
      graft.operators.Curation.corpusProfile(Tables.documents(s, d))),

    // Feature-hashing vectorizer (hashing trick, dim=32): text → dense
    // signed-count vector, exploded to (doc_id, j, v) rows — integer
    // exact, no vocabulary table.
    "q_hash_vectorize" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        posexplode(TextOps.hashVectorNative(col("text"))))
        .select(col("doc_id"), col("pos").as("j"), col("col").as("v"))),

    // Corpus mixing: skewed target shares (src K → (K+1)/210), keep
    // verdicts by salted-hash lottery — the data-recipe step, with the
    // per-source plan (counts → probabilities) inside the plan.
    "q_corpus_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val targets = docs.select(col("source")).distinct()
        .withColumn("share",
          (expr("CAST(substring(source, 4) AS INT)") + 1) / lit(210.0))
      graft.operators.Mixing.mixPlan(docs, "source", "doc_id", targets)
        .select(col("doc_id"), col("source"), col("p"), col("keep"))
    }),

    // Winnowing fingerprints: min-hash-per-window over the ordered
    // 3-gram hash stream (w=4), exploded to (doc_id, fp) rows. Native
    // fused expression; the declarative twin is the spec'd cross-check.
    "q_winnow" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        explode(TextOps.winnowNative(col("text"), 3, 4)).as("fp"))),

    // Bloom-filter membership, fully deterministic (md5-derived bits):
    // build over the "previous snapshot" (even doc_ids), probe the whole
    // corpus. m=1024/k=3 is deliberately undersized so the oracle also
    // pins the FALSE POSITIVE pattern, not just the no-false-negative
    // guarantee.
    "q_bloom_probe" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val words = graft.operators.Bloom.build(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", 1024, 3)
      graft.operators.Bloom.probe(docs, "doc_id", words, 1024, 3)
        .select(col("key").as("doc_id"), col("maybe_present"))
    }),

    // C4-style cleaner composed from the passage scan: drop docs that
    // carry a duplicated 8-token window without being its canonical
    // (min doc_id) carrier — one copy of each repeated passage survives.
    "q_dedup_passages_clean" -> ((s, d) =>
      Dedup.dropDuplicatePassageDocs(
        Dedup.withNearDuplicates(Tables.documents(s, d)), 8)
        .select(col("doc_id"), length(col("text")).as("n_chars"))),

    // Stratified sampling: 50 docs per language by salted-hash lottery.
    "q_stratified_sample" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSample(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", 50)),

    // Same lottery via the bounded-heap aggregator (the scale shape:
    // shuffle carries ~quota rows per stratum, no window sort) — one
    // oracle gates both variants.
    "q_stratified_sample_heap" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSampleHeap(
        Tables.documents(s, d).select(col("doc_id"), col("lang")),
        "lang", "doc_id", 50)),

    // Weighted sample (A-ES): 100 docs, inclusion ∝ n_chars — longer
    // docs oversampled, the quality/length-weighted curation draw.
    "q_weighted_sample" -> ((s, d) =>
      graft.operators.Sampling.weightedSample(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), 100)),

    // Gopher-style rule filter: integer-exact per-rule verdicts + AND.
    "q_quality_rules" -> ((s, d) =>
      graft.operators.Curation.gopherRules(Tables.documents(s, d))),

    // End-to-end curation funnel: docs/tokens surviving quality →
    // langid → exact-dedup → domain-cap over the injected-duplicate
    // corpus — the retention report, 5 rows at any scale.
    "q_curation_funnel" -> ((s, d) =>
      graft.operators.Curation.curationFunnel(Tables.documents(s, d))),

    // Unigram Shannon entropy (nats) — repetitive-text detector; the
    // sorted-fold double is bit-identical cross-engine (no rounding).
    "q_token_entropy" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        TextOps.tokenEntropy(col("text")).as("entropy"))),

    // Zipf-law OLS fit of ln(tf) on ln(rank) over the top-1000 token
    // types: distributed take-ordered top (never a vocab-wide sort),
    // fixed-point ln sums, closed-form double math on the 1-row
    // result. Corpus-health read: healthy slope ≈ −1, r² near 1.
    "q_zipf_fit" -> ((s, d) =>
      graft.operators.CorpusStats.zipfFit(Tables.documents(s, d))),

    // Heaps-law vocabulary-growth curve over token bigrams: distinct
    // types vs occurrences, cumulative over 10 doc-id buckets — one
    // keyed min-aggregate (first-appearance trick), no per-prefix
    // re-scan.
    "q_heaps_curve" -> ((s, d) =>
      graft.operators.CorpusStats.heapsCurve(Tables.documents(s, d))),

    // Per-source Heaps exponents (VERDICT r9 #7): the heapsCurve
    // machinery within each source + the zipfFit OLS closed form —
    // beta per source = the marginal-data-value read for data buying.
    "q_heaps_by_source" -> ((s, d) =>
      graft.operators.CorpusStats.heapsBySource(Tables.documents(s, d))),

    // Good-Turing missing mass + bias-corrected Chao1 per source:
    // frequency-of-frequency rollup, integer until two divisions —
    // the unseen-vocabulary price tag beside the Heaps exponent.
    "q_missing_mass" -> ((s, d) =>
      graft.operators.CorpusStats.missingMass(Tables.documents(s, d))),

    // Per-source unigram KL to the corpus: present pairs enumerated,
    // absent words collapsed by the p0 closed form from two integer
    // ln-sums — never |sources|×V pairs.
    "q_source_kl" -> ((s, d) =>
      graft.operators.CorpusStats.sourceKl(Tables.documents(s, d))),

    // Leave-one-source-out jackknife on the corpus mean doc length:
    // closed-form influence from one keyed aggregate + a 1-row
    // broadcast — the source-grain data-valuation screen.
    "q_source_influence" -> ((s, d) =>
      graft.operators.CorpusStats.sourceInfluence(Tables.documents(s, d))),

    // Cross-source quantile normalization of n_chars at decile
    // granularity (Bolstad et al.): per-source rank bins → the
    // all-sources bin mean as the normalized value — what makes
    // per-source quality scores comparable before one global cut.
    "q_quantile_norm" -> ((s, d) =>
      graft.query.Analytics.quantileNormalize(Tables.documents(s, d),
        "source", col("n_chars"), col("doc_id"))),

    // Gini coefficient of the token-frequency distribution: corpus
    // concentration in one number — rank-free over distinct tf values
    // (two-level prefix, DECIMAL(38,0) rank sums), the inequality
    // read beside q_zipf_fit's shape read.
    "q_token_gini" -> ((s, d) =>
      graft.operators.CorpusStats.tokenGini(Tables.documents(s, d))),

    // Character-class corpus profile per language: exact per-class
    // counts from length deltas (ASCII classes only — no regex
    // dialect surface), integer sums, one rounded division per ratio.
    "q_charclass_profile" -> ((s, d) =>
      graft.operators.CorpusStats.charClassProfile(
        Tables.documents(s, d))),

    // Term burstiness (cf/df, Church–Gale): the clumping signal
    // tf-idf's df alone misses; top-50 of the tf ≥ 10 head via
    // take-ordered, never a vocab-wide sort.
    "q_burstiness" -> ((s, d) =>
      graft.operators.CorpusStats.burstiness(Tables.documents(s, d))),

    // Duplication-rate triage per source: share of docs in ≥ 1
    // verified near-dup pair (exactJaccardPairs contract, hot-shingle
    // cap stated), injected ids mapped back through the idOffset
    // arithmetic.
    "q_dup_rate_by_source" -> ((s, d) =>
      graft.operators.Dedup.dupRateBySource(Tables.documents(s, d))),

    // Shannon diversity of the source mix per rendezvous shard: the
    // post-routing segregation check (H near ln|sources| = well
    // mixed); 1e-9 fixed-point entropy terms → exact integer sums.
    "q_shard_diversity" -> ((s, d) =>
      graft.operators.Profile.shardDiversity(Tables.documents(s, d))),

    // Lexical richness per source (TTR + Herdan's C over bigram
    // types): which source still adds new content — a C far below
    // peers = template/boilerplate mass, before any dedup names it.
    "q_lexical_richness" -> ((s, d) =>
      graft.operators.CorpusStats.lexicalRichness(
        Tables.documents(s, d))),

    // Hill tail-index α̂ over the top-200 bigram order statistics —
    // the MLE companion to q_zipf_fit's OLS slope (tail weight, not
    // head shape); take-ordered top, fixed-point ln terms.
    "q_hill_tail" -> ((s, d) =>
      graft.operators.CorpusStats.hillTail(Tables.documents(s, d))),

    // Mutual information source↔lang: |X|·|Y| contingency counts,
    // fixed-point ln terms summed as exact longs (no float fold),
    // entropies + NMI from the integer sums — are the two sampling
    // keys redundant or independent?
    "q_mutual_info" -> ((s, d) =>
      graft.operators.CorpusStats.mutualInfo(Tables.documents(s, d))),

    // LM quality by source: macro-averaged per-doc avg_logp under the
    // corpus bigram LM — the off-distribution-source triage read.
    "q_lm_by_source" -> ((s, d) =>
      graft.operators.LangModel.lmBySource(Tables.documents(s, d))),

    // Duplicate-cluster size distribution: pairwise twins vs one
    // giant boilerplate component — different fixes; histogram over
    // the min-label fixpoint clusters.
    "q_cluster_sizes" -> ((s, d) =>
      graft.operators.Dedup.clusterSizeDist(
        graft.operators.Dedup.minhashVerifiedPairs(
          graft.operators.Dedup.withNearDuplicates(
            Tables.documents(s, d))))),

    // Pearson correlation between two quality signals (heuristic
    // q_score vs n_chars): the redundancy read — signals at r ≈ 1 are
    // one signal; a curation stack should pay for diverse ones.
    // Fixed-point x, exact integer correlation sums, closed form once.
    "q_signal_corr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.query.Analytics.signalCorr(
        graft.operators.Curation.qualityScore(docs)
          .join(docs.select(col("doc_id"), col("n_chars")),
            Seq("doc_id")),
        round(col("q_score") * 1e6, 0).cast("long"), col("n_chars"))
    }),

    // Stopword coverage per language: the function-word share — a
    // language-health read (near-zero = wrong language or code; the
    // testdata vocabulary carries 'the'/'a').
    "q_stopword_coverage" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("nt"),
          TextOps.stopwordCount(col("text")).cast("long").as("nsw"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
          sum(col("nsw")).as("n_stopwords"),
          round(sum(col("nsw")).cast("double")
            / sum(col("nt")).cast("double"), 6).as("stopword_ratio")))
  )

  // ------------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "q_doc_tokens" ->
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, len(t) AS n_tokens,
        |  len(list_distinct(t)) AS n_distinct_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_bpe_tokens
        |FROM toks""".stripMargin,

    "q_doc_quality" ->
      """WITH toks AS (
        |  SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS t
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, n_chars, len(t) AS n_tokens,
        |    len(list_distinct(t)) AS n_distinct_tokens,
        |    len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop
        |  FROM toks)
        |SELECT *, CASE
        |    WHEN n_tokens >= 40 AND n_distinct_tokens * 100 >= n_tokens * 30
        |      THEN 'good'
        |    WHEN n_tokens >= 10 THEN 'fair'
        |    ELSE 'poor' END AS quality
        |FROM st""".stripMargin,

    "q_doc_langid" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (
        |  SELECT doc_id,
        |    len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop,
        |    len(t) AS n_tokens
        |  FROM toks)
        |SELECT *, CASE WHEN n_stop * 100 >= n_tokens * 12
        |    THEN 'en' ELSE 'und' END AS predicted
        |FROM st""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp_md5,
        |  ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp64,
        |  list_reduce(
        |    list_prepend(0::BIGINT,
        |      [CAST(ascii(c) AS BIGINT) for c in string_split(text, '')]),
        |    (h, c) -> (h * 131 + c) % 1000000007) AS fp_rolling
        |FROM documents""".stripMargin,

    "q_dedup_exact" ->
      s"""WITH $corpusExactSql
         |SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_doc_id,
         |  COUNT(*) AS n
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    // SQL-text variant: identical corpus CTE and aggregate, so the
    // same twin gates it.
    "q_sql_dedup_exact" ->
      s"""WITH $corpusExactSql
         |SELECT md5(text) AS fingerprint, min(doc_id) AS keeper_doc_id,
         |  COUNT(*) AS n
         |FROM corpus GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    "q_dedup_jaccard" -> jaccardPairsSql,

    "q_dedup_minhash" -> jaccardPairsSql,

    // Prefix filtering only changes candidate GENERATION (provable
    // superset of true pairs, exact verify unchanged) — same oracle.
    "q_dedup_prefix" -> jaccardPairsSql,

    // Novelty twin: the shingle index's document-frequency aggregate
    // joined back per doc; SUM cast to BIGINT (DuckDB widens SUM(int)
    // to HUGEINT), ratio mirrored as CAST-double / count.
    "q_novelty" ->
      s"""WITH $corpusNearSql,
         |$shinglesSql,
         |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
         |SELECT sh.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  ROUND(CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*), 6) AS novelty
         |FROM sh JOIN df USING (shingle)
         |GROUP BY 1""".stripMargin,

    "q_dedup_simhash" -> simhashSql,

    "q_dedup_edit" ->
      s"""WITH $corpusNearSql,
         |trx AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |sh AS (
         |  SELECT DISTINCT doc_id,
         |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
         |      AS shingle
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i FROM trx)),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(levenshtein(ca.text, cb.text) AS INT) AS edit_dist
         |FROM cand
         |JOIN corpus ca ON cand.doc_a = ca.doc_id
         |JOIN corpus cb ON cand.doc_b = cb.doc_id
         |WHERE levenshtein(ca.text, cb.text) <= 40""".stripMargin,

    "q_dedup_clusters" -> clustersSql,
    "q_dedup_cc_star" -> clustersSql,

    // SimHash-pairs twin: the weighted-vote signature chain over the
    // near substrate, then a DIRECT all-pairs radius filter — the
    // pigeonhole bound makes the banded plan equal the radius ball,
    // and that equality IS what this differential proves.
    "q_dedup_simhash_pairs" -> {
      val votes = (0 until 60)
        .map(j => s"SUM((((h >> $j) & 1) * 2 - 1) * w) AS s$j")
        .mkString(", ")
      val sig = (0 until 60)
        .map(j =>
          s"CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END")
        .mkString(" + ")
      s"""WITH $corpusNearSql,
         |tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM corpus),
         |w AS (SELECT doc_id, tok, COUNT(*) AS w FROM tok GROUP BY 1, 2),
         |vcb AS (
         |  SELECT DISTINCT tok,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
         |  FROM tok),
         |hh AS (SELECT w.doc_id, vcb.h, w.w FROM w JOIN vcb USING (tok)),
         |vt AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
         |sg AS (SELECT doc_id, $sig AS simhash FROM vt)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
    },

    // Pipeline twin: the combined exact+near substrate, min-per-md5
    // keep, the shingle-pair chain over the KEPT docs only, the
    // recursive closure, and the three funnel counts.
    "q_dedup_pipeline" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |         substr(text, strpos(text, ' ') + 1) AS text
        |  FROM documents WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text
        |  FROM documents WHERE doc_id % 40 = 0),
        |keptid AS (
        |  SELECT MIN(doc_id) AS doc_id FROM corpus GROUP BY md5(text)),
        |kc AS (
        |  SELECT c.doc_id, c.text FROM corpus c
        |  JOIN keptid k USING (doc_id)),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM kc),
        |ex AS (
        |  SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |  FROM toks),
        |sh AS (SELECT DISTINCT doc_id,
        |         t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        |       FROM ex),
        |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    COUNT(*) AS intersect_n
        |  FROM sh a JOIN sh b
        |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM inter
        |  JOIN sz sa ON inter.doc_a = sa.doc_id
        |  JOIN sz sb ON inter.doc_b = sb.doc_id
        |  WHERE intersect_n * 10 >= (sa.sz + sb.sz - intersect_n) * 7),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (
        |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical
        |  FROM reach GROUP BY a)
        |SELECT 1 AS stage_id, 'raw' AS stage,
        |  CAST((SELECT COUNT(*) FROM corpus) AS BIGINT) AS n_docs
        |UNION ALL
        |SELECT 2, 'exact', CAST((SELECT COUNT(*) FROM kc) AS BIGINT)
        |UNION ALL
        |SELECT 3, 'near_dup', CAST((SELECT COUNT(*) FROM kc)
        |  - ((SELECT COUNT(*) FROM comp)
        |     - (SELECT COUNT(DISTINCT canonical) FROM comp))
        |  AS BIGINT)""".stripMargin,

    "q_sample_split" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
        |      % 100 AS b,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15))::BIGINT)
        |      % 100 AS sb
        |  FROM documents)
        |SELECT doc_id, lang, b < 20 AS sampled,
        |  CASE WHEN sb < 80 THEN 'train'
        |       WHEN sb < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM h""".stripMargin,

    // 8-token shingles: i runs 1 ‥ len-7 (range bound is exclusive).
    "q_decontaminate" ->
      """WITH ev AS (
        |  SELECT substr(text, strpos(text, ' ') + 1) AS text
        |  FROM documents WHERE doc_id % 50 = 0 AND doc_id < 1000000),
        |evx AS (
        |  SELECT string_split(text, ' ') AS t FROM ev),
        |esh AS (
        |  SELECT DISTINCT t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
        |    t[i+3] || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] ||
        |    ' ' || t[i+7] AS shingle
        |  FROM (SELECT t, unnest(range(1, len(t) - 6)) AS i FROM evx)),
        |trx AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tsh AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
        |      AS shingle
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i FROM trx))
        |SELECT doc_id, COUNT(*) AS n_shared
        |FROM tsh JOIN esh USING (shingle) GROUP BY 1""".stripMargin,

    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |mx AS (
        |  SELECT doc_id, MAX(c) AS max_token_n FROM (
        |    SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        |  GROUP BY 1),
        |bsh AS (
        |  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
        |bn AS (
        |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_distinct_bigrams
        |  FROM bsh GROUP BY 1)
        |SELECT toks.doc_id, CAST(len(t) AS INT) AS n_tokens, max_token_n,
        |  CAST(len(t) - 1 AS INT) AS n_bigrams,
        |  COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
        |  (max_token_n * 5 <= len(t)
        |    AND COALESCE(n_distinct_bigrams, 0) * 10 >= (len(t) - 1) * 6)
        |    AS keep
        |FROM toks
        |JOIN mx ON toks.doc_id = mx.doc_id
        |LEFT JOIN bn ON toks.doc_id = bn.doc_id""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS token FROM toks),
        |tf AS (
        |  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (
        |  SELECT token, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc_id, token, tf, df,
        |    CAST(round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6)
        |      AS DECIMAL(18,6)) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, df, token) AS INT) AS rnk
        |  FROM s)
        |SELECT doc_id, token, tf, df, score, rnk FROM r WHERE rnk <= 3""".stripMargin,

    // Fightin'-Words twin: same exact counts, same α=0.5 prior, the
    // identical δ/√var parenthesization (ln-parity precedent above),
    // rank on the rounded z with the token tie-break.
    "q_distinctive_terms" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |t AS (SELECT source, token FROM tok WHERE token <> ''),
        |ys AS MATERIALIZED (
        |  SELECT source, token, COUNT(*) AS y_s FROM t GROUP BY 1, 2),
        |yg AS MATERIALIZED (
        |  SELECT token, CAST(SUM(y_s) AS BIGINT) AS y_g
        |  FROM ys GROUP BY 1),
        |ns AS (SELECT source, CAST(SUM(y_s) AS BIGINT) AS n_s
        |  FROM ys GROUP BY 1),
        |tot AS (SELECT CAST(SUM(y_g) AS BIGINT) AS n_tot,
        |  COUNT(*) AS vocab FROM yg),
        |sc AS (
        |  SELECT source, token, y_s, y_g - y_s AS y_r,
        |    round((ln((CAST(y_s AS DOUBLE) + 0.5)
        |        / (CAST(n_s AS DOUBLE) + 0.5 * CAST(vocab AS DOUBLE)
        |           - CAST(y_s AS DOUBLE) - 0.5))
        |      - ln((CAST(y_g - y_s AS DOUBLE) + 0.5)
        |        / (CAST(n_tot - n_s AS DOUBLE)
        |           + 0.5 * CAST(vocab AS DOUBLE)
        |           - CAST(y_g - y_s AS DOUBLE) - 0.5)))
        |      / sqrt(1.0 / (CAST(y_s AS DOUBLE) + 0.5)
        |        + 1.0 / (CAST(y_g - y_s AS DOUBLE) + 0.5)), 6) AS z
        |  FROM ys JOIN yg USING (token) JOIN ns USING (source)
        |  CROSS JOIN tot)
        |SELECT source, token, y_s, y_r, z FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY z DESC, token) AS rn FROM sc)
        |WHERE rn <= 3""".stripMargin,

    "q_dedup_winnow_verified" -> jaccardPairsSql,

    // Planted-eval twin: the shared pair chain vs the literal truth
    // set; three 1-row counts, two divisions.
    "q_dedup_planted_eval" ->
      s"""WITH $pairsCteSql,
         |truth AS (
         |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b
         |  FROM documents WHERE doc_id % 50 = 0),
         |mm AS (SELECT COUNT(*) AS n_matched FROM pairs
         |  SEMI JOIN truth USING (doc_a, doc_b)),
         |tc AS (SELECT COUNT(*) AS n_truth FROM truth),
         |fc AS (SELECT COUNT(*) AS n_found FROM pairs)
         |SELECT CAST(n_truth AS BIGINT) AS n_truth,
         |  CAST(n_found AS BIGINT) AS n_found,
         |  CAST(n_matched AS BIGINT) AS n_matched,
         |  round(CAST(n_matched AS DOUBLE) / CAST(n_truth AS DOUBLE),
         |    6) AS recall,
         |  round(CAST(n_matched AS DOUBLE) / CAST(n_found AS DOUBLE),
         |    6) AS found_share_planted
         |FROM tc CROSS JOIN fc CROSS JOIN mm""".stripMargin,

    // Split-leakage twin: the shared pair chain + the same mod-7
    // endpoint classification and share division.
    "q_split_leakage" ->
      s"""WITH $pairsCteSql,
         |cl AS (
         |  SELECT CASE
         |    WHEN doc_a % 7 = 0 AND doc_b % 7 = 0 THEN 'within_heldout'
         |    WHEN doc_a % 7 <> 0 AND doc_b % 7 <> 0 THEN 'within_train'
         |    ELSE 'cross_split' END AS split_class
         |  FROM pairs),
         |c AS (SELECT split_class, COUNT(*) AS n_pairs FROM cl
         |  GROUP BY 1),
         |t AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS tot FROM c)
         |SELECT split_class, n_pairs,
         |  round(CAST(n_pairs AS DOUBLE) / tot, 6) AS share
         |FROM c CROSS JOIN t""".stripMargin,

    "q_docs_jsonl" -> "SELECT doc_id, text FROM documents",

    "q_docs_csv" -> "SELECT doc_id, text FROM documents",

    "q_docs_orc" -> "SELECT doc_id, text FROM documents",

    // Mirrors the per-shard cumulative window exactly; DuckDB SUM(INT)
    // OVER is HUGEINT, hence the BIGINT casts; // is floor division.
    "q_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY shard
        |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
        |    AS BIGINT) AS start_offset
        |  FROM toks)
        |SELECT doc_id, shard, n_tokens, start_offset,
        |  CAST(floor(start_offset / 512) AS BIGINT) AS seq_idx
        |FROM c""".stripMargin,

    // Packing-audit twin: same integer ceil ((n + L−1) // L), same
    // shard totals, same final division.
    "q_pack_efficiency" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 32 AS shard,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |pd AS (SELECT CAST(SUM((n + 511) // 512) AS BIGINT) AS n_seqs,
        |    CAST(SUM(n) AS BIGINT) AS n_tokens FROM t),
        |sh AS (SELECT shard, CAST(SUM(n) AS BIGINT) AS tot
        |  FROM t GROUP BY 1),
        |cc AS (SELECT CAST(SUM((tot + 511) // 512) AS BIGINT) AS n_seqs,
        |    CAST(SUM(tot) AS BIGINT) AS n_tokens FROM sh)
        |SELECT 'pad_per_doc' AS strategy, n_seqs, n_tokens,
        |  n_seqs * 512 - n_tokens AS padded_tokens,
        |  round(CAST(n_tokens AS DOUBLE)
        |    / CAST(n_seqs * 512 AS DOUBLE), 6) AS efficiency
        |FROM pd
        |UNION ALL
        |SELECT 'concat_shard', n_seqs, n_tokens,
        |  n_seqs * 512 - n_tokens,
        |  round(CAST(n_tokens AS DOUBLE)
        |    / CAST(n_seqs * 512 AS DOUBLE), 6)
        |FROM cc""".stripMargin,

    "q_vocab" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks)
        |SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM tok GROUP BY 1""".stripMargin,

    // PSI timeline twin: same frozen bins and smoothing, same
    // bin-ordered list fold per epoch-week period vs the first.
    "q_psi_timeline" ->
      """WITH base AS (
        |  SELECT CAST(datediff('day', DATE '1970-01-01',
        |      CAST(ts AS DATE)) // 7 AS INT) AS period,
        |    CAST(LEAST(GREATEST(floor(value / 50.0), 0.0), 9.0)
        |      AS INT) AS bin
        |  FROM events),
        |months AS (SELECT DISTINCT period FROM base),
        |bins AS (SELECT CAST(unnest(range(10)) AS INT) AS bin),
        |cnt AS (SELECT period, bin, COUNT(*) AS n FROM base
        |        GROUP BY 1, 2),
        |dense AS (
        |  SELECT m.period, b.bin, CAST(COALESCE(n, 0) AS BIGINT) AS n
        |  FROM months m CROSS JOIN bins b
        |  LEFT JOIN cnt ON cnt.period = m.period AND cnt.bin = b.bin),
        |tot AS (SELECT period, CAST(SUM(n) AS BIGINT) AS t FROM dense
        |        GROUP BY 1),
        |withp AS (
        |  SELECT dense.period, bin, n, t,
        |    CAST(n + 1 AS DOUBLE) / CAST(t + 10 AS DOUBLE) AS p
        |  FROM dense JOIN tot ON dense.period = tot.period),
        |refm AS (SELECT MIN(period) AS ref_period FROM months),
        |ref AS (
        |  SELECT bin, p AS p_ref FROM withp CROSS JOIN refm
        |  WHERE period = ref_period),
        |contribs AS (
        |  SELECT w.period, w.bin, w.t,
        |    (w.p - r.p_ref) * ln(w.p / r.p_ref) AS contrib
        |  FROM withp w JOIN ref r ON w.bin = r.bin),
        |agg AS (
        |  SELECT period, CAST(MAX(t) AS BIGINT) AS n_events,
        |    round(list_reduce(list_transform(
        |      list(struct_pack(bin := bin, contrib := contrib)
        |        ORDER BY bin),
        |      s -> s.contrib), (a, b) -> a + b), 6) AS psi
        |  FROM contribs GROUP BY 1)
        |SELECT period, n_events, psi, psi > 0.25 AS alert
        |FROM agg""".stripMargin,

    // PSI twin: same fixed bins, densified histograms, smoothed-share
    // arithmetic tree, bin-ordered list_reduce total.
    "q_psi_drift" ->
      """WITH bins AS (SELECT CAST(r AS INT) AS bin FROM range(10) t(r)),
        |pv AS (SELECT CAST(least(floor(n_chars / 100), 9) AS INT) AS bin
        |       FROM documents WHERE doc_id % 2 = 0),
        |cv AS (SELECT CAST(least(floor(n_chars / 100), 9) AS INT) AS bin
        |       FROM documents WHERE doc_id % 2 = 1),
        |hp AS (SELECT bins.bin, CAST(COALESCE(g.n, 0) AS BIGINT)
        |         AS n_prev
        |       FROM bins LEFT JOIN (SELECT bin, COUNT(*) AS n FROM pv
        |         GROUP BY 1) g USING (bin)),
        |hc AS (SELECT bins.bin, CAST(COALESCE(g.n, 0) AS BIGINT)
        |         AS n_curr
        |       FROM bins LEFT JOIN (SELECT bin, COUNT(*) AS n FROM cv
        |         GROUP BY 1) g USING (bin)),
        |h AS (SELECT hp.bin, n_prev, n_curr FROM hp
        |      JOIN hc ON hp.bin = hc.bin),
        |tot AS (SELECT SUM(n_prev) AS tp, SUM(n_curr) AS tc FROM h),
        |sh AS (SELECT bin, n_prev, n_curr,
        |    CAST(n_prev + 1 AS DOUBLE) / CAST(tp + 10 AS DOUBLE)
        |      AS p_prev,
        |    CAST(n_curr + 1 AS DOUBLE) / CAST(tc + 10 AS DOUBLE)
        |      AS p_curr
        |  FROM h CROSS JOIN tot),
        |sc AS (SELECT bin, n_prev, n_curr, p_prev, p_curr,
        |    (p_curr - p_prev) * ln(p_curr / p_prev) AS contrib
        |  FROM sh),
        |ps AS (SELECT list_reduce(list(contrib ORDER BY bin),
        |    (a, b) -> a + b) AS psi FROM sc)
        |SELECT bin, n_prev, n_curr, round(p_prev, 6) AS p_prev,
        |  round(p_curr, 6) AS p_curr, round(contrib, 6) AS contrib,
        |  round(psi, 6) AS psi
        |FROM sc CROSS JOIN ps""".stripMargin,

    // KS twin: the oracle computes the SAME per-value F_a/F_b with a
    // plain windowed CDF (the Spark side's bucket offsets + in-bucket
    // cumulatives reassemble the identical integer cumulative counts,
    // so each division is the same long/long double op) and takes the
    // same max.
    "q_ks_drift" ->
      """WITH u AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ina,
        |    CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS inb
        |  FROM lineitem WHERE l_returnflag IN ('R', 'N')),
        |c AS (SELECT v, CAST(SUM(ina) AS BIGINT) AS na,
        |    CAST(SUM(inb) AS BIGINT) AS nb
        |  FROM u GROUP BY 1),
        |cum AS (SELECT v,
        |    SUM(na) OVER (ORDER BY v) AS ca,
        |    SUM(nb) OVER (ORDER BY v) AS cb
        |  FROM c),
        |t AS (SELECT CAST(SUM(na) AS BIGINT) AS ta,
        |    CAST(SUM(nb) AS BIGINT) AS tb FROM c),
        |d AS (SELECT MAX(ABS(
        |    CAST(ca AS DOUBLE) / CAST(ta AS DOUBLE)
        |      - CAST(cb AS DOUBLE) / CAST(tb AS DOUBLE))) AS ks
        |  FROM cum CROSS JOIN t)
        |SELECT round(ks, 6) AS ks_stat, ta AS n_a, tb AS n_b
        |FROM d CROSS JOIN t""".stripMargin,

    // DoReMi twin: same unigram-LM loss (1e-9 fixed-point ln
    // contributions summed as DECIMAL — exact integers in both
    // engines), same min-max normalization, and 5 unrolled
    // multiplicative-weights steps whose expected-loss/normalizer
    // sums fold in source order (list_reduce ORDER BY source — the
    // sorted-fold idiom Spark mirrors with array_sort+aggregate).
    "q_doremi_mix" ->
      s"""WITH toks AS (
         |  SELECT source, tok FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok
         |    FROM documents)
         |  WHERE tok <> ''),
         |tf AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY 1),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS nt FROM tf),
         |pd AS (SELECT source,
         |    SUM(CAST(round(ln(CAST(f.tf AS DOUBLE) / CAST(nt AS DOUBLE))
         |      * 1e9) AS DECIMAL(20, 0))) AS s,
         |    COUNT(*) AS n_tok
         |  FROM toks t JOIN tf f USING (tok) CROSS JOIN tot
         |  GROUP BY 1),
         |pl AS (SELECT source, n_tok,
         |    (-(CAST(s AS DOUBLE)) / 1e9) / CAST(n_tok AS DOUBLE) AS loss
         |  FROM pd),
         |nd AS (SELECT source, COUNT(*) AS n_docs FROM documents
         |  GROUP BY 1),
         |ndt AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM nd),
         |lb AS (SELECT MIN(loss) AS lmin, MAX(loss) AS lmax FROM pl),
         |dom0 AS (SELECT pl.source, nd.n_docs,
         |    CASE WHEN lmax = lmin THEN 0.0
         |      ELSE (loss - lmin) / (lmax - lmin) END AS lnorm,
         |    CAST(nd.n_docs AS DOUBLE) / CAST(n_total AS DOUBLE) AS w
         |  FROM pl JOIN nd USING (source) CROSS JOIN ndt CROSS JOIN lb),
         |${(1 to 5).map(doremiStepSql).mkString(",\n")}
         |SELECT d.source, d.n_docs, round(d.lnorm, 6) AS loss_norm,
         |  round(dom0.w, 6) AS w_base, round(d.w, 6) AS w_final
         |FROM dom5 d JOIN dom0 ON d.source = dom0.source""".stripMargin,

    // Rank-blend twin: identical (signal, doc_id)-ordered
    // percent_rank windows per language, 6-dp rounds, same 3-term sum.
    "q_quality_rank_blend" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |    len(string_split(text, ' ')) AS n_tok,
        |    len(list_distinct(string_split(text, ' '))) AS n_dis,
        |    len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_tok ASC, doc_id ASC), 6) AS r_len,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_dis ASC, doc_id ASC), 6) AS r_lex,
        |    round(percent_rank() OVER (PARTITION BY lang
        |      ORDER BY n_stop DESC, doc_id ASC), 6) AS r_stop
        |  FROM base)
        |SELECT doc_id, lang, r_len, r_lex, r_stop,
        |  round((r_len + r_lex + r_stop) / 3.0, 6) AS composite
        |FROM r""".stripMargin,

    // OOV-curve twin: same (tf DESC, tok) top-Vmax ranking, same
    // left-join + conditional integer sums, 1-row aggregate fanned to
    // |Vs| rows; single rounded division per row.
    "q_oov_rate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |tf AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY 1),
        |rk AS (SELECT tok,
        |         row_number() OVER (ORDER BY tf DESC, tok) AS vrank
        |       FROM tf),
        |v AS (SELECT tok, vrank FROM rk WHERE vrank <= 20),
        |j AS (SELECT tok.tok, v.vrank FROM tok LEFT JOIN v USING (tok)),
        |a AS (SELECT COUNT(*) AS n_tokens,
        |  CAST(SUM(CASE WHEN vrank IS NULL OR vrank > 5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS oov_5,
        |  CAST(SUM(CASE WHEN vrank IS NULL OR vrank > 10
        |    THEN 1 ELSE 0 END) AS BIGINT) AS oov_10,
        |  CAST(SUM(CASE WHEN vrank IS NULL OR vrank > 20
        |    THEN 1 ELSE 0 END) AS BIGINT) AS oov_20
        |  FROM j)
        |SELECT vocab_size, n_tokens, n_oov,
        |  round(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS oov_rate
        |FROM (
        |  SELECT 5 AS vocab_size, n_tokens, oov_5 AS n_oov FROM a
        |  UNION ALL
        |  SELECT 10 AS vocab_size, n_tokens, oov_10 AS n_oov FROM a
        |  UNION ALL
        |  SELECT 20 AS vocab_size, n_tokens, oov_20 AS n_oov
        |  FROM a)""".stripMargin,

    // BPE twins: the same word-frequency base, then 8 unrolled rounds
    // of (pair count → argmax with the (count DESC, l, r) tie-break →
    // leftmost-greedy fold), the fold as a list_reduce over a
    // '|'-delimited string (same semantics as Spark's array
    // aggregate). MATERIALIZED throughout — each round reads the
    // previous twice and DuckDB inlines CTEs.
    "q_bpe_merges" ->
      s"""WITH $bpeCtes
         |${(1 to 8).map(i => s"SELECT * FROM b$i").mkString("\nUNION ALL\n")}""".stripMargin,

    // MaxMatch twin: same frequency-truncated vocab (row_number ≡
    // TakeOrderedAndProject at the count DESC, sub ASC tie-break),
    // then the SEQUENTIAL greedy scan as a recursive CTE — longest
    // match per position selected by an ANTI JOIN against any longer
    // fitting match; single chars guarantee termination. Different
    // method, identical piece counts — that's the differential.
    "q_maxmatch_segment" ->
      """WITH RECURSIVE
        |w AS (
        |  SELECT tok AS word, COUNT(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE tok <> '' GROUP BY 1),
        |subs AS (
        |  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS sub,
        |    SUM(freq) AS c
        |  FROM w, range(1, 41) r(i), range(2, 5) s(l)
        |  WHERE i + l - 1 <= len(word)
        |  GROUP BY 1),
        |topk AS (
        |  SELECT sub FROM (
        |    SELECT sub, row_number() OVER (ORDER BY c DESC, sub)
        |      AS rn
        |    FROM subs)
        |  WHERE rn <= 64),
        |chars AS (
        |  SELECT DISTINCT substr(word, CAST(i AS INT), 1) AS sub
        |  FROM w, range(1, 41) r(i) WHERE i <= len(word)),
        |vocab AS (
        |  SELECT sub AS v FROM topk UNION SELECT sub FROM chars),
        |seg(word, pos, n_pieces) AS (
        |  SELECT word, 1, 0 FROM w
        |  UNION ALL
        |  SELECT s.word, s.pos + len(m.v), s.n_pieces + 1
        |  FROM seg s
        |  JOIN vocab m ON s.pos <= len(s.word)
        |    AND substr(s.word, s.pos, len(m.v)) = m.v
        |  ANTI JOIN vocab m2 ON len(m2.v) > len(m.v)
        |    AND substr(s.word, s.pos, len(m2.v)) = m2.v)
        |SELECT word, CAST(freq AS BIGINT) AS freq,
        |  CAST(MAX(n_pieces) AS INT) AS n_pieces
        |FROM seg JOIN w USING (word)
        |WHERE pos > len(word)
        |GROUP BY 1, 2
        |ORDER BY freq DESC, word LIMIT 20""".stripMargin,

    // Unigram twins: identical encoded-long DP states via the
    // sequential recursive-CTE formulation, identical integer costs.
    "q_unigram_segment" ->
      s"""WITH RECURSIVE
         |$unigramCtes,
         |${uniDpSql(2, "cost1")}
         |SELECT s.word, w.freq, CAST(len(s.pieces) AS INT) AS n_pieces,
         |  CAST(f.states[len(s.word) + 1] // 65536 AS BIGINT)
         |    AS path_cost
         |FROM seg2 s JOIN w USING (word) JOIN fin2 f USING (word)
         |ORDER BY freq DESC, word LIMIT 20""".stripMargin,

    "q_unigram_vocab" ->
      s"""WITH RECURSIVE
         |$unigramCtes
         |SELECT f.piece, f.cnt, c.cost
         |FROM full1 f JOIN cost1 c USING (piece)""".stripMargin,

    // Prune twin: full1's bottom-32 multi-char pieces dropped (same
    // (cnt, piece) order), renormalized costs, a third DP round.
    "q_unigram_prune" ->
      s"""WITH RECURSIVE
         |$unigramCtes,
         |pruned AS MATERIALIZED (
         |  SELECT f.piece, f.cnt FROM full1 f
         |  WHERE len(f.piece) = 1 OR f.piece NOT IN (
         |    SELECT piece FROM (
         |      SELECT piece, row_number() OVER (ORDER BY cnt, piece)
         |        AS rn
         |      FROM full1 WHERE len(piece) >= 2)
         |    WHERE rn <= 32)),
         |vtp AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tot, COUNT(*) AS v
         |  FROM pruned),
         |costp AS MATERIALIZED (SELECT piece,
         |    CAST(round(1000000.0 * ln(CAST(tot + v AS DOUBLE)
         |      / CAST(cnt + 1 AS DOUBLE)), 0) AS BIGINT) AS cost
         |  FROM pruned CROSS JOIN vtp),
         |${uniDpSql(3, "costp")}
         |SELECT s.word, w.freq, CAST(len(s.pieces) AS INT) AS n_pieces,
         |  CAST(f.states[len(s.word) + 1] // 65536 AS BIGINT)
         |    AS path_cost
         |FROM seg3 s JOIN w USING (word) JOIN fin3 f USING (word)
         |ORDER BY freq DESC, word LIMIT 20""".stripMargin,

    // S-curve twin: identical left-associated multiplication chains
    // per (b, r) arm over the same i·0.05 grid.
    "q_lsh_scurve" -> {
      def arm(b: Int, r: Int): String = {
        val jx = "(CAST(i AS DOUBLE) * 0.05)"
        val jr = List.fill(r)(jx).mkString(" * ")
        val qx = s"(1.0 - $jr)"
        val qb = List.fill(b)(qx).mkString(" * ")
        s"""SELECT $b AS bands, $r AS rows_per_band,
           |  round($jx, 6) AS j,
           |  round(1.0 - $qb, 6) AS p_candidate
           |FROM range(1, 20) t(i)""".stripMargin
      }
      Seq((16, 1), (8, 2), (4, 4), (2, 8)).map { case (b, r) =>
        arm(b, r) }.mkString("\nUNION ALL\n")
    },

    "q_unigram_fertility" ->
      s"""WITH RECURSIVE
         |$unigramCtes,
         |${uniDpSql(2, "cost1")},
         |lw AS (
         |  SELECT lang, tok AS word, COUNT(*) AS nw FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS tok
         |    FROM documents)
         |  WHERE tok <> '' GROUP BY 1, 2),
         |sg AS (SELECT word, len(pieces) AS n_syms FROM seg2)
         |SELECT lang, CAST(SUM(nw) AS BIGINT) AS n_words,
         |  CAST(SUM(nw * n_syms) AS BIGINT) AS n_subwords,
         |  round(CAST(SUM(nw * n_syms) AS DOUBLE)
         |    / CAST(SUM(nw) AS DOUBLE), 6) AS fertility
         |FROM lw JOIN sg USING (word) GROUP BY 1""".stripMargin,

    "q_bpe_segment" ->
      s"""WITH $bpeCtes
         |SELECT sym, CAST(SUM(wn) AS BIGINT) AS n FROM (
         |  SELECT n AS wn, unnest(syms) AS sym FROM w8)
         |GROUP BY 1""".stripMargin,

    // Fertility twin: the trained w8 segmentation joined onto
    // per-language word counts; integer sums, one shared rounded
    // division per language.
    "q_bpe_fertility" ->
      s"""WITH $bpeCtes,
         |ws AS (SELECT w, CAST(len(syms) AS INT) AS n_syms FROM w8),
         |lt AS (SELECT lang, tok AS w FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS tok
         |    FROM documents)
         |  WHERE tok <> ''),
         |lw AS (SELECT lang, w, COUNT(*) AS nw FROM lt GROUP BY 1, 2),
         |j AS (SELECT lang, nw, n_syms FROM lw JOIN ws USING (w)),
         |a AS (SELECT lang, CAST(SUM(nw) AS BIGINT) AS n_words,
         |    CAST(SUM(nw * n_syms) AS BIGINT) AS n_subwords
         |  FROM j GROUP BY 1)
         |SELECT lang, n_words, n_subwords,
         |  round(CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
         |    AS fertility
         |FROM a""".stripMargin,

    "q_length_buckets" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT CAST(floor(len(t) / 32) AS INT) AS len_bucket,
        |  COUNT(*) AS n_docs
        |FROM toks GROUP BY 1""".stripMargin,

    "q_text_normalize" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    upper(substr(text, 1, 20)) || substr(text, 21, 1000000)
        |      || ' -- EOF!!' AS raw
        |  FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(raw),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
        |  FROM raw)
        |SELECT doc_id, norm_text,
        |  CAST(len(string_split(norm_text, ' ')) AS INT) AS n_tokens_norm
        |FROM n""".stripMargin,

    // Text ALWAYS rebuilt from the token slice on both sides (list
    // slicing is inclusive in DuckDB, so [1:64] is 64 elements).
    "q_truncate_tokens" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
        |  array_to_string(t[1:64], ' ') AS text_trunc,
        |  len(t) > 64 AS truncated
        |FROM toks""".stripMargin,

    // Non-distinct bigrams (repeats counted), total order cutoff.
    "q_top_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i+1] AS ngram
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks))
        |SELECT ngram, COUNT(*) AS n FROM bg GROUP BY 1
        |ORDER BY n DESC, ngram LIMIT 20""".stripMargin,

    // Distinct-per-doc 8-token windows shared by more than one doc.
    "q_dedup_passages" ->
      s"""WITH $corpusNearSql,
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
        |      AS passage
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        |        FROM toks))
        |SELECT passage, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
        |FROM sh GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin,

    // Same features, same double op order, same ln, same 6-dp round.
    "q_quality_score" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      AS nd,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS DOUBLE) AS ns
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    round(0.3 * ln(nt) + 2.0 * (nd / nt) - 1.5 * (ns / nt), 6)
        |      AS q_score
        |  FROM f)
        |SELECT doc_id, q_score, q_score >= 1.4 AS keep FROM s""".stripMargin,

    // Winnow pairs twin: q_winnow's fingerprint build over the injected
    // corpus, df-capped postings, self-join, ≥2 shared.
    "q_dedup_winnow" ->
      s"""WITH $corpusNearSql,
        |toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS grams
        |  FROM toks),
        |hh AS (
        |  SELECT doc_id, list_transform(grams,
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM g),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) >= 4 THEN
        |      list_distinct(list_transform(range(1, len(hs) - 2),
        |        i -> list_min(hs[i:i+3])))
        |    WHEN len(hs) > 0 THEN [list_min(hs)]
        |    ELSE [] END AS fps
        |  FROM hh),
        |fp AS (SELECT doc_id, unnest(fps) AS fp FROM f),
        |rare AS (
        |  SELECT fp FROM fp GROUP BY 1 HAVING COUNT(*) <= 50),
        |pr AS (SELECT fp.doc_id, fp.fp FROM fp JOIN rare USING (fp))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  COUNT(*) AS shared_fps
        |FROM pr a JOIN pr b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING COUNT(*) >= 2""".stripMargin,

    // Source-overlap twin: q_winnow's fingerprint build collapsed to
    // (source, fp) distinct, keyed self-join on fp with source_a <
    // source_b, per-source totals joined back, same Jaccard division
    // rounded 6 dp.
    "q_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT source, list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS grams
        |  FROM toks),
        |h AS (
        |  SELECT source, list_transform(grams,
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM g),
        |f AS (
        |  SELECT source,
        |    CASE WHEN len(hs) >= 4 THEN
        |      list_distinct(list_transform(range(1, len(hs) - 2),
        |        i -> list_min(hs[i:i+3])))
        |    WHEN len(hs) > 0 THEN [list_min(hs)]
        |    ELSE [] END AS fps
        |  FROM h),
        |fp AS (SELECT DISTINCT source, fp
        |       FROM (SELECT source, unnest(fps) AS fp FROM f)),
        |tt AS (SELECT source, COUNT(*) AS n_fps FROM fp GROUP BY 1),
        |pr AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |    COUNT(*) AS shared_fps
        |  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, shared_fps,
        |  ta.n_fps AS n_a, tb.n_fps AS n_b,
        |  round(CAST(shared_fps AS DOUBLE)
        |    / CAST(ta.n_fps + tb.n_fps - shared_fps AS DOUBLE), 6)
        |    AS jaccard
        |FROM pr JOIN tt ta ON pr.source_a = ta.source
        |  JOIN tt tb ON pr.source_b = tb.source""".stripMargin,

    // KMV twin: distinct md5-hashes per lang, bottom-64 by rank, same
    // (k−1)·2⁶⁰/h_k estimator arithmetic.
    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT lang,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents),
        |r AS (
        |  SELECT lang, h,
        |    row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |  FROM h),
        |agg AS (
        |  SELECT lang, CAST(COUNT(*) AS INT) AS k_actual, MAX(h) AS hk
        |  FROM r WHERE rn <= 64 GROUP BY 1)
        |SELECT lang, k_actual, hk,
        |  CASE WHEN k_actual < 64 THEN CAST(k_actual AS DOUBLE)
        |    ELSE 63.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END
        |    AS estimate
        |FROM agg""".stripMargin,

    // Mirrors Mixing.mixPlan: same count/total/least arithmetic in the
    // same op order (share·total/n_s as doubles), same salted lottery.
    "q_corpus_mix" ->
      """WITH t AS (
        |  SELECT DISTINCT source,
        |    (CAST(substr(source, 4) AS INT) + 1) / 210.0 AS share
        |  FROM documents),
        |c AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(n_s) AS n_total FROM c),
        |pl AS (
        |  SELECT c.source,
        |    least(1.0, t.share * CAST(n_total AS DOUBLE)
        |      / CAST(n_s AS DOUBLE)) AS p
        |  FROM c CROSS JOIN tot JOIN t ON c.source = t.source)
        |SELECT d.doc_id, d.source, pl.p,
        |  (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 15))
        |     ::BIGINT % 1000000)
        |    < CAST(floor(pl.p * 1000000.0) AS BIGINT) AS keep
        |FROM documents d JOIN pl ON d.source = pl.source""".stripMargin,

    // Coverage-greedy twin: same distinct (source, shingle) index,
    // 5 unrolled greedy rounds (anti-join marginal counts, the same
    // (c DESC, source) argmax, UNION-accumulated covered set), then
    // the running total over the ≤5-row pick frame.
    "q_source_coverage" -> {
      def covRound(r: Int) =
        s"""g$r AS MATERIALIZED (
           |  SELECT source, COUNT(*) AS c
           |  FROM ss ANTI JOIN cov${r - 1} USING (sh) GROUP BY 1),
           |p$r AS MATERIALIZED (
           |  SELECT $r AS rank, source, c AS new_shingles
           |  FROM g$r ORDER BY c DESC, source LIMIT 1),
           |cov$r AS MATERIALIZED (
           |  SELECT sh FROM cov${r - 1}
           |  UNION
           |  SELECT sh FROM ss JOIN p$r USING (source))""".stripMargin
      s"""WITH toks AS (
         |  SELECT source, string_split(text, ' ') AS t FROM documents),
         |ex AS (SELECT source, t, unnest(range(1, len(t) - 1)) AS i
         |  FROM toks),
         |ss AS MATERIALIZED (SELECT DISTINCT source,
         |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
         |  FROM ex),
         |cov0 AS (SELECT sh FROM ss WHERE 1 = 0),
         |${(1 to 5).map(covRound).mkString(",\n")},
         |allp AS (
         |  ${(1 to 5).map(r => s"SELECT * FROM p$r")
              .mkString("\n  UNION ALL\n  ")})
         |SELECT CAST(rank AS INT) AS rank, source,
         |  CAST(new_shingles AS BIGINT) AS new_shingles,
         |  CAST(SUM(new_shingles) OVER (ORDER BY rank
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_shingles
         |FROM allp""".stripMargin
    },

    // Winnowing twin: ordered 3-gram hash stream, min per 4-window,
    // distinct, unnest. Short streams keep their single min; <3 tokens
    // vanish — both matching TextOps.winnow's guards.
    "q_winnow" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |g AS (
        |  SELECT doc_id, list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS grams
        |  FROM toks),
        |h AS (
        |  SELECT doc_id, list_transform(grams,
        |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM g),
        |f AS (
        |  SELECT doc_id,
        |    CASE WHEN len(hs) >= 4 THEN
        |      list_distinct(list_transform(range(1, len(hs) - 2),
        |        i -> list_min(hs[i:i+3])))
        |    WHEN len(hs) > 0 THEN [list_min(hs)]
        |    ELSE [] END AS fps
        |  FROM h)
        |SELECT doc_id, unnest(fps) AS fp FROM f""".stripMargin,

    // Mirrors Bloom.build/probe exactly: same md5-salted positions, same
    // 32-bit word packing (deliberate — DuckDB's range-checked `<<`
    // rejects shifts into bit 63, so Bloom packs 32-bit words), same
    // AND-of-k test — FPs and all.
    "q_bloom_probe" ->
      """WITH pos AS (
        |  SELECT doc_id, u.i,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':bloom'
        |       || CAST(u.i AS VARCHAR)), 1, 15))::BIGINT % 1024 AS p
        |  FROM documents
        |  CROSS JOIN (SELECT unnest([0, 1, 2]) AS i) u),
        |words AS (
        |  SELECT p // 32 AS word_idx,
        |    bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS bits
        |  FROM pos WHERE doc_id % 2 = 0 GROUP BY 1),
        |chk AS (
        |  SELECT pos.doc_id,
        |    CASE WHEN w.bits IS NOT NULL
        |          AND (w.bits & (1::BIGINT << CAST(pos.p % 32 AS INT))) <> 0
        |      THEN 0 ELSE 1 END AS miss
        |  FROM pos LEFT JOIN words w ON pos.p // 32 = w.word_idx)
        |SELECT doc_id, SUM(miss) = 0 AS maybe_present
        |FROM chk GROUP BY 1""".stripMargin,

    // Same window build as q_dedup_passages, then the keep rule: a doc
    // survives unless it shares a window it isn't the min-id carrier of.
    "q_dedup_passages_clean" ->
      s"""WITH $corpusNearSql,
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
        |      AS passage
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
        |        FROM toks)),
        |dup AS (
        |  SELECT passage, MIN(doc_id) AS min_doc_id
        |  FROM sh GROUP BY 1 HAVING COUNT(*) > 1),
        |off AS (
        |  SELECT DISTINCT s.doc_id FROM sh s
        |  JOIN dup d ON s.passage = d.passage AND s.doc_id <> d.min_doc_id)
        |SELECT doc_id, length(text) AS n_chars FROM corpus
        |WHERE doc_id NOT IN (SELECT doc_id FROM off)""".stripMargin,

    "q_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    md5(CAST(doc_id AS VARCHAR) || ':strat') AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY hk, doc_id) AS INT) AS rk
        |  FROM h)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 50""".stripMargin,

    // Identical contract to the window form — the heap is a physical
    // rewrite, not a semantic one, so the same SQL gates it.
    "q_stratified_sample_heap" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    md5(CAST(doc_id AS VARCHAR) || ':strat') AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, lang, CAST(row_number() OVER (
        |    PARTITION BY lang ORDER BY hk, doc_id) AS INT) AS rk
        |  FROM h)
        |SELECT doc_id, lang, rk FROM r WHERE rk <= 50""".stripMargin,

    // A-ES twin: same 52-bit md5 draw → dyadic-rational u, same top-k
    // total order (raw key DESC, id); emitted key rounded to 6 dp (ln
    // is StrictMath vs libm — last-ULP divergence on ~2% of args).
    "q_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':ws'),
        |            1, 13))::BIGINT) + 1) / 4503599627370496.0)
        |      / CAST(n_chars AS DOUBLE) AS wkey_raw
        |  FROM documents)
        |SELECT doc_id, n_chars, round(wkey_raw, 6) AS wkey FROM h
        |ORDER BY wkey_raw DESC, doc_id LIMIT 100""".stripMargin,

    // Integer-exact rule twins; same thresholds, same cross-multiplied
    // comparisons — no division on either side.
    "q_quality_rules" ->
      """WITH st AS (
        |  SELECT doc_id, len(t) AS n_tokens,
        |    CAST(list_reduce(list_transform(t, x -> length(x)),
        |      (a, b) -> a + b) AS INT) AS sum_len,
        |    len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
        |      AS n_alpha,
        |    len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t
        |        FROM documents))
        |SELECT doc_id, n_tokens, sum_len, n_alpha, n_stop,
        |  n_tokens BETWEEN 30 AND 100000 AS r_len,
        |  sum_len BETWEEN n_tokens * 3 AND n_tokens * 10 AS r_meanw,
        |  n_alpha * 5 >= n_tokens * 4 AS r_alpha,
        |  n_stop >= 2 AS r_stop,
        |  (n_tokens BETWEEN 30 AND 100000)
        |    AND (sum_len BETWEEN n_tokens * 3 AND n_tokens * 10)
        |    AND (n_alpha * 5 >= n_tokens * 4)
        |    AND (n_stop >= 2) AS pass
        |FROM st""".stripMargin,

    // Funnel twin: same injected corpus, same gopher conjunction and
    // stopword-density gate, keeper semi-join among stage-2
    // survivors, same salted-md5 cap lottery — five 1-row aggregates.
    "q_curation_funnel" ->
      """WITH corpus AS (
        |  SELECT doc_id, text, source FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, source FROM documents
        |  WHERE doc_id % 40 = 0),
        |st AS (
        |  SELECT doc_id, text, source, len(t) AS n_tokens,
        |    CAST(list_reduce(list_transform(t, x -> length(x)),
        |      (a, b) -> a + b) AS INT) AS sum_len,
        |    len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
        |      AS n_alpha,
        |    len(list_filter(t, x -> x IN ('the', 'a'))) AS n_stop
        |  FROM (SELECT doc_id, text, source,
        |          string_split(text, ' ') AS t FROM corpus)),
        |fl AS (
        |  SELECT *,
        |    (n_tokens BETWEEN 30 AND 100000)
        |      AND (sum_len BETWEEN n_tokens * 3 AND n_tokens * 10)
        |      AND (n_alpha * 5 >= n_tokens * 4)
        |      AND (n_stop >= 2) AS q_pass,
        |    n_stop * 100 >= n_tokens * 12 AS is_en
        |  FROM st),
        |s1 AS (SELECT * FROM fl WHERE q_pass),
        |s2 AS (SELECT * FROM s1 WHERE is_en),
        |s2f AS (SELECT *, md5(text) AS fp FROM s2),
        |keep AS (SELECT fp, MIN(doc_id) AS doc_id FROM s2f GROUP BY 1),
        |s3 AS (SELECT s2f.* FROM s2f JOIN keep USING (fp, doc_id)),
        |s4 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY source
        |      ORDER BY md5(doc_id::VARCHAR || ':cap'), doc_id) AS rk
        |    FROM s3)
        |  WHERE rk <= 10)
        |SELECT 0 AS stage, 'all' AS stage_name, COUNT(*) AS n_docs,
        |  COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) AS n_tokens
        |FROM fl
        |UNION ALL SELECT 1, 'quality', COUNT(*),
        |  COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s1
        |UNION ALL SELECT 2, 'langid', COUNT(*),
        |  COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s2
        |UNION ALL SELECT 3, 'exact_dedup', COUNT(*),
        |  COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s3
        |UNION ALL SELECT 4, 'domain_cap', COUNT(*),
        |  COALESCE(CAST(SUM(n_tokens) AS BIGINT), 0) FROM s4""".stripMargin,

    // Entropy twin: list_sort(list_distinct) + list_reduce replicate the
    // sorted fold (list_reduce's first-element seed equals Spark's
    // 0.0 + x0 in IEEE); 6-dp round absorbs StrictMath-vs-libm ln ULPs.
    "q_token_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id, len(t) AS n_tokens,
        |  round(ln(CAST(len(t) AS DOUBLE)) -
        |    list_reduce(
        |      list_transform(list_sort(list_distinct(t)),
        |        d -> CAST(len(list_filter(t, x -> x = d)) AS DOUBLE)
        |          * ln(CAST(len(list_filter(t, x -> x = d)) AS DOUBLE))),
        |      (a, b) -> a + b) / CAST(len(t) AS DOUBLE), 6) AS entropy
        |FROM toks""".stripMargin,

    // HLL twin: same 60-bit md5 hash, idx = h % 64, ρ from bit-tests on
    // the 54-bit remainder, dense 64-register fold in index order
    // (list_reduce's first-element seed == Spark's 0.0 + x0 in IEEE),
    // same α·m²/Σ2^−Mⱼ estimator with the linear-counting branch.
    "q_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM events),
        |hr AS (SELECT event_type, h % 64 AS idx, h >> 6 AS rest FROM h),
        |rho AS (
        |  SELECT event_type, idx,
        |    COALESCE(list_min(list_filter(list_transform(range(1, 55),
        |      r -> CASE WHEN (rest >> (54 - r)) & 1 = 1 THEN r END),
        |      x -> x IS NOT NULL)), 55) AS rho
        |  FROM hr),
        |regs AS (
        |  SELECT event_type, idx, MAX(rho) AS mj FROM rho GROUP BY 1, 2),
        |dense AS (
        |  SELECT g.event_type, r.idx, COALESCE(regs.mj, 0) AS mj
        |  FROM (SELECT DISTINCT event_type FROM events) g
        |  CROSS JOIN range(64) r(idx)
        |  LEFT JOIN regs ON regs.event_type = g.event_type
        |    AND regs.idx = r.idx),
        |agg AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(list(mj ORDER BY idx),
        |      v -> 1.0 / (1::BIGINT << v)), (x, y) -> x + y) AS sum_inv,
        |    COUNT(*) FILTER (WHERE mj = 0) AS zeros
        |  FROM dense GROUP BY 1),
        |ex AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_n
        |  FROM events GROUP BY 1)
        |SELECT agg.event_type, zeros,
        |  round(CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
        |        / sum_inv <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / zeros)
        |      ELSE (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 / sum_inv
        |    END, 6) AS estimate,
        |  ex.exact_n
        |FROM agg JOIN ex ON agg.event_type = ex.event_type""".stripMargin,

    // HLL-merge twin: the q_hll_distinct register chain with one extra
    // shard level — per-(type, day) MAX(rho), then register-wise
    // MAX(mj) across days — before the identical densify/fold/correct
    // tail. Proves merge ≡ direct on the same substrate.
    "q_hll_merge" ->
      """WITH h AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM events),
        |hr AS (SELECT event_type, day, h % 64 AS idx, h >> 6 AS rest
        |  FROM h),
        |rho AS (
        |  SELECT event_type, day, idx,
        |    COALESCE(list_min(list_filter(list_transform(range(1, 55),
        |      r -> CASE WHEN (rest >> (54 - r)) & 1 = 1 THEN r END),
        |      x -> x IS NOT NULL)), 55) AS rho
        |  FROM hr),
        |shard AS (
        |  SELECT event_type, day, idx, MAX(rho) AS mj
        |  FROM rho GROUP BY 1, 2, 3),
        |regs AS (
        |  SELECT event_type, idx, MAX(mj) AS mj FROM shard GROUP BY 1, 2),
        |dense AS (
        |  SELECT g.event_type, r.idx, COALESCE(regs.mj, 0) AS mj
        |  FROM (SELECT DISTINCT event_type FROM events) g
        |  CROSS JOIN range(64) r(idx)
        |  LEFT JOIN regs ON regs.event_type = g.event_type
        |    AND regs.idx = r.idx),
        |agg AS (
        |  SELECT event_type,
        |    list_reduce(list_transform(list(mj ORDER BY idx),
        |      v -> 1.0 / (1::BIGINT << v)), (x, y) -> x + y) AS sum_inv,
        |    COUNT(*) FILTER (WHERE mj = 0) AS zeros
        |  FROM dense GROUP BY 1),
        |ex AS (
        |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_n
        |  FROM events GROUP BY 1)
        |SELECT agg.event_type, zeros,
        |  round(CASE WHEN (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0
        |        / sum_inv <= 160.0 AND zeros > 0
        |      THEN 64.0 * ln(64.0 / zeros)
        |      ELSE (0.7213 / (1.0 + 1.079 / 64.0)) * 64.0 * 64.0 / sum_inv
        |    END, 6) AS estimate,
        |  ex.exact_n
        |FROM agg JOIN ex ON agg.event_type = ex.event_type""".stripMargin,

    // HDR-quantile twin: identical integer bin (length(bin(v))−1
    // octave + 4 mantissa bits), cumulative counts, ⌈p·n⌉ rank, and
    // exact-decimal midpoint; SUMs cast back to BIGINT (DuckDB widens
    // to HUGEINT).
    "q_quantile_sketch" ->
      """WITH v AS (
        |  SELECT l_returnflag AS g,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS vc
        |  FROM lineitem
        |  WHERE CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) >= 1),
        |b AS (
        |  SELECT g, CASE WHEN vc < 16 THEN vc
        |    ELSE (length(bin(vc)) - 4) * 16
        |      + ((vc >> greatest(length(bin(vc)) - 5, 0)) & 15) END AS bin
        |  FROM v),
        |c AS (SELECT g, bin, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
        |cum AS (
        |  SELECT g, bin,
        |    CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY bin) AS BIGINT)
        |      AS cum,
        |    CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM c),
        |pq AS (
        |  SELECT g, bin, cum, n, CAST(p AS DECIMAL(4,2)) AS p,
        |    CAST(ceil(CAST(p AS DECIMAL(4,2)) * n) AS BIGINT) AS rank
        |  FROM cum CROSS JOIN (VALUES (0.50), (0.95), (0.99)) ps(p)),
        |sel AS (
        |  SELECT g, p, n, rank, bin,
        |    ROW_NUMBER() OVER (PARTITION BY g, p ORDER BY bin) AS rn
        |  FROM pq WHERE cum >= rank)
        |SELECT g AS l_returnflag, p, n, rank, bin,
        |  CAST(CAST(CASE WHEN bin < 16 THEN bin * 2
        |      ELSE ((bin % 16 + 16) << (bin // 16 - 1)) * 2
        |        + (1 << (bin // 16 - 1)) END AS DECIMAL(18,3))
        |    * CAST(0.005 AS DECIMAL(4,3)) AS DECIMAL(18,3)) AS est
        |FROM sel WHERE rn = 1""".stripMargin,

    // Decile twin: the quantile-sketch bin chain at p = 0.1‥0.9, the
    // 9 boundary bins as one sorted list, per-row strict-compare fold.
    "q_price_deciles" ->
      """WITH d AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS vc
        |  FROM orders
        |  WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) >= 1),
        |b AS (
        |  SELECT o_orderkey, vc, CASE WHEN vc < 16 THEN vc
        |    ELSE (length(bin(vc)) - 4) * 16
        |      + ((vc >> greatest(length(bin(vc)) - 5, 0)) & 15) END
        |    AS bin
        |  FROM d),
        |c AS (SELECT bin, COUNT(*) AS cnt FROM b GROUP BY 1),
        |cum AS (
        |  SELECT bin,
        |    CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum,
        |    CAST(SUM(cnt) OVER () AS BIGINT) AS n
        |  FROM c),
        |pq AS (
        |  SELECT bin, cum, n, CAST(p AS DECIMAL(4,2)) AS p,
        |    CAST(ceil(CAST(p AS DECIMAL(4,2)) * n) AS BIGINT) AS rank
        |  FROM cum CROSS JOIN (VALUES (0.10), (0.20), (0.30), (0.40),
        |    (0.50), (0.60), (0.70), (0.80), (0.90)) ps(p)),
        |sel AS (
        |  SELECT p, bin,
        |    ROW_NUMBER() OVER (PARTITION BY p ORDER BY bin) AS rn
        |  FROM pq WHERE cum >= rank),
        |bounds AS (
        |  SELECT list_sort(list(bin)) AS bs FROM sel WHERE rn = 1)
        |SELECT o_orderkey, vc, bin,
        |  len(list_filter(bs, x -> bin > x)) + 1 AS decile
        |FROM b CROSS JOIN bounds""".stripMargin,

    // CMS twin: same md5-salted (row, bucket) hashing, 3×256 summed
    // cells (cast back to BIGINT — DuckDB SUM(BIGINT) widens to
    // HUGEINT), min-over-rows estimate for the same top-20 cut.
    "q_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |cnt AS (SELECT token, COUNT(*) AS exact_n FROM tok GROUP BY 1),
        |rb AS (
        |  SELECT token, exact_n, r,
        |    ('0x' || substr(md5(token || ':cms:' || r), 1, 15))::BIGINT
        |      % 256 AS b
        |  FROM cnt CROSS JOIN range(3) t(r)),
        |cells AS (
        |  SELECT r, b, CAST(SUM(exact_n) AS BIGINT) AS cell
        |  FROM rb GROUP BY 1, 2),
        |top AS (
        |  SELECT token, exact_n FROM cnt
        |  ORDER BY exact_n DESC, token LIMIT 20)
        |SELECT top.token, top.exact_n, MIN(cells.cell) AS cms_est
        |FROM top
        |JOIN rb ON rb.token = top.token
        |JOIN cells ON rb.r = cells.r AND rb.b = cells.b
        |GROUP BY 1, 2""".stripMargin,

    // Grouped-CMS twin: the q_heavy_hitters chain with the group
    // dimension threaded through cells and a per-group top-5 window.
    "q_heavy_hitters_by_lang" ->
      """WITH tok AS (
        |  SELECT lang AS g, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (SELECT g, token, COUNT(*) AS exact_n
        |  FROM tok GROUP BY 1, 2),
        |rb AS (
        |  SELECT g, token, exact_n, r,
        |    ('0x' || substr(md5(token || ':cms:' || r), 1, 15))::BIGINT
        |      % 256 AS b
        |  FROM cnt CROSS JOIN range(3) t(r)),
        |cells AS (
        |  SELECT g, r, b, CAST(SUM(exact_n) AS BIGINT) AS cell
        |  FROM rb GROUP BY 1, 2, 3),
        |top AS (
        |  SELECT g, token, exact_n FROM (
        |    SELECT g, token, exact_n, row_number() OVER (
        |      PARTITION BY g ORDER BY exact_n DESC, token) AS rk
        |    FROM cnt) WHERE rk <= 5)
        |SELECT top.g AS lang, top.token, top.exact_n,
        |  MIN(cells.cell) AS cms_est
        |FROM top
        |JOIN rb ON rb.g = top.g AND rb.token = top.token
        |JOIN cells ON rb.g = cells.g AND rb.r = cells.r
        |  AND rb.b = cells.b
        |GROUP BY 1, 2, 3""".stripMargin,

    // Containment twin: the jaccard CTE chain's index with BOTH-direction
    // pairs and the per-sub-doc integer threshold. Mirrors the Scala
    // default maxDocFreq=Some(50): candidate generation joins only
    // shingles in ≤50 docs, but sz (the containment denominator) stays
    // on the UNCAPPED index, exactly like Dedup.containmentPairs.
    "q_dedup_containment" ->
      s"""WITH $corpusNearSql,
         |$shinglesSql,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         |rare AS (SELECT shingle FROM sh GROUP BY 1 HAVING COUNT(*) <= 50),
         |shc AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
         |inter AS (
         |  SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
         |    COUNT(*) AS intersect_n
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle
         |    AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_sub, doc_sup, intersect_n, sa.sz AS sub_sz
         |FROM inter JOIN sz sa ON inter.doc_sub = sa.doc_id
         |WHERE intersect_n * 10 >= sa.sz * 9""".stripMargin,

    // Excision twin: positional (non-distinct) 8-token windows, the
    // duplicated-window set from the DISTINCT view, covered positions
    // via a bounded range explode, anti-joined token rebuild in
    // position order. Spark's posexplode is 0-based → i − 1.
    "q_dedup_passages_excise" ->
      s"""WITH $corpusNearSql,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
         |      AS passage
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |        FROM toks)),
         |dup AS (
         |  SELECT passage FROM (SELECT DISTINCT doc_id, passage FROM win)
         |  GROUP BY 1 HAVING COUNT(*) > 1),
         |cov AS (
         |  SELECT DISTINCT w.doc_id, w.pos + r.j AS tpos
         |  FROM win w JOIN dup USING (passage) CROSS JOIN range(8) r(j)),
         |tk AS (
         |  SELECT doc_id, tpos, t[tpos + 1] AS tok
         |  FROM (SELECT doc_id, t, unnest(range(len(t))) AS tpos
         |        FROM toks)),
         |kept AS (
         |  SELECT tk.doc_id, tk.tpos, tk.tok FROM tk
         |  ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos),
         |reb AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS kept
         |  FROM kept GROUP BY 1),
         |rem AS (SELECT doc_id, COUNT(*) AS nrm FROM cov GROUP BY 1)
         |SELECT c.doc_id, COALESCE(reb.kept, '') AS text_clean,
         |  COALESCE(rem.nrm, 0) AS n_removed
         |FROM corpus c
         |LEFT JOIN reb ON c.doc_id = reb.doc_id
         |LEFT JOIN rem ON c.doc_id = rem.doc_id""".stripMargin,

    // Substring-span twin: the excise twin's positional 8-windows and
    // cross-doc duplicated set, then gaps-and-islands under the same
    // per-doc lag/sum windows (NULL first-lag opens island 1 in both
    // engines) and a 1-based list slice for the span text.
    "q_dedup_substring" ->
      s"""WITH $corpusNearSql,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
         |      AS passage
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |        FROM toks)),
         |dup AS (
         |  SELECT passage FROM (SELECT DISTINCT doc_id, passage FROM win)
         |  GROUP BY 1 HAVING COUNT(*) > 1),
         |anch AS (SELECT w.doc_id, w.pos FROM win w JOIN dup USING (passage)),
         |brk AS (
         |  SELECT doc_id, pos, CASE
         |      WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
         |      THEN 0 ELSE 1 END AS b
         |  FROM anch),
         |isl AS (
         |  SELECT doc_id, pos,
         |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |  FROM brk),
         |spans AS (
         |  SELECT doc_id, island, MIN(pos) AS span_start,
         |    MAX(pos) + 7 AS span_end
         |  FROM isl GROUP BY 1, 2)
         |SELECT s.doc_id, s.span_start,
         |  s.span_end - s.span_start + 1 AS span_tokens,
         |  array_to_string(t[s.span_start + 1 : s.span_end + 1], ' ')
         |    AS span_text
         |FROM spans s JOIN toks USING (doc_id)""".stripMargin,

    // Stitch twin: the chunkOverlap slice chain (start ∈ range(0, len,
    // 24), 32-token windows), ≥8-token fragments only, head/tail
    // 8-grams, one gram-keyed join.
    "q_stitch_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |ch AS (
        |  SELECT doc_id, unnest(range(0, len(t), 24)) AS start, t
        |  FROM toks),
        |frag AS (
        |  SELECT doc_id * 10000 + start // 24 AS frag_id,
        |    t[start + 1 : least(start + 32, len(t))] AS ft
        |  FROM ch),
        |f AS (SELECT frag_id, ft FROM frag WHERE len(ft) >= 8),
        |heads AS (
        |  SELECT frag_id AS frag_b, array_to_string(ft[1:8], ' ') AS gram
        |  FROM f),
        |tails AS (
        |  SELECT frag_id AS frag_a,
        |    array_to_string(ft[len(ft) - 7 : len(ft)], ' ') AS gram
        |  FROM f)
        |SELECT frag_a, frag_b, gram
        |FROM tails JOIN heads USING (gram)
        |WHERE frag_a <> frag_b""".stripMargin,

    // Substring-excise twin: the passages-excise skeleton with the
    // keep-one rule — dup carries MIN(doc_id), covered positions only
    // where the witness is NOT the canonical holder.
    "q_substring_excise" ->
      s"""WITH $corpusNearSql,
         |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
         |win AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
         |    t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7]
         |      AS passage
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 6)) AS i
         |        FROM toks)),
         |dup AS (
         |  SELECT passage, MIN(doc_id) AS mdoc
         |  FROM (SELECT DISTINCT doc_id, passage FROM win)
         |  GROUP BY 1 HAVING COUNT(*) > 1),
         |cov AS (
         |  SELECT DISTINCT w.doc_id, w.pos + r.j AS tpos
         |  FROM win w JOIN dup USING (passage) CROSS JOIN range(8) r(j)
         |  WHERE w.doc_id <> dup.mdoc),
         |tk AS (
         |  SELECT doc_id, tpos, t[tpos + 1] AS tok
         |  FROM (SELECT doc_id, t, unnest(range(len(t))) AS tpos
         |        FROM toks)),
         |kept AS (
         |  SELECT tk.doc_id, tk.tpos, tk.tok FROM tk
         |  ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.tpos = cov.tpos),
         |reb AS (
         |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS kept
         |  FROM kept GROUP BY 1),
         |rem AS (SELECT doc_id, COUNT(*) AS nrm FROM cov GROUP BY 1)
         |SELECT c.doc_id, COALESCE(reb.kept, '') AS text_clean,
         |  COALESCE(rem.nrm, 0) AS n_removed
         |FROM corpus c
         |LEFT JOIN reb ON c.doc_id = reb.doc_id
         |LEFT JOIN rem ON c.doc_id = rem.doc_id""".stripMargin,

    // Agreement twin: the shared jaccard pairs chain FULL OUTER JOINed
    // with the simhash band-pair chain (same md5 vocabulary votes),
    // three conditional counts.
    "q_dedup_agreement" -> {
      val votes = (0 until 60)
        .map(j => s"SUM((((h >> $j) & 1) * 2 - 1) * w) AS s$j")
        .mkString(", ")
      val sig = (0 until 60)
        .map(j =>
          s"CASE WHEN s$j > 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END")
        .mkString(" + ")
      s"""WITH $pairsCteSql,
         |tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM corpus),
         |w AS (SELECT doc_id, tok, COUNT(*) AS w FROM tok GROUP BY 1, 2),
         |vcb AS (
         |  SELECT DISTINCT tok,
         |    ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
         |  FROM tok),
         |hh AS (SELECT w.doc_id, vcb.h, w.w FROM w JOIN vcb USING (tok)),
         |vt AS (SELECT doc_id, $votes FROM hh GROUP BY doc_id),
         |sg AS (SELECT doc_id, $sig AS simhash FROM vt),
         |sp AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3)
         |SELECT
         |  CAST(SUM(CASE WHEN p.doc_a IS NOT NULL AND sp.doc_a IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         |  CAST(SUM(CASE WHEN sp.doc_a IS NULL AND p.doc_a IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_jaccard_only,
         |  CAST(SUM(CASE WHEN p.doc_a IS NULL AND sp.doc_a IS NOT NULL
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_simhash_only
         |FROM pairs p
         |FULL OUTER JOIN sp
         |  ON p.doc_a = sp.doc_a AND p.doc_b = sp.doc_b""".stripMargin
    },

    // Threshold-curve twin: the pairs chain re-anchored at τ = 5/10,
    // the same threshold sweep as a bounded range cross join.
    "q_dedup_thresholds" ->
      s"""WITH $corpusNearSql,
         |$shinglesSql,
         |sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    COUNT(*) AS intersect_n
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |p5 AS (
         |  SELECT doc_a, doc_b, intersect_n,
         |    sa.sz + sb.sz - intersect_n AS union_n
         |  FROM inter
         |  JOIN sz sa ON inter.doc_a = sa.doc_id
         |  JOIN sz sb ON inter.doc_b = sb.doc_id
         |  WHERE intersect_n * 10 >= (sa.sz + sb.sz - intersect_n) * 5),
         |sweep AS (
         |  SELECT doc_a, doc_b, ti FROM p5 CROSS JOIN range(5, 10) r(ti)
         |  WHERE intersect_n * 10 >= union_n * ti)
         |SELECT CAST(ti AS INT) AS tau_tenths, COUNT(*) AS n_pairs
         |FROM sweep GROUP BY 1""".stripMargin,

    // Self-repeat twin: positional 3-windows, within-doc multiplicity
    // via GROUP BY (doc, passage) HAVING COUNT(*) > 1 on the
    // POSITIONAL (non-distinct) windows, then the shared islands
    // skeleton with gap <= 3 and a 1-based slice.
    "q_dedup_selfrepeat" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, i - 1 AS pos,
        |    t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS passage
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - 1)) AS i
        |        FROM toks)),
        |rep AS (
        |  SELECT doc_id, passage FROM win
        |  GROUP BY 1, 2 HAVING COUNT(*) > 1),
        |anch AS (
        |  SELECT w.doc_id, w.pos
        |  FROM win w JOIN rep ON w.doc_id = rep.doc_id
        |    AND w.passage = rep.passage),
        |brk AS (
        |  SELECT doc_id, pos, CASE
        |      WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 3
        |      THEN 0 ELSE 1 END AS b
        |  FROM anch),
        |isl AS (
        |  SELECT doc_id, pos,
        |    SUM(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |  FROM brk),
        |spans AS (
        |  SELECT doc_id, island, MIN(pos) AS span_start,
        |    MAX(pos) + 2 AS span_end
        |  FROM isl GROUP BY 1, 2)
        |SELECT s.doc_id, s.span_start,
        |  s.span_end - s.span_start + 1 AS span_tokens,
        |  array_to_string(t[s.span_start + 1 : s.span_end + 1], ' ')
        |    AS span_text
        |FROM spans s JOIN toks USING (doc_id)""".stripMargin,

    // Keyword-tag twin: the same literal dictionary as a VALUES list,
    // unigrams plus positional bigrams, one join + one aggregate.
    "q_keyword_tags" ->
      """WITH dict(term, topic) AS (VALUES
        |  ('scan','engine'), ('join','engine'), ('filter','engine'),
        |  ('agg','engine'), ('hash join','engine'),
        |  ('sort merge','engine'), ('table','storage'),
        |  ('column','storage'), ('row','storage'),
        |  ('stream','streaming'), ('window','streaming'),
        |  ('batch','streaming')),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |uni AS (SELECT doc_id, unnest(t) AS term FROM toks),
        |bi AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS term
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |a AS (SELECT * FROM uni UNION ALL SELECT * FROM bi)
        |SELECT a.doc_id, d.topic, COUNT(*) AS n_hits
        |FROM a JOIN dict d USING (term)
        |GROUP BY 1, 2""".stripMargin,

    // Domain-cap twin: the cluster_rep score idiom (distinct-token
    // count) ranked per source with the same tiebreak, rank <= 15.
    "q_domain_cap" ->
      """WITH scored AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INT)
        |      AS score
        |  FROM documents),
        |rk AS (
        |  SELECT doc_id, source, score, ROW_NUMBER() OVER (
        |      PARTITION BY source ORDER BY score DESC, doc_id ASC)
        |    AS domain_rank
        |  FROM scored)
        |SELECT doc_id, source, score, domain_rank
        |FROM rk WHERE domain_rank <= 15""".stripMargin,

    // Bigram-LM twin: same positional bigram build, same smoothed
    // probability arithmetic ((n2+1)/(n1+V) as doubles, ln probed
    // bit-identical), same position-ordered sum fold, 6-dp mean.
    "q_lm_score" ->
      s"""WITH $lmCtesSql
         |SELECT doc_id, n_bigrams, avg_logp FROM lm""".stripMargin,

    // KN twin: same three count aggregates (bigram / history+distinct-
    // continuation / distinct-history), same discount-interpolation
    // operation tree inside ln, position-ordered fold.
    "q_lm_kn" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, i - 1 AS pos, t[i] || ' ' || t[i+1] AS bigram,
        |    t[i] AS w1, t[i+1] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |c2 AS (SELECT bigram, COUNT(*) AS n2 FROM bg GROUP BY 1),
        |ch AS (SELECT w1, COUNT(*) AS ch, COUNT(DISTINCT w2) AS n1f
        |       FROM bg GROUP BY 1),
        |cc AS (SELECT w2, COUNT(DISTINCT w1) AS n1b FROM bg GROUP BY 1),
        |ty AS (SELECT COUNT(DISTINCT bigram) AS nt FROM bg),
        |lp AS (
        |  SELECT bg.doc_id, bg.pos,
        |    ln(greatest(CAST(n2 AS DOUBLE) - 0.75, 0.0)
        |         / CAST(ch AS DOUBLE)
        |       + (0.75 * CAST(n1f AS DOUBLE) / CAST(ch AS DOUBLE))
        |         * (CAST(n1b AS DOUBLE) / CAST(nt AS DOUBLE))) AS logp
        |  FROM bg JOIN c2 USING (bigram) JOIN ch ON bg.w1 = ch.w1
        |    JOIN cc ON bg.w2 = cc.w2 CROSS JOIN ty),
        |agg AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    list_reduce(list(logp ORDER BY pos), (a, b) -> a + b) AS s
        |  FROM lp GROUP BY 1)
        |SELECT doc_id, n_bigrams, round(s / n_bigrams, 6) AS avg_logp
        |FROM agg""".stripMargin,

    // LM-bucket twin: the shared lm chain + the q_quartiles
    // quantile_disc boundary/indicator-sum skeleton over avg_logp.
    "q_lm_buckets" ->
      s"""WITH $lmCtesSql,
         |c AS (
         |  SELECT quantile_disc(avg_logp, 0.25) AS c1,
         |         quantile_disc(avg_logp, 0.50) AS c2,
         |         quantile_disc(avg_logp, 0.75) AS c3
         |  FROM lm)
         |SELECT doc_id, avg_logp,
         |  CAST(1 + (avg_logp > c1)::INT + (avg_logp > c2)::INT
         |         + (avg_logp > c3)::INT AS INT) AS bucket
         |FROM lm CROSS JOIN c""".stripMargin,

    // PPMI twin: same endpoint pair build per distance, both
    // directions, same count marginals and PMI tree, clamp after the
    // 6-dp round, (ppmi DESC, w, c) top-50 with the support floor.
    "q_ppmi_window" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |e1 AS (
        |  SELECT t[i] AS a, t[i+1] AS b
        |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)),
        |e2 AS (
        |  SELECT t[i] AS a, t[i+2] AS b
        |  FROM (SELECT t, unnest(range(1, len(t) - 1)) AS i FROM toks)),
        |ends AS (SELECT a, b FROM e1 UNION ALL SELECT a, b FROM e2),
        |pairs AS (SELECT a AS w, b AS c FROM ends
        |          UNION ALL SELECT b AS w, a AS c FROM ends),
        |nwc AS (SELECT w, c, COUNT(*) AS n_wc FROM pairs GROUP BY 1, 2),
        |nw AS (SELECT w, COUNT(*) AS n_w FROM pairs GROUP BY 1),
        |nc AS (SELECT c, COUNT(*) AS n_c FROM pairs GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS t FROM pairs)
        |SELECT w, c, n_wc,
        |  greatest(round(ln(CAST(n_wc AS DOUBLE) * CAST(t AS DOUBLE)
        |    / (CAST(n_w AS DOUBLE) * CAST(n_c AS DOUBLE))), 6), 0.0)
        |    AS ppmi
        |FROM nwc JOIN nw USING (w) JOIN nc USING (c) CROSS JOIN tot
        |WHERE n_wc >= 5
        |  AND greatest(round(ln(CAST(n_wc AS DOUBLE) * CAST(t AS DOUBLE)
        |    / (CAST(n_w AS DOUBLE) * CAST(n_c AS DOUBLE))), 6), 0.0) > 0.0
        |ORDER BY ppmi DESC, w, c LIMIT 50""".stripMargin,

    // Naive Bayes twin: same train/test split, same (class, token)
    // count aggregates, same add-one likelihood tree (ln of
    // count-ratio doubles), position-ordered list_reduce fold per
    // (doc, class), prior added OUTSIDE the fold, argmax by
    // (score DESC, cls) — every piece the operation tree the Spark
    // side builds.
    "q_nb_classifier" ->
      s"""WITH $nbCtesSql
        |SELECT doc_id, cls AS pred, round(score, 6) AS score, actual,
        |  (cls = actual) AS correct
        |FROM fin WHERE rk = 1""".stripMargin,

    // NB-eval twin: the shared NB chain's verdicts, class union frame,
    // three confusion counts, the same zero-division-guarded ratio and
    // F1 trees (F1 from the UNROUNDED p and r).
    "q_nb_eval" -> {
      val pExpr = "CASE WHEN n_pred > 0 THEN CAST(n_tp AS DOUBLE) " +
        "/ CAST(n_pred AS DOUBLE) ELSE 0.0 END"
      val rExpr = "CASE WHEN n_actual > 0 THEN CAST(n_tp AS DOUBLE) " +
        "/ CAST(n_actual AS DOUBLE) ELSE 0.0 END"
      s"""WITH $nbCtesSql,
        |nbv AS (SELECT doc_id, cls AS pred, actual FROM fin
        |        WHERE rk = 1),
        |classes AS (SELECT DISTINCT cls FROM (
        |  SELECT pred AS cls FROM nbv
        |  UNION ALL SELECT actual AS cls FROM nbv)),
        |tpx AS (SELECT pred AS cls, COUNT(*) AS n_tp FROM nbv
        |        WHERE pred = actual GROUP BY 1),
        |npx AS (SELECT pred AS cls, COUNT(*) AS n_pred FROM nbv
        |        GROUP BY 1),
        |nax AS (SELECT actual AS cls, COUNT(*) AS n_actual FROM nbv
        |        GROUP BY 1),
        |j AS (
        |  SELECT classes.cls,
        |    CAST(COALESCE(n_tp, 0) AS BIGINT) AS n_tp,
        |    CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
        |    CAST(COALESCE(n_actual, 0) AS BIGINT) AS n_actual
        |  FROM classes LEFT JOIN tpx USING (cls)
        |    LEFT JOIN npx USING (cls) LEFT JOIN nax USING (cls))
        |SELECT cls, n_tp, n_pred, n_actual,
        |  round($pExpr, 6) AS precision,
        |  round($rExpr, 6) AS recall,
        |  round(CASE WHEN ($pExpr + $rExpr) > 0
        |    THEN 2.0 * $pExpr * $rExpr / ($pExpr + $rExpr)
        |    ELSE 0.0 END, 6) AS f1
        |FROM j""".stripMargin
    },

    // Calibration twin: the shared NB chain's rk=1 and rk=2 frames,
    // 1e-6-snapped margin, integer DIV bins capped at 9, exact bin
    // counts, two divisions on the bin rows.
    "q_nb_calibration" ->
      s"""WITH $calibCtesSql
         |SELECT bin, n_docs, n_correct, accuracy, mean_margin
         |FROM calib""".stripMargin,

    // AUC twin: the shared NB fin frame, per-class one-vs-rest
    // margins (vs the best OTHER class via the rk=1/rk=2 legs),
    // doubled midranks, the U identity — exact integers until the
    // final division.
    "q_nb_auc" ->
      s"""WITH $nbCtesSql,
         |m1 AS (SELECT doc_id, cls AS a1, score AS s1 FROM fin
         |       WHERE rk = 1),
         |m2 AS (SELECT doc_id, score AS s2 FROM fin WHERE rk = 2),
         |marg AS (
         |  SELECT f.cls, f.actual = f.cls AS y,
         |    CAST(round((CASE WHEN f.cls = m1.a1 THEN f.score - m2.s2
         |      ELSE f.score - m1.s1 END) * 1e6, 0) AS BIGINT) AS sfp
         |  FROM fin f JOIN m1 USING (doc_id) JOIN m2 USING (doc_id)),
         |rk2 AS (
         |  SELECT cls, y,
         |    2 * rank() OVER (PARTITION BY cls ORDER BY sfp)
         |      + COUNT(*) OVER (PARTITION BY cls, sfp) - 1 AS r2
         |  FROM marg),
         |agg AS (
         |  SELECT cls,
         |    CAST(SUM(CASE WHEN y THEN r2 ELSE 0 END) AS BIGINT)
         |      AS spos2,
         |    CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos,
         |    CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_neg
         |  FROM rk2 GROUP BY 1)
         |SELECT cls, n_pos, n_neg,
         |  round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    CAST(spos2 - n_pos * (n_pos + 1) AS DOUBLE)
         |      / CAST(2 * n_pos * n_neg AS DOUBLE) END, 6) AS auc,
         |  round(CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         |    2.0 * (CAST(spos2 - n_pos * (n_pos + 1) AS DOUBLE)
         |      / CAST(2 * n_pos * n_neg AS DOUBLE)) - 1.0 END, 6)
         |    AS gini
         |FROM agg""".stripMargin,

    // CDC twin: the winnow k-gram hash chain, the same boundary rule
    // and (start, end] slice reconstruction, exact token volumes.
    "q_cdc_chunks" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |h AS (
        |  SELECT source, t,
        |    list_transform(
        |      list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
        |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
        |  FROM toks),
        |cut AS (
        |  SELECT source, t,
        |    list_transform(
        |      list_filter(range(1, len(hs) + 1), i -> hs[i] % 16 = 0),
        |      i -> i + 2) AS cuts
        |  FROM h),
        |chunks AS (
        |  SELECT source,
        |    unnest(list_transform(range(1, len(cuts) + 2),
        |      ci -> array_to_string(
        |        t[([0] || cuts)[ci] + 1 : (cuts || [len(t)])[ci]],
        |        ' '))) AS chunk
        |  FROM cut),
        |ch AS (
        |  SELECT source, chunk,
        |    ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS fp,
        |    CAST(len(string_split(chunk, ' ')) AS BIGINT) AS toks
        |  FROM chunks WHERE chunk <> ''),
        |per AS (
        |  SELECT source, fp, COUNT(*) AS n, MAX(toks) AS toks
        |  FROM ch GROUP BY 1, 2)
        |SELECT source, CAST(SUM(n) AS BIGINT) AS n_chunks,
        |  COUNT(*) AS n_distinct,
        |  CAST(SUM(n * toks) AS BIGINT) AS total_tokens,
        |  CAST(SUM(toks) AS BIGINT) AS distinct_tokens,
        |  round(1.0 - CAST(SUM(toks) AS DOUBLE)
        |    / CAST(SUM(n * toks) AS DOUBLE), 6) AS dedup_share
        |FROM per GROUP BY 1""".stripMargin,

    // Isotonic-calibration twin: the shared calibration-bin chain +
    // the minimax closed form over the <= 10-bin enumeration.
    "q_isotonic" ->
      s"""WITH $calibCtesSql,
         |cum AS (
         |  SELECT bin,
         |    CAST(SUM(n_docs) OVER w AS BIGINT) AS nc,
         |    CAST(SUM(n_correct) OVER w AS BIGINT) AS cc
         |  FROM calib
         |  WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)),
         |lo AS (
         |  SELECT bin AS i,
         |    COALESCE(LAG(nc) OVER (ORDER BY bin), 0) AS n0,
         |    COALESCE(LAG(cc) OVER (ORDER BY bin), 0) AS c0
         |  FROM cum),
         |pairs AS (
         |  SELECT lo.i, c.bin AS k,
         |    CAST(c.cc - lo.c0 AS DOUBLE)
         |      / CAST(c.nc - lo.n0 AS DOUBLE) AS avg
         |  FROM lo JOIN cum c ON lo.i <= c.bin),
         |trip AS (
         |  SELECT cb.bin AS j, p.i, MIN(p.avg) AS minavg
         |  FROM calib cb JOIN pairs p
         |    ON p.i <= cb.bin AND p.k >= cb.bin
         |  GROUP BY 1, 2),
         |iso AS (SELECT j AS bin, MAX(minavg) AS cal FROM trip
         |  GROUP BY 1)
         |SELECT calib.bin, n_docs, accuracy,
         |  round(cal, 6) AS calibrated
         |FROM calib JOIN iso USING (bin)""".stripMargin,

    // Confident-learning twin: the shared NB chain, margin
    // self-confidence snapped at 1e-6, rational thresholds compared
    // by cross-multiplication, (fp DESC, cls) argmax, |C|² counts.
    "q_label_noise" ->
      s"""WITH $nbCtesSql,
         |s1 AS (SELECT doc_id, cls AS top_cls, score AS s1 FROM fin
         |       WHERE rk = 1),
         |s2 AS (SELECT doc_id, score AS s2 FROM fin WHERE rk = 2),
         |rel AS MATERIALIZED (
         |  SELECT f.doc_id, f.actual, f.cls,
         |    CAST(round((CASE WHEN f.cls = s1.top_cls
         |      THEN f.score - s2.s2
         |      ELSE f.score - s1.s1 END) * 1e6) AS BIGINT) AS fp
         |  FROM fin f JOIN s1 USING (doc_id) JOIN s2 USING (doc_id)),
         |th AS (SELECT cls, CAST(SUM(fp) AS BIGINT) AS sfp,
         |    COUNT(*) AS n_lbl
         |  FROM rel WHERE actual = cls GROUP BY 1),
         |qual AS (SELECT r.doc_id, r.actual, r.cls, r.fp
         |  FROM rel r JOIN th USING (cls)
         |  WHERE r.fp * th.n_lbl >= th.sfp),
         |pick AS (SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY doc_id
         |      ORDER BY fp DESC, cls) AS rn FROM qual)
         |  WHERE rn = 1)
         |SELECT actual AS label, cls AS pred_class,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  (actual <> cls) AS suspect
         |FROM pick GROUP BY 1, 2""".stripMargin,

    // PMI twin: three count aggregates over the same positional bigram
    // build, exact double products (counts < 2^26), 6-dp ln, (pmi desc,
    // bigram) tie-broken top-50 with the n2 >= 5 support floor.
    "q_bigram_pmi" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1,
        |    t[i+1] AS w2
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |n2 AS (
        |  SELECT bigram, w1, w2, COUNT(*) AS n2 FROM bg GROUP BY 1, 2, 3),
        |tot AS (SELECT COUNT(*) AS n FROM bg),
        |m1 AS (SELECT w1, COUNT(*) AS m1 FROM bg GROUP BY 1),
        |m2 AS (SELECT w2, COUNT(*) AS m2 FROM bg GROUP BY 1)
        |SELECT bigram, n2,
        |  round(ln(CAST(n2 AS DOUBLE) * CAST(n AS DOUBLE)
        |    / (CAST(m1 AS DOUBLE) * CAST(m2 AS DOUBLE))), 6) AS pmi
        |FROM n2 JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot
        |WHERE n2 >= 5
        |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin,

    // BM25 twin: same derived query set (first-3-distinct tokens of
    // every 100th doc, document order via MIN(position)), same Lucene
    // idf and saturation arithmetic in the same operation tree (ln
    // probed bit-identical), value-sorted per-(query, doc) sum fold,
    // 6-dp DECIMAL edge.
    "q_bm25" ->
      s"""WITH $bm25CtesSql
         |SELECT query_id, doc_id, rnk, score FROM bmr
         |WHERE rnk <= 5""".stripMargin,

    // RAKE twin: same islands-and-gaps runs (1-based t[i] - rn is a
    // shifted constant per run), ordered list agg, same fixed-point
    // word scores and integer phrase sums.
    "q_rake" ->
      """WITH toks AS (
        |  SELECT doc_id, t[i] AS token, i AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t,
        |          unnest(range(1, len(string_split(text, ' ')) + 1))
        |            AS i
        |        FROM documents)
        |  WHERE t[i] NOT IN ('the', 'a') AND t[i] <> ''),
        |runs AS (
        |  SELECT doc_id, pos, token,
        |    pos - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS grp
        |  FROM toks),
        |phrases AS MATERIALIZED (
        |  SELECT doc_id, grp, list(token ORDER BY pos) AS words,
        |    array_to_string(list(token ORDER BY pos), ' ') AS phrase
        |  FROM runs GROUP BY 1, 2),
        |wstats AS (
        |  SELECT word, COUNT(*) AS freq,
        |    CAST(SUM(plen) AS BIGINT) AS deg,
        |    CAST(round(1e6 * CAST(SUM(plen) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS wfp
        |  FROM (SELECT unnest(words) AS word, len(words) AS plen
        |        FROM phrases)
        |  GROUP BY 1),
        |inst AS (
        |  SELECT doc_id, grp, phrase,
        |    CAST(SUM(wfp) AS BIGINT) AS sfp, COUNT(*) AS n_words
        |  FROM (SELECT doc_id, grp, phrase, unnest(words) AS word
        |        FROM phrases) p
        |  JOIN wstats USING (word)
        |  GROUP BY 1, 2, 3)
        |SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
        |  COUNT(*) AS n_occurrences,
        |  round(CAST(MAX(sfp) AS DOUBLE) / 1e6, 6) AS score
        |FROM inst GROUP BY 1
        |ORDER BY MAX(sfp) DESC, phrase LIMIT 15""".stripMargin,

    // Distinctive-phrases twin: the q_rake candidate-run CTEs, then
    // the Monroe log-odds with the α0 = 100 pooled informative prior
    // — same per-row double tree, same rounded-DECIMAL |z| boundary.
    "q_distinctive_phrases" ->
      """WITH toks AS (
        |  SELECT doc_id, t[i] AS token, i AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t,
        |          unnest(range(1, len(string_split(text, ' ')) + 1))
        |            AS i
        |        FROM documents)
        |  WHERE t[i] NOT IN ('the', 'a') AND t[i] <> ''),
        |runs AS (
        |  SELECT doc_id, pos, token,
        |    pos - row_number() OVER (PARTITION BY doc_id
        |      ORDER BY pos) AS grp
        |  FROM toks),
        |phrases AS MATERIALIZED (
        |  SELECT doc_id, grp,
        |    array_to_string(list(token ORDER BY pos), ' ') AS phrase
        |  FROM runs GROUP BY 1, 2),
        |cnt AS (
        |  SELECT phrase,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ya,
        |    CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
        |      AS BIGINT) AS yb
        |  FROM phrases JOIN documents USING (doc_id)
        |  GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(ya) AS BIGINT) AS na,
        |    CAST(SUM(yb) AS BIGINT) AS nb
        |  FROM cnt),
        |pri AS (
        |  SELECT phrase, ya, yb, na, nb,
        |    100.0 * CAST(ya + yb AS DOUBLE)
        |      / CAST(na + nb AS DOUBLE) AS aw
        |  FROM cnt CROSS JOIN tot),
        |dl AS (
        |  SELECT phrase, ya, yb, aw,
        |    ln((CAST(ya AS DOUBLE) + aw)
        |        / (CAST(na AS DOUBLE) + 100.0
        |          - CAST(ya AS DOUBLE) - aw))
        |      - ln((CAST(yb AS DOUBLE) + aw)
        |        / (CAST(nb AS DOUBLE) + 100.0
        |          - CAST(yb AS DOUBLE) - aw)) AS delta
        |  FROM pri),
        |zz AS (
        |  SELECT phrase, ya, yb, delta,
        |    delta / sqrt(1.0 / (CAST(ya AS DOUBLE) + aw)
        |      + 1.0 / (CAST(yb AS DOUBLE) + aw)) AS z
        |  FROM dl)
        |SELECT phrase, ya AS n_en, yb AS n_other,
        |  round(delta, 6) AS log_odds, round(z, 6) AS z_score
        |FROM zz
        |ORDER BY CAST(round(abs(z), 6) AS DECIMAL(18,6)) DESC, phrase
        |LIMIT 20""".stripMargin,

    // QL-Dirichlet twin: the shared BM25 CTE prefix (toks/st/q/tok/
    // mt/tf), corpus frequency in place of df, same log decomposition
    // and sorted fold, same rounded-DECIMAL rank boundary.
    "q_ql_dirichlet" ->
      s"""WITH $bm25CtesSql,
         |cfq AS (
         |  SELECT token, CAST(SUM(tf) AS BIGINT) AS cf
         |  FROM tf GROUP BY 1),
         |nq AS (SELECT query_id, COUNT(*) AS nq FROM q GROUP BY 1),
         |qts AS (
         |  SELECT q.query_id, tf.doc_id, tf.dl,
         |    ln(1.0 + (CAST(tf AS DOUBLE) * CAST(total_dl AS DOUBLE))
         |      / (300.0 * CAST(cf AS DOUBLE))) AS ts
         |  FROM tf JOIN cfq USING (token) JOIN q USING (token)
         |  CROSS JOIN st),
         |qsc AS (
         |  SELECT query_id, doc_id,
         |    CAST(round(list_reduce(list_sort(list(ts)),
         |        (x, y) -> x + y)
         |      + CAST(nq AS DOUBLE)
         |        * ln(300.0 / (CAST(MAX(dl) AS DOUBLE) + 300.0)), 6)
         |      AS DECIMAL(18,6)) AS score
         |  FROM qts JOIN nq USING (query_id)
         |  GROUP BY query_id, doc_id, nq),
         |qr AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id) AS INT) AS rnk FROM qsc)
         |SELECT query_id, doc_id, rnk, score FROM qr
         |WHERE rnk <= 5""".stripMargin,

    // RM3 expansion twin: the shared BM25 chain's top-5 feedback
    // docs joined back onto the token stream, query terms excluded,
    // (fb_tf desc, token) rank.
    "q_query_expansion" ->
      s"""WITH $bm25CtesSql,
         |fb AS (SELECT query_id, doc_id FROM bmr WHERE rnk <= 5),
         |fcnt AS (
         |  SELECT fb.query_id, tok.token, COUNT(*) AS fb_tf
         |  FROM tok JOIN fb ON tok.doc_id = fb.doc_id
         |  GROUP BY 1, 2),
         |fx AS (
         |  SELECT f.query_id, f.token, fb_tf FROM fcnt f
         |  WHERE NOT EXISTS (SELECT 1 FROM q
         |    WHERE q.query_id = f.query_id AND q.token = f.token)),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY fb_tf DESC, token) AS INT) AS rnk
         |  FROM fx)
         |SELECT query_id, token, fb_tf, rnk FROM r
         |WHERE rnk <= 5""".stripMargin,

    // RM3 rescore twin: pass-1 scores (sc), the expansion-term CTEs,
    // a second identically-shaped scoring chain over them, and the
    // (1.0 - 0.6) engine-side blend with the exact rank boundary.
    "q_rm3_rescore" -> (s"""WITH $bm25CtesSql""" +
      """,
        |fb AS (SELECT query_id, doc_id FROM bmr WHERE rnk <= 5),
        |fcnt AS (
        |  SELECT fb.query_id, tok.token, COUNT(*) AS fb_tf
        |  FROM tok JOIN fb ON tok.doc_id = fb.doc_id
        |  GROUP BY 1, 2),
        |fx AS (
        |  SELECT f.query_id, f.token, fb_tf FROM fcnt f
        |  WHERE NOT EXISTS (SELECT 1 FROM q
        |    WHERE q.query_id = f.query_id AND q.token = f.token)),
        |exp2 AS (
        |  SELECT query_id, token FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY fb_tf DESC, token) AS rn FROM fx)
        |  WHERE rn <= 5),
        |mt2 AS (
        |  SELECT doc_id, token, dl FROM tok
        |  WHERE token IN (SELECT DISTINCT token FROM exp2)),
        |tf2 AS (
        |  SELECT doc_id, token, COUNT(*) AS tf, MAX(dl) AS dl
        |  FROM mt2 GROUP BY 1, 2),
        |df2 AS (SELECT token, COUNT(*) AS df FROM tf2 GROUP BY 1),
        |ts2 AS (
        |  SELECT e.query_id, tf2.doc_id,
        |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        |      * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl
        |          / (CAST(total_dl AS DOUBLE) / n_docs))) AS ts
        |  FROM tf2 JOIN df2 USING (token) JOIN exp2 e USING (token)
        |  CROSS JOIN st),
        |sc2 AS (
        |  SELECT query_id, doc_id,
        |    CAST(round(list_reduce(list_sort(list(ts)),
        |      (x, y) -> x + y), 6) AS DECIMAL(18,6)) AS score
        |  FROM ts2 GROUP BY 1, 2),
        |bl AS (
        |  SELECT COALESCE(sc.query_id, sc2.query_id) AS query_id,
        |    COALESCE(sc.doc_id, sc2.doc_id) AS doc_id,
        |    round(0.6 * COALESCE(CAST(sc.score AS DOUBLE), 0.0)
        |      + (1.0 - 0.6)
        |        * COALESCE(CAST(sc2.score AS DOUBLE), 0.0), 6)
        |      AS rm3_score
        |  FROM sc FULL OUTER JOIN sc2
        |    ON sc.query_id = sc2.query_id AND sc.doc_id = sc2.doc_id),
        |r AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |    ORDER BY rm3_score DESC, doc_id) AS INT) AS rnk
        |  FROM bl)
        |SELECT query_id, doc_id, rnk, rm3_score FROM r
        |WHERE rnk <= 5""".stripMargin),

    // SQL-text BM25 variant: the identical operation tree from the
    // view, so the same twin gates it.
    "q_sql_bm25" ->
      s"""WITH $bm25CtesSql
         |SELECT query_id, doc_id, rnk, score FROM bmr
         |WHERE rnk <= 5""".stripMargin,

    // Hybrid RRF twin: the shared BM25 chain + the hashed-vector dense
    // chain (q_knn_text's vectorizer, query set %100), both cut to
    // top-10, fused by 1/(60+rank) in fixed (lexical, dense) term
    // order, re-ranked.
    "q_hybrid_rrf" ->
      s"""WITH $bm25CtesSql,
         |hv AS (
         |  SELECT doc_id,
         |    ('0x' || substr(md5(tok || ':fh'), 1, 15))::BIGINT % 32 AS i,
         |    CASE WHEN ('0x' || substr(md5(tok || ':fs'), 1, 15))::BIGINT
         |        % 2 = 1 THEN 1 ELSE -1 END AS s
         |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
         |hsums AS (SELECT doc_id, i, SUM(s) AS v FROM hv GROUP BY 1, 2),
         |hdense AS (
         |  SELECT d.doc_id, r.j
         |  FROM (SELECT DISTINCT doc_id FROM documents) d
         |  CROSS JOIN range(32) r(j)),
         |hvecs AS (
         |  SELECT hdense.doc_id,
         |    list(CAST(COALESCE(hsums.v, 0) AS DOUBLE) ORDER BY hdense.j)
         |      AS e
         |  FROM hdense LEFT JOIN hsums
         |    ON hdense.doc_id = hsums.doc_id AND hdense.j = hsums.i
         |  GROUP BY 1),
         |hq AS (SELECT doc_id AS query_id, e FROM hvecs
         |       WHERE doc_id % 100 = 0 AND doc_id < 1000000
         |         AND list_inner_product(e, e) > 0),
         |hc AS (SELECT doc_id AS neighbor_id, e FROM hvecs
         |       WHERE list_inner_product(e, e) > 0),
         |hs AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(round(list_inner_product(hq.e, hc.e)
         |      / (sqrt(list_inner_product(hq.e, hq.e))
         |         * sqrt(list_inner_product(hc.e, hc.e))), 6)
         |      AS DECIMAL(10,6)) AS score
         |  FROM hq CROSS JOIN hc),
         |hr AS (
         |  SELECT *, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, neighbor_id)
         |      AS rnk
         |  FROM hs),
         |fz AS (
         |  SELECT COALESCE(b.query_id, h.query_id) AS query_id,
         |    COALESCE(b.doc_id, h.neighbor_id) AS doc_id,
         |    round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.rnk), 0)
         |      + COALESCE(CAST(1.0 AS DOUBLE) / (60 + h.rnk), 0), 6)
         |      AS rrf
         |  FROM (SELECT query_id, doc_id, rnk FROM bmr WHERE rnk <= 10) b
         |  FULL JOIN (SELECT query_id, neighbor_id, rnk FROM hr
         |             WHERE rnk <= 10) h
         |    ON b.query_id = h.query_id AND b.doc_id = h.neighbor_id),
         |fr AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS INT)
         |      AS rnk
         |  FROM fz)
         |SELECT query_id, doc_id, rnk, rrf FROM fr
         |WHERE rnk <= 5""".stripMargin,

    // Rep-selection twin: the recursive component closure (clustersSql
    // shape) + distinct-token scores, best-(score, doc_id) window per
    // component; singletons are their own canonical.
    "q_cluster_rep" ->
      s"""WITH RECURSIVE $pairsCteSql,
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION SELECT doc_b, doc_a FROM pairs),
         |reach(a, b) AS (
         |  SELECT a, b FROM edges
         |  UNION
         |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
         |comp AS (
         |  SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
         |  FROM reach GROUP BY a),
         |scq AS (
         |  SELECT doc_id,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS INT)
         |      AS score
         |  FROM corpus),
         |lab AS (
         |  SELECT scq.doc_id, COALESCE(comp.canonical_id, scq.doc_id)
         |      AS canonical_id, score
         |  FROM scq LEFT JOIN comp USING (doc_id))
         |SELECT doc_id, canonical_id, score,
         |  (row_number() OVER (PARTITION BY canonical_id
         |    ORDER BY score DESC, doc_id)) = 1 AS is_rep
         |FROM lab""".stripMargin,

    // DSIR twin: same md5-bucketed bigrams (the fingerprint64 idiom),
    // same add-one smoothed log-ratio in the same four-ln operation
    // tree, value-sorted per-doc sum fold, 6-dp round.
    "q_dsir_weights" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(t[i] || ' ' || t[i + 1]), 1, 15))::BIGINT
        |      % 1024 AS bucket
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |cnt AS (
        |  SELECT bucket,
        |    SUM(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END) AS ct,
        |    SUM(CASE WHEN doc_id % 50 = 0 THEN 0 ELSE 1 END) AS cr
        |  FROM bg GROUP BY 1),
        |tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS rt FROM cnt),
        |lam AS (
        |  SELECT bucket,
        |    (ln(ct + 1.0) - ln(CAST(tt + 1024 AS DOUBLE)))
        |      - (ln(cr + 1.0) - ln(CAST(rt + 1024 AS DOUBLE))) AS lam
        |  FROM cnt CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_features,
        |  round(list_reduce(list_sort(list(lam)), (x, y) -> x + y), 6)
        |    AS weight
        |FROM bg JOIN lam USING (bucket)
        |GROUP BY 1""".stripMargin,

    // Entity-resolution twin: same deterministic interior char-drop,
    // same two-key blocking union, same Levenshtein (identical DP in
    // both engines) and (lev, key) best-match window.
    "q_entity_match" ->
      """WITH cat AS (
        |  SELECT p_partkey AS matched_key, p_name AS matched_name,
        |    substr(lower(p_name), 1, 3) AS ck1,
        |    right(lower(p_name), 3) AS ck2
        |  FROM part),
        |d0 AS (
        |  SELECT p_partkey AS dirty_id, p_name,
        |    (p_partkey % (length(p_name) - 2)) + 2 AS pos
        |  FROM part WHERE p_partkey % 7 = 0),
        |d AS (
        |  SELECT dirty_id,
        |    concat(substr(p_name, 1, CAST(pos - 1 AS INT)),
        |      substr(p_name, CAST(pos + 1 AS INT))) AS dirty_name
        |  FROM d0),
        |dk AS (
        |  SELECT dirty_id, dirty_name,
        |    substr(lower(dirty_name), 1, 3) AS dk1,
        |    right(lower(dirty_name), 3) AS dk2
        |  FROM d),
        |cand AS (
        |  SELECT DISTINCT dirty_id, dirty_name, matched_key, matched_name
        |  FROM (
        |    SELECT dk.dirty_id, dk.dirty_name, cat.matched_key,
        |      cat.matched_name
        |    FROM dk JOIN cat ON dk.dk1 = cat.ck1
        |      AND abs(length(dk.dirty_name) - length(cat.matched_name)) <= 2
        |    UNION ALL
        |    SELECT dk.dirty_id, dk.dirty_name, cat.matched_key,
        |      cat.matched_name
        |    FROM dk JOIN cat ON dk.dk2 = cat.ck2
        |      AND abs(length(dk.dirty_name) - length(cat.matched_name)) <= 2)),
        |v AS (
        |  SELECT *, CAST(levenshtein(dirty_name, matched_name) AS INT)
        |    AS lev
        |  FROM cand WHERE levenshtein(dirty_name, matched_name) <= 2),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY dirty_id
        |    ORDER BY lev, matched_key) AS rn FROM v)
        |SELECT dirty_id, dirty_name, matched_key, matched_name, lev
        |FROM r WHERE rn = 1""".stripMargin,

    // F-S weights twin: same blocked planted-truth candidates, same
    // add-half m/u, same four lns on the 4-row frame.
    "q_fs_weights" -> (FsCandidatesSql +
      """,
        |unp AS (
        |  SELECT is_match, 'first3' AS field, a_first3 AS agree
        |  FROM cand
        |  UNION ALL SELECT is_match, 'last3', a_last3 FROM cand
        |  UNION ALL SELECT is_match, 'len', a_len FROM cand
        |  UNION ALL SELECT is_match, 'lev1', a_lev1 FROM cand),
        |st AS (
        |  SELECT field,
        |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_match,
        |    CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_nonmatch,
        |    CAST(SUM(CASE WHEN is_match THEN agree ELSE 0 END)
        |      AS BIGINT) AS am,
        |    CAST(SUM(CASE WHEN is_match THEN 0 ELSE agree END)
        |      AS BIGINT) AS au
        |  FROM unp GROUP BY 1),
        |mu AS (
        |  SELECT field, n_match, n_nonmatch,
        |    (CAST(am AS DOUBLE) + 0.5)
        |      / (CAST(n_match AS DOUBLE) + 1.0) AS m,
        |    (CAST(au AS DOUBLE) + 0.5)
        |      / (CAST(n_nonmatch AS DOUBLE) + 1.0) AS u
        |  FROM st)
        |SELECT field, n_match, n_nonmatch,
        |  round(m, 6) AS m, round(u, 6) AS u,
        |  round(ln(m / u), 6) AS w_agree,
        |  round(ln((1.0 - m) / (1.0 - u)), 6) AS w_disagree
        |FROM mu""".stripMargin),

    // F-S scores twin: weights re-derived from the ROUND-6 m/u (the
    // weights query's published precision), 1e6 fixed-point longs,
    // the same 8-term integer sum and exact top-20 boundary.
    "q_fs_scores" -> (FsCandidatesSql +
      """,
        |unp AS (
        |  SELECT is_match, 'first3' AS field, a_first3 AS agree
        |  FROM cand
        |  UNION ALL SELECT is_match, 'last3', a_last3 FROM cand
        |  UNION ALL SELECT is_match, 'len', a_len FROM cand
        |  UNION ALL SELECT is_match, 'lev1', a_lev1 FROM cand),
        |st AS (
        |  SELECT field,
        |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_match,
        |    CAST(SUM(CASE WHEN is_match THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_nonmatch,
        |    CAST(SUM(CASE WHEN is_match THEN agree ELSE 0 END)
        |      AS BIGINT) AS am,
        |    CAST(SUM(CASE WHEN is_match THEN 0 ELSE agree END)
        |      AS BIGINT) AS au
        |  FROM unp GROUP BY 1),
        |mu AS (
        |  SELECT field,
        |    round((CAST(am AS DOUBLE) + 0.5)
        |      / (CAST(n_match AS DOUBLE) + 1.0), 6) AS m,
        |    round((CAST(au AS DOUBLE) + 0.5)
        |      / (CAST(n_nonmatch AS DOUBLE) + 1.0), 6) AS u
        |  FROM st),
        |wts AS (
        |  SELECT field,
        |    CAST(round(ln(m / u) * 1000000.0) AS BIGINT) AS wa,
        |    CAST(round(ln((1.0 - m) / (1.0 - u)) * 1000000.0)
        |      AS BIGINT) AS wd
        |  FROM mu),
        |sc AS (
        |  SELECT dirty_id, matched_key, is_match,
        |    a_first3 * (SELECT wa FROM wts WHERE field = 'first3')
        |    + (1 - a_first3)
        |      * (SELECT wd FROM wts WHERE field = 'first3')
        |    + a_last3 * (SELECT wa FROM wts WHERE field = 'last3')
        |    + (1 - a_last3)
        |      * (SELECT wd FROM wts WHERE field = 'last3')
        |    + a_len * (SELECT wa FROM wts WHERE field = 'len')
        |    + (1 - a_len) * (SELECT wd FROM wts WHERE field = 'len')
        |    + a_lev1 * (SELECT wa FROM wts WHERE field = 'lev1')
        |    + (1 - a_lev1)
        |      * (SELECT wd FROM wts WHERE field = 'lev1') AS score_fp
        |  FROM cand),
        |top AS (
        |  SELECT * FROM sc
        |  ORDER BY score_fp DESC, dirty_id, matched_key LIMIT 20)
        |SELECT dirty_id, matched_key, is_match,
        |  round(CAST(score_fp AS DOUBLE) / 1000000.0, 6) AS fs_score
        |FROM top""".stripMargin),

    // SNM twin: same dirty feed, same block-local (lower(nm), kind,
    // rid) rank order; the sliding window as a range join (method
    // difference — the Spark side is the rank+j equi-join), same
    // Levenshtein verify and (lev, key) best.
    "q_sorted_neighborhood" ->
      """WITH cat AS (
        |  SELECT 'c' AS kind, MIN(p_partkey) AS rid, p_name AS nm
        |  FROM part GROUP BY p_name),
        |d0 AS (
        |  SELECT p_partkey AS dirty_id, p_name,
        |    (p_partkey % (length(p_name) - 2)) + 2 AS pos
        |  FROM part WHERE p_partkey % 7 = 0),
        |dd AS (
        |  SELECT 'd' AS kind, dirty_id AS rid,
        |    concat(substr(p_name, 1, CAST(pos - 1 AS INT)),
        |      substr(p_name, CAST(pos + 1 AS INT))) AS nm
        |  FROM d0),
        |allr AS (
        |  SELECT *, substr(lower(nm), 1, 1) AS blk FROM (
        |    SELECT * FROM cat UNION ALL SELECT * FROM dd)),
        |rn AS MATERIALIZED (
        |  SELECT *, row_number() OVER (PARTITION BY blk
        |    ORDER BY lower(nm), kind, rid) AS rn
        |  FROM allr),
        |cands AS (
        |  SELECT a.kind, a.rid, a.nm, b.kind AS kind2, b.rid AS rid2,
        |    b.nm AS nm2
        |  FROM rn a JOIN rn b ON a.blk = b.blk
        |    AND b.rn - a.rn BETWEEN 1 AND 3 AND a.kind <> b.kind),
        |pairs AS (
        |  SELECT
        |    CASE WHEN kind = 'd' THEN rid ELSE rid2 END AS dirty_id,
        |    CASE WHEN kind = 'd' THEN nm ELSE nm2 END AS dirty_name,
        |    CASE WHEN kind = 'd' THEN rid2 ELSE rid END AS matched_key,
        |    CASE WHEN kind = 'd' THEN nm2 ELSE nm END AS matched_name
        |  FROM cands),
        |v AS (
        |  SELECT *, CAST(levenshtein(dirty_name, matched_name) AS INT)
        |    AS lev
        |  FROM pairs WHERE levenshtein(dirty_name, matched_name) <= 2),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY dirty_id
        |    ORDER BY lev, matched_key) AS brn FROM v)
        |SELECT dirty_id, dirty_name, matched_key, matched_name, lev
        |FROM best WHERE brn = 1""".stripMargin,

    // Rendezvous twin: per-(doc, shard) salted md5 weights, winner by
    // (w DESC, s DESC) — array_max's lexicographic struct tie-break.
    "q_shard_assign" ->
      """SELECT doc_id, CAST(shard AS INT) AS shard FROM (
        |  SELECT doc_id, s AS shard,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY w DESC, s DESC) AS rn
        |  FROM (
        |    SELECT doc_id, r.s,
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || r.s),
        |        1, 15))::BIGINT AS w
        |    FROM documents CROSS JOIN range(16) r(s)))
        |WHERE rn = 1""".stripMargin,

    // Theta-intersection twin: union-sketch threshold (64th smallest
    // distinct union hash), common hashes <= theta, the n·2^60/theta
    // estimator, exact distinct intersection alongside.
    "q_kmv_intersect" ->
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15))::BIGINT AS h
        |  FROM events WHERE event_type = 'click'),
        |hb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15))::BIGINT AS h
        |  FROM events WHERE event_type = 'purchase'),
        |th AS (
        |  SELECT MAX(h) AS theta FROM (
        |    SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
        |    ORDER BY h LIMIT 64)),
        |cm AS (
        |  SELECT theta, COUNT(*) AS n_common
        |  FROM ha JOIN hb USING (h) CROSS JOIN th
        |  WHERE h <= theta GROUP BY theta),
        |ex AS (
        |  SELECT COUNT(*) AS exact_n
        |  FROM (SELECT DISTINCT user_id FROM events
        |        WHERE event_type = 'click') a
        |  JOIN (SELECT DISTINCT user_id FROM events
        |        WHERE event_type = 'purchase') b USING (user_id))
        |SELECT theta, n_common,
        |  round(CAST(n_common AS DOUBLE) * 1152921504606846976.0
        |    / CAST(theta AS DOUBLE), 6) AS est_intersection,
        |  exact_n
        |FROM cm CROSS JOIN ex""".stripMargin,

    // Theta-difference twin: same threshold chain with an ANTI join
    // (NOT IN) for A-only hashes and the n·2^60/theta estimator.
    "q_kmv_diff" ->
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15))::BIGINT AS h
        |  FROM events WHERE event_type = 'click'),
        |hb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
        |    1, 15))::BIGINT AS h
        |  FROM events WHERE event_type = 'purchase' AND value > 99),
        |th AS (
        |  SELECT MAX(h) AS theta FROM (
        |    SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb)
        |    ORDER BY h LIMIT 64)),
        |cm AS (
        |  SELECT theta, COUNT(*) AS n_only
        |  FROM ha CROSS JOIN th
        |  WHERE h <= theta AND h NOT IN (SELECT h FROM hb)
        |  GROUP BY theta),
        |ex AS (
        |  SELECT COUNT(*) AS exact_n FROM (
        |    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |    AND user_id NOT IN (
        |      SELECT DISTINCT user_id FROM events
        |      WHERE event_type = 'purchase' AND value > 99)))
        |SELECT theta, n_only,
        |  round(CAST(n_only AS DOUBLE) * 1152921504606846976.0
        |    / CAST(theta AS DOUBLE), 6) AS est_difference,
        |  exact_n
        |FROM cm CROSS JOIN ex""".stripMargin,

    // Robust-outlier twin: per-source quantile_disc median and MAD —
    // all-integer statistics, exact compare, no float tolerance.
    "q_outlier_docs" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |  FROM documents),
        |med AS (
        |  SELECT source, quantile_disc(n_tokens, 0.5) AS med
        |  FROM t GROUP BY 1),
        |dev AS (
        |  SELECT t.doc_id, t.source, t.n_tokens, med.med,
        |    abs(t.n_tokens - med.med) AS adev
        |  FROM t JOIN med USING (source)),
        |mad AS (
        |  SELECT source, quantile_disc(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT doc_id, dev.source, n_tokens, med, mad,
        |  adev > 5 * mad AS is_outlier
        |FROM dev JOIN mad USING (source)""".stripMargin,

    // Hashing-trick twin: same md5-salted bucket/sign per token
    // occurrence, grouped signed sums densified over all 32 positions.
    "q_hash_vectorize" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT doc_id, unnest(t) AS tok FROM toks),
        |hs AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5(tok || ':fh'), 1, 15))::BIGINT % 32 AS i,
        |    CASE WHEN ('0x' || substr(md5(tok || ':fs'), 1, 15))::BIGINT
        |        % 2 = 1 THEN 1 ELSE -1 END AS s
        |  FROM tok),
        |sums AS (
        |  SELECT doc_id, i, CAST(SUM(s) AS BIGINT) AS v
        |  FROM hs GROUP BY 1, 2),
        |dense AS (
        |  SELECT d.doc_id, r.j
        |  FROM (SELECT DISTINCT doc_id FROM documents) d
        |  CROSS JOIN range(32) r(j))
        |SELECT dense.doc_id, CAST(dense.j AS INT) AS j,
        |  COALESCE(sums.v, 0) AS v
        |FROM dense LEFT JOIN sums
        |  ON dense.doc_id = sums.doc_id AND dense.j = sums.i""".stripMargin,

    // CDC twin: same %3/%5 snapshot carve, same ' rev2' revision, same
    // 60-bit md5 fingerprint compare, FULL JOIN classify.
    "q_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS p_fp
        |  FROM documents WHERE doc_id % 3 <> 0),
        |curr AS (
        |  SELECT doc_id, ('0x' || substr(md5(CASE WHEN doc_id % 7 = 0
        |      THEN text || ' rev2' ELSE text END), 1, 15))::BIGINT AS c_fp
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(prev.doc_id, curr.doc_id) AS doc_id,
        |  CASE WHEN prev.doc_id IS NULL THEN 'added'
        |       WHEN curr.doc_id IS NULL THEN 'removed'
        |       WHEN p_fp <> c_fp THEN 'changed' END AS change
        |FROM prev FULL JOIN curr ON prev.doc_id = curr.doc_id
        |WHERE prev.doc_id IS NULL OR curr.doc_id IS NULL
        |   OR p_fp <> c_fp""".stripMargin,

    // Bin-pack twin: same (source, lang) pseudo-file stats, same
    // exclusive running sum, floor-divide by the 50k target.
    "q_compaction_bins" ->
      """WITH f AS (
        |  SELECT source, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS bytes
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, lang, n_docs, bytes,
        |  CAST(floor(COALESCE(SUM(bytes) OVER (
        |    PARTITION BY source ORDER BY lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      / 50000) AS INT) AS bin
        |FROM f""".stripMargin,

    // Dataset-card twin: fingerprint window marks global exact-dups,
    // one GROUP BY source closes every metric.
    "q_corpus_profile" ->
      """WITH d AS (
        |  SELECT source, lang,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
        |    ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp
        |  FROM documents),
        |f AS (SELECT *, COUNT(*) OVER (PARTITION BY fp) AS fpn FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(CASE WHEN fpn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs
        |FROM f GROUP BY 1""".stripMargin,

    // Same md5 content fingerprints, same batch construction, LEFT
    // JOIN against the snapshot's distinct fingerprint set.
    "q_dedup_incremental" ->
      """WITH prev AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM prev WHERE doc_id % 20 = 0),
        |seen AS (SELECT DISTINCT md5(text) AS fp FROM prev)
        |SELECT b.doc_id, (seen.fp IS NOT NULL) AS dup_of_prev
        |FROM batch b LEFT JOIN seen ON md5(b.text) = seen.fp""".stripMargin,

    // Trained-profile twin: same counts, same (n DESC, token) rank cut,
    // same profile-hit scores, same (score DESC, lang) argmax.
    "q_langid_trained" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        |prof AS (
        |  SELECT lang AS cand, token FROM (
        |    SELECT lang, token, row_number() OVER (
        |      PARTITION BY lang ORDER BY n DESC, token) AS rk
        |    FROM cnt) WHERE rk <= 20),
        |sc AS (
        |  SELECT t.doc_id, p.cand, COUNT(*) AS score
        |  FROM tok t JOIN prof p ON t.token = p.token GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, cand AS predicted,
        |    row_number() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        |  FROM sc),
        |mx AS (SELECT doc_id, MAX(score) AS best_score FROM sc GROUP BY 1)
        |SELECT b.doc_id, b.predicted, mx.best_score
        |FROM best b JOIN mx ON b.doc_id = mx.doc_id
        |WHERE b.rn = 1""".stripMargin,

    // Kappa twin: the trained-profile chain feeding one confusion
    // aggregate; p₀/pₑ/κ written with the Spark expressions'
    // parenthesization.
    "q_kappa" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (
        |  SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
        |prof AS (
        |  SELECT lang AS cand, token FROM (
        |    SELECT lang, token, row_number() OVER (
        |      PARTITION BY lang ORDER BY n DESC, token) AS rk
        |    FROM cnt) WHERE rk <= 20),
        |sc AS (
        |  SELECT t.doc_id, p.cand, COUNT(*) AS score
        |  FROM tok t JOIN prof p ON t.token = p.token GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, cand AS predicted,
        |    row_number() OVER (
        |      PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
        |  FROM sc),
        |j AS (
        |  SELECT b.predicted AS la, d.lang AS lb
        |  FROM best b JOIN documents d ON b.doc_id = d.doc_id
        |  WHERE b.rn = 1),
        |conf AS (SELECT la, lb, COUNT(*) AS n FROM j GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(CASE WHEN la = lb THEN n ELSE 0 END) AS BIGINT)
        |      AS agree
        |  FROM conf),
        |ma AS (SELECT la, SUM(n) AS na FROM conf GROUP BY 1),
        |mb AS (SELECT lb, SUM(n) AS nb FROM conf GROUP BY 1),
        |pe AS (
        |  SELECT CAST(SUM(na * nb) AS BIGINT) AS pe_num
        |  FROM ma JOIN mb ON ma.la = mb.lb)
        |SELECT nn AS n, agree,
        |  round(CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS po,
        |  round(CAST(pe_num AS DOUBLE)
        |    / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS pe,
        |  round((CAST(agree AS DOUBLE) / CAST(nn AS DOUBLE)
        |      - CAST(pe_num AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE)))
        |    / (1.0 - CAST(pe_num AS DOUBLE)
        |        / (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE))), 6)
        |    AS kappa
        |FROM tot CROSS JOIN pe""".stripMargin,

    // Token-budget twin: ONE global take-while cumulative sum in
    // (bucket, hash, id) order — provably the same kept set as the
    // Spark side's two-level prefix sum.
    "q_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      AS h
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY h % 1024, h, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS before
        |  FROM d)
        |SELECT doc_id, n_tokens FROM o
        |WHERE before + n_tokens <= 25000""".stripMargin,

    // Contrastive twin: the chunk CTE self-joined on (doc, next
    // chunk), the same md5 shuffle key.
    "q_contrastive_pairs" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start
        |  FROM toks),
        |ch AS (
        |  SELECT doc_id, CAST(start // 24 AS INT) AS chunk_id,
        |    array_to_string(
        |      list_slice(t, start + 1, least(start + 32, len(t))), ' ')
        |      AS chunk_text
        |  FROM st)
        |SELECT a.doc_id, a.chunk_id, a.chunk_text AS anchor,
        |  p.chunk_text AS positive,
        |  ('0x' || substr(md5(CAST(a.doc_id AS VARCHAR) || '|'
        |    || CAST(a.chunk_id AS VARCHAR)), 1, 15))::BIGINT
        |    AS shuffle_key
        |FROM ch a JOIN ch p
        |  ON a.doc_id = p.doc_id AND p.chunk_id = a.chunk_id + 1""".stripMargin,

    // Chunking twin: same stride-range starts (DuckDB range excludes
    // len; Spark sequence stops at len−1 — identical start sets),
    // inclusive-end list_slice == Spark's length-bounded slice.
    "q_chunk_overlap" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |st AS (
        |  SELECT doc_id, t, unnest(range(0, len(t), 24)) AS start
        |  FROM toks)
        |SELECT doc_id, CAST(start // 24 AS INT) AS chunk_id,
        |  array_to_string(
        |    list_slice(t, start + 1, least(start + 32, len(t))), ' ')
        |    AS chunk_text,
        |  CAST(least(start + 32, len(t)) - start AS INT) AS n_tokens
        |FROM st""".stripMargin,

    // Span-corruption twin: DuckDB lambda indexes are 1-BASED → i − 1
    // mirrors Spark's 0-based transform index everywhere.
    "q_span_mask" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |SELECT doc_id,
        |  array_to_string(list_filter(list_transform(t, (tok, i) ->
        |    CASE WHEN (i - 1) % 15 = 0
        |        THEN '<extra_id_' || CAST((i - 1) // 15 AS INT) || '>'
        |      WHEN (i - 1) % 15 < 3 THEN NULL
        |      ELSE tok END), x -> x IS NOT NULL), ' ') AS masked_text,
        |  array_to_string(list_filter(list_transform(t, (tok, i) ->
        |    CASE WHEN (i - 1) % 15 = 0
        |        THEN '<extra_id_' || CAST((i - 1) // 15 AS INT) || '>'
        |          || ' ' || tok
        |      WHEN (i - 1) % 15 < 3 THEN tok
        |      ELSE NULL END), x -> x IS NOT NULL), ' ') AS target_text,
        |  CAST(len(list_filter(list_transform(t, (tok, i) ->
        |    CASE WHEN (i - 1) % 15 < 3 THEN 1 END), x -> x IS NOT NULL))
        |    AS INT) AS n_masked
        |FROM toks""".stripMargin,

    // Apportionment twin: same all-integer base/remainder split and
    // the same (rem DESC, source) leftover ranking.
    // UniMax twin: same ascending (cap, source) ranking, same integer
    // crossing test with the caps prefix, same uniform split.
    "q_unimax" ->
      """WITH counts AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
        |      AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n_corpus
        |  FROM counts),
        |ranked AS (
        |  SELECT source, n_tokens, n_corpus // 2 AS b,
        |    n_tokens * 4 AS cap,
        |    row_number() OVER (ORDER BY n_tokens * 4 ASC, source ASC)
        |      AS i,
        |    COALESCE(CAST(SUM(n_tokens * 4) OVER (
        |      ORDER BY n_tokens * 4 ASC, source ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS prefix,
        |    COUNT(*) OVER () AS s_total
        |  FROM counts CROSS JOIN tot),
        |flagged AS (
        |  SELECT *, cap * (s_total - i + 1) <= b - prefix AS capped
        |  FROM ranked),
        |agg AS (
        |  SELECT CAST(SUM(CASE WHEN capped THEN cap ELSE 0 END)
        |      AS BIGINT) AS capped_sum,
        |    CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_uncapped
        |  FROM flagged),
        |alloc AS (
        |  SELECT source, n_tokens, cap, capped,
        |    round(CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |      ELSE CAST(b - capped_sum AS DOUBLE)
        |        / CAST(n_uncapped AS DOUBLE) END, 6) AS alloc_tokens
        |  FROM flagged CROSS JOIN agg)
        |SELECT source, n_tokens, cap, capped, alloc_tokens,
        |  round(alloc_tokens / CAST(n_tokens AS DOUBLE), 6)
        |    AS epochs_used
        |FROM alloc""".stripMargin,

    "q_apportion" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
        |e AS (
        |  SELECT source, n_docs,
        |    (1000 * n_docs - (1000 * n_docs) % n_total) // n_total
        |      AS base,
        |    (1000 * n_docs) % n_total AS rem
        |  FROM c CROSS JOIN t),
        |l AS (
        |  SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover FROM e),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM e)
        |SELECT source, n_docs,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM r CROSS JOIN l""".stripMargin,

    // Temperature twin: √n_s weights, source-ordered normalizer fold,
    // then the q_corpus_mix plan/lottery arithmetic verbatim.
    "q_mix_temperature" ->
      """WITH c AS (
        |  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
        |w AS (SELECT source, sqrt(CAST(n_s AS DOUBLE)) AS w FROM c),
        |z AS (
        |  SELECT list_reduce(list(w ORDER BY source), (a, b) -> a + b)
        |    AS z
        |  FROM w),
        |t AS (SELECT source, w / z AS share FROM w CROSS JOIN z),
        |tot AS (SELECT SUM(n_s) AS n_total FROM c),
        |pl AS (
        |  SELECT c.source,
        |    least(1.0, t.share * CAST(n_total AS DOUBLE)
        |      / CAST(n_s AS DOUBLE)) AS p
        |  FROM c CROSS JOIN tot JOIN t ON c.source = t.source)
        |SELECT d.doc_id, d.source, pl.p,
        |  (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':mix'), 1, 15))
        |     ::BIGINT % 1000000)
        |    < CAST(floor(pl.p * 1000000.0) AS BIGINT) AS keep
        |FROM documents d JOIN pl ON d.source = pl.source""".stripMargin,

    // Zipf twin: same top-1000 cut (tf DESC, tok — total order), same
    // 1e-6 fixed-point ln snap summed as exact integers, the
    // identical closed-form double tree (same parenthesization).
    "q_zipf_fit" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (
        |  SELECT tok, COUNT(*) AS tf FROM tok GROUP BY 1
        |  ORDER BY tf DESC, tok LIMIT 1000),
        |rk AS (
        |  SELECT
        |    CAST(round(ln(CAST(row_number()
        |        OVER (ORDER BY tf DESC, tok) AS DOUBLE)) * 1e6)
        |      AS BIGINT) AS x,
        |    CAST(round(ln(CAST(tf AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM tf),
        |s AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM rk),
        |f AS (
        |  SELECT CAST(n AS BIGINT) AS n_fit,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM s)
        |SELECT n_fit,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END, 6)
        |    AS slope,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (syd - ((nd * sxyd - sxd * syd)
        |        / (nd * sxxd - sxd * sxd)) * sxd) / nd / 1e6 END, 6)
        |    AS intercept,
        |  round(CASE WHEN (nd * sxxd - sxd * sxd)
        |      * (nd * syyd - syd * syd) <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
        |    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        |  END, 6) AS r2
        |FROM f""".stripMargin,

    // Heaps twin: the q_bigram_pmi bigram construction, min-doc-id
    // first appearance, the same integer bucket DIV, densified grid,
    // cumulative window over the 10-row frame.
    "q_heaps_curve" ->
      """WITH bounds AS (
        |  SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS t
        |         FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |firsts AS (SELECT bg, MIN(doc_id) AS first_doc FROM bg
        |           GROUP BY 1),
        |fb AS (
        |  SELECT least(((first_doc - mn) * 10) // (mx - mn + 1), 9)
        |    AS bucket
        |  FROM firsts CROSS JOIN bounds),
        |nt AS (SELECT bucket, COUNT(*) AS new_types FROM fb GROUP BY 1),
        |occ0 AS (
        |  SELECT doc_id,
        |    greatest(len(string_split(text, ' ')) - 1, 0) AS n_bg
        |  FROM documents),
        |ob AS (
        |  SELECT least(((doc_id - mn) * 10) // (mx - mn + 1), 9)
        |    AS bucket, n_bg
        |  FROM occ0 CROSS JOIN bounds),
        |occ AS (SELECT bucket, COUNT(*) AS n_docs, SUM(n_bg) AS n_bigrams
        |        FROM ob GROUP BY 1),
        |grid AS (SELECT CAST(r AS BIGINT) AS bucket FROM range(10) g(r)),
        |j AS (
        |  SELECT grid.bucket,
        |    CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs,
        |    CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |    CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types
        |  FROM grid LEFT JOIN occ ON grid.bucket = occ.bucket
        |    LEFT JOIN nt ON grid.bucket = nt.bucket)
        |SELECT bucket, n_docs,
        |  CAST(SUM(n_bigrams) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_bigrams_cum,
        |  CAST(SUM(new_types) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum
        |FROM j""".stripMargin,

    // Missing-mass twin: same (source, token) type counts, same
    // frequency-of-frequency indicator rollup and the two divisions.
    "q_missing_mass" ->
      """WITH types AS (
        |  SELECT source, tok, COUNT(*) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS tok
        |    FROM documents)
        |  WHERE tok <> '' GROUP BY 1, 2),
        |ff AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |    COUNT(*) AS n_types,
        |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_singletons,
        |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_doubletons
        |  FROM types GROUP BY 1)
        |SELECT source, n_tokens, n_types, n_singletons, n_doubletons,
        |  round(CAST(n_singletons AS DOUBLE)
        |    / CAST(n_tokens AS DOUBLE), 6) AS missing_mass,
        |  round(CAST(n_types AS DOUBLE)
        |    + CAST(n_singletons AS DOUBLE)
        |      * CAST(n_singletons - 1 AS DOUBLE)
        |      / (2.0 * CAST(n_doubletons + 1 AS DOUBLE)), 6) AS chao1
        |FROM ff""".stripMargin,

    // Influence twin: same keyed sums, same three divisions.
    "q_source_influence" ->
      """WITH per AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |    CAST(SUM(n_chars) AS BIGINT) AS sx
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
        |    CAST(SUM(sx) AS BIGINT) AS s
        |  FROM per)
        |SELECT source, n_docs,
        |  round(CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS doc_share,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_all,
        |  round(CAST(s - sx AS DOUBLE) / CAST(n - n_docs AS DOUBLE), 6)
        |    AS mean_without,
        |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
        |    - CAST(s - sx AS DOUBLE) / CAST(n - n_docs AS DOUBLE), 6)
        |    AS influence
        |FROM per CROSS JOIN tot""".stripMargin,

    // Source-KL twin: same present-pair fixed-point terms, same
    // lnq integer sums and the same absent-word p0 closed form.
    "q_source_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |src AS (
        |  SELECT source, tok, COUNT(*) AS c FROM toks
        |  WHERE tok <> '' GROUP BY 1, 2),
        |corpus AS (
        |  SELECT tok, CAST(SUM(c) AS BIGINT) AS cw FROM src
        |  GROUP BY 1),
        |tot AS (
        |  SELECT CAST(SUM(cw) AS BIGINT) AS n, COUNT(*) AS v
        |  FROM corpus),
        |lnq AS (
        |  SELECT tok, CAST(round(ln(CAST(cw AS DOUBLE)
        |    / CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS lnq_fp
        |  FROM corpus CROSS JOIN tot),
        |lall AS (
        |  SELECT CAST(SUM(lnq_fp) AS BIGINT) AS l_all_fp FROM lnq),
        |per AS (
        |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_s,
        |    COUNT(*) AS v_s
        |  FROM src GROUP BY 1),
        |pres AS (
        |  SELECT src.source,
        |    CAST(SUM(CAST(round(
        |      ((CAST(c AS DOUBLE) + 1.0) / CAST(n_s + v AS DOUBLE))
        |      * (ln((CAST(c AS DOUBLE) + 1.0)
        |          / CAST(n_s + v AS DOUBLE))
        |        - CAST(lnq_fp AS DOUBLE) / 1000000.0)
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS pres_fp,
        |    CAST(SUM(lnq_fp) AS BIGINT) AS l_pres_fp
        |  FROM src JOIN lnq USING (tok)
        |    JOIN per ON src.source = per.source
        |    CROSS JOIN tot
        |  GROUP BY 1)
        |SELECT per.source, n_s AS n_tokens, v_s AS n_types,
        |  round(CAST(pres_fp AS DOUBLE) / 1000000.0
        |    + (1.0 / CAST(n_s + v AS DOUBLE))
        |      * (CAST(v - v_s AS DOUBLE)
        |          * ln(1.0 / CAST(n_s + v AS DOUBLE))
        |        - CAST(l_all_fp - l_pres_fp AS DOUBLE)
        |          / 1000000.0), 6) AS kl
        |FROM per JOIN pres ON per.source = pres.source
        |  CROSS JOIN tot CROSS JOIN lall""".stripMargin,

    // Per-source Heaps twin: the q_heaps_curve chain partitioned by
    // source, 1e-6-snapped ln points, integer per-source sums, the
    // q_zipf_fit double tree (sums cast to double FIRST).
    "q_heaps_by_source" ->
      """WITH bounds AS (
        |  SELECT source, MIN(doc_id) AS mn, MAX(doc_id) AS mx
        |  FROM documents GROUP BY 1),
        |toks AS (SELECT source, doc_id, string_split(text, ' ') AS t
        |         FROM documents),
        |bg AS (
        |  SELECT source, doc_id, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT source, doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |firsts AS (SELECT source, bg, MIN(doc_id) AS first_doc FROM bg
        |           GROUP BY 1, 2),
        |fb AS (
        |  SELECT f.source,
        |    least(((first_doc - mn) * 10) // (mx - mn + 1), 9) AS bucket
        |  FROM firsts f JOIN bounds b ON f.source = b.source),
        |nt AS (SELECT source, bucket, COUNT(*) AS new_types FROM fb
        |       GROUP BY 1, 2),
        |occ0 AS (
        |  SELECT source, doc_id,
        |    greatest(len(string_split(text, ' ')) - 1, 0) AS n_bg
        |  FROM documents),
        |ob AS (
        |  SELECT o.source,
        |    least(((doc_id - mn) * 10) // (mx - mn + 1), 9) AS bucket,
        |    n_bg
        |  FROM occ0 o JOIN bounds b ON o.source = b.source),
        |occ AS (SELECT source, bucket, SUM(n_bg) AS n_bigrams
        |        FROM ob GROUP BY 1, 2),
        |grid AS (
        |  SELECT source, CAST(r AS BIGINT) AS bucket
        |  FROM bounds CROSS JOIN range(10) g(r)),
        |j AS (
        |  SELECT grid.source, grid.bucket,
        |    CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS nb,
        |    CAST(COALESCE(new_types, 0) AS BIGINT) AS nt2
        |  FROM grid
        |  LEFT JOIN occ ON grid.source = occ.source
        |    AND grid.bucket = occ.bucket
        |  LEFT JOIN nt ON grid.source = nt.source
        |    AND grid.bucket = nt.bucket),
        |cum AS (
        |  SELECT source,
        |    SUM(nb) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS n_cum,
        |    SUM(nt2) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS v_cum
        |  FROM j),
        |pts AS (
        |  SELECT source,
        |    CAST(round(ln(CAST(n_cum AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(v_cum AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM cum WHERE n_cum > 0 AND v_cum > 0),
        |s AS (
        |  SELECT source, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM pts GROUP BY 1),
        |f AS (
        |  SELECT source, CAST(n AS BIGINT) AS n_fit,
        |    CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
        |    CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
        |  FROM s)
        |SELECT source, n_fit,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) END, 6)
        |    AS beta,
        |  round(CASE WHEN nd * sxxd - sxd * sxd <> 0.0 THEN
        |    (syd - ((nd * sxyd - sxd * syd)
        |        / (nd * sxxd - sxd * sxd)) * sxd) / nd / 1e6 END, 6)
        |    AS ln_k,
        |  round(CASE WHEN (nd * sxxd - sxd * sxd)
        |      * (nd * syyd - syd * syd) <> 0.0 THEN
        |    (nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
        |    / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd))
        |  END, 6) AS r2
        |FROM f""".stripMargin,

    // Quantile-normalization twin: the same total-order ntile binning
    // (score then doc_id), per-source bin means snapped to 1e-9
    // fixed-point, the same unweighted cross-source integer average
    // (Bolstad's mean-of-means — each source one vote).
    "q_quantile_norm" ->
      """WITH b AS (
        |  SELECT source, n_chars,
        |    CAST(ntile(10) OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS INT) AS bin
        |  FROM documents),
        |ps AS (
        |  SELECT source, bin, COUNT(*) AS n_docs, SUM(n_chars) AS s,
        |    CAST(round(CAST(SUM(n_chars) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) * 1e9) AS BIGINT) AS mean_fp
        |  FROM b GROUP BY 1, 2),
        |g AS (
        |  SELECT bin, COUNT(*) AS n_sources, SUM(mean_fp) AS gfp
        |  FROM ps GROUP BY 1)
        |SELECT source, bin, CAST(n_docs AS BIGINT) AS n_docs,
        |  round(CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
        |    AS src_mean,
        |  round(CAST(gfp AS DOUBLE) / 1e9
        |    / CAST(n_sources AS DOUBLE), 6) AS norm_value
        |FROM ps JOIN g USING (bin)""".stripMargin,

    // Gini twin: the rank-free distinct-value formulation — DuckDB
    // computes the prefix with ONE plain window (single-node oracle;
    // the engine's two-level construction produces the same rstart
    // values), integer rank sums (HUGEINT mirrors the engine's
    // DECIMAL(38,0)), the identical closed-form double tree.
    "q_token_gini" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT tok, COUNT(*) AS tf FROM tok GROUP BY 1),
        |cnts AS (SELECT tf AS v, COUNT(*) AS c FROM tf GROUP BY 1),
        |r AS (
        |  SELECT v, c,
        |    1 + COALESCE(SUM(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS rstart
        |  FROM cnts),
        |rx AS (
        |  SELECT v * (c * rstart + (c * (c - 1)) // 2) AS rank_x,
        |    c, v * c AS vc
        |  FROM r),
        |s AS (SELECT SUM(c) AS n, SUM(vc) AS t, SUM(rank_x) AS srx
        |      FROM rx)
        |SELECT CAST(n AS BIGINT) AS n_types, CAST(t AS BIGINT)
        |    AS n_tokens,
        |  round(CASE WHEN n > 1 THEN
        |    2.0 * CAST(srx AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE))
        |    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
        |  END, 6) AS gini
        |FROM s""".stripMargin,

    // Char-class twin: identical length-delta counts (regexp_replace
    // needs the 'g' flag in DuckDB — Spark replaces all by default),
    // integer sums, the same five rounded divisions.
    "q_charclass_profile" ->
      """WITH p AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS n_chars,
        |    CAST(length(text) - length(replace(text, ' ', ''))
        |      AS BIGINT) AS sp,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS BIGINT) AS dg,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[A-Z]', '', 'g'))
        |      AS BIGINT) AS up,
        |    CAST(length(text)
        |      - length(regexp_replace(text, '[a-z]', '', 'g'))
        |      AS BIGINT) AS lo
        |  FROM documents),
        |g AS (
        |  SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars,
        |    SUM(sp) AS sp, SUM(dg) AS dg, SUM(up) AS up, SUM(lo) AS lo
        |  FROM p GROUP BY 1)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_chars AS BIGINT) AS n_chars,
        |  round(CAST(sp AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    AS space_ratio,
        |  round(CAST(dg AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    AS digit_ratio,
        |  round(CAST(up AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    AS upper_ratio,
        |  round(CAST(lo AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
        |    AS lower_ratio,
        |  round(CAST(n_chars - sp - dg - up - lo AS DOUBLE)
        |    / CAST(n_chars AS DOUBLE), 6) AS other_ratio
        |FROM g""".stripMargin,

    // Burstiness twin: one vocab aggregate, exact-integer inputs to
    // the one rounded division, same (burstiness DESC, tok) cut.
    "q_burstiness" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |      FROM tok GROUP BY 1)
        |SELECT tok, tf, df,
        |  round(CAST(tf AS DOUBLE) / CAST(df AS DOUBLE), 6)
        |    AS burstiness
        |FROM v WHERE tf >= 10
        |ORDER BY burstiness DESC, tok LIMIT 50""".stripMargin,

    // Dup-rate twin: the shared pairs CTEs, pair-member flags, the
    // idOffset conditional mapping back to source (injected copies =
    // doc_id − offset, originals map to themselves — same arithmetic
    // as dupRateBySource, valid even for native ids ≥ offset).
    "q_dup_rate_by_source" ->
      s"""WITH $pairsCteSql,
         |flagged AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM pairs
         |    UNION ALL SELECT doc_b FROM pairs)),
         |cs AS (
         |  SELECT c.doc_id, d.source
         |  FROM corpus c JOIN documents d
         |    ON (CASE WHEN c.doc_id >= 1000000 THEN c.doc_id - 1000000
         |        ELSE c.doc_id END) = d.doc_id)
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_dup_docs,
         |  round(CAST(SUM(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0
         |      END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |    AS dup_rate
         |FROM cs LEFT JOIN flagged f ON cs.doc_id = f.doc_id
         |GROUP BY 1""".stripMargin,

    // Shard-diversity twin: the q_shard_assign rendezvous CTE with
    // source carried through, then the same fixed-point entropy fold
    // (−p·ln p snapped at 1e-9, exact integer sums, one division).
    "q_shard_diversity" ->
      """WITH a AS (
        |  SELECT doc_id, source, CAST(shard AS INT) AS shard FROM (
        |    SELECT doc_id, source, s AS shard,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY w DESC, s DESC) AS rn
        |    FROM (
        |      SELECT doc_id, source, r.s,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |          r.s), 1, 15))::BIGINT AS w
        |      FROM documents CROSS JOIN range(16) r(s)))
        |  WHERE rn = 1),
        |cs AS (SELECT shard, source, COUNT(*) AS c FROM a GROUP BY 1, 2),
        |per AS (SELECT shard, SUM(c) AS n, COUNT(*) AS n_sources
        |        FROM cs GROUP BY 1),
        |t AS (
        |  SELECT cs.shard, n, n_sources,
        |    CAST(round(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
        |        * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * 1e9)
        |      AS BIGINT) AS term_fp
        |  FROM cs JOIN per ON cs.shard = per.shard)
        |SELECT shard, CAST(MIN(n) AS BIGINT) AS n_docs,
        |  CAST(MIN(n_sources) AS BIGINT) AS n_sources,
        |  round(CAST(SUM(term_fp) AS DOUBLE) / 1e9, 6) AS entropy
        |FROM t GROUP BY 1""".stripMargin,

    // Richness twin: the bigram build per source, the same two-level
    // aggregate, two divisions (ln probed bit-identical).
    "q_lexical_richness" ->
      """WITH toks AS (
        |  SELECT source, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT source, t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT source, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |pt AS (SELECT source, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |a AS (
        |  SELECT source, COUNT(*) AS n_types, SUM(c) AS n_bigrams
        |  FROM pt GROUP BY 1)
        |SELECT source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  round(CAST(n_types AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6)
        |    AS ttr,
        |  round(CASE WHEN n_bigrams > 1 THEN
        |    ln(CAST(n_types AS DOUBLE)) / ln(CAST(n_bigrams AS DOUBLE))
        |  END, 6) AS herdan_c
        |FROM a""".stripMargin,

    // Hill twin: same top-201 cut, rank window, 1-row x(k+1) frame,
    // fixed-point ln terms, the identical (k·1e6)/Σ division.
    "q_hill_tail" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i+1] AS bg
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM toks)),
        |tf AS (
        |  SELECT bg, COUNT(*) AS tf FROM bg GROUP BY 1
        |  ORDER BY tf DESC, bg LIMIT 201),
        |rk AS (
        |  SELECT tf, row_number() OVER (ORDER BY tf DESC, bg) AS rnk
        |  FROM tf),
        |xk AS (SELECT tf AS xk FROM rk WHERE rnk = 201),
        |t AS (
        |  SELECT CAST(round((ln(CAST(rk.tf AS DOUBLE))
        |      - ln(CAST(xk AS DOUBLE))) * 1e6) AS BIGINT) AS term_fp
        |  FROM rk CROSS JOIN xk WHERE rnk <= 200),
        |s AS (SELECT COUNT(*) AS k_used, SUM(term_fp) AS st FROM t)
        |SELECT CAST(k_used AS BIGINT) AS k_used,
        |  round(CASE WHEN st > 0 THEN
        |    CAST(k_used AS DOUBLE) * 1e6 / CAST(st AS DOUBLE) END, 6)
        |    AS alpha
        |FROM s""".stripMargin,

    // MI twin: same contingency/marginal integers, same per-term 1e-6
    // snap-and-integer-sum, identical ratio trees.
    "q_mutual_info" ->
      """WITH cells AS MATERIALIZED (
        |  SELECT source AS x, lang AS y, COUNT(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |mx AS (SELECT x, CAST(SUM(n) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1),
        |my AS (SELECT y, CAST(SUM(n) AS BIGINT) AS ny
        |  FROM cells GROUP BY 1),
        |nn AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
        |smi AS (SELECT CAST(SUM(CAST(round(
        |      (CAST(n AS DOUBLE) / nn)
        |      * ln(CAST(n * nn AS DOUBLE) / CAST(nx * ny AS DOUBLE))
        |      * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS smi
        |  FROM cells JOIN mx USING (x) JOIN my USING (y)
        |  CROSS JOIN nn),
        |shx AS (SELECT CAST(SUM(CAST(round(
        |      (CAST(nx AS DOUBLE) / nn)
        |      * ln(CAST(nx AS DOUBLE) / nn) * 1000000.0, 0)
        |    AS BIGINT)) AS BIGINT) AS shx
        |  FROM mx CROSS JOIN nn),
        |shy AS (SELECT CAST(SUM(CAST(round(
        |      (CAST(ny AS DOUBLE) / nn)
        |      * ln(CAST(ny AS DOUBLE) / nn) * 1000000.0, 0)
        |    AS BIGINT)) AS BIGINT) AS shy
        |  FROM my CROSS JOIN nn)
        |SELECT round(CAST(smi AS DOUBLE) / 1000000.0, 6) AS mi,
        |  round(-CAST(shx AS DOUBLE) / 1000000.0, 6) AS h_x,
        |  round(-CAST(shy AS DOUBLE) / 1000000.0, 6) AS h_y,
        |  round((CAST(smi AS DOUBLE) / 1000000.0)
        |    / sqrt((-CAST(shx AS DOUBLE) / 1000000.0)
        |      * (-CAST(shy AS DOUBLE) / 1000000.0)), 6) AS nmi
        |FROM smi CROSS JOIN shx CROSS JOIN shy""".stripMargin,

    // LM-by-source twin: the shared LM chain + the source join, 1e-6
    // snap of the already-6dp per-doc scores (exact integers), one
    // division per source.
    "q_lm_by_source" ->
      s"""WITH $lmCtesSql
         |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
         |  round(CAST(SUM(CAST(round(avg_logp * 1e6) AS BIGINT))
         |      AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 1e6), 6)
         |    AS macro_avg_logp
         |FROM lm JOIN documents USING (doc_id) GROUP BY 1""".stripMargin,

    // Cluster-size twin: the recursive closure wrapped twice —
    // per-cluster sizes, then the size histogram.
    "q_cluster_sizes" ->
      s"""SELECT sz AS cluster_size, COUNT(*) AS n_clusters FROM (
         |  SELECT canonical_id, COUNT(*) AS sz FROM (
         |$clustersSql
         |  ) GROUP BY 1) GROUP BY 1""".stripMargin,

    // Signal-correlation twin: the q_quality_score feature chain,
    // 1e-6 snap of the 6-dp score (exact), the identical closed-form
    // correlation tree with its one sqrt.
    "q_signal_corr" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS ntk,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      AS nd,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      t -> t IN ('the', 'a'))) AS DOUBLE) AS ns
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    round(0.3 * ln(ntk) + 2.0 * (nd / ntk) - 1.5 * (ns / ntk), 6)
        |      AS q_score
        |  FROM f),
        |x AS (
        |  SELECT CAST(round(q_score * 1e6) AS BIGINT) AS x,
        |    n_chars AS y
        |  FROM sc JOIN documents USING (doc_id)),
        |a AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM x),
        |d AS (
        |  SELECT CAST(n AS BIGINT) AS n_rows,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
        |  FROM a)
        |SELECT n_rows,
        |  round(CASE WHEN vx * vy > 0 THEN num / sqrt(vx * vy) END, 6)
        |    AS r
        |FROM d""".stripMargin,

    // Stopword-coverage twin: list_filter over the shared token
    // split, integer sums, one division per lang.
    "q_stopword_coverage" ->
      """WITH p AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the', 'a'))) AS BIGINT) AS nsw
        |  FROM documents)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
        |  CAST(SUM(nsw) AS BIGINT) AS n_stopwords,
        |  round(CAST(SUM(nsw) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE), 6)
        |    AS stopword_ratio
        |FROM p GROUP BY 1""".stripMargin
  )
}
