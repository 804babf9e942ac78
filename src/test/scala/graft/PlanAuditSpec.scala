package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide plan-invariant gate: walks the static physical plan of
  * EVERY SparkEntry query and enforces the scale rules from PLANS.md, so
  * a future edit that regresses a plan (all-pairs join, global window,
  * cartesian) fails CI instead of surfacing at 100 TB.
  *
  * The audited plan is `queryExecution.sparkPlan` — the static choice
  * before AQE re-planning; AQE can only improve on what is asserted
  * here.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose BroadcastNestedLoopJoin is a deliberate
    * tiny-broadcast-side design, not an accident:
    *  - knn brute/topk: the QUERY SET is broadcast, the corpus streams
    *    once (the right asymmetry for few-queries × huge-corpus);
    *  - quartiles / tfidf: a literal 1-row aggregate (cut points /
    *    corpus count) is cross-joined onto the scan;
    *  - knn_ivf_learned: assignment/probing cross-join against the
    *    k = 8 broadcast centroids (Lloyd's assignment is by definition
    *    every-vector × every-centroid; k is a small constant).
    */
  /**  - knn_quantized: the 1-row SQ8 codebook (two 64-double arrays)
    *    rides two broadcast cross joins + the broadcast query set —
    *    all k/1-row-bounded, same family as the cases above.
    */
  /**  - corpus_mix: the 1-row corpus total cross-joined onto the
    *    |sources|-row count table while building the tiny mix plan.
    */
  /**  - hll_distinct: the constant 64-row register-index frame is
    *    cross-joined onto the (tiny) distinct-group set to densify
    *    registers — bounded by 64·|groups|, never the data.
    *  - lm_score: the 1-row vocabulary-size aggregate broadcast onto
    *    the scorer (same family as quartiles/tfidf).
    */
  /**  - knn_ivf_pq: the coarse trainer's k=8 centroid cross joins
    *    (same as knn_ivf_learned); knn_text: the broadcast hashed
    *    query set (same asymmetry as knn_brute); mix_temperature: the
    *    1-row normalizer + 1-row total (same as corpus_mix).
    */
  /**  - knn_ivf_pq_residual: same trainer frames as knn_ivf_pq;
    *    knn_matryoshka: the broadcast query set on both stages (same
    *    asymmetry as knn_brute — coarse slice scan + shortlist rerank).
    */
  private val bnlJAllowed = Set(
    "q_knn_brute", "q_knn_topk_agg", "q_quartiles", "q_tfidf",
    "q_knn_ivf_learned", "q_semantic_dedup", "q_semantic_dedup_2level",
    "q_semdedup_prune", // same trainer cross joins as q_semantic_dedup
    "q_knn_quantized", "q_knn_quantized_rerank", "q_knn_ivf_sq8",
    "q_corpus_mix", "q_hll_distinct", "q_lm_score",
    "q_knn_ivf_pq", "q_knn_text", "q_mix_temperature",
    "q_hard_negatives", "q_knn_ivf_pq_residual", "q_knn_matryoshka",
    // lm_buckets: the 1-row quantile-cut frame (q_quartiles family) on
    // the 1-row-vocab lm chain; bigram_pmi: the 1-row total-count
    // frame; kmv_intersect: two 1-row frames (theta + exact count).
    "q_lm_buckets", "q_bigram_pmi", "q_kmv_intersect",
    // lm_kn: the 1-row bigram-type-count frame (q_lm_score family).
    "q_lm_kn",
    // psi_drift: two 1-row frames (totals, psi sum) over the 10-row
    // bin table (q_kmv_intersect family).
    "q_psi_drift",
    // ppmi_window: the 1-row total-pair frame (q_bigram_pmi family).
    "q_ppmi_window",
    // knn_binary(_rerank): the broadcast packed query set (knn_brute
    // asymmetry — 16 B/vector); bm25: the 1-row N/total_dl stats
    // frame; dsir_weights: the 1-row smoothing-totals frame;
    // pagerank: the 1-row node-count frame per iteration.
    "q_knn_binary", "q_knn_binary_rerank", "q_bm25", "q_dsir_weights",
    "q_pagerank",
    // sql_bm25: the same 1-row N/total_dl stats frame as q_bm25,
    // expressed as SQL text.
    "q_sql_bm25",
    // fs_scores: the 1-row pivoted weight frame (8 fixed-point longs)
    // broadcast onto the candidate set — constant-size by construction.
    "q_fs_scores",
    // source_kl: the 1-row corpus totals (n, v) and 1-row L_all
    // ln-sum broadcast onto vocab/source frames.
    "q_source_kl",
    // source_influence: the 1-row corpus (n, s) totals broadcast.
    "q_source_influence",
    // benford: the 1-row digit-total broadcast onto the 9-cell frame.
    "q_benford",
    // unimax: the 1-row corpus-total and capped-sum broadcasts onto
    // the |sources|-row frame.
    "q_unimax",
    // query_expansion: inherits bm25's 1-row stats frame.
    "q_query_expansion",
    // rm3_rescore: both scoring legs carry the 1-row stats frame.
    "q_rm3_rescore",
    // psi_timeline: the |months|×nBins literal grid and the 1-row
    // reference-month / 10-row reference-histogram broadcasts.
    "q_psi_timeline",
    // bloom_join: the 1-row dense-word-array filter frame (256 KB at
    // m=2²⁰) broadcast onto the fact scan — the runtime-filter probe.
    "q_bloom_join",
    // hybrid_rrf: inherits bm25's 1-row stats frame and knn_text's
    // broadcast hashed query set — both legs individually allowlisted.
    "q_hybrid_rrf",
    // hll_merge: the same 64-row constant register frame as
    // q_hll_distinct (shared hllEstimateFromRegs tail).
    "q_hll_merge",
    // cooccurrence: the 1-row basket-total frame under the lift.
    "q_cooccurrence",
    // modularity: the 1-row (t, sw, sdd) totals frame under Q;
    // distinctive_terms: the 1-row (n_tot, vocab) frame under the
    // log-odds — both the q_bm25 stats-frame shape.
    "q_modularity", "q_distinctive_terms",
    // unigram_vocab: the 1-row (tot, v) smoothing-totals frame under
    // the cost projection (q_dsir_weights shape).
    "q_unigram_vocab",
    // mutual_info: the 1-row corpus-total frame under each fixed-point
    // term projection plus the 1-row MI/entropy sum frames — five
    // 1-row broadcasts, nothing data-sized (q_kmv_intersect family).
    "q_mutual_info",
    // split_leakage: the 1-row pair-total frame under the share.
    "q_split_leakage",
    // conductance: the same 1-row totals frame as q_modularity.
    "q_conductance",
    // dedup_planted_eval: three 1-row count frames under the ratios.
    "q_dedup_planted_eval",
    // join_degree: the 1-row estimated-join-size frame under `share`.
    "q_join_degree",
    // srm: the 1-row unit-total frame under the chi-square (appears
    // twice — arm rows + total row share the perArm subplan).
    "q_srm",
    // ccf: the 1-row (sxx, syy) denominator frame, itself the cross
    // of two 1-row aggregates.
    "q_ccf",
    // t_closeness: the band table (range-bounded, ~11 rows) and the
    // 1-row (N, m) totals — the q_psi_timeline constant-grid family.
    "q_t_closeness",
    // assoc_rules: the 1-row basket-total frame (q_cooccurrence).
    "q_assoc_rules",
    // ql_dirichlet: the same 1-row corpus-stats frame as q_bm25.
    "q_ql_dirichlet",
    // textrank: inherits pageRank's 1-row node-count frame per
    // iteration (q_pagerank family) over the word-adjacency graph.
    "q_textrank",
    // chi2_features: the 1-row corpus doc-count frame (q_bm25 shape).
    "q_chi2_features",
    // sign_flip: the 1-row observed-sum frame under the extremity
    // count (q_kmv_intersect family).
    "q_sign_flip",
    // intrinsic_dim: the broadcast panel cross (knn_brute asymmetry
    // — the panel is the capped derived-query set, never the corpus).
    "q_intrinsic_dim",
    // bh_fdr: the 1-row m-tests and k-star frames broadcast onto the
    // <= |nations|-row ranked family (q_kmv_intersect family).
    "q_bh_fdr",
    // msprt: the 1-row variance frame broadcast onto the calendar-
    // bounded daily diff series (q_ccf family).
    "q_msprt",
    // isotonic: the <= B^2 inequality joins of the minimax closed
    // form run on bin frames capped at 10 rows by construction.
    "q_isotonic",
    // diameter: the 1-row farthest-node frame broadcast under the
    // readout (q_kmv_intersect family).
    "q_diameter",
    // sinkhorn: the band-bounded (<= 11-row) ab frame crossed into
    // the B^2 grid plus 1-row totals (q_t_closeness family).
    "q_sinkhorn",
    // eb_shrinkage: the 1-row (gmean, sig2, tau2) frame broadcast
    // onto the |nations|-row means (q_benford family).
    "q_eb_shrinkage",
    // apportion: the 1-row source-total frame.
    "q_apportion",
    // kappa: two 1-row frames (totals × pe marginal product).
    "q_kappa",
    // ivf_incremental: Quantizer.assign's broadcast k=8 centroid frame.
    "q_ivf_incremental",
    // price_deciles: the 1-row broadcast 9-element boundary array.
    "q_price_deciles",
    // zone_stats / zone_prune: the 1-row broadcast MAX(key) frame that
    // derives the scale-adaptive zone shift (and, for prune, the 1-row
    // exact-match count riding along the 2-row summary).
    "q_zone_stats", "q_zone_prune",
    // selfjoin_size: the 1-row broadcast CMS-estimate frame beside the
    // 1-row exact-F2 frame.
    "q_selfjoin_size",
    // ppr: the 1-row seed-count frame per iteration (q_pagerank family).
    "q_ppr",
    // kmv_diff: two 1-row frames (theta + exact count), exactly
    // q_kmv_intersect's shape.
    "q_kmv_diff",
    // range_plan: two 1-row frames (the 15-element boundary array —
    // q_price_deciles' shape — and the total-count frame).
    "q_range_plan",
    // ann_recall: inherits q_knn_brute's broadcast QUERY-SET cross
    // join on its exact leg (the few-queries × huge-corpus asymmetry,
    // already allowlisted there); the recall join itself is keyed.
    "q_ann_recall",
    // bitext_margin: the forward and backward brute top-k legs each
    // carry the q_knn_brute broadcast query-set cross join (the third
    // BNLJ is the reused leg under the margin join); everything after
    // the legs is keyed over |queries|·k rows.
    "q_bitext_margin",
    // pagerank_weighted: the 1-row node-count frame per iteration
    // (q_pagerank family).
    "q_pagerank_weighted",
    // ann_recall_curve: q_ann_recall's exact leg (broadcast query-set
    // cross join, knn_brute asymmetry); the per-k branches are keyed
    // aggregates over the tiny joined top-k frame.
    "q_ann_recall_curve",
    // nb_classifier: the broadcast |classes|-row frame expanding test
    // tokens (|C| = 5 constant — Lloyd's-assignment family) + the
    // 1-row vocabulary-size frame (q_lm_score family).
    "q_nb_classifier",
    // nb_eval: inherits the NB chain's frames; the eval tail is keyed.
    "q_nb_eval",
    // nb_auc: the same NB chain inheritance; the AUC tail is keyed
    // joins + class-partitioned rank windows.
    "q_nb_auc",
    // ks_drift: two 1-row frames (value bounds, sample totals) and the
    // broadcast ≤256-row bucket-offset table; the per-value cumulative
    // window is bucket-partitioned (keyed).
    "q_ks_drift",
    // heaps_curve: the 1-row doc-id-bounds frame broadcast onto the
    // two bucket assignments (q_quartiles 1-row family).
    "q_heaps_curve",
    // token_gini: the 1-row tf-value-bounds frame (same family).
    "q_token_gini",
    // rank_eval: inherits q_knn_brute's broadcast QUERY-SET cross join
    // on its exact leg and q_knn_ivf's on the approx leg; the metric
    // tail is keyed over |queries|·k rows.
    "q_rank_eval",
    // hill_tail: the 1-row x(k+1) order-statistic frame broadcast
    // onto the ≤200-row term frame (q_quartiles 1-row family).
    "q_hill_tail",
    // lm_by_source: the LM chain's 1-row vocabulary-size frame
    // (q_lm_score family).
    "q_lm_by_source",
    // degree_gini: giniOfValues' 1-row value-bounds frame
    // (q_token_gini family).
    "q_degree_gini",
    // hub_share: the 1-row node-total frame beside the broadcast
    // 100-row hub set.
    "q_hub_share",
    // join_advisor: the two 1-row side-count frames (statistics-only
    // planner, q_join_degree family).
    "q_join_advisor",
    // decay_counts: the 1-row reference-date frame (q_quartiles
    // 1-row family); the SQL-text variant compiles to the same plan.
    "q_decay_counts", "q_sql_decay_counts",
    // distinctive_phrases: the 1-row (n_a, n_b) corpus-totals frame
    // broadcast under the log-odds (q_distinctive_terms shape).
    "q_distinctive_phrases",
    // logrank: the 1-row (n1tot, n2tot) totals frame broadcast onto
    // the duration-bounded event-time frame (q_ccf family).
    "q_logrank",
    // cox_hr: the same logrank risk-frame shape, plus one 1-row beta
    // frame broadcast per Newton step (4 steps, each a 1-row
    // crossJoin onto the duration-bounded checkpointed frame).
    "q_cox_hr",
    // kendall_tau: the calendar-bounded all-pairs day frame (the
    // q_intrinsic_dim bounded-panel shape — both sides ≤ |days| rows)
    // plus three 1-row tie/total frames under the readout.
    "q_kendall_tau",
    // embed_energy: three vec_id-capped panel cross joins (the
    // q_intrinsic_dim bounded-panel shape) + five 1-row combines.
    "q_embed_energy",
    // silhouette: one vec_id-capped panel cross join (same shape).
    "q_silhouette")

  /** Queries allowed an unpartitioned window:
    *  - the dimension surrogate-key row_number, bounded by post-dedup
    *    dimension cardinality (Normalize.scala — documented trade);
    *  - the learned quantizer's init, a row_number over k = 8 rows.
    */
  private val globalWindowAllowed = Set(
    // bh_fdr: the BH rank and step-up windows run over the test
    // FAMILY (<= |nations| = 25 rows) — bounded by construction.
    "q_bh_fdr",
    // msprt: the sequential scan IS one global day order — the frame
    // is CALENDAR-bounded (the theilSen argument), never data-sized.
    "q_msprt",
    // logrank: the two at-risk cumulative windows run over the ONE
    // shared event-time frame — duration-bounded (the msprt/calendar
    // argument), never data-sized.
    "q_logrank",
    // cox_hr: the same duration-bounded at-risk cumulative windows
    // (shared logRankRisk chain).
    "q_cox_hr",
    // granger: the day-index row_number over the calendar-bounded
    // joined daily pivot (the msprt argument).
    "q_granger",
    // isotonic: cumulative/lag windows over the <= 10-bin frame.
    "q_isotonic",
    "q_dim_build", "q_fk_resolve", "q_dim_overwrite", "q_knn_ivf_learned",
    "q_semantic_dedup", "q_semantic_dedup_2level", "q_semdedup_prune",
    "q_knn_ivf_sq8",
    "q_knn_pq", // PQ codebook init: row_number over ksub = 16 rows
    "q_knn_ivf_pq", // coarse k=8 + PQ ksub=16 init windows
    "q_knn_ivf_pq_residual", // same trainer init windows as q_knn_ivf_pq
    // oov_rate: the vocab-rank row_number over a frame ALREADY cut to
    // ≤ Vmax = 1000 rows by the distributed take-ordered top — bounded
    // by construction (q_token_budget family).
    "q_oov_rate",
    // token_budget: the bucket-prefix window over a frame bounded at
    // 1024 rows BY CONSTRUCTION (the whole point of the two-level
    // prefix sum — the per-doc window is bucket-partitioned).
    "q_token_budget",
    // ivf_incremental: Quantizer.fit's k=8 init row_number.
    "q_ivf_incremental",
    // price_deciles: the quantile windows over the ≤ ~16·64-row BIN
    // frame (same bounded-by-construction argument as q_token_budget).
    "q_price_deciles",
    // range_plan: the same bounded bin-frame windows as price_deciles.
    "q_range_plan",
    // apportion: the leftover ranking over the |sources|-row frame.
    "q_apportion",
    // unimax: the ascending-capacity ranking over the same
    // |sources|-row frame.
    "q_unimax",
    // bitmap_distinct: the key-dictionary row_number over the DISTINCT
    // key set — dimension-bounded by the operator's own contract (a key
    // set too big to dictionary-encode is the documented KMV/HLL
    // cutover); same idiom as the dimension surrogate key.
    "q_bitmap_distinct",
    // ks_drift: the bucket-offset prefix window over the ≤256-row
    // bucket frame (the q_token_budget two-level prefix-sum idiom).
    "q_ks_drift",
    // zipf_fit: the rank row_number over a frame ALREADY cut to
    // ≤ 1000 rows by the distributed take-ordered top (q_oov_rate
    // family — bounded by construction).
    "q_zipf_fit",
    // token_gini: the bucket-offset prefix window over the ≤256-row
    // bucket frame (the q_ks_drift two-level prefix-sum idiom).
    "q_token_gini",
    // hill_tail: the rank row_number over the take-ordered ≤201-row
    // frame (q_zipf_fit family — bounded by construction).
    "q_hill_tail",
    // degree_gini: the same ≤256-row bucket-offset prefix window as
    // q_token_gini (shared giniOfValues machinery).
    "q_degree_gini",
    // heaps_curve: the cumulative window over the densified 10-row
    // bucket frame (bounded by construction).
    "q_heaps_curve")

  /** Sink round-trip queries EXECUTE a write inside the closure and
    * return the trivial re-read scan — calling fn here would side-effect
    * real files and audit nothing useful. Their pre-write plans are
    * audited explicitly below instead: q_dim_overwrite writes exactly
    * the q_dim_build frame (already in the loop), and the jsonl/csv
    * round-trips write a bare 2-column projection.
    */
  private val writeExecuting = Set("q_dim_overwrite", "q_docs_jsonl",
    "q_docs_csv", "q_docs_orc")

  test("no catalog plan regresses to cartesian / stray BNLJ / global window") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    val preWrite: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "q_dim_overwrite(pre-write)" ->
        graft.ingest.Normalize.dimension(
          graft.ingest.Parse.parsed(graft.ingest.Raw.raw(spark, sf))),
      "q_docs_jsonl(pre-write)" ->
        graft.queries.Tables.documents(spark, sf)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")),
      "q_docs_csv(pre-write)" ->
        graft.queries.Tables.documents(spark, sf)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")),
      "q_docs_orc(pre-write)" ->
        graft.queries.Tables.documents(spark, sf)
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("text")))
    val audited = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(q => writeExecuting(q._1))
      .map { case (name, fn) => (name, fn(spark, sf)) } ++ preWrite
    audited.foreach { case (name0, df) =>
      val name = name0.stripSuffix("(pre-write)")
      val plan: SparkPlan = df.queryExecution.sparkPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      val globalWin = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (cartesian.nonEmpty) violations += s"$name: CartesianProduct"
      if (bnlj.nonEmpty && !bnlJAllowed(name))
        violations += s"$name: BroadcastNestedLoopJoin (${bnlj.size})"
      if (globalWin.nonEmpty && !globalWindowAllowed(name))
        violations += s"$name: unpartitioned WindowExec (${globalWin.size})"
    }
    assert(violations.isEmpty, s"\nplan violations:\n${violations.mkString("\n")}")
  }
}
