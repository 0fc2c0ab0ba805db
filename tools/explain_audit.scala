// Plan-audit sweep: dump .explain("formatted") for headline queries to
// target/plans/<name>.txt. Drive via spark-shell -I (classpath as in
// tools/verify_local.sh). Eyeball for: PushedFilters reaching scans,
// ReadSchema pruned to used columns, WholeStageCodegen spans, no
// CartesianProduct/BroadcastNestedLoopJoin outside documented baselines.
val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
val outDir = java.nio.file.Paths.get("target", "plans")
java.nio.file.Files.createDirectories(outDir)
val names = Seq(
  "g1_pricing_summary", "j1_star_join", "j7_outer_join", "w4_topk_agg",
  "x1_asof_join", "x2_range_join", "x5_asof_tolerance",
  "d3_lsh_pairs", "d13_decontaminate", "d16_decontaminate_13gram",
  "e4_embed_clusters", "n2_knn_ivf", "n14_knn_ivfpq", "t14_unigram_xent",
  "t13_boilerplate", "z1_zorder_key", "sp11_curriculum",
  // round 7 additions
  "pipe2_training_assembly", "d22_source_overlap", "d23_remove_boilerplate",
  "t21_rm3_expand", "s5_peak_concurrency", "j9_lateral_topn",
  "e10_label_overlap", "n21_knn_filtered", "i5_snapshot_to_cdc",
  "w9_time_rolling", "t22_calibrated_quality", "dq4_psi_drift",
  "n22_knn_ivfsq8", "i6_ivm_agg", "dq5_join_fanout", "d24_jw_pairs",
  "sp19_pack_offsets", "sp20_epoch_shuffle", "t25_lang_consistency",
  // round 7 late additions: the graph family (note pagerank plans are
  // per-iteration — the materialization barrier means the dumped plan is
  // the FINAL iteration's join+agg, which is the repeated unit)
  "graph1_pagerank", "graph2_triangles", "d25_lsh_plan",
  // round 7 final additions: ER composition, link prediction, component
  // census, OHLC resample, phrase search, packing audit
  "pipe4_entity_resolution", "graph4_link_predict", "graph5_components",
  "x7_ohlc_resample", "t27_phrase_search", "sp22_pack_audit",
  // round 8 session-2 additions: SNM (two range sorts + dense-position
  // equi-join, no cartesian), PPJoin (prefix inverted-index join), NSW
  // walk (final beam round: bounded joins + top-k agg), weighted sample
  // (TakeOrderedAndProject), rank eval (query-grain semi-join + aggs),
  // HLL registers (one hash-agg), compaction plan (per-dir window),
  // grouped split (broadcast-able left join + narrow projection),
  // k-core (final round: degree agg + semi-joins)
  "d33_snm_pairs", "d31_ppjoin", "n24_nsw_search",
  "sp25_weighted_sample", "t29_rank_eval", "t32_hll_registers",
  "z5_compaction_plan", "sp26_grouped_split", "graph7_kcore",
  // round 8 session-3 additions: KN model joins (AQE-broadcast model
  // relations), LOF (keyed joins + hash-aggs over the k-bounded
  // relation), reachability (final frontier round: equi-join + distinct
  // + anti-join), HITS (final half-step: edge join + agg + broadcast
  // max), modularity (degree agg + double label join), CUSUM (ONE
  // window sort, two frames), CUPED (conditional user agg + broadcast
  // scalars), RBO (two k-bounded joins + broadcast weights), MAD /
  // equi-depth (distinct-value-grain windows), detector Venn (union of
  // pair relations + two aggs), Markov (one window sort + vocab aggs)
  "t30_kneser_ney", "n25_lof", "graph8_reachability", "graph9_hits",
  "graph10_modularity", "x9_cusum", "x10_seasonal_baseline", "ab1_cuped",
  "t39_rbo", "dq9_mad_outliers", "dq11_equidepth",
  "d34_detector_agreement", "s7_markov_transitions", "t38_textrank",
  "pipe6_perplexity_curriculum", "t40_zipf", "dq8_benford",
  "dq10_kanonymity", "ab2_srm",
  // round 9 additions: attribution (per-user window sorts + channel
  // aggs), RFM (customer agg + documented single-partition ntiles),
  // interval merge (one per-key window sort + two hash-aggs), KMV
  // (distinct agg + TakeOrderedAndProject, never a global sort), SSSP
  // (final frontier round: equi-join + min-agg + anti-ish improvement
  // join), Damerau pairs (prefix-block join, codegen'd kernel in the
  // filter), cluster agreement (three doc-grain hash-aggs), assoc rules
  // (broadcast freq joins), NB (class-grid broadcast cross + model left
  // join + two aggs), feature hashing (narrow projection + one agg),
  // bootstrap (user agg + x40 explode + 40-row fold), noisy counts
  // (group agg + per-row scalar noise), time split (broadcast bounds +
  // narrow projection), partition plan (posexplode + two aggs)
  "at1_last_touch", "at2_linear_attrib", "at3_rfm_segments",
  "x12_interval_merge", "t36_kmv_distinct", "t37_kmv_setops",
  "graph12_sssp", "d35_damerau_pairs", "d36_cluster_agreement",
  "t42_assoc_rules", "ml1_naive_bayes", "ml2_hash_features",
  "ab3_bootstrap_ci", "dp1_noisy_counts", "sp27_time_split",
  "z7_partition_plan",
  // round-9 session-2 additions: survival/cohort/path analytics (keyed
  // windows + cell-grain aggs), DBSCAN (degree agg + star-rounds CC —
  // plan is the final round's joins), SCC (closure ∩ transpose), CF
  // neighbors + hit-rate (pair scores + keyed window + semi-join),
  // grouped quantiles (PARTITIONED cumulative window — the dq11 caveat
  // removed by shape; plan-spec locked too), QL retrieval (tf
  // materialize + broadcast stats), ROUGE-2 ((pair, gram)-grain
  // full-outer join), constraint suite (ONE hash-agg), MI/drift audits
  // (cell-grain joins), conformal (bounded selection window), ACF
  // (window + explode + AQE-decided stats join), Welch/DiD/burstiness
  // (user-grain conditional aggs), Hill (distinct-degree agg)
  "s10_retention_km", "s11_event_trigrams", "s12_cohort_retention",
  "s13_funnel_latency", "s14_burstiness", "e17_dbscan", "graph13_scc",
  "graph14_hill_alpha", "rec1_cf_hitrate", "dq13_snapshot_drift",
  "dq14_mutual_info", "dq15_constraint_suite", "dq16_grouped_quantiles",
  "x13_acf", "ab4_welch", "ab5_did", "ml3_calibration",
  "ml4_conformal_coverage", "t44_distinct_ngrams", "t45_vocab_richness",
  "t46_ql_dirichlet", "t47_rouge2_lead", "sp28_waterfill_budget",
  // round-9 session-3 late additions (r9 advice: these were covered but
  // missing from this sweep): session-depth panel, grouped decile drift,
  // per-key OLS trend
  "s15_session_depth", "dq18_decile_drift", "x14_keyed_trend",
  // round-10 additions: Lorenz (bounded kernel + k-row agg), MW-U
  // (kernel + 1-row agg), chi2 (broadcast grid), HHI (two hash-aggs),
  // JSD (bucket join), Markov stationary (states-sized iterate joins)
  "dq17_lorenz", "ab6_mann_whitney", "dq19_chi2", "dq20_hhi",
  "dq21_jsd", "s16_markov_stationary", "dq22_quantiles_twolevel",
  "ml5_roc_auc", "graph15_clustering_coef", "graph16_assortativity",
  "dq23_percentile_xform", "x15_keyed_trend_full", "ab7_logrank",
  "sp29_stratum_topk", "s17_survival_summary",
  // round-11 additions: quantile sketch (one bucket hash-agg + the
  // bounded bucket-grain window + k-row agg), its bracket gate (sketch
  // + two-level exact side by side), grouped form (PARTITIONED bucket
  // window), shard merge (two shard sketches + (lo,hi)-sum), log-bucket
  // JSD (sketch histograms into the bucket join)
  "dq24_qsketch_deciles", "dq25_qsketch_bracket", "dq26_qsketch_by_type",
  "dq27_qsketch_merge", "dq28_qsketch_drift",
  // round-11 late additions: isotonic (bin-grain broadcast grid +
  // grouped aggs), EB shrinkage (key agg + 1-row broadcast fit),
  // two-proportion z (user agg + 2-row pivot), Mann-Kendall (bounded
  // keyed self-join + keyed aggs)
  "ml6_isotonic_calibration", "dq29_eb_shrinkage", "ab8_two_proportion",
  "x16_mann_kendall")
for (n <- names) {
  val df = graft.SparkEntry.queries(n)(spark, sfDir)
  val plan = df.queryExecution.explainString(
    org.apache.spark.sql.execution.FormattedMode)
  java.nio.file.Files.write(outDir.resolve(s"$n.txt"),
    plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  println(s"PLAN_DUMPED $n")
}
System.exit(0)
