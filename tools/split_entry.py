#!/usr/bin/env python3
"""One-shot refactoring script: split the monolithic SparkEntry.scala
(6.6k lines — every query edit churned one file the whole surface
depends on) into per-family declaration objects under
src/main/scala/graft/entry/, merged back into SparkEntry's registry.

Entry chunks (query lambdas and oracle SQL strings) are moved VERBATIM —
comments included — so the declared surface and every hash is unchanged.
Kept in tools/ as documentation of how the split was produced."""
import os
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT_DIR = "src/main/scala/graft/entry"

FAMILIES = {
    # scans, projections, filters, joins, aggregates, windows, set ops,
    # scalar functions, layout, profiling — the reference's own surface
    "Relational": """
      q_flagship q_scan_project q_scan_tsv q_scan_json q_project_struct
      q_filter_whereeq q_filter_any q_prefix_match q_semi_join q_anti_join
      q_broadcast_join q_join_fallback q_smj q_outer_join q_range_join
      q_asof_join q_asof_forward q_asof_nearest q_interval_join q_pit_join
      q_agg_group_count q_agg_multi q_distinct q_count_distinct
      q_approx_distinct q_rollup q_groupby_having q_grouping_sets q_pivot
      q_cube q_percentile q_scalar_subquery q_topk q_window_rank
      q_window_running q_window_analytics q_window_dist q_window_firstlast
      q_union_all q_except q_intersect q_except_all q_intersect_all
      q_string_funcs q_cast q_math_funcs q_date q_json q_array_ops
      q_unpivot q_shj q_nullsafe_join q_salted_join q_bucket_join
      q_zorder_scan q_dpp_prune q_minmax_by q_percentile_disc
      q_pivot_multi q_incremental_agg q_string_agg q_regr_full
      q_bit_bool_agg q_geo_radius q_geo_nearest q_geo_pairs
      q_profile q_constraints q_join_cardinality q_extract_entities
    """,
    # text analytics over documents
    "Text": """
      q_token_count q_text_quality q_explode_freq q_lang_id
      q_quality_score q_gopher_rules q_script_mix q_repetition
      q_pii_scrub q_fingerprint q_boilerplate q_chunk_tokens
      q_readability q_normalize_text q_stopwords q_oov_rate q_novelty
      q_zipf_fit q_unigram_logprob q_bigram_logprob q_collocations
      q_bpe_pairs q_bpe_encode q_entropy
    """,
    # corpus curation: sampling, splits, budgets, mixtures, decontamination
    "Curation": """
      q_stratified_sample q_hash_sample q_split q_weighted_sample
      q_shuffle_rank q_quality_bins q_source_mixture q_mixture_weights
      q_source_cap q_token_budget q_pack_sequences q_decontaminate
      q_decontaminate_bloom q_curation_pipeline q_quality_classifier
      q_pareto_docs q_dup_inflation q_kanon q_split_leakage
      q_cross_source q_concentration
    """,
    # deduplication in all its forms + fuzzy entity resolution
    "Dedup": """
      q_dedup_exact q_dedup_hash q_passage_dedup q_dup_spans
      q_minhash_pairs q_simhash_pairs q_ngram_jaccard q_ngram_jaccard_sql
      q_incremental_dedup q_embedding_neardup q_embedding_neardup_lsh
      q_dedup_clusters q_dedup_clusters_star q_dedup_keepers
      q_dedup_clusters_ngram q_dedup_keepers_ngram
      q_dedup_keepers_quality q_semantic_dedup q_ppjoin
      q_sorted_neighbors q_fuzzy_join q_containment q_jaro
      q_source_similarity
    """,
    # similarity search / ANN / retrieval / ranking evaluation
    "Retrieval": """
      q_cosine_topk q_lsh_topk q_ivf_topk q_pq_topk q_ivfpq_topk
      q_ivfpq_rerank q_knn_graph q_knn_graph_lsh q_knn_classify
      q_hard_negatives q_retrieval_eval q_confusion_pairs
      q_label_centroids q_embedding_norm q_kmeans_sizes q_mmr_rerank
      q_bm25 q_tfidf q_tfidf_cosine q_ctfidf q_rrf_fusion
      q_bool_retrieval q_substring_search q_phrase_search q_cooccurrence
    """,
    # graph analytics over the k-NN edge set
    "Graph": """
      q_triangles q_pagerank q_ppr q_hits q_label_prop q_bfs q_khop
      q_link_predict q_degree_dist q_assortativity q_edge_jaccard
    """,
    # statistics: experiment stats, distribution tests, sketches
    "Stats": """
      q_ks_test q_mode q_welch_ttest q_cuped q_benford q_anova
      q_weighted_median q_histogram q_corr_regr q_outlier_iqr q_mad
      q_chisq q_gini q_auc q_calibration q_psi q_gains q_spearman
      q_moments q_mutual_info q_winsorize q_heavy_hitters q_cms_counts
      q_approx_quantile q_benford q_cdf
    """,
    # event-time analytics: windows, journeys, CDC, time series
    "Events": """
      q_tumbling_batch q_sliding_batch q_sessionize
      q_incdedup_stream_batch q_funnel q_retention q_landmark
      q_seq_match q_attribution q_transitions q_cdc_upsert q_scd2
      q_snapshot_diff q_resample q_rolling_range q_rolling_zscore
      q_ewma q_pct_change q_twap q_lag_features q_merge_intervals
      q_max_concurrency q_cusum q_acf q_seasonal_dow
      q_daily_percentiles q_freshness q_burstiness
    """,
    # multimodal binary columns: image/audio decode, perceptual hashing
    "Multimodal": """
      q_image_decode q_image_dhash q_image_neardup q_audio_decode
      q_frame_sample q_multimodal_meta
    """,
}
FAMILY_DOC = {
    "Relational": "Relational core: scans/sources, projections, filters, "
                  "joins (broadcast/SMJ/SHJ/as-of/range), aggregates, "
                  "windows, set ops, scalar functions, layout and "
                  "profiling — the reference's own operator surface "
                  "(SURVEY.md §2.1–2.8) plus its scale "
                  "hardening.",
    "Text": "Text analytics over `documents`: tokens, language id, "
            "quality scoring and the Gopher-rule battery, fingerprints, "
            "corpus statistics, n-gram/BPE models.",
    "Curation": "Corpus curation: deterministic sampling and splits, "
                "token budgets, source mixtures, decontamination, "
                "quality classification and release audits.",
    "Dedup": "Deduplication: exact, MinHash/SimHash/n-gram/embedding "
             "near-dup, clustering and keepers, prefix-filtered and "
             "sorted-neighborhood joins, fuzzy entity resolution.",
    "Retrieval": "Similarity search and retrieval: brute/LSH/IVF/PQ ANN, "
                 "k-NN graphs, BM25/TF-IDF/RRF ranking and evaluation.",
    "Graph": "Graph analytics over the k-NN edge set: triangles, "
             "PageRank/PPR/HITS, label propagation, BFS, link "
             "prediction, structure metrics.",
    "Stats": "Statistics: experiment stats (Welch/ANOVA/KS/CUPED), "
             "distribution diagnostics, score-eval tables, sketch "
             "aggregates.",
    "Events": "Event-time analytics over `events`: windowed aggregation "
              "batch twins, journeys/funnels/attribution, CDC, "
              "time-series regularization and change detection.",
    "Multimodal": "Multimodal binary columns: real image/audio decode, "
                  "perceptual hashing, frame sampling.",
}

name_to_family = {}
for fam, names in FAMILIES.items():
    for n in names.split():
        if n in name_to_family and name_to_family[n] != fam:
            sys.exit(f"{n} assigned to both {name_to_family[n]} and {fam}")
        name_to_family[n] = fam

lines = open(SRC).read().split("\n")

ENTRY_RE = re.compile(r'^    "(q_[a-z0-9_]+)" ->')


def find_line(pred, start=0):
    for i in range(start, len(lines)):
        if pred(lines[i]):
            return i
    sys.exit("marker not found")


def chunks_of(body_start, body_end):
    """Split map-literal body lines into (name, chunk_lines) preserving
    each entry's preceding comment block verbatim."""
    starts = [i for i in range(body_start, body_end)
              if ENTRY_RE.match(lines[i])]
    adj = []
    for s in starts:
        j = s
        while j - 1 >= body_start and (
                lines[j - 1].lstrip().startswith("//") or
                not lines[j - 1].strip()):
            j -= 1
        adj.append(j)
    out = []
    for k, s in enumerate(starts):
        lo = adj[k]
        hi = adj[k + 1] if k + 1 < len(starts) else body_end
        chunk = lines[lo:hi]
        while chunk and not chunk[0].strip():
            chunk = chunk[1:]
        while chunk and not chunk[-1].strip():
            chunk = chunk[:-1]
        # normalize: every chunk ends with a trailing comma (scala 2.13
        # accepts a trailing comma before the closing paren)
        if not chunk[-1].rstrip().endswith(","):
            chunk[-1] = chunk[-1].rstrip() + ","
        out.append((ENTRY_RE.match(lines[s]).group(1), chunk))
    return out


# ---- locate the three regions ----------------------------------------
obj_start = find_line(lambda l: l == "object SparkEntry {")
q_def = find_line(lambda l: l.startswith("  def queries: Map["))
q_close = find_line(lambda l: l == "  )", q_def)
o_def = find_line(lambda l: l.startswith("  def oracleSql: Map["), q_close)
o_close = find_line(lambda l: l == "  )", o_def)

header_doc = lines[:obj_start]            # package/imports/scaladoc
ctx_body = lines[obj_start + 1:q_def]     # fixtures, helpers, qFlagship
q_chunks = chunks_of(q_def + 1, q_close)
o_chunks = chunks_of(o_def + 1, o_close)

q_names = [n for n, _ in q_chunks]
missing = [n for n in q_names if n not in name_to_family]
if missing:
    sys.exit(f"unassigned queries: {missing}")
extra = [n for n in name_to_family if n not in q_names]
if extra:
    sys.exit(f"classified but not declared: {extra}")
o_only = [n for n, _ in o_chunks if n not in q_names]
if o_only:
    sys.exit(f"oracle without query: {o_only}")

IMPORTS = """import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Baskets, Bpe, Cdc, Classifier, CorpusStats, CountMin, Curation, Dedup, Funnel, Geo, Graphs, HeavyHitters, Intervals, Ivf, Packing, Pq, PrefixMatch, Profiling, Retrieval, Sampling, Similarity, Skew, Stats, TemplateFilters, Timeseries}
import graft.functions.{DedupExpr, TextAnalytics}
import graft.EntryContext._"""

os.makedirs(OUT_DIR, exist_ok=True)

# ---- EntryContext: shared fixtures/helpers ---------------------------
ctx = []
skip = False
for i, l in enumerate(ctx_body):
    # drop the `def entry` 3-liner (stays in SparkEntry, calling qFlagship)
    if l.startswith("  /** Flagship query on sf=0.001"):
        skip = True
    if skip:
        if l.startswith("    qFlagship(spark"):
            skip = False
        continue
    ctx.append(l)
ctx_text = "\n".join(ctx)
ctx_text = ctx_text.replace("\n  private val ", "\n  private[graft] val ")
ctx_text = ctx_text.replace("\n  private def ", "\n  private[graft] def ")
with open(f"{OUT_DIR}/EntryContext.scala", "w") as f:
    f.write("package graft\n\n" + IMPORTS.replace(
        "\nimport graft.EntryContext._", "") + "\n\n")
    f.write("""/** Shared state of the declared query surface: the longest-prefix type
  * map, language profiles, process-lifetime fixtures (TSV/NDJSON dumps,
  * Z-ordered and bucketed layouts, PNG/WAV corpora, shared
  * shingle/pair/embedding checkpoints) and the flagship query. Every
  * per-family `*Queries` object imports this; SparkEntry merges their
  * declarations into the driver-facing registry.
  */
private[graft] object EntryContext {
""")
    f.write(ctx_text)
    f.write("\n}\n")

# ---- per-family files -------------------------------------------------
for fam in FAMILIES:
    qs = [c for n, c in q_chunks if name_to_family[n] == fam]
    os_ = [c for n, c in o_chunks if name_to_family[n] == fam]
    with open(f"{OUT_DIR}/{fam}Queries.scala", "w") as f:
        f.write("package graft\n\n")
        f.write(IMPORTS + "\n\n")
        f.write(f"/** {FAMILY_DOC[fam]}\n  *\n"
                "  * Declarations (query lambda + DuckDB oracle SQL) are\n"
                "  * merged into [[SparkEntry]]'s registry; see SURVEY.md\n"
                "  * §2/§8 and docs/QUERIES.md for the full index.\n"
                "  */\n")
        f.write(f"private[graft] object {fam}Queries {{\n\n")
        f.write("  val queries: Seq[(String, (SparkSession, String) => "
                "DataFrame)] = Seq(\n")
        f.write("\n\n".join("\n".join(c) for c in qs))
        f.write("\n  )\n\n")
        f.write("  val oracles: Seq[(String, String)] = Seq(\n")
        f.write("\n\n".join("\n".join(c) for c in os_))
        f.write("\n  )\n}\n")

# ---- new SparkEntry ---------------------------------------------------
fams = list(FAMILIES)
with open(SRC, "w") as f:
    f.write("\n".join(header_doc[:2]) + "\n")
    f.write("""import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — declared query surface (SURVEY.md §2) with DuckDB
  * oracles. Every query: deterministic ORDER BY on a key, derived integer
  * columns cast to BIGINT on both sides, float aggregates rounded, no
  * structs/maps/arrays in the output (SURVEY.md §5 rule 1).
  *
  * Declarations live in per-family objects (graft/entry/*Queries.scala —
  * relational/text/curation/dedup/retrieval/graph/stats/events/
  * multimodal) sharing fixtures via [[EntryContext]]; this object merges
  * them into the single registry the driver, Verify, Bench and the spec
  * suites consume. Merging asserts name uniqueness and that every oracle
  * has a declared query, so a family edit cannot silently shadow or
  * orphan a declaration.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EntryContext.qFlagship(spark, "/root/testdata/sf0.001")

  private[graft] def langProfiles: Map[String, Seq[String]] =
    EntryContext.langProfiles

  /** See [[EntryContext.releaseDeadCheckpoints]]. */
  def releaseDeadCheckpoints(s: SparkSession): Unit =
    EntryContext.releaseDeadCheckpoints(s)

  private val families: Seq[(Seq[(String, (SparkSession, String) => DataFrame)], Seq[(String, String)])] = Seq(
""")
    f.write(",\n".join(
        f"    ({fam}Queries.queries, {fam}Queries.oracles)" for fam in fams))
    f.write("""
  )

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = families.flatMap(_._1)
    val m = all.toMap
    require(m.size == all.size,
      s"duplicate query name across families: ${
        all.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }.mkString(", ")}")
    m
  }

  lazy val oracleSql: Map[String, String] = {
    val all = families.flatMap(_._2)
    val m = all.toMap
    require(m.size == all.size,
      s"duplicate oracle name across families: ${
        all.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }.mkString(", ")}")
    val orphans = m.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracle without declared query: $orphans")
    m
  }
}
""")

print(f"queries: {len(q_chunks)}, oracles: {len(o_chunks)}, "
      f"families: {len(FAMILIES)}")
for fam in FAMILIES:
    nq = sum(1 for n, _ in q_chunks if name_to_family[n] == fam)
    no = sum(1 for n, _ in o_chunks if name_to_family[n] == fam)
    print(f"  {fam}: {nq} queries, {no} oracles")
