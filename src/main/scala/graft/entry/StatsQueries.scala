package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{AsOfJoin, Baskets, Bpe, Cdc, Classifier, CorpusStats, CountMin, Curation, Dedup, Funnel, Geo, Graphs, HeavyHitters, Intervals, Ivf, Packing, Par, Pq, PrefixMatch, Profiling, Retrieval, Sampling, Similarity, Skew, Stats, TemplateFilters, Timeseries}
import graft.functions.{DedupExpr, TextAnalytics}
import graft.EntryContext._

/** Statistics: experiment stats (Welch/ANOVA/KS/CUPED), distribution diagnostics, score-eval tables, sketch aggregates.
  *
  * Declarations (query lambda + DuckDB oracle SQL) are
  * merged into [[SparkEntry]]'s registry; see SURVEY.md
  * §2/§8 and docs/QUERIES.md for the full index.
  */
private[graft] object StatsQueries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // Two-sample KS distribution test (click vs error cents): per-value
    // count dimension → one sanctioned global cumsum window → max CDF gap
    "q_ks_test" -> ((s, dir) =>
      Stats.ksTest(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"), "click", "error")),

    // Exact modal weekday per event type (count desc, value asc tie-break)
    "q_mode" -> ((s, dir) =>
      Stats.mode(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(col("g").as("event_type"), col("mode_value"), col("n_occ"))
        .orderBy(col("event_type"))),

    // Pairwise Welch t-tests across event types over integer cents:
    // corpus → one exact (n, Σc, Σc²) row per group, then pure double
    // arithmetic on the bounded dim×dim pair table — engine-exact
    "q_welch_ttest" -> ((s, dir) =>
      Stats.welchTTest(Tables.events(s, dir), col("event_type"),
          expr("cast(round(value * 100) as bigint)"))
        .orderBy(col("g_a"), col("g_b"))),

    // CUPED variance reduction: per-user pre/post cents split at the
    // global time midpoint (one-row bounds aggregate, broadcast), arms
    // from user parity, adjusted mean/variance as identities on exact
    // per-arm sums — no per-row adjusted metric ever materializes
    "q_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        expr("cast(round(coalesce(value, 0) * 100) as bigint)").as("cents"))
      val bounds = ev.agg(
        floor((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid"))
      val units = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
        .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
      Stats.cuped(units, col("arm"), col("x"), col("y"))
        .withColumnRenamed("g", "arm")
        .orderBy(col("arm"))
    }),

    // Benford leading-digit audit of the value column (fraud/synthetic-
    // data signal): digit from the integer's decimal string, one 9-row
    // aggregate
    "q_benford" -> ((s, dir) =>
      Stats.benford(Tables.events(s, dir),
          expr("cast(round(value * 100) as bigint)"))
        .orderBy(col("digit"))),

    // One-way ANOVA F across event types on integer cents — the
    // k-sample experiment gate, exact (n, Σc, Σc²) reduction per group
    "q_anova" -> ((s, dir) =>
      Stats.anovaF(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"))),

    // Exact weighted median (doc length weighted by token count) per
    // source: one (group,value) reduce + one group-keyed window over the
    // collapsed dimension — integer-exact end to end
    "q_weighted_median" -> ((s, dir) =>
      Stats.weightedMedian(
          Tables.documents(s, dir).select(col("source"), col("n_chars"),
            TextAnalytics.tokenCount(col("text")).cast("long").as("_w")),
          col("source"), col("n_chars"), col("_w"))
        .select(col("g").as("source"), col("weighted_median"),
          col("total_weight"))
        .orderBy(col("source"))),

    // Heavy hitters via a mergeable Misra-Gries summary (bounded k-entry
    // state per partial aggregate — the frequent-tokens tool when exact
    // groupBy would shuffle billions of distinct keys). k=64 exceeds this
    // corpus's vocabulary, so the summary is provably exact and the
    // DuckDB exact GROUP BY oracle hash-matches; the lossy regime's
    // error bounds are property-tested in HeavyHittersSpec
    "q_heavy_hitters" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokens(col("text"))).as("tok"))
        .agg(HeavyHitters.misraGries(col("tok"), 64).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e._1").as("token"), col("e._2").as("est_count"))
        .orderBy(col("est_count").desc, col("token"))),

    // Mergeable-sketch quantiles (GK summaries): the percentile surface
    // for cardinalities where exact sort-based percentile is the wrong
    // plan (no oracle: sketch merge order is engine-specific; the exact
    // variant q_percentile IS hash-verified against DuckDB). Flattened to
    // scalar columns — the driver's rows-only path sorts the dump with
    // pandas, which cannot hash an array<double> cell (r03 err).
    "q_approx_quantile" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
            array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
          .as("q"))
        .select(col("l_returnflag"), col("q")(0).as("p25"),
          col("q")(1).as("p50"), col("q")(2).as("p75"))
        .orderBy(col("l_returnflag"))),

    // Per-source ROC-AUC of the quality heuristic predicting lang='en' —
    // the Mann–Whitney gate run before trusting a score as a filter.
    // Integer 2U until the single final division (see Stats.auc).
    "q_auc" -> ((s, dir) =>
      Stats.auc(
          Tables.documents(s, dir).select(col("source"),
            TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")).as("q"),
            (col("lang") === "en").as("l")),
          col("source"), col("q"), col("l"))
        .select(col("group").as("source"), col("n_pos"), col("n_neg"),
          col("auc"))
        .orderBy(col("source"))),

    // Reliability table of the quality score against lang='en' — the
    // calibration check run before using a score as a sampling
    // probability. Integer score units until the final divisions.
    "q_calibration" -> ((s, dir) =>
      Stats.calibration(
          Tables.documents(s, dir).select(
            TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")).as("q"),
            (col("lang") === "en").as("l")),
          col("q"), col("l"), bins = 10)
        .orderBy(col("bin"))),

    // Population Stability Index between English and non-English docs'
    // quality-score distributions — the drift alarm between a reference
    // and a current window, Laplace-smoothed identically on both sides.
    "q_psi" -> ((s, dir) =>
      Stats.psi(
          Tables.documents(s, dir).select(
            least(floor(TextAnalytics.qualityScore(col("text"),
              Seq("the", "a", "of", "and")) * 10), lit(9)).as("b"),
            (col("lang") === "en").as("base")),
          col("b"), col("base"), bins = 10)),

    // Equi-width histogram: 2-value min/max aggregate broadcast back,
    // then a map-only bucket expression — the bin formula is the same
    // IEEE arithmetic on both engines, so buckets match exactly
    "q_histogram" -> ((s, dir) =>
      Stats.histogram(Tables.lineitem(s, dir), col("l_extendedprice"), 20)
        .orderBy(col("bucket"))),

    // Bivariate statistics per group: Pearson correlation, sample
    // covariance and OLS slope/intercept (regr_*) in one aggregate pass
    "q_corr_regr" -> ((s, dir) =>
      Tables.lineitem(s, dir).groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),

    // Tukey-fence outliers per event type over the heavy-tailed value
    // column: exact per-group quartiles (bounded, broadcast back) fence
    // a map-side filter — the robust-statistics curation primitive
    "q_outlier_iqr" -> ((s, dir) =>
      Stats.iqrOutliers(Tables.events(s, dir), "event_type", col("value"))
        .select(col("group").as("event_type"), col("n_outliers"),
          round(col("out_min"), 4).as("out_min"),
          round(col("out_max"), 4).as("out_max"))
        .orderBy(col("event_type"))),

    // Median absolute deviation per group: the robust scale estimate —
    // two exact-percentile passes, the median table broadcast back
    "q_mad" -> ((s, dir) =>
      Stats.mad(Tables.events(s, dir), "event_type", col("value"))
        .select(col("group").as("event_type"),
          round(col("median"), 4).as("median"),
          round(col("mad"), 4).as("mad"), col("n"))
        .orderBy(col("event_type"))),

    // Chi-square independence of event type × weekday (weekday from
    // pure epoch-day arithmetic — 1970-01-01 + 4 ≡ Thursday; no
    // calendar). The statistic is computed on the contingency dimension
    // via Σ o²/e − n, so unobserved cells need never be generated
    "q_chisq" -> ((s, dir) =>
      Stats.chiSquare(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(round(col("chi2"), 6).as("chi2"), col("dof"), col("n"))),

    // Key-skew profile: Gini coefficient of the per-supplier lineitem
    // mass — integer rank arithmetic up to the two final divisions
    "q_gini" -> ((s, dir) =>
      Stats.giniOfCounts(Tables.lineitem(s, dir), col("l_suppkey"))
        .select(round(col("gini"), 6).as("gini"), col("n_keys"), col("total"))),

    // Mutual information of event type × weekday — chi-square's
    // feature-relevance sibling on the same contingency dimension
    "q_mutual_info" -> ((s, dir) =>
      Stats.mutualInfo(
          Tables.events(s, dir).select(col("event_type"),
            expr("pmod((unix_micros(ts) div 86400000000) + 4, 7)").as("weekday")),
          col("event_type"), col("weekday"))
        .select(round(col("mi"), 6).as("mi"), col("n"))),

    // Winsorization: clip each group's values at its exact p05/p95
    // fences (broadcast back, map-side least/greatest) and report the
    // mean before/after plus how many rows were clipped
    "q_winsorize" -> ((s, dir) => {
      // the exact-percentile fence buffers and the clip pass are the
      // CPU — a one-split scan runs both in a single task; spread once,
      // shared by fences AND the probe via AQE exchange reuse (identity
      // at real scale, see Par)
      val li = Par.spreadSmallScan(Tables.lineitem(s, dir), col("l_orderkey"))
        .select(col("l_returnflag"), col("l_extendedprice").as("v"))
      // ONE exact-percentile buffer per group yielding both fences
      // (two scalar percentile aggs would each hold the group's full
      // value multiset — same answer, twice the aggregation state)
      val fences = li.groupBy(col("l_returnflag"))
        .agg(percentile(col("v"), array(lit(0.05), lit(0.95))).as("_f"))
        .select(col("l_returnflag"), col("_f").getItem(0).as("_lo"),
          col("_f").getItem(1).as("_hi"))
      li.join(broadcast(fences), "l_returnflag")
        .select(col("l_returnflag"), col("v"),
          least(greatest(col("v"), col("_lo")), col("_hi")).as("_w"),
          (col("v") < col("_lo") || col("v") > col("_hi")).cast("long").as("_c"))
        .groupBy(col("l_returnflag"))
        .agg(round(avg(col("v")), 4).as("mean_raw"),
          round(avg(col("_w")), 4).as("mean_winsorized"),
          sum(col("_c")).as("n_clipped"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Count-Min point-frequency estimates for every distinct token: the
    // d×w sketch aggregates with map-side combine (state is d·w longs,
    // never the items) and is probed by the codegen twin of the
    // aggregator's bucketing. CMS only over-counts on collisions; with
    // this corpus's vocabulary no token collides in all d rows (a
    // deterministic property of the fixed xxhash64 seeds, asserted in
    // CountMinSpec), so the exact GROUP BY oracle hash-matches — the
    // same exact-regime argument as q_heavy_hitters; the lossy regime
    // is property-tested
    "q_cms_counts" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(TextAnalytics.tokens(col("text"))).as("tok"))
      val sk = toks.agg(CountMin.countMin(col("tok"), 4, 512).as("sk"))
      toks.distinct().crossJoin(broadcast(sk))
        .select(col("tok"),
          CountMin.estimateCol(col("sk"), col("tok"), 4, 512).as("est_count"))
        .orderBy(col("tok"))
    }),

    // Spearman rank correlation per event type between value cents and
    // time-of-day micros: textbook average-rank ties (exact halves, so
    // the ranks are engine-bitwise), Pearson corr over ranks rounded
    "q_spearman" -> ((s, dir) =>
      Stats.spearman(Tables.events(s, dir).where(col("value").isNotNull),
          col("event_type"),
          expr("cast(round(value * 100) as bigint)"),
          expr("pmod(unix_micros(ts), 86400000000)"))
        .select(col("g").as("event_type"), col("n"), col("rho"))
        .orderBy(col("event_type"))),

    // Cumulative-gains table by quality-score decile (lift-curve
    // companion to q_auc/q_calibration): deciles via the exact
    // two-level ntile (never a corpus-wide single-partition window),
    // label = lang='en', cumulative positives over the 10-row decile
    // dimension — integer-exact until the final gain fraction
    "q_gains" -> ((s, dir) => {
      val scored = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        TextAnalytics.qualityScore(col("text"), Seq("the", "a", "of", "and"))
          .as("quality"))
      val ranked = Packing.globalOrderIndex(scored,
        (-floor(col("quality") * 10)).cast("int"),
        Seq(col("quality").desc, col("doc_id").asc))
      val n = ranked.agg(count(lit(1)).as("_n"))
      val agg = ranked.crossJoin(broadcast(n))
        .select(Packing.ntileFromRank(col("rank"), col("_n"), 10).as("decile"),
          (col("lang") === "en").cast("long").as("_pos"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("_pos")).as("n_pos"))
      val wCum = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wTot = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      agg
        .select(col("decile"), col("n_docs"), col("n_pos"),
          sum(col("n_pos")).over(wCum).as("cum_pos"),
          sum(col("n_pos")).over(wTot).as("_tot"))
        .select(col("decile"), col("n_docs"), col("n_pos"), col("cum_pos"),
          round(col("cum_pos").cast("double") / col("_tot"), 6).as("gain"))
        .orderBy(col("decile"))
    }),

    // Per-type empirical CDF table over the bounded 10-dollar-bucket
    // dimension: one dimension reduce, one sanctioned group-partitioned
    // cumulative window, exact integers until the final fraction
    "q_cdf" -> ((s, dir) => {
      val dim = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(round(value * 100) as bigint) div 1000").as("bucket"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dim
        .withColumn("cum_n", sum(col("n")).over(wCum))
        .withColumn("_tot",
          sum(col("n")).over(Window.partitionBy(col("event_type"))))
        .select(col("event_type"), col("bucket"), col("n"), col("cum_n"),
          round(col("cum_n") / col("_tot"), 6).as("cdf"))
        .orderBy(col("event_type"), col("bucket"))
    }),

    // Skewness / excess kurtosis per group from EXACT integer central-
    // moment sums (Σc..Σc⁴ in decimal(38,0)/HUGEINT): the builtin
    // skewness/kurtosis aggregates differ across engines (population vs
    // sample, one-pass update order); moments from exact sums with one
    // shared double expression tree are engine-bitwise until the final
    // rounding
    "q_moments" -> ((s, dir) => {
      val sums = Tables.events(s, dir).where(col("value").isNotNull)
        .select(col("event_type"),
          expr("cast(cast(round(value * 100) as bigint) as decimal(38,0))")
            .as("c"))
        .withColumn("c2", col("c") * col("c"))
        .withColumn("c3", col("c2") * col("c"))
        .withColumn("c4", col("c2") * col("c2"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s1"),
          sum(col("c2")).as("s2"), sum(col("c3")).as("s3"),
          sum(col("c4")).as("s4"))
      val d1 = col("s1").cast("double") / col("n")
      val d2 = col("s2").cast("double") / col("n")
      val d3 = col("s3").cast("double") / col("n")
      val d4 = col("s4").cast("double") / col("n")
      val m2 = d2 - d1 * d1
      val m3 = d3 - lit(3.0) * d1 * d2 + lit(2.0) * d1 * d1 * d1
      val m4 = d4 - lit(4.0) * d1 * d3 + lit(6.0) * d1 * d1 * d2 -
        lit(3.0) * d1 * d1 * d1 * d1
      sums.select(col("event_type"), col("n"),
          round(d1 / 100.0, 4).as("mean_val"),
          round(m2, 4).as("var_pop"),
          round(m3 / pow(m2, lit(1.5)), 6).as("skewness"),
          round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis_ex"))
        .orderBy(col("event_type"))
    }),

    // Poisson-bootstrap CI on per-type mean cents (Chamandy et al.
    // 2012): 100 deterministic md5-seeded Poisson(1) weights per row,
    // map-only ×R expansion, one (type, replicate)-keyed shuffle, exact
    // percentile over the bounded replicate-mean table
    "q_bootstrap_ci" -> ((s, dir) =>
      Stats.poissonBootstrap(
          Tables.events(s, dir).where(col("value").isNotNull),
          col("event_type"), col("event_id"),
          expr("cast(round(value * 100) as bigint)"), replicates = 100)
        .withColumnRenamed("g", "event_type")
        .orderBy(col("event_type"))),

    // Delta-method ratio metric (Deng et al. 2018): per-user cents over
    // event count, arms by user parity; exact decimal unit moments,
    // double arithmetic on the 2-row arm table
    "q_ratio_metric" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(sum(expr("cast(round(coalesce(value, 0) * 100) as bigint)"))
            .as("y"),
          count(lit(1)).as("d"))
        .select((col("user_id") % 2).as("arm"), col("y"), col("d"))
      Stats.ratioMetric(units, col("arm"), col("y"), col("d"))
        .withColumnRenamed("g", "arm")
        .orderBy(col("arm"))
    }),

    // Per-user pairwise event-type preferences: exact per-(user, type)
    // cents sums compared within each user, larger side wins, ties
    // dropped — the reduction that feeds the Bradley-Terry fit. One
    // corpus shuffle; the self-join fans out C(5,2) rows per user and
    // collapses into the 10-row pair dimension.
    "q_pairwise_prefs" -> ((s, dir) =>
      Stats.pairwisePrefs(Tables.events(s, dir),
          col("user_id"), col("event_type"),
          expr("cast(round(coalesce(value, 0) * 100) as bigint)"))
        .orderBy(col("item_a"), col("item_b"))),

    // Bradley-Terry preference strengths (Hunter 2004 MM) over the
    // pairwise reduction — the RLHF preference-model fit as a bounded
    // driver solve (items = 5 event types; require-capped, the
    // PQ-codebook precedent). Deterministic fixed-sweep MM -> rows-only
    // with pinned hashes at both SFs; StatsSpec re-derives the fit in
    // plain Scala and checks the 2-item closed form.
    "q_bradley_terry" -> ((s, dir) =>
      Stats.bradleyTerry(
          Stats.pairwisePrefs(Tables.events(s, dir),
            col("user_id"), col("event_type"),
            expr("cast(round(coalesce(value, 0) * 100) as bigint)")),
          col("item_a"), col("item_b"), col("wins_a"), col("wins_b"))
        .orderBy(col("item"))),

    // Always-valid sequential test (Johari et al., "Peeking at A/B
    // Tests"): daily looks at the arm mean-cents difference, mSPRT
    // normal-mixture p tightened by a running min — both unpartitioned
    // windows run over the bounded day dimension, never corpus rows
    "q_sequential_test" -> ((s, dir) =>
      Stats.msprt(
          Tables.events(s, dir).where(col("value").isNotNull)
            .select((col("user_id") % 2).as("arm"),
              expr("unix_micros(ts) div 86400000000").as("day_num"),
              expr("cast(round(value * 100) as bigint)").as("cents")),
          col("arm"), col("day_num"), col("cents"), tauSq = 10000.0)
        .withColumnRenamed("day", "day_num")
        .orderBy(col("day_num"))),

    // Benjamini–Hochberg FDR over the pairwise Welch family: p from
    // the ROUNDED t via the engine-portable A-S erf polynomial (both
    // engines adjust identical 8-dp doubles), rank + reverse running
    // min over the bounded pair table
    "q_fdr_adjust" -> ((s, dir) => {
      val welch = Stats.welchTTest(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"))
      Stats.bhAdjust(
          welch.select(col("g_a"), col("g_b"),
            Stats.twoSidedNormP(col("t_stat")).as("p_raw")),
          col("p_raw"), Seq(col("g_a"), col("g_b")))
        .withColumn("significant", col("p_adj") < 0.05)
        .select(col("g_a"), col("g_b"), col("p_raw"), col("rank"),
          col("p_adj"), col("significant"))
        .orderBy(col("g_a"), col("g_b"))
    }),

    // Sample-ratio-mismatch guardrail on the parity assignment: 1-dof
    // chi-square vs the even split, p = 2(1−Φ(√χ²)); one no-join
    // global aggregate over users
    "q_srm" -> ((s, dir) =>
      Stats.srmCheck(
        Tables.events(s, dir).groupBy(col("user_id")).agg(count(lit(1)).as("_n"))
          .select((col("user_id") % 2).as("arm")),
        col("arm"))),

    // Difference-in-differences: per-user pre/post cents at the global
    // time midpoint (the q_cuped unit construction), arms by parity,
    // per-unit change d = post − pre netted arm-vs-arm — exact decimal
    // change moments folded into ONE global aggregate row, no join
    "q_did" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"), unix_micros(col("ts")).as("us"),
        expr("cast(round(coalesce(value, 0) * 100) as bigint)").as("cents"))
      val bounds = ev.agg(
        floor((min(col("us")) + max(col("us"))) / 2).cast("long").as("mid"))
      val units = ev.crossJoin(broadcast(bounds))
        .groupBy(col("user_id"))
        .agg(sum(when(col("us") < col("mid"), col("cents")).otherwise(0L)).as("x"),
          sum(when(col("us") >= col("mid"), col("cents")).otherwise(0L)).as("y"))
        .select((col("user_id") % 2).as("arm"), col("x"), col("y"))
      Stats.diffInDiff(units, col("arm"), col("x"), col("y"))
    }),

    // the Kaplan–Meier pipeline expressed purely in spark.sql — same
    // lifetime dimension, risk-set and guarded log-survival windows as
    // q_survival (whose oracle it shares verbatim): the SQL surface
    // tracks the DataFrame surface on window-heavy shapes too
    "q_survival_sql" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("v_events_survival_sql")
      s.sql(
        """WITH ev AS (
          |  SELECT user_id AS u, unix_micros(ts) div 86400000000 AS d
          |  FROM v_events_survival_sql
          |  WHERE value IS NOT NULL
          |    AND cast(round(value * 100) as bigint) >= 8000),
          |us AS (SELECT u, min(d) AS f, max(d) AS l FROM ev GROUP BY u),
          |h AS (SELECT max(d) AS hmax FROM ev),
          |lt AS (SELECT l - f AS lifetime, (l <= hmax - 7) AS churned
          |       FROM us CROSS JOIN h),
          |dim AS (SELECT lifetime, count(*) AS n,
          |        sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churn
          |        FROM lt GROUP BY lifetime),
          |r AS (SELECT lifetime, n_churn,
          |        sum(n) OVER (ORDER BY lifetime DESC
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |          AS n_risk
          |      FROM dim),
          |t AS (SELECT lifetime, n_churn, n_risk,
          |        CASE WHEN n_churn >= n_risk THEN CAST(0.0 AS DOUBLE)
          |             ELSE ln(1.0 - CAST(n_churn AS DOUBLE) / n_risk)
          |        END AS term,
          |        CASE WHEN n_churn >= n_risk THEN 1 ELSE 0 END AS wipe
          |      FROM r)
          |SELECT lifetime, n_risk, n_churn,
          |  CASE WHEN max(wipe) OVER (ORDER BY lifetime
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
          |       THEN CAST(0.0 AS DOUBLE)
          |       ELSE round(exp(sum(term) OVER (ORDER BY lifetime
          |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
          |  END AS survival
          |FROM t ORDER BY lifetime""".stripMargin)
    }),

    // Mann–Whitney U rank-sum (click vs error cents): value-dimension
    // reduction, one sanctioned below-count window, exact integer
    // 2·R_A / tie sums, tie-corrected normal z + A-S p
    "q_mann_whitney" -> ((s, dir) =>
      Stats.mannWhitney(Tables.events(s, dir), col("event_type"),
        expr("cast(round(value * 100) as bigint)"), "click", "error")),

    // Two-proportion z + Wilson intervals: unit = user, conversion =
    // any HIGH-VALUE (≥$90) purchase, arms by user parity; 1×1
    // broadcast join
    "q_proportion_test" -> ((s, dir) => {
      val units = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
            expr("cast(round(value * 100) as bigint)") >= 9000, 1L)
          .otherwise(0L)).as("_conv"))
        .select((col("user_id") % 2).as("arm"), (col("_conv") === 1L).as("converted"))
      Stats.proportionTest(units, col("arm"), col("converted"))
    }),

    // Kaplan–Meier retention curve over per-user HIGH-VALUE lifetimes
    // (first to last ≥$80 event; 7-day censor margin): one user-keyed
    // aggregate, then risk-set and log-survival windows over the
    // bounded lifetime dimension
    "q_survival" -> ((s, dir) =>
      Stats.kaplanMeier(
          Tables.events(s, dir).where(col("value").isNotNull &&
            expr("cast(round(value * 100) as bigint)") >= 8000),
          col("user_id"), expr("unix_micros(ts) div 86400000000"),
          censorMarginDays = 7)
        .orderBy(col("lifetime"))),
  )

  // q_survival_sql computes the identical curve to q_survival, so it
  // shares that oracle verbatim (the q_decontaminate_sql pattern).
  val oracles: Seq[(String, String)] = {
    val base = declaredOracles
    base ++ Seq("q_survival_sql" -> base.toMap.apply("q_survival"))
  }

  private def declaredOracles: Seq[(String, String)] = Seq(
    // identical per-row md5 seed → odd-multiplier 48-bit stream →
    // Poisson inverse-CDF draw (shared literal thresholds), exact
    // HUGEINT weighted sums, one double division per replicate,
    // quantile_cont over the same replicate means
    "q_bootstrap_ci" ->
      """WITH r0 AS (SELECT event_type,
        |        ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))
        |          ::BIGINT AS h,
        |        CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
        |      FROM events WHERE value IS NOT NULL),
        |rep AS (SELECT event_type, h, c, t.range AS r
        |        FROM r0 CROSS JOIN range(0, 100) t),
        |u AS (SELECT event_type, r, c,
        |        ((h * (2 * ((r * 1597334677) % 16384) + 1))
        |          % 281474976710656 + 1)
        |          / 281474976710656.0 AS u
        |      FROM rep),
        |w AS (SELECT event_type, r, c,
        |        CAST(CASE WHEN u <= 0.36787944117144233 THEN 0
        |             WHEN u <= 0.7357588823428847 THEN 1
        |             WHEN u <= 0.9196986029286058 THEN 2
        |             WHEN u <= 0.9810118431238463 THEN 3
        |             WHEN u <= 0.9963401531726563 THEN 4
        |             WHEN u <= 0.9994058151824183 THEN 5
        |             WHEN u <= 0.999916758850712 THEN 6
        |             ELSE 7 END AS HUGEINT) AS w
        |      FROM u),
        |pr AS (SELECT event_type, r,
        |        CAST(sum(w * c) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS m
        |      FROM w GROUP BY 1, 2 HAVING sum(w) > 0),
        |pt AS (SELECT event_type, count(*) AS n,
        |        CAST(sum(c) AS DOUBLE) / count(*) AS mean
        |      FROM r0 GROUP BY 1)
        |SELECT p.event_type, pt.n, round(pt.mean / 100.0, 4) AS mean,
        |  round(quantile_cont(m, 0.025) / 100.0, 4) AS ci_lo,
        |  round(quantile_cont(m, 0.975) / 100.0, 4) AS ci_hi,
        |  round(stddev_samp(m) / 100.0, 4) AS se_boot
        |FROM pr p JOIN pt ON p.event_type = pt.event_type
        |GROUP BY p.event_type, pt.n, pt.mean ORDER BY 1""".stripMargin,

    // same per-unit exact HUGEINT sums; ties excluded on both engines
    "q_pairwise_prefs" ->
      """WITH su AS (SELECT user_id, event_type,
        |        sum(CAST(CAST(round(coalesce(value, 0) * 100) AS BIGINT)
        |          AS HUGEINT)) AS s
        |      FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS item_a, b.event_type AS item_b,
        |  CAST(sum(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
        |  CAST(sum(CASE WHEN b.s > a.s THEN 1 ELSE 0 END) AS BIGINT) AS wins_b,
        |  count(*) AS n_units
        |FROM su a JOIN su b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |WHERE a.s <> b.s
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // same exact-integer unit moments and double expression tree
    "q_ratio_metric" ->
      """WITH un AS (SELECT user_id % 2 AS arm,
        |        CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
        |          AS HUGEINT) AS y,
        |        CAST(count(*) AS HUGEINT) AS d
        |      FROM events GROUP BY user_id),
        |s AS (SELECT arm, CAST(count(*) AS DOUBLE) AS k,
        |        CAST(sum(y) AS DOUBLE) AS sy, CAST(sum(d) AS DOUBLE) AS sd,
        |        CAST(sum(y * y) AS DOUBLE) AS syy,
        |        CAST(sum(d * d) AS DOUBLE) AS sdd,
        |        CAST(sum(y * d) AS DOUBLE) AS syd
        |      FROM un GROUP BY 1 HAVING count(*) > 1 AND sum(d) > 0),
        |e AS (SELECT arm, k, sy / sd AS r, sd / k AS dbar,
        |        (syy - sy * sy / k) / (k - 1) AS vy,
        |        (sdd - sd * sd / k) / (k - 1) AS vd,
        |        (syd - sy * sd / k) / (k - 1) AS cyd
        |      FROM s),
        |f AS (SELECT arm, k, r,
        |        sqrt(greatest(
        |          (vy - 2.0 * r * cyd + r * r * vd) / (k * dbar * dbar),
        |          0.0)) AS se
        |      FROM e)
        |SELECT arm, CAST(k AS BIGINT) AS n_units, round(r, 6) AS ratio,
        |  round(se, 6) AS se_delta,
        |  round(r - 1.959963984540054 * se, 6) AS ci_lo,
        |  round(r + 1.959963984540054 * se, 6) AS ci_hi
        |FROM f ORDER BY arm""".stripMargin,

    // identical cumulative exact sums over the day dimension and the
    // same mSPRT double tree; running-min window after both filters
    "q_sequential_test" ->
      """WITH e AS (SELECT user_id % 2 AS a,
        |        (epoch_ns(ts)//1000) // 86400000000 AS day_num,
        |        CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
        |      FROM events WHERE value IS NOT NULL),
        |d AS (SELECT day_num,
        |        sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS na,
        |        sum(CASE WHEN a = 0 THEN c ELSE 0 END) AS sa,
        |        sum(CASE WHEN a = 0 THEN c * c ELSE 0 END) AS saa,
        |        sum(CASE WHEN a <> 0 THEN 1 ELSE 0 END) AS nb,
        |        sum(CASE WHEN a <> 0 THEN c ELSE 0 END) AS sb,
        |        sum(CASE WHEN a <> 0 THEN c * c ELSE 0 END) AS sbb
        |      FROM e GROUP BY 1),
        |cm AS (SELECT day_num,
        |        CAST(sum(na) OVER w AS DOUBLE) AS cna,
        |        CAST(sum(sa) OVER w AS DOUBLE) AS csa,
        |        CAST(sum(saa) OVER w AS DOUBLE) AS csaa,
        |        CAST(sum(nb) OVER w AS DOUBLE) AS cnb,
        |        CAST(sum(sb) OVER w AS DOUBLE) AS csb,
        |        CAST(sum(sbb) OVER w AS DOUBLE) AS csbb
        |      FROM d WINDOW w AS (ORDER BY day_num
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT day_num, cna, cnb,
        |        csa / cna - csb / cnb AS delta_,
        |        ((csaa - csa * csa / cna) + (csbb - csb * csb / cnb)) /
        |          (cna + cnb - 2) AS s2
        |      FROM cm WHERE cna > 1 AND cnb > 1),
        |l AS (SELECT day_num, cna, cnb, delta_,
        |        s2 * (1.0 / cna + 1.0 / cnb) AS v
        |      FROM s WHERE s2 > 0),
        |p AS (SELECT day_num, cna, cnb, delta_,
        |        least(1.0, 1.0 / (sqrt(v / (v + 10000.0)) *
        |          exp(delta_ * delta_ * 10000.0 /
        |            (2.0 * v * (v + 10000.0))))) AS p_
        |      FROM l)
        |SELECT day_num, CAST(cna AS BIGINT) AS n_a,
        |  CAST(cnb AS BIGINT) AS n_b,
        |  round(delta_ / 100.0, 4) AS delta,
        |  round(min(p_) OVER (ORDER BY day_num
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS p_always_valid
        |FROM p ORDER BY day_num""".stripMargin,

    // p from the identical rounded t via the same A-S erf polynomial;
    // BH rank + reverse running min over the bounded pair family
    "q_fdr_adjust" ->
      """WITH c0 AS (SELECT event_type AS g,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
        |        sum(c * c) AS ss
        |      FROM c0 GROUP BY 1 HAVING count(*) > 1),
        |w AS (SELECT a.g AS g_a, b.g AS g_b,
        |  round((a.s / a.n - b.s / b.n) /
        |    sqrt((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n), 4) AS t_stat
        |  FROM g a JOIN g b ON a.g < b.g),
        |px AS (SELECT g_a, g_b, abs(t_stat) / sqrt(2.0) AS x FROM w),
        |pu AS (SELECT g_a, g_b, x, 1.0 / (1.0 + 0.3275911 * x) AS u
        |       FROM px),
        |pr AS (SELECT g_a, g_b,
        |        round(((((1.061405429 * u - 1.453152027) * u +
        |          1.421413741) * u - 0.284496736) * u + 0.254829592) * u *
        |          exp(-(x * x)), 8) AS p_raw
        |       FROM pu),
        |rk AS (SELECT g_a, g_b, p_raw,
        |        row_number() OVER (ORDER BY p_raw, g_a, g_b) AS rk,
        |        CAST(count(*) OVER () AS DOUBLE) AS m
        |       FROM pr),
        |adj AS (SELECT g_a, g_b, p_raw, rk,
        |        round(min(least(1.0, m * p_raw / rk)) OVER (
        |          ORDER BY rk DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |          AS p_adj
        |        FROM rk)
        |SELECT g_a, g_b, p_raw, CAST(rk AS BIGINT) AS rank, p_adj,
        |  p_adj < 0.05 AS significant
        |FROM adj ORDER BY g_a, g_b""".stripMargin,

    // identical unit counts, χ² tree, and the shared A-S polynomial
    "q_srm" ->
      """WITH un AS (SELECT user_id % 2 AS arm FROM events GROUP BY user_id),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        |    CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS DOUBLE) AS nb
        |  FROM un HAVING na + nb > 0),
        |c AS (SELECT na, nb,
        |        (na - nb) * (na - nb) / (na + nb) AS chi2 FROM g),
        |zt AS (SELECT na, nb, chi2, round(sqrt(chi2), 4) AS z FROM c),
        |px AS (SELECT *, abs(z) / sqrt(2.0) AS xx FROM zt),
        |pu AS (SELECT *, 1.0 / (1.0 + 0.3275911 * xx) AS uu FROM px)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(na / (na + nb), 6) AS share_a,
        |  round(chi2, 4) AS chi2,
        |  round(((((1.061405429 * uu - 1.453152027) * uu +
        |    1.421413741) * uu - 0.284496736) * uu + 0.254829592) * uu *
        |    exp(-(xx * xx)), 8) AS p_value
        |FROM pu""".stripMargin,

    // identical unit construction (the q_cuped CTE), the same
    // conditional HUGEINT change moments, Welch-SE z tree, and the
    // shared A-S polynomial on the rounded z
    "q_did" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS us,
        |    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT CAST(floor((min(us) + max(us)) / 2) AS BIGINT) AS mid
        |      FROM e),
        |u AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN us >= mid THEN cents ELSE 0 END) AS HUGEINT)
        |      - CAST(sum(CASE WHEN us < mid THEN cents ELSE 0 END)
        |          AS HUGEINT) AS d
        |  FROM e CROSS JOIN b GROUP BY user_id),
        |g AS (SELECT
        |    CAST(count(CASE WHEN arm = 0 THEN 1 END) AS DOUBLE) AS nc,
        |    CAST(sum(CASE WHEN arm = 0 THEN d ELSE 0 END) AS DOUBLE) AS sc,
        |    CAST(sum(CASE WHEN arm = 0 THEN d * d ELSE 0 END) AS DOUBLE)
        |      AS scc,
        |    CAST(count(CASE WHEN arm <> 0 THEN 1 END) AS DOUBLE) AS nt,
        |    CAST(sum(CASE WHEN arm <> 0 THEN d ELSE 0 END) AS DOUBLE) AS st,
        |    CAST(sum(CASE WHEN arm <> 0 THEN d * d ELSE 0 END) AS DOUBLE)
        |      AS stt
        |  FROM u HAVING nc > 1 AND nt > 1),
        |f AS (SELECT nc, nt, sc / nc AS mc, st / nt AS mt,
        |        (scc - sc * sc / nc) / (nc - 1) AS vc,
        |        (stt - st * st / nt) / (nt - 1) AS vt
        |      FROM g),
        |zt AS (SELECT nc, nt, mc, mt, st_mt_mc, se,
        |        round(st_mt_mc / se, 4) AS z
        |       FROM (SELECT nc, nt, mc, mt, mt - mc AS st_mt_mc,
        |               sqrt(vt / nt + vc / nc) AS se, vc, vt
        |             FROM f WHERE vc + vt > 0)),
        |px AS (SELECT *, abs(z) / sqrt(2.0) AS xx FROM zt),
        |pu AS (SELECT *, 1.0 / (1.0 + 0.3275911 * xx) AS uu FROM px)
        |SELECT CAST(nc AS BIGINT) AS n_control, CAST(nt AS BIGINT) AS n_treat,
        |  round(mc / 100.0, 4) AS mean_diff_control,
        |  round(mt / 100.0, 4) AS mean_diff_treat,
        |  round(st_mt_mc / 100.0, 4) AS did,
        |  round(se / 100.0, 4) AS se,
        |  z,
        |  round(((((1.061405429 * uu - 1.453152027) * uu +
        |    1.421413741) * uu - 0.284496736) * uu + 0.254829592) * uu *
        |    exp(-(xx * xx)), 8) AS p_value
        |FROM pu""".stripMargin,

    // identical value-dimension rank reduction (integer 2·R_A and tie
    // sums in HUGEINT), the same z tree, and the shared A-S polynomial
    "q_mann_whitney" ->
      """WITH v AS (SELECT event_type AS g,
        |        CAST(round(value * 100) AS BIGINT) AS v
        |      FROM events WHERE value IS NOT NULL
        |        AND event_type IN ('click', 'error')),
        |dim AS (SELECT v, count(*) AS ct,
        |        sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS ca
        |      FROM v GROUP BY 1),
        |c AS (SELECT v, ct, ca,
        |        sum(ct) OVER (ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ct
        |          AS below
        |      FROM dim),
        |a AS (SELECT CAST(sum(ca) AS DOUBLE) AS na,
        |        CAST(sum(ct - ca) AS DOUBLE) AS nb,
        |        CAST(sum(CAST(ca AS HUGEINT) *
        |          (CAST(below AS HUGEINT) * 2 + ct + 1)) AS DOUBLE) AS r2a,
        |        CAST(sum(CAST(ct AS HUGEINT) * ct * ct - ct) AS DOUBLE)
        |          AS ties
        |      FROM c HAVING sum(ca) > 0 AND sum(ct - ca) > 0),
        |f AS (SELECT na, nb,
        |        r2a / 2 - na * (na + 1) / 2 AS u,
        |        na * nb / 2 AS mu,
        |        na * nb / 12 * ((na + nb + 1) -
        |          ties / ((na + nb) * (na + nb - 1))) AS s2
        |      FROM a),
        |zt AS (SELECT na, nb, u,
        |        round((u - mu) / sqrt(s2), 4) AS z
        |      FROM f WHERE s2 > 0),
        |px AS (SELECT na, nb, u, z, abs(z) / sqrt(2.0) AS x FROM zt),
        |pu AS (SELECT na, nb, u, z, x,
        |        1.0 / (1.0 + 0.3275911 * x) AS uu FROM px)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  u AS u_stat, z,
        |  round(((((1.061405429 * uu - 1.453152027) * uu +
        |    1.421413741) * uu - 0.284496736) * uu + 0.254829592) * uu *
        |    exp(-(x * x)), 8) AS p_value
        |FROM pu""".stripMargin,

    // identical unit conversion aggregate (both arms in one global
    // row), pooled z, Wilson trees, and the shared A-S polynomial
    "q_proportion_test" ->
      """WITH un AS (SELECT user_id % 2 AS arm,
        |        max(CASE WHEN event_type = 'purchase'
        |              AND CAST(round(value * 100) AS BIGINT) >= 9000
        |            THEN 1 ELSE 0 END) AS conv
        |      FROM events GROUP BY user_id),
        |ab AS (SELECT
        |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |          AS n_a,
        |        CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS DOUBLE)
        |          AS x_a,
        |        CAST(sum(CASE WHEN arm <> 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |          AS n_b,
        |        CAST(sum(CASE WHEN arm <> 0 THEN conv ELSE 0 END) AS DOUBLE)
        |          AS x_b
        |       FROM un),
        |zt AS (SELECT n_a, x_a, n_b, x_b,
        |        x_a / n_a AS p1, x_b / n_b AS p2,
        |        round((x_a / n_a - x_b / n_b) /
        |          sqrt((x_a + x_b) / (n_a + n_b) *
        |            (1.0 - (x_a + x_b) / (n_a + n_b)) *
        |            (1.0 / n_a + 1.0 / n_b)), 4) AS z
        |       FROM ab
        |       WHERE n_a > 0 AND n_b > 0 AND (x_a + x_b) > 0
        |         AND (x_a + x_b) < (n_a + n_b)),
        |px AS (SELECT *, abs(z) / sqrt(2.0) AS xx FROM zt),
        |pu AS (SELECT *, 1.0 / (1.0 + 0.3275911 * xx) AS uu FROM px)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
        |  round(p1, 6) AS rate_a,
        |  round((p1 + 1.959963984540054 * 1.959963984540054 / (n_a * 2) -
        |    1.959963984540054 * sqrt(p1 * (1.0 - p1) / n_a +
        |      1.959963984540054 * 1.959963984540054 / (n_a * n_a * 4))) /
        |    (1.0 + 1.959963984540054 * 1.959963984540054 / n_a), 6)
        |    AS wilson_lo_a,
        |  round((p1 + 1.959963984540054 * 1.959963984540054 / (n_a * 2) +
        |    1.959963984540054 * sqrt(p1 * (1.0 - p1) / n_a +
        |      1.959963984540054 * 1.959963984540054 / (n_a * n_a * 4))) /
        |    (1.0 + 1.959963984540054 * 1.959963984540054 / n_a), 6)
        |    AS wilson_hi_a,
        |  CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
        |  round(p2, 6) AS rate_b,
        |  round((p2 + 1.959963984540054 * 1.959963984540054 / (n_b * 2) -
        |    1.959963984540054 * sqrt(p2 * (1.0 - p2) / n_b +
        |      1.959963984540054 * 1.959963984540054 / (n_b * n_b * 4))) /
        |    (1.0 + 1.959963984540054 * 1.959963984540054 / n_b), 6)
        |    AS wilson_lo_b,
        |  round((p2 + 1.959963984540054 * 1.959963984540054 / (n_b * 2) +
        |    1.959963984540054 * sqrt(p2 * (1.0 - p2) / n_b +
        |      1.959963984540054 * 1.959963984540054 / (n_b * n_b * 4))) /
        |    (1.0 + 1.959963984540054 * 1.959963984540054 / n_b), 6)
        |    AS wilson_hi_b,
        |  z,
        |  round(((((1.061405429 * uu - 1.453152027) * uu +
        |    1.421413741) * uu - 0.284496736) * uu + 0.254829592) * uu *
        |    exp(-(xx * xx)), 8) AS p_value
        |FROM pu""".stripMargin,

    // identical lifetime dimension, reverse-cumulative risk set, and
    // guarded log-survival tree
    "q_survival" ->
      """WITH ev AS (SELECT user_id AS u,
        |        (epoch_ns(ts)//1000) // 86400000000 AS d FROM events
        |      WHERE value IS NOT NULL
        |        AND CAST(round(value * 100) AS BIGINT) >= 8000),
        |us AS (SELECT u, min(d) AS f, max(d) AS l FROM ev GROUP BY 1),
        |h AS (SELECT max(d) AS hmax FROM ev),
        |lt AS (SELECT l - f AS lifetime, (l <= hmax - 7) AS churned
        |       FROM us CROSS JOIN h),
        |dim AS (SELECT lifetime, count(*) AS n,
        |        sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churn
        |        FROM lt GROUP BY 1),
        |r AS (SELECT lifetime, n_churn,
        |        sum(n) OVER (ORDER BY lifetime DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS n_risk
        |      FROM dim),
        |t AS (SELECT lifetime, n_churn, n_risk,
        |        CASE WHEN n_churn >= n_risk THEN 0.0
        |             ELSE ln(1.0 - CAST(n_churn AS DOUBLE) / n_risk)
        |        END AS term,
        |        CASE WHEN n_churn >= n_risk THEN 1 ELSE 0 END AS wipe
        |      FROM r)
        |SELECT lifetime, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(n_churn AS BIGINT) AS n_churn,
        |  CASE WHEN max(wipe) OVER (ORDER BY lifetime
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |       THEN 0.0
        |       ELSE round(exp(sum(term) OVER (ORDER BY lifetime
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |  END AS survival
        |FROM t ORDER BY lifetime""".stripMargin,

    // exact oracle is valid because k=64 ≥ the 31-token vocabulary (MG
    // is exact when nothing is ever evicted)
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> length(x) > 0)) AS token
        |  FROM documents)
        |SELECT token, count(*) AS est_count
        |FROM t GROUP BY token ORDER BY est_count DESC, token""".stripMargin,

    // per-value counts, identical cumulative frame, exact-integer ratios
    "q_ks_test" ->
      """WITH t AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events
        |  WHERE value IS NOT NULL AND event_type IN ('click', 'error')),
        |c AS (SELECT v,
        |    CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(sum(CASE WHEN g = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM t GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cumb
        |  FROM c WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |               CAST(sum(cb) AS BIGINT) AS nb FROM c)
        |SELECT max(na) AS n_a, max(nb) AS n_b, count(*) AS n_values,
        |  round(max(abs(cuma / na - cumb / nb)), 6) AS ks_d
        |FROM cum CROSS JOIN tot""".stripMargin,

    "q_mode" ->
      """WITH e AS (SELECT event_type,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS weekday
        |  FROM events),
        |c AS (SELECT event_type, weekday, count(*) AS n_occ
        |      FROM e GROUP BY 1, 2),
        |r AS (SELECT event_type, weekday AS mode_value, n_occ,
        |        row_number() OVER (PARTITION BY event_type
        |          ORDER BY n_occ DESC, weekday ASC) AS rk FROM c)
        |SELECT event_type, mode_value, n_occ FROM r WHERE rk = 1
        |ORDER BY event_type""".stripMargin,

    // exact integer (n, Σc, Σc²) per group, then the identical double
    // expression tree — sums of integers-as-doubles are exact below 2^53
    "q_welch_ttest" ->
      """WITH c0 AS (SELECT event_type AS g,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
        |        sum(c * c) AS ss
        |      FROM c0 GROUP BY 1 HAVING count(*) > 1)
        |SELECT a.g AS g_a, b.g AS g_b,
        |  CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
        |  round(a.s / a.n / 100.0, 4) AS mean_a,
        |  round(b.s / b.n / 100.0, 4) AS mean_b,
        |  round((a.s / a.n - b.s / b.n) /
        |    sqrt((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n), 4) AS t_stat,
        |  round(((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) *
        |        ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n +
        |         (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) /
        |    ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n *
        |       ((a.ss - a.s * a.s / a.n) / (a.n - 1) / a.n) / (a.n - 1) +
        |     (b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n *
        |       ((b.ss - b.s * b.s / b.n) / (b.n - 1) / b.n) / (b.n - 1)), 2)
        |    AS df_welch
        |FROM g a JOIN g b ON a.g < b.g
        |ORDER BY g_a, g_b""".stripMargin,

    // the same exact-integer-sum discipline: unit (x, y) cents are exact,
    // every pooled/arm sum of their products stays below 2^53, and the
    // theta/mean/variance identities are spelled as ONE expression tree
    // exact HUGEINT unit/arm sums (the q_moments convention) cast to
    // double ONCE; theta falls back to 0 when pooled var(X)=0 and a
    // zero-variance arm reports var_reduction 0.0 — both matching the
    // Spark operator's guards exactly
    "q_cuped" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS us,
        |    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (SELECT CAST(floor((min(us) + max(us)) / 2) AS BIGINT) AS mid
        |      FROM e),
        |u AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN us < mid THEN cents ELSE 0 END)
        |      AS HUGEINT) AS x,
        |    CAST(sum(CASE WHEN us >= mid THEN cents ELSE 0 END)
        |      AS HUGEINT) AS y
        |  FROM e CROSS JOIN b GROUP BY user_id),
        |g AS (SELECT arm, CAST(count(*) AS DOUBLE) AS n,
        |        CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |        CAST(sum(x * x) AS DOUBLE) AS sxx,
        |        CAST(sum(y * y) AS DOUBLE) AS syy,
        |        CAST(sum(x * y) AS DOUBLE) AS sxy
        |      FROM u GROUP BY 1 HAVING count(*) > 1),
        |p AS (SELECT CAST(count(*) AS DOUBLE) AS pn,
        |        CAST(sum(x) AS DOUBLE) AS psx,
        |        CAST(sum(y) AS DOUBLE) AS psy,
        |        CAST(sum(x * x) AS DOUBLE) AS psxx,
        |        CAST(sum(x * y) AS DOUBLE) AS psxy
        |      FROM u),
        |t AS (SELECT *,
        |        CASE WHEN psxx - psx * psx / pn = 0 THEN 0.0
        |             ELSE (psxy - psx * psy / pn) / (psxx - psx * psx / pn)
        |        END AS theta
        |      FROM g CROSS JOIN p),
        |v AS (SELECT arm, n, sx, sy, pn, psx, theta,
        |        (syy - sy * sy / n) / (n - 1) AS var_y,
        |        (sxx - sx * sx / n) / (n - 1) AS var_x,
        |        (sxy - sx * sy / n) / (n - 1) AS cov_xy
        |      FROM t)
        |SELECT arm, CAST(n AS BIGINT) AS n_units,
        |  round(sy / n / 100.0, 4) AS mean_post,
        |  round((sy / n - theta * (sx / n - psx / pn)) / 100.0, 4) AS mean_adj,
        |  round(var_y, 2) AS var_post,
        |  round(var_y + theta * theta * var_x - 2.0 * theta * cov_xy, 2)
        |    AS var_adj,
        |  CASE WHEN var_y = 0 THEN 0.0
        |       ELSE round(1.0 - (var_y + theta * theta * var_x
        |                         - 2.0 * theta * cov_xy) / var_y, 6)
        |  END AS var_reduction
        |FROM v ORDER BY arm""".stripMargin,

    // leading digit from the integer's decimal string — exact at every
    // power-of-ten boundary; n/tot is double division in both engines
    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM (SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events)
        |  WHERE c > 0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g)
        |SELECT digit, n, round(n / tot, 6) AS share,
        |  round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_share,
        |  round((n / tot - ln(1.0 + 1.0 / digit) / ln(10.0)) *
        |        (n / tot - ln(1.0 + 1.0 / digit) / ln(10.0)) /
        |        (ln(1.0 + 1.0 / digit) / ln(10.0)) * tot, 6) AS chi2_term
        |FROM g CROSS JOIN t ORDER BY digit""".stripMargin,

    // identical exact-sum reduction and double expression tree
    "q_anova" ->
      """WITH c0 AS (SELECT event_type AS g,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS DOUBLE) AS c
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(c) AS s,
        |        sum(c * c) AS ss FROM c0 GROUP BY 1),
        |t AS (SELECT count(*) AS k, sum(n) AS bigN, sum(s) AS bigS,
        |        sum(s * s / n) AS sbn, sum(ss) AS sss FROM g)
        |SELECT k, CAST(bigN AS BIGINT) AS n,
        |  CAST(k - 1 AS BIGINT) AS df1, CAST(bigN - k AS BIGINT) AS df2,
        |  round(((sbn - bigS * bigS / bigN) / (k - 1)) /
        |        ((sss - sbn) / (bigN - k)), 4) AS f_stat
        |FROM t""".stripMargin,

    "q_weighted_median" ->
      """WITH t AS (SELECT source AS g, n_chars AS v,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |      x -> length(x) > 0)) AS BIGINT) AS w FROM documents),
        |a AS (SELECT g, v, CAST(sum(w) AS BIGINT) AS wv FROM t
        |      WHERE v IS NOT NULL AND w > 0 GROUP BY 1, 2),
        |c AS (SELECT g, v,
        |    CAST(sum(wv) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(sum(wv) OVER (PARTITION BY g) AS BIGINT) AS tot FROM a)
        |SELECT g AS source, min(v) AS weighted_median,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM c WHERE cum * 2 >= tot
        |GROUP BY g ORDER BY source""".stripMargin,

    // quality subtree copied verbatim from q_source_cap; 2U stays
    // integer (HUGEINT) until the one final division, like Spark
    "q_auc" ->
      """WITH d AS (
        |  SELECT source,
        |    round((len_score + punct_score + sw_score) / 3.0, 4) AS score,
        |    (lang = 'en') AS lbl
        |  FROM (SELECT source, lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT source, lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |ps AS (SELECT source, score,
        |         CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |         CAST(sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |       FROM d GROUP BY 1, 2),
        |c AS (SELECT *, coalesce(sum(nn) OVER (PARTITION BY source
        |        ORDER BY score ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumnn
        |      FROM ps)
        |SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  round(CAST(sum(np * (2 * cumnn + nn)) AS DOUBLE) /
        |        (2.0 * sum(np) * sum(nn)), 4) AS auc
        |FROM c GROUP BY source
        |HAVING sum(np) > 0 AND sum(nn) > 0
        |ORDER BY source""".stripMargin,

    // quality subtree verbatim from q_auc; integer score units until
    // the two final divisions
    "q_calibration" ->
      """WITH d AS (
        |  SELECT round((len_score + punct_score + sw_score) / 3.0, 4) AS score,
        |    (lang = 'en') AS lbl
        |  FROM (SELECT lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |bn AS (SELECT CAST(least((u * 10) // 10000, 9) AS BIGINT) AS bin,
        |         u, lbl
        |       FROM (SELECT CAST(round(score * 10000, 0) AS BIGINT) AS u,
        |               lbl FROM d) e)
        |SELECT bin, count(*) AS n,
        |  CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(CAST(sum(u) AS DOUBLE) / count(*) / 10000.0, 6) AS mean_score,
        |  round(CAST(sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM bn GROUP BY bin ORDER BY bin""".stripMargin,

    // same quality/bin subtree; (p−q)·ln(p/q) tree written identically,
    // Laplace +1 per observed bin, denominators +10
    "q_psi" ->
      """WITH d AS (
        |  SELECT CAST(least(floor(round((len_score + punct_score + sw_score) / 3.0, 4) * 10), 9) AS BIGINT) AS bin,
        |    (lang = 'en') AS base
        |  FROM (SELECT lang,
        |          least(length(text) / 500.0, 1.0) AS len_score,
        |          1.0 - least(
        |            (CASE WHEN length(text) = 0 THEN 0.0
        |                  ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |             END) * 5.0, 1.0) AS punct_score,
        |          1.0 - abs(
        |            (CASE WHEN len(toks) = 0 THEN 0.0
        |                  ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |             END) - 0.4) AS sw_score
        |        FROM (SELECT lang, text,
        |                list_filter(string_split_regex(lower(text), '\s+'), t -> length(t) > 0) AS toks
        |              FROM documents) a) b),
        |c AS (SELECT bin,
        |        CAST(sum(CASE WHEN base THEN 1 ELSE 0 END) AS BIGINT) AS cb,
        |        CAST(sum(CASE WHEN base THEN 0 ELSE 1 END) AS BIGINT) AS cc
        |      FROM d GROUP BY bin),
        |t AS (SELECT CAST(sum(cb) AS BIGINT) AS tb,
        |        CAST(sum(cc) AS BIGINT) AS tc FROM c)
        |SELECT count(*) AS n_bins,
        |  round(sum(((cb + 1)::DOUBLE / (tb + 10) - (cc + 1)::DOUBLE / (tc + 10)) *
        |        ln(((cb + 1)::DOUBLE / (tb + 10)) / ((cc + 1)::DOUBLE / (tc + 10)))), 6) AS psi
        |FROM c, t""".stripMargin,

    "q_cms_counts" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> length(x) > 0)) AS tok FROM documents)
        |SELECT tok, count(*) AS est_count FROM t
        |GROUP BY tok ORDER BY tok""".stripMargin,

    "q_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |           FROM lineitem)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |            ELSE least(floor((l_extendedprice - lo) / ((hi - lo) / 20)), 19)
        |       END AS BIGINT) AS bucket, count(*) AS n
        |FROM lineitem CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_corr_regr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
        |  round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_outlier_iqr" ->
      """WITH q AS (SELECT event_type, quantile_cont(value, 0.25) AS q1,
        |                  quantile_cont(value, 0.75) AS q3
        |           FROM events GROUP BY 1),
        |f AS (SELECT event_type, q1 - (q3 - q1) * 1.5 AS flo,
        |             q3 + (q3 - q1) * 1.5 AS fhi FROM q)
        |SELECT e.event_type, count(*) AS n_outliers,
        |       round(min(value), 4) AS out_min, round(max(value), 4) AS out_max
        |FROM events e JOIN f USING (event_type)
        |WHERE value < flo OR value > fhi
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_mad" ->
      """WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |           FROM events GROUP BY 1)
        |SELECT e.event_type, round(max(med), 4) AS median,
        |       round(quantile_cont(abs(value - med), 0.5), 4) AS mad,
        |       count(*) AS n
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_chisq" ->
      """WITH e AS (SELECT event_type AS a,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS b FROM events),
        |c AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM c GROUP BY 1),
        |cc AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |             count(DISTINCT a) AS ka, count(DISTINCT b) AS kb FROM c)
        |SELECT round(sum(o * o / (ra * cb / n)) - max(n), 6) AS chi2,
        |       CAST((max(ka) - 1) * (max(kb) - 1) AS BIGINT) AS dof,
        |       max(n) AS n
        |FROM c JOIN r USING (a) JOIN cc USING (b) CROSS JOIN t""".stripMargin,

    "q_gini" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c, l_suppkey) AS rnk FROM c)
        |SELECT round((2.0 * sum(rnk * c)) / (count(*) * sum(c))
        |         - (count(*) + 1) / count(*), 6) AS gini,
        |       count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS total
        |FROM r""".stripMargin,

    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS a,
        |    ((epoch_ns(ts)//1000) // 86400000000 + 4) % 7 AS b FROM events),
        |c AS (SELECT a, b, count(*) AS o FROM e GROUP BY 1, 2),
        |r AS (SELECT a, CAST(sum(o) AS BIGINT) AS ra FROM c GROUP BY 1),
        |cc AS (SELECT b, CAST(sum(o) AS BIGINT) AS cb FROM c GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM c)
        |SELECT round(sum((o / n) * ln((o * n) / (ra * cb))), 6) AS mi,
        |       max(n) AS n
        |FROM c JOIN r USING (a) JOIN cc USING (b) CROSS JOIN t""".stripMargin,

    "q_winsorize" ->
      """WITH f AS (SELECT l_returnflag,
        |    quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag,
        |  round(avg(l_extendedprice), 4) AS mean_raw,
        |  round(avg(least(greatest(l_extendedprice, lo), hi)), 4) AS mean_winsorized,
        |  CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  count(*) AS n
        |FROM lineitem l JOIN f USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_spearman" ->
      """WITH b AS (SELECT event_type AS g,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    (epoch_ns(ts)//1000) % 86400000000 AS y
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT g,
        |    rank() OVER (PARTITION BY g ORDER BY x)
        |      + (count(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
        |    rank() OVER (PARTITION BY g ORDER BY y)
        |      + (count(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
        |  FROM b)
        |SELECT g AS event_type, count(*) AS n, round(corr(rx, ry), 4) AS rho
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // same quality expression as q_quality_bins; ntile(10) descending
    "q_gains" ->
      """WITH q AS (SELECT doc_id, lang,
        |  round((least(length(text) / 500.0, 1.0)
        |   + 1.0 - least(
        |       (CASE WHEN length(text) = 0 THEN 0.0
        |             ELSE (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g'))) * 1.0 / length(text)
        |        END) * 5.0, 1.0)
        |   + 1.0 - abs(
        |       (CASE WHEN len(toks) = 0 THEN 0.0
        |             ELSE len(list_filter(toks, t -> t IN ('the','a','of','and'))) * 1.0 / len(toks)
        |        END) - 0.4)) / 3.0, 4) AS quality
        |FROM (SELECT doc_id, lang,
        |        list_filter(string_split_regex(lower(text), '\s+'),
        |          t -> length(t) > 0) AS toks,
        |        text
        |      FROM documents) a),
        |b AS (SELECT lang,
        |        ntile(10) OVER (ORDER BY quality DESC, doc_id) AS decile
        |      FROM q),
        |a2 AS (SELECT decile, count(*) AS n_docs,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_pos
        |       FROM b GROUP BY 1),
        |c AS (SELECT decile, n_docs, n_pos,
        |        sum(n_pos) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
        |        sum(n_pos) OVER () AS tot_pos
        |      FROM a2)
        |SELECT CAST(decile AS BIGINT) AS decile, n_docs,
        |       CAST(n_pos AS BIGINT) AS n_pos,
        |       CAST(cum_pos AS BIGINT) AS cum_pos,
        |       round(CAST(cum_pos AS DOUBLE) / tot_pos, 6) AS gain
        |FROM c ORDER BY decile""".stripMargin,

    "q_cdf" ->
      """WITH dim AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) // 1000 AS bucket,
        |    count(*) AS n
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, bucket, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_n,
        |  round(sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) /
        |    sum(n) OVER (PARTITION BY event_type), 6) AS cdf
        |FROM dim ORDER BY 1, 2""".stripMargin,

    // identical exact-moment reduction and double expression tree
    "q_moments" ->
      """WITH b AS (SELECT event_type,
        |    CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n, sum(c) AS s1,
        |        sum(c*c) AS s2, sum(c*c*c) AS s3, sum(c*c*c*c) AS s4
        |      FROM b GROUP BY 1),
        |d AS (SELECT event_type, n,
        |        CAST(s1 AS DOUBLE)/n AS d1, CAST(s2 AS DOUBLE)/n AS d2,
        |        CAST(s3 AS DOUBLE)/n AS d3, CAST(s4 AS DOUBLE)/n AS d4
        |      FROM s)
        |SELECT event_type, n,
        |  round(d1 / 100.0, 4) AS mean_val,
        |  round(d2 - d1*d1, 4) AS var_pop,
        |  round((d3 - 3.0*d1*d2 + 2.0*d1*d1*d1) /
        |    pow(d2 - d1*d1, 1.5), 6) AS skewness,
        |  round((d4 - 4.0*d1*d3 + 6.0*d1*d1*d2 - 3.0*d1*d1*d1*d1) /
        |    ((d2 - d1*d1) * (d2 - d1*d1)) - 3.0, 6) AS kurtosis_ex
        |FROM d ORDER BY 1""".stripMargin,
  )
}
