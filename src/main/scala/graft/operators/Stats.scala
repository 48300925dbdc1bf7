package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Distribution-shape statistics over big columns: equi-width histograms,
  * robust (IQR-fence) outlier detection, and per-group Shannon entropy —
  * the profiling layer a data pipeline runs before trusting a column
  * enough to train on it. (The reference computes no statistics at all —
  * SURVEY.md §2.4 — so this is declared-surface extension work.)
  *
  * Scale shape shared by all three: a bounded "shape" aggregate (min/max,
  * two percentiles, or a term-frequency dimension) is computed first and
  * broadcast back over the data, so the second pass is map-only into a
  * small keyed count. Nothing here materializes per-row state on the
  * driver and no shuffle carries more than (group, term/bucket) keys.
  */
object Stats {

  /** Equi-width histogram: `buckets` equal bins spanning the column's
    * global [min, max]; the top edge is closed (x == max lands in the
    * last bin, via `least`). Degenerate case min == max puts every row
    * in bin 0 instead of dividing by zero.
    *
    * Two passes: a 2-value min/max aggregate, broadcast back; then a
    * map-only bucket expression into a `buckets`-row count — the scan
    * dominates, the shuffle carries (bucket, partial count) only.
    */
  def histogram(df: DataFrame, valueCol: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val bounds = df.agg(min(valueCol).as("_lo"), max(valueCol).as("_hi"))
    // NULLs carry no bin evidence and must behave the same in both
    // branches: the normal branch's arithmetic sent them to a separate
    // NULL bucket while the degenerate min==max branch (whose `when`
    // condition ignores the row value) put them in bin 0 — exclude them
    // before bucketing so the branches agree
    df.select(valueCol.as("_v")).where(col("_v").isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        when(col("_hi") === col("_lo"), lit(0L))
          .otherwise(least(
            floor((col("_v") - col("_lo")) /
              ((col("_hi") - col("_lo")) / buckets)),
            lit(buckets - 1).cast("long")).cast("long"))
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Tukey-fence outliers per group: rows outside
    * [q1 − k·IQR, q3 + k·IQR] of their group's exact quartiles.
    * Returns one row per group that has outliers: the outlier count and
    * the observed outlier range.
    *
    * The quartile table is one bounded row per group (exact
    * `percentile`, not a sketch — the fence must be reproducible),
    * broadcast back so the outlier test is a map-side filter.
    */
  def iqrOutliers(df: DataFrame, groupCol: String, valueCol: Column,
                  k: Double = 1.5): DataFrame = {
    // a NULL group key carries no group evidence — without the explicit
    // exclusion those rows would silently vanish at the fence equi-join
    // (NULL values already drop naturally: percentile ignores them and
    // the fence comparison is NULL)
    val v = df.select(col(groupCol).as("_s_grp"), valueCol.as("_s_v"))
      .where(col("_s_grp").isNotNull)
    val fences = v.groupBy(col("_s_grp"))
      .agg(percentile(col("_s_v"), lit(0.25)).as("_q1"),
        percentile(col("_s_v"), lit(0.75)).as("_q3"))
      .select(col("_s_grp"),
        (col("_q1") - (col("_q3") - col("_q1")) * k).as("_f_lo"),
        (col("_q3") + (col("_q3") - col("_q1")) * k).as("_f_hi"))
    v.join(broadcast(fences), "_s_grp")
      .where(col("_s_v") < col("_f_lo") || col("_s_v") > col("_f_hi"))
      .groupBy(col("_s_grp").as("group"))
      .agg(count(lit(1)).as("n_outliers"),
        min(col("_s_v")).as("out_min"), max(col("_s_v")).as("out_max"))
  }

  /** Median absolute deviation per group — the robust scale estimate
    * (insensitive to the same tails [[iqrOutliers]] fences off):
    * MAD = median(|x − median(x)|). Two exact-percentile passes; the
    * per-group median table is bounded and broadcast back, so the
    * deviation pass stays map-side into the second aggregate.
    */
  def mad(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    // NULL group keys would silently vanish at the median equi-join;
    // NULL values carry no deviation evidence but would still count in n
    // — exclude both explicitly (histogram convention)
    val v = df.select(col(groupCol).as("_s_grp"), valueCol.as("_s_v"))
      .where(col("_s_grp").isNotNull && col("_s_v").isNotNull)
    val med = v.groupBy(col("_s_grp"))
      .agg(percentile(col("_s_v"), lit(0.5)).as("_med"))
    v.join(broadcast(med), "_s_grp")
      .select(col("_s_grp"), col("_med"), abs(col("_s_v") - col("_med")).as("_dev"))
      .groupBy(col("_s_grp").as("group"))
      .agg(max(col("_med")).as("median"),
        percentile(col("_dev"), lit(0.5)).as("mad"),
        count(lit(1)).as("n"))
  }

  /** Pearson chi-square statistic of independence for two discrete
    * columns: χ² = Σ_cells (observed − expected)²/expected with
    * expected = rowTotal·colTotal/n — the classic contingency test a
    * pipeline uses to detect dependence between categorical features
    * (or between a feature and a label) before training.
    *
    * One (a, b) count aggregate reduces the data to the contingency
    * dimension; marginals and the statistic are computed on that
    * bounded table (|A|·|B| cells), so nothing after the first
    * aggregate scales with the data. Returns one row:
    * (chi2, dof, n).
    */
  def chiSquare(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // NULL in either column carries no contingency evidence — and an
    // unfiltered NULL cell would silently drop at the marginal equi-joins
    // while still counting in n, making Σ o²/e − n come out NEGATIVE (an
    // impossible χ²). Same convention as histogram's NULL exclusion.
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rows = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cols = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot = cells.agg(sum(col("_o")).as("_n"),
      countDistinct(col("_a")).as("_ka"), countDistinct(col("_b")).as("_kb"))
    // sum over observed cells only, using the algebraic identity
    // Σ_allcells (o−e)²/e = Σ_observed o²/e − n: unobserved (a,b)
    // combinations contribute exactly their expected mass, so they never
    // need to be generated (a cross-join of the marginals would)
    val e = (col("_ra") * col("_cb")) / col("_n")
    cells.join(broadcast(rows), "_a").join(broadcast(cols), "_b")
      .crossJoin(broadcast(tot))
      .agg((sum(col("_o") * col("_o") / e) - max(col("_n"))).as("chi2"),
        ((max(col("_ka")) - 1) * (max(col("_kb")) - 1)).as("dof"),
        max(col("_n")).as("n"))
  }

  /** Mutual information (nats) between two discrete columns:
    * I = Σ_cells p_ab·ln(p_ab/(p_a·p_b)) — [[chiSquare]]'s
    * information-theoretic sibling (feature-relevance ranking rather
    * than a significance test). Unobserved cells contribute exactly 0
    * (p_ab = 0), so summing observed cells IS the full sum — no
    * identity needed. Same scale shape: one contingency reduce, then
    * bounded-dimension arithmetic.
    */
  def mutualInfo(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // NULL exclusion for the same reason as chiSquare: a NULL cell would
    // vanish at the marginal joins but still inflate n, biasing every
    // probability in the sum (MI of independent columns could go negative)
    val cells = df.select(aCol.as("_a"), bCol.as("_b"))
      .where(col("_a").isNotNull && col("_b").isNotNull)
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("_o"))
    val rows = cells.groupBy(col("_a")).agg(sum(col("_o")).as("_ra"))
    val cols = cells.groupBy(col("_b")).agg(sum(col("_o")).as("_cb"))
    val tot = cells.agg(sum(col("_o")).as("_n"))
    cells.join(broadcast(rows), "_a").join(broadcast(cols), "_b")
      .crossJoin(broadcast(tot))
      .agg(sum((col("_o") / col("_n")) *
          log((col("_o") * col("_n")) / (col("_ra") * col("_cb")))).as("mi"),
        max(col("_n")).as("n"))
  }

  /** Gini coefficient of the per-key mass distribution — the skew
    * profile number (0 = perfectly even keys, →1 = one key holds all
    * rows) that tells a pipeline whether a join/agg key needs salting
    * BEFORE the job hits the straggler. Computed from the rank identity
    * G = 2·Σᵢ i·cᵢ / (n·Σc) − (n+1)/n over counts sorted ascending.
    *
    * The data reduces to the per-key count dimension first; the global
    * ascending rank over that dimension uses the two-level
    * [[Packing.globalOrderIndex]] (block = the count value itself), so
    * no corpus-sized or dimension-sized single-partition window exists.
    * Everything stays integer until the two final divisions.
    */
  def giniOfCounts(df: DataFrame, keyCol: Column): DataFrame = {
    val counts = df.select(keyCol.as("_s_key"))
      .groupBy(col("_s_key")).agg(count(lit(1)).as("_c"))
    val ranked = Packing.globalOrderIndex(counts, col("_c"),
      Seq(col("_c"), col("_s_key")))
    ranked.agg(sum(col("rank") * col("_c")).as("_src"),
        count(lit(1)).as("_n"), sum(col("_c")).as("_tot"))
      .select(
        ((lit(2.0) * col("_src")) / (col("_n") * col("_tot")) -
          (col("_n") + 1) / col("_n")).as("gini"),
        col("_n").as("n_keys"), col("_tot").as("total"))
  }

  /** Per-group ROC-AUC of a score against a boolean label — the
    * Mann–Whitney U statistic, tie-corrected: a positive scores 1 for
    * each negative strictly below it and ½ for each tied negative,
    * normalized by n_pos·n_neg. The standard "does this heuristic
    * actually separate the classes?" gate a pipeline runs before using
    * a quality score as a filter.
    *
    * Exactness discipline: the corpus reduces to one row per
    * (group, DISTINCT rounded score) carrying integer (n_pos, n_neg);
    * 2·U = Σ_scores n_pos·(2·cum_neg_below + n_neg_at) stays integer
    * until the single final division, so there is no float-sum order
    * dependence anywhere (oracle-parity contract). Groups missing a
    * class are dropped (AUC is undefined), not emitted as NULL.
    *
    * Scale shape: one (group, score)-keyed count aggregate, then a
    * cumulative window over the DISTINCT-score table — bounded per
    * group by the score's rounding grid (a 4-dp score in [0,1] has
    * ≤ 10001 rows per group), never the corpus.
    */
  def auc(df: DataFrame, groupCol: Column, scoreCol: Column,
          labelCol: Column, roundTo: Int = 4): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_s_grp")).orderBy(col("_s_score").asc)
      .rowsBetween(Long.MinValue, -1)
    val perScore = df.select(groupCol.as("_s_grp"), scoreCol.as("_s_score"),
        labelCol.cast("boolean").as("_s_lbl"))
      // a row with a NULL label or NULL score carries no ranking evidence
      // (an unfiltered NULL label would land in `otherwise` and count as
      // a negative, silently deflating the AUC)
      .where(col("_s_lbl").isNotNull && col("_s_score").isNotNull)
      .groupBy(col("_s_grp"), col("_s_score"))
      .agg(sum(when(col("_s_lbl"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_s_lbl"), 0L).otherwise(1L)).as("_nn"))
    perScore
      .withColumn("_cumnn", coalesce(sum(col("_nn")).over(w), lit(0L)))
      .groupBy(col("_s_grp").as("group"))
      .agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(col("_np") * (lit(2L) * col("_cumnn") + col("_nn"))).as("_u2"))
      .where(col("n_pos") > 0 && col("n_neg") > 0)
      .select(col("group"), col("n_pos"), col("n_neg"),
        round(col("_u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg")), roundTo).as("auc"))
  }

  /** Calibration (reliability) table of a probability-like score
    * against a boolean outcome: `bins` equal-width bins over [0, 1],
    * per bin the count, mean score, and empirical positive rate — the
    * table behind a reliability diagram, and the check run before
    * using a classifier score as a sampling probability. Scores at
    * exactly 1.0 land in the top bin (closed top edge, the
    * [[histogram]] convention).
    *
    * Exactness discipline: the score arrives pre-rounded to `scaleDp`
    * decimals; it converts to integer units (10^scaleDp) so the
    * per-bin sum is exact — mean and rate are single final divisions
    * of exact integers. Map-only into a `bins`-row aggregate.
    */
  def calibration(df: DataFrame, scoreCol: Column, labelCol: Column,
                  bins: Int, scaleDp: Int = 4): DataFrame = {
    require(bins > 0, "bins must be positive")
    val unit = math.pow(10.0, scaleDp)
    val u = round(scoreCol * unit, 0).cast("long")
    // exact integer binning on the pre-rounded units: floor(score·bins)
    // in double misplaces exact boundary scores (0.3·10 =
    // 2.9999999999999996 floors into bin 2), while u·bins div 10^dp is
    // integer arithmetic with no boundary error — the same exactness
    // discipline the per-bin sums already follow. NULL score/label rows
    // carry no evidence and are excluded (histogram convention).
    val bin = least(floor((u * bins).cast("double") / unit),
      lit(bins - 1)).cast("long")
    df.select(bin.as("bin"), u.as("_u"),
        labelCol.cast("boolean").as("_l"))
      .where(col("_u").isNotNull && col("_l").isNotNull)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("_u")).as("_su"),
        sum(when(col("_l"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("_su").cast("double") / col("n") / unit, 6).as("mean_score"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"))
  }

  /** Population Stability Index between a `baseCol=true` population's
    * and a `baseCol=false` population's distribution of a bucketed
    * value: PSI = Σ_bins (p − q)·ln(p/q), the standard drift alarm
    * between a reference window and a current window of the same score
    * (< 0.1 stable, > 0.25 action). Laplace-smoothed counts (+1 per
    * bin and side, denominators + `bins`) so one-sided-empty bins stay
    * finite; bins observed in NEITHER population are excluded — their
    * smoothed contribution is a constant artifact of the smoothing,
    * not drift evidence. Applied identically on any engine.
    *
    * The corpus reduces to a (bin, side) count dimension map-side;
    * the PSI sum runs over ≤ `bins` rows. Integer counts until the
    * probability ratios; the ln/arithmetic tree is written identically
    * in the oracle.
    */
  def psi(df: DataFrame, bucketCol: Column, baseCol: Column,
          bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val counts = df.select(bucketCol.cast("long").as("bin"),
        baseCol.cast("boolean").as("_base"))
      // a NULL bucket (or a value that casts to NULL) is not a real bin:
      // unfiltered it would form a phantom bin=NULL row that gets
      // Laplace-smoothed into the PSI sum and n_bins, turning a change in
      // null-share into a fake drift signal. NULL side flags likewise
      // carry no window evidence. (histogram convention)
      .where(col("bin").isNotNull && col("_base").isNotNull)
      .groupBy(col("bin"))
      .agg(sum(when(col("_base"), 1L).otherwise(0L)).as("_cb"),
        sum(when(col("_base"), 0L).otherwise(1L)).as("_cc"))
    val tot = counts.agg(sum(col("_cb")).as("_tb"), sum(col("_cc")).as("_tc"))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("_cb"), col("_cc"),
        ((col("_cb") + 1).cast("double") / (col("_tb") + bins)).as("_p"),
        ((col("_cc") + 1).cast("double") / (col("_tc") + bins)).as("_q"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum((col("_p") - col("_q")) * log(col("_p") / col("_q"))), 6)
          .as("psi"))
  }

  /** Per-group Shannon entropy (nats) of a discrete column: H = −Σ p·ln p
    * over the group's value distribution, plus the distinct-value and
    * total counts. The inner aggregate reduces the data to one row per
    * (group, value) before any division happens, so the entropy sum runs
    * over the bounded dictionary, not the corpus.
    */
  def entropy(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    // NULL group keys would silently vanish at the totals equi-join; a
    // NULL value is not a dictionary symbol — exclude both explicitly
    // (histogram convention)
    val counts = df.select(col(groupCol).as("_s_grp"), valueCol.as("_s_v"))
      .where(col("_s_grp").isNotNull && col("_s_v").isNotNull)
      .groupBy(col("_s_grp"), col("_s_v"))
      .agg(count(lit(1)).as("_cnt"))
    val totals = counts.groupBy(col("_s_grp")).agg(sum(col("_cnt")).as("_tot"))
    val p = col("_cnt") / col("_tot")
    counts.join(totals, "_s_grp")
      .groupBy(col("_s_grp").as("group"))
      .agg(count(lit(1)).as("n_distinct"),
        max(col("_tot")).as("n_total"),
        (-sum(p * log(p))).as("entropy"))
  }

  /** Pairwise Welch two-sample t-tests between every pair of groups —
    * the experiment-analysis primitive (is source A's metric different
    * from source B's?). The corpus reduces to one exact-integer row per
    * group (n, Σc, Σc²) over an integer-cents value column; the t
    * statistic and Welch–Satterthwaite df are then pure double
    * arithmetic on those exact sums, so both engines compute
    * bit-identical results. The pair join is over the bounded group
    * dimension only (a nested loop over k rows, never over data).
    *
    * Σc² is accumulated in double: exact while group sums stay below
    * 2^53 (≈9e15 — far above any realistic cents corpus at one group),
    * and the BIGINT-overflow-free twin of DuckDB's HUGEINT promotion.
    */
  def welchTTest(df: DataFrame, groupCol: Column, centsCol: Column): DataFrame = {
    val g = df.select(groupCol.as("g"), centsCol.cast("double").as("c"))
      .where(col("c").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .where(col("n") > 1)
    val a = g.select(col("g").as("g_a"), col("n").as("na"),
      col("s").as("sa"), col("ss").as("ssa"))
    val b = g.select(col("g").as("g_b"), col("n").as("nb"),
      col("s").as("sb"), col("ss").as("ssb"))
    val va = (col("ssa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("ssb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val sea = va / col("na")
    val seb = vb / col("nb")
    val se2 = sea + seb
    a.join(b, col("g_a") < col("g_b")) // bounded dim × dim, not data × data
      .select(col("g_a"), col("g_b"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("sa") / col("na") / 100.0, 4).as("mean_a"),
        round(col("sb") / col("nb") / 100.0, 4).as("mean_b"),
        round((col("sa") / col("na") - col("sb") / col("nb")) / sqrt(se2), 4)
          .as("t_stat"),
        round(se2 * se2 /
          (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)), 2)
          .as("df_welch"))
  }

  /** Exact weighted median per group over integer values with integer
    * weights: the smallest value whose cumulative weight reaches half
    * the group total. Values collapse to a (group, value) weight
    * dimension first, so the windowed cumulative sum runs over distinct
    * values, not rows — and everything stays integer-exact end to end.
    *
    * Scale shape: one (group, value)-keyed aggregate, one group-keyed
    * window over the collapsed dimension, one final min — shuffles
    * carry (group, value, weight) triples only.
    */
  def weightedMedian(df: DataFrame, groupCol: Column, valueCol: Column,
                     weightCol: Column): DataFrame = {
    val agg = df.select(groupCol.as("g"), valueCol.as("v"),
        weightCol.cast("long").as("w"))
      .where(col("v").isNotNull && col("w") > 0)
      .groupBy(col("g"), col("v")).agg(sum(col("w")).as("wv"))
    val cumW = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(col("g"))
    agg.withColumn("_cum", sum(col("wv")).over(cumW))
      .withColumn("_tot", sum(col("wv")).over(totW))
      .where(col("_cum") * 2 >= col("_tot"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("weighted_median"),
        max(col("_tot")).cast("long").as("total_weight"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic D = max |F_a(x) − F_b(x)|
    * between two groups' integer-cents distributions — the
    * distribution-shape drift test that sees what mean tests
    * ([[welchTTest]]/[[anovaF]]) cannot. The corpus reduces to a
    * per-value (count_a, count_b) dimension; ONE global cumulative
    * window over that aggregate (value domain, not rows — the
    * WindowAudit-sanctioned bounded construction) yields both empirical
    * CDFs, and D is a max over exact-integer ratios — engine-exact.
    */
  def ksTest(df: DataFrame, groupCol: Column, centsCol: Column,
             groupA: String, groupB: String): DataFrame = {
    val t = df.select(groupCol.as("g"), centsCol.cast("long").as("v"))
      .where(col("v").isNotNull && col("g").isin(groupA, groupB))
    val cnt = t.groupBy(col("v")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = cnt.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    cnt.withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"),
        count(lit(1)).as("n_values"),
        round(max(abs(col("cuma") / col("na") - col("cumb") / col("nb"))), 6)
          .as("ks_d"))
  }

  /** Exact per-group mode with a deterministic tie-break (highest
    * count, then smallest value): one (group, value) count aggregate,
    * then a group-keyed rank window over that bounded dimension.
    */
  def mode(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val cnt = df.select(groupCol.as("g"), valueCol.as("v"))
      .where(col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("g")).orderBy(col("n").desc, col("v").asc)
    cnt.withColumn("_rk", row_number().over(w))
      .where(col("_rk") === 1)
      .select(col("g"), col("v").as("mode_value"), col("n").as("n_occ"))
  }

  /** One-way ANOVA F statistic across all groups (the k-sample
    * generalization of [[welchTTest]]): between/within mean squares
    * from the same exact-integer (n, Σc, Σc²) per-group reduction —
    * SS_between = Σ s_g²/n_g − S²/N, SS_within = Σ(ss_g − s_g²/n_g) —
    * so the double arithmetic runs on exact sums and both engines
    * agree bitwise. One bounded aggregate over the group dimension;
    * the scan dominates.
    */
  def anovaF(df: DataFrame, groupCol: Column, centsCol: Column): DataFrame = {
    val g = df.select(groupCol.as("g"), centsCol.cast("double").as("c"))
      .where(col("c").isNotNull)
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
    g.agg(count(lit(1)).as("k"),
        sum(col("n")).as("bigN"),
        sum(col("s")).as("bigS"),
        sum(col("s") * col("s") / col("n")).as("sbn"),
        sum(col("ss")).as("sss"))
      .select(col("k"), col("bigN").cast("long").as("n"),
        ((col("sbn") - col("bigS") * col("bigS") / col("bigN")) /
          (col("k") - 1)).as("_msb"),
        ((col("sss") - col("sbn")) / (col("bigN") - col("k"))).as("_msw"),
        (col("k") - 1).cast("long").as("df1"),
        (col("bigN") - col("k")).cast("long").as("df2"))
      .select(col("k"), col("n"), col("df1"), col("df2"),
        round(col("_msb") / col("_msw"), 4).as("f_stat"))
  }

  /** Benford leading-digit audit of a positive integer-cents column:
    * observed count and share per digit 1–9 against the Benford
    * expectation log10(1 + 1/d), with the per-digit chi-square
    * contribution. The leading digit comes from the DECIMAL STRING of
    * the integer (substr of cast), not floor(log10) arithmetic — exact
    * in both engines at every power-of-ten boundary. One 9-row
    * aggregate; the scan dominates.
    */
  def benford(df: DataFrame, centsCol: Column): DataFrame = {
    val d = df.select(centsCol.cast("long").as("c")).where(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = d.agg(sum(col("n")).as("tot"))
    val expShare = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    d.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("tot"), 6).as("share"),
        round(expShare, 6).as("benford_share"),
        round((col("n") / col("tot") - expShare) * (col("n") / col("tot") - expShare) /
          expShare * col("tot"), 6).as("chi2_term"))
  }

  /** Spearman rank correlation per group between two columns — the
    * monotone-association complement of the Pearson `corr` in
    * `q_corr_regr` (robust to the heavy-tailed value distributions this
    * engine curates on). Ties get textbook AVERAGE ranks:
    * avgrank = rank + (t − 1)/2 with t the tie-group size — exact
    * halves, so the rank columns are bit-identical across engines and
    * only the final Pearson corr over ranks carries float rounding.
    *
    * Scale shape: two key-partitioned window sorts (one per variable;
    * the tie-count windows share their sort prefix so Catalyst fuses
    * each pair into one WindowExec) and a single corr aggregate —
    * shuffles carry (group, x, y) rows, nothing driver-side.
    */
  def spearman(df: DataFrame, groupCol: Column, xCol: Column, yCol: Column,
               roundTo: Int = 4): DataFrame = {
    val base = df.select(groupCol.as("g"), xCol.as("_x"), yCol.as("_y"))
    val rx = rank().over(Window.partitionBy(col("g")).orderBy(col("_x")))
    val ry = rank().over(Window.partitionBy(col("g")).orderBy(col("_y")))
    val tx = count(lit(1)).over(Window.partitionBy(col("g"), col("_x")))
    val ty = count(lit(1)).over(Window.partitionBy(col("g"), col("_y")))
    base
      .withColumn("_rx", rx + (tx - lit(1)) / lit(2.0))
      .withColumn("_ry", ry + (ty - lit(1)) / lit(2.0))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("_rx"), col("_ry")), roundTo).as("rho"))
  }

  /** CUPED variance reduction (Deng et al., WSDM 2013 — the standard
    * A/B-test sensitivity trick): adjust each unit's experiment-period
    * metric Y by its pre-period covariate X, Y' = Y − θ·(X − X̄) with
    * θ = cov(X,Y)/var(X) estimated pooled across arms, which shrinks
    * metric variance by the covariate's explained fraction without
    * biasing the arm contrast.
    *
    * Input is one row per (unit, arm) with exact integer-cents x
    * (pre-period) and y (experiment-period). Everything downstream is
    * IDENTITIES on exact per-arm sums (n, Σx, Σy, Σxx, Σyy, Σxy):
    *   mean'  = ȳ_g − θ·(x̄_g − x̄)
    *   var'   = var(Y)_g + θ²·var(X)_g − 2θ·cov(X,Y)_g
    * so no per-row adjusted value is ever materialized — the plan is
    * one unit-keyed aggregate (caller side), one arm-keyed aggregate,
    * and a broadcast one-row pooled θ. Sums accumulate as EXACT
    * integers — decimal(38,0), the HUGEINT twin, the q_moments
    * convention — and are cast to double exactly once at the aggregate
    * output, so one shared double expression tree follows and nothing
    * is summation-order-dependent at any scale (a double Σx² over cents
    * silently loses ulps past 2^53 ≈ 9·10¹⁵, which 10⁹ rows of ~10⁸
    * cents² reach; the moments family exists to rule that out).
    *
    * Degenerate inputs are defined, not NaN: var(X)=0 pooled (every
    * unit shares one pre-period value) ⇒ θ = 0 — no adjustment — and
    * an arm with var(Y)=0 reports var_reduction 0.0, both mirrored in
    * the SQL oracle so IEEE-vs-engine division-by-zero semantics never
    * meet the hash.
    *
    * Returns per arm: n_units, mean_post, mean_adj (currency units),
    * var_post, var_adj (cents²), var_reduction = 1 − var'/var.
    */
  def cuped(units: DataFrame, armCol: Column, xCentsCol: Column,
            yCentsCol: Column): DataFrame = {
    val u = units.select(armCol.as("g"),
      xCentsCol.cast("decimal(38,0)").as("x"),
      yCentsCol.cast("decimal(38,0)").as("y"))
    // exact integer sums; the .cast("double") on each aggregate output
    // is the single decimal→double step in the whole operator
    val g = u.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("x") * col("y")).cast("double").as("sxy"))
      .where(col("n") > 1)
    val pooled = u.agg(count(lit(1)).cast("double").as("pn"),
      sum(col("x")).cast("double").as("psx"),
      sum(col("y")).cast("double").as("psy"),
      sum(col("x") * col("x")).cast("double").as("psxx"),
      sum(col("x") * col("y")).cast("double").as("psxy"))
    val thetaDen = col("psxx") - col("psx") * col("psx") / col("pn")
    val theta = when(thetaDen === 0.0, lit(0.0))
      .otherwise((col("psxy") - col("psx") * col("psy") / col("pn")) / thetaDen)
    val xbar = col("psx") / col("pn")
    val varY = (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)
    val varX = (col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)
    val covXY = (col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1)
    val varAdj = varY + theta * theta * varX - lit(2.0) * theta * covXY
    g.crossJoin(broadcast(pooled)) // one pooled row — never data × data
      .select(col("g"),
        col("n").cast("long").as("n_units"),
        round(col("sy") / col("n") / 100.0, 4).as("mean_post"),
        round((col("sy") / col("n") - theta * (col("sx") / col("n") - xbar))
          / 100.0, 4).as("mean_adj"),
        round(varY, 2).as("var_post"),
        round(varAdj, 2).as("var_adj"),
        when(varY === 0.0, lit(0.0))
          .otherwise(round(lit(1.0) - varAdj / varY, 6)).as("var_reduction"))
  }

  /** Poisson(1) CDF thresholds, truncated at 7 — exact double literals
    * shared verbatim with every SQL oracle that mirrors the draw
    * (P[w > 6] ≈ 8.3e-5; the tail mass folds into the last weight).
    */
  private[graft] val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712)

  /** Poisson-bootstrap confidence interval for per-group means — the
    * resampling scheme that survives distribution (Chamandy et al. 2012,
    * "Estimating Uncertainty for Massive Data Streams", Google): drawing
    * n rows with replacement needs global coordination, but giving every
    * row an independent Poisson(1) weight per replicate approximates the
    * same multinomial and is one map-side expression. The whole R-way
    * bootstrap is a single corpus pass.
    *
    * Determinism contract: ONE md5 per row seeds a 48-bit value h (the
    * [[Sampling.md5Sample]] engine-portable hash contract); replicate
    * r's uniform is u = ((h·m(r)) mod 2^48 + 1)/2^48 with the odd
    * multiplier m(r) = 2·((r·1597334677) mod 2^14) + 1 — an odd
    * multiplier is a bijection mod 2^48, so each replicate sees a
    * uniform re-permutation of the row hashes, and the Fibonacci-style
    * mixing constant scatters consecutive replicates' multipliers
    * (sequential m(r) = 2r+1 made a fixed row's uniforms a Weyl
    * progression — correlated across replicates, which correlates
    * replicate means and can narrow the percentile CI). All arithmetic
    * is exact int64 (h < 2^48, m(r) < 2^15 ⇒ products < 2^63; the
    * r-mixing product is < 2^39), so any engine reproduces the draw
    * bit-for-bit; the Poisson(1) inverse CDF thresholds [[PoissonCdf]]
    * are shared literals. (Hashing (id, r) pairs directly costs R md5s
    * per row — measured 45 s at sf0.1; the per-row seed + integer
    * stream is the same map-only shape at ~one md5 per row.)
    *
    * Scale shape: NO ×R row expansion. Each row contributes its 48-bit
    * seed and cents ONCE to a typed aggregate ([[PoissonRepAgg]]) whose
    * buffer is the 2R-length per-replicate (Σw·c, Σw) array: the whole
    * replicate loop runs as compiled long arithmetic inside the
    * aggregate, and the corpus-keyed shuffle moves one partial array
    * per (partition, group) instead of R rows per input row — ~R× less
    * shuffle volume AND no per-element Catalyst expression evaluation
    * (the earlier explode shape spent its time there, not in the
    * shuffle). The u ≤ cdf(k) threshold tests run on exact integer
    * images T(k) = ⌊cdf(k)·2^48⌋ — v ≤ T(k) iff v/2^48 ≤ cdf(k), since
    * v ≤ 2^48 < 2^53 makes the double division exact — so the drawn
    * weights are bit-identical to the expression form and to every SQL
    * oracle mirroring the draw. The |G| aggregate rows then explode to
    * the bounded |G|·R replicate table for the exact percentile /
    * stddev aggs (builtin, so interpolation semantics are unchanged).
    * Element sums are exact int64 with a LOUD overflow
    * (Math.addExact): weights ≤ 7 keep Σw·c within 3 bits of Σ|c|, so
    * overflow needs ~1.3e18 summed cents in one group — far past any
    * tested scale, and wrapping silently is the one behavior this
    * discipline forbids. That bound is a DELIBERATE capability edge:
    * a group whose weighted cents approach 2^63 throws
    * ArithmeticException naming the add, where the pre-r13 decimal
    * shape kept going exactly; if a real corpus ever hits it, the fix
    * is a decimal(38,0) fallback buffer, not wider silent arithmetic.
    *
    * Null contract: rows with a null id or null cents are SKIPPED
    * (filtered before the aggregate) — the same null-propagation the
    * expression form had, where a null seed/cents made the weighted
    * product null. Without the filter the typed (Long, Long) input
    * encoder would instead fail the job on its null assertion.
    *
    * Returns per group: n, point mean, bootstrap [2.5%, 97.5%] interval
    * and standard error, in currency units (cents/100), rounded 4dp.
    */
  def poissonBootstrap(df: DataFrame, groupCol: Column, idCol: Column,
                       centsCol: Column, replicates: Int): DataFrame = {
    require(replicates > 1, s"replicates $replicates")
    require(replicates <= 256, s"replicates $replicates — the percentile " +
      "CI gains nothing past a few hundred replicates and each one is a " +
      "full corpus re-scan of the expanded stream; the multiplier stream " +
      "itself stays exact-int64 out to r < 2^14, so raise this knob " +
      "deliberately if a wider bootstrap is ever worth R corpus passes")
    val rows = df
      .where(idCol.isNotNull && centsCol.isNotNull) // null contract, see doc
      .select(groupCol.as("g"),
        conv(substring(md5(idCol.cast("string").cast("binary")), 1, 12),
          16, 10).cast("long").as("_h"), // one md5 per ROW, 48 bits
        centsCol.cast("long").as("_c"))
    val repSums = udaf(new PoissonRepAgg(replicates),
      ExpressionEncoder[(Long, Long)]())
    // ONE corpus-keyed pass: n, exact mean, and the 2R-length
    // per-replicate (Σw·c, Σw) sums in the same aggregate
    val agg = rows
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        (sum(col("_c").cast("decimal(38,0)")).cast("double") /
          count(lit(1))).as("_mean"),
        repSums(col("_h"), col("_c")).as("_b"))
    agg
      .select(col("g"), col("n"), col("_mean"),
        explode(arrays_zip(
          slice(col("_b"), 1, replicates).as("_swc"),
          slice(col("_b"), replicates + 1, replicates).as("_sw"))).as("_z"))
      .where(col("_z._sw") > 0) // a replicate that drew all-zero weights
      .select(col("g"), col("n"), col("_mean"),
        (col("_z._swc").cast("double") / col("_z._sw").cast("double"))
          .as("m"))
      .groupBy(col("g"))
      .agg(first(col("n")).as("n"), first(col("_mean")).as("_mean"),
        percentile(col("m"), lit(0.025)).as("_lo"),
        percentile(col("m"), lit(0.975)).as("_hi"),
        stddev_samp(col("m")).as("_se"))
      .select(col("g"), col("n"),
        round(col("_mean") / 100.0, 4).as("mean"),
        round(col("_lo") / 100.0, 4).as("ci_lo"),
        round(col("_hi") / 100.0, 4).as("ci_hi"),
        round(col("_se") / 100.0, 4).as("se_boot"))
  }

  /** Exact integer images of [[PoissonCdf]] on the 2^48 lattice:
    * v ≤ T(k) iff v/2^48 ≤ cdf(k) for integer v ∈ [1, 2^48] — the
    * division is exact in double (v < 2^53), so the integer compare
    * reproduces the double compare bit-for-bit. Computed through the
    * EXACT binary expansion of each threshold (new BigDecimal(double)),
    * not its decimal rendering.
    */
  private[graft] val PoissonCdfScaled: Array[Long] = PoissonCdf.map { t =>
    (new java.math.BigDecimal(t))
      .multiply(java.math.BigDecimal.valueOf(281474976710656L))
      .setScale(0, java.math.RoundingMode.FLOOR)
      .longValueExact()
  }.toArray

  /** Per-replicate (Σw·c, Σw) sums for [[poissonBootstrap]] as ONE
    * typed aggregate over (48-bit row seed, cents): buffer =
    * 2·`reps` longs (w·c sums then w sums); the replicate loop —
    * odd-multiplier scramble, mod 2^48, Poisson inverse-CDF on the
    * integer thresholds — runs as compiled long arithmetic, replacing
    * the ×R Catalyst expression evaluation the exploded shape paid
    * per element. Math.addExact/multiplyExact so an overflow fails
    * loudly instead of wrapping into a wrong interval.
    */
  private class PoissonRepAgg(reps: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    // m(r) = 2·((r·1597334677) mod 2^14) + 1 (see poissonBootstrap doc)
    private val mults: Array[Long] =
      Array.tabulate(reps)(r => ((r * 1597334677L) % 16384) * 2 + 1)
    override def zero: Array[Long] = new Array[Long](2 * reps)
    override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val h = in._1
      val c = in._2
      var r = 0
      while (r < reps) {
        val v = (h * mults(r)) % 281474976710656L + 1
        var w = 7L
        var k = 0
        while (k < 7) {
          if (v <= PoissonCdfScaled(k)) { w = k.toLong; k = 7 }
          else k += 1
        }
        b(r) = Math.addExact(b(r), Math.multiplyExact(w, c))
        b(reps + r) = Math.addExact(b(reps + r), w)
        r += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 2 * reps) { x(i) = Math.addExact(x(i), y(i)); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Delta-method variance for a ratio-of-sums metric — the
    * experimentation workhorse for per-user ratio metrics (revenue per
    * session, clicks per view), where the naive per-row variance is
    * wrong because the unit of randomization (user) contributes to both
    * numerator and denominator (Deng et al. 2018, "Applying the Delta
    * Method in Metric Analytics"). Per arm with K units,
    * R̂ = Σy/Σd and Var(R̂) ≈ (s²_y − 2R̂·s_yd + R̂²·s²_d)/(K·d̄²) from
    * the units' sample (co)variances.
    *
    * Scale shape: one keyed aggregate over units into exact
    * decimal(38,0) sums (y, d, y², d², yd — the [[cuped]] integer-moment
    * discipline), then pure double arithmetic on the |arms|-row result.
    * Arms with K ≤ 1 units or Σd = 0 are undefined and absent.
    *
    * Returns per arm: n_units, ratio, delta-method SE, and the normal
    * 95% interval, rounded 6dp.
    */
  def ratioMetric(units: DataFrame, armCol: Column, numCol: Column,
                  denCol: Column): DataFrame = {
    val u = units.select(armCol.as("g"),
      numCol.cast("decimal(38,0)").as("y"),
      denCol.cast("decimal(38,0)").as("d"))
    val g = u.groupBy(col("g"))
      .agg(count(lit(1)).cast("double").as("k"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("d")).cast("double").as("sd"),
        sum(col("y") * col("y")).cast("double").as("syy"),
        sum(col("d") * col("d")).cast("double").as("sdd"),
        sum(col("y") * col("d")).cast("double").as("syd"))
      .where(col("k") > 1 && col("sd") > 0)
    val r = col("sy") / col("sd")
    val dbar = col("sd") / col("k")
    val vy = (col("syy") - col("sy") * col("sy") / col("k")) / (col("k") - 1)
    val vd = (col("sdd") - col("sd") * col("sd") / col("k")) / (col("k") - 1)
    val cyd = (col("syd") - col("sy") * col("sd") / col("k")) / (col("k") - 1)
    val varR = (vy - lit(2.0) * r * cyd + r * r * vd) /
      (col("k") * dbar * dbar)
    val se = sqrt(greatest(varR, lit(0.0)))
    g.select(col("g"),
      col("k").cast("long").as("n_units"),
      round(r, 6).as("ratio"),
      round(se, 6).as("se_delta"),
      round(r - lit(1.959963984540054) * se, 6).as("ci_lo"),
      round(r + lit(1.959963984540054) * se, 6).as("ci_hi"))
  }

  /** Always-valid sequential test (mSPRT with a normal mixture) — the
    * fix for the A/B "peeking problem" (Johari, Koomen, Pekelis &
    * Walsh 2017, "Peeking at A/B Tests"): a fixed-horizon p-value read
    * daily inflates false positives, while the mixture sequential
    * probability ratio over the running estimator is valid at EVERY
    * look. For the two-arm mean difference δ̂ with estimated variance
    * V = s²(1/n_a + 1/n_b) and mixture variance τ²:
    * Λ = sqrt(V/(V+τ²))·exp(δ̂²τ²/(2V(V+τ²))), p_t = min(1, 1/Λ)
    * monotonically tightened over looks (running min).
    *
    * Scale shape: the corpus aggregates once into per-day exact
    * decimal(38,0) arm sums (the only corpus-keyed shuffle), then two
    * sanctioned unpartitioned windows run over that bounded DAY
    * dimension — cumulative sums and the running min — never over rows
    * (the WindowAuditSpec block-aggregate contract).
    *
    * Days where either arm has < 2 cumulative observations or the
    * pooled variance is 0 carry no test evidence and are absent.
    *
    * Returns per day: cumulative n_a/n_b, δ̂ in currency units, and the
    * always-valid p-value, rounded for engine parity.
    */
  def msprt(df: DataFrame, armCol: Column, dayCol: Column,
            centsCol: Column, tauSq: Double): DataFrame = {
    require(tauSq > 0, s"tauSq $tauSq")
    val d = df.select(armCol.as("_a"), dayCol.as("day"),
      centsCol.cast("decimal(38,0)").as("_c"))
    val one = lit(1).cast("decimal(38,0)")
    val zero = lit(0).cast("decimal(38,0)")
    val daily = d.groupBy(col("day")).agg(
      sum(when(col("_a") === 0, one).otherwise(zero)).as("na"),
      sum(when(col("_a") === 0, col("_c")).otherwise(zero)).as("sa"),
      sum(when(col("_a") === 0, col("_c") * col("_c")).otherwise(zero)).as("saa"),
      sum(when(col("_a") =!= 0, one).otherwise(zero)).as("nb"),
      sum(when(col("_a") =!= 0, col("_c")).otherwise(zero)).as("sb"),
      sum(when(col("_a") =!= 0, col("_c") * col("_c")).otherwise(zero)).as("sbb"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("day"),
      sum(col("na")).over(wCum).cast("double").as("cna"),
      sum(col("sa")).over(wCum).cast("double").as("csa"),
      sum(col("saa")).over(wCum).cast("double").as("csaa"),
      sum(col("nb")).over(wCum).cast("double").as("cnb"),
      sum(col("sb")).over(wCum).cast("double").as("csb"),
      sum(col("sbb")).over(wCum).cast("double").as("csbb"))
    val delta = col("csa") / col("cna") - col("csb") / col("cnb")
    val s2 = ((col("csaa") - col("csa") * col("csa") / col("cna")) +
      (col("csbb") - col("csb") * col("csb") / col("cnb"))) /
      (col("cna") + col("cnb") - 2)
    val v = s2 * (lit(1.0) / col("cna") + lit(1.0) / col("cnb"))
    val lam = sqrt(v / (v + tauSq)) *
      exp(delta * delta * tauSq / (lit(2.0) * v * (v + tauSq)))
    val scored = cum
      .where(col("cna") > 1 && col("cnb") > 1)
      .select(col("day"), col("cna"), col("cnb"), delta.as("_delta"),
        s2.as("_s2"), least(lit(1.0), lit(1.0) / lam).as("_p"))
      .where(col("_s2") > 0)
    scored.select(col("day"),
      col("cna").cast("long").as("n_a"),
      col("cnb").cast("long").as("n_b"),
      round(col("_delta") / 100.0, 4).as("delta"),
      round(min(col("_p")).over(wCum), 6).as("p_always_valid"))
  }

  /** Mann–Whitney U (Wilcoxon rank-sum) two-sample test — the
    * rank-based alternative [[welchTTest]] needs when means are the
    * wrong summary (heavy tails, outliers): U counts cross-group wins,
    * compared against its null mean with the tie-corrected normal
    * approximation. Everything reduces to the VALUE dimension first:
    * per-value total and group-A counts, one ordered window for the
    * below-count, then exact integer identities — 2·R_A accumulates as
    * Σ c_A·(2·below + ct + 1) in decimal(38,0) (average ranks are
    * half-integers, so doubling keeps them integer), and the tie term
    * Σ(t³ − t) likewise; one final double expression tree computes U,
    * z (round 4) and the [[twoSidedNormP]] p-value.
    *
    * Scale shape: one value-keyed aggregate (the only corpus-keyed
    * shuffle), one sanctioned unpartitioned window over the bounded
    * value dimension, one single-row reduction.
    */
  def mannWhitney(df: DataFrame, groupCol: Column, centsCol: Column,
                  gA: String, gB: String): DataFrame = {
    val v = df.select(groupCol.as("_g"), centsCol.cast("long").as("_v"))
      .where(col("_g") === gA || col("_g") === gB)
      .where(col("_v").isNotNull)
    val dim = v.groupBy(col("_v")).agg(
      count(lit(1)).as("_ct"),
      sum(when(col("_g") === gA, 1L).otherwise(0L)).as("_ca"))
    val w = Window.orderBy(col("_v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dim
      .withColumn("_below", sum(col("_ct")).over(w) - col("_ct"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = cum.agg(
      sum(dec(col("_ca"))).cast("double").as("na"),
      sum(dec(col("_ct") - col("_ca"))).cast("double").as("nb"),
      sum(dec(col("_ca")) *
        (dec(col("_below")) * 2 + dec(col("_ct")) + 1))
        .cast("double").as("r2a"),
      sum(dec(col("_ct")) * dec(col("_ct")) * dec(col("_ct")) -
        dec(col("_ct"))).cast("double").as("ties"))
      .where(col("na") > 0 && col("nb") > 0)
    val n = col("na") + col("nb")
    val u = col("r2a") / 2 - col("na") * (col("na") + 1) / 2
    val mu = col("na") * col("nb") / 2
    val sigma2 = col("na") * col("nb") / 12 *
      ((n + 1) - col("ties") / (n * (n - 1)))
    val z = round((u - mu) / sqrt(sigma2), 4)
    agg.where(sigma2 > 0)
      .select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        u.as("u_stat"), z.as("z"),
        twoSidedNormP(z).as("p_value"))
  }

  /** Two-proportion z-test with per-arm Wilson 95% intervals — the
    * conversion-rate experiment readout: pooled-variance z for the
    * difference, and the score interval (which behaves at small n and
    * extreme rates where the Wald interval collapses) for each arm.
    * One unit-keyed aggregate folds both arms into a single global row
    * (no join of any kind); p via [[twoSidedNormP]] on the rounded z.
    */
  def proportionTest(units: DataFrame, armCol: Column,
                     convertedCol: Column): DataFrame = {
    // both arms fold into ONE global aggregate row — no join of any
    // kind, the leanest possible plan for a 2×2 table
    val ab = units.select(armCol.as("_arm"),
        when(convertedCol, 1L).otherwise(0L).as("_cv"))
      .agg(
        sum(when(col("_arm") === 0, 1L).otherwise(0L)).cast("double").as("n_a"),
        sum(when(col("_arm") === 0, col("_cv")).otherwise(0L)).cast("double").as("x_a"),
        sum(when(col("_arm") =!= 0, 1L).otherwise(0L)).cast("double").as("n_b"),
        sum(when(col("_arm") =!= 0, col("_cv")).otherwise(0L)).cast("double").as("x_b"))
    val z0 = lit(1.959963984540054)
    def wilson(x: Column, n: Column): (Column, Column) = {
      val ph = x / n
      val denom = lit(1.0) + z0 * z0 / n
      val center = ph + z0 * z0 / (n * 2)
      val rad = z0 * sqrt(ph * (lit(1.0) - ph) / n +
        z0 * z0 / (n * n * 4))
      ((center - rad) / denom, (center + rad) / denom)
    }
    val p1 = col("x_a") / col("n_a")
    val p2 = col("x_b") / col("n_b")
    val pp = (col("x_a") + col("x_b")) / (col("n_a") + col("n_b"))
    val z = round((p1 - p2) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4)
    val (loA, hiA) = wilson(col("x_a"), col("n_a"))
    val (loB, hiB) = wilson(col("x_b"), col("n_b"))
    ab.where(col("n_a") > 0 && col("n_b") > 0 &&
        (col("x_a") + col("x_b")) > 0 &&
        (col("x_a") + col("x_b")) < (col("n_a") + col("n_b")))
      .select(col("n_a").cast("long").as("n_a"),
        col("x_a").cast("long").as("x_a"),
        round(p1, 6).as("rate_a"),
        round(loA, 6).as("wilson_lo_a"), round(hiA, 6).as("wilson_hi_a"),
        col("n_b").cast("long").as("n_b"),
        col("x_b").cast("long").as("x_b"),
        round(p2, 6).as("rate_b"),
        round(loB, 6).as("wilson_lo_b"), round(hiB, 6).as("wilson_hi_b"),
        z.as("z"), twoSidedNormP(z).as("p_value"))
  }

  /** Difference-in-differences over per-unit pre/post outcomes — the
    * panel-data causal readout: each unit's change d = post − pre nets
    * out its own level, and the estimate is the treated arms' mean
    * change minus the control's, with a Welch-style SE from the
    * per-arm change variances and the [[twoSidedNormP]] p on the
    * rounded z. Integer changes accumulate as decimal(38,0) moments
    * (the [[cuped]] discipline); both arms fold into ONE global
    * aggregate row via conditional sums — no join of any kind.
    * Degenerate families (an arm with < 2 units, or zero pooled
    * change variance) are absent rather than NaN.
    */
  def diffInDiff(units: DataFrame, armCol: Column, preCentsCol: Column,
                 postCentsCol: Column): DataFrame = {
    val u = units.select(armCol.as("_arm"),
      (postCentsCol.cast("decimal(38,0)") -
        preCentsCol.cast("decimal(38,0)")).as("_d"))
    val g = u.agg(
      count(when(col("_arm") === 0, 1)).cast("double").as("nc"),
      sum(when(col("_arm") === 0, col("_d")).otherwise(lit(0).cast("decimal(38,0)")))
        .cast("double").as("sc"),
      sum(when(col("_arm") === 0, col("_d") * col("_d"))
        .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("scc"),
      count(when(col("_arm") =!= 0, 1)).cast("double").as("nt"),
      sum(when(col("_arm") =!= 0, col("_d")).otherwise(lit(0).cast("decimal(38,0)")))
        .cast("double").as("st"),
      sum(when(col("_arm") =!= 0, col("_d") * col("_d"))
        .otherwise(lit(0).cast("decimal(38,0)"))).cast("double").as("stt"))
      .where(col("nc") > 1 && col("nt") > 1)
    val mc = col("sc") / col("nc")
    val mt = col("st") / col("nt")
    val vc = (col("scc") - col("sc") * col("sc") / col("nc")) / (col("nc") - 1)
    val vt = (col("stt") - col("st") * col("st") / col("nt")) / (col("nt") - 1)
    val did = mt - mc
    val se = sqrt(vt / col("nt") + vc / col("nc"))
    val z = round(did / se, 4)
    g.where(vc + vt > 0)
      .select(col("nc").cast("long").as("n_control"),
        col("nt").cast("long").as("n_treat"),
        round(mc / 100.0, 4).as("mean_diff_control"),
        round(mt / 100.0, 4).as("mean_diff_treat"),
        round(did / 100.0, 4).as("did"),
        round(se / 100.0, 4).as("se"),
        z.as("z"), twoSidedNormP(z).as("p_value"))
  }

  /** Sample-ratio-mismatch guardrail — the first check every experiment
    * readout runs: a 50/50 split whose arm counts differ more than
    * chance allows means broken assignment (bot filtering, redirect
    * loss), invalidating every downstream metric. Goodness-of-fit
    * chi-square against the even split reduces to
    * χ² = (n_a − n_b)²/n with 1 dof, and a 1-dof χ² is z², so the
    * p-value is exactly [[twoSidedNormP]](√χ²) — no gamma function
    * needed. One no-join global aggregate over units.
    */
  def srmCheck(units: DataFrame, armCol: Column): DataFrame = {
    val g = units.select(armCol.as("_arm"))
      .agg(
        sum(when(col("_arm") === 0, 1L).otherwise(0L)).cast("double").as("na"),
        sum(when(col("_arm") =!= 0, 1L).otherwise(0L)).cast("double").as("nb"))
      .where(col("na") + col("nb") > 0)
    val n = col("na") + col("nb")
    val chi2 = (col("na") - col("nb")) * (col("na") - col("nb")) / n
    val z = round(sqrt(chi2), 4)
    g.select(col("na").cast("long").as("n_a"),
      col("nb").cast("long").as("n_b"),
      round(col("na") / n, 6).as("share_a"),
      round(chi2, 4).as("chi2"),
      twoSidedNormP(z).as("p_value"))
  }

  /** Two-sided normal-tail p-value 2·(1 − Φ(|z|)) via the
    * Abramowitz–Stegun 7.1.26 erf polynomial (|err| < 1.5e-7): pure
    * exp/multiply arithmetic, so ANY engine given the same literals
    * computes the same doubles — the engine-portable route to p-values
    * where neither Spark nor a SQL oracle has erf/Φ builtins. Rounded
    * to 8 dp so downstream rank-based procedures ([[bhAdjust]]) order
    * identically across engines.
    */
  def twoSidedNormP(zCol: Column): Column = {
    val x = abs(zCol) / sqrt(lit(2.0))
    val u = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * u - lit(1.453152027)) * u +
      lit(1.421413741)) * u - lit(0.284496736)) * u + lit(0.254829592)) * u
    round(poly * exp(-(x * x)), 8)
  }

  /** Benjamini–Hochberg FDR adjustment over a family of m tests
    * (Benjamini & Hochberg 1995): rank the p-values ascending, raw
    * candidate m·p/i, adjusted p = the running minimum of the
    * candidates from the largest rank down (capped at 1) — the standard
    * step-up procedure that controls the expected false-discovery rate
    * when whole families of pairwise tests ([[welchTTest]]) are read at
    * once.
    *
    * Scale shape: the input is a TEST table — a bounded family (pairs
    * of groups, metrics × segments), never corpus rows — so the two
    * unpartitioned windows (rank, reverse running min) run over a
    * dimension; m comes from a one-row broadcast aggregate. Ties in p
    * order by `tieCols` for determinism; tied p-values receive the same
    * adjusted value under either order (they share the tail minimum).
    *
    * Returns the input columns plus rank and `p_adj` (round 6).
    */
  def bhAdjust(tests: DataFrame, pCol: Column,
               tieCols: Seq[Column]): DataFrame = {
    val m = tests.agg(count(lit(1)).cast("double").as("_m"))
    val ranked = tests.crossJoin(broadcast(m)) // one-row family size
      .withColumn("_rk",
        row_number().over(Window.orderBy(pCol.asc +: tieCols.map(_.asc): _*)))
    val wTail = Window.orderBy(col("_rk").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .withColumn("p_adj", round(
        min(least(lit(1.0), col("_m") * pCol / col("_rk"))).over(wTail), 6))
      .drop("_m")
      .withColumnRenamed("_rk", "rank")
  }

  /** Kaplan–Meier survival curve over per-user lifetimes (Kaplan &
    * Meier 1958) — the retention-analysis estimator that handles
    * right-censoring correctly: users still active at the observation
    * horizon leave the risk set without counting as churn. For each
    * observed lifetime t: n_risk = users with lifetime ≥ t, d = churn
    * events at t, S(t) = Π_{u ≤ t} (1 − d_u/n_u).
    *
    * Censoring rule: the global last observed day M is a one-row
    * broadcast aggregate; a user whose last event is within
    * `censorMarginDays` of M is censored (still alive as far as the
    * data can tell), otherwise their lifetime ended in churn.
    *
    * Scale shape: one user-keyed aggregate (the only corpus-keyed
    * shuffle), then a bounded LIFETIME dimension (≤ #days rows) carries
    * the reverse-cumulative risk set and the cumulative log-survival —
    * two sanctioned unpartitioned windows over an aggregate. The
    * product is exp(Σ ln(1 − d/n)): identical double trees in any
    * engine, and a level where d = n_risk sends survival to exactly 0.
    *
    * Returns per lifetime: n_risk, n_churn, survival (round 6).
    */
  def kaplanMeier(df: DataFrame, userCol: Column, dayCol: Column,
                  censorMarginDays: Int): DataFrame = {
    val ev = df.select(userCol.as("_u"), dayCol.cast("long").as("_d"))
    val users = ev.groupBy(col("_u"))
      .agg(min(col("_d")).as("_first"), max(col("_d")).as("_last"))
    val horizon = ev.agg(max(col("_d")).as("_hmax"))
    val lifetimes = users.crossJoin(broadcast(horizon)) // one-row bound
      .select((col("_last") - col("_first")).as("lifetime"),
        (col("_last") <= col("_hmax") - censorMarginDays).as("_churned"))
      .groupBy(col("lifetime"))
      .agg(count(lit(1)).as("_n"),
        sum(when(col("_churned"), 1L).otherwise(0L)).as("n_churn"))
    val wRisk = Window.orderBy(col("lifetime").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSurv = Window.orderBy(col("lifetime").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a level where everyone at risk churns (only possible at the last
    // level) zeroes survival via an explicit flag — ln(0) is an error
    // in some engines, so it never reaches a log call
    val wipeout = col("n_churn") >= col("n_risk")
    val term = when(wipeout, lit(0.0)).otherwise(
      log(lit(1.0) - col("n_churn").cast("double") / col("n_risk")))
    lifetimes
      .withColumn("n_risk", sum(col("_n")).over(wRisk))
      .withColumn("survival",
        when(max(when(wipeout, 1).otherwise(0)).over(wSurv) === 1, lit(0.0))
          .otherwise(round(exp(sum(term).over(wSurv)), 6)))
      .select(col("lifetime"), col("n_risk"), col("n_churn"),
        col("survival"))
  }

  /** Per-unit pairwise preference counts — the reduction that feeds
    * [[bradleyTerry]]: within each unit (user, session, annotator), every
    * unordered item pair is compared by its exact per-unit value sum and
    * the larger side takes the win; ties carry no signal and are
    * dropped (the Bradley–Terry likelihood has no tie term — use
    * Davidson's extension if ties must count).
    *
    * Scale shape: one (unit, item)-keyed exact decimal aggregate over
    * the corpus (the ONLY corpus-sized shuffle), then a unit-keyed
    * self-join whose per-unit fan-out is bounded by the item
    * dimension's square — items are a bounded vocabulary (arms, event
    * types, model variants), so the join output is |units|·C(|items|,2)
    * rows collapsing immediately into the C(|items|,2)-row pair
    * dimension. Returns (item_a < item_b, wins_a, wins_b, n_units) —
    * n_units counts only deciding (non-tied) units.
    */
  def pairwisePrefs(df: DataFrame, unitCol: Column, itemCol: Column,
                    centsCol: Column): DataFrame = {
    val sums = df.select(unitCol.as("_u"), itemCol.as("_i"),
        centsCol.cast("decimal(38,0)").as("_c"))
      .groupBy(col("_u"), col("_i"))
      .agg(sum(col("_c")).as("_s"))
    sums.select(col("_u"), col("_i").as("item_a"), col("_s").as("_sa"))
      .join(sums.select(col("_u"), col("_i").as("item_b"), col("_s").as("_sb")),
        Seq("_u"))
      .where(col("item_a") < col("item_b") && col("_sa") =!= col("_sb"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(sum(when(col("_sa") > col("_sb"), 1L).otherwise(0L)).as("wins_a"),
        sum(when(col("_sb") > col("_sa"), 1L).otherwise(0L)).as("wins_b"),
        count(lit(1)).as("n_units"))
  }

  /** Bradley–Terry preference strengths (Bradley & Terry 1952) from a
    * pairwise win-count table — the standard preference model behind
    * RLHF reward-data curation and A/B/n ranking: P(i beats j) =
    * sᵢ/(sᵢ+sⱼ), fitted by Hunter's MM iteration (Hunter 2004,
    * "MM algorithms for generalized Bradley–Terry models"):
    * sᵢ ← Wᵢ / Σ_{j≠i} nᵢⱼ/(sᵢ+sⱼ), renormalized to Σs = 1 each sweep.
    * A fixed sweep count with a sup-norm early exit keeps the fit
    * deterministic (no RNG, no data-dependent pivoting — the
    * [[graft.operators.Pca.jacobiEigen]] discipline). The MLE exists
    * iff every item both wins and loses at least once (Ford 1957's
    * connectivity condition, required here loudly — an undefeated item
    * diverges under MM).
    *
    * Scale shape: the input is already the bounded pair dimension
    * (C(|items|, 2) rows — see [[pairwisePrefs]]); the solve collects
    * it driver-side under a require()-capped item count (the
    * PQ-codebook / [[graft.operators.Pca]] eigensolve precedent) and
    * the result re-enters the plan as an |items|-row local relation.
    * Nothing here ever scales with corpus rows.
    *
    * Returns one row per item: (item, score round 6, wins, games),
    * scores summing to 1.
    */
  def bradleyTerry(prefs: DataFrame, itemACol: Column, itemBCol: Column,
                   winsACol: Column, winsBCol: Column,
                   sweeps: Int = 200, maxItems: Int = 4096): DataFrame = {
    val spark = prefs.sparkSession
    import spark.implicits._
    // collect is capped BEFORE it runs: a well-formed input is the pair
    // dimension, whose cardinality is bounded by C(maxItems, 2) — the
    // same bound the post-collect item check enforces, applied before
    // any Row materializes driver-side (the r9 maxItems² pre-cap still
    // admitted 16.7M rows ≈ several GB of driver Rows before the real
    // check could run). A corpus-sized frame passed by mistake fails
    // loudly naming the knob, never OOMs.
    val nPairs = prefs.count()
    require(nPairs <= maxItems.toLong * (maxItems - 1L) / 2L,
      s"bradleyTerry: $nPairs preference rows exceed the C(maxItems=" +
        s"$maxItems, 2) pair-dimension bound — pass the pairwisePrefs " +
        "reduction, not corpus rows")
    val rows = prefs.select(itemACol.cast("string"), itemBCol.cast("string"),
        winsACol.cast("long"), winsBCol.cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    require(items.length >= 2, "bradleyTerry: need at least two items")
    require(items.length <= maxItems,
      s"bradleyTerry: ${items.length} items > maxItems=$maxItems — the " +
        "solve is driver-side over the bounded item dimension; raise the " +
        "knob deliberately or shrink the item vocabulary")
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val wins = Array.ofDim[Double](k, k) // wins(i)(j) = wins of i over j
    rows.foreach { case (a, b, wa, wb) =>
      wins(idx(a))(idx(b)) += wa.toDouble
      wins(idx(b))(idx(a)) += wb.toDouble
    }
    val totW = Array.tabulate(k)(i => wins(i).sum)
    val totL = Array.tabulate(k)(j => (0 until k).map(i => wins(i)(j)).sum)
    (0 until k).foreach { i =>
      require(totW(i) > 0 && totL(i) > 0,
        s"bradleyTerry: item '${items(i)}' never ${if (totW(i) == 0) "wins"
          else "loses"} — the MLE does not exist (Ford 1957); merge or " +
          "drop degenerate items upstream")
    }
    var s = Array.fill(k)(1.0 / k)
    var sweep = 0
    var delta = Double.MaxValue
    while (sweep < sweeps && delta > 1e-14) {
      val next = Array.tabulate(k) { i =>
        var denom = 0.0
        var j = 0
        while (j < k) {
          val nij = wins(i)(j) + wins(j)(i)
          if (j != i && nij > 0) denom += nij / (s(i) + s(j))
          j += 1
        }
        totW(i) / denom
      }
      val z = next.sum
      var i = 0
      delta = 0.0
      while (i < k) {
        val v = next(i) / z
        delta = math.max(delta, math.abs(v - s(i)))
        i += 1
      }
      s = next.map(_ / z)
      sweep += 1
    }
    items.indices.map(i => (items(i), math.rint(s(i) * 1e6) / 1e6,
        totW(i).toLong, (totW(i) + totL(i)).toLong))
      .toDF("item", "bt_score", "wins", "games")
  }
}
