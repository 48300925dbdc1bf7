package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    df.select(valueCol.as("_v")).crossJoin(broadcast(bounds))
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
    val v = df.select(col(groupCol).as("_s_grp"), valueCol.as("_s_v"))
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

  /** Per-group Shannon entropy (nats) of a discrete column: H = −Σ p·ln p
    * over the group's value distribution, plus the distinct-value and
    * total counts. The inner aggregate reduces the data to one row per
    * (group, value) before any division happens, so the entropy sum runs
    * over the bounded dictionary, not the corpus.
    */
  def entropy(df: DataFrame, groupCol: String, valueCol: Column): DataFrame = {
    val counts = df.select(col(groupCol).as("_s_grp"), valueCol.as("_s_v"))
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
}
