package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the downsampling stage of a training
  * pipeline (per-source quotas, rate capping) without RNG state: every
  * decision is a pure function of the row's key, so re-runs, retries and
  * speculative tasks agree, and the sample is reproducible across
  * clusters by construction.
  *
  * Scale notes: [[hashSample]] is a map-only filter (pushes down to the
  * scan when the key is a stored column). [[stratifiedExact]] shuffles
  * once on the stratum key; its per-stratum sort is WindowGroupLimit-
  * pruned map-side to the quota, so the exchange carries ≤ quota rows
  * per (task, stratum), not the stratum.
  */
object Sampling {

  /** Keep ~fraction of rows: xxhash64(key) uniformly fills the 64-bit
    * space, so thresholding keeps a deterministic pseudo-random subset.
    * Production default (one 64-bit hash per row, codegen'd).
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    // pmod to [0, 2^20) then threshold — avoids Long-boundary edge cases
    val buckets = 1 << 20
    df.where(pmod(xxhash64(keyCol), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** Same contract via md5-hex thresholding — slower (string hash) but
    * bit-identical in any engine with a standard md5 (the oracle-parity
    * variant; DuckDB/Trino/Spark agree on md5 hex of the same bytes).
    */
  def md5Sample(df: DataFrame, keyCol: Column, hexPrefixBelow: String): DataFrame =
    df.where(substring(md5(keyCol.cast("string").cast("binary")), 1,
      hexPrefixBelow.length) < hexPrefixBelow)

  /** Weighted sampling without replacement, k per stratum — the
    * Efraimidis–Spirakis A-ES scheme: each row draws a deterministic
    * uniform u ∈ (0, 1] from its id's md5 (first 12 hex chars / 2^48,
    * the same engine-portable md5 contract as [[md5Sample]]) and is
    * ranked by u^(1/weight); the top k per stratum are the sample.
    * Selection probability is proportional to weight, re-runs and
    * engines agree because there is no RNG state. The score is ROUNDED
    * to 9 dp before ranking (with the id as tiebreak) so a last-ulp
    * `pow` difference between engines cannot reorder the cut.
    *
    * Map-only until the per-stratum top-k window, which
    * WindowGroupLimit prunes to ≤ k rows per task before the exchange.
    */
  def weightedSample(df: DataFrame, stratumCol: Column, idCol: Column,
                     weightCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k $k")
    // 'score' is part of the OUTPUT contract (callers select it by name),
    // so it cannot be renamed collision-safely like the scratch rank
    // column — fail loudly instead of silently overwriting a user column
    require(!df.columns.contains("score"),
      "weightedSample reserves the output column name 'score'; rename the " +
        "input's 'score' column before sampling")
    val hx = conv(substring(md5(idCol.cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")
    val u = (hx + 1).cast("double") / lit(281474976710656.0) // 2^48
    val score = round(pow(u, lit(1.0) / weightCol), 9)
    val w = Window.partitionBy(stratumCol).orderBy(score.desc, idCol.asc)
    val rk = Iterator.from(0).map(i => s"__graft_rk_$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn("score", score)
      .withColumn(rk, row_number().over(w))
      .where(col(rk) <= k)
      .drop(rk)
  }

  /** Exactly `quota` rows per stratum (fewer if the stratum is smaller),
    * chosen by deterministic hash order with the id as tiebreak.
    */
  def stratifiedExact(df: DataFrame, stratumCol: Column, idCol: Column,
                      quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(idCol.cast("string").cast("binary")).asc, idCol.asc)
    // collision-safe working column: never overwrite (or return) a user
    // column that happens to share the scratch name
    val rk = Iterator.from(0).map(i => s"__graft_rk_$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rk, row_number().over(w))
      .where(col(rk) <= quota)
      .drop(rk)
  }
}
