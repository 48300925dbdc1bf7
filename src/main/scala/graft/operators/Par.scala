package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Idle-capacity spreads for CPU-dense stages (guide §2.6).
  *
  * At modest input sizes two Spark mechanisms serialize compute-heavy
  * work regardless of core count: a parquet input below one scan split
  * (`spark.sql.files.maxPartitionBytes`, or a single row group) yields
  * a ONE-TASK scan, and AQE's byte-based partition coalescing packs
  * small shuffles into one task even when the work per row is large.
  * Both are the right default for I/O-bound plans and exactly wrong
  * when an expensive per-row kernel or aggregation buffer sits on top:
  * one core computes while the rest idle.
  *
  * [[spreadSmallScan]] inserts ONE deterministic hash repartition to
  * the cluster's default parallelism — but only when the optimizer's
  * own size estimate says the child cannot fill the cores via scan
  * splits anyway (estimate ≤ one split). At any real scale the
  * estimate exceeds the bound and the call is an identity, so the
  * exchange exists only in the regime where the plan was otherwise
  * serial; the rows it moves are by construction less than one split.
  * Keys must be provided (deterministic hash partitioning, never
  * round-robin — guide §2.5's retry-duplication caveat).
  */
object Par {

  /** Upper bound on the size estimate for which a spread fires: one
    * scan split (`spark.sql.files.maxPartitionBytes`) — inputs past it
    * split on their own.
    */
  private def oneSplitBytes(df: DataFrame): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"))

  def spreadSmallScan(df: DataFrame, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "spreadSmallScan needs deterministic hash keys")
    val p = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // partition on xxhash64(keys), NOT the raw keys: a raw-key spread
    // whose key set is a subset of a downstream aggregate's grouping
    // SATISFIES that aggregate's distribution, which deletes the
    // aggregate's own exchange — and with it the runtime exchange-reuse
    // point that made multi-consumer plans evaluate the kernel once
    // (measured on q_dsir/q_bigram_logprob: the gram kernel re-ran per
    // consumer branch, 3–6x the task time). A derived hash expression
    // satisfies nothing downstream, so every consumer keeps its own
    // exchange above the spread and reuse dedupes the kernel again.
    if (p > 1 && est <= oneSplitBytes(df))
      df.repartition(p, org.apache.spark.sql.functions.xxhash64(keys: _*))
    else df
  }

  /** SQL-surface twin of [[spreadSmallScan]]: the `REPARTITION` hint
    * text (empty past the one-split bound) for splicing into a SQL
    * query whose scan reads the same input as `df`.
    */
  def spreadSmallScanHint(df: DataFrame, key: String): String = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (p > 1 && est <= oneSplitBytes(df)) s"/*+ REPARTITION($p, $key) */ "
    else ""
  }
}
