package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}

/** Audit: no declared query may run an unpartitioned window over an
  * unbounded input. The library's two-level prefix-sum construction
  * (Packing.packSequences / globalOrderIndex) deliberately runs ONE
  * global window over the *block-aggregate* table — a bounded dimension
  * (corpus / blockSize rows), never the corpus — and Bench silences
  * WindowExec's single-partition warning on that justification. This
  * spec is what keeps the justification honest: it walks every declared
  * query's optimized plan, collects unpartitioned Window nodes, and
  * asserts (a) only the pinned allowlist of queries has any, and (b)
  * each such window's child subtree contains the Aggregate that bounds
  * it. A new unpartitioned window anywhere else fails here — visible at
  * test time even with the runtime log quiet.
  */
class WindowAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("unpartitioned windows: only over block-aggregate tables, only in pinned queries") {
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val bare = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      val unbounded = bare.filterNot(w =>
        w.child.collectFirst { case a: Aggregate => a }.isDefined)
      (name, bare.size, unbounded.size)
    }
    val withBare = findings.filter(_._2 > 0).map(_._1).toSet
    val withUnbounded = findings.filter(_._3 > 0).map(_._1)
    // every unpartitioned window must sit above an aggregate (the
    // bounded block/dimension table), never directly above corpus rows
    withUnbounded shouldBe empty
    // and the set of queries that use the construction at all is pinned
    withBare shouldBe Set(
      "q_pack_sequences", "q_shuffle_rank", "q_quality_bins",
      "q_jaro", "q_gini", "q_pareto_docs",
      // KS: one global cumsum over the per-value COUNT dimension (the
      // value domain, not corpus rows) — the sanctioned construction
      "q_ks_test",
      // Zipf: globalOrderIndex over the (term, freq) VOCABULARY
      // dimension — the offsets window ranks distinct-frequency blocks,
      // never corpus rows
      "q_zipf_fit",
      // gains: globalOrderIndex block offsets + the cumulative windows
      // over the 10-row DECILE aggregate
      "q_gains",
      // mSPRT: cumulative sums + running-min p over the per-day arm
      // aggregate — the DAY dimension, never corpus rows
      "q_sequential_test",
      // BH: rank + reverse running min over the bounded pairwise-test
      // family (welch's group-pair aggregate)
      "q_fdr_adjust",
      // Kaplan–Meier: risk-set and log-survival windows over the
      // bounded per-lifetime aggregate (and its pure-SQL twin)
      "q_survival", "q_survival_sql",
      // Mann–Whitney: the below-count window over the per-value
      // aggregate — the KS/value-dimension construction
      "q_mann_whitney",
      // DSIR: the totals fold as one global sum over the bucket-BOUNDED
      // dim aggregate (≤ `buckets` rows) — replacing the crossJoin
      // broadcast(tot) whose racing build re-ran the gram kernel (r16)
      "q_dsir", "q_dsir_sql")
  }
}
