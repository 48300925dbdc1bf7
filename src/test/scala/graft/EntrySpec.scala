package graft

/** The driver's smoke contract: entry() on sf0.001 must return rows. */
class EntrySpec extends SparkSpec {
  test("entry flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
    df.columns should contain allOf("type_class", "l_returnflag", "revenue", "n_items")
  }

  test("every declared query has either an oracle or a documented rows-only status") {
    val qs = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    oracled.diff(qs) shouldBe empty // no orphan oracles
    val rowsOnly = qs.diff(oracled)
    // the full rows-only list — additions here must be justified in SURVEY §8
    rowsOnly shouldBe Set("q_minhash_pairs", "q_simhash_pairs", "q_lsh_topk",
      "q_ivf_topk", "q_pq_topk", "q_ivfpq_topk", "q_fingerprint", "q_approx_distinct",
      "q_embedding_neardup_lsh", "q_source_similarity", "q_kmeans_sizes",
      "q_approx_quantile")
  }
}
