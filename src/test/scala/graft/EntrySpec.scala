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
      "q_ivf_topk", "q_pq_topk", "q_ivfpq_topk", "q_ivfpq_rerank",
      "q_fingerprint", "q_approx_distinct",
      "q_embedding_neardup_lsh", "q_source_similarity", "q_kmeans_sizes",
      "q_approx_quantile", "q_knn_graph_lsh", "q_bpe_encode")
  }

  test("rows-only queries return their pinned sf0.001 row counts") {
    // the driver's check for un-oracled queries is rows > 0 only; this
    // pins the exact counts (all are deterministic — hash-derived or
    // fixed-k — so a drifting count means changed semantics, not noise)
    val expected = Map(
      "q_minhash_pairs" -> 28L,
      "q_simhash_pairs" -> 27L,
      "q_lsh_topk" -> 11L,
      "q_ivf_topk" -> 25L,
      "q_pq_topk" -> 25L,
      "q_ivfpq_topk" -> 25L,
      "q_ivfpq_rerank" -> 25L,
      "q_fingerprint" -> 500L,
      "q_approx_distinct" -> 3L,
      "q_embedding_neardup_lsh" -> 66L,
      "q_source_similarity" -> 190L,
      "q_kmeans_sizes" -> 8L,
      "q_approx_quantile" -> 3L,
      "q_knn_graph_lsh" -> 1500L,
      "q_bpe_encode" -> 500L)
    val dir = "/root/testdata/sf0.001"
    val got = expected.keys.toSeq.sorted
      .map(q => q -> SparkEntry.queries(q)(spark, dir).count()).toMap
    got shouldBe expected
  }
}
