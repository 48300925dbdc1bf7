package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Probes that the transformWithState near-dup processors also run in
  * BATCH mode (Spark 4 executes StatefulProcessors over batch Datasets
  * with ephemeral per-bucket state: every row of a bucket arrives in
  * ONE handleInputRows call). In batch there is no arrival order, so
  * the processors' ts-then-id newcomer sort IS the order — replay
  * determinism means the batch run must equal the streaming replay,
  * i.e. the batch LSH operators' canonical (lo < hi) pairs.
  */
class BatchTwsProbeSpec extends SparkSpec {
  import spark.implicits._

  test("minhashNeardupStream over a BATCH DataFrame equals the batch operator's pairs") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(timestamp_seconds(col("doc_id")).as("ts"), col("doc_id"), col("text"))
    val expected = Dedup.minhashPairs(docs.select(col("doc_id"), col("text")),
        "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    expected should not be empty
    val got = Streams.minhashNeardupStream(docs, "ts", "doc_id", "text")
      .select(col("first_id"), col("second_id"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect()
    got.length shouldBe got.toSet.size
    got.toSet shouldBe expected
  }

  test("embeddingNeardupStream over a BATCH DataFrame equals the batch LSH operator's pairs") {
    import graft.operators.Dedup
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))
    val (planes, bands) = Dedup.scaledBandGeometry(emb.count(), 3, 16)
    val expected = Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.3999995, planesPerBand = planes, bands = bands)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6))
      .as[(Long, Long, Double)].collect().toSet
    expected should not be empty
    val got = Streams.embeddingNeardupStream(
        emb.select(timestamp_seconds(col("vec_id")).as("ts"), col("vec_id"),
          col("embedding").as("vec")),
        "ts", "vec_id", "vec",
        threshold = 0.3999995, planesPerBand = planes, bands = bands)
      .select(col("first_id"), col("second_id"), round(col("cos_sim"), 6))
      .as[(Long, Long, Double)].collect()
    got.length shouldBe got.toSet.size
    got.toSet shouldBe expected
  }
}
