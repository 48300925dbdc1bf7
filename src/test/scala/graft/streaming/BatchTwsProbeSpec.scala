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
}
