package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("mixtureWeights: alpha=0.5 tempering gives the exact 3:1 hand case") {
    // X holds 90 of 100 tokens, Y 10: sqrt(.9):sqrt(.1) = 3:1 exactly,
    // so weights are 0.75/0.25 and shares 0.9/0.1
    val docs = Seq(("X", 50L), ("X", 40L), ("Y", 10L)).toDF("source", "nt")
    val got = Packing.mixtureWeights(docs, col("source"), col("nt"), alpha = 0.5)
      .orderBy("source")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    got shouldBe Seq(("X", 2L, 90L, 0.9, 0.75), ("Y", 1L, 10L, 0.1, 0.25))
  }

  test("packSequences: offsets equal a flat prefix sum regardless of block size") {
    val docs = (0L until 100L).map(i => (i, 1L + (i % 7))).toDF("doc_id", "toks")
    // ground truth: flat cumulative start offsets
    val flat = docs.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).scanLeft((-1L, 0L, 0L)) { case ((_, _, acc), (id, t)) =>
        (id, t, acc + t)
      }.drop(1).map { case (id, t, cum) => id -> (cum - t) / 30 }.toMap
    for (blockSize <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Packing.packSequences(docs, "doc_id", "toks", budget = 30L,
          blockSize = blockSize)
        .select("id", "seq_id").as[(Long, Long)].collect().toMap
      got shouldBe flat
    }
  }

  test("packSequences: every sequence except the last starts within budget boundaries") {
    val docs = (0L until 500L).map(i => (i, 5L + (i % 11))).toDF("doc_id", "toks")
    val seqs = Packing.packSequences(docs, "doc_id", "toks", budget = 100L, blockSize = 50L)
      .groupBy("seq_id").agg(sum("toks").as("n")).orderBy("seq_id")
      .as[(Long, Long)].collect()
    // seq ids are dense from 0 (documents straddle cuts, so every budget
    // window contains at least one document start here)
    seqs.map(_._1).toSeq shouldBe (0L until seqs.length.toLong)
    // total token conservation
    seqs.map(_._2).sum shouldBe docs.agg(sum("toks")).head().getLong(0)
  }

  test("packSequences plan: corpus window is partitioned by block, not global") {
    val docs = (0L until 100L).map(i => (i, 1L)).toDF("doc_id", "toks")
    val plan = Packing.packSequences(docs, "doc_id", "toks", budget = 30L, blockSize = 10L)
      .queryExecution.executedPlan.toString
    // the corpus-side window must carry the block partition key (spec =
    // partition keys then ordering); the only unpartitioned window is
    // over the bounded block-totals table
    (plan should include).regex("windowspecdefinition\\(_blk#\\d+L, id#")
  }

  test("sourceMixture keeps deterministic per-source fractions and drops unlisted sources") {
    val docs = (0L until 4000L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val keep = Packing.sourceMixture(docs, col("doc_id"), col("source"),
      Map("src0" -> "ff", "src1" -> "80", "src2" -> "1a"))
    val counts = docs.where(keep).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    counts.keySet shouldBe Set("src0", "src1", "src2") // src3 dropped
    counts("src0").toDouble / 1000 shouldBe 1.0 +- 0.01   // ff ≈ every prefix
    counts("src1").toDouble / 1000 shouldBe 0.5 +- 0.06   // 80/100 of 256
    counts("src2").toDouble / 1000 shouldBe 0.10 +- 0.04  // 1a = 26/256
    // deterministic: same rows again
    docs.where(keep).agg(sum("doc_id")).head().getLong(0) shouldBe
      docs.where(keep).agg(sum("doc_id")).head().getLong(0)
  }

  test("sourceMixture rejects mixed-length thresholds") {
    val docs = Seq((1L, "a")).toDF("doc_id", "source")
    an[IllegalArgumentException] should be thrownBy
      Packing.sourceMixture(docs, col("doc_id"), col("source"),
        Map("a" -> "ff", "b" -> "8"))
  }

  test("globalOrderIndex equals a flat row_number under the same order") {
    // order by (v, id); block = v / 10 is a monotone prefix of the key
    val rows = (0L until 500L).map(i => (i, (i * 37) % 100))
    val df = rows.toDF("id", "v")
    val flat = rows.sortBy { case (id, v) => (v, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val got = Packing.globalOrderIndex(df,
        floor(col("v") / 10).cast("int"), Seq(col("v"), col("id")))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    got shouldBe flat
  }

  test("globalOrderIndex plan: corpus window is partitioned by block") {
    val df = (0L until 100L).map(i => (i, i % 10)).toDF("id", "v")
    val plan = Packing.globalOrderIndex(df,
        col("v").cast("int"), Seq(col("v"), col("id")))
      .queryExecution.executedPlan.toString
    (plan should include).regex("windowspecdefinition\\(_blk#\\d+,")
  }

  test("globalOrderIndex keeps null-keyed rows (they rank first, ids break ties)") {
    val df = Seq((1L, Some("b")), (2L, None), (3L, Some("a")), (4L, None))
      .toDF("id", "k")
    val got = Packing.globalOrderIndex(df,
        substring(col("k"), 1, 1), Seq(col("k"), col("id")))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    got.keySet shouldBe Set(1L, 2L, 3L, 4L) // nothing silently dropped
    got.values.toSeq.sorted shouldBe Seq(1L, 2L, 3L, 4L) // a total rank
    got(2L) shouldBe 1L // nulls first, id tiebreak
    got(4L) shouldBe 2L
    got(3L) shouldBe 3L // "a" before "b"
    got(1L) shouldBe 4L
  }

  test("ntileFromRank matches the NTILE window for every (n, k) regime") {
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 3, 4, 7, 12, 13); k <- Seq(1, 2, 4, 5)) {
      val df = (1 to n).map(_.toLong).toDF("rank")
      val got = df.select(col("rank"),
          Packing.ntileFromRank(col("rank"), lit(n.toLong), k).as("bin"))
        .as[(Long, Int)].collect().toMap
      val want = df.select(col("rank"),
          ntile(k).over(Window.orderBy(col("rank"))).as("bin"))
        .as[(Long, Int)].collect().toMap
      withClue(s"n=$n k=$k: ") { got shouldBe want }
    }
  }

  test("chunkByTokens: stride windows cover the doc, stop rule, edge cases") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: chunks at 0, 4
      (2L, "a b c"),                                  // ≤ size: one chunk
      (3L, "")                                        // empty: one empty chunk
    ).toDF("doc_id", "text")
    val got = Packing.chunkByTokens(docs, "doc_id", "text", chunkSize = 8, stride = 4)
      .orderBy("id", "chunk_idx")
      .as[(Long, Long, String, Long)].collect()
    got.filter(_._1 == 1L).map(c => (c._2, c._4)) shouldBe Seq((0L, 8L), (1L, 6L))
    got.filter(_._1 == 1L).head._3 shouldBe (1 to 8).map(i => s"t$i").mkString(" ")
    got.filter(_._1 == 1L).last._3 shouldBe (5 to 10).map(i => s"t$i").mkString(" ")
    got.filter(_._1 == 2L) shouldBe Seq((2L, 0L, "a b c", 3L))
    got.filter(_._1 == 3L) shouldBe Seq((3L, 0L, "", 0L))
    // no chunk that is a strict suffix of the previous window: 12 tokens
    // at size 8 / stride 4 stops after starts 0 and 4 (4+8 covers 12)
    val twelve = Seq((9L, (1 to 12).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    Packing.chunkByTokens(twelve, "doc_id", "text", 8, 4).count() shouldBe 2L
  }
}
