package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def docs = Seq(
    (1L, "hello world"),          // 11 bytes
    (2L, "spark"),                // 5 bytes
    (3L, "a" * 1000)              // 1000 bytes
  ).toDF("doc_id", "text").withColumn("lang", lit("en"))

  private def assets = assetsFromDocuments(docs)

  test("assetsFromDocuments: binary payload + typed metadata") {
    val a = assets.orderBy("asset_id").as[Asset].collect()
    a(0).content shouldBe "hello world".getBytes("UTF-8")
    a(0).duration_ms shouldBe 110L
    a(2).duration_ms shouldBe 10000L
    assets.schema("content").dataType.typeName shouldBe "binary"
  }

  test("imageFeatures: per-partition decode+embed, payload dropped, deterministic") {
    val f = imageFeatures(assets.as[Asset], dim = 4).orderBy("asset_id").collect()
    f.length shouldBe 3
    f(0).width shouldBe 12  // 11 % 640 + 1
    f(0).height shouldBe 12 // 11 % 480 + 1
    f(0).embedding.length shouldBe 4
    // deterministic across runs
    val f2 = imageFeatures(assets.as[Asset], dim = 4).orderBy("asset_id").collect()
    f2.map(_.embedding.toSeq) shouldBe f.map(_.embedding.toSeq)
    // embedding of "hello world": byte sum spread over 4 dims
    f(0).embedding.sum shouldBe ("hello world".getBytes("UTF-8").map(_ & 0xFF).sum / 255.0f) +- 0.01f
  }

  test("resize keeps schema, scales payload size") {
    val r = resize(assets.as[Asset], 50).orderBy("asset_id").collect()
    r(2).content.length shouldBe 500
    r(0).media_type shouldBe "video"
  }

  test("sampleFrames: n evenly spaced frames per video, declarative fan-out") {
    val fr = sampleFrames(assets, 4).orderBy("asset_id", "frame_idx")
      .as[(Long, Int, Long)].collect()
    fr.length shouldBe 12
    // doc 3: duration 10000 → frames at 0, 2500, 5000, 7500
    fr.filter(_._1 == 3L).map(_._3) shouldBe Array(0L, 2500L, 5000L, 7500L)
  }

  test("contentMeta: dedup keys without decoding") {
    val m = contentMeta(assets).orderBy("asset_id")
      .select("n_bytes", "content_md5").as[(Long, String)].collect()
    m(0)._1 shouldBe 11L
    m(0)._2 shouldBe "5eb63bbbe01eeed093cb22bb8f5acdc3" // md5("hello world")
  }
}
