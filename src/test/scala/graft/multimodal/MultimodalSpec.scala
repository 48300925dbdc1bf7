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

  test("resize keeps schema, scales payload size (non-image stub path)") {
    val r = resize(assets.as[Asset], 50).orderBy("asset_id").collect()
    r(2).content.length shouldBe 500
    r(0).media_type shouldBe "video"
  }

  test("resize re-renders REAL image pixels: scaled dimensions, fill preserved") {
    val img = new java.awt.image.BufferedImage(8, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8) img.setRGB(x, y, 0x646464) // gray 100
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(Asset(1L, "image", bos.toByteArray, "image/png", 0L)).toDS()
    val out = resize(ds, 50).head()
    val dec = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out.content))
    dec.getWidth shouldBe 4
    dec.getHeight shouldBe 3
    // constant fill survives bilinear resampling exactly
    (dec.getRGB(2, 1) & 0xFFFFFF) shouldBe 0x646464
    // 1×1 floor: shrinking below a pixel clamps, never crashes
    val tiny = resize(ds, 1).head()
    val td = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tiny.content))
    (td.getWidth, td.getHeight) shouldBe ((1, 1))
  }

  test("sampleFrames: n evenly spaced frames per video, declarative fan-out") {
    val fr = sampleFrames(assets, 4).orderBy("asset_id", "frame_idx")
      .as[(Long, Int, Long)].collect()
    fr.length shouldBe 12
    // doc 3: duration 10000 → frames at 0, 2500, 5000, 7500
    fr.filter(_._1 == 3L).map(_._3) shouldBe Array(0L, 2500L, 5000L, 7500L)
  }

  test("imageFeatures decodes REAL PNG pixels via ImageIO: exact dimensions and band luminance") {
    // build actual PNGs in-memory: 8×6 at gray 100, 3×2 at gray 0
    def png(w: Int, h: Int, gray: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val imgs = Seq(
      Asset(1L, "image", png(8, 6, 100), "image/png", 0L),
      Asset(2L, "image", png(3, 2, 0), "image/png", 0L)).toDS()
    val f = imageFeatures(imgs, dim = 4).orderBy("asset_id").collect()
    // REAL decoded dimensions — the stub would report len%640+1/len%480+1
    f(0).width shouldBe 8
    f(0).height shouldBe 6
    f(1).width shouldBe 3
    f(1).height shouldBe 2
    // constant fill → every band's mean luminance is exactly 3·g/765
    f(0).embedding.toSeq shouldBe Seq.fill(4)((300.0 / 765.0).toFloat)
    f(1).embedding.toSeq shouldBe Seq.fill(4)(0.0f)
  }

  test("imageFeatures: gradient PNG band luminance follows the pixel rows") {
    // 4 rows, each row its own gray: bands (dim=4) pick up row means
    val img = new java.awt.image.BufferedImage(2, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 2) {
      val g = y * 60
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val ds = Seq(Asset(9L, "image", bos.toByteArray, "image/png", 0L)).toDS()
    val f = imageFeatures(ds, dim = 4).head()
    f.embedding.toSeq shouldBe (0 until 4).map(y => (y * 60 * 3 / 765.0).toFloat)
  }

  test("non-image formats fall back to the documented stub kernel") {
    val f = imageFeatures(assets.as[Asset], dim = 4).orderBy("asset_id").head()
    f.width shouldBe 12 // "hello world" bytes: 11 % 640 + 1 — stub arithmetic
  }

  test("undecodable bytes under an image format fall back to the stub, not a crash") {
    val junk = Seq(Asset(5L, "image", Array[Byte](1, 2, 3), "image/png", 0L)).toDS()
    val f = imageFeatures(junk, dim = 4).head()
    f.width shouldBe 4 // stub: 3 % 640 + 1
    f.height shouldBe 4
  }

  // build an actual 16-bit PCM mono WAV in-memory from explicit samples
  private def wav(sampleRate: Float, samples: Array[Int]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFeatures decodes REAL WAV samples: exact rate, frames, duration, band RMS") {
    // 8 kHz, 400 frames: first half constant 8192, second half constant -16384
    val samples = Array.fill(200)(8192) ++ Array.fill(200)(-16384)
    val ds = Seq(Asset(1L, "audio", wav(8000f, samples), "audio/wav", 0L)).toDS()
    val f = audioFeatures(ds, dim = 2).head()
    f.sample_rate shouldBe 8000
    f.channels shouldBe 1
    f.n_frames shouldBe 400L
    f.duration_ms shouldBe 50L // 400 frames / 8 kHz
    // RMS of a constant signal v is exactly |v|/32768
    f.rms.toSeq shouldBe Seq(0.25f, 0.5f)
  }

  test("audioFeatures is deterministic and drops the payload column") {
    val ds = Seq(
      Asset(1L, "audio", wav(16000f, Array.fill(160)(1000)), "audio/wav", 0L),
      Asset(2L, "audio", wav(8000f, Array.fill(80)(-2000)), "audio/wav", 0L)).toDS()
    val f1 = audioFeatures(ds, dim = 4).orderBy("asset_id").collect()
    val f2 = audioFeatures(ds, dim = 4).orderBy("asset_id").collect()
    f1.map(_.rms.toSeq) shouldBe f2.map(_.rms.toSeq)
    f1(0).duration_ms shouldBe 10L // 160 / 16 kHz
    f1(1).duration_ms shouldBe 10L // 80 / 8 kHz
    audioFeatures(ds, dim = 4).schema.fieldNames should not contain "content"
  }

  test("non-WAV audio payloads fall back to the documented stub, not a crash") {
    val junk = Seq(Asset(7L, "audio", Array[Byte](1, 2, 3), "audio/mp3", 123L)).toDS()
    val f = audioFeatures(junk, dim = 4).head()
    f.sample_rate shouldBe 0 // stub marker: real rates only from real decodes
    f.duration_ms shouldBe 123L // metadata passthrough
  }

  test("contentMeta: dedup keys without decoding") {
    val m = contentMeta(assets).orderBy("asset_id")
      .select("n_bytes", "content_md5").as[(Long, String)].collect()
    m(0)._1 shouldBe 11L
    m(0)._2 shouldBe "5eb63bbbe01eeed093cb22bb8f5acdc3" // md5("hello world")
  }

  /** Textured PNG: pseudo-random gray per (seed, x, y) — the fixture
    * pattern q_image_dhash uses, reproduced independently here.
    */
  private def texturedPng(seed: Long, w: Int, h: Int,
                          patch: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      var g = ((((seed ^ (x * 73856093L) ^ (y * 19349663L)) *
        2654435761L) >>> 24) & 0xFF).toInt
      if (patch && x < 3 && y < 3) g = g ^ 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64: exact copy hashes identically; re-encode-at-same-pixels too") {
    val bytes = texturedPng(42L, 32, 24)
    val ds = Seq(
      Asset(1L, "image", bytes, "image/png", 0L),
      Asset(2L, "image", bytes.clone(), "image/png", 0L)).toDS()
    val h = Multimodal.dHash64(ds).orderBy("asset_id")
      .select("dhash").as[Long].collect()
    h(0) shouldBe h(1)
  }

  test("dHash64: corner perturbation moves few bits, unrelated textures ~half") {
    val ds = Seq(
      Asset(1L, "image", texturedPng(42L, 32, 24), "image/png", 0L),
      Asset(2L, "image", texturedPng(42L, 32, 24, patch = true), "image/png", 0L),
      Asset(3L, "image", texturedPng(777L, 32, 24), "image/png", 0L)).toDS()
    val h = Multimodal.dHash64(ds).orderBy("asset_id")
      .select("dhash").as[Long].collect()
    val perturbed = java.lang.Long.bitCount(h(0) ^ h(1))
    val unrelated = java.lang.Long.bitCount(h(0) ^ h(2))
    perturbed should be <= 6
    unrelated should be >= 16 // E=32 for independent textures
  }

  test("dHash64: codec-less payloads take the deterministic stub grid") {
    val ds = Seq(
      Asset(9L, "video", "some payload bytes".getBytes("UTF-8"), "fake/v1", 0L),
      Asset(10L, "video", "some payload bytes".getBytes("UTF-8"), "fake/v1", 0L)).toDS()
    val h = Multimodal.dHash64(ds).select("dhash").as[Long].collect()
    h(0) shouldBe h(1) // deterministic, no crash
  }

  test("dHash64 is brightness-shift invariant (gradient signs survive)") {
    // same texture, +40 gray on every pixel (clamped): dHash compares
    // NEIGHBOR means, so a global shift flips (almost) no bits
    def shifted(seed: Long, w: Int, h: Int, add: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = ((((seed ^ (x * 73856093L) ^ (y * 19349663L)) *
          2654435761L) >>> 24) & 0xFF).toInt
        val g = math.min(255, math.max(0, base / 2 + add)) // halved → no clip
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      Asset(1L, "image", shifted(42L, 32, 24, 0), "image/png", 0L),
      Asset(2L, "image", shifted(42L, 32, 24, 40), "image/png", 0L)).toDS()
    val h = Multimodal.dHash64(ds).orderBy("asset_id")
      .select("dhash").as[Long].collect()
    // ties (equal neighbor means) may flip either way under a shift of
    // the halved texture; require near-identity, not equality
    java.lang.Long.bitCount(h(0) ^ h(1)) should be <= 2
  }

  test("distributed gradient corpus dHash ≡ driver fixture dHash") {
    // the ScaleDiag decade probes key on the distributed builder past
    // the fixture's doc cap — this pins the two paths bit-identical
    // (shared gradPngBytes render) where both can run
    val dir = "/root/testdata/sf0.001"
    val fixture = spark.read.schema(Multimodal.assetSchema)
      .parquet(graft.EntryContext.gradPngAssetsFixture(spark, dir))
      .as[Multimodal.Asset]
    val fromFixture = Multimodal.dHash64(fixture)
      .select("asset_id", "dhash").as[(Long, Long)].collect().toSet
    val fromDistributed = Multimodal.dHash64(
        graft.EntryContext.gradPngAssetsDistributed(spark, dir))
      .select("asset_id", "dhash").as[(Long, Long)].collect().toSet
    fromFixture should not be empty
    fromDistributed shouldBe fromFixture
  }
}
