package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: media as
  * opaque `binary` columns + typed metadata, with decode / feature
  * extraction / resize / frame sampling as per-partition batch stages.
  *
  * The decode kernels are STUBS (no image/audio codecs in this
  * environment): each is a deterministic fake clearly marked below, kept
  * behind the same signatures a real codec would use. Everything around
  * them — schemas, the iterator-batched `mapPartitions` shape, the
  * explode-based frame fan-out, partition sizing — is the real Spark
  * plumbing and is tested.
  *
  * Scale design:
  *   - Binary payloads are the heaviest columns in the table; every
  *     stage projects them away as soon as derived features exist, so
  *     downstream shuffles (joins, dedup) never carry pixels.
  *   - Per-partition stages use `mapPartitions` on typed Datasets: one
  *     codec context per partition (the real-world cost model: decoder
  *     init is expensive, per-item decode is cheap), processing rows as
  *     a streamed iterator — no materialization of the whole partition.
  *   - `spark.sql.files.maxPartitionBytes` governs how many assets land
  *     per task; for ~1 MB assets the default 128 MB → ~128 assets/task,
  *     the right batch shape for vectorized codecs.
  */
object Multimodal {

  /** An asset row: opaque payload + typed metadata. */
  case class Asset(asset_id: Long, media_type: String, content: Array[Byte],
                   format: String, duration_ms: Long)
  case class ImageFeature(asset_id: Long, width: Int, height: Int,
                          embedding: Array[Float])
  case class Frame(asset_id: Long, frame_idx: Int, ts_ms: Long,
                   content: Array[Byte])

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType),
    StructField("media_type", StringType),
    StructField("content", BinaryType),
    StructField("format", StringType),
    StructField("duration_ms", LongType)))

  /** Deterministic synthetic assets derived from the documents table —
    * stands in for a real media table so the plumbing is exercised on
    * driver test data (TESTDATA.md): content = utf8 bytes, duration =
    * 10 ms per char.
    */
  def assetsFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("asset_id"),
      lit("video").as("media_type"),
      col("text").cast(BinaryType).as("content"),
      lit("fake/v1").as("format"),
      (length(col("text")) * 10L).cast(LongType).as("duration_ms"))

  // ------------------------------------------------------------- kernels

  /** STUB decode kernel: a real implementation would wrap an image codec
    * (JNI/FFI) initialized once per partition. The fake derives
    * deterministic "pixels" stats from the payload bytes so tests can
    * assert exact values.
    */
  private def stubDecode(content: Array[Byte]): (Int, Int) = {
    val n = content.length
    (n % 640 + 1, n % 480 + 1) // fake width×height
  }

  /** STUB embedding kernel: deterministic per-byte folding into a
    * fixed-dim float vector (a real kernel would run a vision encoder
    * over the decoded batch).
    */
  private def stubEmbed(content: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      v(i % dim) += (content(i) & 0xFF) / 255.0f
      i += 1
    }
    v
  }

  // -------------------------------------------------------------- stages

  /** Decode + embed: one pass per partition, streamed. Output drops the
    * binary payload — after this stage shuffles carry only features.
    */
  def imageFeatures(assets: Dataset[Asset], dim: Int = 16): Dataset[ImageFeature] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real codec: init decoder context HERE, once per partition
      it.map { a =>
        val (w, h) = stubDecode(a.content)
        ImageFeature(a.asset_id, w, h, stubEmbed(a.content, dim))
      }
    }
  }

  /** Resize: payload-in, payload-out per-partition stage (STUB: truncates
    * bytes proportionally; a real kernel re-encodes pixels). Keeps the
    * map-only, no-shuffle shape of a real resize pass.
    */
  def resize(assets: Dataset[Asset], scalePercent: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val keep = math.max(1, a.content.length * scalePercent / 100)
        a.copy(content = a.content.take(keep))
      }
    }
  }

  /** Frame sampling: fan a video row out into `n` evenly-spaced frame
    * rows. The fan-out is declarative (posexplode over a generated
    * index array — codegen'd, no UDF); only the per-frame payload slice
    * is stubbed. ts_ms(i) = i * duration/n.
    */
  def sampleFrames(assets: DataFrame, n: Int): DataFrame =
    assets
      .where(col("media_type") === "video")
      .select(col("asset_id"), col("duration_ms"),
        posexplode(sequence(lit(0), lit(n - 1))).as(Seq("_pos", "frame_idx")))
      .select(col("asset_id"), col("frame_idx").cast(IntegerType).as("frame_idx"),
        floor(col("frame_idx").cast(LongType) * col("duration_ms") / n)
          .cast(LongType).as("ts_ms"))

  /** Binary fingerprint + size metadata — exact-dedup keys for media
    * (the multimodal analogue of text dedup): no decode needed, so this
    * stays entirely in codegen.
    */
  def contentMeta(assets: DataFrame): DataFrame =
    assets.select(
      col("asset_id"),
      col("media_type"),
      length(col("content")).cast(LongType).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      xxhash64(col("content")).as("content_xx64"))
}
