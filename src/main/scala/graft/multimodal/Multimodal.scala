package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * stages. The Spark-side shape (schema, batching, partition-local
  * processing) is real, and so is the image path: [[ImageIoCodec]] decodes
  * and resamples PNG/BMP/GIF/JPEG with the JDK's built-in readers (no new
  * dependency). Non-image payloads (audio/video — no JDK codec exists)
  * fall back to the deterministic [[FakeCodec]], which doubles as the
  * spec fixture.
  *
  * Scale design: decode runs via `mapPartitions` — one iterator pass per
  * partition, no per-row task overhead, no shuffle; any [[Codec]] slots in
  * without touching the plan shape. Binary payloads never enter a shuffle
  * key.
  */
object Multimodal {

  /** One media asset: payload + typed metadata (the bronze-layer shape a
    * 100 TB media lake would carry per row). */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed-width, shuffle-friendly (no binary). */
  case class MediaFeatures(asset_id: Long, kind: String, byte_len: Long,
    sha_prefix: String, width: Int, height: Int, mean_intensity: Double)

  /** Codec contract: bytes in, (width, height, mean intensity) out; resample
    * returns the re-encoded smaller payload, or None when the payload isn't
    * a decodable image (callers fall back to stride decimation). Must be
    * Serializable — instances ship inside `mapPartitions` closures. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): (Int, Int, Double)
    def resample(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]]
  }

  /** STUB codec — deterministic fake for payloads that aren't real media
    * (the test corpus's text-bytes stand-ins) and the fixture the
    * deterministic specs pin. The signature is the real contract. */
  object FakeCodec extends Codec {
    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val w = 16 + (n % 64)
      val h = 16 + ((n / 64) % 64)
      val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toDouble).sum / n
      (w, h, mean)
    }
    def resample(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = None
  }

  /** REAL codec on the JDK's built-in image IO (PNG/BMP/GIF/JPEG readers
    * ship with every JRE — no new dependency): a decodable payload reports
    * its true dimensions and mean Rec.601 luma; anything ImageIO can't
    * parse (audio, video, the test corpus's text bytes) falls back to
    * [[FakeCodec]] so the plumbing keeps its deterministic shape on
    * non-image rows instead of failing the task. Per-row cost is one
    * decode + one O(w·h) pixel pass — partition-local, no shuffle impact;
    * the int-ARGB row buffer is bounded by one frame, not the partition. */
  object ImageIoCodec extends Codec {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }

    def decode(payload: Array[Byte]): (Int, Int, Double) = {
      val img = read(payload)
      if (img == null) FakeCodec.decode(payload)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sum = 0.0
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sum += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
            0.114 * (p & 0xff)
          i += 1
        }
        (w, h, sum / (w.toLong * h))
      }
    }

    /** Real resampling: decode → bilinear Graphics2D scale → PNG re-encode
      * (PNG: lossless and always writable by the JDK). None for
      * non-image payloads. */
    def resample(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
      val img = read(payload)
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val buf = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", buf)
        Some(buf.toByteArray)
      }
    }
  }

  /** Decode + feature-extract over a binary column, partition-local. The
    * default codec is the real [[ImageIoCodec]] (JDK decode for real image
    * bytes, deterministic fake for everything else); specs that pin the
    * fake's arithmetic pass [[FakeCodec]] explicitly. */
  def extractFeatures(assets: Dataset[MediaAsset],
      codec: Codec = ImageIoCodec): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h, mean) = codec.decode(a.payload)
        val sha = digest.digest(a.payload).map("%02x".format(_)).mkString.take(8)
        digest.reset()
        MediaFeatures(a.asset_id, a.kind, a.payload.length.toLong, sha, w, h,
          math.rint(mean * 100) / 100)
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size slice of the payload (the
    * video-frame analog), emitted as (asset_id, frame_no, frame bytes). */
  def sampleFrames(assets: Dataset[MediaAsset], frameSize: Int, stride: Int): DataFrame = {
    import assets.sparkSession.implicits._
    assets.flatMap { a =>
      val nFrames = a.payload.length / frameSize
      (0 until nFrames by stride).map { f =>
        (a.asset_id, f.toLong, a.payload.slice(f * frameSize, (f + 1) * frameSize))
      }
    }.toDF("asset_id", "frame_no", "frame")
  }

  /** Resize, partition-local: real image payloads go through the codec's
    * resampler ([[ImageIoCodec.resample]] — bilinear scale + PNG re-encode);
    * payloads the codec can't decode fall back to deterministic
    * stride-decimation to ceil(len·(tw·th)/(w·h)) bytes, keeping the same
    * contract (bytes + target dims in, smaller bytes + recorded dims out)
    * for the non-media stand-ins the test corpus carries. */
  def resize(assets: Dataset[MediaAsset], targetW: Int, targetH: Int,
      codec: Codec = ImageIoCodec): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val payload = codec.resample(a.payload, targetW, targetH).getOrElse {
          val (w, h, _) = codec.decode(a.payload)
          val ratio = math.min(1.0, (targetW.toLong * targetH).toDouble / (w.toLong * h))
          val outLen = math.max(1, math.ceil(a.payload.length * ratio).toInt)
          val stride = math.max(1, a.payload.length / outLen)
          a.payload.indices.by(stride).map(a.payload).toArray
        }
        (a.asset_id, a.kind, targetW, targetH, payload)
      }
    }.toDF("asset_id", "kind", "out_w", "out_h", "payload")
  }

  /** Oracle-checkable frame sampling (the declarative shape of
    * [[sampleFrames]], over the same text-bytes-as-payload stand-in):
    * every `stride` bytes a `frameSize`-byte frame is cut and
    * fingerprinted — the (asset, frame_id, frame_hash) contract a video
    * pipeline feeds its per-frame feature extractor. One generate + map
    * per row, no shuffle; the tail frame clamps to the remaining bytes. */
  def frameSampleQuery(spark: SparkSession, dir: String, frameSize: Int = 16,
      stride: Int = 32): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"), col("text"))
      // same empty-payload guard as Curation.chunk: Spark div truncates
      // toward zero vs the oracle's floor, so a 0-byte payload would emit
      // one phantom frame here and none in DuckDB
      .filter(length(col("text")) > 0)
      .withColumn("last_f", expr(s"(length(text) - 1) div $stride"))
      .select(col("asset_id"), col("text"),
        explode(sequence(lit(0), col("last_f"))).as("frame_id"))
      .select(
        col("asset_id"),
        col("frame_id").cast("long").as("frame_id"),
        length(expr(s"substring(text, frame_id * $stride + 1, $frameSize)"))
          .cast("long").as("frame_len"),
        md5(expr(s"substring(text, frame_id * $stride + 1, $frameSize)"))
          .as("frame_md5"))
      .orderBy("asset_id", "frame_id")

  /** Q96 — FRAME-level dedup across assets: a frame hash appearing in ≥2
    * distinct assets is SHARED content (opening/closing boilerplate, test
    * cards, repeated stock footage — the video analogue of text
    * boilerplate). Per asset: frame count, shared-frame count, ratio.
    * Composes [[frameSampleQuery]]'s zero-shuffle declarative sampler with
    * one hash-keyed spread aggregate and one asset-keyed reduce — at scale
    * the hash key is uniform by construction, no skew. */
  def frameDedup(spark: SparkSession, dir: String, frameSize: Int = 16,
      stride: Int = 32): DataFrame = {
    import graft.functions.Portable.pround
    val frames = frameSampleQuery(spark, dir, frameSize, stride)
      .select(col("asset_id"), col("frame_md5"))
    val spread = frames.groupBy("frame_md5")
      .agg(countDistinct("asset_id").as("n_assets"))
    val nShared = sum(when(col("n_assets") >= 2, lit(1L)).otherwise(lit(0L)))
    frames.join(spread, Seq("frame_md5"))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        nShared.as("n_shared"),
        pround(nShared * lit(1.0) / count(lit(1)), 6).as("shared_ratio"))
      .orderBy("asset_id")
  }

  /** Oracle-checkable metadata pass: treats document text bytes as the
    * binary payload (the test corpus has no real media) and computes the
    * metadata a media lake tracks — byte length, content hash, head-bytes
    * hex (the "thumbnail"). Pure column expressions → codegen'd. */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("asset_id"),
        octet_length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text")).as("content_md5"),
        hex(substring(col("text"), 1, 8).cast("binary")).as("head_hex"))
      .orderBy("asset_id")
}
