package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * stages. The Spark-side shape (schema, batching, partition-local
  * processing) is real, and so are two codec arms: [[ImageIoCodec]]
  * decodes and resamples PNG/BMP/GIF/JPEG with the JDK's built-in
  * readers, and [[WavCodec]] parses RIFF/WAVE audio (format, channels,
  * sample rate, bit depth, duration, PCM16 mean amplitude) — both
  * dependency-free. Payloads neither arm recognizes (video, the test
  * corpus's text-bytes stand-ins) fall back to the deterministic
  * [[FakeCodec]] shapes, which double as the spec fixtures.
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

  /** Audio metadata: the fields an audio lake tracks per asset. WAV rows
    * carry real header-derived values (`is_wav = true`); everything else
    * gets the deterministic fallback shape so the plumbing stays total. */
  case class AudioFeatures(asset_id: Long, kind: String, byte_len: Long,
    is_wav: Boolean, channels: Int, sample_rate_hz: Int, bits_per_sample: Int,
    n_samples: Long, duration_ms: Double, mean_abs_amplitude: Double)

  /** REAL audio codec — the WAV arm of the multimodal plumbing (round 7;
    * the image arm landed round 6): a manual little-endian RIFF/WAVE
    * chunk walk (pure JDK byte math — `javax.sound.sampled` could also
    * read these, but a header parse needs no stream machinery and cannot
    * touch the default `AudioSystem` provider registry on executors).
    * Extracts the `fmt ` chunk (audio format, channels, sample rate, bit
    * depth) and the `data` chunk size; for PCM16 payloads it additionally
    * computes the mean absolute sample amplitude — one O(samples) pass,
    * partition-local, same cost envelope as the image arm's pixel pass.
    * Truncated/corrupt/foreign bytes → None (callers fall back, tasks
    * never fail on bad media — the ImageIoCodec convention). */
  object WavCodec extends Serializable {
    final case class WavMeta(channels: Int, sampleRateHz: Int,
      bitsPerSample: Int, dataBytes: Long, meanAbsAmplitude: Double)

    def parse(p: Array[Byte]): Option[WavMeta] = {
      def u16(i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      def u32(i: Int): Long =
        (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
          ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)
      if (p.length < 44) return None
      if (!(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
            p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'))
        return None
      var off = 12
      var fmt: Option[(Int, Int, Int, Int)] = None
      var data: Option[(Int, Long)] = None
      while (off + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
        val id = new String(p, off, 4, "US-ASCII")
        val sz = u32(off + 4)
        if (sz > Int.MaxValue - 9 - off) return None // corrupt chunk size
        if (id == "fmt " && off + 24 <= p.length)
          fmt = Some((u16(off + 8), u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
        else if (id == "data") data = Some((off + 8, sz))
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      for {
        (audioFmt, ch, rate, bits) <- fmt
        (doff, dsz) <- data
        if ch > 0 && rate > 0 && bits > 0
      } yield {
        // a header may promise more data than the payload carries
        // (truncated upload) — amplitude scans only what is present
        val avail = math.min(dsz, (p.length - doff).toLong)
        val mean =
          if (audioFmt == 1 && bits == 16 && avail >= 2) {
            var s = 0.0; var n = 0L; var i = doff
            val end = doff + avail.toInt
            while (i + 1 < end) {
              s += math.abs(((p(i) & 0xff) | (p(i + 1) << 8)).toDouble)
              n += 1; i += 2
            }
            if (n == 0) 0.0 else s / n
          } else 0.0
        WavMeta(ch, rate, bits, dsz, mean)
      }
    }
  }

  /** Audio feature extraction, partition-local ([[extractFeatures]]'s
    * audio twin): WAV payloads report true header metadata + PCM16 mean
    * amplitude; everything else the [[FakeCodec]]-style deterministic
    * stand-in (8 kHz mono 8-bit, one "sample" per byte), flagged
    * `is_wav = false` so downstream can filter honestly. */
  def extractAudioFeatures(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      // 2-dp rounding is floor(x·100 + 0.5)/100 — the repo's half-up money
      // rule, mirrored verbatim by the q135 oracle (math.rint's half-even
      // would disagree with any SQL engine's ROUND at .5 boundaries)
      def r2(x: Double): Double = math.floor(x * 100 + 0.5) / 100
      WavCodec.parse(a.payload) match {
        case Some(m) =>
          val blockAlign = m.channels * (m.bitsPerSample / 8)
          val n = if (blockAlign > 0) m.dataBytes / blockAlign else 0L
          AudioFeatures(a.asset_id, a.kind, a.payload.length.toLong,
            is_wav = true, m.channels, m.sampleRateHz, m.bitsPerSample, n,
            math.floor(n * 100000.0 / m.sampleRateHz + 0.5) / 100,
            r2(m.meanAbsAmplitude))
        case None =>
          val len = a.payload.length
          val mean = if (len == 0) 0.0
            else a.payload.map(b => (b & 0xff).toDouble).sum / len
          AudioFeatures(a.asset_id, a.kind, len.toLong,
            is_wav = false, 1, 8000, 8, len.toLong,
            math.floor(len * 100000.0 / 8000 + 0.5) / 100,
            r2(mean))
      }
    })
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

  /** Wrap PCM samples in a canonical 44-byte RIFF/WAVE header (PCM,
    * `bits`=16) — the writer dual of [[WavCodec.parse]], used by the q135
    * corpus stand-in to stamp deterministic REAL wav payloads (and by any
    * pipeline materializing PCM back to the lake). Sample bytes are
    * truncated to whole frames. */
  def wavWrap(samples: Array[Byte], channels: Int = 1, rate: Int = 16000): Array[Byte] = {
    val bits = 16
    val block = channels * bits / 8
    val dataLen = samples.length / block * block
    val out = new Array[Byte](44 + dataLen)
    def ascii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def u16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def u32(off: Int, v: Long): Unit = {
      var i = 0; while (i < 4) { out(off + i) = ((v >> (8 * i)) & 0xff).toByte; i += 1 }
    }
    ascii(0, "RIFF"); u32(4, 36L + dataLen); ascii(8, "WAVE")
    ascii(12, "fmt "); u32(16, 16L); u16(20, 1); u16(22, channels)
    u32(24, rate.toLong); u32(28, rate.toLong * block); u16(32, block); u16(34, bits)
    ascii(36, "data"); u32(40, dataLen.toLong)
    System.arraycopy(samples, 0, out, 44, dataLen)
    out
  }

  /** Q135 — the audio arm as an ORACLE ROW (q35's hashed-metadata move
    * applied to [[extractAudioFeatures]]): every doc's first `clip` text
    * bytes stand in for an audio payload; docs with doc_id % 5 == 0 are
    * stamped into REAL RIFF/WAVE bytes by [[wavWrap]] (so the WAV parse
    * arm — header walk, PCM16 mean-|amplitude| pass — is exercised and
    * hash-checked), the rest stay raw bytes and take the deterministic
    * fallback arm. Every output field is an analytically-known function of
    * the payload bytes, so DuckDB mirrors the whole pipeline from the hex
    * of the same clipped bytes — including the signed little-endian PCM16
    * reconstruction. The `clip` cap bounds the oracle's per-byte unnest;
    * the Spark side is one partition-local typed map (zero shuffle before
    * the presentation sort). */
  def audioFeaturesQuery(spark: SparkSession, dir: String, clip: Int = 128): DataFrame = {
    import spark.implicits._
    val assets = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val clipped = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).take(clip)
        if (id % 5 == 0) MediaAsset(id, "audio_wav", wavWrap(clipped))
        else MediaAsset(id, "audio_raw", clipped)
      }
    extractAudioFeatures(assets)
      .toDF()
      .select(col("asset_id"),
        col("byte_len"),
        col("is_wav").cast("long").as("is_wav"),
        col("channels").cast("long").as("channels"),
        col("sample_rate_hz").cast("long").as("sample_rate_hz"),
        col("bits_per_sample").cast("long").as("bits_per_sample"),
        col("n_samples"),
        col("duration_ms"),
        col("mean_abs_amplitude"))
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
