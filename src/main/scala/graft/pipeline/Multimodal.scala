package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with decode / feature-extraction
  * staged as partition-wise batch transforms.
  *
  * Image payloads (`format` = `image/...`) decode FOR REAL through the
  * JDK's built-in `javax.imageio` (PNG/BMP/GIF/JPEG), audio payloads
  * (`format` = `audio/...`) through `javax.sound.sampled`
  * (WAV/AU/AIFF), and video payloads (`format` = `video/...`) through
  * the pure-JVM MJPEG-in-AVI path ([[decodeMjpegAvi]] — RIFF chunk walk
  * + imageio per frame) — all zero external dependencies; everything
  * else — compressed video codecs, unknown formats, or a payload no
  * installed codec claims — falls back to the deterministic byte-level
  * STUB so the pipeline never throws on undecodable media.
  * Either way the plan shape is identical: a narrow mapPartitions with
  * no shuffle, decoder init amortized per partition. Swapping in richer
  * codecs (JNI/FFI, `mapInPandas` on PySpark) changes no plan shape.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** Attach a synthetic binary payload + metadata to a text corpus (stand-in
    * for reading real media; payload = utf-8 bytes, metadata derived
    * deterministically). */
  def attachFakeMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", to_binary(col(textCol), lit("utf-8")))
      .withColumn("media_meta", struct(
        lit("fake/raw").alias("format"),
        (pmod(length(col(textCol)), lit(64)) + 1).cast("int").alias("width"),
        (pmod(length(col(textCol)), lit(48)) + 1).cast("int").alias("height"),
        length(col(textCol)).cast("long").alias("n_bytes")))

  /** Decode an image payload with the JDK's imageio registry; None when
    * no installed reader claims the bytes (audio/video/corrupt data). */
  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException | _: RuntimeException => None }

  /** Real 8-dim image features from decoded pixels: mean R/G/B, mean
    * luminance (Rec.601), RMS luminance contrast, aspect ratio, and the
    * pixel dimensions. Deterministic, resolution-independent layout. */
  private def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = ((rgb >> 16) & 0xFF) / 255.0
        val g = ((rgb >> 8) & 0xFF) / 255.0
        val b = (rgb & 0xFF) / 255.0
        val l = 0.299 * r + 0.587 * g + 0.114 * b
        sr += r; sg += g; sb += b; sl += l; sl2 += l * l
        x += 1
      }
      y += 1
    }
    val n = math.max(1, w * h).toDouble
    val meanL = sl / n
    val contrast = math.sqrt(math.max(0.0, sl2 / n - meanL * meanL))
    Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat,
      meanL.toFloat, contrast.toFloat, (w.toDouble / math.max(1, h)).toFloat,
      w.toFloat, h.toFloat)
  }

  /** Decode an audio payload (WAV/AU/AIFF — whatever the JDK's
    * `javax.sound.sampled` registry claims, zero external dependencies)
    * to 16-bit signed PCM samples + the stream's format. None when no
    * installed reader claims the bytes (video/corrupt/compressed data). */
  private def decodeAudio(bytes: Array[Byte])
      : Option[(Array[Short], javax.sound.sampled.AudioFormat)] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val src = in.getFormat
        // normalize every payload to 16-bit signed PCM at the source rate
        // so feature math is codec-independent
        val pcmFmt = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
        val raw = pcm.readAllBytes()
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) {
          samples(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort
          i += 1
        }
        Some((samples, pcmFmt))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
           _: java.io.IOException | _: IllegalArgumentException => None
    }

  /** Real 8-dim audio features from decoded PCM: mean amplitude, RMS
    * energy, peak amplitude, zero-crossing rate, duration (s), sample
    * rate, channel count, sample count. Deterministic, codec-independent
    * (everything is measured on normalized 16-bit PCM).
    *
    * Amplitude/RMS/peak are per-sample (channel-agnostic); the
    * zero-crossing rate is measured on the per-frame MONO DOWNMIX:
    * interleaved multi-channel PCM alternates channels, so adjacent raw
    * samples belong to DIFFERENT signals and a sign compare across them
    * counts inter-channel level flips, not zero crossings. ZCR is
    * normalized per frame (for mono, frames == samples, so mono values
    * are unchanged by the downmix). */
  private def audioFeatures(
      dec: (Array[Short], javax.sound.sampled.AudioFormat)): Array[Float] = {
    val (s, fmt) = dec
    val ch = math.max(1, fmt.getChannels)
    var (sum, sum2) = (0.0, 0.0)
    var peak = 0.0
    var i = 0
    while (i < s.length) {
      val v = s(i) / 32768.0
      sum += math.abs(v); sum2 += v * v
      if (math.abs(v) > peak) peak = math.abs(v)
      i += 1
    }
    val frames = s.length / ch
    def downmix(f: Int): Double = {
      var c = 0; var acc = 0.0
      while (c < ch) { acc += s(f * ch + c); c += 1 }
      acc / ch
    }
    var crossings = 0L
    if (frames > 0) {
      var prev = downmix(0)
      var f = 1
      while (f < frames) {
        val mix = downmix(f)
        if ((mix >= 0) != (prev >= 0)) crossings += 1
        prev = mix
        f += 1
      }
    }
    val n = math.max(1, s.length).toDouble
    val nf = math.max(1, frames).toDouble
    Array((sum / n).toFloat, math.sqrt(sum2 / n).toFloat, peak.toFloat,
      (crossings / nf).toFloat, (frames / fmt.getSampleRate).toFloat,
      fmt.getSampleRate, fmt.getChannels.toFloat, s.length.toFloat)
  }

  /** STUB decoder for payloads no installed codec claims: deterministic
    * 8-dim "feature vector" from the raw bytes. Images (imageio), audio
    * (sampled-sound) and MJPEG-in-AVI video ([[decodeMjpegAvi]]) decode
    * for real; compressed video codecs (H.264/VP9/AV1) have no pure-JVM
    * decoder and stay here — the signature (bytes, meta) → Array[Float]
    * and the partition-wise batch shape are the contract a native
    * decoder would slot into (waiver recorded in BASELINE.md). */
  private def stubDecode(bytes: Array[Byte], width: Int, height: Int): Array[Float] = {
    val feat = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feat(i % 8) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    var j = 0
    while (j < 8) { feat(j) = feat(j) / math.max(1, bytes.length) * width / math.max(1, height); j += 1 }
    feat
  }

  /** Partition-wise feature extraction over the binary column: narrow (no
    * shuffle), batched per partition — the exact plan shape a real decoder
    * needs (decoder init amortized per partition, not per row). */
  def extractFeatures(df: DataFrame, mediaCol: String = "media",
      metaCol: String = "media_meta"): DataFrame = {
    val schema = df.schema.add(StructField("media_feat",
      ArrayType(FloatType, containsNull = false)))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition decoder init: no temp-file cache for in-memory decode
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val meta = row.getStruct(metaIdx)
        // null format is legal metadata — treat as non-media, stub path
        val fmt = Option(meta.getString(0)).getOrElse("")
        // image/* decodes for real via imageio, audio/* via the JDK
        // sampled-sound stack, video/* via the MJPEG-in-AVI RIFF
        // parser; anything else (or a payload no codec claims) takes
        // the deterministic stub
        val feat = (if (fmt.startsWith("image/"))
          decodeImage(bytes).map(imageFeatures)
        else if (fmt.startsWith("audio/"))
          decodeAudio(bytes).map(audioFeatures)
        else if (fmt.startsWith("video/"))
          decodeMjpegAvi(bytes).map(videoFeatures)
        else None)
          .getOrElse(stubDecode(bytes, meta.getInt(1), meta.getInt(2)))
        Row.fromSeq(row.toSeq :+ feat.toSeq)
      }
    }(enc)
  }

  /** Real image rescale: decode → bilinear Graphics2D draw at the target
    * size → re-encode in the payload's own subtype. None when the bytes
    * don't decode or imageio has no writer for the subtype. */
  private def resizeImage(bytes: Array[Byte], format: String,
      w: Int, h: Int): Option[Array[Byte]] =
    decodeImage(bytes).flatMap { img =>
      val sub = format.stripPrefix("image/")
      // the JPEG writer rejects alpha channels; PNG/GIF keep transparency
      val model = if (sub == "png" || sub == "gif")
        java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_INT_RGB
      val out = new java.awt.image.BufferedImage(w, h, model)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      if (javax.imageio.ImageIO.write(out, sub, baos)) Some(baos.toByteArray)
      else None
    }

  /** Resize the media payload to `newWidth`×`newHeight`. Image payloads
    * rescale for real (imageio decode + bilinear redraw + re-encode);
    * other formats take the deterministic byte-subsampling STUB — output
    * length scales with the target pixel count. Either way the metadata
    * reflects the new dimensions and the plan is the same narrow
    * partition-wise transform as extractFeatures: no shuffle. */
  def resizeMedia(df: DataFrame, newWidth: Int, newHeight: Int,
      mediaCol: String = "media", metaCol: String = "media_meta"): DataFrame = {
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { rows =>
      // per-partition decoder init: no temp-file cache for in-memory decode
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val meta = row.getStruct(metaIdx)
        // null format is legal metadata — non-image, byte-subsample path
        val rawFormat = meta.getString(0)
        val format = Option(rawFormat).getOrElse("")
        val real = if (format.startsWith("image/"))
          resizeImage(bytes, format, newWidth, newHeight) else None
        val out = real.getOrElse {
          val oldPixels = math.max(1, meta.getInt(1) * meta.getInt(2))
          val newPixels = newWidth * newHeight
          // an empty payload stays empty (there is no byte to subsample)
          val outLen = if (bytes.isEmpty) 0
            else math.max(1, (bytes.length.toLong * newPixels / oldPixels).toInt)
          val sub = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            sub(i) = bytes(((i.toLong * bytes.length) / outLen).toInt)
            i += 1
          }
          sub
        }
        val newMeta = Row(rawFormat, newWidth, newHeight, out.length.toLong)
        val seq = row.toSeq.toArray
        seq(mediaIdx) = out
        seq(metaIdx) = newMeta
        Row.fromSeq(seq.toIndexedSeq)
      }
    }(enc)
  }

  /** 64-bit average-hash (aHash) of a decoded image: bilinear-scale to
    * an 8×8 luminance grid, set bit i when cell i is brighter than the
    * grid mean. Resolution- and re-encode-stable by construction — the
    * same picture saved at a different size or quality keeps (nearly)
    * the same hash, so hamming distance is a visual-near-dup measure. */
  private def averageHash(img: java.awt.image.BufferedImage): Long = {
    val sc = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = sc.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, 8, 8, null)
    g.dispose()
    val lum = new Array[Double](64)
    var mean = 0.0
    var i = 0
    while (i < 64) {
      val rgb = sc.getRGB(i % 8, i / 8)
      lum(i) = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
        0.114 * (rgb & 0xFF)
      mean += lum(i)
      i += 1
    }
    mean /= 64
    var h = 0L
    i = 0
    while (i < 64) {
      if (lum(i) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  /** Deterministic stub hash for non-image payloads: 8 byte-histogram
    * buckets thresholded at their mean — same shape as the image path
    * (binary-content-similar payloads land nearby), never a decode. */
  private def stubHash(bytes: Array[Byte]): Long = {
    val acc = new Array[Long](64)
    var i = 0
    while (i < bytes.length) {
      acc(bytes(i) & 0x3F) += 1
      i += 1
    }
    var mean = 0.0
    i = 0
    while (i < 64) { mean += acc(i); i += 1 }
    mean /= 64
    var h = 0L
    i = 0
    while (i < 64) {
      if (acc(i) > mean) h |= 1L << i
      i += 1
    }
    h
  }

  /** Append a `phash` LongType column: real aHash for decodable
    * `image/…` payloads, the deterministic stub otherwise. Same narrow
    * partition-wise shape as [[extractFeatures]] — no shuffle; feed the
    * result to [[nearDupMedia]] (or any hamming consumer). */
  def perceptualHash(df: DataFrame, mediaCol: String = "media",
      metaCol: String = "media_meta"): DataFrame = {
    val schema = df.schema.add(StructField("phash", LongType))
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val metaIdx = df.schema.fieldIndex(metaCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](mediaIdx)
        val fmt = Option(row.getStruct(metaIdx).getString(0)).getOrElse("")
        // video hashes its middle frame: stable under re-encode and
        // head/tail trims, the frame a thumbnailer would pick
        val h = (if (fmt.startsWith("image/")) decodeImage(bytes).map(averageHash)
          else if (fmt.startsWith("video/"))
            decodeMjpegAvi(bytes).map { case (fs, _) => averageHash(fs(fs.size / 2)) }
          else None).getOrElse(stubHash(bytes))
        Row.fromSeq(row.toSeq :+ h)
      }
    }(enc)
  }

  /** Visual near-dup pairs over the media column: perceptual hash +
    * pigeonhole hamming join ([[Dedup.hammingDupPairs]]) — the image
    * twin of simhash text dedup, same banded-equi-join scale shape
    * (no all-pairs compare; candidates meet on an exact hash chunk). */
  def nearDupMedia(df: DataFrame, idCol: String, maxHamming: Int = 5,
      mediaCol: String = "media", metaCol: String = "media_meta"): DataFrame =
    Dedup.hammingDupPairs(
      perceptualHash(df, mediaCol, metaCol), "phash", idCol, maxHamming)

  // ---- video: MJPEG-in-AVI, pure JVM ----------------------------------
  // The one open container a zero-dependency JVM can decode for real:
  // AVI is RIFF chunk framing (12-byte header + fourcc/size chunks) and
  // MJPEG frames are plain JPEGs, which imageio reads. Other codecs
  // (H.264 etc.) need native decoders the container doesn't ship and
  // remain on the deterministic stub path, documented in BASELINE.md.

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  private def fourcc(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) ""
    else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode an MJPEG-in-AVI payload: every `##dc`/`##db` chunk in the
    * `movi` list is one JPEG frame; fps comes from the `avih` header's
    * micro-seconds-per-frame. Lenient RIFF walk (no idx1 required, odd
    * chunk sizes padded per spec); None when the bytes aren't RIFF-AVI
    * or no frame decodes — the caller falls back to the stub, so a
    * corrupt payload degrades instead of throwing. */
  private[pipeline] def decodeMjpegAvi(bytes: Array[Byte])
      : Option[(Vector[java.awt.image.BufferedImage], Double)] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
      fourcc(bytes, 8) != "AVI ") return None
    val end = math.min(bytes.length.toLong, 8L + le32(bytes, 4)).toInt
    var fps = 0.0
    val frames = Vector.newBuilder[java.awt.image.BufferedImage]
    def walk(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = fourcc(bytes, o)
        val sz = le32(bytes, o + 4)
        if (sz < 0 || o + 8 + sz > to) return // malformed size: stop
        if (id == "LIST" && sz >= 4) {
          val lt = fourcc(bytes, o + 8)
          if (lt == "hdrl" || lt == "strl" || lt == "movi")
            walk(o + 12, o + 8 + sz)
        } else if (id == "avih" && sz >= 4) {
          val usPerFrame = le32(bytes, o + 8)
          if (usPerFrame > 0) fps = 1e6 / usPerFrame
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db"))
            && sz > 0) {
          decodeImage(java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + sz))
            .foreach(frames += _)
        }
        o += 8 + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, end)
    val fs = frames.result()
    if (fs.isEmpty) None else Some((fs, fps))
  }

  /** Real 8-dim video features from decoded frames: frame count, width,
    * height, fps, duration (s), mean luminance across frames, mean
    * absolute inter-frame luminance delta (motion proxy), aspect ratio.
    * Layout parallels [[imageFeatures]]/[[audioFeatures]]. */
  private def videoFeatures(
      fs: (Vector[java.awt.image.BufferedImage], Double)): Array[Float] = {
    val (frames, fps) = fs
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    def meanLuma(img: java.awt.image.BufferedImage): Double = {
      var s = 0.0
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          s += (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
            0.114 * (rgb & 0xFF)) / 255.0
          x += 1
        }
        y += 1
      }
      s / math.max(1, img.getWidth * img.getHeight)
    }
    val lumas = frames.map(meanLuma)
    val motion = if (lumas.size < 2) 0.0
      else lumas.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (lumas.size - 1)
    Array(frames.size.toFloat, w.toFloat, h.toFloat, fps.toFloat,
      (if (fps > 0) frames.size / fps else 0.0).toFloat,
      (lumas.sum / lumas.size).toFloat, motion.toFloat,
      (w.toDouble / math.max(1, h)).toFloat)
  }

  /** Build a real MJPEG-in-AVI payload from frames (RIFF writer —
    * fixture/test twin of [[decodeMjpegAvi]]; also the shape a media
    * ingest job would hand the pipeline). */
  def encodeMjpegAvi(frames: Seq[java.awt.image.BufferedImage],
      fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need >=1 frame and positive fps")
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
      out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
    }
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def cc(s: String): Unit = out.write(
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val jpegs = frames.map { f =>
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(f, "jpg", baos)
      baos.toByteArray
    }
    val (w, h) = (frames.head.getWidth, frames.head.getHeight)
    val moviBody = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
    val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody)
    cc("RIFF"); w32(riffBody); cc("AVI ")
    cc("LIST"); w32(hdrlBody); cc("hdrl")
    cc("avih"); w32(56)
    w32(1000000 / fps); w32(0); w32(0); w32(0)
    w32(frames.size); w32(0); w32(1); w32(0)
    w32(w); w32(h); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(4 + (8 + 56) + (8 + 40)); cc("strl")
    cc("strh"); w32(56)
    cc("vids"); cc("MJPG"); w32(0); w16(0); w16(0)
    w32(0); w32(1); w32(fps); w32(0); w32(frames.size)
    w32(0); w32(-1); w32(0)
    w16(0); w16(0); w16(w); w16(h)
    cc("strf"); w32(40)
    w32(40); w32(w); w32(h); w16(1); w16(24)
    cc("MJPG"); w32(w * h * 3); w32(0); w32(0); w32(0); w32(0)
    cc("LIST"); w32(moviBody); cc("movi")
    jpegs.foreach { j =>
      cc("00dc"); w32(j.length); out.write(j)
      if ((j.length & 1) == 1) out.write(0) // word alignment pad
    }
    out.toByteArray
  }

  /** Attach a synthetic-but-REAL video payload: per row, an MJPEG-AVI
    * built from solid-gray JPEG frames whose count/size derive
    * deterministically from the text length (n = len%5+2 frames of
    * 16·(len%3+1) × 16 at 10 fps). The bytes go through the real
    * encoder, so a downstream [[extractFeatures]] exercises the real
    * RIFF parse + imageio JPEG decode — same narrow partition-wise
    * plan as every media transform here. */
  def attachFakeVideo(df: DataFrame, textCol: String): DataFrame = {
    val textIdx = df.schema.fieldIndex(textCol)
    val schema = df.schema
      .add(StructField("media", BinaryType))
      .add(StructField("media_meta", MediaMetaType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { row =>
        val len = Option(row.getString(textIdx)).map(_.length).getOrElse(0)
        val n = len % 5 + 2
        val w = 16 * (len % 3 + 1)
        val h = 16
        val frames = (0 until n).map { f =>
          val img = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = (len * 31 + f * 17) % 240
          val rgb = (g << 16) | (g << 8) | g
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { img.setRGB(x, y, rgb); x += 1 }
            y += 1
          }
          img
        }
        val avi = encodeMjpegAvi(frames, fps = 10)
        Row.fromSeq(row.toSeq :+ avi :+
          Row("video/avi", w, h, avi.length.toLong))
      }
    }(enc)
  }

  /** Deterministic frame-sampling plan for video-like payloads: emit one
    * row per sampled frame offset (explode — narrow, no shuffle). */
  def sampleFrames(df: DataFrame, metaCol: String = "media_meta",
      everyNBytes: Long = 1024): DataFrame =
    df.withColumn("frame_offset",
      // empty payloads sample zero frames — an unguarded sequence(0, -1)
      // is an illegal-boundaries runtime error, not an empty array
      explode(when(col(s"$metaCol.n_bytes") > 0,
        sequence(lit(0L), col(s"$metaCol.n_bytes") - 1, lit(everyNBytes)))
        .otherwise(array().cast("array<bigint>"))))
}
