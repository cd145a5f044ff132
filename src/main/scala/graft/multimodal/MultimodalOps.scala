package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.RelationalOps.spread

/** Raw multimodal asset: opaque bytes plus a MIME-ish kind tag. At
  * 100 TB, image/audio/video payloads live exactly like this — a
  * `binary` column next to typed metadata, scanned from parquet — and
  * every transform below operates on that representation.
  */
case class RawAsset(asset_id: Long, kind: String, bytes: Array[Byte])

/** One sampled "frame" of a (fake-)video asset. */
case class FrameSample(asset_id: Long, frame_idx: Int, byte_offset: Int,
                       frame_hash: Long)

/** Real-decode output: statistics computed from DECODED PIXELS, not
  * from the byte stream. `pixel_sum` is the sum of every sample of
  * every band; `mean_milli` the truncated per-sample mean in
  * milli-units (exact integer arithmetic end to end).
  */
case class ImageFeatures(asset_id: Long, width: Int, height: Int,
                         channels: Int, pixel_sum: Long, mean_milli: Long)

/** Perceptual features from one decoded raster (r20): `dhash` is the
  * 56-bit difference hash (9×7 luma grid, adjacent-column sign bits),
  * `embedding` the 16-dim centered block-mean luma vector — the two
  * artifacts image-level dedup runs on. Both integer-exact from the
  * decoded pixels, so the SQL oracle reproduces them bit for bit.
  */
case class ImagePerception(asset_id: Long, dhash: Long,
                           embedding: Array[Double])

/** Real-decode audio output (r20): every statistic comes from DECODED
  * PCM samples — `sample_rate` from the parsed RIFF header, `energy`
  * the exact Σ s², `peak` max |s|, `crossings` the count of sign-
  * boundary flips (s crossing the < 0 / ≥ 0 line between adjacent
  * samples). All integer arithmetic, so a SQL oracle replays the
  * synthesis closed form sample for sample.
  */
case class AudioFeatures(asset_id: Long, sample_rate: Int, n_samples: Long,
                         energy: Long, peak: Long, crossings: Long)

/** One REAL decoded video frame (r20): `pixel_sum` over the decoded
  * grayscale raster, `diff_sum` the exact Σ|g_f − g_{f−1}| against the
  * previous decoded frame (0 for frame 0) — the per-frame signal a
  * scene-cut detector thresholds. All integers from decoded samples.
  */
case class VideoFrame(asset_id: Long, frame_idx: Int, width: Int,
                      height: Int, pixel_sum: Long, diff_sum: Long)

/** Loudness-invariant audio fingerprint (r20): the sign bitmap of the
  * first 56 decoded samples (bit i set iff s_i < 0). Positive gain
  * scaling never flips a sample's sign — for the integer sawtooth,
  * s < 0 ⇔ 2·A·j < A·(p−1) ⇔ 2j < p−1, independent of A — so a
  * re-mastered (amplitude-scaled) duplicate fingerprints IDENTICALLY
  * while different waveforms diverge.
  */
case class AudioFingerprint(asset_id: Long, fingerprint: Long)

/** Multimodal-column operators: binary assets in, typed features out.
  *
  * IMAGE DECODE IS REAL (r8): [[decodeImageFeatures]] parses PNG bytes
  * with `javax.imageio` — an actual format decode, pure JVM, no native
  * codec dependency — and computes statistics from the decoded raster.
  * The harness ships no media files, so [[syntheticPngAssets]] first
  * ENCODES a real PNG per document whose pixel values follow a closed
  * form over (x, y, asset_id); the oracle recomputes the statistics
  * from that form in SQL, so a decoder that mis-parsed dimensions,
  * band order, or sample values would hash-mismatch. PNG is lossless —
  * the round trip is bit-exact by format contract.
  *
  * AUDIO DECODE IS REAL (r20): [[decodeAudioFeatures]] parses WAV
  * bytes with `javax.sound.sampled`. MULTI-FRAME VIDEO DECODE IS REAL
  * (r20): [[decodeVideoFrames]] walks an animated GIF89a's frame
  * sequence — the one motion format the JDK encodes AND decodes
  * losslessly — so frame features and scene-cut detection run on
  * decoded rasters. Only the byte-offset frame *sampler*
  * ([[sampleFrames]]) still rides the deterministic md5 stub
  * ([[stubDecode]]) — it models sampling an opaque container without
  * decoding — and that stub is itself oracle-checked arithmetic.
  * Everything here is the real production shape:
  *
  *  - assets flow as `binary` columns with typed metadata, not paths;
  *  - per-partition batch processing via `mapPartitions` with one
  *    decoder context amortized across the partition's rows — the same
  *    batch shape a Pandas-UDF/`mapInPandas` pipeline has in PySpark;
  *  - narrow transforms: no shuffle is introduced by decoding, so at
  *    scale the work rides the scan partitions;
  *  - frame sampling fans out rows via a typed `flatMap`-style
  *    iterator inside the same partition pass.
  */
object MultimodalOps {

  val FrameHashPrime = 2147483647L

  /** Deterministic stand-in for a codec: md5-derived pseudo-header.
    * Returns (h, width, height, channels) where h is the 28-bit md5
    * prefix — the same `CAST('0x' || substr(md5(x),1,7) AS BIGINT)`
    * integer DuckDB computes.
    */
  def stubDecode(bytes: Array[Byte], md: MessageDigest): (Long, Int, Int, Int) = {
    val h = graft.functions.TextFunctions.h7Jvm(bytes, md)
    val width = 16 + (h % 1024).toInt
    val height = 16 + ((h / 1024) % 1024).toInt
    val channels = 1 + ((h / 1048576) % 4).toInt
    (h, width, height, channels)
  }

  /** Lift a text table into the asset representation: UTF-8 bytes as
    * the payload. (Real corpora would read image/audio bytes from
    * parquet directly; the testdata has no binary media, so text
    * plays that role byte-for-byte.)
    */
  def documentsAsAssets(docs: DataFrame): DataFrame =
    spread(docs.select(col("doc_id").as("asset_id"), lit("text/utf-8").as("kind"),
      col("text").cast("binary").as("bytes")))

  /** Synthesize a REAL PNG per document: dimensions derive from the
    * id (width 16–31 × height 16–31), pixel (x, y) is the closed form
    * r = (7x + 13y + id) mod 256, g = r ⊕+85, b = r ⊕+170 — arithmetic
    * a SQL oracle reproduces pixel for pixel. One encoder pass per
    * partition; ImageIO's disk cache is disabled (pure in-memory
    * encode).
    */
  def syntheticPngAssets(docs: DataFrame): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    // spread the 8-byte id column, not the docs: synthesis derives
    // everything from doc_id, so the fan-out exchange (identity on
    // multi-split inputs) moves keys, never payloads (guide §2.3)
    spread(docs.select(col("doc_id"))).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(id => RawAsset(id, "image/png", encodePng(id, delta = 0)))
    }
  }

  /** One synthesized PNG: the (x, y, id) closed form, optionally
    * brightness-shifted by `delta` with saturating (clamped-at-255)
    * arithmetic — the standard "same picture, brighter" edit that
    * preserves most adjacent-luma differences, so a perceptual hash
    * keeps the variant within a small Hamming distance of its base
    * while genuinely re-encoding different bytes. delta = 0 is the
    * identity (min(255, v % 256 + 0) = v % 256).
    */
  private def encodePng(id: Long, delta: Int): Array[Byte] = {
    val w = 16 + (id % 16).toInt
    val h = 16 + ((id / 16) % 16).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = x * 7L + y * 13L + id
        val r = math.min(255, (base % 256).toInt + delta)
        val g = math.min(255, ((base + 85) % 256).toInt + delta)
        val b = math.min(255, ((base + 170) % 256).toInt + delta)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Brightness-shifted duplicate assets (r20): one clamped `delta`
    * variant per doc with `doc_id % every == 0`, ids offset by
    * `idOffset` to stay clear of the base id space. These are the
    * planted near-dups the image dedup rows must catch — genuinely
    * different PNG bytes (different pixels, different compression)
    * whose perceptual features stay close to the base image's.
    */
  def brightnessVariants(docs: DataFrame, every: Int, delta: Int,
                         idOffset: Long): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    spread(docs.filter(col("doc_id") % every === 0)
      .select(col("doc_id"))).as[Long].mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map(id => RawAsset(id + idOffset, "image/png", encodePng(id, delta)))
      }
  }

  /** REAL image decode: `javax.imageio` parses the PNG byte stream and
    * the statistics come from the decoded raster — width/height from
    * the header, `channels` from the raster's band count, `pixel_sum`
    * over every sample of every band. A decoder bug (wrong dims, band
    * order, filtering, bit depth) surfaces as an oracle hash mismatch
    * against the synthesis closed form. Narrow mapPartitions over the
    * scan, decoder state amortized per partition.
    */
  def decodeImageFeatures(assets: Dataset[RawAsset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.bytes))
        require(img != null, s"asset ${a.asset_id}: bytes are not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val raster = img.getRaster
        val c = raster.getNumBands
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var b = 0
            while (b < c) { sum += raster.getSample(x, y, b); b += 1 }
            x += 1
          }
          y += 1
        }
        ImageFeatures(a.asset_id, w, h, c, sum, sum * 1000L / (w.toLong * h * c))
      }
    }
  }

  /** dHash grid: 9 columns × 7 rows → 8 adjacent-column comparisons
    * per row = 56 sign bits. The classic difference hash (public
    * knowledge: downscale to a coarse luma grid, bit = "right cell
    * brighter than left") at 56 bits instead of 64 so the fingerprint
    * and every oracle-side shift stay inside NON-NEGATIVE signed-64
    * arithmetic (DuckDB rejects `1::BIGINT << 63`) — the same
    * engine-portability parameterization as the 28-bit simhash.
    */
  val DhashGridW = 9
  val DhashGridH = 7

  /** Embedding grid: 4×4 block-mean luma, centered (×16 minus the
    * grid total — integer-exact, scale-free under cosine). */
  val EmbedGrid = 4

  /** Perceptual features from REAL decodes (r20): one `javax.imageio`
    * parse per asset yields BOTH dedup artifacts — the 56-bit dHash
    * and the 16-dim centered block-mean embedding — in a single pixel
    * pass (decoder and both accumulations amortized per partition;
    * narrow, shuffle-free). Luma is integer ITU-R BT.601
    * (`(299r + 587g + 114b) / 1000`), cells assign by
    * `cx = x·gridW / w` (pixel-assignment form — the one spelling
    * both engines share), cell value is the truncated mean, and the
    * dHash bit for (cx, cy) is `cell(cx) < cell(cx+1)` packed at
    * `cy·8 + cx`. All integer until the embedding's final cast, so a
    * SQL oracle replays the closed-form pixels to the same bits.
    */
  def perceptualFeatures(assets: Dataset[RawAsset]): Dataset[ImagePerception] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { a =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(a.bytes))
        require(img != null, s"asset ${a.asset_id}: bytes are not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        require(w >= DhashGridW && h >= DhashGridH,
          s"asset ${a.asset_id}: ${w}x$h below the ${DhashGridW}x$DhashGridH hash grid")
        val dSum = new Array[Long](DhashGridH * DhashGridW)
        val dCnt = new Array[Long](DhashGridH * DhashGridW)
        val eSum = new Array[Long](EmbedGrid * EmbedGrid)
        val eCnt = new Array[Long](EmbedGrid * EmbedGrid)
        var y = 0
        while (y < h) {
          val dcy = y * DhashGridH / h
          val ecy = y * EmbedGrid / h
          var x = 0
          while (x < w) {
            // getRGB: exact 8-bit sRGB samples for an 8-bit RGB PNG,
            // independent of the decoder's internal raster layout
            val rgb = img.getRGB(x, y)
            val l = (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            val dk = dcy * DhashGridW + x * DhashGridW / w
            dSum(dk) += l; dCnt(dk) += 1
            val ek = ecy * EmbedGrid + x * EmbedGrid / w
            eSum(ek) += l; eCnt(ek) += 1
            x += 1
          }
          y += 1
        }
        var fp = 0L
        var cy = 0
        while (cy < DhashGridH) {
          var cx = 0
          while (cx < DhashGridW - 1) {
            val left = dSum(cy * DhashGridW + cx) / dCnt(cy * DhashGridW + cx)
            val right = dSum(cy * DhashGridW + cx + 1) / dCnt(cy * DhashGridW + cx + 1)
            if (left < right) fp |= 1L << (cy * 8 + cx)
            cx += 1
          }
          cy += 1
        }
        val means = Array.tabulate(EmbedGrid * EmbedGrid)(k => eSum(k) / eCnt(k))
        val tot = means.sum
        ImagePerception(a.asset_id, fp,
          means.map(m => (EmbedGrid * EmbedGrid * m - tot).toDouble))
      }
    }
  }

  /** Synthesize a REAL RIFF/WAVE file per document: 16-bit PCM mono at
    * 8 kHz, 1600 + (id % 8)·100 samples, sample i the integer sawtooth
    * s(i) = (2·A·j) / (p−1) − A with j = (i + id) mod p, period
    * p = 16 + id mod 48, amplitude A = 4000 + (id mod 9)·1000 — all
    * integer division on non-negative operands, so a SQL oracle
    * reproduces every sample exactly. The bytes are a genuine
    * 44-byte-header WAV that any decoder parses; one builder pass per
    * partition, no shuffle.
    */
  def syntheticWavAssets(docs: DataFrame): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id => RawAsset(id, "audio/wav", encodeWav(id))))
  }

  /** Amplitude-scaled duplicate assets (r20): one ×`gain` re-master per
    * doc with `doc_id % every == 0`, ids offset by `idOffset` — the
    * audio analog of [[brightnessVariants]]: genuinely different PCM
    * bytes (every sample scaled) whose SIGN pattern — and therefore
    * [[audioFingerprints]] — is identical to the base waveform's.
    */
  def gainVariants(docs: DataFrame, every: Int, gain: Int,
                   idOffset: Long): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    spread(docs.filter(col("doc_id") % every === 0)
      .select(col("doc_id"))).as[Long]
      .mapPartitions(_.map(id =>
        RawAsset(id + idOffset, "audio/wav", encodeWav(id, gain))))
  }

  private def encodeWav(id: Long, gain: Int = 1): Array[Byte] = {
    val n = 1600 + (id % 8).toInt * 100
    val p = 16 + (id % 48).toInt
    val a = (4000 + (id % 9).toInt * 1000) * gain
    require(a <= 32767, s"gain $gain overflows 16-bit samples")
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val j = ((i + id) % p).toInt
      val s = (2 * a * j) / (p - 1) - a
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(ascii)).putInt(36 + data.length)
      .put("WAVE".getBytes(ascii))
    bb.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(1).putShort(1)            // PCM, mono
      .putInt(8000).putInt(16000)         // sample rate, byte rate
      .putShort(2).putShort(16)           // block align, bits/sample
    bb.put("data".getBytes(ascii)).putInt(data.length).put(data)
    bb.array()
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` parses the
    * WAV byte stream (header validation, format negotiation) and the
    * statistics come from the decoded little-endian PCM frames. A
    * header or sample-layout bug surfaces as an oracle hash mismatch
    * against the synthesis closed form. Narrow mapPartitions over the
    * scan — the audio twin of [[decodeImageFeatures]]; fails loudly on
    * undecodable bytes (same contract).
    */
  /** The platform's registered [[javax.sound.sampled.spi.AudioFileReader]]s,
    * resolved ONCE per task. `AudioSystem.getAudioInputStream` resolves
    * providers through a synchronized JVM-global registry on EVERY
    * call (~50 µs serialized): under a 32-thread local executor the
    * decode stage gets ZERO parallel speedup (r20 profile: 22.9 s task
    * CPU for 0.8 s of wall — pure lock convoy; a 32-thread
    * microbenchmark ran no faster than 1 thread). Iterating the same
    * SPI readers directly — identical selection semantics: first
    * reader that accepts the stream, and the JDK WAV reader is the one
    * that fires — decodes the identical bytes with no global lock.
    */
  /** Per-task audio decoder with a STICKY reader: the JDK registers
    * the WAV reader fourth, so blind in-order probing pays three
    * thrown-and-caught UnsupportedAudioFileExceptions per asset; a
    * homogeneous partition (one container format, the 100 TB shape —
    * media tables are format-partitioned) pays the probe once and then
    * goes straight to the accepting reader. Container magics are
    * mutually exclusive (RIFF/FORM/.snd/MThd), so the sticky
    * short-circuit picks the same reader the in-order scan would.
    */
  private final class AudioDecoder {
    import scala.jdk.CollectionConverters._
    private val readers: Seq[javax.sound.sampled.spi.AudioFileReader] =
      java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .iterator().asScala.toSeq
    private var sticky: javax.sound.sampled.spi.AudioFileReader = null

    def open(assetId: Long, bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      if (sticky != null) {
        try return sticky.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => () } // format changed; re-probe in order
      }
      readers.foreach { r =>
        try {
          val in = r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          sticky = r
          return in
        } catch { case _: Exception => () } // not this format; next reader
      }
      throw new IllegalArgumentException(
        s"asset $assetId: undecodable audio payload")
    }
  }

  def decodeAudioFeatures(assets: Dataset[RawAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { part =>
      val dec = new AudioDecoder
      part.map { a =>
      val in = dec.open(a.asset_id, a.bytes)
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"asset ${a.asset_id}: unsupported wav format $fmt")
        val raw = in.readAllBytes()
        val n = raw.length / 2
        var energy = 0L; var peak = 0L; var cross = 0L
        var prevNeg = false
        var i = 0
        while (i < n) {
          val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
          energy += s.toLong * s
          val abs = math.abs(s).toLong
          if (abs > peak) peak = abs
          val neg = s < 0
          if (i > 0 && neg != prevNeg) cross += 1
          prevNeg = neg
          i += 1
        }
        AudioFeatures(a.asset_id, fmt.getSampleRate.toInt, n.toLong,
          energy, peak, cross)
      } finally in.close()
      }
    }
  }

  /** Loudness-invariant fingerprints from DECODED samples: parse the
    * WAV, read the first 56 PCM frames, emit the sign bitmap (bit i
    * set iff sample i < 0). 56 bits so the fingerprint composes with
    * [[graft.operators.DedupOps.fingerprintPairs]]' banding budget and
    * stays a non-negative long. Narrow, one parse per asset.
    */
  def audioFingerprints(assets: Dataset[RawAsset]): Dataset[AudioFingerprint] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { part =>
      val dec = new AudioDecoder // once per task, not per asset — see above
      part.map { a =>
        val in = dec.open(a.asset_id, a.bytes)
        try {
          val raw = in.readNBytes(56 * 2)
          var fp = 0L
          var i = 0
          val n = raw.length / 2
          while (i < n) {
            val s = ((raw(2 * i) & 0xff) | (raw(2 * i + 1) << 8)).toShort.toInt
            if (s < 0) fp |= 1L << i
            i += 1
          }
          AudioFingerprint(a.asset_id, fp)
        } finally in.close()
      }
    }
  }

  /** Synthesize a REAL multi-frame motion asset per document: an
    * animated GIF89a (the one multi-frame format the JDK both encodes
    * and decodes losslessly — grayscale palettes round-trip exactly).
    * 4 + (id % 5) frames of 12–19 × 12–19 gray pixels, frame f pixel
    * (x, y) = (3x + 5y + 11f + id + cut) mod 256 where cut = 97 from
    * the middle frame on — a planted SCENE CUT: consecutive smooth
    * frames differ by 11 per pixel, the cut frame by 108, both exactly
    * replayable in SQL. One encoder per partition, no shuffle.
    */
  def syntheticGifAssets(docs: DataFrame): Dataset[RawAsset] = {
    import docs.sparkSession.implicits._
    spread(docs.select(col("doc_id"))).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(id => RawAsset(id, "image/gif", encodeGif(id)))
    }
  }

  private def encodeGif(id: Long): Array[Byte] = {
    val w = 12 + (id % 8).toInt
    val h = 12 + ((id / 8) % 8).toInt
    val frames = 4 + (id % 5).toInt
    val cutAt = frames / 2
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val r = img.getRaster
      val off = if (f >= cutAt) 97 else 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          r.setSample(x, y, 0,
            ((3L * x + 5L * y + 11L * f + id + off) % 256).toInt)
          x += 1
        }
        y += 1
      }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    wr.endWriteSequence()
    wr.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL multi-frame video decode: `javax.imageio`'s GIF reader walks
    * the frame sequence (`getNumImages(true)` forces a full stream
    * scan), decodes every frame's raster, and emits one [[VideoFrame]]
    * row per frame with the exact inter-frame absolute-difference sum
    * — the signal scene-cut detection thresholds. The frame fan-out
    * happens inside the partition iterator (the [[sampleFrames]]
    * shape): one reader per asset, one decode pass, no shuffle. Fails
    * loudly on undecodable bytes (the [[decodeAudioFeatures]]
    * contract).
    */
  def decodeVideoFrames(assets: Dataset[RawAsset]): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { a =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(a.bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException(
            s"asset ${a.asset_id}: undecodable video payload")
        val rd = readers.next()
        try {
          rd.setInput(iis)
          val n = rd.getNumImages(true)
          var prev: Array[Int] = null
          (0 until n).map { f =>
            val img = rd.read(f)
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getData
            val cur = new Array[Int](w * h)
            var sum = 0L
            var diff = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val g = raster.getSample(x, y, 0)
                cur(y * w + x) = g
                sum += g
                if (prev != null) diff += math.abs(g - prev(y * w + x))
                x += 1
              }
              y += 1
            }
            prev = cur
            VideoFrame(a.asset_id, f, w, h, sum, diff)
          }
        } finally { rd.dispose(); iis.close() }
      }
    }
  }

  /** Sample pseudo-frames: 1 + (h % 8) frames per asset, evenly spaced
    * byte offsets, per-frame rolling hash. The row fan-out happens
    * inside the partition iterator — the plan stays a narrow
    * mapPartitions over the scan.
    */
  def sampleFrames(assets: Dataset[RawAsset]): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val (h, _, _, _) = stubDecode(a.bytes, md)
        val nFrames = 1 + (h % 8).toInt
        val stride = a.bytes.length / nFrames
        (0 until nFrames).iterator.map { i =>
          FrameSample(a.asset_id, i, i * stride, (h * 31 + i) % FrameHashPrime)
        }
      }
    }
  }

}
