package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` payloads with a typed metadata struct.
  *
  * IMAGE decode is REAL: [[ImageIoCodec]], [[decodeImageMeta]] and
  * [[resizeImages]] run `javax.imageio` (PNG/JPEG/GIF/BMP ship in the
  * JDK — no external dependency) through the same batched
  * per-partition shape. AUDIO decode is REAL for integer-PCM WAV:
  * [[WavCodec]] / [[decodeWavMeta]] hand-parse the RIFF chunk list
  * and decode 8/16-bit PCM on the JVM (spec cross-validated against
  * `javax.sound.sampled`'s independent WAV writer). VIDEO decode is
  * REAL for two container classes: animated-GIF frame sequences
  * ([[GifFrameCodec]], JDK GIF reader) and COMPRESSED Motion-JPEG AVI
  * ([[MjpegAviCodec]]: hand-rolled RIFF/AVI chunk walk — the same
  * parser family as [[parseWav]] — over the JDK JPEG decoder, no
  * external dependency). Only inter-frame codecs (H.264/VP9) and
  * perceptual audio (AAC/Opus) have no pure-JDK decoder; the
  * spec-only [[FakeCodec]] stands in for those, and everything
  * Spark-side — schema, binary column handling, batching,
  * partitioning — is shared with the real paths.
  */
object Multimodal {

  /** Metadata schema carried alongside every payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_md5", StringType, nullable = false)))

  /** C12: ingest — wrap a text column as a binary payload with typed
    * metadata (what a real pipeline does with raw image bytes).
    * Pure column expressions: runs at scan speed.
    */
  def ingest(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = col(textCol).cast("binary")
    docs.select(
      col(idCol).as("doc_id"),
      payload.as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(payload).as("n_bytes"),
        md5(payload).as("content_md5")).as("meta"))
  }

  /** Oracle-facing flat projection of [[ingest]] metadata. */
  def meta(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    ingest(docs, idCol, textCol)
      .select(col("doc_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.content_md5").as("content_md5"))

  /** The codec plug point for [[extractFeatures]]. An implementation is
    * shipped to executors (must be Serializable) and driven with the
    * lifecycle a real native decoder needs:
    *
    *   - `open()` once per partition, before the first decode — allocate
    *     the JPEG decoder / audio resampler / ONNX session here, never
    *     in the constructor (the driver-side instance is only a
    *     serialization template and may not be able to hold native
    *     handles).
    *   - `decode(payload, dim)` per row, called from the partition's
    *     single thread — no synchronization needed.
    *   - `close()` once per partition after the last row (also on
    *     task-abort via a completion listener), releasing native memory.
    *
    * Swapping the shipped [[FakeCodec]] for a real decoder is exactly
    * one implementation of this trait — the distributed plumbing
    * (schema, binary columns, batching, partitioning) is unchanged.
    *
    * Implement a STATEFUL codec as a `class`, not an `object`: a Scala
    * object deserializes to the ONE shared singleton per executor JVM,
    * so concurrent tasks on a multi-core executor would share (and
    * double-open / early-close) its native handles. A class instance is
    * deserialized fresh per task closure, giving each task its own
    * lifecycle. The stateless [[FakeCodec]] is safely an object.
    */
  trait FeatureCodec extends Serializable {
    def open(): Unit = ()
    def decode(payload: Array[Byte], dim: Int): Array[Float]
    def close(): Unit = ()
  }

  /** SPEC-ONLY stub codec for the payload classes with no pure-JDK
    * decoder (inter-frame video: H.264/VP9; perceptual audio:
    * AAC/Opus): derives deterministic "features" from the raw payload
    * bytes so plumbing specs can exercise the codec lifecycle without
    * a decodable fixture. Not the default anywhere — production paths
    * use [[ImageIoCodec]] (images), [[WavCodec]] (PCM audio),
    * [[GifFrameCodec]] (GIF sequences) or [[MjpegAviCodec]]
    * (compressed Motion-JPEG AVI), all of which decode for real.
    */
  object FakeCodec extends FeatureCodec {
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** REAL image codec over `javax.imageio` (JDK-shipped: PNG, JPEG,
    * GIF, BMP). Features are a luminance grid: the image is cut into
    * ~√dim × ~√dim cells and each feature is that cell's mean Rec.601
    * luma in [0,1] — a deterministic, resolution-independent thumbnail
    * signature (the classic pre-embedding near-dup/quality signal for
    * image corpora; cosine over it survives resizing, which the
    * byte-level [[FakeCodec]] cannot claim).
    *
    * Stateless (safe as an `object`): `ImageIO.read` allocates a fresh
    * reader per call. `open()` just disables ImageIO's JVM-global
    * disk-backed stream cache — payloads are already in memory, and a
    * per-decode temp file is pure /tmp churn across executor threads.
    *
    * A payload that doesn't decode (truncated file, non-image bytes)
    * throws with the payload size in the message — feature extraction
    * has no honest null; screen with [[decodeImageMeta]] (which MARKS
    * undecodables instead) when the corpus isn't known-clean.
    */
  object ImageIoCodec extends FeatureCodec {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      require(img != null,
        s"payload is not a decodable image (${payload.length} bytes; " +
          "screen undecodables with decodeImageMeta first)")
      lumaGrid(img, dim)
    }
  }

  /** Parsed WAV layout: PCM format, data-chunk location, and the
    * sample geometry everything downstream derives from.
    */
  private[graft] case class WavInfo(sampleRate: Int, channels: Int,
                                    bits: Int, dataOffset: Int, dataLen: Int) {
    def nFrames: Int = dataLen / ((bits / 8) * channels)
    def durationSec: Double = nFrames.toDouble / sampleRate
  }

  /** Hand-rolled RIFF/WAVE header parse — integer-PCM WAV (8-bit
    * unsigned / 16-bit signed little-endian, any channel count), the
    * interchange format every audio pipeline's first hop produces.
    * Returns None on anything that isn't such a file (wrong magic,
    * truncated chunks, compressed/float formats) — the mark-don't-throw
    * screen [[decodeWavMeta]] builds on. Walks the chunk list properly
    * (chunks are even-padded; fmt/data order is not guaranteed), so
    * files with LIST/fact/cue chunks parse fine.
    */
  private[graft] def parseWav(b: Array[Byte]): Option[WavInfo] = {
    def tag(o: Int): String =
      if (o + 4 > b.length) "" else new String(b, o, 4, "US-ASCII")
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(off)
      val size = u32(off + 4)
      if (size < 0 || off + 8 + size > b.length) return None
      val sz = size.toInt
      if (id == "fmt " && sz >= 16) {
        val audioFormat = u16(off + 8)
        val channels = u16(off + 10)
        val rate = u32(off + 12)
        val bits = u16(off + 22)
        if (audioFormat != 1 || channels < 1 || rate <= 0 ||
            (bits != 8 && bits != 16)) return None
        fmt = Some((channels, rate.toInt, bits))
      } else if (id == "data") {
        data = Some((off + 8, sz))
      }
      off += 8 + sz + (sz & 1) // chunks are padded to even length
    }
    for ((ch, rate, bits) <- fmt; (dOff, dLen) <- data
         if dLen >= (bits / 8) * ch)
      yield WavInfo(rate, ch, bits, dOff, dLen - dLen % ((bits / 8) * ch))
  }

  /** One PCM frame's channel-mean amplitude in [-1, 1] — 16-bit
    * signed LE scaled by 2^15, 8-bit unsigned re-centered at 128.
    */
  private def wavFrameAmp(b: Array[Byte], info: WavInfo, frame: Int): Double = {
    val bytesPer = info.bits / 8
    var c = 0
    var acc = 0.0
    while (c < info.channels) {
      val o = info.dataOffset + (frame * info.channels + c) * bytesPer
      acc += (if (info.bits == 16)
                ((b(o) & 0xff) | (b(o + 1) << 8)).toShort / 32768.0
              else ((b(o) & 0xff) - 128) / 128.0)
      c += 1
    }
    acc / info.channels
  }

  /** REAL audio codec for integer-PCM WAV — pure JVM, no native libs.
    * Features are the RMS energy envelope: the decoded frame sequence
    * is cut into `dim` contiguous windows and each feature is that
    * window's root-mean-square amplitude in [0, 1] — the classic
    * first-hop audio signature (silence/clipping screens, near-dup
    * cosine, energy-based segmentation all read straight off it), and
    * the time-domain analogue of [[ImageIoCodec]]'s luma grid.
    * Stateless, safe as an `object`. Payloads that aren't integer-PCM
    * WAV throw with the payload size (same contract as
    * [[ImageIoCodec]]); screen with [[decodeWavMeta]] first when the
    * corpus isn't known-clean.
    */
  object WavCodec extends FeatureCodec {
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val info = parseWav(payload).getOrElse(throw new IllegalArgumentException(
        s"payload is not integer-PCM WAV (${payload.length} bytes; " +
          "screen undecodables with decodeWavMeta first)"))
      rmsEnvelope(payload, info, dim)
    }
  }

  private[graft] def rmsEnvelope(b: Array[Byte], info: WavInfo,
                                 dim: Int): Array[Float] = {
    val n = info.nFrames
    val sum = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    var f = 0
    while (f < n) {
      val a = wavFrameAmp(b, info, f)
      // same bin rule as lumaGrid rows: frame f of n -> window f*dim/n
      val w = math.min(dim - 1, (f.toLong * dim / n).toInt)
      sum(w) += a * a
      cnt(w) += 1
      f += 1
    }
    val out = new Array[Float](dim)
    var w = 0
    while (w < dim) {
      out(w) = if (cnt(w) == 0) 0f else math.sqrt(sum(w) / cnt(w)).toFloat
      w += 1
    }
    out
  }

  /** Decode-and-mark WAV metadata scan: (doc_id, sample_rate,
    * channels, bits, n_frames, duration_sec, rms) per payload, with
    * non-WAV payloads emitted as null-rate rows rather than dropped or
    * thrown — the admit-unknown-and-mark contract, exactly
    * [[decodeImageMeta]]'s shape for the audio modality; this is the
    * screen that makes the throwing [[WavCodec]] safe to run after it.
    */
  def decodeWavMeta(ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bits", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("duration_sec", DoubleType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ingested.select(col("doc_id"), col("payload")).mapPartitions { it =>
      it.map { r =>
        val b = r.getAs[Array[Byte]](1)
        parseWav(b) match {
          case None => Row(r.getLong(0), null, null, null, null, null, null)
          case Some(info) =>
            // dim=1 envelope = whole-file RMS in one pass
            val rms = rmsEnvelope(b, info, 1)(0).toDouble
            Row(r.getLong(0), info.sampleRate, info.channels, info.bits,
              info.nFrames, info.durationSec, rms)
        }
      }
    }(enc)
  }

  /** One pass over the pixels, binned into a rows×cols grid (rows =
    * ⌊√dim⌋, cols = ⌈dim/rows⌉; trailing cells past `dim` are dropped,
    * cells narrower than a pixel read 0). Row-at-a-time `getRGB` keeps
    * the per-pixel cost at integer math regardless of the underlying
    * raster layout.
    */
  private[graft] def lumaGrid(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val rows = math.max(1, math.sqrt(dim.toDouble).toInt)
    val cols = (dim + rows - 1) / rows
    val sum = new Array[Double](rows * cols)
    val cnt = new Array[Long](rows * cols)
    val line = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, line, 0, w)
      val r0 = math.min(rows - 1, y * rows / h)
      var x = 0
      while (x < w) {
        val p = line(x)
        val luma = (0.299 * ((p >> 16) & 0xff) +
          0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)) / 255.0
        val cell = r0 * cols + math.min(cols - 1, x * cols / w)
        sum(cell) += luma
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var f = 0
    while (f < dim) {
      out(f) = if (cnt(f) == 0) 0f else (sum(f) / cnt(f)).toFloat
      f += 1
    }
    out
  }

  /** Decode-and-mark metadata scan: (doc_id, width, height, mean_luma)
    * per payload, with UNDECODABLE payloads emitted as null-width rows
    * rather than dropped or thrown — the admit-unknown-and-mark
    * contract ([[graft.streaming.DocStreams.qualityAdmission]]): the
    * screening decision belongs downstream, and this is the screen
    * that makes the throwing [[ImageIoCodec]] safe to run after it.
    * Same per-partition batch shape as [[extractFeatures]].
    */
  def decodeImageMeta(ingested: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ingested.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null) Row(r.getLong(0), null, null, null)
        else {
          // dim=1 luma grid = whole-image mean in one pixel pass
          val m = lumaGrid(img, 1)(0).toDouble
          Row(r.getLong(0), img.getWidth, img.getHeight, m)
        }
      }
    }(enc)
  }

  /** Decode → bilinear resize to exactly `w`×`h` → re-encode
    * (`format`: "png" lossless by default; "jpg" also JDK-shipped).
    * Undecodable payloads pass through as NULL payloads with their
    * doc_id (mark, don't throw — a resize sweep over a 100 TB crawl
    * must not die on one truncated file). Output schema matches
    * [[ingest]]: (doc_id, payload, meta), with meta recomputed for the
    * new bytes.
    */
  def resizeImages(ingested: DataFrame, w: Int, h: Int,
                   format: String = "png"): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive: ${w}x$h")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val resized = ingested.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        if (img == null) Row(r.getLong(0), null)
        else {
          val dst = new java.awt.image.BufferedImage(w, h,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, format, bos)
          Row(r.getLong(0), bos.toByteArray)
        }
      }
    }(enc)
    resized.select(col("doc_id"), col("payload"),
      struct(
        lit(s"image/$format").as("mime"),
        coalesce(length(col("payload")), lit(0)).as("n_bytes"),
        coalesce(md5(col("payload")), lit("")).as("content_md5")).as("meta"))
  }

  /** Batched feature extraction over payloads — the `mapPartitions`
    * shape a real decoder needs (per-partition codec lifecycle, batch
    * loop), mirroring `mapInPandas` batch semantics on the JVM.
    */
  def extractFeatures(ingested: DataFrame, dim: Int = 16,
                      codec: FeatureCodec = ImageIoCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ingested.select(col("doc_id"), col("payload")).mapPartitions { it =>
      codec.open() // per-partition init: native allocations live here
      val rows = it.map { r =>
        Row(r.getLong(0), codec.decode(r.getAs[Array[Byte]](1), dim).toSeq)
      }
      org.apache.spark.TaskContext.get() match {
        case null =>
          // driver-side (local testing) — no completion listener exists,
          // so close when the iterator is exhausted
          new Iterator[Row] {
            private var closed = false
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h && !closed) { closed = true; codec.close() }
              h
            }
            override def next(): Row = rows.next()
          }
        case tc =>
          tc.addTaskCompletionListener[Unit](_ => codec.close())
          rows
      }
    }(enc)
  }

  /** Deterministic frame sampling shape: split a payload into fixed-size
    * "frames" and keep every `stride`-th — the video-pipeline pattern
    * with the decode step faked.
    */
  def sampleFrames(ingested: DataFrame, frameBytes: Int = 32, stride: Int = 4): DataFrame =
    ingested.select(col("doc_id"),
      posexplode(split(col("payload").cast("string"), s"(?<=\\G.{$frameBytes})"))
        .as(Seq("frame_no", "frame")))
      .filter(col("frame_no") % stride === 0 && length(col("frame")) > 0)

  /** All stored frames of a multi-frame image container (animated GIF —
    * the one frame-sequence format the JDK decodes natively). Frames
    * are returned as STORED: GIF inter-frame disposal/compositing is
    * deliberately not applied (frame features feed near-dup/sampling
    * signals, not playback). Returns empty for undecodable payloads.
    */
  private[graft] def readGifFrames(payload: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
    // null payload = undecodable, not a crash (admit-and-mark: the
    // caller emits the null-marked row) — ByteArrayInputStream(null)
    // would NPE at construction, before any catch below
    if (payload == null) return IndexedSeq.empty
    val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
    if (!readers.hasNext) return IndexedSeq.empty
    val reader = readers.next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      val n = try reader.getNumImages(true)
      catch { case _: Exception => 0 }
      (0 until n).flatMap { i =>
        try Some(reader.read(i)) catch { case _: Exception => None }
      }
    } catch {
      case _: Exception => IndexedSeq.empty
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** REAL frame-sequence ("video-pipeline") codec over the JDK GIF
    * reader: decode every stored frame, feature = the per-cell MEAN of
    * each frame's luma grid across the sequence — a temporal thumbnail
    * signature (two clips differing only in frame rate or a few frames
    * stay near-dup under cosine; [[FakeCodec]]'s byte features cannot
    * claim that). Throws on undecodable payloads like [[ImageIoCodec]];
    * screen with [[decodeVideoFrames]] (admit-and-mark) first when the
    * corpus isn't known-clean. For COMPRESSED clips (Motion-JPEG AVI)
    * use [[MjpegAviCodec]]; FakeCodec stands in only for inter-frame
    * codecs (H.264/VP9), which no pure-JDK decoder exists for.
    */
  object GifFrameCodec extends FeatureCodec {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val frames = readGifFrames(payload)
      require(frames.nonEmpty,
        s"payload is not a decodable GIF frame sequence (" +
          s"${if (payload == null) "null" else s"${payload.length} bytes"}; " +
          "screen undecodables with decodeVideoFrames first)")
      temporalMeanLuma(frames, dim)
    }
  }

  /** Per-cell mean of each frame's luma grid across a sequence — the
    * temporal thumbnail signature shared by every video codec here.
    */
  private def temporalMeanLuma(frames: IndexedSeq[java.awt.image.BufferedImage],
                               dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    frames.foreach { img =>
      val g = lumaGrid(img, dim)
      var i = 0
      while (i < dim) { acc(i) += g(i); i += 1 }
    }
    var i = 0
    while (i < dim) { acc(i) /= frames.length; i += 1 }
    acc
  }

  /** All video frames of a Motion-JPEG AVI — a genuinely COMPRESSED
    * video container (each frame is a full JPEG: DCT + quantization +
    * entropy coding), decoded with zero external dependencies: a
    * hand-rolled RIFF/AVI chunk walk (same parser family as
    * [[parseWav]]; AVI nests chunk lists, so the walk recurses into
    * `LIST` chunks to reach `movi`) feeding the JDK's ImageIO JPEG
    * reader per `##dc`/`##db` frame chunk. Frame chunks that don't
    * start with the JPEG SOI marker or fail to decode are skipped;
    * anything that isn't a RIFF/AVI container returns empty (the
    * admit-and-mark screens build on that, like [[readGifFrames]]).
    */
  private[graft] def readAviMjpegFrames(payload: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 12) return IndexedSeq.empty
    def tag(o: Int): String =
      if (o + 4 > payload.length) "" else new String(payload, o, 4, "US-ASCII")
    def u32(o: Int): Long = (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
      ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return IndexedSeq.empty
    val frames = IndexedSeq.newBuilder[java.awt.image.BufferedImage]
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = tag(off)
        val size = u32(off + 4)
        if (size < 0 || off + 8 + size > end) return
        val sz = size.toInt
        if (id == "LIST" && sz >= 4) {
          walk(off + 12, off + 8 + sz) // skip the 4-byte list type
        } else if (id.length == 4 && (id.endsWith("dc") || id.endsWith("db")) &&
                   sz >= 2 && (payload(off + 8) & 0xff) == 0xff &&
                   (payload(off + 9) & 0xff) == 0xd8) { // JPEG SOI
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload, off + 8, sz))
            if (img != null) frames += img
          } catch { case _: Exception => () }
        }
        off += 8 + sz + (sz & 1) // chunks are padded to even length
      }
    }
    val riffEnd = math.min(payload.length.toLong, 8L + u32(4)).toInt
    walk(12, riffEnd)
    frames.result()
  }

  /** REAL compressed-video codec: Motion-JPEG in AVI over
    * [[readAviMjpegFrames]], same temporal-mean-luma feature as
    * [[GifFrameCodec]] (the two are interchangeable signatures for the
    * near-dup/sampling stages downstream). Pure JVM — the container
    * walk is hand-rolled and the per-frame JPEG decode is the JDK's.
    * Throws on undecodable payloads; screen with [[decodeVideoFrames]]
    * (which sniffs the container and admits-and-marks) first when the
    * corpus isn't known-clean.
    */
  object MjpegAviCodec extends FeatureCodec {
    override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      val frames = readAviMjpegFrames(payload)
      require(frames.nonEmpty,
        s"payload is not a decodable Motion-JPEG AVI (" +
          s"${if (payload == null) "null" else s"${payload.length} bytes"}; " +
          "screen undecodables with decodeVideoFrames first)")
      temporalMeanLuma(frames, dim)
    }
  }

  /** Container-sniffing frame reader: GIF or Motion-JPEG AVI by magic
    * bytes, empty for everything else — the one entry point the
    * admit-and-mark scans use, so a mixed video corpus flows through
    * one operator.
    */
  private[graft] def readVideoFrames(payload: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] = {
    if (payload == null || payload.length < 4) IndexedSeq.empty
    else if (payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F')
      readGifFrames(payload)
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
             payload(3) == 'F')
      readAviMjpegFrames(payload)
    else IndexedSeq.empty
  }

  /** Decode-and-mark FRAME scan — the real form of [[sampleFrames]]:
    * every `stride`-th stored frame of each payload as its own row
    * (doc_id, frame_no, n_frames, width, height, luma features), so
    * downstream near-dup/sampling sees a per-frame corpus exactly like
    * the per-image one. Container-sniffing ([[readVideoFrames]]): GIF
    * sequences and compressed Motion-JPEG AVI decode in one pass over
    * a mixed corpus. UNDECODABLE payloads emit ONE null-marked row
    * (n_frames = 0) rather than dropping or throwing — the same
    * admit-unknown-and-mark contract as [[decodeImageMeta]]. Scale
    * shape: one mapPartitions scan, frames never leave their partition
    * until downstream asks.
    */
  def decodeVideoFrames(ingested: DataFrame, dim: Int = 16,
                        stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ingested.select(col("doc_id"), col("payload")).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val id = r.getLong(0)
        val frames = readVideoFrames(r.getAs[Array[Byte]](1))
        if (frames.isEmpty) Iterator(Row(id, null, 0, null, null, null))
        else frames.iterator.zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (img, i) =>
            Row(id, i, frames.length, img.getWidth, img.getHeight,
              lumaGrid(img, dim).toSeq)
          }
      }
    }(enc)
  }
}
