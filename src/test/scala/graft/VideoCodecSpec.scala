package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** Real frame-sequence ("video-pipeline") decode over the JDK GIF
  * reader: animated GIFs are generated IN-TEST with the JDK GIF writer
  * (no fixtures, no native libs), so the round trip exercises genuine
  * encode → container bytes → multi-frame decode.
  */
class VideoCodecSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** A w×h frame of constant gray level (0-255). Gray is preserved by
    * GIF palette quantization (the 256-entry palette holds every gray
    * exactly), so per-frame luma is assertable to tight tolerance.
    */
  private def grayFrame(w: Int, h: Int, level: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    img
  }

  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  // chosen so the even-index half {40,120,200} has the SAME mean (120)
  // as the full sequence — the frame-drop invariance test needs a clip
  // whose temporal mean a uniform subsample preserves
  private val levels = Seq(40, 200, 120, 120, 200, 40)
  private val clip = animatedGif(levels.map(grayFrame(20, 12, _)))

  // ---- Motion-JPEG AVI: a genuinely COMPRESSED clip, built in-test ----

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Minimal VALID Motion-JPEG AVI: RIFF/AVI with a proper hdrl
    * (avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)) and a
    * movi list of 00dc chunks, each a full JDK-encoded JPEG. Every
    * frame really goes through DCT + quantization + entropy coding —
    * this is compressed video, not a byte-shuffle stand-in.
    */
  private def mjpegAvi(frames: Seq[BufferedImage]): Array[Byte] = {
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad: Array[Byte] =
        if (body.length % 2 == 1) Array(0.toByte) else Array.empty
      fourcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(typ) ++ body)
    val w = frames.head.getWidth
    val h = frames.head.getHeight
    val avih = le32(40000) ++ le32(0) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(w) ++ le32(h) ++ Array.fill[Byte](16)(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++
      le16(0) ++ le16(0) ++ le32(0) ++ le32(1) ++ le32(25) ++ le32(0) ++
      le32(frames.length) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      fourcc("MJPG") ++ le32(w * h * 3) ++ le32(0) ++ le32(0) ++
      le32(0) ++ le32(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.toArray.flatMap(f => chunk("00dc", jpegBytes(f))))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  private val aviClip = mjpegAvi(levels.map(grayFrame(20, 12, _)))

  test("readGifFrames returns every stored frame with true dimensions") {
    val frames = Multimodal.readGifFrames(clip)
    assert(frames.length == levels.length)
    assert(frames.forall(f => f.getWidth == 20 && f.getHeight == 12))
  }

  test("decodeVideoFrames: one row per stride-th frame, luma tracks the encoded gray") {
    val df = Seq((7L, clip)).toDF("doc_id", "payload")
    val rows = Multimodal.decodeVideoFrames(df, dim = 1, stride = 2)
      .orderBy("frame_no").collect()
    assert(rows.length == 3) // frames 0, 2, 4 of 6
    assert(rows.map(_.getAs[Int]("frame_no")).toSeq == Seq(0, 2, 4))
    assert(rows.forall(_.getAs[Int]("n_frames") == 6))
    val lumas = rows.map(_.getAs[Seq[Float]]("features").head)
    val want = Seq(40, 120, 200).map(_ / 255.0f)
    lumas.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 0.02, s"luma $got vs encoded $w")
    }
  }

  test("undecodable payload admits one null-marked row, never throws") {
    // includes a NULL payload: the column is nullable in the demo
    // schema, and admit-and-mark must hold for it too (ADVICE: the
    // pre-round-12 path NPE'd in ByteArrayInputStream before the catch)
    val df = Seq((1L, clip), (2L, "not a gif".getBytes("UTF-8")),
        (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeVideoFrames(df, dim = 1)
      .orderBy("doc_id", "frame_no").collect()
    for (badId <- Seq(2L, 3L)) {
      val bad = rows.filter(_.getLong(0) == badId)
      assert(bad.length == 1, s"doc $badId")
      assert(bad.head.getAs[Int]("n_frames") == 0)
      assert(bad.head.isNullAt(bad.head.fieldIndex("frame_no")))
    }
    assert(rows.count(_.getLong(0) == 1L) == levels.length)
  }

  test("GifFrameCodec features = per-cell mean over the sequence; cosine survives frame drops") {
    val full = Multimodal.GifFrameCodec.decode(clip, 1)
    val meanWant = levels.map(_ / 255.0f).sum / levels.length
    assert(math.abs(full(0) - meanWant) < 0.02)
    // drop every other frame: the temporal-mean signature barely moves
    val dropped = animatedGif(Seq(40, 120, 200).map(grayFrame(20, 12, _)))
    val d = Multimodal.GifFrameCodec.decode(dropped, 1)
    assert(math.abs(full(0) - d(0)) < 0.05)
    // via extractFeatures: the codec rides the standard per-partition path
    val df = Seq((1L, clip)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, dim = 1,
      codec = Multimodal.GifFrameCodec).head()
      .getAs[collection.Seq[Float]]("features")
    assert(math.abs(feats.head - full(0)) < 1e-6)
  }

  test("GifFrameCodec throws on undecodable payloads with a screening hint") {
    val e = intercept[Exception] {
      Multimodal.GifFrameCodec.decode(Array[Byte](1, 2, 3), 4)
    }
    assert(e.getMessage.contains("decodeVideoFrames"))
  }

  test("readAviMjpegFrames decodes every frame of a compressed Motion-JPEG AVI") {
    val frames = Multimodal.readAviMjpegFrames(aviClip)
    assert(frames.length == levels.length)
    assert(frames.forall(f => f.getWidth == 20 && f.getHeight == 12))
    // not RIFF / truncated RIFF / WAV-not-AVI all come back empty
    assert(Multimodal.readAviMjpegFrames("not an avi".getBytes).isEmpty)
    assert(Multimodal.readAviMjpegFrames(aviClip.take(40)).isEmpty)
    assert(Multimodal.readAviMjpegFrames(null).isEmpty)
  }

  test("MjpegAviCodec end-to-end: compressed clip features track the encoded grays") {
    // JPEG is lossy but constant-gray frames survive within a couple of
    // levels; the temporal mean must match the planted sequence mean
    val f = Multimodal.MjpegAviCodec.decode(aviClip, 1)
    val meanWant = levels.map(_ / 255.0f).sum / levels.length
    assert(math.abs(f(0) - meanWant) < 0.02, s"got ${f(0)}, want ~$meanWant")
    // and the compressed clip agrees with the SAME content as GIF —
    // two containers, one signature
    val g = Multimodal.GifFrameCodec.decode(clip, 1)
    assert(math.abs(f(0) - g(0)) < 0.02)
    // via extractFeatures: rides the standard per-partition path
    val df = Seq((1L, aviClip)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, dim = 1,
      codec = Multimodal.MjpegAviCodec).head()
      .getAs[collection.Seq[Float]]("features")
    assert(math.abs(feats.head - f(0)) < 1e-6)
  }

  test("decodeVideoFrames sniffs containers: mixed GIF + AVI + garbage corpus in one pass") {
    val df = Seq(
      (1L, clip),
      (2L, aviClip),
      (3L, "garbage".getBytes("UTF-8")),
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val rows = Multimodal.decodeVideoFrames(df, dim = 1)
      .orderBy("doc_id", "frame_no").collect()
    assert(rows.count(_.getLong(0) == 1L) == levels.length)
    assert(rows.count(_.getLong(0) == 2L) == levels.length)
    val aviRows = rows.filter(_.getLong(0) == 2L)
    assert(aviRows.forall(r => r.getAs[Int]("width") == 20 &&
      r.getAs[Int]("height") == 12 && r.getAs[Int]("n_frames") == levels.length))
    for (badId <- Seq(3L, 4L)) {
      val bad = rows.filter(_.getLong(0) == badId)
      assert(bad.length == 1 && bad.head.getAs[Int]("n_frames") == 0)
    }
  }

  test("MjpegAviCodec throws on undecodable payloads with a screening hint") {
    val e = intercept[Exception] {
      Multimodal.MjpegAviCodec.decode("RIFFxxxxNOPE".getBytes("US-ASCII"), 4)
    }
    assert(e.getMessage.contains("decodeVideoFrames"))
  }
}
