package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The REAL image path: javax.imageio decode through the multimodal
  * batch plumbing. PNGs are synthesized in-test with BufferedImage —
  * the JDK is both the encoder and the decoder, so every expectation
  * is computable from the pattern that painted the image.
  */
class ImageCodecSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Encode a w×h image where pixel (x,y) = rgb(x,y) as 0xRRGGBB. */
  private def makeImage(w: Int, h: Int, format: String = "png")(
      rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  test("ImageIoCodec: luminance grid features match the painted pattern") {
    // left half black, right half white → with dim=16 (4×4 grid) the
    // two left cell columns are 0.0 and the two right are 1.0
    val split = makeImage(64, 64)((x, _) => if (x < 32) gray(0) else gray(255))
    val solid = makeImage(32, 32)((_, _) => gray(128))
    val df = Seq((1L, split), (2L, solid)).toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, dim = 16,
        codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val fSplit = feats(1L)
    assert(fSplit.length == 16)
    for (row <- 0 until 4; c <- 0 until 4) {
      val expect = if (c < 2) 0.0f else 1.0f
      assert(math.abs(fSplit(row * 4 + c) - expect) < 1e-3,
        s"cell ($row,$c) = ${fSplit(row * 4 + c)}, want $expect")
    }
    // solid gray: every cell = 128/255, and resolution-independent
    assert(feats(2L).forall(v => math.abs(v - 128f / 255f) < 1e-3))
  }

  test("luma grid is resolution-independent (the near-dup signature claim)") {
    val pat = (w: Int) => makeImage(w, w)((x, y) =>
      if ((x * 4 / w + y * 4 / w) % 2 == 0) gray(0) else gray(255))
    val df = Seq((1L, pat(64)), (2L, pat(128))).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(df, dim = 16,
        codec = Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // same checkerboard at 2× resolution → same 4×4 grid signature
    f(1L).zip(f(2L)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-3, s"$a vs $b")
    }
    // FakeCodec, byte-derived, does NOT survive the re-encode — the
    // reason the real decoder exists
    val fake = Multimodal.extractFeatures(df, dim = 16,
        codec = Multimodal.FakeCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(fake(1L) != fake(2L))
  }

  test("JPEG decodes through the same codec (JDK-shipped reader)") {
    val jpg = makeImage(48, 48, "jpg")((_, _) => gray(200))
    val df = Seq((7L, jpg)).toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(df, dim = 4,
      codec = Multimodal.ImageIoCodec).collect()(0).getSeq[Float](1)
    // JPEG is lossy: solid fields survive within a coarse tolerance
    assert(f.forall(v => math.abs(v - 200f / 255f) < 0.02))
  }

  test("decodeImageMeta marks undecodable payloads instead of throwing") {
    val png = makeImage(40, 20)((_, _) => gray(255))
    val junk = "definitely not an image".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, junk)).toDF("doc_id", "payload")
    val m = Multimodal.decodeImageMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getInt(1) == 40 && m(1L).getInt(2) == 20)
    assert(math.abs(m(1L).getDouble(3) - 1.0) < 1e-3) // white → luma 1
    assert(m(2L).isNullAt(1) && m(2L).isNullAt(2) && m(2L).isNullAt(3))
    // and the admit-and-mark screen makes the throwing codec safe:
    val clean = Multimodal.decodeImageMeta(df).filter(col("width").isNotNull)
      .select(col("doc_id")).join(df, "doc_id")
    val f = Multimodal.extractFeatures(clean, dim = 4,
      codec = Multimodal.ImageIoCodec).collect()
    assert(f.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("resizeImages produces decodable images at exactly the target dims") {
    val big = makeImage(100, 60)((x, _) => if (x < 50) gray(0) else gray(255))
    val junk = Array[Byte](1, 2, 3)
    val df = Seq((1L, big), (2L, junk)).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, 10, 6).collect()
      .map(r => r.getLong(0) -> r).toMap
    val bytes = out(1L).getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == 10 && img.getHeight == 6)
    // content survives the resize: left half dark, right half bright
    val grid = Multimodal.lumaGrid(img, 4)
    assert(grid(0) < 0.2 && grid(1) > 0.8)
    // meta struct recomputed for the new bytes
    val meta = out(1L).getStruct(2)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == bytes.length)
    // undecodable → null payload, marked not dropped
    assert(out(2L).isNullAt(1))
  }

  test("features are deterministic across partitionings (distributed shape)") {
    val imgs = (0L until 24L).map { i =>
      i -> makeImage(32, 32)((x, y) => gray(((x * 7 + y * 13 + i * 31) % 256).toInt))
    }
    val df1 = imgs.toDF("doc_id", "payload").repartition(1)
    val df8 = imgs.toDF("doc_id", "payload").repartition(8)
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.extractFeatures(df, dim = 9, codec = Multimodal.ImageIoCodec)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val (a, b) = (run(df1), run(df8))
    assert(a.size == 24 && a == b)
  }
}
