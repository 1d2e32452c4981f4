package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** The REAL audio path: hand-rolled RIFF/PCM parsing through the
  * multimodal batch plumbing. WAVs are synthesized in-test with
  * `javax.sound.sampled` — an INDEPENDENT JDK encoder — so the parser
  * is cross-validated against a second implementation of the format,
  * and every expectation (rates, RMS levels, envelopes) is computable
  * from the signal that generated the file.
  */
class AudioCodecSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Encode PCM samples[frame][channel] in [-1,1] as a WAV file via
    * javax.sound.sampled (16-bit signed LE or 8-bit unsigned).
    */
  private def makeWav(samples: Array[Array[Double]], rate: Int,
                      bits: Int): Array[Byte] = {
    val channels = samples.head.length
    val bytesPer = bits / 8
    val data = new Array[Byte](samples.length * channels * bytesPer)
    var i = 0
    for (f <- samples.indices; c <- 0 until channels) {
      if (bits == 16) {
        val v = math.max(-32768, math.min(32767,
          math.round(samples(f)(c) * 32768.0))).toInt
        data(i) = (v & 0xff).toByte
        data(i + 1) = ((v >> 8) & 0xff).toByte
      } else {
        val v = math.max(0, math.min(255,
          math.round(samples(f)(c) * 128.0 + 128.0))).toInt
        data(i) = v.toByte
      }
      i += bytesPer
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      rate.toFloat, bits, channels, bits == 16, false) // signed iff 16-bit, LE
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt,
      samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def sine(n: Int, amp: Double, freq: Double, rate: Int): Array[Array[Double]] =
    Array.tabulate(n)(i => Array(amp * math.sin(2 * math.Pi * freq * i / rate)))

  test("parseWav: geometry from the independent JDK encoder round-trips") {
    val wav = makeWav(sine(4410, 0.5, 440, 44100), 44100, 16)
    val info = Multimodal.parseWav(wav).get
    assert(info.sampleRate == 44100 && info.channels == 1 && info.bits == 16)
    assert(info.nFrames == 4410)
    assert(math.abs(info.durationSec - 0.1) < 1e-9)
  }

  test("decodeWavMeta: rates/RMS per payload, non-WAV payloads marked not thrown") {
    val rate = 8000
    val full = makeWav(sine(8000, 0.5, 200, rate), rate, 16)     // RMS 0.5/sqrt(2)
    val silence = makeWav(Array.fill(4000)(Array(0.0)), rate, 16) // RMS 0
    val stereo8 = makeWav(
      Array.tabulate(2000)(i => Array(0.25, -0.25)), rate, 8)     // channel-mean 0
    val junk = "definitely not audio".getBytes("UTF-8")
    val df = Seq((1L, full), (2L, silence), (3L, stereo8), (4L, junk))
      .toDF("doc_id", "payload")
    val got = Multimodal.decodeWavMeta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) == rate && got(1L).getInt(2) == 1 &&
      got(1L).getInt(3) == 16 && got(1L).getInt(4) == 8000)
    assert(math.abs(got(1L).getDouble(6) - 0.5 / math.sqrt(2)) < 1e-3,
      s"sine RMS off: ${got(1L).getDouble(6)}")
    assert(got(2L).getDouble(6) == 0.0, "silence must have zero RMS")
    // stereo frames decode as the channel MEAN: +0.25 and -0.25 cancel
    assert(got(3L).getInt(2) == 2 && got(3L).getInt(3) == 8)
    assert(math.abs(got(3L).getDouble(6)) < 0.01,
      s"opposed stereo channels should cancel: ${got(3L).getDouble(6)}")
    assert(got(4L).isNullAt(1) && got(4L).isNullAt(6),
      "non-WAV payload must be marked with nulls, not dropped")
  }

  test("WavCodec features: RMS envelope tracks an amplitude ramp, flat for constant") {
    val rate = 8000
    // amplitude ramps 0 -> 0.8 over one second: the dim-window RMS
    // envelope must be strictly increasing
    val ramp = Array.tabulate(rate)(i =>
      Array(0.8 * i / rate * math.sin(2 * math.Pi * 100 * i / rate)))
    val const = sine(rate, 0.5, 100, rate)
    val df = Seq((1L, makeWav(ramp, rate, 16)), (2L, makeWav(const, rate, 16)))
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractFeatures(df, dim = 8,
        codec = Multimodal.WavCodec)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val env = feats(1L)
    assert(env.length == 8)
    env.sliding(2).foreach { case Seq(a, b) =>
      assert(b > a, s"ramp envelope not increasing: ${env.mkString(",")}")
    }
    // constant-amplitude sine: every window's RMS ~ 0.5/sqrt(2)
    feats(2L).foreach(v =>
      assert(math.abs(v - 0.5 / math.sqrt(2)) < 5e-3,
        s"flat envelope window off: ${feats(2L).mkString(",")}"))
    // throwing contract on undecodables (parity with ImageIoCodec)
    val bad = Seq((9L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(bad, dim = 4, codec = Multimodal.WavCodec).collect()
    }
    assert(ex.getMessage.contains("decodeWavMeta") ||
      Option(ex.getCause).exists(_.getMessage.contains("decodeWavMeta")))
  }

  test("parseWav: chunk walking survives extra chunks; truncated/float files rejected") {
    val wav = makeWav(sine(800, 0.5, 100, 8000), 8000, 16)
    // splice a LIST chunk between fmt and data: RIFF(12) + fmt(8+16) = 36
    val pre = wav.slice(0, 36)
    val post = wav.slice(36, wav.length)
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val riffLen = wav.length - 8 + listChunk.length
    val spliced = pre ++ listChunk ++ post
    // patch the RIFF size field (bytes 4-7, LE)
    for (i <- 0 until 4) spliced(4 + i) = ((riffLen >> (8 * i)) & 0xff).toByte
    val info = Multimodal.parseWav(spliced).get
    assert(info.sampleRate == 8000 && info.nFrames == 800,
      "parser must walk past non-fmt/data chunks")
    // truncation mid-data must reject, not overrun
    assert(Multimodal.parseWav(wav.slice(0, wav.length / 2)).isEmpty)
    // a fake float-format fmt chunk (audioFormat=3) must reject
    val floaty = wav.clone()
    floaty(20) = 3 // wFormatTag LE low byte
    assert(Multimodal.parseWav(floaty).isEmpty)
  }
}
