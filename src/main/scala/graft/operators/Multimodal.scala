package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the
  * engine as opaque `binary` payloads with a typed metadata struct.
  *
  * The actual codecs (JPEG decode, resampling, frame sampling) are NOT
  * available in this environment, so the decode kernel is a
  * deterministic fake — but everything Spark-side is real: schema,
  * binary column handling, batched per-partition processing shape
  * (the Scala analog of `mapInPandas` batches), and partitioning.
  * Swapping `fakeDecode` for a real codec is a one-function change.
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

  /** STUB codec: a real implementation would decode `payload` (JPEG →
    * HxWx3, PCM → samples). This deterministic fake derives "features"
    * from the payload bytes so the distributed plumbing is testable in
    * an environment with no image/audio libraries.
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

  /** Batched feature extraction over payloads — the `mapPartitions`
    * shape a real decoder needs (per-partition codec lifecycle, batch
    * loop), mirroring `mapInPandas` batch semantics on the JVM.
    */
  def extractFeatures(ingested: DataFrame, dim: Int = 16,
                      codec: FeatureCodec = FakeCodec): DataFrame = {
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
}
