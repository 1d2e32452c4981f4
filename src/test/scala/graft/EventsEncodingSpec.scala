package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The driver's testdata generator has shipped `events.ts` in two parquet
  * encodings across regenerations: TIMESTAMP(NANOS) (which Spark reads as
  * BIGINT under `spark.sql.legacy.parquet.nanosAsLong`) and timestamp[us]
  * (which Spark reads as TIMESTAMP_NTZ). Round 6 lost 21 queries and 44
  * specs because the loader assumed exactly one of them. This spec writes
  * the SAME logical rows in both encodings — plus a tz-adjusted
  * TIMESTAMP — round-trips each through `Tables.events`, and asserts
  * identical results, so the next testdata regeneration can't take out a
  * third of the suite again.
  */
class EventsEncodingSpec extends AnyFunSuite {
  import TestSpark._

  // Known instants (micros since epoch, UTC) with sub-second parts that
  // would expose any unit mix-up (ns-as-µs is off by 1000×).
  private val micros = Seq(
    1723500000000000L,          // 2024-08-12 21:20:00
    1723500000123456L,          // +123.456 ms
    1723586400999999L)          // next day, just under the second

  private def writeVariants(): (String, String, String) = {
    val base = Files.createTempDirectory("events_enc").toString
    import spark.implicits._
    val ids = micros.indices.map(_.toLong)

    // (a) INT64 nanoseconds — how a TIMESTAMP(NANOS) file surfaces under
    // the nanosAsLong conf (Spark cannot author TIMESTAMP(NANOS) parquet,
    // but the loader sees an identical LongType schema either way).
    ids.zip(micros.map(_ * 1000L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$base/ns/events.parquet")

    // (b) timestamp[us] / TIMESTAMP_NTZ — the round-6 regeneration.
    ids.zip(micros).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$base/ntz/events.parquet")

    // (c) tz-adjusted TIMESTAMP — pass-through branch.
    ids.zip(micros).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$base/tz/events.parquet")

    (s"$base/ns", s"$base/ntz", s"$base/tz")
  }

  test("ns-as-long, timestamp_ntz, and timestamp encodings load identically") {
    val (ns, ntz, tz) = writeVariants()
    val loaded = Seq(ns, ntz, tz).map { dir =>
      val df = graft.sources.Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: loader must normalize ts to TIMESTAMP, got ${df.schema("ts").dataType}")
      df.orderBy("event_id").select("event_id", "ts").collect().toSeq
    }
    assert(loaded(0) == loaded(1), "ns-as-long vs timestamp_ntz rows differ")
    assert(loaded(0) == loaded(2), "ns-as-long vs timestamp rows differ")
    // Pin absolute values (UTC session): micro precision survives.
    val got = loaded(0).map(r => r.getAs[Timestamp]("ts").getTime * 1000 +
      (r.getAs[Timestamp]("ts").getNanos / 1000) % 1000)
    assert(got == micros, s"absolute micros mismatch: $got vs $micros")
  }

  test("unsupported ts type is rejected with a clear error") {
    val base = Files.createTempDirectory("events_bad").toString
    import spark.implicits._
    Seq((1L, "oops")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$base/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.events(spark, base)
    }
    assert(e.getMessage.contains("events.ts"))
  }

  // ---- embeddings: the same lesson applied BEFORE it burns ----------

  test("float and double embedding encodings load identically as array<float>") {
    val base = Files.createTempDirectory("emb_enc").toString
    import spark.implicits._
    val vecs = Seq((0L, Seq(1.5f, -2.25f, 0.125f)), (1L, Seq(0.0f, 3.5f, -1.75f)))
    vecs.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$base/f32/embeddings.parquet")
    // numpy-float64 shape: same values, double elements
    vecs.map { case (id, v) => (id, v.map(_.toDouble)) }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$base/f64/embeddings.parquet")
    val loaded = Seq(s"$base/f32", s"$base/f64").map { dir =>
      val df = graft.sources.Tables.embeddings(spark, dir)
      assert(df.schema("embedding").dataType ==
        ArrayType(FloatType, containsNull = true) ||
        df.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
        s"$dir: loader must normalize to array<float>, got ${df.schema("embedding").dataType}")
      df.orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    }
    assert(loaded(0) == loaded(1), "float vs double embedding rows differ")
    // and the value path the kernels take (getFloat slots) is intact:
    // a dot product over the normalized load matches the literal fold
    graft.plans.GraftFunctions.register(spark)
    val d = graft.functions.VectorFunctions.cosineNative(col("embedding"), col("embedding"))
    val ones = graft.sources.Tables.embeddings(spark, s"$base/f64")
      .select(d.as("c")).collect().map(_.getDouble(0))
    assert(ones.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("unsupported embedding element type is rejected with a clear error") {
    val base = Files.createTempDirectory("emb_bad").toString
    import spark.implicits._
    Seq((1L, Seq("a", "b"))).toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.sources.Tables.embeddings(spark, base)
    }
    assert(e.getMessage.contains("embeddings.embedding"))
  }
}
