package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The reference's atomic output-commit promise (cooler-MapReduce
  * design.md fault section: output visible only after a task commits,
  * rerun tasks never double-write) as Structured Streaming's
  * exactly-once file sink: the parquet sink records committed files in
  * `_spark_metadata`, the checkpoint records committed batches, so a
  * query killed mid-stream and resumed from the same checkpoint
  * delivers every input row exactly once — uncommitted partial output
  * is invisible to readers and the replayed batch does not duplicate.
  */
class ExactlyOnceSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("parquet sink + checkpoint: kill mid-stream, resume → no dupes, no loss") {
    val root = Files.createTempDirectory("graft_eos").toFile.getAbsolutePath
    val in = s"$root/in"; val out = s"$root/out"; val cp = s"$root/cp"
    // 4 input files of 100 ids each; maxFilesPerTrigger=1 → 4 batches
    (0 until 4).foreach { n =>
      spark.range(n * 100L, (n + 1) * 100L).coalesce(1)
        .write.mode("append").parquet(in)
    }
    val schema = spark.read.parquet(in).schema
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .start()

    // run 1: stop as soon as the first batch lands — mid-stream, with
    // later batches unprocessed or in flight
    val q1 = start()
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.recentProgress.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(20)
    q1.stop()
    assert(q1.recentProgress.nonEmpty, "first batch never committed")

    // run 2: resume from the same checkpoint and drain the rest
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    // `_spark_metadata` defines committed output — a batch read of the
    // sink directory sees each input id exactly once
    val got = spark.read.parquet(out)
    assert(got.count() == 400L, "loss: some committed input rows missing")
    assert(got.distinct().count() == 400L, "dupes: a replayed batch double-wrote")
  }
}
