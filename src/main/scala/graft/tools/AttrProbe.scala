package graft.tools

import org.apache.spark.sql.functions._

/** Bounded probe of the stream-stream interval join
  * (EventStreams.purchaseAttribution): where does the 75k ev/s go?
  *
  * Re-uses SoakBench's streaming event recipe (same generator, same
  * mtime-ordered range files, same maxFilesPerTrigger default) but runs
  * ONLY the attribution query and reads the per-batch
  * StreamingQueryProgress state-operator metrics — updates / removals /
  * commit milliseconds and state rows — so the "state-store bound"
  * claim is measured, not argued. Shuffle-partition count (= state
  * store instances per side) is the scale parameter under test: it is
  * exactly the knob a real cluster sizes to its executor count, so the
  * probe takes it as an argument instead of hard-coding either the
  * local core count or a cluster value.
  *
  * Run: scripts/runjava.sh graft.tools.AttrProbe [targetMb] [shufParts] [maxFiles]
  */
object AttrProbe {
  def main(args: Array[String]): Unit = {
    val targetMb = args.headOption.map(_.toInt).getOrElse(100)
    val shufParts = args.lift(1).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val maxFiles = args.lift(2).map(_.toInt).getOrElse(8)
    // optional state-store provider override (e.g. RocksDB) — the
    // production lever for commit-bound streaming state
    val b = graft.GraftSession.builder(shufflePartitions = shufParts)
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER").foreach(p =>
      b.config("spark.sql.streaming.stateStore.providerClass", p))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SoakBench's event recipe, verbatim (shared dir; regenerated only
    // when the recipe changes so repeated probes re-use the files)
    val evDir = "target/attr_probe_events"
    val evMark = java.nio.file.Paths.get(evDir, "_TARGETMB")
    val eMult = math.max(4, targetMb / 2)
    val eRecipe = s"$targetMb|stream-recipe-v1|eMult=$eMult"
    if (!(java.nio.file.Files.exists(evMark) &&
          new String(java.nio.file.Files.readAllBytes(evMark)) == eRecipe)) {
      val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
      val idStride = ev.agg(max(col("event_id"))).collect()(0).getLong(0) + 1
      ev.select(explode(sequence(lit(0), lit(eMult - 1))).as("i"),
          col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"), col("props"))
        .select(
          (col("event_id") + col("i") * idStride).as("event_id"),
          expr("timestampadd(DAY, 31 * i, ts)").as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .repartitionByRange(64, col("ts"))
        .sortWithinPartitions(col("ts"))
        .write.mode("overwrite").parquet(evDir)
      val parts = new java.io.File(evDir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val mt0 = parts.map(_.lastModified).min
      parts.zipWithIndex.foreach { case (f, i) =>
        f.setLastModified(mt0 + i * 1000L) }
      java.nio.file.Files.write(evMark, eRecipe.getBytes)
    }
    val evSchema = spark.read.parquet(evDir).schema
    val nEvents = spark.read.parquet(evDir).count()
    val nJoinable = spark.read.parquet(evDir)
      .filter(col("event_type").isin("click", "purchase")).count()

    val base = s"target/attr_probe_run"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val q = graft.streaming.EventStreams.purchaseAttribution(
        spark.readStream.schema(evSchema)
          .option("maxFilesPerTrigger", maxFiles).parquet(evDir))
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ck")
      .outputMode("append").start()
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.toSeq
    q.stop()

    // per-batch breakdown summed over the run: triggerExecution is the
    // full batch; addBatch is plan execution (shuffle + join + state
    // probes); the state-operator fields isolate the store itself
    def dsum(k: String) =
      prog.map(p => Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)).sum
    val trigMs = dsum("triggerExecution")
    val addMs = dsum("addBatch")
    val stateUpd = prog.flatMap(_.stateOperators.toSeq.map(_.allUpdatesTimeMs)).sum
    val stateRem = prog.flatMap(_.stateOperators.toSeq.map(_.allRemovalsTimeMs)).sum
    val stateCommit = prog.flatMap(_.stateOperators.toSeq.map(_.commitTimeMs)).sum
    val stateRowsMax = (prog.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal))
      :+ 0L).max
    val rows = spark.read.parquet(s"$base/out").count()
    println(f"""{"metric":"attr_probe","events":$nEvents,"joinable":$nJoinable,"shuffle_partitions":$shufParts,"max_files_per_trigger":$maxFiles,"batches":${prog.length},"sec":$sec%.1f,"events_per_sec":${nEvents / sec}%.0f,"joinable_per_sec":${nJoinable / sec}%.0f,"trigger_ms":$trigMs,"add_batch_ms":$addMs,"state_update_ms":$stateUpd,"state_removal_ms":$stateRem,"state_commit_ms":$stateCommit,"state_rows_max":$stateRowsMax,"attributions":$rows}""")
    spark.stop()
  }
}
