package graft.tools

/** Replicates Bench's full-registry sweep mechanics for a handful of
  * queries — fresh local[8] GraftSession, engine spans via
  * Monitoring.installSpans, N attempts per query — so a flagged sweep
  * breach can be reproduced (or cleared) without a 4-minute full sweep.
  * Args: sfDir nAttempts name [name...]; prints name,attempt,wall,engine.
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spans = graft.Monitoring.installSpans(spark)
    // per-attempt job/stage/shuffle counters — the evidence trail for
    // "this change removed a per-round job/exchange" claims (the final
    // explain of an iterative query only shows the last checkpoint read)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val shufWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        shufWrite.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })
    names.foreach { name =>
      (1 to n).foreach { i =>
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        spans.reset(); jobs.set(0); stages.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        graft.Monitoring.tag(graft.SparkEntry.queries(name)(spark, sfDir), name)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        Thread.sleep(200) // let the scheduler bus drain the last stage events
        println(f"$name,$i,$wall%.3f,${spans.totalSec}%.3f," +
          s"jobs=${jobs.get},stages=${stages.get},shufKB=${shufWrite.get / 1024}")
      }
    }
    spark.stop()
  }
}
