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
    names.foreach { name =>
      (1 to n).foreach { i =>
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        spans.reset()
        val t0 = System.nanoTime()
        graft.Monitoring.tag(graft.SparkEntry.queries(name)(spark, sfDir), name)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        org.apache.spark.sql.classic.GraftPlanFactory.flushListeners(spark)
        println(f"$name,$i,$wall%.3f,${spans.totalSec}%.3f")
      }
    }
    spark.stop()
  }
}
