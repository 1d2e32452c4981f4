package graft.tools

/** Times queries one at a time (no pool overlap) — separates a query's
  * real cost from Bench's contention-inflated spans. Args: sfDir then
  * query names; prints one `name,seconds` line each.
  */
object IsolatedBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n => // warm the JIT/planner once on the first name
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$n,${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
