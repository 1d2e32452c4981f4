package graft

import org.apache.spark.sql.SparkSession

/** Tuned [[SparkSession]] factory for the graft engine.
  *
  * Local runs use `local[N]` threads; on a real cluster the same confs
  * apply (AQE handles runtime re-planning and skew joins). Shuffle
  * partition count follows core count locally — on a 1000-executor
  * cluster AQE coalesces the initial (larger) partition count instead.
  */
object GraftSession {
  def builder(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"),
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.sources.Tables.NanosAsLong, "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // runtime bloom-filter pruning: the selective side of a shuffle
      // join filters the large side's scan — a pure win at fact-table
      // scale, free when inapplicable
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // Compress cached RDD blocks (off by default in Spark): the
      // library's materialized cuts are long/digest tables by
      // convention, which lz4 shrinks 2-4× — at the 10 GB fullchain
      // soak the LSH shingle cut's on-disk blocks were ~28 GB
      // uncompressed, the single largest line in the footprint that
      // ENOSPC'd the run. The decode cost rides the block read, not
      // the hot loop.
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
