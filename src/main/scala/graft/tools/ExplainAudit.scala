package graft.tools

/** Prints formatted physical plans for queries — used to audit
  * pushdown (`PushedFilters`), pruning (`ReadSchema`), broadcast
  * choices, and WholeStageCodegen coverage.
  *
  * Run: sbt "runMain graft.tools.ExplainAudit [names...]"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001),
  *      SPARK_GRAFT_EXPLAIN_DIR — when set, each query's plan is ALSO
  *      written to `$DIR/<name>.txt` (the per-round plans/ deliverable).
  * Uses the tuned GraftSession (extensions + AQE), the same session
  * shape Bench measures.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    outDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "doc_fingerprint",
        "dedup_minhash", "dedup_embedding", "knn_lsh", "mr_wordcount",
        "corpus_quota_sample", "pack_sequences")
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = graft.SparkEntry.queries(n)(spark, sf)
      df.explain("formatted")
      outDir.foreach { d =>
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(d, s"$n.txt"), txt)
      }
    }
    spark.stop()
  }
}
