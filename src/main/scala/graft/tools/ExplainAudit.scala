package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for a few headline queries —
  * used to audit pushdown (`PushedFilters`), pruning (`ReadSchema`),
  * broadcast choices, and WholeStageCodegen coverage.
  *
  * Run: sbt "runMain graft.tools.ExplainAudit [names...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_top_orders", "doc_fingerprint",
        "dedup_minhash", "dedup_embedding", "knn_lsh", "mr_wordcount",
        "corpus_quota_sample", "pack_sequences")
    names.foreach { n =>
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
