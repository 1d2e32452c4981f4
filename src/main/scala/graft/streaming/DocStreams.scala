package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming over document feeds — the continuous-ingestion
  * twins of the batch curation operators in graft.operators.
  */
object DocStreams {

  /** Streaming incremental exact dedup — the stream twin of
    * Dedup.incremental's fingerprint stage: each arriving document is
    * dropped if its content fingerprint already exists in the static
    * `reference` corpus (stream-static anti join — Spark re-reads the
    * static side per micro-batch, so a reference that grows between
    * batches is picked up), and in-stream duplicates within the
    * watermark horizon are dropped by fingerprint (state bounded by the
    * watermark, partitioned by fingerprint across executors).
    *
    * The LSH near-dup stage intentionally stays batch: a minhash
    * signature is an aggregation over the document's shingles, and
    * chaining a streaming aggregation into a join/dedup isn't
    * expressible in append mode — run [[graft.operators.Dedup
    * .incremental]] over the sink periodically for near-dups.
    */
  def incrementalDedup(docs: DataFrame, reference: DataFrame,
                       idCol: String, textCol: String, tsCol: String,
                       watermark: String = "2 hours"): DataFrame = {
    val refFp = reference
      .select(md5(col(textCol).cast("binary")).as("__fp")).distinct()
    docs
      .withColumn("__fp", md5(col(textCol).cast("binary")))
      .join(refFp, Seq("__fp"), "left_anti")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
