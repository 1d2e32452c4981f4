package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-curation operators a training-data pipeline runs after
  * dedup/quality filtering: deterministic quota sampling per stratum
  * and token-stream packing into fixed-budget examples.
  *
  * Both are pure window/aggregate plans — partitioned by the stratum
  * key, no driver-side loops, no randomness (md5-derived order makes
  * every run and every engine agree bit-for-bit).
  */
object Curation {
  private def phash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Deterministic quota sample: keep at most `quota` docs per stratum,
    * chosen by md5-hash order (a stable uniform draw — no RNG, so
    * resampling a grown corpus keeps previously-kept docs only if they
    * still win their hash rank).
    *
    * Runs on the custom TopKPerKey operator, not a row_number window:
    * the window form shuffles and sorts EVERY row per stratum, while
    * TopKPerKey reduces each input partition to ≤ quota rows per
    * stratum before the shuffle — at 100 TB the shuffle carries the
    * sample, not the corpus. [[quotaSampleWindow]] is the reference
    * formulation the spec checks equality against.
    */
  def quotaSample(docs: DataFrame, idCol: String, strataCol: String,
                  quota: Int): DataFrame = {
    val hashed = docs.select(col(idCol), col(strataCol),
      phash(concat(col(strataCol), lit("|"), col(idCol).cast("string"))).as("__h"))
    graft.plans.TopK.perKey(hashed, Seq(strataCol), Seq("__h", idCol),
        quota, descending = false)
      .select(col(idCol), col(strataCol))
  }

  /** Built-in-window reference formulation of [[quotaSample]]. */
  def quotaSampleWindow(docs: DataFrame, idCol: String, strataCol: String,
                        quota: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__h"), col(idCol))
    docs
      .select(col(idCol), col(strataCol),
        phash(concat(col(strataCol), lit("|"), col(idCol).cast("string"))).as("__h"))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= quota)
      .select(col(idCol), col(strataCol))
  }

  /** Token-stream packing: docs are concatenated in (stratum, id) order
    * and cut into fixed `budget`-token examples — document boundaries
    * may straddle examples, the standard LM-pretraining packing. Each
    * doc's example/bin id is floor(start_offset / budget) where
    * start_offset counts all preceding tokens in its stratum. A running
    * window sum partitioned by stratum — one shuffle, scales linearly.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    strataCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(idCol), col(strataCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("start_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_offset") / budget))
      .select(col(idCol), col(strataCol), col("n_tokens"),
        col("start_offset"), col("bin"))
  }
}
