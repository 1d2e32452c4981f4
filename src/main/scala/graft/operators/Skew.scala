package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers.
  *
  * AQE's skew-join handling (enabled in GraftSession) covers most
  * cases at runtime; explicit salting remains the tool of choice when
  * one join key dominates so heavily that even split shuffle blocks
  * overload a task, or when the skewed side feeds an aggregation.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt in [0, salt) derived from its non-key columns; the small side
    * is replicated `salt` ways. Row multiplicity is preserved exactly;
    * the shuffle spreads each hot key over `salt` partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigCols = big.columns.map(col).toSeq
    val b = big.withColumn("__salt",
      pmod(xxhash64(bigCols: _*), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted two-phase aggregation: count/sum-like partial aggregation on
    * (key, salt), then final merge on key — bounds the per-task group
    * size for ultra-hot keys. `aggs` must be algebraic (re-aggregable):
    * pass (partialAgg, finalAgg) pairs keyed by output column.
    */
  def saltedCount(df: DataFrame, key: String, salt: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__pc"))
      .groupBy(col(key))
      .agg(sum(col("__pc")).as("cnt"))

  /** Salted two-phase sum+count over a decimal-cast value — the
    * re-aggregable form for hot-key event streams. Salting is
    * semantically invisible (the oracle for the registered query is
    * the PLAIN GROUP BY SQL), only the shuffle shape changes: each hot
    * key's rows spread over `salt` partial groups before the tiny
    * final merge.
    */
  def saltedValueStats(df: DataFrame, key: String, valueCol: String,
                       salt: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__pc"),
        sum(col(valueCol).cast("decimal(18,4)")).as("__ps"))
      .groupBy(col(key))
      .agg(sum(col("__pc")).as("n"),
        sum(col("__ps")).cast("double").as("total_value"))
}
