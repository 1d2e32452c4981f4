package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** The reference's MapReduce surface (cooler-MapReduce `design.md:67-108`,
  * `shared/samples/`) re-expressed as declarative Spark plans.
  *
  * The reference's combiner (`design.md:197-245`) needs no re-creation:
  * every `groupBy().agg()` below compiles to partial aggregation
  * (HashAggregate map-side → shuffle → HashAggregate final), which IS
  * map-side combine, picked automatically by Catalyst. Hash
  * partitioning by key (`task_executor.py` `hash(key) % R`) is the
  * shuffle exchange; the sorted reduce output (`task_executor.py:226`)
  * is `orderBy`, a sampled range partitioning that scales linearly.
  */
object MapReduceOps {

  /** Exploded, punctuation-trimmed, non-empty token stream. Trimming
    * happens AFTER the explode as flat column expressions — identical
    * result to `tokens()`, but the whole path stays in whole-stage
    * codegen (HOF lambdas would run interpreted at ~5× less scan
    * throughput).
    */
  private def tokenStream(docs: DataFrame, textCol: String, extra: Column*): DataFrame =
    docs
      .select(extra :+ explode(split(lower(col(textCol)), "\\s+")).as("__raw"): _*)
      .select(extra :+ trim(col("__raw"), PunctChars).as("word"): _*)
      .filter(col("word") =!= "")

  /** Word frequencies over a text column (word_count.py analog).
    * One scan; tokenization is codegen'd; counts combine map-side.
    */
  def wordCount(docs: DataFrame, textCol: String): DataFrame =
    tokenStream(docs, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Grep: rows whose text matches a (Java/RE2-common) regex. The
    * filter is evaluated in the scan stage; with a non-regex prefix a
    * parquet `contains` pushdown applies.
    */
  def grep(docs: DataFrame, textCol: String, pattern: String): DataFrame =
    docs.filter(col(textCol).rlike(pattern))

  /** Inverted index: word → the first `maxDocIds` containing doc ids
    * (ascending) plus the full distinct count (design.md:277 analog).
    *
    * The posting list is CAPPED: an uncapped `collect_set(doc_id)`
    * accumulates every containing doc id in ONE aggregation buffer, and
    * for a stop word over a 100 TB corpus that is billions of ids in a
    * single executor buffer → OOM. Instead the distinct (word, doc_id)
    * pairs stream through TopKPerKey (ascending, ≤ maxDocIds rows per
    * word survive each partition before the shuffle), so no buffer
    * anywhere holds more than maxDocIds entries; the total count rides
    * a separate partial aggregation and joins back on the word key.
    * A full posting list, when genuinely needed, is the exploded PAIRS
    * table (word, doc_id) — a dataset, not a single row's array.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxDocIds: Int = 1000): DataFrame = {
    val pairs = tokenStream(docs, textCol, col(idCol))
      .select(col("word"), col(idCol)).distinct()
    val counts = pairs.groupBy("word")
      .agg(count(lit(1)).as("n_docs"))
    val firstK = graft.plans.TopK.perKey(
      pairs, Seq("word"), Seq(idCol), maxDocIds, descending = false)
    firstK.groupBy("word")
      .agg(array_join(sort_array(collect_list(col(idCol))), ",").as("doc_ids"))
      .join(counts, Seq("word"))
      .select(col("word"), col("doc_ids"), col("n_docs"))
  }

  /** Per-key avg/min/max/count of a numeric column (weather_stats.py
    * analog). The sum runs on decimal so the average is bit-exact and
    * association-order independent — same trick the reference's
    * combiner uses (carrying sum+count instead of averaging early).
    */
  def keyStats(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val dec = col(valCol).cast("decimal(18,4)")
    df.groupBy(col(keyCol))
      .agg(
        (sum(dec).cast("double") / count(lit(1))).as("avg_value"),
        min(col(valCol)).as("min_value"),
        max(col(valCol)).as("max_value"),
        count(lit(1)).as("n"))
  }

  /** Globally sorted output with an explicit position column — the
    * reference's sorted `part-r-*` files. `orderBy` is a sampled
    * range-partitioned sort (parallel); positions come from
    * `zipWithIndex` (one extra lightweight count job), NOT from a
    * global `row_number()` window, which would funnel every row into
    * a single partition.
    */
  def distributedSort(df: DataFrame, ord: Seq[Column], out: Seq[Column]): DataFrame = {
    val sorted = df.select(out: _*).orderBy(ord: _*)
    // positions are LONG: an int position overflows past 2^31 rows,
    // which a 100 TB sort crosses early
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType, false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1))
    }
    sorted.sparkSession.createDataFrame(rdd, schema)
  }

  /** Secondary sort: per-key values ordered by a secondary key — the
    * classic MapReduce composite-key/grouping-comparator pattern.
    * Emits the first `take` ordered values joined for oracle
    * comparability, plus the per-key count.
    *
    * The first-k rows come from the custom TopKPerKey operator
    * (ascending), NOT from `collect_list`-then-slice: collecting every
    * value of a hot key into one array is an unbounded allocation at
    * corpus scale, while TopKPerKey reduces each partition to ≤ take
    * rows per key before the shuffle. The count rides a separate
    * partial aggregation and joins back on the (already co-partitioned)
    * key. Requires (ordCol, valCol) to be total per key for a
    * deterministic result.
    */
  def secondarySort(df: DataFrame, keyCol: String, ordCol: String,
                    valCol: String, take: Int): DataFrame = {
    // long, not int: a per-key value count is unbounded at corpus scale
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_values"))
    val firstK = graft.plans.TopK.perKey(
      df.select(col(keyCol), col(ordCol), col(valCol)),
      Seq(keyCol), Seq(ordCol, valCol), take, descending = false)
    val firsts = firstK.groupBy(col(keyCol))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col(ordCol), col(valCol)))),
          s => s.getField(valCol).cast("string"))).as("first_values"))
    firsts.join(counts, Seq(keyCol))
      .select(col(keyCol), col("first_values"), col("n_values"))
  }

  /** Combiner-shaped aggregation: per-key exact sum + count. */
  def combinerAgg(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        sum(col(valCol).cast("decimal(18,4)")).cast("double").as("total_value"),
        count(lit(1)).as("n"))

  /** Generic migration adapter for reference jobs: `map_fn` ≡ flatMap to
    * (key, value), `combine_fn`+`reduce_fn` ≡ `reduceGroups`. Prefer the
    * declarative operators above — this exists so a cooler-MapReduce
    * user can port an arbitrary job body verbatim. Aggregation is still
    * distributed (groupByKey → sort-based agg), but closures skip
    * whole-stage codegen, so it's the slow path by design.
    */
  def mapReduce[I, K: Encoder, V: Encoder](
      input: Dataset[I],
      mapFn: I => IterableOnce[(K, V)],
      reduceFn: (V, V) => V)(
      implicit kv: Encoder[(K, V)]): Dataset[(K, V)] =
    input.flatMap(mapFn(_))(kv).groupByKey(_._1).reduceGroups((a, b) => (a._1, reduceFn(a._2, b._2))).map(_._2)(kv)
}
