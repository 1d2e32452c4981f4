package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.Materialize

/** Byte-pair-encoding tokenizer TRAINING at corpus scale (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the missing piece between corpus curation and model
  * training: learn the merge table the tokenizer ships with.
  *
  * The published algorithm learns from the WORD-COUNT dictionary, not
  * the raw corpus — so the corpus pays exactly ONE tokenize+count
  * scan (the same shape as `vocab_build`), and the merge loop runs on
  * the vocabulary table: big enough to stay a DataFrame (a 100 TB
  * web corpus has billions of distinct "words"), orders of magnitude
  * smaller than the corpus. Each round is one pair-count aggregation
  * (partial-agg'd), one scalar argmax to the driver (the merge — the
  * same per-round-scalar contract as the k-means loop), and one
  * map-side fold applying the merge; the round boundary is cut with
  * the iterative-loop materialization (stats-truncated, like Graph).
  *
  * Scale honesty: `nMerges` drives `nMerges` vocabulary-sized jobs —
  * real BPE training cost is linear in the merge count everywhere
  * (the single-node reference implementations pay the same loop on
  * one machine). The corpus-sized work stays O(1) scans.
  */
object Bpe {
  /** Word-end marker (classic `</w>` — distinguishes "est " from
    * "est" mid-word). Tokens CAN in principle contain angle brackets
    * (the tokenizer trims punctuation from edges only), so a literal
    * `</w>` token would conflate with the marker — the same
    * theoretical collision every printable-marker BPE implementation
    * (subword-nmt's `</w>`, HuggingFace's `##`/`Ġ`) accepts; the
    * hard guarantee used by the pair keys is only that symbols never
    * contain a SPACE (tokens are whitespace-split).
    */
  val EndMark = "</w>"

  /** (word, wcount) dictionary — the one corpus-scale scan. */
  def wordVocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))

  /** Character symbols of a word + the end marker, 1-based SQL
    * semantics on both engines (ASCII and CJK alike — `substring`
    * counts code points, matching DuckDB's `string_split(w, '')`).
    */
  private def symbols(wordCol: String): Column =
    concat(
      expr(s"transform(sequence(1, length($wordCol)), i -> substring($wordCol, i, 1))"),
      array(lit(EndMark)))

  /** Adjacent symbol pairs of every vocabulary word, weighted by word
    * count, summed — ROUND ONE of the merge loop as an oracle-checked
    * query: top `k` candidate merges by (freq desc, pair asc).
    */
  def pairFreqs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    wordVocab(docs, textCol)
      .select(symbols("word").as("s"), col("wcount"))
      .select(explode(expr(
        "transform(sequence(1, size(s) - 1), " +
          "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
        .as("p"), col("wcount"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("wcount")).as("freq"))
      .orderBy(col("freq").desc, col("left"), col("right"))
      .limit(k)

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, freq: Long)

  /** Learn up to `nMerges` merges from the corpus. Deterministic:
    * argmax tiebreak is (freq desc, left asc, right asc); stops early
    * when the best pair's support falls under `minFreq`.
    */
  def bpeLearn(docs: DataFrame, textCol: String, nMerges: Int,
               minFreq: Long = 2L): Seq[Merge] = {
    var vocab = Materialize.eagerNoStats(
      wordVocab(docs, textCol).select(symbols("word").as("s"), col("wcount")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var continue = true
    while (continue && merges.length < nMerges) {
      // words fully merged to ONE symbol have no pairs — and must be
      // filtered BEFORE the pair transform: Spark's sequence(1, 0) is
      // a DESCENDING [1, 0], so an unguarded element_at(s, i + 1)
      // walks off the array and ANSI mode kills the job
      val best = vocab.filter(size(col("s")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(s) - 1), " +
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"))
          .as("p"), col("wcount"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wcount")).as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minFreq) continue = false
      else {
        val (l, r, f) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Merge(merges.length + 1, l, r, l + r, f)
        // apply the merge: leftmost-first non-overlapping fold over
        // each word's symbols (map-side, vocabulary-sized)
        val applied = vocab.select(
          aggregate(col("s"), array().cast("array<string>"), (acc, s) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && s === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(s)))).as("s"),
          col("wcount"))
        val next = Materialize.eagerNoStats(applied)
        vocab.unpersist()
        vocab = next
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Learned merges as a DataFrame (for persistence / inspection). */
  def mergesDf(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeLearn(docs, textCol, nMerges).toDF()
  }

  /** Encode token arrays with a learned merge table — the tokenizer's
    * inference step as ONE kernel call per row
    * ([[graft.plans.BpeEncodeBroadcast]]): per word, repeatedly merge
    * the lowest-rank adjacent pair (leftmost on ties) until none
    * applies — the standard BPE encode; emits the document's subword
    * sequence in order. The rank table rides a broadcast (O(1) plan
    * size at any merge count).
    */
  def bpeEncode(spark: org.apache.spark.sql.SparkSession, tokensCol: Column,
                merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.classic.GraftPlanFactory
    val ranks = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.foreach(m => ranks.put(m.left + " " + m.right,
      Integer.valueOf(m.rank)))
    val bc = spark.sparkContext.broadcast(ranks)
    GraftPlanFactory.column(graft.plans.BpeEncodeBroadcast(bc,
      GraftPlanFactory.expression(tokensCol)))
  }
}
