package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

/** BPE tokenizer training + encode, pinned on the classic fixture
  * from Sennrich et al. 2016 (low/lower/newest/widest) — every merge
  * and encode below is hand-computed.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // word counts: low×5, lower×2, newest×6, widest×3 (one doc per
  // occurrence keeps the word-count dictionary explicit)
  private def fixture = {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
  }

  test("bpeLearn reproduces the textbook merge sequence") {
    val merges = Bpe.bpeLearn(fixture, "text", nMerges = 5)
    val got = merges.map(m => (m.rank, m.left, m.right, m.freq))
    // es:9 (newest 6 + widest 3), est:9, est</w>:9, lo:7, low:7 —
    // ties at 9 break (left, right) ascending: (e,s) < (es,t)… etc.
    assert(got == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("bpeLearn stops early when support falls under minFreq") {
    val merges = Bpe.bpeLearn(fixture, "text", nMerges = 100, minFreq = 7L)
    assert(merges.length == 5) // nothing after low reaches 7
    assert(merges.last.merged == "low")
  }

  test("bpeEncode applies merges by rank (lowest first, leftmost on ties)") {
    val merges = Bpe.bpeLearn(fixture, "text", nMerges = 5)
    val docs = Seq((1L, "newest"), (2L, "low"), (3L, "lowest"), (4L, "xy"))
      .toDF("doc_id", "text")
    val enc = docs.select(col("doc_id"),
      Bpe.bpeEncode(spark, graft.functions.TextFunctions.tokens(col("text")),
        merges).as("sub"))
    val got = enc.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // newest: e+s → es+t → est+</w>; no rank for n/e/w pairs
    assert(got(1L) == Seq("n", "e", "w", "est</w>"))
    // low: l+o (rank 4) → lo+w (rank 5); "</w>" unattached (no merge)
    assert(got(2L) == Seq("low", "</w>"))
    // lowest (unseen word): low + est</w> via the shared subwords
    assert(got(3L) == Seq("low", "est</w>"))
    // fully OOV word falls back to characters
    assert(got(4L) == Seq("x", "y", "</w>"))
  }

  test("bpeEncode flattens multi-token docs in order; empty text encodes empty") {
    val merges = Bpe.bpeLearn(fixture, "text", nMerges = 5)
    val docs = Seq((1L, "low newest"), (2L, "")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Bpe.bpeEncode(spark, graft.functions.TextFunctions.tokens(col("text")),
          merges).as("sub"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("low", "</w>", "n", "e", "w", "est</w>"))
    assert(got(2L) == Seq.empty)
  }

  test("words that merge down to a single symbol don't break later rounds") {
    // "ab" collapses fully: (a,b) then (ab,</w>) → one symbol; the
    // next round must find no pairs and stop cleanly (sequence(1, 0)
    // is DESCENDING in Spark — unguarded it walks off the array)
    val docs = (1L to 10L).map((_, "ab")).toDF("doc_id", "text")
    val merges = Bpe.bpeLearn(docs, "text", nMerges = 10)
    assert(merges.map(_.merged) == Seq("ab", "ab</w>"))
  }

  test("bpeEncode is stream-safe: replay equals the batch encode") {
    // pure map-side kernel → usable directly in Structured Streaming
    // with no wrapper, no state, no watermark
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val merges = Bpe.bpeLearn(fixture, "text", nMerges = 5)
    def encoded(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        Bpe.bpeEncode(spark, graft.functions.TextFunctions.tokens(col("text")),
          merges).as("sub"))
    val docs = Seq((1L, "lowest newest"), (2L, "low wide")).toDF("doc_id", "text")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData((1L, "lowest newest"), (2L, "low wide"))
    val q = encoded(ms.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("bpeenc").outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bpeenc")
    val batch = encoded(docs)
    assert(streamed.count() == 2)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("LshPlan: S-curve math, factorization sweep, recommendation") {
    import graft.operators.LshPlan
    // hand values: P(collide | s=.5, b=8, r=2) = 1 − (1 − .25)^8
    assert(math.abs(LshPlan.collisionP(0.5, 8, 2)
      - (1.0 - math.pow(0.75, 8))) < 1e-12)
    val ps = LshPlan.plans(16, 0.5)
    assert(ps.map(p => (p.bands, p.rows)).toSet ==
      Set((1, 16), (2, 8), (4, 4), (8, 2), (16, 1)))
    // more bands → lower threshold, more false-positive mass
    val byB = ps.sortBy(_.bands)
    assert(byB.map(_.threshold) == byB.map(_.threshold).sorted.reverse)
    assert(byB.map(_.fpMassBelow) == byB.map(_.fpMassBelow).sorted)
    // the repo default (8, 2) is the right k=16 split at jaccard .5
    // once the recall floor admits its 0.8999 detection probability —
    // and the advisor honestly reports k=16 cannot reach 0.9 recall
    // with any tight-threshold split (only (16,1) clears 0.9)
    val rec = LshPlan.recommend(16, 0.5, minRecall = 0.85)
    assert((rec.bands, rec.rows) == (8, 2))
    assert(math.abs(rec.pAtTarget - 0.899887) < 1e-4)
    val strict = LshPlan.recommend(16, 0.5, minRecall = 0.9)
    assert((strict.bands, strict.rows) == (16, 1))
  }

  test("pairFreqs matches the loop's first-round argmax") {
    val top = Bpe.pairFreqs(fixture, "text", 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(top.head == ("e", "s", 9L))
    assert(top.toSeq == Seq(("e", "s", 9L), ("s", "t", 9L), ("t", "</w>", 9L)))
  }
}
