package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** ExactSubstr family (Dedup.exactSubstrSpans / exactSubstrStats):
  * corpus-wide duplicated-token spans from a positional k-gram index.
  * Fixtures use per-document vocabularies so the only duplicated grams
  * are the planted ones, making every expected span exactly computable.
  */
class ExactSubstrSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def toks(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  // 20-token run shared verbatim by docs 1 and 2 at different offsets
  private val shared = toks("dup", 20)
  // 14-token run repeated twice INSIDE doc 3 (internal repetition)
  private val innerRep = toks("rep", 14)
  // 9-token run shared by docs 5 and 6 — above k=8 (grams exist) but
  // below minSpan=12 (span must be filtered)
  private val shortShared = toks("tiny", 9)

  private lazy val docs = Seq(
    (1L, (toks("apre", 5) ++ shared ++ toks("asuf", 3)).mkString(" ")),
    (2L, (toks("bpre", 2) ++ shared ++ toks("bsuf", 6)).mkString(" ")),
    (3L, (toks("cpre", 3) ++ innerRep ++ toks("cmid", 2) ++ innerRep ++
      toks("csuf", 2)).mkString(" ")),
    (4L, toks("unique", 30).mkString(" ")),
    (5L, (toks("epre", 4) ++ shortShared).mkString(" ")),
    (6L, (shortShared ++ toks("fsuf", 4)).mkString(" "))
  ).toDF("doc_id", "text")

  private lazy val spans = Dedup.exactSubstrSpans(docs, "doc_id", "text")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    .sortBy(t => (t._1, t._2))

  test("cross-document shared run yields one maximal span per doc at exact offsets") {
    // doc 1: shared at 0-based positions 5..24; duplicated 8-gram starts
    // run 5..17, so the merged span is [5, 17+7] = [5, 24], 20 tokens.
    assert(spans.filter(_._1 == 1L).toSeq == Seq((1L, 5L, 24L, 20L)))
    // doc 2: shared at positions 2..21 → span [2, 21], 20 tokens.
    assert(spans.filter(_._1 == 2L).toSeq == Seq((2L, 2L, 21L, 20L)))
  }

  test("internal repetition within one document is duplication (suffix-array semantics)") {
    // doc 3: copies at positions 3..16 and 19..32; the 10-token gap
    // between duplicated gram starts (9 → 19) exceeds k=8, so the
    // copies stay separate islands — two 14-token spans.
    assert(spans.filter(_._1 == 3L).toSeq ==
      Seq((3L, 3L, 16L, 14L), (3L, 19L, 32L, 14L)))
  }

  test("spans shorter than minSpan are filtered; unique docs have none") {
    assert(!spans.exists(t => Seq(4L, 5L, 6L).contains(t._1)))
    // ...but the 9-token run IS found when minSpan allows it
    val loose = Dedup.exactSubstrSpans(docs, "doc_id", "text", minSpan = 9)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(loose.count(t => t._1 == 5L && t._2 == 9L) == 1)
    assert(loose.count(t => t._1 == 6L && t._2 == 9L) == 1)
  }

  test("stats ledger: every doc reported, dup_tokens = merged span cover") {
    val st = Dedup.exactSubstrStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(st.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(st(1L) == ((28L, 20L, 20.0 / 28.0)))
    assert(st(2L) == ((28L, 20L, 20.0 / 28.0)))
    assert(st(3L) == ((35L, 28L, 28.0 / 35.0)))
    assert(st(4L) == ((30L, 0L, 0.0)))
    assert(st(5L)._2 == 0L && st(6L)._2 == 0L)
  }

  test("adjacent/overlapping gram covers merge into one span, never double-counted") {
    // one doc, one 30-token run duplicated across two docs → a single
    // island even though 23 separate gram starts witness it
    val two = Seq(
      (10L, toks("m", 30).mkString(" ")),
      (11L, (toks("zpre", 7) ++ toks("m", 30)).mkString(" "))
    ).toDF("doc_id", "text")
    val s = Dedup.exactSubstrSpans(two, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(s.toSet == Set((10L, 0L, 29L, 30L), (11L, 7L, 36L, 30L)))
  }
}
