package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** C105 C4 cleaning rules (Raffel et al. 2020 §2.2) — hand-built pages
  * per rule so each gate is pinned independently of the fixture
  * schedule the oracle exercises.
  */
class C4RulesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val good = "alpha beta gamma delta epsilon."

  private def run(pages: (Long, String)*) =
    TextAnalysis.c4Rules(pages.toSeq.toDF("doc_id", "text"),
      "doc_id", "text", Seq("badterm"))
      .collect().map(r => r.getLong(0) -> r).toMap

  test("line rules: punctuation, five words, javascript") {
    val page = Seq(
      good,                                  // kept
      "alpha beta gamma delta epsilon",      // no terminal punct
      "tiny line here.",                     // < 5 words
      "uses javascript somewhere in here.",  // javascript
      "does it end with a question?",        // kept (?)
      "it ends with a quote \"",             // kept (")
      good).mkString("\n")
    val r = run(1L -> page)(1L)
    assert(r.getAs[Int]("n_lines") == 7)
    assert(r.getAs[Int]("n_kept") == 4)
    assert(r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("clean_text").linesIterator.size == 4)
  }

  test("page gates: brace, lorem ipsum, lexicon word, minimum sentences") {
    val base = Seq(good, good, good).mkString("\n")
    val m = run(
      1L -> base,
      2L -> (base + "\nfunction() {"),
      3L -> (base + "\nLorem Ipsum dolor sit amet."),
      4L -> (base + "\nbadterm appears right here today."),
      5L -> Seq(good, good).mkString("\n")) // only 2 kept lines
    assert(m(1L).getAs[Boolean]("keep"))
    assert(!m(2L).getAs[Boolean]("keep") && m(2L).getAs[Boolean]("has_brace"))
    assert(!m(3L).getAs[Boolean]("keep") && m(3L).getAs[Boolean]("has_lorem"))
    assert(!m(4L).getAs[Boolean]("keep") && m(4L).getAs[Boolean]("has_badword"))
    assert(!m(5L).getAs[Boolean]("keep") && m(5L).getAs[Int]("n_kept") == 2)
  }

  test("word bar counts whitespace runs, not single-space segments") {
    val page = Seq(
      good,                                   // kept
      "three  spaced  words.",                // 3 words — doubled spaces
                                              // must NOT inflate to 5
      "five  real  words  right  here.",      // 5 words survive doubled
                                              // spaces
      "\ttab\tseparated\twords\tcount\ttoo.", // tabs are whitespace
      good).mkString("\n")
    val r = run(1L -> page)(1L)
    assert(r.getAs[Int]("n_lines") == 5)
    assert(r.getAs[Int]("n_kept") == 4)
    assert(!r.getAs[String]("clean_text").contains("three  spaced"))
    assert(r.getAs[String]("clean_text").contains("five  real"))
  }

  test("empty text yields an empty-kept page that is dropped, never a crash") {
    val r = run(9L -> "")(9L)
    assert(r.getAs[Int]("n_kept") == 0)
    assert(!r.getAs[Boolean]("keep"))
    assert(r.getAs[String]("clean_text") == "")
  }

  test("empty lexicon fails fast") {
    intercept[IllegalArgumentException] {
      TextAnalysis.c4Rules(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Nil)
    }
  }
}
