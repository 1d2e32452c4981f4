package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MapReduceOps

/** The migration adapter: a cooler-MapReduce job body ported verbatim
  * (map_fn yields (word, 1), reduce_fn sums — word_count.py:8-39) must
  * agree with the declarative wordCount operator.
  */
class MapReduceAdapterSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ported map_fn/reduce_fn word count equals declarative wordCount") {
    val docs = sources.Tables.documents(spark, sf)
    val texts = docs.select("text").as[String]
    // verbatim port of the reference job body:
    val mapFn = (text: String) =>
      text.strip().toLowerCase.split("\\s+").toSeq
        .map(_.stripPrefix(".").stripSuffix("."))            // reference strips '.,!?;:"\'-'
        .map(w => w.replaceAll("^[.,!?;:\"'-]+|[.,!?;:\"'-]+$", ""))
        .filter(_.nonEmpty)
        .map(w => (w, 1L))
    val reduceFn = (a: Long, b: Long) => a + b
    val adapter = MapReduceOps.mapReduce(texts, mapFn, reduceFn).toDF("word", "cnt")
    val declarative = MapReduceOps.wordCount(docs, "text")
    assert(adapter.count() == declarative.count())
    assert(adapter.exceptAll(declarative).isEmpty &&
           declarative.exceptAll(adapter).isEmpty)
  }
}
