package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK

/** Memory-safety and type-safety checks for the TopKPerKey operator:
  * bounded partial-stage key map (flush threshold), and buffer-backed
  * (string) ordering values surviving row-buffer reuse.
  */
class TopKBoundedSpec extends AnyFunSuite {
  import TestSpark._

  private def withFlushKeys[T](n: Int)(body: => T): T = {
    val prev = spark.conf.getOption("graft.topk.flushKeys")
    try { spark.conf.set("graft.topk.flushKeys", n.toString); body }
    finally prev match {
      case Some(p) => spark.conf.set("graft.topk.flushKeys", p)
      case None    => spark.conf.unset("graft.topk.flushKeys")
    }
  }

  private def assertSameSet(got: DataFrame, want: DataFrame): Unit = {
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("1M distinct keys per partition stay bounded via flush threshold") {
    withFlushKeys(1024) {
      val df = spark.range(0, 1000000L, 1, 2)
        .select(col("id").as("k"), (col("id") % 97).as("v"), col("id"))
      assert(TopK.perKey(df, Seq("k"), Seq("v", "id"), 3).count() == 1000000L)
    }
  }

  test("flushing partials merge to the exact window-formulation answer") {
    withFlushKeys(16) {
      val df = spark.range(0, 200000L, 1, 8)
        .select((col("id") % 100).as("k"), ((col("id") * 7919) % 100003).as("v"), col("id"))
      val got = TopK.perKey(df, Seq("k"), Seq("v", "id"), 3)
      val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("id").desc)
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      assertSameSet(got, want)
    }
  }

  test("inverted index: stop-word posting list capped, count exact, state bounded") {
    withFlushKeys(1024) {
      // every doc contains "the" (the stop-word / hot-key case) plus one
      // rare token; 100k docs across 4 partitions
      val docs = spark.range(0, 100000L, 1, 4)
        .select(col("id").as("doc_id"),
          concat(lit("The tok"), (col("id") % 1000).cast("string")).as("text"))
      val idx = operators.MapReduceOps
        .invertedIndex(docs, "doc_id", "text", maxDocIds = 10)
      val hot = idx.filter(col("word") === "the").collect()(0)
      assert(hot.getAs[Long]("n_docs") == 100000L)
      assert(hot.getAs[String]("doc_ids") == (0 until 10).mkString(","),
        "posting list must be the first maxDocIds ids ascending")
      val rare = idx.filter(col("word") === "tok7").collect()(0)
      assert(rare.getAs[Long]("n_docs") == 100L)
      assert(rare.getAs[String]("doc_ids").split(",").length == 10)
    }
  }

  test("string ordering column is copied, not aliased to the reused row buffer") {
    val df = spark.range(0, 50000L, 1, 4)
      .select((col("id") % 50).as("k"),
        concat(lit("s"), lpad(((col("id") * 37) % 99991).cast("string"), 6, "0")).as("s"),
        col("id"))
    val got = TopK.perKey(df, Seq("k"), Seq("s"), 2)
    val w = Window.partitionBy(col("k")).orderBy(col("s").desc)
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assertSameSet(got, want)
  }
}
