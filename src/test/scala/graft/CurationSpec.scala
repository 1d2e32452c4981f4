package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Curation
import graft.sources.Tables

class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("quota sample keeps at most the quota per stratum, deterministically") {
    val docs = Tables.documents(spark, sf)
    val s1 = Curation.quotaSample(docs, "doc_id", "source", 10)
    val over = s1.groupBy("source").count().filter(col("count") > 10).count()
    assert(over == 0)
    val s2 = Curation.quotaSample(docs, "doc_id", "source", 10)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
    // kept ids are a subset of the corpus
    assert(s1.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("quota sample equals the window formulation but plans through TopKPerKey") {
    val docs = Tables.documents(spark, sf)
    val topk = Curation.quotaSample(docs, "doc_id", "source", 7)
    val win = Curation.quotaSampleWindow(docs, "doc_id", "source", 7)
    assert(topk.exceptAll(win).isEmpty && win.exceptAll(topk).isEmpty)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), s"quota sample fell back to a window sort:\n$plan")
  }

  test("packing offsets are contiguous and bins follow floor(start/budget)") {
    val packed = Curation.packSequences(
      Tables.documents(spark, sf), "doc_id", "text", "source", 512)
    val bad = packed.filter(col("bin") =!= floor(col("start_offset") / 512)).count()
    assert(bad == 0)
    // contiguity: each doc starts where the previous one ended
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    val gaps = packed
      .withColumn("prev_end", lag(col("start_offset") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_offset") =!= col("prev_end")).count()
    assert(gaps == 0)
    // conservation: per-stratum token totals survive packing
    val total = packed.agg(sum("n_tokens")).collect()(0).getLong(0)
    val direct = Tables.documents(spark, sf)
      .select(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total == direct)
  }
}
