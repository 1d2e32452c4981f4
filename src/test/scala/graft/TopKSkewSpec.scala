package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.plans.TopK

class TopKSkewSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("custom TopKPerKey operator matches the window formulation") {
    val ev = sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"))
    val custom = TopK.perKey(ev, Seq("user_id"), Seq("value", "event_id"), 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id").desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(custom.count() == windowed.count())
    assert(custom.exceptAll(windowed).isEmpty && windowed.exceptAll(custom).isEmpty)
  }

  test("TopKPerKey ascending keeps the smallest") {
    val df = Seq((1, 5.0), (1, 1.0), (1, 3.0), (2, 9.0), (2, 7.0))
      .toDF("k", "v")
    val got = TopK.perKey(df, Seq("k"), Seq("v"), 1, descending = false)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(got == Set((1, 1.0), (2, 7.0)))
  }

  test("salted join equals plain join on skewed data") {
    val big = Seq.tabulate(10000)(i => (if (i % 10 == 0) 1 else i % 100, i))
      .toDF("key", "payload")
    val small = Seq.tabulate(100)(i => (i, s"dim$i")).toDF("key", "name")
    val plain = big.join(small, "key")
    val salted = Skew.saltedJoin(big, small, "key", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted count equals plain count") {
    val df = Seq.tabulate(5000)(i => (if (i % 2 == 0) "hot" else s"k${i % 50}", i))
      .toDF("key", "v")
    val plain = df.groupBy("key").agg(count(lit(1)).as("cnt"))
    val salted = Skew.saltedCount(df, "key", 8)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("streaming dedup drops duplicates within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val df = ms.toDF().toDF("event_id", "ts")
    val q = graft.streaming.EventStreams.dedupStream(df, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    try {
      ms.addData((1L, t0), (2L, t0), (1L, t0))
      q.processAllAvailable()
      ms.addData((1L, t0), (3L, t0))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
