package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

class StreamJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("stream-stream interval join attributes purchases to recent clicks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = ms.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.purchaseAttribution(events)
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 01:$min%02d:00")
    try {
      ms.addData(
        (1L, t(0), 7L, "click", 0.0),     // within 30 min of purchase → match
        (2L, t(5), 7L, "click", 0.0),     // within → match
        (3L, t(10), 8L, "click", 0.0),    // other user → no match
        (4L, t(20), 7L, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("attr").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((4L, 1L), (4L, 2L)))
    } finally q.stop()
  }
}
