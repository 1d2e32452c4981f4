package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session, SessionState}

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming windowed counts equal the batch tumbling-window query") {
    val stream = EventStreams.readEventStream(spark, sf)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win")
    val batch = operators.Relational.qTumblingWindow(spark, sf)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("stateful sessionize emits closed sessions and keeps open ones in state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val sessions = EventStreams.sessionize(ms.toDS())
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    val M = 1000000L // micros
    try {
      // user 1: two events 10 min apart (one session), then a 2h gap event
      ms.addData(
        Event(1, 0L, 1, "click", 1.0),
        Event(2, 600 * M, 1, "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0) // session still open
      ms.addData(Event(3, 7800 * M, 1, "click", 1.0)) // 2h after last → closes it
      q.processAllAvailable()
      val closed = spark.table("sess").as[Session].collect()
      assert(closed.toSeq == Seq(Session(1, 0L, 2, 600.0)))
    } finally q.stop()
  }
}
