package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MapReduceOps
import graft.sources.Tables

/** The reference's week-2 fault story (cooler-MapReduce design.md:447-453,
  * tests/test_week2.py: worker crash → task rescheduled → job completes
  * with the same answer) on Spark's native retry machinery.
  *
  * TestSpark runs `local[4, 2]` = `spark.task.maxFailures = 2`: a task
  * may fail once and be re-attempted before the job aborts. The injection
  * is an attemptNumber-gated throw — attempt 0 of one partition dies,
  * the retry (attempt 1) succeeds — and the assertion is the strongest
  * one available: the faulted query's RESULT equals the clean run's,
  * i.e. recovery is not just "no crash" but bit-identical output.
  */
class FaultToleranceSpec extends AnyFunSuite {
  import TestSpark._

  private def sameResult(a: DataFrame, b: DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def eventsKV: DataFrame =
    Tables.events(spark, sf).select("user_id", "value")

  /** `base` with partition 0's FIRST attempt throwing (attempt 1 runs
    * clean) — the injected "worker crash" of the reference's fault test.
    */
  private def flakyFirstAttempt(base: DataFrame): DataFrame = {
    import spark.implicits._
    base.as[(Long, Double)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt task failure")
      it
    }.toDF("user_id", "value")
  }

  test("first-attempt task failure retries and still matches the clean answer") {
    val got = MapReduceOps.combinerAgg(flakyFirstAttempt(eventsKV), "user_id", "value")
    val want = MapReduceOps.combinerAgg(eventsKV, "user_id", "value")
    sameResult(got, want)
  }

  test("failure in a post-shuffle stage also recovers to the exact answer") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the throw sits AFTER the aggregation shuffle, so the retry replays
    // a reduce-side task against fetched shuffle blocks
    val agg = MapReduceOps.combinerAgg(eventsKV, "user_id", "value")
    val flakyReduce = agg.select("user_id", "total_value").as[(Long, Double)]
      .mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
          throw new RuntimeException("injected reduce-side failure")
        it
      }.toDF("user_id", "total_value")
    val want = agg.select("user_id", "total_value")
    sameResult(flakyReduce, want)
  }

  test("a task failing every attempt aborts the job (maxFailures=2 is live)") {
    import spark.implicits._
    val alwaysDies = eventsKV.as[(Long, Double)].mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0)
        throw new RuntimeException("injected persistent task failure")
      it
    }
    val e = intercept[Exception](alwaysDies.toDF("user_id", "value").count())
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString(" | ")
    assert(chain.contains("injected persistent"),
      s"job should abort with the injected cause, got: $chain")
  }
}
