package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** Job control — the analog of the reference client's cancel_job /
  * monitor_job_progress (cooler-MapReduce src/client/monitoring.py):
  * a query launched inside a named job group can be cancelled
  * mid-flight from another thread and observed via task-level progress
  * while it runs.
  */
class JobControlSpec extends AnyFunSuite {
  import TestSpark._

  test("cancel(name) stops a running query mid-flight; session stays usable") {
    import spark.implicits._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global

    // ~60 s of work if left alone (60k × 1 ms over 4 cores) — the
    // cancel must be what ends it
    val slow = spark.range(0, 60000L, 1, 4).as[Long]
      .map { i => Thread.sleep(1); i }

    // job groups are thread-local: the group is set inside the future's
    // thread, wrapping the action itself
    val running = Future {
      Monitoring.inGroup(spark, "slow_query") { slow.reduce(_ + _) }
    }

    // wait until the group's job is actually on the cluster
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var p = Monitoring.progress(spark, "slow_query")
    while (p.activeJobs == 0 && System.nanoTime() < deadline) {
      Thread.sleep(50)
      p = Monitoring.progress(spark, "slow_query")
    }
    assert(p.activeJobs > 0, "query never started")
    assert(p.tasksTotal > 0, s"progress should see the stage's tasks: $p")
    assert(p.fractionDone < 1.0)
    // the running query is listed (the client's list_jobs analog), and
    // the executor snapshot sees its running tasks
    assert(Monitoring.activeQueries(spark).exists(_.name == "slow_query"))
    assert(Monitoring.executors(spark).nonEmpty)

    val t0 = System.nanoTime()
    Monitoring.cancel(spark, "slow_query")
    val failure = intercept[Exception](Await.result(running, 30.seconds))
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 20.0, s"cancellation took $sec s — not mid-flight")
    val chain = Iterator.iterate[Throwable](failure)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString(" | ").toLowerCase
    assert(chain.contains("cancel"), s"expected a cancellation failure, got: $chain")

    // the session survives a cancelled group: later queries run normally
    assert(spark.range(100).count() == 100L)
    // ...and the cancelled query has left the active list
    assert(!Monitoring.activeQueries(spark).exists(_.name == "slow_query"))
  }

  test("progress of an unknown group is empty, not an error") {
    val p = Monitoring.progress(spark, "never_ran")
    assert(p.activeJobs == 0 && p.tasksTotal == 0 && p.fractionDone == 0.0)
  }

  test("progress is LIVE: a finished run of a reused group reports zeros") {
    Monitoring.inGroup(spark, "reused") { spark.range(1000).count() }
    // the job is done — a poll loop must not read the finished tasks as
    // progress of a future relaunch
    val p = Monitoring.progress(spark, "reused")
    assert(p.activeJobs == 0 && p.tasksTotal == 0, s"stale progress: $p")
  }

  test("nested inGroup restores the enclosing group on exit") {
    val sc = spark.sparkContext
    Monitoring.inGroup(spark, "outer") {
      Monitoring.inGroup(spark, "inner") {
        assert(sc.getLocalProperty("spark.jobGroup.id") == "graft:inner")
      }
      // actions after the inner block must still belong to "outer"
      assert(sc.getLocalProperty("spark.jobGroup.id") == "graft:outer")
    }
    assert(sc.getLocalProperty("spark.jobGroup.id") == null,
      "top-level exit should clear the group")
  }
}
