package graft

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent multi-job semantics (the reference coordinator queues and
  * runs jobs concurrently — `/root/reference/design.md` test strategy):
  * a mixed batch of queries running on a shared session from a thread
  * pool must each produce exactly the rows they produce when run alone.
  */
class ConcurrencySpec extends AnyFunSuite {
  import TestSpark._

  test("concurrent queries on one session are isolated from each other") {
    val names = Seq("q1_pricing_summary", "mr_wordcount", "dedup_exact",
      "q_window_rank", "q_topk_per_key", "lang_id", "q5_region_revenue",
      "knn_bruteforce")
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    }.toMap
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      // two interleaved rounds of everything, all in flight at once
      val futures = (names ++ names).map { n =>
        scala.concurrent.Future {
          n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      for ((n, rows) <- results)
        assert(rows == sequential(n), s"$n diverged under concurrency")
    } finally pool.shutdown()
  }

  test("warc fixture queries are stable under concurrent rebuild " +
      "(atomic-publish latch — Bench's pool runs both at once)") {
    // both query lambdas rebuild the SAME corpus.warc before reading;
    // pre-fix, a reader could catch the file mid-truncation. Hammer the
    // pair in parallel and require every run to see all 240 records.
    val names = Seq("warc_ingest", "warc_gz_ingest", "warc_revisit", "warc_http")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futures = (1 to 3).flatMap(_ => names).map { n =>
        scala.concurrent.Future {
          n -> SparkEntry.queries(n)(spark, sf).count()
        }
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futures),
        scala.concurrent.duration.Duration(300, "s"))
      val want = Map("warc_ingest" -> 240L, "warc_gz_ingest" -> 240L,
        "warc_revisit" -> 83L, "warc_http" -> 240L)
      for ((n, c) <- results)
        assert(c == want(n), s"$n saw a torn fixture: $c rows")
    } finally pool.shutdown()
  }
}
