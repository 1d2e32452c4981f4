package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Spark-native job monitoring — the analog of the reference client's
  * job status/metrics polling (cooler-MapReduce `src/client/monitoring.py`,
  * `src/client/client.py` job list/status/results): queries are tagged
  * with `observe()` (a pass-through CollectMetrics node) and a
  * [[QueryExecutionListener]] records wall time, output rows and
  * scanned bytes per named query. Bench/Verify dump the snapshot as
  * JSON next to their results.
  *
  * On a real cluster the same listener runs on the driver and sees
  * every action; nothing here is local-mode specific.
  */
object Monitoring {
  final case class QueryMetrics(name: String, seconds: Double, rows: Long,
                                scanBytes: Long, status: String)

  private val Prefix = "graft:"

  /** Tag a query with a named observation; the result is unchanged. */
  def tag(df: DataFrame, name: String): DataFrame =
    df.observe(Prefix + name, count(lit(1)).as("rows"))

  final class Listener extends QueryExecutionListener {
    private val recs = new ConcurrentHashMap[String, QueryMetrics]()

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(qe, durationNs, "ok")
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      record(qe, 0L, "failed")

    private def record(qe: QueryExecution, durationNs: Long, status: String): Unit =
      qe.observedMetrics.foreach { case (obsName, row) =>
        if (obsName.startsWith(Prefix)) {
          val name = obsName.stripPrefix(Prefix)
          val rows = if (row.isNullAt(0)) 0L else row.getLong(0)
          recs.put(name,
            QueryMetrics(name, durationNs / 1e9, rows, scanBytes(qe.executedPlan), status))
        }
      }

    def snapshot: Seq[QueryMetrics] = {
      import scala.jdk.CollectionConverters._
      recs.values.asScala.toSeq.sortBy(_.name)
    }

    def json: String = snapshot.map { m =>
      s"""{"name":"${m.name}","sec":${"%.3f".format(m.seconds)},"rows":${m.rows},""" +
        s""""scan_bytes":${m.scanBytes},"status":"${m.status}"}"""
    }.mkString("[", ",", "]")
  }

  /** Register a fresh metrics listener on the session. */
  def install(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  /** Engine-span accumulator: sums the engine duration of EVERY action
    * on the session, tagged or not. Iterative operators (connected
    * components, Lloyd training) spend most of their engine time in
    * per-round collect() actions that carry no observation tag, so the
    * per-query [[Listener]] under-attributes them; Bench's isolated
    * pass runs one query at a time and brackets it with reset()/
    * totalSec to get the query's FULL engine cost.
    */
  final class EngineSpans extends QueryExecutionListener {
    private val ns = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      ns.addAndGet(durationNs)
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    def reset(): Unit = ns.set(0L)
    def totalSec: Double = ns.get() / 1e9
  }

  /** Register an engine-span accumulator on the session. */
  def installSpans(spark: SparkSession): EngineSpans = {
    val l = new EngineSpans
    spark.listenerManager.register(l)
    l
  }

  /** Per-QUERY engine spans for a CONCURRENT (pooled) run, where the
    * single [[EngineSpans]] accumulator can't attribute work: each
    * query runs inside its own [[inGroup]] job group, and this
    * scheduler listener sums job start→end spans per group name. The
    * group id is a thread-local property Spark propagates into AQE
    * stages and broadcast-exchange threads, so untagged per-round
    * actions of iterative queries (connected components, Lloyd
    * training) attribute to their query too — the attribution gap the
    * tagged [[Listener]] has by design. Within one query AQE may run
    * independent stages as concurrent jobs, so a query's sum can
    * exceed its wall span; it is a work measure, not a latency.
    */
  final class GroupSpans extends org.apache.spark.scheduler.SparkListener {
    private val starts = new ConcurrentHashMap[Int, (String, Long)]()
    private val totalMs = new ConcurrentHashMap[String, java.lang.Long]()
    override def onJobStart(
        js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val g = Option(js.properties)
        .map(_.getProperty("spark.jobGroup.id")).orNull
      if (g != null && g.startsWith(Prefix))
        starts.put(js.jobId, (g.stripPrefix(Prefix), js.time))
    }
    override def onJobEnd(
        je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val s = starts.remove(je.jobId)
      if (s != null) totalMs.merge(s._1, je.time - s._2, (a, b) => a + b)
    }
    def snapshotSec: Map[String, Double] = {
      import scala.jdk.CollectionConverters._
      totalMs.asScala.map { case (k, v) => k -> v.toDouble / 1e3 }.toMap
    }
  }

  /** Register a per-group span listener on the context. */
  def installGroupSpans(spark: SparkSession): GroupSpans = {
    val l = new GroupSpans
    spark.sparkContext.addSparkListener(l)
    l
  }

  // ---- Job control: cancellation + live progress ---------------------------
  //
  // The analog of the reference client's cancel_job / monitor_job_progress
  // (cooler-MapReduce src/client/monitoring.py): actions run inside a named
  // job group, so a driver-side controller can cancel the whole query
  // mid-flight or poll task-level progress while it runs. Both surfaces are
  // SparkContext-native (cancelJobGroup / statusTracker), so they work
  // identically on a real cluster.

  /** Live task-level progress of one named job group. */
  final case class GroupProgress(name: String, activeJobs: Int,
                                 tasksTotal: Int, tasksCompleted: Int,
                                 tasksActive: Int, tasksFailed: Int) {
    def fractionDone: Double =
      if (tasksTotal == 0) 0.0 else tasksCompleted.toDouble / tasksTotal
  }

  /** Run `body`'s Spark actions inside job group `name` (cancellable via
    * [[cancel]], observable via [[progress]]). Interrupt-on-cancel is set
    * so running tasks stop promptly instead of draining. Saves and
    * restores the thread's previous group properties on exit, so nested
    * `inGroup` blocks hand control back to the enclosing group (and
    * groups are thread-local, so concurrent query threads don't clobber
    * each other).
    */
  // group names currently inside an inGroup block (entry-counted so the
  // same name entered from two threads stays listed until both exit)
  private val entered = new ConcurrentHashMap[String, Integer]()

  def inGroup[T](spark: SparkSession, name: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prevId = sc.getLocalProperty("spark.jobGroup.id")
    val prevDesc = sc.getLocalProperty("spark.job.description")
    val prevInterrupt = sc.getLocalProperty("spark.job.interruptOnCancel")
    sc.setJobGroup(Prefix + name, s"graft query: $name", interruptOnCancel = true)
    entered.merge(name, 1, (a, b) => a + b)
    try body finally {
      entered.compute(name, (_, v) => if (v == null || v <= 1) null else v - 1)
      // setLocalProperty(key, null) clears the key, so a top-level
      // inGroup restores to "no group" and a nested one to its parent
      sc.setLocalProperty("spark.jobGroup.id", prevId)
      sc.setLocalProperty("spark.job.description", prevDesc)
      sc.setLocalProperty("spark.job.interruptOnCancel", prevInterrupt)
    }
  }

  /** Every named query currently inside an [[inGroup]] block, with its
    * live progress — the reference client's `list_jobs` analog.
    */
  def activeQueries(spark: SparkSession): Seq[GroupProgress] = {
    import scala.jdk.CollectionConverters._
    entered.keySet.asScala.toSeq.sorted.map(progress(spark, _))
  }

  /** Per-executor resource snapshot from the status tracker — the
    * reference client's `show_resource_usage` analog (host, running
    * tasks, storage-memory use). In local mode the one row is the
    * driver; on a cluster the same call lists every executor.
    */
  final case class ExecutorSnapshot(host: String, numRunningTasks: Int,
                                    cacheSize: Long, usedOnHeapStorage: Long)
  def executors(spark: SparkSession): Seq[ExecutorSnapshot] =
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq.map { e =>
      ExecutorSnapshot(e.host(), e.numRunningTasks(), e.cacheSize(),
        e.usedOnHeapStorageMemory())
    }

  /** Cancel every active job in group `name` (no-op if none). */
  def cancel(spark: SparkSession, name: String): Unit =
    spark.sparkContext.cancelJobGroup(Prefix + name)

  /** Snapshot of `name`'s LIVE progress from the status tracker: task
    * counts summed over the stages of the group's currently-RUNNING
    * jobs only. Finished runs of a reused group name don't leak in —
    * a group with nothing running reports all zeros, so a poll loop
    * on `fractionDone` can't mistake a freshly relaunched query for a
    * completed one.
    */
  def progress(spark: SparkSession, name: String): GroupProgress = {
    val tracker = spark.sparkContext.statusTracker
    val running = tracker.getJobIdsForGroup(Prefix + name)
      .flatMap(id => tracker.getJobInfo(id).toSeq)
      .filter(_.status() == org.apache.spark.JobExecutionStatus.RUNNING)
    val stages = running.flatMap(_.stageIds()).distinct
      .flatMap(sid => tracker.getStageInfo(sid).toSeq)
    GroupProgress(name,
      activeJobs = running.length,
      tasksTotal = stages.map(_.numTasks()).sum,
      tasksCompleted = stages.map(_.numCompletedTasks()).sum,
      tasksActive = stages.map(_.numActiveTasks()).sum,
      tasksFailed = stages.map(_.numFailedTasks()).sum)
  }

  /** Sum of `filesSize` metrics over every scan in the (adaptive) plan. */
  private def scanBytes(p: SparkPlan): Long =
    allNodes(p).flatMap(_.metrics.get("filesSize").map(_.value)).sum

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
    case q: QueryStageExec        => q +: allNodes(q.plan)
    case other => other +: (other.children ++ other.subqueries).flatMap(allNodes)
  }
}
