package graft.tools

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Straggler mitigation demo — the reference coordinator's backup-task
  * story (cooler-MapReduce WEEK2_SUMMARY.md:11: slow workers get
  * speculative backup copies) on Spark's native speculative execution.
  *
  * Two scheduler facts force a real multi-host topology here:
  * `TaskSchedulerImpl` only starts the speculation thread on a
  * non-local master, and a speculative copy is never placed on a HOST
  * that already runs an attempt of the same task (a backup on the slow
  * machine would be pointless). `local-cluster[…]` puts every executor
  * on `localhost`, so the smallest deployment where a backup is legal
  * is a standalone master plus two workers on DISTINCT host names —
  * spawned here as child JVMs bound to the loopback aliases 127.0.0.2
  * and 127.0.0.3 (one simulated machine each, 1 core).
  *
  * One partition's first attempt sleeps (a slow worker, not a
  * failure); its 7 siblings drain on the other host; the scheduler
  * marks the sleeper speculatable (runtime > 2× the median), launches
  * a backup copy on the other host, takes the copy's result, and kills
  * the sleeper. Prints one line:
  *
  *   SPECULATION speculative=<n> sum_ok=<bool> seconds=<t>
  *
  * exit 0 iff a backup launched AND the answer is exact — mitigation
  * changes the schedule, never the result. SpeculationSpec runs this
  * as a child JVM and asserts on that line.
  */
object SpeculationDemo {
  private val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def spawn(host: String, cls: String, extra: Seq[String]): Process = {
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++
      AddOpens.map(p => s"--add-opens=$p=ALL-UNNAMED") ++
      Seq("-Xmx512m", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"), cls) ++ extra
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_LOCAL_HOSTNAME", host)
    pb.redirectErrorStream(true)
    pb.redirectOutput(java.io.File.createTempFile(
      s"speculation-${cls.split('.').last}-$host", ".log"))
    pb.start()
  }

  def main(args: Array[String]): Unit = {
    val port = freePort()
    val masterUrl = s"spark://127.0.0.1:$port"
    val master = spawn("127.0.0.1", "org.apache.spark.deploy.master.Master",
      Seq("--host", "127.0.0.1", "--port", port.toString, "--webui-port", "0"))
    Thread.sleep(3000) // master RPC up before workers dial in
    val workers = Seq("127.0.0.2", "127.0.0.3").map { h =>
      spawn(h, "org.apache.spark.deploy.worker.Worker",
        Seq("--host", h, "--port", "0", "--webui-port", "0",
          "--cores", "1", "--memory", "1g",
          "--work-dir", s"/tmp/graft-speculation-work-$h", masterUrl))
    }
    try {
      val addOpens = AddOpens.map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
      val spark = SparkSession.builder()
        .master(masterUrl)
        .appName("speculation-demo")
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "2")
        .config("spark.speculation.quantile", "0.5")
        .config("spark.executor.memory", "512m")
        // executor JVMs are launched by the workers: give them this
        // JVM's classpath (spark jars + graft classes) and JDK17 opens
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._

      val speculative = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskStart(ts: SparkListenerTaskStart): Unit =
          if (ts.taskInfo.speculative) speculative.incrementAndGet()
      })

      val n = 8000L
      val t0 = System.nanoTime()
      val sum = spark.range(n).repartition(8).as[Long].mapPartitions { it =>
        val tc = TaskContext.get()
        if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0)
          try Thread.sleep(120000)
          catch { case _: InterruptedException => () } // killed: backup won
        it
      }.toDF("v").agg(org.apache.spark.sql.functions.sum("v")).as[Long].head()
      val sec = (System.nanoTime() - t0) / 1e9

      val sumOk = sum == n * (n - 1) / 2
      val nSpec = speculative.get()
      println(f"SPECULATION speculative=$nSpec sum_ok=$sumOk seconds=$sec%.1f")
      spark.stop()
      sys.exit(if (nSpec > 0 && sumOk) 0 else 1)
    } finally {
      workers.foreach(_.destroy())
      master.destroy()
      workers.foreach(_.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
      master.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
      (workers :+ master).foreach(_.destroyForcibly())
    }
  }
}
