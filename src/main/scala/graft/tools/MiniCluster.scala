package graft.tools

/** Two-host standalone-cluster harness for fault-injection demos — a
  * real Spark master plus two single-core workers spawned as child JVMs
  * on DISTINCT loopback host names (127.0.0.2 / 127.0.0.3, one
  * simulated machine each). `local-cluster[…]` puts every executor on
  * `localhost`, which defeats both speculation placement (a backup is
  * never placed on the host running the original attempt) and any
  * block-loss scenario where "the other machine" must survive — so the
  * smallest honest topology is this one. Shared by
  * [[SpeculationDemo]] (straggler → backup task) and
  * [[ReliableMaterializeDemo]] (executor loss vs materialized blocks).
  */
object MiniCluster {
  val AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")

  def addOpensFlags: Seq[String] = AddOpens.map(p => s"--add-opens=$p=ALL-UNNAMED")

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def spawn(host: String, cls: String, extra: Seq[String]): Process = {
    val cmd = Seq(sys.props("java.home") + "/bin/java") ++ addOpensFlags ++
      Seq("-Xmx512m", "-Dspark.ui.enabled=false",
        "-cp", sys.props("java.class.path"), cls) ++ extra
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_LOCAL_HOSTNAME", host)
    pb.redirectErrorStream(true)
    pb.redirectOutput(java.io.File.createTempFile(
      s"minicluster-${cls.split('.').last}-$host", ".log"))
    pb.start()
  }

  /** Start master + two workers, run `body` against the master URL,
    * always tear the child JVMs down. `workerMemory` must cover the
    * executor memory the body's session requests. The fault demos keep
    * the default single-core workers (one task slot per "machine");
    * the soak measurements widen `workerCores` so the cluster has
    * enough parallelism for the timing to mean anything.
    */
  def withCluster[A](tag: String, workerMemory: String = "1g",
                     workerCores: Int = 1)
                    (body: String => A): A = {
    val port = freePort()
    val masterUrl = s"spark://127.0.0.1:$port"
    val master = spawn("127.0.0.1", "org.apache.spark.deploy.master.Master",
      Seq("--host", "127.0.0.1", "--port", port.toString, "--webui-port", "0"))
    Thread.sleep(3000) // master RPC up before workers dial in
    val workers = Seq("127.0.0.2", "127.0.0.3").map { h =>
      spawn(h, "org.apache.spark.deploy.worker.Worker",
        Seq("--host", h, "--port", "0", "--webui-port", "0",
          "--cores", workerCores.toString, "--memory", workerMemory,
          "--work-dir", s"/tmp/graft-$tag-work-$h", masterUrl))
    }
    try body(masterUrl)
    finally {
      workers.foreach(_.destroy())
      master.destroy()
      workers.foreach(_.waitFor(5, java.util.concurrent.TimeUnit.SECONDS))
      master.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
      (workers :+ master).foreach(_.destroyForcibly())
    }
  }
}
