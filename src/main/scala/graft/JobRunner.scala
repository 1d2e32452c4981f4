package graft

import java.io.{ByteArrayOutputStream, File}
import java.net.URLClassLoader
import java.nio.file.{Files, Path, Paths}
import java.util.jar.{JarEntry, JarOutputStream}
import javax.tools.ToolProvider

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A user-supplied job: the runtime-pluggable unit of work. The
  * reference accepts an arbitrary `map_fn`/`reduce_fn` Python file at
  * submit time (cooler-MapReduce src/client/client.py:27-63,
  * src/worker/task_executor.py:103-260); the Spark-native equivalent of
  * "ship me code, I'll run it on the cluster" is a jar exposing a class
  * with a well-known entry point that receives the live SparkSession
  * and returns a DataFrame plan. `java.util.Map` keeps the contract
  * implementable from plain Java with no Scala stdlib on the job
  * author's side.
  */
trait GraftJob {
  def run(spark: SparkSession, args: java.util.Map[String, String]): DataFrame
}

/** Runtime job submission — closes the reference's "submit a user code
  * file with the job" surface ([[GraftJob]] doc) without giving up the
  * declarative engine: the submitted class BUILDS a plan against the
  * session (so Catalyst still optimizes it end to end), it does not
  * hand-schedule tasks.
  *
  * Scale shape: the session artifact mechanism ships the jar once per
  * executor via the file server (the same mechanism spark-submit
  * --jars uses on a 1000-executor cluster), so closures/lambdas inside
  * the job class deserialize executor-side. Class-name isolation is
  * DRIVER-side only: each submit loads its entry class from a fresh
  * child classloader, so two submitted jobs may reuse a class name as
  * long as nothing of that name executes on the cluster — but every
  * shipped jar joins the session's single artifact classloader, so
  * executor-side classes (UDFs, closures, helpers serialized into
  * tasks) from different jobs share one namespace and MUST use
  * distinct fully-qualified names. That is the caller's
  * responsibility, same as with spark-submit --jars.
  *
  * Session hygiene: artifacts are SESSION-keyed, sticky for the
  * session's lifetime, and copied into every session clone (each
  * streaming query clones its session). A long-lived interactive
  * session that interleaves submits with unrelated work therefore
  * carries the jars everywhere; the recommended pattern is to submit
  * through a dedicated `spark.newSession()` (shares the SparkContext
  * and catalog, isolates artifact state) unless the job must see the
  * caller's temp views. The test suite pins this pattern
  * (JobRunnerSpec) including a post-submit streaming regression.
  */
object JobRunner {

  /** Load `className` from `jarPath`, ship the jar to executors, run
    * the job. The classloader is parent-FIRST (graft/Spark classes
    * resolve from the application, only job classes come from the jar)
    * and never installed as the thread context loader — Spark session
    * state is untouched.
    */
  def submit(spark: SparkSession, jarPath: String, className: String,
             args: Map[String, String] = Map.empty): DataFrame = {
    val jar = new File(jarPath)
    require(jar.isFile, s"JobRunner: no such jar: $jarPath")
    // SparkSession.addArtifact, not sc.addJar: Spark 4 SQL tasks
    // resolve classes through the SESSION's artifact state, so a jar
    // added only at the context level is invisible to executor-side
    // deserialization of a SQL plan that references its classes
    // (symptom: SerializedLambda ClassCastException mid-task).
    //
    // Ship BYTES Spark owns — the in-memory addArtifact(bytes, target)
    // overload writes them into the session artifact manager's own
    // directory and serves them from there. The earlier form (stage a
    // copy in an unmanaged temp dir, addArtifact(path)) left the served
    // stream tied to lifecycle Spark doesn't control: once an artifact
    // becomes unservable, EVERY later task in the session that syncs
    // artifacts dies ("Stream /artifacts/<uuid>/jars/... was not
    // found") — a poison-the-session failure observed as a 1/561 suite
    // flake in round 11. In-memory shipping also leaves no temp file to
    // leak.
    //
    // Artifacts are keyed by FILE NAME session-wide and can never be
    // overwritten, so ship under a content-hash name: distinct jars
    // that happen to share a file name can't collide, and resubmitting
    // the same bytes is a clean no-op (the already-exists error is
    // only ever thrown for content we know is identical).
    val bytes = Files.readAllBytes(jar.toPath)
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
    // idempotent resubmit: match the TYPED error condition (Spark's
    // stable error-class name, SparkThrowable.getCondition), not the
    // rendered message — message text is not a cross-version contract
    try spark.addArtifact(bytes, s"graft-job-$md5.jar")
    catch {
      case e: org.apache.spark.SparkThrowable
        if e.getCondition == "ARTIFACT_ALREADY_EXISTS" =>
        () // same content already registered in this session
    }
    val loader = new URLClassLoader(Array(jar.toURI.toURL), getClass.getClassLoader)
    try {
      val cls = Class.forName(className, true, loader)
      require(classOf[GraftJob].isAssignableFrom(cls),
        s"JobRunner: $className does not implement graft.GraftJob")
      val job = cls.getDeclaredConstructor().newInstance().asInstanceOf[GraftJob]
      val jargs = new java.util.HashMap[String, String]()
      args.foreach { case (k, v) => jargs.put(k, v) }
      // run() must finish all driver-side loading from the jar (it
      // builds the plan; classes it touched stay loaded after close).
      // Executor-side resolution goes through the session artifact.
      job.run(spark, jargs)
    } finally loader.close()
  }

  /** Compile a single Java source implementing [[GraftJob]] and pack it
    * into a jar — the "job file in, runnable job out" path for users
    * who want the reference's submit-a-source-file ergonomics. Uses the
    * JDK's in-process compiler; the compile classpath is the current
    * JVM's classpath plus every jar visible to this classloader chain
    * (covers both forked and in-process sbt layouts).
    */
  def compileJavaJob(source: String, className: String, workDir: Path): Path = {
    val compiler = ToolProvider.getSystemJavaCompiler
    require(compiler != null, "JobRunner: JDK compiler unavailable (JRE-only JVM?)")
    Files.createDirectories(workDir)
    val srcFile = workDir.resolve(className + ".java")
    Files.write(srcFile, source.getBytes("UTF-8"))
    val cp = classpathEntries().mkString(File.pathSeparator)
    val err = new ByteArrayOutputStream()
    val rc = compiler.run(null, null, err,
      "-cp", cp, "-d", workDir.toString, srcFile.toString)
    require(rc == 0, s"JobRunner: javac failed:\n${err.toString("UTF-8")}")
    val jarPath = workDir.resolve(className + ".jar")
    val jos = new JarOutputStream(Files.newOutputStream(jarPath))
    val listing = Files.list(workDir)
    try {
      // pack every class compiled from this source (inner classes too)
      val classes = listing.iterator()
      while (classes.hasNext) {
        val p = classes.next()
        val n = p.getFileName.toString
        if (n.endsWith(".class") &&
            (n == className + ".class" || n.startsWith(className + "$"))) {
          jos.putNextEntry(new JarEntry(n))
          jos.write(Files.readAllBytes(p))
          jos.closeEntry()
        }
      }
    } finally {
      listing.close()
      jos.close()
    }
    jarPath
  }

  private def classpathEntries(): Seq[String] = {
    val fromProp = sys.props.getOrElse("java.class.path", "")
      .split(File.pathSeparatorChar).filter(_.nonEmpty).toSeq
    val fromLoaders = Iterator.iterate(getClass.getClassLoader)(_.getParent)
      .takeWhile(_ != null).flatMap {
        case u: URLClassLoader => u.getURLs.toSeq.flatMap { url =>
          if (url.getProtocol == "file") Some(Paths.get(url.toURI).toString) else None
        }
        case _ => Nil
      }.toSeq
    (fromProp ++ fromLoaders).distinct
  }
}
