package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime job submission (the reference's submit-a-user-code-file
  * surface): compile a Java source implementing GraftJob at TEST time —
  * so the class is provably absent from the application classpath —
  * jar it, submit it, and check the result against the same plan built
  * directly.
  */
class JobRunnerSpec extends AnyFunSuite {
  import TestSpark.sf

  // ISOLATED session (own artifact state, shared SparkContext): session
  // artifacts are sticky for the session's lifetime and a single
  // unservable artifact poisons every later artifact-syncing task in
  // that session — submit specs must never add artifacts to the shared
  // TestSpark session or an artifact-lifecycle hiccup here fails
  // unrelated suites (round-11 1/561 flake: a StreamingSpec micro-batch
  // died fetching a graft-job jar).
  private lazy val spark = TestSpark.spark.newSession()

  private val demoSource =
    """import org.apache.spark.sql.Dataset;
      |import org.apache.spark.sql.Row;
      |import org.apache.spark.sql.SparkSession;
      |import java.util.Map;
      |
      |public class GraftDemoCountJob implements graft.GraftJob {
      |  public Dataset<Row> run(SparkSession spark, Map<String, String> args) {
      |    return spark.read().parquet(args.get("dir") + "/lineitem.parquet")
      |        .filter("l_quantity >= " + args.getOrDefault("minQty", "0"))
      |        .groupBy("l_returnflag").count();
      |  }
      |}
      |""".stripMargin

  test("compile + submit a runtime job jar; result matches the direct plan") {
    val work = Files.createTempDirectory("graft-job")
    val jar = JobRunner.compileJavaJob(demoSource, "GraftDemoCountJob", work)
    // the job class must NOT be loadable from the app classpath —
    // otherwise this test would not prove runtime pluggability
    assertThrows[ClassNotFoundException] {
      Class.forName("GraftDemoCountJob")
    }
    val got = JobRunner.submit(spark, jar.toString, "GraftDemoCountJob",
      Map("dir" -> sf, "minQty" -> "10"))
    val want = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") >= 10)
      .groupBy("l_returnflag").count()
    assert(got.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq ===
      want.collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("submit rejects a class that does not implement GraftJob") {
    val work = Files.createTempDirectory("graft-job-bad")
    val src =
      """public class GraftNotAJob { public GraftNotAJob() {} }
        |""".stripMargin
    val jar = JobRunner.compileJavaJob(src, "GraftNotAJob", work)
    val e = intercept[IllegalArgumentException] {
      JobRunner.submit(spark, jar.toString, "GraftNotAJob")
    }
    assert(e.getMessage.contains("does not implement"))
  }

  test("submit rejects a missing jar path") {
    val e = intercept[IllegalArgumentException] {
      JobRunner.submit(spark, "/nonexistent/job.jar", "X")
    }
    assert(e.getMessage.contains("no such jar"))
  }

  test("two submitted jobs with the SAME class name stay isolated") {
    val v1 = Files.createTempDirectory("graft-job-v1")
    val v2 = Files.createTempDirectory("graft-job-v2")
    val mk = (tag: String) =>
      s"""import org.apache.spark.sql.Dataset;
         |import org.apache.spark.sql.Row;
         |import org.apache.spark.sql.SparkSession;
         |import java.util.Map;
         |public class GraftTagJob implements graft.GraftJob {
         |  public Dataset<Row> run(SparkSession spark, Map<String, String> args) {
         |    return spark.sql("SELECT '$tag' AS tag");
         |  }
         |}
         |""".stripMargin
    val j1 = JobRunner.compileJavaJob(mk("alpha"), "GraftTagJob", v1)
    val j2 = JobRunner.compileJavaJob(mk("beta"), "GraftTagJob", v2)
    assert(JobRunner.submit(spark, j1.toString, "GraftTagJob").head().getString(0) == "alpha")
    assert(JobRunner.submit(spark, j2.toString, "GraftTagJob").head().getString(0) == "beta")
  }

  test("streaming micro-batches keep working after a submit in the same session") {
    // Regression for the round-11 race: once a session has artifacts,
    // every streaming micro-batch task syncs them — and streaming
    // clones the session per query, so dead clones' GC-driven artifact
    // cleanup must not deregister the live session's streams. Submit a
    // job, then run several streaming-query generations with forced GC
    // between them (the cleanup is a java.lang.ref.Cleaner) and assert
    // the artifact-syncing tasks never die.
    val session = spark.newSession()
    val work = Files.createTempDirectory("graft-job-stream")
    val jar = JobRunner.compileJavaJob(demoSource, "GraftDemoCountJob", work)
    assert(JobRunner.submit(session, jar.toString, "GraftDemoCountJob",
      Map("dir" -> sf)).count() > 0)
    for (gen <- 0 until 3) {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = session.sqlContext
      import session.implicits._
      val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
      val q = ms.toDF().toDF("v")
        .selectExpr("v % 7 AS k", "v")
        .groupBy("k").count()
        .writeStream.format("memory").queryName(s"jobrunner_stream_$gen")
        .outputMode("complete").start()
      try {
        ms.addData(0L until 100L: _*)
        q.processAllAvailable()
        assert(session.table(s"jobrunner_stream_$gen").count() == 7)
      } finally q.stop()
      // make the query's cloned session collectable; push the Cleaner
      System.gc(); Thread.sleep(50); System.gc()
    }
  }
}
