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
  import TestSpark._

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
}
