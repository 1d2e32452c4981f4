package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables
import graft.plans.GraftFunctions

/** The engine's SQL front door: registered views + registered native
  * functions make every capability reachable from `spark.sql`.
  */
class SqlFrontDoorSpec extends AnyFunSuite {
  import TestSpark._

  test("star-schema views queryable via spark.sql") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_returnflag""".stripMargin).collect()
    assert(r.length == 3 && r.map(_.getLong(1)).sum > 0)
  }

  test("native graft_cosine callable from SQL") {
    Tables.registerAll(spark, sf)
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, a.embedding) AS self_sim
        |FROM embeddings a LIMIT 5""".stripMargin).collect()
    assert(r.forall(row => math.abs(row.getDouble(1) - 1.0) < 1e-9))
  }

  test("native graft_tokens / graft_shingles callable from SQL") {
    Tables.registerAll(spark, sf)
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT doc_id,
        |  size(graft_tokens(text)) AS n_tokens,
        |  size(graft_shingles(graft_tokens(text), 3)) AS n_shingles
        |FROM documents WHERE doc_id < 5""".stripMargin).collect()
    assert(r.nonEmpty)
    assert(r.forall(row => row.getInt(2) == math.max(row.getInt(1) - 2, 0)))
  }

  test("native graft_cdc_chunks callable from SQL; token counts reconcile") {
    Tables.registerAll(spark, sf)
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT doc_id,
        |  size(graft_tokens(text)) AS n_tokens,
        |  aggregate(graft_cdc_chunks(graft_tokens(text), 16),
        |    0, (acc, c) -> acc + c.n) AS chunk_tokens
        |FROM documents WHERE doc_id < 20""".stripMargin).collect()
    assert(r.nonEmpty)
    // every token lands in exactly one chunk
    assert(r.forall(row => row.getInt(1) == row.getInt(2)))
  }

  test("graft_shingles rejects bad width arguments with an analysis error naming the function") {
    Tables.registerAll(spark, sf)
    GraftFunctions.register(spark)
    // BIGINT literal in Int range: accepted (no ClassCastException)
    assert(spark.sql(
      "SELECT size(graft_shingles(graft_tokens('a b c d'), cast(2 as bigint))) AS n")
      .collect().head.getInt(0) == 3)
    for (bad <- Seq("NULL", "'two'", "doc_id", "9999999999")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT graft_shingles(graft_tokens(text), $bad) FROM documents")
          .collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("graft_shingles")),
        s"error for arg $bad does not name the function: $e")
    }
  }

  test("IVF ANN recall vs brute force is measured and positive") {
    val brute = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("knn_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    val recall = (brute & ivf).size.toDouble / brute.size
    info(f"IVF recall@5 = $recall%.2f")
    assert(recall > 0.0)
    // every IVF hit's score matches the exact cosine (same expression)
  }
}
