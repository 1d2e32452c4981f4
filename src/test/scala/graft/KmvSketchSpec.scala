package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PortableHash, Sketches}

/** The portable KMinByHash sketch aggregate (graft.plans.KMinByHash):
  * exactness below k, estimator error above, partition-layout
  * invariance (partial/merge correctness), hash-tie determinism, and
  * the SQL front door.
  */
class KmvSketchSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def registered() = graft.plans.GraftFunctions.register(spark)

  test("kmv estimate is exact below k distinct values") {
    registered()
    val df = (1 to 40).flatMap(i => Seq(i, i)).toDF("v") // 40 distinct, dup'd
    val h = PortableHash.portableHash(col("v"))
    val out = df.agg(Sketches.kmvEstimate(Sketches.kminBy(h, h, 64), 64))
      .collect()(0).getLong(0)
    assert(out == 40)
  }

  test("all-NULL group yields an empty sketch; NULL quantiles; droppable for oracle parity") {
    registered()
    // group "b" has only NULL values — its sketch must be empty (not a
    // crash), sampleMedian/sampleQuantile on it must be NULL, and the
    // size-filter the oracle-checked queries apply must drop the group
    val df = Seq(("a", Option(1.0), 1L), ("a", Option(3.0), 2L),
      ("b", Option.empty[Double], 3L)).toDF("g", "v", "id")
    val eh = PortableHash.portableHash(col("id"))
    val agg = df.groupBy(col("g")).agg(Sketches.kminBy(eh, col("v"), 8).as("s"))
    val rows = agg.select(col("g"), size(col("s")).as("n"),
        Sketches.sampleMedian(col("s")).as("med"),
        Sketches.sampleQuantile(col("s"), 0.25).as("q"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("b").getInt(1) == 0 && rows("b").isNullAt(2) && rows("b").isNullAt(3))
    assert(rows("a").getInt(1) == 2 && rows("a").getDouble(2) == 2.0)
    assert(agg.filter(size(col("s")) > 0).count() == 1)
  }

  test("kmv estimate within 40% of 10k distincts at k=64") {
    registered()
    val df = (1 to 10000).toDF("v")
    val h = PortableHash.portableHash(col("v"))
    val est = df.agg(Sketches.kmvEstimate(Sketches.kminBy(h, h, 64), 64))
      .collect()(0).getLong(0).toDouble
    assert(math.abs(est - 10000) / 10000 <= 0.4, s"est=$est")
  }

  test("sketch result is invariant to partition layout (merge correctness)") {
    registered()
    val base = (1 to 5000).map(i => (i, i * 0.5)).toDF("id", "v")
    val h = PortableHash.portableHash(col("id"))
    def run(parts: Int) =
      base.repartition(parts)
        .agg(Sketches.kminBy(h, col("v"), 32).as("s"))
        .collect()(0).getSeq[Double](0)
    assert(run(1) == run(13))
  }

  test("duplicate hashes keep the minimum payload (deterministic ties)") {
    registered()
    // same id twice with different payloads -> same hash, min payload kept
    val df = Seq((7, 99.0), (7, 1.0), (8, 5.0)).toDF("id", "v")
    val h = PortableHash.portableHash(col("id"))
    val s = df.agg(Sketches.kminBy(h, col("v"), 8).as("s"))
      .collect()(0).getSeq[Double](0)
    assert(s.sorted == Seq(1.0, 5.0))
  }

  test("sample median lands within the value range and matches exact on odd tiny sets") {
    registered()
    val df = Seq((1, 10.0), (2, 30.0), (3, 20.0)).toDF("id", "v")
    val h = PortableHash.portableHash(col("id"))
    val med = df.agg(Sketches.sampleMedian(Sketches.kminBy(h, col("v"), 8)).as("m"))
      .collect()(0).getDouble(0)
    assert(med == 20.0) // 3 values < k -> the true median
  }

  test("sample quantiles are ordered and q=0.5 equals the median formula") {
    registered()
    val df = (1 to 300).map(i => (i, i.toDouble)).toDF("id", "v")
    val h = PortableHash.portableHash(col("id"))
    val r = df.agg(
        Sketches.kminBy(h, col("v"), 64).as("s"))
      .select(
        Sketches.sampleQuantile(col("s"), 0.25).as("p25"),
        Sketches.sampleQuantile(col("s"), 0.5).as("p50"),
        Sketches.sampleQuantile(col("s"), 0.75).as("p75"),
        Sketches.sampleMedian(col("s")).as("med"))
      .collect()(0)
    assert(r.getDouble(0) <= r.getDouble(1) && r.getDouble(1) <= r.getDouble(2))
    assert(r.getDouble(1) == r.getDouble(3)) // q=0.5 == median formula
    assert(r.getDouble(0) >= 1.0 && r.getDouble(2) <= 300.0)
  }

  test("SQL front door: graft_kmin_by callable from spark.sql") {
    registered()
    Seq(1, 2, 3).toDF("v").createOrReplaceTempView("kmv_probe")
    val n = spark.sql(
      """SELECT size(graft_kmin_by(
        |  cast(conv(substring(md5(cast(v as string)), 1, 15), 16, 10) as bigint),
        |  cast(v as bigint), 2)) AS s
        |FROM kmv_probe""".stripMargin).collect()(0).getInt(0)
    assert(n == 2)
  }

  test("non-foldable or wrong-typed k is an analysis error naming the function") {
    registered()
    Seq(1).toDF("v").createOrReplaceTempView("kmv_probe2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_kmin_by(cast(v as bigint), cast(v as bigint), v) FROM kmv_probe2")
        .collect()
    }
    assert(e.getMessage.contains("graft_kmin_by"))
  }
}
