package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Layouts, Tables}

class LayoutsSpec extends AnyFunSuite {
  import TestSpark._

  test("partitioned write + filter prunes partitions in the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString + "/events"
    val ev = Tables.events(spark, sf)
    Layouts.writePartitioned(ev, dir, "event_type")
    val filtered = Layouts.readPartitioned(spark, dir)
      .filter(col("event_type") === "purchase")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"))
    assert(filtered.count() ==
      ev.filter(col("event_type") === "purchase").count())
  }

  test("z-order key interleaves bits correctly") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (5, 2), (65535, 65535))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layouts.zOrderKey(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(b => (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1)))
        .reduce(_ | _)
    assert(rows((0, 0)) == 0 && rows((1, 0)) == 1 && rows((0, 1)) == 2)
    assert(rows((1, 1)) == 3 && rows((3, 3)) == 15)
    rows.foreach { case ((x, y), z) => assert(z == morton(x, y)) }
  }

  test("z-ordered layout narrows per-file ranges on BOTH dimensions") {
    import spark.implicits._
    // 64x64 grid, uniformly covering both dims
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toDF("x", "y")
    val zdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/z"
    val xdir = java.nio.file.Files.createTempDirectory("graft_z").toString + "/xsorted"
    Layouts.writeZOrdered(grid, zdir, "x", "y", nFiles = 16, bitsPerDim = 6)
    // baseline: single-dimension sort (prunes x, never y)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
      .write.mode("overwrite").parquet(xdir)
    def fileRanges(path: String): Array[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).cast("long").as("xr"),
             (max("y") - min("y")).cast("long").as("yr"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
    val z = fileRanges(zdir)
    val xs = fileRanges(xdir)
    def avg(a: Array[Long]) = a.sum.toDouble / a.length
    // x-sorted layout: x ranges narrow but y ranges span the grid
    assert(avg(xs.map(_._2)) > 48.0, s"x-sorted y-range ${avg(xs.map(_._2))}")
    // z-ordered: BOTH dims' per-file ranges well under the full 63
    assert(avg(z.map(_._1)) < 32.0, s"z x-range ${avg(z.map(_._1))}")
    assert(avg(z.map(_._2)) < 32.0, s"z y-range ${avg(z.map(_._2))}")
    // and nothing was lost
    assert(spark.read.parquet(zdir).count() == 64 * 64)
  }

  test("bucketed tables join without an exchange") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    assume(warehouse.nonEmpty)
    // idempotence: a previous JVM may have left the table dirs without
    // catalog entries (in-memory catalog dies with the session)
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath, t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    Layouts.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Layouts.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == li.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compact merges a small-file flood into target-size files, rows intact") {
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val src = s"$base/src"
    val dest = s"$base/dest"
    val docs = Tables.documents(spark, sf)
    // a streaming-sink-shaped flood: one tiny file per partition
    docs.repartition(64).write.mode("overwrite").parquet(src)
    val (before, after) = Layouts.compact(spark, src, dest, targetMb = 128)
    assert(before >= 64, s"flood setup produced only $before files")
    assert(after == 1, s"500 tiny docs should compact to one file, got $after")
    // content identical (same rows, nothing dropped or duplicated)
    val a = spark.read.parquet(src)
    val b = spark.read.parquet(dest)
    assert(b.count() == a.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and it never rewrites in place
    intercept[IllegalArgumentException] {
      Layouts.compact(spark, src, src)
    }
    assert(spark.read.parquet(src).count() == docs.count())
  }

  test("training-shard sink: manifest matches the data directories, one file per shard") {
    val root = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val docs = Tables.documents(spark, sf)
    val (nShards, totalTokens) =
      Layouts.writeTrainingShards(docs, "doc_id", "text", 2000L, root)
    // the partition column re-reads type-INFERRED (int for small ids) —
    // normalize to the manifest's long before comparing
    val data = spark.read.parquet(s"$root/data")
      .withColumn("shard_id", col("shard_id").cast("long"))
    val mani = spark.read.parquet(s"$root/manifest")
    assert(mani.count() == nShards)
    // manifest counts equal what the written data actually holds
    val fromData = data.groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"))
          .as("n_tokens"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromMani = mani.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromData == fromMani)
    assert(fromMani.values.map(_._2).sum == totalTokens)
    // no docs lost and the layout reads back partition-pruned
    assert(data.count() == docs.count())
    val one = data.filter(col("shard_id") === 0)
    assert(one.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    // repartition(shard_id) keeps each shard directory to ONE data file
    val multi = (0L until nShards).count { s =>
      val d = java.nio.file.Paths.get(s"$root/data/shard_id=$s")
      java.nio.file.Files.exists(d) && {
        val st = java.nio.file.Files.list(d)
        try st.filter(p => p.getFileName.toString.endsWith(".parquet")).count() > 1
        finally st.close()
      }
    }
    assert(multi == 0, s"$multi shard dirs hold more than one parquet file")
  }
}
