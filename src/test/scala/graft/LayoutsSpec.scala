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
}
