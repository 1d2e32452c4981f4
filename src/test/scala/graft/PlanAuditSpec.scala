package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Scale-safety assertions on physical plans: fact tables must never
  * carry a compile-time broadcast hint (a hard directive that would OOM
  * at the 100 TB target), only fixed-cardinality dimensions may. Auto
  * broadcast is disabled for the assertion so the only
  * BroadcastExchange nodes left are the explicit hints.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def noAutoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def audit(df: DataFrame, expectedBroadcasts: Int, name: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val got = "BroadcastExchange".r.findAllMatchIn(plan).length
    assert(got == expectedBroadcasts,
      s"$name: expected $expectedBroadcasts dim broadcasts, got $got:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"$name: fact join should be a shuffle join:\n$plan")
  }

  test("q3_top_orders broadcasts only the filtered customer dim") {
    noAutoBroadcast {
      audit(Relational.q3TopOrders(spark, sf), 1, "q3")
    }
  }

  test("q5_region_revenue broadcasts only nation and region") {
    noAutoBroadcast {
      audit(Relational.q5RegionRevenue(spark, sf), 2, "q5")
    }
  }

  test("q10_returned_items has no compile-time broadcasts") {
    noAutoBroadcast {
      audit(Relational.q10ReturnedItems(spark, sf), 0, "q10")
    }
  }

  test("q14_promo_share has no compile-time broadcasts") {
    noAutoBroadcast {
      audit(Relational.q14PromoShare(spark, sf), 0, "q14")
    }
  }
}
