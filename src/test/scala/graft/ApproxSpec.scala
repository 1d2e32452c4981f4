package graft

import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("approx_count_distinct is within 5% of exact; approx median within range") {
    val rows = SparkEntry.queries("q_approx_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(r.fieldIndex("approx_users")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_users")).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact for ${r.getString(0)}")
      val med = r.getDouble(r.fieldIndex("approx_median"))
      assert(med >= r.getDouble(r.fieldIndex("min_value")) &&
             med <= r.getDouble(r.fieldIndex("max_value")))
    }
  }

  test("asof join: every purchase appears once; click_id refers to a click") {
    import org.apache.spark.sql.functions._
    val events = sources.Tables.events(spark, sf)
    val purchases = events.filter(col("event_type") === "purchase").count()
    val asof = SparkEntry.queries("q_asof_join")(spark, sf)
    assert(asof.count() == purchases)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id")).collect().map(_.getLong(0)).toSet
    assert(asof.collect().forall(r => r.isNullAt(2) || clicks.contains(r.getLong(2))))
  }

  test("pivot row sums equal per-user event counts") {
    import org.apache.spark.sql.functions._
    val p = SparkEntry.queries("q_pivot")(spark, sf)
    val total = p.select((col("click") + col("purchase") + col("error") +
      col("signup") + col("view")).as("s")).agg(sum("s")).collect()(0).getLong(0)
    assert(total == sources.Tables.events(spark, sf).count())
  }
}
