package graft

import org.scalatest.funsuite.AnyFunSuite

class ApproxSpec extends AnyFunSuite {
  import TestSpark._

  test("portable KMV sketch tracks exact distincts; sample median within range") {
    val rows = SparkEntry.queries("q_approx_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kmv = r.getLong(r.fieldIndex("kmv_users")).toDouble
      val exact = r.getLong(r.fieldIndex("exact_users")).toDouble
      // KMV with k=64: exact below k distincts, stderr ~1/sqrt(k-2) above
      assert(math.abs(kmv - exact) / exact <= 0.4,
        s"kmv=$kmv exact=$exact for ${r.getString(0)}")
      val med = r.getDouble(r.fieldIndex("sample_median"))
      assert(med >= r.getDouble(r.fieldIndex("min_value")) &&
             med <= r.getDouble(r.fieldIndex("max_value")))
    }
  }

  test("engine sketches (HLL distinct, quantile) stay within error of exact") {
    import org.apache.spark.sql.functions._
    val rows = sources.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("approx_median"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .collect()
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

  test("hopping windows double-count each event exactly len/slide times") {
    import org.apache.spark.sql.functions._
    val hop = SparkEntry.queries("q_hopping_window")(spark, sf)
    val nEvents = sources.Tables.events(spark, sf).count()
    assert(hop.agg(sum("n")).collect()(0).getLong(0) == 2 * nEvents)
    // every tumbling hour bucket appears among the hopping starts
    val tumbling = SparkEntry.queries("q_tumbling_window")(spark, sf)
      .select(col("hour_start")).distinct()
    val starts = hop.select(col("w_start")).distinct()
    assert(tumbling.exceptAll(tumbling.intersect(starts)).isEmpty)
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

  test("interval join: range-frame window equals the join formulation") {
    import org.apache.spark.sql.functions._
    val win = operators.Relational.qIntervalJoin(spark, sf)
    val join = operators.Relational.qIntervalJoinViaJoin(spark, sf)
    assert(win.count() ==
      sources.Tables.events(spark, sf)
        .filter(col("event_type") === "purchase").count())
    assert(win.exceptAll(join).isEmpty && join.exceptAll(win).isEmpty)
    // windows with no view → null gap, zero count; with views → gap in
    // [0, 1h] micros
    val rows = win.collect()
    assert(rows.forall(r =>
      if (r.getLong(2) == 0) r.isNullAt(3)
      else r.getLong(3) >= 0 && r.getLong(3) <= 3600000000L))
  }

  test("pivot row sums equal per-user event counts") {
    import org.apache.spark.sql.functions._
    val p = SparkEntry.queries("q_pivot")(spark, sf)
    val total = p.select((col("click") + col("purchase") + col("error") +
      col("signup") + col("view")).as("s")).agg(sum("s")).collect()(0).getLong(0)
    assert(total == sources.Tables.events(spark, sf).count())
  }
}
