package graft.analytics

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("q1_agg groups into the six flag/status cells") {
    val rows = Analytics.q1Agg(spark, sf).collect()
    assert(rows.length === 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
  }

  test("q3_topk returns at most 10 rows sorted by revenue desc") {
    val rows = Analytics.q3TopK(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5_join yields ASIA nations") {
    val rows = Analytics.q5Join(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
  }

  test("topk_per_group caps at 3 per customer") {
    val rows = Analytics.topKPerGroup(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 3))
    assert(byCust.keys.forall(_ < 100))
  }

  test("asof_join: every purchase appears exactly once, click is earlier") {
    val df = Analytics.asofJoin(spark, sf)
    val purchases = graft.core.Tables
      .events(spark, sf)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(df.count() === purchases)
  }

  test("sessionize: session bounds ordered, counts positive") {
    val rows = Analytics.sessionize(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getAs[Long]("session_start_us") <= r.getAs[Long]("session_end_us")))
    assert(rows.forall(_.getAs[Long]("n_events") > 0))
  }

  test("window_hourly: buckets align to the hour") {
    val rows = Analytics.windowHourly(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("hour_ns") % 3600000000000L === 0))
  }
}
