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

  test("min_cost_supplier picks the cheapest (then lowest-key) supplier per part") {
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").cast("decimal(12,2)").cast("double").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = li.groupBy(_._1).map { case (pk, rows) =>
      val mc = rows.map(_._3).min
      pk -> (rows.filter(_._3 == mc).map(_._2).min, mc, rows.length.toLong)
    }
    val got = Analytics.minCostSupplier(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (sk, mc, n) = expected(r.getAs[Long]("partkey"))
      assert(r.getAs[Long]("suppkey") == sk)
      assert(r.getAs[Double]("min_cost") == mc)
      assert(r.getAs[Long]("n_offers") == n)
    }
  }

  test("percentile_stats matches DuckDB quantile_cont (pinned sf0.001 values)") {
    // pinned from `quantile_cont(value, p)` over events.parquet at
    // sf0.001 — verifies Spark's exact `percentile` interpolation is
    // bit-compatible with the oracle's definition after round(6)
    val expected = Map(
      "click" -> (210L, 33.395, 108.725, 245.7455),
      "error" -> (201L, 33.55, 104.05, 185.57),
      "purchase" -> (202L, 35.825, 118.687, 213.0922),
      "signup" -> (199L, 37.9, 112.642, 217.3336),
      "view" -> (188L, 37.215, 110.37, 228.6413))
    val got = Analytics.percentileStats(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, p50, p90, p99) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Double]("p50") == p50)
      assert(r.getAs[Double]("p90") == p90)
      assert(r.getAs[Double]("p99") == p99)
    }
  }

  test("window_sliding places every event in exactly 4 overlapping windows") {
    val ev = graft.core.Tables.events(spark, sf)
    val nEvents = ev.count()
    val rows = Analytics.windowSliding(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 4 * nEvents)
    // window starts stride the 15-minute grid
    assert(rows.forall(_.getAs[Long]("win_ns") % 900000000000L == 0))
    // each hourly window's count equals a direct range count (spot check)
    val w = rows(rows.length / 2)
    val lo = w.getAs[Long]("win_ns")
    import org.apache.spark.sql.functions._
    val direct = ev.filter(col("ts") >= lo && col("ts") < lo + 3600000000000L).count()
    assert(w.getAs[Long]("n_events") == direct)
  }

  test("funnel_steps shrinks monotonically and chains strictly-after times") {
    val rows = Analytics.funnelSteps(spark, sf).collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("view", "view>click", "view>click>purchase"))
    val ns = rows.map(_.getAs[Long]("n_users"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2))
    assert(rows.head.getAs[Long]("conv_ppm") == 1000000L)
    // driver recompute of step 2 from raw events
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tView = ev.filter(_._2 == "view").groupBy(_._1).map { case (u, es) =>
      u -> es.map(_._3).min }
    val n2 = tView.count { case (u, tv) =>
      ev.exists(e => e._1 == u && e._2 == "click" && e._3 > tv) }
    assert(ns(1) == n2.toLong)
  }

  test("funnelStepsFor handles an arbitrary chain (signup > error, driver-checked)") {
    val rows = Analytics.funnelStepsFor(
      graft.core.Tables.events(spark, sf), Seq("signup", "error"))
      .collect().sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[String]("step_name")).toSeq ==
      Seq("signup", "signup>error"))
    val ev = graft.core.Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val tSignup = ev.filter(_._2 == "signup").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).min }
    val n2 = tSignup.count { case (u, t0) =>
      ev.exists(e => e._1 == u && e._2 == "error" && e._3 > t0) }
    assert(rows(0).getAs[Long]("n_users") == tSignup.size.toLong)
    assert(rows(1).getAs[Long]("n_users") == n2.toLong)
  }

  test("windowSlidingOf honors alternate geometry (30 min window, 15 min slide)") {
    val ev = graft.core.Tables.events(spark, sf)
    val rows = Analytics.windowSlidingOf(ev,
      windowNs = 1800000000000L, slideNs = 900000000000L).collect()
    // each event in exactly 2 windows now
    assert(rows.map(_.getAs[Long]("n_events")).sum == 2 * ev.count())
  }

  test("cohort_retention's offset-0 diagonal covers every user exactly once") {
    val ev = graft.core.Tables.events(spark, sf)
    val nUsers = ev.select("user_id").distinct().count()
    val rows = Analytics.cohortRetention(spark, sf).collect()
    val diag = rows.filter(_.getAs[Long]("week_offset") == 0L)
    // every user is active in their own cohort week by definition
    assert(diag.map(_.getAs[Long]("n_users")).sum == nUsers)
    // retention never exceeds the cohort size
    val size = diag.map(r => r.getAs[Long]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= size(r.getAs[Long]("cohort_week")))
      assert(r.getAs[Long]("week_offset") >= 0L)
    }
  }

  test("salted_enrich equals the plain join and plans the salt fan-out") {
    import org.apache.spark.sql.functions._
    val salted = Analytics.saltedEnrich(spark, sf)
    val ev = graft.core.Tables.events(spark, sf).select("event_id", "user_id", "value")
    val dim = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("user_id"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("cust_spend"))
    val plain = ev.join(dim, "user_id").select("event_id", "user_id", "value", "cust_spend")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
    // the salt machinery must be IN the plan: dim-side explode fan-out and
    // a join keyed on (user_id, __salt) — otherwise this entry silently
    // degenerates to the plain hot-key join it exists to avoid
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"salted_enrich lost its dim fan-out:\n$plan")
    assert(plan.contains("__salt"), s"salted_enrich join not salted:\n$plan")
  }
}
