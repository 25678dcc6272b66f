package graft.sync

import graft.SparkSpec

class SyncSpec extends SparkSpec {

  test("sync_diff classifies every key into exactly one status") {
    val rows = Sync.syncDiff(spark, sf).collect()
    val statuses = rows.map(_.getAs[String]("status")).toSet
    assert(statuses.subsetOf(Set("new", "changed", "deleted", "unchanged")))
    // keys dropped from local (%7) but present remote must be 'new'
    assert(rows.filter(r => r.getAs[Long]("key") % 7 == 0 && r.getAs[Long]("key") % 11 != 0)
      .forall(_.getAs[String]("status") == "new"))
    // keys dropped from remote (%11) but present local must be 'deleted'
    assert(rows.filter(r => r.getAs[Long]("key") % 11 == 0 && r.getAs[Long]("key") % 7 != 0)
      .forall(_.getAs[String]("status") == "deleted"))
  }

  test("sync_upsert keeps one row per key with updates winning") {
    val rows = Sync.syncUpsert(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("key")).distinct.length == rows.length)
    assert(rows.filter(_.getAs[Long]("key") % 3 == 0)
      .forall(r => r.getAs[String]("status") == "U" && r.getAs[Long]("src") == 1L))
  }

  test("outbox_batch caps every batch at the chunk size") {
    val rows = Sync.outboxBatch(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_events") <= 100))
    assert(rows.forall(r => r.getAs[Long]("min_event_id") <= r.getAs[Long]("max_event_id")))
  }

  test("batch_claim excludes orders with a returned line") {
    val claimed = Sync.batchClaim(spark, sf)
    import org.apache.spark.sql.functions.col
    val withReturn = graft.core.Tables.lineitem(spark, sf)
      .filter(col("l_returnflag") === "R").select("l_orderkey").distinct()
    assert(claimed.join(withReturn,
      claimed("o_orderkey") === withReturn("l_orderkey")).count() == 0)
  }

  test("orphan_requeue matches an independent dead-worker computation") {
    import org.apache.spark.sql.functions._
    val cutoffNs = 1706140800000000000L
    val ev = graft.core.Tables.events(spark, sf).cache()
    val deadUsers = ev.groupBy("user_id")
      .agg(max(when(col("event_type") === "click", col("ts"))).as("lc"))
      .filter(col("lc").isNull || col("lc") < cutoffNs)
      .collect().map(_.getAs[Long]("user_id")).toSet
    val expected = ev.filter(col("event_type") === "view")
      .collect().count(r => deadUsers(r.getAs[Long]("user_id")))
    assert(Sync.orphanRequeue(spark, sf).count() == expected)
  }

  test("snapshot_stats rollup includes the grand total") {
    val rows = Sync.snapshotStats(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_docs") == 500L)
  }

  test("sync_backfill waves are oldest-first, capped, and chunk-bounded") {
    val rows = Sync.syncBackfill(spark, sf, cap = 300, chunkSize = 100).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum <= 300L)
    assert(rows.forall(_.getAs[Long]("n_items") <= 100L))
    // chunk ids contiguous from 0, and chunk dates never move backwards
    assert(rows.map(_.getAs[Long]("chunk_id")).toSeq ==
      (0L until rows.length).toSeq)
    val dates = rows.sortBy(_.getAs[Long]("chunk_id")).map(_.getAs[String]("oldest_date"))
    assert(dates.toSeq == dates.sorted.toSeq)
  }

  test("scd2_history intervals chain per key with exactly one current row") {
    val rows = Sync.scd2History(spark, sf).collect()
    val orders = graft.core.Tables.orders(spark, sf).count()
    assert(rows.length == orders)
    rows.groupBy(_.getAs[Long]("key")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length).toSeq)
      // each interval's valid_to equals the next interval's valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"))
          assert(a.getAs[Int]("is_current") == 0)
        case _ =>
      }
      val last = sorted.last
      assert(last.getAs[String]("valid_to") == null)
      assert(last.getAs[Int]("is_current") == 1)
      assert(sorted.count(_.getAs[Int]("is_current") == 1) == 1)
    }
  }

  test("sync_status_rollup cells cover every order with sane oldest dates") {
    val rows = Sync.syncStatusRollup(spark, sf).collect()
    val orders = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_articles")).sum == orders)
    val statuses = rows.map(_.getAs[String]("sync_status")).toSet
    assert(statuses.subsetOf(Set("idle", "pending_fetch", "pending_index")))
    // every (dictionary, status) cell appears once
    assert(rows.map(r => (r.getAs[String]("dictionary"),
      r.getAs[String]("sync_status"))).distinct.length == rows.length)
  }

  test("queue_depth_stats states partition each namespace and backlog adds up") {
    val rows = Sync.queueDepthStats(spark, sf).collect()
    val events = graft.core.Tables.events(spark, sf).count()
    val stateSum = rows.map(r => Seq("pending", "running", "failed", "dead",
      "scheduled", "done").map(r.getAs[Long](_)).sum).sum
    assert(stateSum == events)
    rows.foreach { r =>
      assert(r.getAs[Long]("backlog") ==
        r.getAs[Long]("pending") + r.getAs[Long]("running") + r.getAs[Long]("scheduled"))
    }
  }

  test("outbox_depth_stats totals row equals the sum of the per-type rows") {
    val rows = Sync.outboxDepthStats(spark, sf).collect()
    val (totals, perType) = rows.partition(_.isNullAt(0))
    assert(totals.length == 1 && perType.nonEmpty)
    Seq("pending", "processed_last_hour", "processed_last_day").foreach { c =>
      assert(totals.head.getAs[Long](c) == perType.map(_.getAs[Long](c)).sum)
    }
  }

  test("alert_rollup rows breach their own thresholds and match recomputed gauges") {
    val rows = Sync.alertRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cond = r.getAs[String]("condition")
      assert(Set("queue", "outbox").contains(r.getAs[String]("source")))
      assert(Set("backlog_high", "dead_jobs", "pending_high").contains(cond))
      if (cond == "dead_jobs") assert(r.getAs[Long]("observed") > 0)
      else assert(r.getAs[Long]("observed") > r.getAs[Double]("threshold"))
    }
    // backlog_high fires for EXACTLY the namespaces above the mean backlog
    val stats = Sync.queueDepthStats(spark, sf).collect()
      .map(r => r.getAs[String]("namespace") -> r.getAs[Long]("backlog")).toMap
    val mean = stats.values.sum.toDouble / stats.size
    val expected = stats.filter(_._2 > mean).keySet
    val fired = rows.filter(_.getAs[String]("condition") == "backlog_high")
      .map(_.getAs[String]("scope")).toSet
    assert(fired == expected, s"backlog_high fired $fired, expected $expected")
  }

  test("sync_diff_bucketed equals sync_diff and plans ZERO exchanges") {
    val plain = Sync.syncDiff(spark, sf)
    val bucketed = Sync.syncDiffBucketed(spark, sf)
    // value-identical to the shuffling formulation
    assert(bucketed.exceptAll(plain).count() == 0 &&
      plain.exceptAll(bucketed).count() == 0)
    // the 100 TB claim: both sides are bucket-aligned on the join key, so
    // the full-outer diff moves NO rows — no Exchange anywhere in the plan
    // (walked with AQE off; AQE only re-plans within the same exchange set)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Sync.syncDiffBucketed(spark, sf).queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(!plan.contains("Exchange"), s"bucketed diff still shuffles:\n$plan")
    assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
      s"bucketed diff not reading bucketed scans:\n$plan")
  }
}
