package graft.sync

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("tbl.parquet").toString

  test("resetOrphans resets every non-idle row, stamps it, and is idempotent") {
    import spark.implicits._
    val path = tmp("graft-maint-state")
    Seq(
      (1L, "idle", 100L), (2L, "fetching", 200L),
      (3L, "indexing", 300L), (4L, "idle", 400L))
      .toDF("key", "sync_status", "status_changed_at")
      .write.parquet(path)
    val n1 = Maintenance.applyTo(spark, path)(Maintenance.resetOrphans(_, nowNs = 999L))
    assert(n1 == 2L)
    val after = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("sync_status"),
        r.getAs[Long]("status_changed_at"))).toSet
    assert(after == Set((1L, "idle", 100L), (2L, "idle", 999L),
      (3L, "idle", 999L), (4L, "idle", 400L)))
    // retried admin action: no-op, stamps untouched
    val n2 = Maintenance.applyTo(spark, path)(Maintenance.resetOrphans(_, nowNs = 1234L))
    assert(n2 == 0L)
    val again = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[String]("sync_status"),
        r.getAs[Long]("status_changed_at"))).toSet
    assert(again == after)
  }

  test("clearQueues drops exactly the four cleared states and is idempotent") {
    import spark.implicits._
    val path = tmp("graft-maint-queue")
    Seq(
      (1L, "sync", "pending"), (2L, "sync", "active"), (3L, "sync", "done"),
      (4L, "index", "scheduled"), (5L, "index", "failed"), (6L, "index", "dead"))
      .toDF("job_id", "namespace", "state")
      .write.parquet(path)
    val n1 = Maintenance.applyTo(spark, path)(Maintenance.clearQueues)
    assert(n1 == 4L)
    val kept = spark.read.parquet(path).collect()
      .map(r => (r.getAs[Long]("job_id"), r.getAs[String]("state"))).toSet
    assert(kept == Set((1L, "pending"), (3L, "done")))
    assert(Maintenance.applyTo(spark, path)(Maintenance.clearQueues) == 0L)
  }

  test("clearOutbox deletes unprocessed rows, keeps processed history, idempotent") {
    import spark.implicits._
    val path = tmp("graft-maint-outbox")
    Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None))
      .toDF("event_id", "processed_at")
      .write.parquet(path)
    val n1 = Maintenance.applyTo(spark, path)(Maintenance.clearOutbox)
    assert(n1 == 2L)
    assert(spark.read.parquet(path).collect()
      .map(_.getAs[Long]("event_id")).toSet == Set(1L, 3L))
    assert(Maintenance.applyTo(spark, path)(Maintenance.clearOutbox) == 0L)
  }

  test("swapRewrite survives a leftover staging/trash dir and never mixes states") {
    import spark.implicits._
    val path = tmp("graft-maint-swap")
    (1L to 100L).toDF("v").write.parquet(path)
    // simulate a crashed previous run: stale staging + trash dirs
    (900L to 999L).toDF("v").write.parquet(path + ".staging")
    (500L to 599L).toDF("v").write.parquet(path + ".trash")
    val df = spark.read.parquet(path).filter(col("v") <= 50L)
    val written = graft.sinks.Sinks.swapRewrite(spark, df, path)
    assert(written == 50L)
    val vs = spark.read.parquet(path).collect().map(_.getAs[Long]("v")).toSet
    assert(vs == (1L to 50L).toSet, "rewrite mixed in rows from stale dirs")
    // both side dirs are gone
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".trash")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + ".staging")))
  }

  test("adminResync: reset-orphans feeds the sync cycle it unblocks (round-trip)") {
    import spark.implicits._
    // article-state store over the real diff key space: a slice of the
    // dirty keys is stuck under workers (non-idle), the rest is idle
    val dirtyKeys = graft.sync.Sync.syncDiff(spark, sf)
      .filter(col("status").isin("new", "changed"))
      .select("key").as[Long].collect().sorted.toSeq
    assert(dirtyKeys.nonEmpty)
    val stuck = dirtyKeys.filter(_ % 3 == 0).toSet
    assert(stuck.nonEmpty && stuck.size < dirtyKeys.size)
    val statePath = tmp("graft-admin-state")
    dirtyKeys.map(k =>
        (k, if (stuck(k)) "fetching" else "idle", 100L))
      .toDF("key", "sync_status", "status_changed_at")
      .write.parquet(statePath)
    // before the admin action, the held keys are NOT indexed
    val outBefore = Files.createTempDirectory("graft-admin-out1").toString
    val idleOnly = spark.read.parquet(statePath)
      .filter(col("sync_status") === "idle").select("key")
    val before = graft.Pipeline.syncAndIndex(spark, sf, outBefore,
        eligible = Some(idleOnly))
      .select("key").as[Long].collect().toSet
    assert(before.intersect(stuck).isEmpty)
    // the round-trip: release the orphans, then the sync cycle picks
    // them up in the same run (web.rs clear-then-trigger_sync)
    val outAfter = Files.createTempDirectory("graft-admin-out2").toString
    val (released, docs) =
      graft.Pipeline.adminResync(spark, sf, statePath, outAfter, nowNs = 999L)
    assert(released == stuck.size)
    val indexed = docs.select("key").as[Long].collect().toSet
    // ...and equals the ungated cycle now that every key is idle (not
    // every dirty key HAS a search doc — "new" keys exist only on the
    // remote side — so the ungated cycle is the right universe)
    val outPlain = Files.createTempDirectory("graft-admin-out3").toString
    val plain = graft.Pipeline.syncAndIndex(spark, sf, outPlain)
      .select("key").as[Long].collect().toSet
    assert(indexed == plain)
    // the released keys that have search docs were indexed THIS run
    val releasedIndexable = stuck.intersect(plain)
    assert(releasedIndexable.nonEmpty && releasedIndexable.subsetOf(indexed))
    // retried round-trip: releases nothing, indexes the same set
    val outRetry = Files.createTempDirectory("graft-admin-out4").toString
    val (released2, docs2) =
      graft.Pipeline.adminResync(spark, sf, statePath, outRetry, nowNs = 1234L)
    assert(released2 == 0L)
    assert(docs2.select("key").as[Long].collect().toSet == indexed)
  }

  test("maintenance transforms are scan-bound: no exchange in any plan") {
    import spark.implicits._
    val state = Seq((1L, "fetching", 1L)).toDF("key", "sync_status", "status_changed_at")
    val queue = Seq((1L, "ns", "active")).toDF("job_id", "namespace", "state")
    val outbox = Seq((1L, Some(1L))).toDF("event_id", "processed_at")
    for (df <- Seq(
        Maintenance.resetOrphans(state, 0L).newState,
        Maintenance.clearQueues(queue).newState,
        Maintenance.clearOutbox(outbox).newState))
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "maintenance write-backs must stay shuffle-free")
  }
}
