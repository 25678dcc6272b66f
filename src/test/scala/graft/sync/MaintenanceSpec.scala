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
