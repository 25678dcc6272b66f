package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class RollupStoreSpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("slice-merged rollups equal the full-history scans; replays and late slices are safe") {
    val ev = Tables.events(spark, sf)
    val fullHourly = rows(Analytics.windowHourly(spark, sf))
    val fullSliding = rows(Analytics.windowSliding(spark, sf))
    val base = java.nio.file.Files
      .createTempDirectory("graft-rollup").toString + "/roll"
    def slice(s: Long) = ev.filter(pmod(col("user_id"), lit(4L)) === s)
    def servedHourly = rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base)))
    def servedSliding = rows(RollupStore.windowSlidingFrom(
      RollupStore.loadPartials(spark, base)))
    // out-of-order ingest: slices arrive 2, 0, 3, 1 — BOTH readers of
    // the one pane store must agree with their full scans
    Seq(2L, 0L, 3L, 1L).foreach(s => RollupStore.appendSlice(slice(s), base, s))
    assert(fullHourly.nonEmpty && servedHourly == fullHourly)
    assert(fullSliding.nonEmpty && servedSliding == fullSliding)
    // a replayed slice rewrites its own partition — no double counting
    RollupStore.appendSlice(slice(2L), base, 2L)
    assert(servedHourly == fullHourly)
    assert(servedSliding == fullSliding)
    // the incremental contract: a LATE slice (events held back from the
    // first ingest) merges in without touching the others
    val late = java.nio.file.Files
      .createTempDirectory("graft-rollup-late").toString + "/roll"
    Seq(0L, 1L, 2L).foreach(s => RollupStore.appendSlice(slice(s), late, s))
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, late))) != fullHourly)
    RollupStore.appendSlice(slice(3L), late, 3L)
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, late))) == fullHourly)
    assert(rows(RollupStore.windowSlidingFrom(
      RollupStore.loadPartials(spark, late))) == fullSliding)
  }

  test("compaction folds slices without moving either rollup; retention prunes panes exactly") {
    val ev = Tables.events(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-rollup-compact").toString + "/roll"
    // slice by EVENT id (not user): the same (pane, type, user) key then
    // recurs across slices, so compaction has real folding to do
    (0L until 4L).foreach(s =>
      RollupStore.appendSlice(ev.filter(pmod(col("event_id"), lit(4L)) === s),
        base, s))
    val hourly = rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base)))
    val sliding = rows(RollupStore.windowSlidingFrom(
      RollupStore.loadPartials(spark, base)))
    val before = RollupStore.loadPartials(spark, base).count()
    // compact: one slice (-1), fewer-or-equal rows, BOTH rollups unmoved
    val after = RollupStore.compactPartials(spark, base)
    assert(after < before)
    val partials = RollupStore.loadPartials(spark, base)
    // partition-dir inference may narrow slice_id to int on read-back
    assert(partials.select("slice_id").distinct()
      .collect().map(_.getAs[Number](0).longValue).toSeq == Seq(-1L))
    assert(rows(RollupStore.windowHourlyFrom(partials)) == hourly)
    assert(rows(RollupStore.windowSlidingFrom(partials)) == sliding)
    // append-after-compact: a held-back slice still merges in (schema
    // of the compacted files must match fresh appends)
    val extraBase = java.nio.file.Files
      .createTempDirectory("graft-rollup-compact2").toString + "/roll"
    (0L until 3L).foreach(s =>
      RollupStore.appendSlice(ev.filter(pmod(col("event_id"), lit(4L)) === s),
        extraBase, s))
    RollupStore.compactPartials(spark, extraBase)
    RollupStore.appendSlice(ev.filter(pmod(col("event_id"), lit(4L)) === 3L),
      extraBase, 3L)
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, extraBase))) == hourly)
    // retention: prune panes before a pane-aligned cutoff == full scans
    // over the events that survive the same cutoff
    val cutoff = (ev.agg(expr(s"min(ts) div ${RollupStore.PaneNs}"))
      .head().getLong(0) + 6L) * RollupStore.PaneNs
    RollupStore.pruneBefore(spark, base, cutoff)
    val kept = ev.filter(col("ts") >= cutoff)
    val pruned = RollupStore.loadPartials(spark, base)
    assert(rows(RollupStore.windowHourlyFrom(pruned)) ==
      rows(Analytics.windowHourlyOf(kept)))
    assert(rows(RollupStore.windowSlidingFrom(pruned)) ==
      rows(Analytics.windowSlidingOf(kept)))
    assert(rows(RollupStore.windowHourlyFrom(pruned)) != hourly)
    // pruning EVERYTHING is refused before any rename touches the live
    // table (an empty partitioned swap would destroy it)
    val maxPane = RollupStore.loadPartials(spark, base)
      .agg(max(col("pane_ns"))).head().getLong(0)
    intercept[IllegalArgumentException] {
      RollupStore.pruneBefore(spark, base, maxPane + RollupStore.PaneNs)
    }
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base))) ==
      rows(Analytics.windowHourlyOf(kept)))
  }

  test("fenced compaction folds only slices below the replay floor") {
    val ev = Tables.events(spark, sf)
    val base = java.nio.file.Files
      .createTempDirectory("graft-rollup-fence").toString + "/roll"
    (0L until 4L).foreach(s =>
      RollupStore.appendSlice(ev.filter(pmod(col("event_id"), lit(4L)) === s),
        base, s))
    val hourly = rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base)))
    // floor = 2: slices 0,1 fold into -1; 2,3 stay replayable
    RollupStore.compactPartials(spark, base, beforeSlice = 2L)
    val slices = RollupStore.loadPartials(spark, base)
      .select("slice_id").distinct()
      .collect().map(_.getAs[Number](0).longValue).toSeq.sorted
    assert(slices == Seq(-1L, 2L, 3L))
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base))) == hourly)
    // the uncommitted batch REPLAYS (same sliceId): still no double count
    RollupStore.appendSlice(ev.filter(pmod(col("event_id"), lit(4L)) === 3L),
      base, 3L)
    assert(rows(RollupStore.windowHourlyFrom(
      RollupStore.loadPartials(spark, base))) == hourly)
  }

  test("incremental entries serve the persisted partials") {
    assert(rows(RollupStore.windowHourlyIncremental(spark, sf)) ==
      rows(Analytics.windowHourly(spark, sf)))
    assert(rows(RollupStore.windowSlidingIncremental(spark, sf)) ==
      rows(Analytics.windowSliding(spark, sf)))
    assert(rows(RollupStore.cohortRetentionIncremental(spark, sf)) ==
      rows(Analytics.cohortRetention(spark, sf)))
  }
}
