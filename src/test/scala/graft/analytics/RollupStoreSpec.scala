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

  test("incremental entries serve the persisted partials") {
    assert(rows(RollupStore.windowHourlyIncremental(spark, sf)) ==
      rows(Analytics.windowHourly(spark, sf)))
    assert(rows(RollupStore.windowSlidingIncremental(spark, sf)) ==
      rows(Analytics.windowSliding(spark, sf)))
  }
}
