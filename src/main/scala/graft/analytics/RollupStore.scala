package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{IndexScratch, Tables}

/** Persisted, incrementally-maintained AGGREGATE state — materialized-
  * view maintenance for the monitoring rollups (the reference's job
  * dashboards re-derive these per page load; at 100 TB of events the
  * only viable refresh is one ingest slice, never the history).
  *
  * The row stores (`DecisionStore`) and indexes (`MinhashIndexStore`,
  * `VectorIndexStore`, `SearchIndexStore`) persist per-item state;
  * this store persists PARTIAL AGGREGATES and serves the rollup as a
  * merge — the classic algebraic-aggregate contract: `count`/`sum`
  * merge by addition, but `count(DISTINCT user_id)` has no mergeable
  * scalar partial, so the state is kept one grain FINER than the
  * serving rollup — per `(hour_ns, event_type, user_id)` — where all
  * three measures collapse to sums and the distinct-user count becomes
  * a row count the final merge re-distincts exactly. State size is
  * bounded by hours × types × active-users-per-hour (the value
  * dimension collapses on ingest), typically ~0.1% of raw events.
  *
  * `total_value` is summed as DECIMAL end-to-end: decimal addition is
  * exact and associative, so slice-partial sums merged in any order
  * equal the full-scan sum bit-for-bit (a double sum would be
  * shuffle-order-dependent and break the shared-oracle hash).
  *
  * Slices land via dynamic-partition overwrite keyed by `slice_id`, so
  * a replayed ingest rewrites its own partition instead of
  * double-counting — the same idempotence contract as the streaming
  * relay sinks.
  */
object RollupStore {

  /** Partial-aggregate rows for one ingest slice of events. */
  private def partialsOf(events: DataFrame): DataFrame =
    events.groupBy(
        expr("(ts div 3600000000000) * 3600000000000").as("hour_ns"),
        col("event_type"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("value_sum"))

  /** Ingest ONE slice of events into the partial-state table: the
    * slice aggregates down to its (hour, type, user) partials — the
    * only scan of the raw slice — and overwrites its own `slice_id`
    * partition. Replays rewrite identical partials; no other slice's
    * files are touched.
    */
  def appendSlice(events: DataFrame, basePath: String,
      sliceId: Long): Unit =
    partialsOf(events)
      .withColumn("slice_id", lit(sliceId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("slice_id")
      .parquet(s"$basePath/partials")

  /** The serving merge: re-aggregate the partial table to the rollup
    * grain. `n_users` re-distincts `user_id` (the same user may appear
    * under several slices for one hour), `n_events`/`value_sum` merge
    * by addition — value identical to the full-history scan, row for
    * row, because every measure is algebraic at the stored grain.
    */
  def windowHourlyFrom(partials: DataFrame): DataFrame =
    partials.groupBy(col("hour_ns"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value_sum")).cast("double").as("total_value"))
      .select("hour_ns", "event_type", "n_events", "n_users", "total_value")
      .orderBy(col("hour_ns"), col("event_type"))

  def loadPartials(spark: SparkSession, basePath: String): DataFrame =
    spark.read.parquet(s"$basePath/partials")

  /** The demonstration split for [[windowHourlyIncremental]]: four
    * ingest sources feeding the same hours (`user_id mod 4` — the
    * adversarial case for the merge: every rollup row must combine
    * partials from ALL slices, so a broken distinct-merge or a
    * double-counted replay changes the hash).
    */
  private val Slices = 4L

  /** `window_hourly` served from the incrementally-built partial-state
    * table: the history is ingested as [[Slices]] independent slices
    * (each scanned once, each idempotent) and the rollup is ONE merge
    * pass over the partials — hash-checked against the SAME oracle as
    * the full-scan `window_hourly`, so the partial-aggregate algebra
    * (finer-grain state, decimal merge, re-distinct) sits under the
    * exact cross-engine gate.
    */
  def windowHourlyIncremental(spark: SparkSession, dir: String): DataFrame =
    windowHourlyFrom(loadPartials(spark, ensureRollup(spark, dir)))

  /** Build-if-missing-or-stale for the partial-state table (shared by
    * the query entry and the bench pre-build); returns the base path.
    */
  def ensureRollup(spark: SparkSession, dir: String): String = {
    val base = IndexScratch.scratchBase(dir, "rollup")
    val fp = IndexScratch.sourceFingerprint(spark, s"$dir/events.parquet")
    IndexScratch.ensureBuilt(base, fp) {
      val ev = Tables.events(spark, dir)
      (0L until Slices).foreach { s =>
        appendSlice(ev.filter(pmod(col("user_id"), lit(Slices)) === s),
          base, s)
      }
    }
    base
  }
}
