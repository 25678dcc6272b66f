package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

case class Ord(o_orderkey: Long, o_orderstatus: String,
               o_orderdate: java.sql.Timestamp, o_orderpriority: String)

/** Pins the live stats-push gauges (web.rs:729 `stats_ws`) to their
  * batch operators ACROSS MICRO-BATCHES: after every micro-batch the
  * Complete-mode emission must equal the batch gauge over exactly the
  * prefix of rows consumed so far — the property that makes the
  * dashboard feed trustworthy (it never shows a number the batch
  * operator wouldn't).
  */
class StreamsGaugeSpec extends SparkSpec {

  private def sortedLines(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("queueDepthGauge emits the batch queue gauge after every micro-batch") {
    val sql = spark.sqlContext
    import sql.implicits._
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    val chunks = events.grouped(math.max(1, events.size / 3)).toSeq
    val stream = MemoryStream[Ev](spark)
    val query = Streams.queueDepthGauge(stream.toDF())
      .writeStream.format("memory").queryName("queue_gauge_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      var prefix = Seq.empty[Ev]
      chunks.foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
        prefix = prefix ++ chunk
        val got = sortedLines(spark.table("queue_gauge_sink"))
        val want = sortedLines(
          graft.sync.Sync.queueDepthFrom(prefix.toDF()))
        assert(got.nonEmpty && got == want,
          s"gauge diverged from batch at prefix ${prefix.size}")
      }
    } finally query.stop()
  }

  test("syncStatusGauge emits the batch sync rollup after every micro-batch") {
    val sql = spark.sqlContext
    import sql.implicits._
    val orders = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
      .as[Ord].collect().toSeq
    val chunks = orders.grouped(math.max(1, orders.size / 3)).toSeq
    val stream = MemoryStream[Ord](spark)
    val query = Streams.syncStatusGauge(stream.toDF())
      .writeStream.format("memory").queryName("sync_gauge_sink")
      .outputMode(OutputMode.Complete).start()
    try {
      var prefix = Seq.empty[Ord]
      chunks.foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
        prefix = prefix ++ chunk
        val got = sortedLines(spark.table("sync_gauge_sink"))
        val want = sortedLines(
          graft.sync.Sync.statusRollupFrom(prefix.toDF()))
        assert(got.nonEmpty && got == want,
          s"gauge diverged from batch at prefix ${prefix.size}")
      }
    } finally query.stop()
  }

  test("alertFeed publishes the batch alert_rollup breach set after every micro-batch") {
    val sql = spark.sqlContext
    import sql.implicits._
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    val chunks = events.grouped(math.max(1, events.size / 3)).toSeq
    val stream = MemoryStream[Ev](spark)
    @volatile var published = Seq.empty[String]
    val query = Streams.alertFeed(stream.toDF()) { alerts =>
      published = sortedLines(alerts)
    }
    try {
      var prefix = Seq.empty[Ev]
      chunks.foreach { chunk =>
        stream.addData(chunk)
        query.processAllAvailable()
        prefix = prefix ++ chunk
        val want = sortedLines(graft.sync.Sync.alertsFromGauges(
          graft.sync.Sync.alertGaugesFrom(prefix.toDF())))
        assert(published.nonEmpty && published == want,
          s"alert feed diverged from batch at prefix ${prefix.size}")
      }
      // the final emission IS the batch alert_rollup over the full corpus
      val full = sortedLines(graft.sync.Sync.alertRollup(spark, sf))
      assert(published == full)
    } finally query.stop()
  }

  test("queueDepthWindowed matches the batch per-hour depth rollup") {
    val sql = spark.sqlContext
    import sql.implicits._
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Ev].collect().toSeq
    val maxTs = events.map(_.ts).max
    val stream = MemoryStream[Ev](spark)
    val query = Streams.queueDepthWindowed(stream.toDF())
      .writeStream.format("memory").queryName("queue_win_sink")
      .outputMode(OutputMode.Append).start()
    try {
      stream.addData(events)
      query.processAllAvailable()
      // two flush ticks: each advances the watermark computed from the
      // previous micro-batch, closing every real window
      stream.addData(Ev(-1, maxTs + 86400L * 1000000000L, -1, "flush", 0.0))
      query.processAllAvailable()
      stream.addData(Ev(-2, maxTs + 2 * 86400L * 1000000000L, -1, "flush", 0.0))
      query.processAllAvailable()
    } finally query.stop()
    val got = sortedLines(
      spark.table("queue_win_sink").filter(col("namespace") =!= "flush"))
    val want = sortedLines(
      Streams.queueDepthWindowed(events.toDF()).filter(col("namespace") =!= "flush"))
    assert(got.nonEmpty && got == want)
  }
}
