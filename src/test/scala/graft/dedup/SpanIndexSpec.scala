package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental span-dedup store must be indistinguishable from the
  * full recompute, batch by batch.
  */
class SpanIndexSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val sql = spark.sqlContext
    import sql.implicits._
    rows.toDF("doc_id", "text")
  }

  private def reportSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tokens", "dup_tokens", "n_spans", "keep_ratio6")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet

  test("append == rebuild: batched reports equal the full-scan trim") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-spaninc").toString + "/idx"
    // old corpus: doc 1 owns the shared passage, doc 2 repeats it
    // (cross-doc dup among the old crawl), doc 3 is clean
    val old = Seq(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "intro words the quick brown fox jumps over closing remark",
      3L -> "completely unrelated text with no shared passages at all")
    // new crawl (monotone ids): doc 10 repeats doc 1's passage (history
    // dup — trimmed, owner 1 keeps), docs 11+12 share a NEW passage
    // (within-batch dup — 11 owns), doc 13 is clean
    val batch = Seq(
      10L -> "prefix tokens the quick brown fox jumps over and more",
      11L -> "a fresh duplicated sentence appears right here first time",
      12L -> "padding start a fresh duplicated sentence appears right here",
      13L -> "nothing here repeats anything anywhere in any crawl")
    SpanIndexStore.buildSpanIndex(docsDf(old), base)
    val before = reportSet(spark.read.parquet(s"$base/report"))
    SpanIndexStore.appendSpanBatch(docsDf(batch), base)
    val got = reportSet(spark.read.parquet(s"$base/report"))
    val full = reportSet(Dedup.spanTrimDocs(docsDf(old ++ batch)))
    assert(got == full)
    // old documents' rows are untouched by the append (the monotone-id
    // stability argument — the reports written at build time are final)
    assert(before.subsetOf(got))
    // the history dup actually trimmed the NEW doc, not the old owner
    val byDoc = got.map(t => t._1 -> t._3).toMap
    assert(byDoc(10L) > 0 && byDoc(1L) == 0)
    assert(byDoc(12L) > 0 && byDoc(13L) == 0)
  }

  test("non-monotone batch ids are rejected loudly") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-spaninc-mono").toString + "/idx"
    SpanIndexStore.buildSpanIndex(docsDf(Seq(
      5L -> "five tokens of text right here",
      6L -> "six tokens of other text here")), base)
    val e = intercept[IllegalArgumentException] {
      SpanIndexStore.appendSpanBatch(docsDf(Seq(
        4L -> "an out of order crawl id")), base)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("replayed and half-committed appends converge without duplicate reports") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-spaninc-replay").toString + "/idx"
    val old = Seq(1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta other words")
    val batch = Seq(10L -> "alpha beta gamma delta arrives again later",
      11L -> "totally novel content in this one document")
    SpanIndexStore.buildSpanIndex(docsDf(old), base)
    SpanIndexStore.appendSpanBatch(docsDf(batch), base)
    val committed = reportSet(spark.read.parquet(s"$base/report"))
    // full re-delivery of the committed batch: silent no-op
    SpanIndexStore.appendSpanBatch(docsDf(batch), base)
    assert(reportSet(spark.read.parquet(s"$base/report")) == committed)
    assert(spark.read.parquet(s"$base/report").count() == committed.size)
    // simulated crash AFTER grams+report landed but BEFORE the meta
    // commit point: rewind meta to the pre-batch value, then replay
    val sql = spark.sqlContext
    import sql.implicits._
    Seq(2L).toDF("max_doc").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$base/meta")
    SpanIndexStore.appendSpanBatch(docsDf(batch), base)
    assert(reportSet(spark.read.parquet(s"$base/report")) == committed)
    assert(spark.read.parquet(s"$base/report").count() == committed.size)
    assert(spark.read.parquet(s"$base/meta").head().getLong(0) == 11L)
    // the duplicated gram partials from the replayed half do not change
    // the NEXT batch's verdicts: a doc repeating the shared passage
    // still trims against owner 1
    SpanIndexStore.appendSpanBatch(docsDf(Seq(
      20L -> "closing crawl alpha beta gamma delta repeats")), base)
    val byDoc = reportSet(spark.read.parquet(s"$base/report"))
      .map(t => t._1 -> t._3).toMap
    assert(byDoc(20L) > 0 && byDoc(1L) == 0)
  }

  test("spanIndexAppend streams crawl batches into the persisted store") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-spaninc-stream").toString + "/idx"
    SpanIndexStore.buildSpanIndex(docsDf(Seq(
      1L -> "the shared passage lives right here first",
      2L -> "unrelated words fill this second document")), base)
    val sql = spark.sqlContext
    import sql.implicits._
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = graft.streaming.Streams.spanIndexAppend(
      stream.toDS().toDF("doc_id", "text"), base)
    stream.addData((10L, "prefix the shared passage lives right here too"))
    q.processAllAvailable()
    stream.addData((11L, "another crawl with only fresh material inside"))
    q.processAllAvailable()
    q.stop()
    val got = reportSet(spark.read.parquet(s"$base/report"))
    val full = reportSet(Dedup.spanTrimDocs(docsDf(Seq(
      1L -> "the shared passage lives right here first",
      2L -> "unrelated words fill this second document",
      10L -> "prefix the shared passage lives right here too",
      11L -> "another crawl with only fresh material inside"))))
    assert(got == full)
  }

  test("query entry covers the whole corpus once, one row per document") {
    val df = SpanIndexStore.spanTrimIncremental(spark, sf)
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(df.count() == n)
    assert(df.select("doc_id").distinct().count() == n)
    // and it equals the live full recompute on this corpus
    assert(reportSet(df) ==
      reportSet(Dedup.spanTrim(spark, sf)))
  }
}
