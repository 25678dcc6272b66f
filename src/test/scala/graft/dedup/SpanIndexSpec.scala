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
