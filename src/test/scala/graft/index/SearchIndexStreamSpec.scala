package graft.index

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SearchIndexStreamSpec extends SparkSpec {

  test("searchIndexUpsert streams crawled revisions into the persisted index, replay-safe") {
    val sql = spark.sqlContext
    import sql.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val base = java.nio.file.Files
      .createTempDirectory("graft-sidx-stream").toString + "/idx"
    val cut = 400L
    SearchIndexStore.build(docs.filter(col("doc_id") < cut), base)
    // the crawl feed: the NEW tail of the corpus, plus a re-crawl of an
    // existing doc with a revised text (the changed class) and a
    // re-crawl with identical text (the unchanged no-op class)
    val fresh = docs.filter(col("doc_id") >= cut).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSeq
    val revised = docs.filter(col("doc_id") === 7).collect()
      .map(r => (7L, r.getAs[String]("text") + " zzrev2")).toSeq
    val unchanged = docs.filter(col("doc_id") === 8).collect()
      .map(r => (8L, r.getAs[String]("text"))).toSeq
    val stream = MemoryStream[(Long, String)](spark)
    val query = graft.streaming.Streams.searchIndexUpsert(
      stream.toDS().toDF("doc_id", "text"), base)
    try {
      val (b1, b2) = fresh.splitAt(fresh.length / 2)
      stream.addData(b1)
      query.processAllAvailable()
      stream.addData(b2 ++ revised ++ unchanged)
      query.processAllAvailable()
      // at-least-once replay of the first batch + the revision
      stream.addData(b1 ++ revised)
      query.processAllAvailable()
    } finally query.stop()
    // streamed store == one-shot build over the final corpus state
    val finalCorpus = docs
      .select(col("doc_id"),
        when(col("doc_id") === 7, concat(col("text"), lit(" zzrev2")))
          .otherwise(col("text")).as("text"))
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft-sidx-stream-ref").toString + "/idx"
    SearchIndexStore.build(finalCorpus, rebuilt)
    def rows(b: String) = SearchIndexStore.invertedIndexOf(spark, b)
      .collect().map(_.toString).sorted.toSeq
    assert(rows(base).nonEmpty && rows(base) == rows(rebuilt))
    // exactly one live generation per doc, replays included
    assert(SearchIndexStore.loadDocStats(spark, base).count() == docs.count())
  }
}
