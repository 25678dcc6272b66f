package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.text.Relevance

class SearchIndexStoreSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def freshBase(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sidx-$tag").toString + "/idx"

  test("indexed serving paths equal the per-call recomputes") {
    assert(rows(SearchIndexStore.invertedIndexIndexed(spark, sf)) ==
      rows(Indexing.invertedIndex(spark, sf)))
    assert(SearchIndexStore.bm25RankIndexed(spark, sf)
      .collect().map(_.toString).toSeq ==
      Relevance.bm25Rank(spark, sf).collect().map(_.toString).toSeq)
    assert(rows(SearchIndexStore.tokenFreqIndexed(spark, sf)) ==
      rows(graft.text.TextOps.tokenFreq(spark, sf)))
    assert(rows(SearchIndexStore.tfidfTopkIndexed(spark, sf)) ==
      rows(Relevance.tfidfTopK(spark, sf)))
    // serving from the store means corpus TEXT is never read: the only
    // allowed full scans are the postings and the no-text doc spine
    Seq(SearchIndexStore.tokenFreqIndexed(spark, sf),
        SearchIndexStore.tfidfTopkIndexed(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"), "indexed path scanned corpus text")
    }
  }

  test("upsert lifecycle: unchanged no-op, change supersedes, replay repairs nothing twice") {
    val base = freshBase("upsert")
    SearchIndexStore.build(docs.filter(col("doc_id") < 400), base)
    def served = rows(SearchIndexStore.invertedIndexOf(spark, base))
    val baseline = served
    // re-upserting identical content is a (0,0) no-op, physical rows untouched
    val physBefore = spark.read.parquet(s"$base/postings").count()
    assert(SearchIndexStore.upsertDocs(
      docs.filter(col("doc_id") < 400), base) == ((0L, 0L)))
    assert(spark.read.parquet(s"$base/postings").count() == physBefore)
    assert(served == baseline)
    // a changed doc is superseded: serving equals a rebuild over the
    // mutated corpus, and the old generation is hidden, not rewritten
    val mutated = docs.filter(col("doc_id") < 400)
      .select(col("doc_id"),
        when(col("doc_id") === 7, concat(col("text"), lit(" zzedit")))
          .otherwise(col("text")).as("text"))
    assert(SearchIndexStore.upsertDocs(
      mutated.filter(col("doc_id") === 7), base) == ((0L, 1L)))
    val rebuilt = freshBase("upsert-rebuilt")
    SearchIndexStore.build(mutated, rebuilt)
    assert(rows(SearchIndexStore.invertedIndexOf(spark, base)) ==
      rows(SearchIndexStore.invertedIndexOf(spark, rebuilt)))
    // new docs append at gen 0
    assert(SearchIndexStore.upsertDocs(
      docs.filter(col("doc_id") >= 400 && col("doc_id") < 410), base) ==
      ((10L, 0L)))
    // full replay of everything already applied: (0,0), physical stable
    val physAfter = spark.read.parquet(s"$base/postings").count()
    assert(SearchIndexStore.upsertDocs(
      mutated.unionByName(
        docs.filter(col("doc_id") >= 400 && col("doc_id") < 410)),
      base) == ((0L, 0L)))
    assert(spark.read.parquet(s"$base/postings").count() == physAfter)
  }

  test("delete hides every generation; compact folds and allows resurrection") {
    val base = freshBase("del")
    SearchIndexStore.build(docs.filter(col("doc_id") < 100), base)
    // bump doc 3 to gen 1 first so the delete must kill BOTH gens
    SearchIndexStore.upsertDocs(
      docs.filter(col("doc_id") === 3)
        .select(col("doc_id"), concat(col("text"), lit(" rev2")).as("text")),
      base)
    val del = docs.filter(col("doc_id") === 3 || col("doc_id") === 5)
      .select("doc_id")
    SearchIndexStore.deleteDocs(del, base)
    val without = freshBase("del-rebuilt")
    SearchIndexStore.build(
      docs.filter(col("doc_id") < 100 && col("doc_id") =!= 3 &&
        col("doc_id") =!= 5), without)
    def served(b: String) = rows(SearchIndexStore.invertedIndexOf(spark, b))
    assert(served(base) == served(without))
    assert(SearchIndexStore.loadDocStats(spark, base).count() == 98)
    // idempotent; unknown ids are no-ops
    SearchIndexStore.deleteDocs(del, base)
    SearchIndexStore.deleteDocs(
      spark.range(90000, 90005).select(col("id").as("doc_id")), base)
    assert(served(base) == served(without))
    // compact: same values, dead map gone, deleted ids resurrectable
    SearchIndexStore.compact(spark, base)
    assert(served(base) == served(without))
    assert(!graft.core.IndexScratch.pathExists(spark, s"$base/dead"))
    assert(SearchIndexStore.upsertDocs(
      docs.filter(col("doc_id") === 3 || col("doc_id") === 5), base) ==
      ((2L, 0L)))
    val full = freshBase("del-full")
    SearchIndexStore.build(docs.filter(col("doc_id") < 100), full)
    assert(served(base) == served(full))
  }

  test("searchSync classifies new/changed/deleted exactly; replay is a no-op") {
    val base = freshBase("sync")
    val upstream = docs.filter(col("doc_id") < 200)
    // stale snapshot: 180+ not yet crawled, 170-179 old revisions,
    // 5 phantom docs upstream no longer has
    val stale = upstream.filter(col("doc_id") < 180)
      .select(col("doc_id"),
        when(col("doc_id").between(170, 179), reverse(col("text")))
          .otherwise(col("text")).as("text"))
      .unionByName(upstream.filter(col("doc_id") < 5)
        .select((col("doc_id") + 500000).as("doc_id"), col("text")))
    SearchIndexStore.build(stale, base)
    val expectedChanged = upstream
      .filter(col("doc_id").between(170, 179) &&
        reverse(col("text")) =!= col("text")).count()
    assert(SearchIndexStore.searchSync(upstream, base) ==
      ((20L, expectedChanged, 5L)))
    val rebuilt = freshBase("sync-rebuilt")
    SearchIndexStore.build(upstream, rebuilt)
    def served(b: String) = rows(SearchIndexStore.invertedIndexOf(spark, b))
    assert(served(base) == served(rebuilt))
    // replayed cycle: nothing to do
    assert(SearchIndexStore.searchSync(upstream, base) == ((0L, 0L, 0L)))
  }

  test("bm25FromIndex equals bm25RankFor for an arbitrary query on a synced store") {
    val base = SearchIndexStore.ensureSearchIndex(spark, sf)
    val terms = Seq("the", "scan", "zzznotaterm")
    assert(SearchIndexStore.bm25FromIndex(spark, base, terms)
      .collect().map(_.toString).toSeq ==
      Relevance.bm25RankFor(spark, sf, terms).collect().map(_.toString).toSeq)
  }
}
