package graft.core

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{Dedup, MinhashIndexStore}
import graft.index.SearchIndexStore

/** Crash-REPLAY contracts for the persisted stores: each mutation
  * writes several artifacts in a fixed order, and the documented
  * recovery story is "replay the batch". These specs simulate a crash
  * between two writes by snapshotting the artifact that would not have
  * landed and restoring it after a full mutation, then assert the
  * replay repairs the store to the rebuilt-from-scratch state.
  */
class CrashReplaySpec extends SparkSpec {

  private def copyTree(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(Files.delete(_))

  private def snapshot(dir: String): Path = {
    val snap = Files.createTempDirectory("graft-crash-snap").resolve("d")
    copyTree(Paths.get(dir), snap)
    snap
  }

  private def restore(snap: Path, dir: String): Unit = {
    deleteTree(Paths.get(dir))
    copyTree(snap, Paths.get(dir))
  }

  private def docs: DataFrame =
    Tables.documents(spark, sf).select("doc_id", "text")

  private def freshBase(tag: String): String =
    Files.createTempDirectory(s"graft-crash-$tag").toString + "/idx"

  test("appendToIndex replay repairs a crash between the sets and banded appends") {
    val base = freshBase("mh")
    val existing = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 =!= 0 && col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 5 === 0)
    MinhashIndexStore.build(existing, base)
    def gate: Seq[String] =
      MinhashIndexStore.dedupIncrementalAgainstIndex(probe, base)
        .collect().map(_.toString).sorted.toSeq
    val full = Dedup.dedupIncrementalDocs(probe, existing.unionByName(batch))
      .collect().map(_.toString).sorted.toSeq
    // crash simulation: the sets append landed, the banded append did
    // not — restore the pre-append banded directory after a full append
    val bandedSnap = snapshot(s"$base/banded")
    MinhashIndexStore.appendToIndex(batch, base)
    assert(gate == full)
    restore(bandedSnap, s"$base/banded")
    // the crashed state must actually be broken, or this spec has no power
    assert(gate != full, "batch slice contributes no band candidates — widen it")
    // replay: the batch ids are already in the sets table, so the
    // banded half must be guarded INDEPENDENTLY or it stays empty
    MinhashIndexStore.appendToIndex(batch, base)
    assert(gate == full)
  }

  test("upsertDocs after a crashed append never reuses an occupied postings generation") {
    val base = freshBase("sidx-gen")
    SearchIndexStore.build(docs.filter(col("doc_id") < 100), base)
    def rev(n: Int): DataFrame = docs.filter(col("doc_id") === 3)
      .select(col("doc_id"), concat(col("text"), lit(s" rev$n")).as("text"))
    // crash simulation: dead map + postings(gen 1) landed, docstats did not
    val statsSnap = snapshot(s"$base/docstats")
    assert(SearchIndexStore.upsertDocs(rev(2), base) == ((0L, 1L)))
    restore(statsSnap, s"$base/docstats")
    // upstream moved again before the retry: DIFFERENT content arrives.
    // Its generation must clear the orphaned postings gen 1, or the
    // (doc_id, gen) guard drops the new postings while the docstats row
    // lands and the index serves rev2's postings under rev3's hash.
    assert(SearchIndexStore.upsertDocs(rev(3), base) == ((1L, 0L)))
    val rebuilt = freshBase("sidx-gen-rebuilt")
    SearchIndexStore.build(
      docs.filter(col("doc_id") < 100 && col("doc_id") =!= 3).unionByName(rev(3)),
      rebuilt)
    def served(b: String): Seq[String] =
      SearchIndexStore.invertedIndexOf(spark, b)
        .collect().map(_.toString).sorted.toSeq
    assert(served(base) == served(rebuilt))
    assert(SearchIndexStore.loadDocStats(spark, base).count() == 100)
    // identical replay of the repaired revision: clean no-op
    assert(SearchIndexStore.upsertDocs(rev(3), base) == ((0L, 0L)))
  }

  test("a no-op upsert replay still repairs a stale meta row") {
    val base = freshBase("sidx-meta")
    SearchIndexStore.build(docs.filter(col("doc_id") < 100), base)
    val metaSnap = snapshot(s"$base/meta")
    val rev2 = docs.filter(col("doc_id") === 3)
      .select(col("doc_id"), concat(col("text"), lit(" rev2")).as("text"))
    assert(SearchIndexStore.upsertDocs(rev2, base) == ((0L, 1L)))
    // crash simulation: both appends + dead landed, the meta write did
    // not — the replay below sees no effective mutation
    restore(metaSnap, s"$base/meta")
    def metaRow = spark.read.parquet(s"$base/meta")
      .select("n_docs", "total_tokens").head()
    val liveTokens = SearchIndexStore.loadDocStats(spark, base)
      .agg(sum("n_tokens")).head().getLong(0)
    assert(metaRow.getLong(1) != liveTokens, "rev2 did not change token count")
    assert(SearchIndexStore.upsertDocs(rev2, base) == ((0L, 0L)))
    assert(metaRow.getLong(0) == 100L && metaRow.getLong(1) == liveTokens)
  }
}
