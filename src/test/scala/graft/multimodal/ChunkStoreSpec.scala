package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted content-addressed chunk store must be
  * indistinguishable from the corpus-wide CDC recompute, batch by
  * batch — plus the store-only contracts: global digest uniqueness,
  * replay convergence, tombstone delete, compaction GC.
  */
class ChunkStoreSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    val sql = spark.sqlContext
    import sql.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  private def statsSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  // long repetitive texts so the CDC chunker actually cuts (expected
  // chunk ~64 codepoints) and sources share content to dedup
  private val sharedA = ("lorem ipsum dolor sit amet consectetur " * 6).trim
  private val sharedB = ("zebra yankee xray whiskey victor uniform " * 6).trim

  test("append == rebuild: batch-built store stats equal the full-scan rollup") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-chunkstore").toString + "/store"
    val old = Seq(
      (1L, sharedA + " unique tail one", "web"),
      (2L, sharedA + " other ending entirely", "web"),
      (3L, sharedB, "wiki"))
    val batch = Seq(
      (10L, sharedA + " unique tail one", "web"), // exact repeat of doc 1
      (11L, sharedB + " fresh suffix text", "wiki"))
    ChunkStore.buildChunkStore(docsDf(old), base)
    ChunkStore.appendChunkBatch(docsDf(batch), base)
    val all = docsDf(old ++ batch)
    assert(statsSet(ChunkStore.storageStats(spark, base, all)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(all)))
    // the content-addressed table holds each digest exactly once even
    // though doc 10 re-delivered doc 1's bytes in a later batch
    val chunks = spark.read.parquet(s"$base/chunks")
    assert(chunks.count() == chunks.select("chunk_md5").distinct().count())
    // and the dedup is real: repeated assets share stored chunks
    val web = ChunkStore.storageStats(spark, base, all)
      .filter(col("source") === "web").head()
    assert(web.getAs[Long]("n_unique_chunks") < web.getAs[Long]("n_chunks"))
  }

  test("non-monotone batch ids are rejected loudly") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-chunkstore-mono").toString + "/store"
    ChunkStore.buildChunkStore(docsDf(Seq(
      (5L, sharedA, "web"), (6L, sharedB, "web"))), base)
    val e = intercept[IllegalArgumentException] {
      ChunkStore.appendChunkBatch(docsDf(Seq(
        (4L, "an out of order crawl id", "web"))), base)
    }
    assert(e.getMessage.contains("monotone"))
  }

  test("replayed and half-committed appends converge without duplicates") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-chunkstore-replay").toString + "/store"
    val old = Seq((1L, sharedA, "web"), (2L, sharedB, "web"))
    val batch = Seq((10L, sharedA + " again later", "web"),
      (11L, "totally novel content in this one document", "web"))
    ChunkStore.buildChunkStore(docsDf(old), base)
    ChunkStore.appendChunkBatch(docsDf(batch), base)
    val committedManifest = spark.read.parquet(s"$base/manifest").count()
    val committedChunks = spark.read.parquet(s"$base/chunks").count()
    // full re-delivery of the committed batch: silent no-op
    ChunkStore.appendChunkBatch(docsDf(batch), base)
    assert(spark.read.parquet(s"$base/manifest").count() == committedManifest)
    assert(spark.read.parquet(s"$base/chunks").count() == committedChunks)
    // simulated crash AFTER chunks+manifest landed but BEFORE the meta
    // commit point: rewind meta, replay — repairs, never duplicates
    val sql = spark.sqlContext
    import sql.implicits._
    Seq(2L).toDF("max_doc").coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$base/meta")
    ChunkStore.appendChunkBatch(docsDf(batch), base)
    assert(spark.read.parquet(s"$base/manifest").count() == committedManifest)
    assert(spark.read.parquet(s"$base/chunks").count() == committedChunks)
    assert(spark.read.parquet(s"$base/meta").head().getLong(0) == 11L)
    // stats still equal the recompute after all the replays
    val all = docsDf(old ++ batch)
    assert(statsSet(ChunkStore.storageStats(spark, base, all)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(all)))
  }

  test("tombstone delete hides documents; compaction GCs unreferenced chunks") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-chunkstore-del").toString + "/store"
    val docs = Seq(
      (1L, sharedA, "web"),
      (2L, sharedA + " " + sharedB, "web"), // shares A's chunks, adds B's
      (3L, sharedB + " only here extra words beyond", "wiki"))
    ChunkStore.buildChunkStore(docsDf(docs), base)
    val sql = spark.sqlContext
    import sql.implicits._
    ChunkStore.deleteChunkDocs(Seq(3L).toDF("doc_id"), base)
    // live stats equal a rebuild over the surviving docs (chunk table
    // still holds doc 3's unique chunks — uniques join via the LIVE
    // manifest, so they stop counting)
    val survivors = docsDf(docs.filter(_._1 != 3L))
    assert(statsSet(ChunkStore.storageStats(spark, base, survivors)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(survivors)))
    // delete is idempotent
    ChunkStore.deleteChunkDocs(Seq(3L).toDF("doc_id"), base)
    assert(statsSet(ChunkStore.storageStats(spark, base, survivors)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(survivors)))
    // compaction physically drops chunks no live manifest row references
    val physBefore = spark.read.parquet(s"$base/chunks").count()
    ChunkStore.compactChunkStore(spark, base)
    val physAfter = spark.read.parquet(s"$base/chunks").count()
    assert(physAfter < physBefore, "GC should drop doc 3's unique chunks")
    assert(!graft.core.IndexScratch.pathExists(spark, s"$base/tombstones"))
    assert(statsSet(ChunkStore.storageStats(spark, base, survivors)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(survivors)))
    // shared chunks survived the GC: doc 2 still reassembles
    val manifest = spark.read.parquet(s"$base/manifest")
    val orphaned = manifest.join(spark.read.parquet(s"$base/chunks"),
      Seq("chunk_md5"), "left_anti")
    assert(orphaned.isEmpty, "every live manifest row must still resolve")
  }

  test("chunkSync absorbs exactly the monotone new slice") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-chunkstore-sync").toString + "/store"
    val old = Seq((1L, sharedA, "web"), (2L, sharedB, "web"))
    ChunkStore.buildChunkStore(docsDf(old), base)
    val upstream = docsDf(old ++ Seq((10L, sharedA + " new crawl", "web")))
    assert(ChunkStore.chunkSync(upstream, base) == 1L)
    assert(ChunkStore.chunkSync(upstream, base) == 0L) // converged
    assert(statsSet(ChunkStore.storageStats(spark, base, upstream)) ==
      statsSet(Multimodal.mmChunkCdcDedupDocs(upstream)))
  }

  test("query entry equals the full-scan twin on the corpus") {
    val got = ChunkStore.mmChunkCdcIncremental(spark, sf)
    val full = Multimodal.mmChunkCdcDedup(spark, sf)
    assert(statsSet(got) == statsSet(full))
  }
}
