package graft.sim

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("cosine_topk returns exactly 5 ranked neighbours per query") {
    val rows = Similarity.cosineTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    // ranked descending by cosine
    assert(byQ.values.forall { g =>
      val cs = g.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos6"))
      cs.zip(cs.tail).forall { case (a, b) => a >= b }
    })
  }

  test("knn_classify is the majority vote over the exact top-5, ties to lowest label") {
    val knn = Similarity.knnClassify(spark, sf).collect()
    assert(knn.length == 20)
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val top = Similarity.cosineTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
    knn.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val votes = top(q).map(x => labels(x.getAs[Long]("n_id")))
        .groupBy(identity).map { case (l, xs) => l -> xs.length }
      val (predLabel, nVotes) = votes.maxBy { case (l, v) => (v, -l) }
      assert(r.getAs[Int]("pred_label") == predLabel)
      assert(r.getAs[Long]("n_votes") == nVotes.toLong)
      assert(r.getAs[Int]("true_label") == labels(q))
      assert(r.getAs[Int]("correct") ==
        (if (predLabel == labels(q)) 1 else 0))
    }
  }

  test("embed_centroid_stats matches a driver recompute of the quantized geometry") {
    val rows = Similarity.embedCentroidStats(spark, sf).collect()
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Int]("label"),
        r.getSeq[Float](2).map(x => math.floor(x.toDouble * 1e6).toLong).toArray))
    val byLabel = embs.groupBy(_._1)
    assert(rows.length == byLabel.size)
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      val members = byLabel(l).map(_._2)
      val n = members.length
      assert(r.getAs[Long]("n_vecs") == n.toLong)
      val cen = Array.tabulate(64)(k => members.map(_(k)).sum)
      val meanNorm = math.sqrt(
        cen.map(v => (v.toDouble / n) * (v.toDouble / n)).sum) / 1e6
      assert(r.getAs[Double]("centroid_norm6") == r6(meanNorm))
      val ncs = math.sqrt(cen.map(v => v.toDouble * v.toDouble).sum)
      val ppms = members.map { q =>
        val dot = q.zip(cen).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val nq = math.sqrt(q.map(v => v.toDouble * v.toDouble).sum)
        math.floor(r6(dot / (nq * ncs)) * 1e6 + 0.5).toLong
      }
      assert(r.getAs[Long]("mean_cos_ppm") == ppms.sum / n)
      assert(r.getAs[Long]("min_cos_ppm") == ppms.min)
      // cohesion sanity: members point at their own centroid
      assert(r.getAs[Long]("mean_cos_ppm") > 0)
    }
  }

  test("ann_lsh recall: bucketed neighbours are a subset of brute-force candidates") {
    val ann = Similarity.annLsh(spark, sf).collect()
    assert(ann.forall(r => r.getAs[Long]("rk") <= 5))
    // every ANN hit must score no better than the true top-1
    val best = Similarity.cosineTopK(spark, sf).collect()
      .filter(_.getAs[Long]("rk") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("cos6")).toMap
    assert(ann.filter(_.getAs[Long]("rk") == 1).forall { r =>
      r.getAs[Double]("cos6") <= best(r.getAs[Long]("q_id"))
    })
  }

  test("ann_lsh recall vs brute-force top-5 stays above the floor") {
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val bf = pairs(Similarity.cosineTopK(spark, sf))
    val ann = pairs(Similarity.annLsh(spark, sf))
    val recall = (bf intersect ann).size.toDouble / bf.size
    // 16 bands × 4 planes with query-side 1-bit multi-probe: measured
    // 1.00 at sf0.001/0.01/0.1; fail the build if params degrade
    assert(recall >= 0.9, s"ann_lsh recall $recall below floor 0.9")
  }

  test("ann_ivf returns 5 valid ranked neighbours per query, recall above floor") {
    val ivf = Similarity.annIvf(spark, sf).collect()
    val byQ = ivf.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val bf = pairs(Similarity.cosineTopK(spark, sf).collect())
    val recall = (bf intersect pairs(ivf)).size.toDouble / bf.size
    // 4 of 16 probed lists + top-2 index multi-assignment: measured
    // 0.92-0.96 at sf0.001/0.01/0.1; fail the build if params degrade
    assert(recall >= 0.85, s"ann_ivf recall $recall below floor 0.85")
  }

  test("ann_exact_rerank: 5 ranked rows per query off the probed union, recall above floor") {
    val got = VectorIndexStore.annExactRerank(spark, sf).collect()
    val byQ = got.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val bf = pairs(Similarity.cosineTopK(spark, sf).collect())
    val recall = (bf intersect pairs(got)).size.toDouble / bf.size
    // exact re-rank can only miss what the 4 probed lists miss — the
    // same probe mass as ann_ivf, so the same floor applies
    assert(recall >= 0.85, s"ann_exact_rerank recall $recall below floor 0.85")
  }

  test("probe_recall_stats: consistent counts; probing every list is exact by law") {
    val got = VectorIndexStore.probeRecallStats(spark, sf).collect()
    assert(got.length == 20)
    got.foreach { r =>
      val nExact = r.getAs[Long]("n_exact")
      val nHit = r.getAs[Long]("n_hit")
      assert(nExact == 10L)
      assert(nHit >= 0L && nHit <= nExact)
      assert(r.getAs[Long]("n_cand") >= nHit)
      assert(r.getAs[Long]("recall_ppm") == 1000000L * nHit / nExact)
    }
    // the observable must agree with what the recall specs pin: the
    // 4-probe path keeps most of the exact top-10 on this corpus
    val mean = got.map(_.getAs[Long]("recall_ppm")).sum / got.length
    assert(mean >= 600000L, s"mean probe recall $mean ppm below floor")
    // LAW, not floor: probing every list makes the candidate union the
    // whole corpus (minus self), so probe top-k == exact top-k exactly
    val full = VectorIndexStore.probeRecallStats(spark, sf, nprobe = 1000000)
      .collect()
    assert(full.length == 20)
    full.foreach { r =>
      assert(r.getAs[Long]("n_hit") == r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("recall_ppm") == 1000000L)
    }
  }

  test("ann_ivf_pq returns 5 valid ranked neighbours per query, recall above floor") {
    val pq = Similarity.annIvfPq(spark, sf).collect()
    val byQ = pq.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val bf = pairs(Similarity.cosineTopK(spark, sf).collect())
    val recall = (bf intersect pairs(pq)).size.toDouble / bf.size
    // ADC shortlisting (8×32 codes, rerank 100) inside the same 4-of-16
    // probed lists: measured 0.90-0.92 at sf0.001/0.01 — the same range
    // as full-vector ann_ivf, from 8 code bytes per vector
    assert(recall >= 0.85, s"ann_ivf_pq recall $recall below floor 0.85")
    // and the exact re-rank means every returned cos6 is the TRUE cosine:
    // scores must match ann_ivf's wherever the same pair appears
    val ivfScores = Similarity.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) -> r.getAs[Double]("cos6"))
      .toMap
    pq.foreach { r =>
      val key = (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))
      ivfScores.get(key).foreach(s => assert(s == r.getAs[Double]("cos6")))
    }
  }

  test("ann_ivf_pq serves an id-shifted corpus (no 0..k seed assumption)") {
    import org.apache.spark.sql.functions._
    // ids starting at 1,000,000: seeding by `vec_id < k` would match
    // nothing and silently return an empty index — seeds must be the
    // lowest ids of whatever frame arrives
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val out = Similarity.annIvfPqFrom(emb, emb.filter(col("vec_id") < 1000020L))
      .collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    assert(out.forall(_.getAs[Long]("n_id") >= 1000000L))
  }

  test("persisted IVF-PQ index: loaded results equal built results bit-for-bit") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-idx").toString + "/idx"
    val built = VectorIndexStore.buildIvfPq(emb, base)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    // query through the SAME trained frames still in memory...
    val fromBuilt = rows(Similarity.ivfPqSearch(
      emb.withColumn("norm", Vectors.norm64("embedding")),
      built.centroids, built.lists, built.books, built.codes,
      queries, excludeSelf = true, corpusN = built.n))
    // ...then DROP the catalog entries (what a fresh session looks like:
    // the in-memory catalog is gone, only the files remain) and query
    // from the persisted artifacts alone
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith("graft_idx_"))
      .foreach(t => spark.sql(s"DROP TABLE ${t.name}"))
    val loadedDf = VectorIndexStore.annIvfPqFromIndex(spark, base, emb, queries)
    val fromLoaded = rows(loadedDf)
    assert(fromBuilt.nonEmpty)
    assert(fromLoaded == fromBuilt)
    // and the loaded result is a full valid ANN answer above the recall floor
    val byQ = loadedDf.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    assert(byQ.values.forall(_.map(_.getAs[Long]("rk")).sorted.sameElements(1L to 5L)))
    val bf = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val got = loadedDf.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.85, s"loaded-index recall $recall below floor 0.85")
  }

  test("appendIvfPq equals a frozen-quantizer rebuild bit-for-bit and replays are no-ops") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-append").toString + "/idx"
    // index the first ~80% of the corpus, append the rest as a new crawl
    val cut = 400L
    val old = emb.filter(col("vec_id") < cut)
    val batch = emb.filter(col("vec_id") >= cut)
    assert(batch.count() > 0)
    VectorIndexStore.buildIvfPq(old, base)
    val appended = VectorIndexStore.appendIvfPq(batch, base)
    // expected: the SAME frozen quantizers applied to the full corpus
    val full = emb.withColumn("norm", Vectors.norm64("embedding"))
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val fromAppended = rows(Similarity.ivfPqSearch(full,
      appended.centroids, appended.lists, appended.books, appended.codes,
      queries, excludeSelf = true, corpusN = appended.n))
    val fromRebuilt = rows(Similarity.ivfPqSearch(full,
      appended.centroids,
      Similarity.ivfMultiIndex(full, appended.centroids, assign = 2),
      appended.books,
      Similarity.pqEncode(full, appended.books),
      queries, excludeSelf = true, corpusN = appended.n))
    assert(fromAppended.nonEmpty)
    assert(fromAppended == fromRebuilt)
    // neighbours from BOTH sides of the cut surface (the append is live)
    val nids = Similarity.ivfPqSearch(full, appended.centroids,
      appended.lists, appended.books, appended.codes, queries,
      excludeSelf = true, corpusN = appended.n)
      .collect().map(_.getAs[Long]("n_id"))
    assert(nids.exists(_ >= cut) && nids.exists(_ < cut))
    // idempotence: a REPLAYED append (the retried-partial-failure case)
    // inserts nothing — counts and query results are bit-identical
    val nLists = appended.lists.count()
    val nCodes = appended.codes.count()
    val replayed = VectorIndexStore.appendIvfPq(batch, base)
    assert(replayed.lists.count() == nLists,
      "replayed append duplicated list rows")
    assert(replayed.codes.count() == nCodes,
      "replayed append duplicated code rows")
    assert(replayed.n == appended.n)
    val afterReplay = rows(Similarity.ivfPqSearch(full,
      replayed.centroids, replayed.lists, replayed.books, replayed.codes,
      queries, excludeSelf = true, corpusN = replayed.n))
    assert(afterReplay == fromAppended)
  }

  test("index metadata carries the corpus size through build, load, append, and fallback") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    val cut = n / 2
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-meta").toString + "/idx"
    val built = VectorIndexStore.buildIvfPq(emb.filter(col("vec_id") < cut), base)
    assert(built.n == cut)
    assert(VectorIndexStore.loadIvfPq(spark, base).n == cut)
    // append advances the metadata count by the batch size — no recount
    val appended = VectorIndexStore.appendIvfPq(
      emb.filter(col("vec_id") >= cut), base)
    assert(appended.n == n)
    assert(VectorIndexStore.loadIvfPq(spark, base).n == n)
    // a pre-metadata index (meta/ absent) falls back to one count at load
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/meta"), true)
    assert(VectorIndexStore.loadIvfPq(spark, base).n == n)
  }

  test("deleteIvfPq tombstones: delete==rebuild-without, deleted ids resist re-append, compact resurrects") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val n = emb.count()
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-del").toString + "/idx"
    VectorIndexStore.buildIvfPq(emb, base)
    val delIds = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select("vec_id")
    val nDel = delIds.count()
    val deleted = VectorIndexStore.deleteIvfPq(delIds, base)
    // meta n tracks the LIVE corpus after a delete
    assert(deleted.n == n - nDel)
    // delete-then-query == frozen-quantizer rebuild over the survivors
    val queries = emb.filter(col("vec_id") < 20)
    val survivors = emb.filter(col("vec_id") < 100 || col("vec_id") >= 150)
      .withColumn("norm", Vectors.norm64("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val fromDeleted = rows(Similarity.ivfPqSearch(survivors,
      deleted.centroids, deleted.lists, deleted.books, deleted.codes,
      queries, excludeSelf = true, corpusN = deleted.n))
    val fromRebuilt = rows(Similarity.ivfPqSearch(survivors,
      deleted.centroids,
      Similarity.ivfMultiIndex(survivors, deleted.centroids, assign = 2),
      deleted.books,
      Similarity.pqEncode(survivors, deleted.books),
      queries, excludeSelf = true, corpusN = deleted.n))
    assert(fromDeleted.nonEmpty)
    assert(fromDeleted == fromRebuilt)
    // no deleted id appears in any answer
    assert(!Similarity.ivfPqSearch(survivors, deleted.centroids,
      deleted.lists, deleted.books, deleted.codes, queries,
      excludeSelf = true, corpusN = deleted.n)
      .collect().map(_.getAs[Long]("n_id"))
      .exists(id => id >= 100 && id < 150))
    // delete is idempotent
    assert(VectorIndexStore.deleteIvfPq(delIds, base).n == n - nDel)
    // re-appending a DELETED id is a no-op: its physical rows still
    // exist, so append's physical-keyed anti-join skips it — no dup
    // physical rows, and the live view still hides it
    val codesTable = "graft_idx_" +
      graft.core.IndexScratch.md5hex(base).take(10) + "_codes"
    val physCodesBefore = spark.table(codesTable).count()
    val reAppended = VectorIndexStore.appendIvfPq(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150), base)
    assert(reAppended.n == n - nDel, "append-after-delete inflated live n")
    assert(reAppended.codes.count() == n - nDel)
    val physCodesAfter = spark.table(codesTable).count()
    assert(physCodesAfter == physCodesBefore,
      "append-after-delete inserted duplicate physical rows")
    // compact folds tombstones into storage: query results unchanged
    val compacted = VectorIndexStore.compactIvfPq(spark, base)
    assert(compacted.n == n - nDel)
    val fromCompacted = rows(Similarity.ivfPqSearch(survivors,
      compacted.centroids, compacted.lists, compacted.books, compacted.codes,
      queries, excludeSelf = true, corpusN = compacted.n))
    assert(fromCompacted == fromDeleted)
    // after compaction the ids are physically absent → append resurrects
    val resurrected = VectorIndexStore.appendIvfPq(
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 150), base)
    assert(resurrected.n == n)
    assert(resurrected.codes.count() == n)
  }

  test("crawlSyncVectors applies the upstream diff: vanished delete, new append, replay no-op") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-sync").toString + "/idx"
    // crawl 1: ids [0, 400); crawl 2: ids [100, 500) — 100 vanish, 100 new
    VectorIndexStore.buildIvfPq(emb.filter(col("vec_id") < 400), base)
    val upstream = emb.filter(col("vec_id") >= 100)
    val (nNew, nDeleted) =
      VectorIndexStore.crawlSyncVectors(spark, base, upstream)
    assert(nNew == 100 && nDeleted == 100)
    val idx = VectorIndexStore.loadIvfPq(spark, base)
    assert(idx.n == 400)
    // synced index answers EXACTLY like the frozen-quantizer reference
    // over the upstream corpus
    val up = upstream.withColumn("norm", Vectors.norm64("embedding"))
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val fromSynced = rows(Similarity.ivfPqSearch(up, idx.centroids,
      idx.lists, idx.books, idx.codes, queries,
      excludeSelf = true, corpusN = idx.n))
    val fromReference = rows(Similarity.ivfPqSearch(up, idx.centroids,
      Similarity.ivfMultiIndex(up, idx.centroids, assign = 2),
      idx.books, Similarity.pqEncode(up, idx.books), queries,
      excludeSelf = true, corpusN = idx.n))
    assert(fromSynced.nonEmpty && fromSynced == fromReference)
    // replayed cycle is a no-op
    assert(VectorIndexStore.crawlSyncVectors(spark, base, upstream) == ((0L, 0L)))
    assert(VectorIndexStore.loadIvfPq(spark, base).n == 400)
  }

  test("indexStats reports list sizes, shares, and balance over the persisted index") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = java.nio.file.Files
      .createTempDirectory("graft-ivfpq-stats").toString + "/idx"
    VectorIndexStore.buildIvfPq(emb, base)
    val rows = VectorIndexStore.indexStats(spark, base).collect()
    val n = emb.count()
    // top-2 multi-assignment: exactly 2n index rows across all lists
    assert(rows.map(_.getAs[Long]("list_size")).sum == 2 * n)
    assert(rows.map(_.getAs[Int]("cid")).distinct.length == rows.length)
    val skew = rows.head.getAs[Long]("skew_ppm")
    assert(rows.forall(_.getAs[Long]("skew_ppm") == skew), "skew is a corpus constant")
    assert(skew >= 1000000L, "skew_ppm floors at the balanced 1e6")
    // shares are ppm of the index rows
    val shares = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(shares > 1000000L - rows.length && shares <= 1000000L)
  }

  test("persisted IVF-PQ query plan reads bucketed index scans and never retrains") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val base = graft.core.IndexScratch.scratchBase(sf, "ivfpq-planspec")
    graft.core.IndexScratch.ensureBuilt(base,
      graft.core.IndexScratch.sourceFingerprint(spark, s"$sf/embeddings.parquet")) {
      VectorIndexStore.buildIvfPq(emb, base)
    }
    val plan = VectorIndexStore
      .annIvfPqFromIndex(spark, base, emb, emb.filter(col("vec_id") < 20))
      .queryExecution.executedPlan.toString
    // the inverted lists and the code frame come back as BUCKETED scans
    // (the whole point of writing them through the bucketed sink)...
    assert("SelectedBucketsCount".r.findAllIn(plan).length >= 2,
      "expected bucketed scans for lists and codes")
    // ...and no Lloyd round survives into the query plan: training is
    // load-time-zero, which is what 'persisted index' means
    assert(!plan.contains("vec_sum"), "loaded path re-runs centroid training")
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("in-place source regeneration rebuilds the persisted index (no stale artifacts)") {
    import org.apache.spark.sql.functions._
    // a corpus directory the test owns, indexed via the query-entry form
    val dir = java.nio.file.Files.createTempDirectory("graft-regen").toString
    def writeCorpus(extraIdsFrom: Long): Unit =
      spark.range(0, 20).select(col("id").as("vec_id"))
        .union(spark.range(extraIdsFrom, extraIdsFrom + 60)
          .select(col("id").as("vec_id")))
        .withColumn("embedding", expr(
          "transform(sequence(1, 64), j -> CAST(pmod(xxhash64(vec_id, j), 97) / 97.0 AS FLOAT))"))
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    try {
      writeCorpus(100L)
      val r1 = VectorIndexStore.annIvfPqIndexed(spark, dir).collect()
      assert(r1.nonEmpty && r1.exists(_.getAs[Long]("n_id") >= 100L))
      // regenerate IN PLACE with a disjoint non-query id space: a stale
      // index only knows ids 100-159, whose candidates cannot survive
      // the re-rank join against the new corpus — neighbors >= 1000
      // prove the store rebuilt from the regenerated source
      writeCorpus(1000L)
      val r2 = VectorIndexStore.annIvfPqIndexed(spark, dir).collect()
      assert(r2.nonEmpty, "regenerated corpus returned no neighbors")
      assert(r2.exists(_.getAs[Long]("n_id") >= 1000L),
        "index served stale artifacts after the source was regenerated")
      assert(r2.forall(r => r.getAs[Long]("n_id") < 100L ||
        r.getAs[Long]("n_id") >= 1000L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("embed_qc covers every vector; clean corpus raises no flags") {
    val rows = Similarity.embedQc(spark, sf).collect()
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("dim") == 64L)
      assert(r.getAs[Double]("norm6") > 0)
      assert(r.getAs[Int]("flag_nonfinite") == 0)
      assert(r.getAs[Int]("flag_zero") == 0)
      assert(r.getAs[Int]("flag_dim") == 0)
    }
  }

  test("annLshFrom and annIvfFrom serve an arbitrary non-prefix query frame") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") % 50 === 7)
    val qids = queries.collect().map(_.getAs[Long]("vec_id")).toSet
    assert(qids.nonEmpty && qids.exists(_ >= 20))
    // driver-side brute-force top-5 for exactly that query set
    val vecs = emb.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / math.sqrt(na * nb)
    }
    val bf = (for ((qid, qv) <- vecs if qids(qid)) yield {
      val top = vecs.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, cos(qv, nv)) }
        .sortBy { case (nid, c) => (-c, nid) }.take(5).map(_._1).toSet
      qid -> top
    }).toMap
    def check(df: org.apache.spark.sql.DataFrame, floor: Double, name: String): Unit = {
      val rows = df.collect()
      assert(rows.map(_.getAs[Long]("q_id")).toSet == qids, s"$name query set")
      val hit = rows.count(r => bf(r.getAs[Long]("q_id")).contains(r.getAs[Long]("n_id")))
      val recall = hit.toDouble / (5.0 * qids.size)
      assert(recall >= floor, s"$name recall $recall below $floor")
    }
    // the exact baseline entry point must agree with the driver-side
    // brute force EXACTLY on the same query frame
    check(Similarity.cosineTopKFrom(emb, queries), 1.0, "cosineTopKFrom")
    // this test pins the API (arbitrary query frames are served), not a
    // new recall guarantee — at 10 queries each missed neighbour costs
    // 2 recall points, so the IVF floor sits below the 0.85 the
    // canonical 20-query test enforces (measured 0.74 here: boundary
    // queries whose neighbours sit past the nProbe=4 probed lists)
    check(Similarity.annLshFrom(emb, queries), 0.9, "annLshFrom")
    check(Similarity.annIvfFrom(emb, queries), 0.7, "annIvfFrom")
    // EXTERNAL query frame (ids disjoint from the corpus id space):
    // with excludeSelf = false the corpus copy of each query vector
    // surfaces as its own top-1 at cosine 1.0 — nothing is excluded by
    // id, which is exactly the contract external frames need
    val external = queries.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val ext = Similarity.cosineTopKFrom(emb, external, excludeSelf = false).collect()
    val top1 = ext.filter(_.getAs[Long]("rk") == 1L)
    assert(top1.map(_.getAs[Long]("q_id")).toSet == qids.map(_ + 100000L))
    top1.foreach { r =>
      assert(r.getAs[Long]("n_id") == r.getAs[Long]("q_id") - 100000L)
      assert(r.getAs[Double]("cos6") == 1.0)
    }
  }

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private def dotd(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var k = 0
    while (k < a.length) { s += a(k).toDouble * b(k).toDouble; k += 1 }
    s
  }

  test("hard_negatives matches a driver recompute: different label, dup ceiling, top-8") {
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1), r.getAs[Int]("label")))
    val norms = embs.map { case (id, v, _) => id -> math.sqrt(dotd(v, v)) }.toMap
    val expected = embs.filter(_._1 < 20).flatMap { case (q, qv, ql) =>
      embs.filter { case (n, _, nl) => n != q && nl != ql }
        .map { case (n, nv, _) => (q, n, r6(dotd(qv, nv) / (norms(q) * norms(n)))) }
        .filter(_._3 < 0.995)
        .sortBy { case (_, n, c) => (-c, n) }
        .take(8).zipWithIndex
        .map { case ((qq, n, c), i) => (qq, n, c, (i + 1).toLong) }
    }.toSet
    val got = Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neg_id"),
        r.getAs[Double]("cos6"), r.getAs[Long]("rk"))).toSet
    assert(got == expected)
    // no negative ever shares the query's label (the contrastive contract)
    val labels = embs.map(e => e._1 -> e._3).toMap
    got.foreach { case (q, n, c, _) =>
      assert(labels(q) != labels(n)); assert(c < 0.995)
    }
  }

  test("hard_negatives_indexed matches a driver replay of the probe path + filters") {
    val base = VectorIndexStore.ensureIvfPq(spark, sf)
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> ((r.getSeq[Float](1), r.getAs[Int]("label")))).toMap
    val norms = embs.map { case (id, (v, _)) => id -> math.sqrt(dotd(v, v)) }
    val cents = spark.read.parquet(s"$base/centroids")
      .select("cid", "cvec", "cnorm").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1), r.getAs[Double]("cnorm")))
    val lists = spark.read.parquet(s"$base/lists")
      .select("cid", "vec_id").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val expected = embs.keys.filter(_ < 20).toSeq.sorted.flatMap { qid =>
      val (qv, ql) = embs(qid)
      val probedC = cents
        .map { case (cid, cv, cn) => (cid, r6(dotd(qv, cv) / (norms(qid) * cn))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(4).map(_._1)
      probedC.flatMap(c => lists.getOrElse(c, Set.empty)).distinct
        .filter(n => n != qid && embs(n)._2 != ql)
        .map(n => (n, r6(dotd(qv, embs(n)._1) / (norms(qid) * norms(n)))))
        .filter(_._2 < 0.995)
        .sortBy { case (n, c) => (-c, n) }.take(8).zipWithIndex
        .map { case ((n, c), i) => (qid, n, c, (i + 1).toLong) }
    }.toSet
    val got = VectorIndexStore.hardNegativesIndexed(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neg_id"),
        r.getAs[Double]("cos6"), r.getAs[Long]("rk"))).toSet
    assert(got == expected)
    // recall vs the exact full-scan miner: probed lists cover most of
    // the true hard-negative set at this corpus scale
    val exact = Similarity.hardNegatives(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neg_id"))).toSet
    val hit = got.count { case (q, n, _, _) => exact((q, n)) }
    assert(hit.toDouble / exact.size >= 0.5,
      s"indexed hard-negative recall ${hit.toDouble / exact.size} below floor")
  }

  test("triplet_mine pairs each anchor's best positive with its best hard negative") {
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1), r.getAs[Int]("label")))
    val norms = embs.map { case (id, v, _) => id -> math.sqrt(dotd(v, v)) }.toMap
    def best(q: Long, qv: Seq[Float], keep: ((Long, Int)) => Boolean): Option[(Long, Double)] =
      embs.filter { case (n, _, nl) => n != q && keep((n, nl)) }
        .map { case (n, nv, _) => (n, r6(dotd(qv, nv) / (norms(q) * norms(n)))) }
        .sortBy { case (n, c) => (-c, n) }.headOption
    val expected = embs.filter(_._1 < 20).flatMap { case (q, qv, ql) =>
      val pos = best(q, qv, { case (_, nl) => nl == ql })
      // the negative must also clear the near-dup ceiling
      val negC = embs.filter { case (n, _, nl) => n != q && nl != ql }
        .map { case (n, nv, _) => (n, r6(dotd(qv, nv) / (norms(q) * norms(n)))) }
        .filter(_._2 < 0.995)
        .sortBy { case (n, c) => (-c, n) }.headOption
      (pos, negC) match {
        case (Some((p, pc)), Some((n, nc))) =>
          Some((q, p, pc, n, nc, r6(pc - nc)))
        case _ => None
      }
    }.toSet
    val got = Similarity.tripletMine(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("pos_id"),
        r.getAs[Double]("pos_cos6"), r.getAs[Long]("neg_id"),
        r.getAs[Double]("neg_cos6"), r.getAs[Double]("margin6"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("probe-path candidates never include tombstoned vectors") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-probe-tomb").toString + "/idx"
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    VectorIndexStore.buildIvfPq(emb, base)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
      .withColumn("norm", graft.sim.Vectors.norm64("embedding"))
    val before = VectorIndexStore.probeCandidates(spark, base, q, nprobe = 4)
      .collect().map(r => r.getAs[Long]("cand_id")).toSet
    assert(before.nonEmpty)
    val victim = before.max
    val sql = spark.sqlContext
    import sql.implicits._
    VectorIndexStore.deleteIvfPq(Seq(victim).toDF("vec_id"), base)
    val after = VectorIndexStore.probeCandidates(spark, base, q, nprobe = 4)
      .collect().map(r => r.getAs[Long]("cand_id")).toSet
    // the deleted vector vanished from every consumer's candidate set
    // (annExactRerank / hardNegativesIndexed / bitextMine all route
    // through probeCandidates) and nothing else changed
    assert(!after.contains(victim))
    assert(after == before - victim)
  }

  test("bitext_mine matches a driver replay of the probe path and integer margins") {
    val base = VectorIndexStore.ensureIvfPq(spark, sf)
    val langOf = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val norms = embs.map { case (id, v) => id -> math.sqrt(dotd(v, v)) }
    val cents = spark.read.parquet(s"$base/centroids")
      .select("cid", "cvec", "cnorm").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1), r.getAs[Double]("cnorm")))
    val lists = spark.read.parquet(s"$base/lists")
      .select("cid", "vec_id").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val srcIds = embs.keys.filter(langOf(_) == "de").toSeq.sorted
    // probe replay: top-4 centroids per src by rounded cosine, cid asc
    val cands = srcIds.flatMap { q =>
      val probed = cents
        .map { case (cid, cv, cn) => (cid, r6(dotd(embs(q), cv) / (norms(q) * cn))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(4).map(_._1)
      probed.flatMap(c => lists.getOrElse(c, Set.empty)).distinct
        .filter(n => n != q && langOf(n) == "en").map(n => (q, n))
    }.distinct
    val c6i = cands.map { case (q, n) =>
      (q, n) -> math.floor(r6(dotd(embs(q), embs(n)) / (norms(q) * norms(n))) * 1e6 + 0.5).toLong
    }.toMap
    def kSum(group: Map[Long, Seq[(Long, Long)]]): Map[Long, (Long, Long)] =
      group.map { case (id, xs) =>
        val top = xs.sortBy { case (o, c) => (-c, o) }.take(4)
        id -> (top.map(_._2).sum, top.length.toLong)
      }
    val bySrc = kSum(cands.map { case (q, n) => (q, (n, c6i((q, n)))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
    val byTgt = kSum(cands.map { case (q, n) => (n, (q, c6i((q, n)))) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) })
    val margin = cands.map { case (q, n) =>
      val (sa, na) = bySrc(q); val (sb, nb) = byTgt(n)
      (q, n) -> r6(2.0 * c6i((q, n)) * na * nb / (sa * nb + sb * na))
    }.toMap
    val bestS = cands.groupBy(_._1).map { case (q, xs) =>
      q -> xs.map(_._2).minBy(n => (-margin((q, n)), n))
    }
    val bestT = cands.groupBy(_._2).map { case (n, xs) =>
      n -> xs.map(_._1).minBy(q => (-margin((q, n)), q))
    }
    val expected = bestS.map { case (q, n) =>
      (q, n, r6(c6i((q, n)) / 1e6), margin((q, n)),
        if (bestT(n) == q) 1 else 0)
    }.toSet
    val got = graft.sim.VectorIndexStore.bitextMine(spark, sf).collect()
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("tgt_id"),
        r.getAs[Double]("cos6"), r.getAs[Double]("margin6"),
        r.getAs[Int]("mutual"))).toSet
    assert(got == expected)
    // structural contract: one best match per src doc that had candidates
    assert(got.map(_._1).size == got.size)
    assert(got.nonEmpty && got.exists(_._5 == 1))
  }

  test("triplet_mine_indexed matches a probe replay; recall floor vs the exact miner") {
    val base = VectorIndexStore.ensureIvfPq(spark, sf)
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> ((r.getSeq[Float](1), r.getAs[Int]("label")))).toMap
    val norms = embs.map { case (id, (v, _)) => id -> math.sqrt(dotd(v, v)) }
    val cents = spark.read.parquet(s"$base/centroids")
      .select("cid", "cvec", "cnorm").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1), r.getAs[Double]("cnorm")))
    val lists = spark.read.parquet(s"$base/lists")
      .select("cid", "vec_id").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val expected = embs.keys.filter(_ < 20).toSeq.sorted.flatMap { qid =>
      val (qv, ql) = embs(qid)
      val probedC = cents
        .map { case (cid, cv, cn) => (cid, r6(dotd(qv, cv) / (norms(qid) * cn))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(4).map(_._1)
      val cand = probedC.flatMap(c => lists.getOrElse(c, Set.empty)).distinct
        .filter(_ != qid)
        .map(n => (n, embs(n)._2, r6(dotd(qv, embs(n)._1) / (norms(qid) * norms(n)))))
      val pos = cand.filter(_._2 == ql)
        .sortBy { case (n, _, c) => (-c, n) }.headOption
      val neg = cand.filter { case (_, nl, c) => nl != ql && c < 0.995 }
        .sortBy { case (n, _, c) => (-c, n) }.headOption
      (pos, neg) match {
        case (Some((p, _, pc)), Some((n, _, nc))) =>
          Some((qid, p, pc, n, nc, r6(pc - nc)))
        case _ => None
      }
    }.toSet
    val got = VectorIndexStore.tripletMineIndexed(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("pos_id"),
        r.getAs[Double]("pos_cos6"), r.getAs[Long]("neg_id"),
        r.getAs[Double]("neg_cos6"), r.getAs[Double]("margin6"))).toSet
    assert(got == expected)
    // recall floor vs the exact full-scan miner: the probed lists must
    // keep most anchors minable and mostly agree on the mined triplet
    val exact = Similarity.tripletMine(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("pos_id"),
        r.getAs[Long]("neg_id"))).toSet
    assert(got.size.toDouble / exact.size >= 0.5,
      s"indexed miner covered ${got.size} of ${exact.size} anchors")
    val agree = got.count(t => exact((t._1, t._2, t._4)))
    assert(agree.toDouble / exact.size >= 0.3,
      s"only $agree of ${exact.size} exact triplets re-mined from the index")
  }

  test("ann_adc_rerank matches a driver replay of persisted PQ scoring") {
    val base = VectorIndexStore.ensureIvfPq(spark, sf)
    val embs = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1)).toMap
    val norms = embs.map { case (id, v) => id -> math.sqrt(dotd(v, v)) }
    val cents = spark.read.parquet(s"$base/centroids")
      .select("cid", "cvec", "cnorm").collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1), r.getAs[Double]("cnorm")))
    val lists = spark.read.parquet(s"$base/lists")
      .select("cid", "vec_id").collect()
      .map(r => (r.getAs[Int]("cid"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val books = spark.read.parquet(s"$base/books")
      .select("sub", "code", "cv").collect()
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")) -> r.getSeq[Float](2)).toMap
    val codes = spark.read.parquet(s"$base/codes")
      .select("vec_id", "codes").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Int](1)).toMap
    // unit vector exactly as the serving path computes it: float/double
    // division cast back to float per element
    def unit(id: Long): Seq[Float] = embs(id).map(x => (x / norms(id)).toFloat)
    val expected = embs.keys.filter(_ < 20).toSeq.sorted.flatMap { qid =>
      val probedC = cents
        .map { case (cid, cv, cn) => (cid, r6(dotd(embs(qid), cv) / (norms(qid) * cn))) }
        .sortBy { case (cid, c) => (-c, cid) }.take(4).map(_._1)
      val u = unit(qid)
      val lut = (0 until 8).flatMap { s =>
        val qsv = u.slice(s * 8, s * 8 + 8)
        (0 until 32).flatMap(c => books.get((s, c)).map(cv => (s, c) -> dotd(qsv, cv)))
      }.toMap
      probedC.flatMap(c => lists.getOrElse(c, Set.empty)).distinct
        .filter(_ != qid)
        .map { n =>
          val adc = (0 until 8).foldLeft(0.0)((acc, s) => acc + lut((s, codes(n)(s))))
          (n, r6(adc))
        }
        .sortBy { case (n, a) => (-a, n) }.take(10).zipWithIndex
        .map { case ((n, a), i) => (qid, n, a, (i + 1).toLong) }
    }.toSet
    val got = VectorIndexStore.annAdcRerank(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Double]("adc6"), r.getAs[Long]("rk"))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("embed_drift_stats: one row per frozen centroid, shares account for both corpora") {
    val rows = VectorIndexStore.embedDriftStats(spark, sf).collect()
    val base = VectorIndexStore.ensureSyncedVindex(spark, sf)
    val nCents = spark.read.parquet(s"$base/centroids").count()
    assert(rows.length.toLong == nCents)
    // integer-floor shares of each corpus sum to ≤ 1e6 and within one
    // rounding step per centroid of it
    val bs = rows.map(_.getAs[Long]("build_share_ppm")).sum
    val ns = rows.map(_.getAs[Long]("new_share_ppm")).sum
    assert(bs <= 1000000L && bs > 1000000L - nCents)
    assert(ns <= 1000000L && ns > 1000000L - nCents)
    rows.foreach { r =>
      // the flag must fire on an abandoned/saturated centroid
      if (r.getAs[Long]("n_new") == 0L || r.getAs[Long]("n_build") == 0L)
        assert(r.getAs[Int]("drift_flag") == 1)
      // shift is the |difference| of the two shares by construction
      assert(r.getAs[Long]("shift_ppm") ==
        math.abs(r.getAs[Long]("new_share_ppm") - r.getAs[Long]("build_share_ppm")))
      // mean member cosine is a valid micro-unit cosine (or -1 sentinel)
      Seq("build_mean_cos_ppm", "new_mean_cos_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v == -1L || (v >= -1000000L && v <= 1000000L))
      }
    }
  }

  test("vindex_sync converges the stale index: every diff class repaired") {
    val base = VectorIndexStore.ensureSyncedVindex(spark, sf)
    val upstream = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val idx = VectorIndexStore.loadIvfPq(spark, base)
    val codeIds = idx.codes.select("vec_id").collect().map(_.getLong(0)).toSet
    val listIds = idx.lists.select("vec_id").collect().map(_.getLong(0)).toSet
    // appended: the deliberately-missing seventh is back; deleted: no
    // phantom id survives; and the compacted artifact carries no
    // tombstone view — the raw parquet IS the live set
    assert(codeIds == upstream)
    assert(listIds == upstream)
    assert(!graft.core.IndexScratch.pathExists(spark, s"$base/tombstones"))
    assert(idx.n == upstream.size)
    // the gauge aggregates exactly the live membership
    val gauge = VectorIndexStore.vindexSync(spark, sf).collect()
    assert(gauge.map(_.getAs[Long]("n_members")).sum == 2L * upstream.size)
  }

  test("lsh bucket keys are collision-free over all 256 (band, code) inputs") {
    // the ann_lsh oracle joins candidates on (band, code) instead of the
    // hashed bucket key; that is equivalent iff no two of the 16 bands ×
    // 16 codes hash to the same bucket — a FIXED, enumerable property of
    // the engine's xxhash64 chain, pinned here
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val buckets = for (b <- 0 until 16; code <- 0 until 16)
      yield XXH64.hashInt(code, XXH64.hashInt(b, 42L))
    assert(buckets.distinct.size == 256)
  }

  test("quantized Lloyd training is partition-order independent (hash-gate prerequisite)") {
    // the property the training-replay oracles rest on: with the
    // micro-unit integer mean, centroids/books/codes are pure functions
    // of the corpus CONTENT — any partitioning folds to the same bits
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    def normed(parts: Int) = emb.repartition(parts)
      .withColumn("norm", Vectors.norm64("embedding"))
    def cents(parts: Int) = Similarity.ivfCentroids(normed(parts), k = 16)
      .collect()
      .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](1).toVector,
        r.getAs[Double]("cnorm")))
      .sortBy(_._1).toVector
    assert(cents(3) == cents(13))
    def pq(parts: Int) = {
      val (books, codes) = Similarity.pqTrain(normed(parts))
      (books.collect()
        .map(r => ((r.getAs[Int]("sub"), r.getAs[Int]("code")),
          r.getSeq[Float](2).toVector)).sortBy(_._1).toVector,
        codes.collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Int](1).toVector))
          .sortBy(_._1).toVector)
    }
    val (b1, c1) = pq(3)
    val (b2, c2) = pq(13)
    assert(b1 == b2)
    assert(c1 == c2)
  }
}
