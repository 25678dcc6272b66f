package graft.curate

import graft.{Pipeline, SparkSpec}

class DecisionStoreSpec extends SparkSpec {

  /** The store readers' load-not-recompute contract: the plan reads the
    * persisted bucketed decision table and NOTHING else — no corpus
    * text scan, no gate machinery (signature hashing, banding, gram
    * sets), no recomputation of any verdict.
    */
  private def assertStorePlan(name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("documents.parquet"),
      s"$name re-scans the corpus text:\n$plan")
    assert(!plan.contains("xxhash64"), s"$name recomputes signatures:\n$plan")
    assert(!plan.contains("minhash_band_buckets"), s"$name re-bands:\n$plan")
    assert(!plan.contains("ngram_hash_set"), s"$name re-plans decontamination:\n$plan")
    // the scan is the persisted decision table (the readers here
    // aggregate, so the doc_id bucket layout is legitimately unused —
    // it exists for per-doc audit joins). Match the scratch location
    // WITHOUT its version segment — the version bumps whenever a store
    // layout changes, and this assertion is about WHICH table is read
    assert(plan.contains("-decisions-"),
      s"$name not reading the persisted decision table:\n$plan")
  }

  test("store-backed curation report equals the per-run report, plan is scan-only") {
    val indexed = DecisionStore.curationReportIndexed(spark, sf)
    val plain = Pipeline.curationReport(spark, sf)
    assert(indexed.columns.sorted.sameElements(plain.columns.sorted))
    val a = indexed.collect().map(_.toString).sorted
    val b = plain.select(indexed.columns.head, indexed.columns.tail: _*)
      .collect().map(_.toString).sorted
    assert(a.nonEmpty && a.sameElements(b))
    assertStorePlan("curationReportIndexed", indexed)
  }

  test("store-backed gate funnel equals the per-run funnel, plan is scan+agg only") {
    val indexed = DecisionStore.gateFunnelIndexed(spark, sf)
    val a = indexed.collect().map(_.toString)
    val b = Pipeline.gateFunnel(spark, sf).collect().map(_.toString)
    assert(a.length == 6 && a.sameElements(b))
    assertStorePlan("gateFunnelIndexed", indexed)
  }

  test("store-backed source reputation equals the per-run scorecard, plan is scan+agg only") {
    val indexed = DecisionStore.sourceReputationIndexed(spark, sf)
    val a = indexed.collect().map(_.toString)
    val b = Pipeline.sourceReputation(spark, sf).collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
    assertStorePlan("sourceReputationIndexed", indexed)
  }

  test("appendDecisions scores a batch against frozen models: split-invariant, replay-safe, old rows immutable") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.documents(spark, sf)
    // a store built over the 80% "old corpus"; the %5 slice plays the
    // new crawl (the dedup_incremental split convention)
    def mkCorpus(): String = {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-decappend").toString
      all.filter(col("doc_id") % 5 =!= 0)
        .write.parquet(s"$tmp/documents.parquet")
      tmp
    }
    val batch = all.filter(col("doc_id") % 5 === 0)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    val dirA = mkCorpus()
    val before = rows(DecisionStore.decisionTable(spark, dirA))
    val oneShot = rows(DecisionStore.appendDecisions(spark, dirA, batch))
    // old rows immutable: the pre-append table is a strict subset
    assert(rows(DecisionStore.decisionTable(spark, dirA)
      .filter(col("doc_id") % 5 =!= 0)) == before)
    // candidates only: every batch id except the eval slice got a row
    val appendedIds = DecisionStore.decisionTable(spark, dirA)
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(appendedIds == batchIds.filter(_ % 97 != 0))
    assert(appendedIds.nonEmpty)

    // split-invariance: the same crawl in two ID-ORDERED chunks lands
    // the identical table (catches any batch-relative statistic)
    val dirB = mkCorpus()
    DecisionStore.appendDecisions(spark, dirB,
      batch.filter(col("doc_id") < 250))
    val twoShot = rows(DecisionStore.appendDecisions(spark, dirB,
      batch.filter(col("doc_id") >= 250)))
    assert(twoShot == oneShot)

    // replay idempotence: re-appending the full batch changes nothing
    assert(rows(DecisionStore.appendDecisions(spark, dirA, batch)) == oneShot)

    // per-doc gates are exactly the per-dir gates on the batch rows,
    // and keep is the AND of the six verdicts
    val appended = DecisionStore.decisionTable(spark, dirA)
      .filter(col("doc_id") % 5 === 0).collect()
    val q = graft.text.TextOps.qualityScoreDocs(batch)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    appended.foreach { r =>
      assert(r.getAs[Int]("q_keep") == q(r.getAs[Long]("doc_id")))
      val expectKeep = (r.getAs[Int]("q_keep") == 1) &&
        (r.getAs[Int]("rep_flagged") == 0) &&
        (r.getAs[Int]("rare_flagged") == 0) &&
        (r.getAs[Int]("lm_flagged") == 0) &&
        (r.getAs[Int]("dedup_keep") == 1) &&
        (r.getAs[Int]("contaminated") == 0)
      assert(r.getAs[Int]("keep") == (if (expectKeep) 1 else 0))
    }
  }

  test("deleteDecisions tombstones rows + dup sources, replay-safe; compact resurrects append") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.documents(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-decdel").toString
    all.filter(col("doc_id") % 5 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val before = rows(DecisionStore.decisionTable(spark, tmp))
    val delCond = col("doc_id") % 5 =!= 0 && col("doc_id") % 7 === 0
    val delIds = all.filter(delCond).select("doc_id")
    val deletedSet = delIds.collect().map(_.getLong(0)).toSet
    val after = DecisionStore.deleteDecisions(delIds, tmp)
    // deleted ids gone; every other row unchanged
    assert(!after.collect().map(_.getAs[Long]("doc_id"))
      .exists(deletedSet.contains))
    assert(rows(after) ==
      before.filterNot(s => deletedSet.exists(id => s.startsWith(s"[$id,"))))
    // the funnel tracks the LIVE corpus
    val n0 = DecisionStore.gateFunnelIndexed(spark, tmp)
      .filter(col("stage_idx") === 1).head().getAs[Long]("n_in")
    assert(n0 == after.count())
    // idempotent; unknown ids are no-ops
    assert(rows(DecisionStore.deleteDecisions(delIds, tmp)) == rows(after))
    // re-appending deleted docs is a no-op (physical rows remain)
    assert(rows(DecisionStore.appendDecisions(spark, tmp,
      all.filter(delCond))) == rows(after))
    // compact, then append: the ids re-enter (scored under frozen models)
    DecisionStore.compactDecisions(spark, tmp)
    val resurrected = DecisionStore.appendDecisions(spark, tmp,
      all.filter(delCond))
    val backIds = resurrected.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(deletedSet.filter(_ % 97 != 0).subsetOf(backIds))
  }

  test("crawlSync classifies the upstream diff into appends and tombstones, replay is a no-op") {
    import org.apache.spark.sql.functions._
    val all = graft.core.Tables.documents(spark, sf)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-crawlsync").toString
    // crawl 1: the %5 != 0 slice
    all.filter(col("doc_id") % 5 =!= 0)
      .write.parquet(s"$tmp/documents.parquet")
    val before = DecisionStore.decisionTable(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // crawl 2: the %3 != 0 slice — some crawl-1 ids vanish (deleted),
    // some ids appear for the first time (new)
    val upstream = all.filter(col("doc_id") % 3 =!= 0)
    val upstreamIds = upstream.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val (nNew, nDeleted) = DecisionStore.crawlSync(spark, tmp, upstream)
    val expectedDeleted = before.filterNot(upstreamIds.contains)
    // new candidates: upstream ids the table lacked, minus the eval slice
    val expectedNew = upstreamIds
      .filterNot(before.contains).filter(_ % 97 != 0)
    assert(nDeleted == expectedDeleted.size.toLong)
    assert(nNew == expectedNew.size.toLong)
    assert(nDeleted > 0 && nNew > 0, "diff slices chose a trivial cycle")
    val after = DecisionStore.decisionTable(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after == (before -- expectedDeleted) ++ expectedNew)
    // replayed cycle: both halves idempotent → (0, 0) and no row churn
    assert(DecisionStore.crawlSync(spark, tmp, upstream) == ((0L, 0L)))
    assert(DecisionStore.decisionTable(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet == after)
  }

  test("frozen-model gate forms equal the per-dir gates on the same corpus") {
    // the decision build keeps using the dir-shaped gates; the append
    // path uses the From-forms with persisted models — pin that a
    // From-form with a model derived from the same docs is
    // value-identical (hash-gate safety for the refactor)
    val docs = graft.core.Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(graft.text.Relevance.rarityScoreFrom(docs,
        graft.text.Relevance.rarityModel(docs))) ==
      rows(graft.text.Relevance.rarityScore(spark, sf)))
    val (p, c) = graft.text.Relevance.lmModel(docs)
    assert(rows(graft.text.Relevance.lmScoreFrom(docs, p, c)) ==
      rows(graft.text.Relevance.lmScore(spark, sf)))
    assert(rows(Curate.decontaminateFrom(docs, Curate.evalGrams(docs))) ==
      rows(Curate.decontaminate(spark, sf)))
  }

  test("decision table carries the audit columns the readers share") {
    val cols = DecisionStore.decisionTable(spark, sf).columns.toSet
    assert(Set("doc_id", "q_keep", "rep_flagged", "rare_flagged", "lm_flagged",
      "dedup_keep", "contaminated", "keep", "source", "score").subsetOf(cols))
  }
}
