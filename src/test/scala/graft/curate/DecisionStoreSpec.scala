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
    // it exists for per-doc audit joins)
    assert(plan.contains("graft-index-v1-decisions"),
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

  test("decision table carries the audit columns the readers share") {
    val cols = DecisionStore.decisionTable(spark, sf).columns.toSet
    assert(Set("doc_id", "q_keep", "rep_flagged", "rare_flagged", "lm_flagged",
      "dedup_keep", "contaminated", "keep", "source", "score").subsetOf(cols))
  }
}
