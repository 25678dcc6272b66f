package graft.curate

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Pipeline
import graft.core.IndexScratch.{ensureBuilt, scratchBase, sourceFingerprint}
import graft.core.Tables
import graft.sinks.Sinks

/** Persisted curation DECISION TABLE — one decision run, many readers.
  *
  * The decision report (`Pipeline.curationReportFrom`) is the single
  * source of truth for every derived curation view: the survivor
  * manifest filters it, the gate funnel aggregates it, the per-source
  * scorecard groups it. Before this store, each query entry that needed
  * it re-ran the five non-dedup gate scans per call (the dedup gate
  * already loads from `MinhashIndexStore`'s label index) — ~6 s each at
  * sf0.1 and up to 147 s at sf1, three times over, for what is ONE
  * decision table plus three cheap aggregations.
  *
  * This module materializes the WIDE decision row — every gate verdict,
  * the final keep, plus the two audit attributes the scorecard needs
  * (`source`, raw quality `score`) — once per corpus under the shared
  * index-scratch protocol, and serves all three readers from the
  * persisted table: each reader's plan is the bucketed table scan plus
  * its own aggregation, nothing else (spec-pinned: no text scan, no
  * gate machinery). Same freshness contract as the dedup/vector stores:
  * the `_INDEX_OK` marker carries the corpus fingerprint, so in-place
  * regeneration rebuilds transparently and the outputs are
  * value-identical either way (all three entries hash-check against the
  * SAME DuckDB oracles as the per-run paths).
  *
  * 100 TB shape: the decision row is ~40 bytes/doc regardless of doc
  * size, so the table is ~0.04% of the corpus — persisting it once per
  * crawl and reading it per curation question is the same
  * load-not-recompute move the cluster-label index made, one level up
  * the stack. Bucketed by `doc_id` so per-doc audit joins (manifest ×
  * decisions, decisions × new gate columns) read bucket-aligned.
  */
object DecisionStore {

  private val Buckets = 32

  private def tableName(basePath: String): String =
    "graft_decisions_" + graft.core.IndexScratch.md5hex(basePath).take(10)

  /** Build the wide decision table: the full report chain (dedup gate
    * from the persisted label index) plus `source` and quality `score`,
    * each attached by a narrow doc_id join off frames the gate build
    * already pinned — the corpus text is scanned only by the gates
    * themselves, exactly once.
    */
  def build(spark: SparkSession, dir: String, basePath: String): Unit = {
    val g = Pipeline.curateGatesIndexed(spark, dir)
    val wide = Pipeline.curationReportFrom(g)
      .join(Tables.documents(spark, dir).select("doc_id", "source"), "doc_id")
      .join(g.score, "doc_id")
    Sinks.writeBucketed(wide, tableName(basePath), "doc_id",
      Buckets, Some(s"$basePath/decisions"))
  }

  /** Ensure the decision table exists and is fresh; returns its base
    * path (the stores' shared build-if-missing-or-stale protocol).
    */
  def ensureDecisions(spark: SparkSession, dir: String): String = {
    val base = scratchBase(dir, "decisions")
    val fp = sourceFingerprint(spark, s"$dir/documents.parquet")
    ensureBuilt(base, fp) { build(spark, dir, base) }
    base
  }

  /** The persisted decision table for a corpus, built if missing or
    * stale (corpus-fingerprint marker). Wide schema: the report's
    * columns + `source` + `score`.
    */
  def decisionTable(spark: SparkSession, dir: String): DataFrame = {
    val base = ensureDecisions(spark, dir)
    Sinks.restoreBucketed(spark, tableName(base),
      s"$base/decisions", "doc_id", Buckets)
    spark.table(tableName(base))
  }

  /** `Pipeline.curationReport` served from the persisted decision
    * table: the plan is the table scan projected to the report's
    * columns — zero gate machinery (spec-pinned, hash-checked against
    * the same oracle as `curation_report`).
    */
  def curationReportIndexed(spark: SparkSession, dir: String): DataFrame =
    decisionTable(spark, dir).select("doc_id", "contaminated", "q_keep",
      "rep_flagged", "rare_flagged", "lm_flagged", "dedup_keep", "keep")

  /** `Pipeline.gateFunnel` served from the persisted decision table:
    * one aggregation pass over the loaded rows, then the 6-row stage
    * explode — no gate re-runs (hash-checked against the same oracle).
    */
  def gateFunnelIndexed(spark: SparkSession, dir: String): DataFrame =
    Pipeline.gateFunnelFrom(decisionTable(spark, dir))

  /** `Pipeline.sourceReputation` served from the persisted decision
    * table — `source` and `score` are already decision columns, so the
    * plan is the table scan plus the one source-keyed aggregation
    * (hash-checked against the same oracle).
    */
  def sourceReputationIndexed(spark: SparkSession, dir: String): DataFrame =
    Pipeline.sourceReputationFrom(decisionTable(spark, dir))
}
