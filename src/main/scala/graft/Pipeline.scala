package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** End-to-end compositions of the operator library — the two flows a
  * user of the reference actually runs, each as one declarative plan
  * (every stage is an operator documented in SURVEY.md §2; nothing here
  * adds logic, only composition).
  */
object Pipeline {

  /** The reference's main loop — diff sync → extract/enrich → index →
    * chunked batched upsert (sync_service.rs:76-191 → indexing.rs:61-115)
    * — as one batch run: build the wide search documents for every key
    * the diff classifies as new or changed, and write them through the
    * chunked sink as resumable bulk-load units.
    *
    * @return the (key-matched) search documents that were written
    */
  def syncAndIndex(spark: SparkSession, dir: String, outPath: String,
                   chunkSize: Int = 5000,
                   eligible: Option[DataFrame] = None): DataFrame = {
    val diffDirty = graft.sync.Sync.syncDiff(spark, dir)
      .filter(col("status").isin("new", "changed"))
      .select(col("key"))
    // an article held by a worker (non-idle sync state) must not be
    // re-indexed under it — `eligible` is the idle key set from the
    // article-state store; absent means every key is fair game (the
    // reference's trigger_sync without a held set). Narrow + distinct
    // HERE so a caller passing the raw state frame can't leak extra
    // columns into the written search docs or double-write on dup keys
    val dirty = eligible.fold(diffDirty)(e =>
      diffDirty.join(e.select("key").distinct(), "key"))
    // inner join = "index exactly the dirty set"; the search-doc build
    // only aggregates rows that survive the key filter
    val docs = graft.index.Indexing.searchDoc(spark, dir)
      .join(dirty, "key")
    graft.sinks.Sinks.chunkedWrite(docs, "n_name", "key", chunkSize, outPath)
    docs
  }

  /** The admin recovery round-trip (web.rs: `reset_orphaned_articles`
    * then trigger_sync): release every article stuck in a non-idle
    * sync state — the in-place staged-swap write-back
    * (`Maintenance.applyTo`) — then run the sync-and-index cycle gated
    * on the NEW state, so keys the reset just released are indexed in
    * the same round-trip. Returns (rows released, docs indexed). The
    * whole sequence is retry-idempotent: a second run releases 0 rows
    * and rewrites the same chunks (spec-pinned).
    */
  def adminResync(spark: SparkSession, dir: String, statePath: String,
                  outPath: String, nowNs: Long,
                  chunkSize: Int = 5000): (Long, DataFrame) = {
    val released = graft.sync.Maintenance.applyTo(spark, statePath)(
      graft.sync.Maintenance.resetOrphans(_, nowNs))
    val idle = spark.read.parquet(statePath)
      .filter(col("sync_status") === "idle")
      .select("key")
    (released, syncAndIndex(spark, dir, outPath, chunkSize, Some(idle)))
  }

  /** The six per-document gate frames the curation flows share, each
    * narrowed to `(doc_id, verdict)` and pinned by `Materialize.once`:
    * a session that runs BOTH the survivor manifest (`curateCorpusFrom`)
    * and the decision report (`curationReportFrom`) from one
    * `curateGates` value executes each gate's plan — including the
    * expensive minhash+CC dedup chain — exactly once, instead of once
    * per consumer. (The r6 measurement: `curation_report` standalone is
    * ~14 s at sf0.1, ~10 s of it the dedup chain — paying that twice in
    * a composed session was pure waste.)
    */
  final case class CurationGates(quality: DataFrame, repetition: DataFrame,
      rarity: DataFrame, lm: DataFrame, cluster: DataFrame, decon: DataFrame,
      score: DataFrame)

  /** Build (and pin) the gate frames for a corpus — see `CurationGates`. */
  def curateGates(spark: SparkSession, dir: String): CurationGates =
    curateGatesWith(spark, dir, graft.dedup.Dedup.dedupCluster(spark, dir))

  /** `curateGates` with the dedup gate served from the PERSISTED
    * cluster-label index (`MinhashIndexStore.dedupClusterIndexed`)
    * instead of re-running the minhash→banding→CC chain per run — the
    * chain is ~all of the composed report's cost at sf1, and between
    * corpus changes its labels are a loadable artifact. Freshness is
    * fingerprint-checked, so a regenerated corpus rebuilds transparently
    * and the output is value-identical either way (the `curation_report
    * _indexed` entry hash-checks against the SAME oracle as
    * `curation_report`).
    */
  def curateGatesIndexed(spark: SparkSession, dir: String): CurationGates =
    curateGatesWith(spark, dir,
      graft.dedup.MinhashIndexStore.dedupClusterIndexed(spark, dir))

  private def curateGatesWith(spark: SparkSession, dir: String,
      clusterVerdicts: => DataFrame): CurationGates = {
    import graft.core.Materialize.MatOps
    // the gates are independent, and several run DRIVER-SEQUENCED work
    // at construction time (the dedup chain's statistics actions and CC
    // rounds, the lm/rarity model pins and their measured-broadcast
    // counts) — built on one thread those jobs run back-to-back with
    // the session mostly idle. Constructing them from a small thread
    // pool overlaps those independent jobs (the guide's §2.6 move:
    // actions are only sequential because the driver calls them
    // sequentially); each gate's own plan is unchanged. Function
    // registration happens up front so the threads never race the
    // session catalog.
    graft.functions.GraftFunctions.register(spark)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // quality verdict AND raw score off ONE pinned text scan — the
      // report consumes q_keep, the scorecard (sourceReputation)
      // consumes score; splitting them post-materialization keeps the
      // report's output schema unchanged while the corpus text is read
      // once
      val qF = Future(graft.text.TextOps.qualityScore(spark, dir)
        .select(col("doc_id"), col("keep").as("q_keep"), col("score"))
        .materializeOnce(eager = true))
      val repF = Future(graft.curate.Curate.repetitionStats(spark, dir)
        .select(col("doc_id"), col("flagged").as("rep_flagged"))
        .materializeOnce(eager = true))
      val rareF = Future(graft.text.Relevance.rarityScore(spark, dir)
        .select(col("doc_id"), col("flagged").as("rare_flagged"))
        .materializeOnce(eager = true))
      val lmF = Future(graft.text.Relevance.lmScore(spark, dir)
        .select(col("doc_id"), col("flagged").as("lm_flagged"))
        .materializeOnce(eager = true))
      val clusterF = Future(clusterVerdicts
        .select(col("doc_id"), col("keep").as("dedup_keep"))
        .materializeOnce(eager = true))
      val deconF = Future(graft.curate.Curate.decontaminate(spark, dir)
        .select(col("doc_id"), col("contaminated"))
        .materializeOnce(eager = true))
      // one combined await: a failing gate rethrows immediately instead
      // of after every earlier-ordered sibling; the catch interrupts the
      // pool so the surviving gate threads stop submitting Spark jobs
      // into whatever query runs next (pool.shutdown() alone would let
      // them run to completion in the background)
      val all = Future.sequence(Seq(qF, repF, rareF, lmF, clusterF, deconF))
      val Seq(q, rep, rare, lm, cluster, decon) =
        try Await.result(all, Duration.Inf)
        catch { case e: Throwable => pool.shutdownNow(); throw e }
      CurationGates(
        quality = q.select("doc_id", "q_keep"),
        score = q.select("doc_id", "score"),
        repetition = rep,
        rarity = rare,
        lm = lm,
        cluster = cluster,
        decon = decon)
    } finally pool.shutdown()
  }

  /** The full training-corpus curation flow, the published-pipeline
    * stage order (Gopher/RefinedWeb/CCNet-shape): composite quality
    * gate + intra-doc repetition filter + rare-token (rarity) gate +
    * bigram-LM gate (the perplexity-filter stage) → near-dup cluster
    * survivors → benchmark decontamination → token-budget shard
    * packing. Returns one row per surviving doc with its shard
    * assignment — the manifest a shard writer consumes.
    *
    * Each stage's scale shape is its operator's (SURVEY §5); the
    * composition only ever joins narrow doc_id key frames, so the
    * corpus text is scanned by the stages that need it and never
    * shuffled between them.
    */
  def curateCorpus(spark: SparkSession, dir: String): DataFrame =
    curateCorpusFrom(spark, dir, curateGates(spark, dir))

  /** `curateCorpus` over precomputed gate frames — pass the SAME
    * `curateGates` value to this and `curationReportFrom` and the gates
    * run once for the whole session (PipelineSpec proves the composed
    * plans contain no gate machinery, only the pinned frames).
    */
  def curateCorpusFrom(spark: SparkSession, dir: String,
      g: CurationGates): DataFrame = {
    val keep = g.quality.filter(col("q_keep") === 1).select("doc_id")
      .join(g.repetition.filter(col("rep_flagged") === 0).select("doc_id"), "doc_id")
      .join(g.rarity.filter(col("rare_flagged") === 0).select("doc_id"), "doc_id")
      .join(g.lm.filter(col("lm_flagged") === 0).select("doc_id"), "doc_id")
      .join(g.cluster.filter(col("dedup_keep") === 1).select("doc_id"), "doc_id")
      .join(g.decon.filter(col("contaminated") === 0).select("doc_id"), "doc_id")
    graft.curate.Curate.shardPackDocs(
      Tables.documents(spark, dir).select("doc_id", "text").join(keep, "doc_id"))
  }

  /** The per-document curation DECISION TABLE: every gate's verdict side
    * by side plus the final keep — exactly the AND `curateCorpus`
    * computes, but surfaced per doc so a pipeline operator can audit WHY
    * a document dropped (the report every production curation run
    * publishes next to its survivor manifest).
    *
    * Domain contract: one row per CANDIDATE doc — every non-eval doc
    * (eval docs are the benchmark, not corpus candidates; decontaminate
    * defines that split). Gates that cannot assess a doc keep it by
    * convention (the rule `lmScore` documents): repetition needs ≥ 2
    * tokens, so sub-2-token docs LEFT-join it with flagged coalesced to
    * 0 — they still fail `q_keep` (the quality gate dislikes them for
    * better reasons), so the keep set equals `curateCorpus`'s manifest
    * exactly while the report stays TOTAL over candidates.
    *
    * Scale shape: each gate keeps its own operator's plan (SURVEY §5);
    * the composition joins six narrow per-doc flag frames on doc_id —
    * text is scanned by the gates, never shuffled between them.
    */
  def curationReport(spark: SparkSession, dir: String): DataFrame =
    curationReportFrom(curateGates(spark, dir))

  /** `curationReport` over precomputed gate frames (see
    * `curateCorpusFrom` for the sharing contract).
    */
  def curationReportFrom(g: CurationGates): DataFrame = {
    g.decon.join(g.quality, "doc_id")
      .join(g.repetition, Seq("doc_id"), "left").join(g.rarity, "doc_id")
      .join(g.lm, "doc_id").join(g.cluster, "doc_id")
      .withColumn("rep_flagged", coalesce(col("rep_flagged"), lit(0)))
      .withColumn("keep",
        (col("q_keep") === 1 && col("rep_flagged") === 0 &&
          col("rare_flagged") === 0 && col("lm_flagged") === 0 &&
          col("dedup_keep") === 1 && col("contaminated") === 0).cast("int"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive
  }

  /** Gate-attrition FUNNEL — the one-page summary every curation run is
    * judged by: per pipeline stage (published order: quality →
    * repetition → rarity → LM → dedup → decontamination), how many
    * candidates entered, how many that stage dropped, how many remain,
    * and the cumulative survival ppm. Stage N's count applies gates
    * 1..N, so the last row's `n_out` equals the survivor manifest size
    * by construction. Served from the PERSISTED dedup label index
    * (`curateGatesIndexed` — the production gate path); the oracle
    * recomputes the whole chain independently.
    *
    * Scale shape: ONE aggregation pass over the decision table (all six
    * stacked conditions as parallel partial-agg sums), then a 6-row
    * explode of the totals row — nothing here is more than
    * report-scan-bound.
    */
  def gateFunnel(spark: SparkSession, dir: String): DataFrame =
    gateFunnelFrom(curationReportFrom(curateGatesIndexed(spark, dir)))

  /** [[gateFunnel]] over any decision table with the report's columns. */
  def gateFunnelFrom(report: DataFrame): DataFrame = {
    def surviving(conds: Column*): Column =
      sum(when(conds.reduce(_ && _), 1L).otherwise(0L))
    val q = col("q_keep") === 1
    val rep = col("rep_flagged") === 0
    val rare = col("rare_flagged") === 0
    val lm = col("lm_flagged") === 0
    val dd = col("dedup_keep") === 1
    val dc = col("contaminated") === 0
    report.agg(
      count(lit(1)).as("n0"),
      surviving(q).as("n1"),
      surviving(q, rep).as("n2"),
      surviving(q, rep, rare).as("n3"),
      surviving(q, rep, rare, lm).as("n4"),
      surviving(q, rep, rare, lm, dd).as("n5"),
      surviving(q, rep, rare, lm, dd, dc).as("n6"))
      .select(explode(expr(
        """array(
          |  struct(CAST(1 AS BIGINT) AS stage_idx, 'quality' AS stage,
          |    n0 AS n_in, n0 - n1 AS n_dropped, n1 AS n_out,
          |    1000000 * n1 DIV n0 AS survival_ppm),
          |  struct(CAST(2 AS BIGINT) AS stage_idx, 'repetition' AS stage,
          |    n1 AS n_in, n1 - n2 AS n_dropped, n2 AS n_out,
          |    1000000 * n2 DIV n0 AS survival_ppm),
          |  struct(CAST(3 AS BIGINT) AS stage_idx, 'rarity' AS stage,
          |    n2 AS n_in, n2 - n3 AS n_dropped, n3 AS n_out,
          |    1000000 * n3 DIV n0 AS survival_ppm),
          |  struct(CAST(4 AS BIGINT) AS stage_idx, 'lm' AS stage,
          |    n3 AS n_in, n3 - n4 AS n_dropped, n4 AS n_out,
          |    1000000 * n4 DIV n0 AS survival_ppm),
          |  struct(CAST(5 AS BIGINT) AS stage_idx, 'dedup' AS stage,
          |    n4 AS n_in, n4 - n5 AS n_dropped, n5 AS n_out,
          |    1000000 * n5 DIV n0 AS survival_ppm),
          |  struct(CAST(6 AS BIGINT) AS stage_idx, 'decontamination' AS stage,
          |    n5 AS n_in, n5 - n6 AS n_dropped, n6 AS n_out,
          |    1000000 * n6 DIV n0 AS survival_ppm))""".stripMargin)).as("s"))
      .select(col("s.stage_idx"), col("s.stage"), col("s.n_in"),
        col("s.n_dropped"), col("s.n_out"), col("s.survival_ppm"))
      .orderBy("stage_idx") // 6-row output: bounded sort
  }

  /** Per-SOURCE curation scorecard — the domain-reputation table a
    * crawl planner reads (which sources to crawl deeper, which to
    * deprioritize): per source, candidate count, curation keep rate,
    * duplicate rate (non-survivors of the dedup gate), contamination
    * rate, and mean quality score — all integer-exact ppm. The sibling
    * of [[gateFunnel]] grouped by provenance instead of stage; same
    * persisted-label gate path, same one-aggregation-pass shape (two
    * narrow doc_id joins attach source and score, then one
    * source-keyed partial agg).
    */
  def sourceReputation(spark: SparkSession, dir: String): DataFrame = {
    val g = curateGatesIndexed(spark, dir)
    val rep = curationReportFrom(g)
    val src = Tables.documents(spark, dir).select("doc_id", "source")
    // g.score shares the gates' ONE pinned text scan — no second
    // corpus pass for the same token statistics
    sourceReputationFrom(rep.join(src, "doc_id").join(g.score, "doc_id"))
  }

  /** [[sourceReputation]]'s aggregation over any decision frame carrying
    * the report's columns plus `source` and `score` — the persisted
    * decision table (`curate.DecisionStore`) serves it directly.
    */
  def sourceReputationFrom(decisions: DataFrame): DataFrame = {
    decisions
      .groupBy("source")
      .agg(count(lit(1)).as("n_candidates"),
        sum(col("keep").cast("long")).as("n_keep"),
        sum(when(col("dedup_keep") === 0, 1L).otherwise(0L)).as("n_dup"),
        sum(col("contaminated").cast("long")).as("n_contam"),
        sum(col("score").cast("long")).as("sum_score"))
      .select(col("source"), col("n_candidates"),
        expr("CAST(1000000 * n_keep DIV n_candidates AS BIGINT)").as("keep_ppm"),
        expr("CAST(1000000 * n_dup DIV n_candidates AS BIGINT)").as("dup_ppm"),
        expr("CAST(1000000 * n_contam DIV n_candidates AS BIGINT)").as("contam_ppm"),
        expr("CAST(sum_score DIV n_candidates AS BIGINT)").as("mean_score"))
      .orderBy("source") // source-table-sized output: bounded sort
  }

  /** Embedding index pipeline: QC gate → LSH ANN over the surviving
    * vectors. Bad vectors (non-finite, zero, wrong dimension) never
    * enter the index or the candidate space — the validation step a
    * production vector store runs before ingest. The gate output is
    * tiny (the flagged set), so the exclusion is a broadcast anti-join;
    * everything downstream keeps annLsh's narrow-bucket shapes.
    */
  def indexEmbeddings(spark: SparkSession, dir: String): DataFrame =
    indexEmbeddingsFrom(
      Tables.embeddings(spark, dir).select("vec_id", "embedding"))

  /** `indexEmbeddings` over an arbitrary `(vec_id, embedding)` frame. */
  def indexEmbeddingsFrom(emb: org.apache.spark.sql.DataFrame): DataFrame = {
    val bad = graft.sim.Similarity.embedQcFrom(emb)
      .filter(col("flag_nonfinite") === 1 || col("flag_zero") === 1 ||
        col("flag_dim") === 1)
      .select("vec_id")
    val clean = emb.join(broadcast(bad), Seq("vec_id"), "left_anti")
    graft.sim.Similarity.annLshFrom(clean)
  }

  /** Per-store diff counts of one [[crawlCycle]] run. */
  final case class CrawlCycleReport(
      decisionsNew: Long, decisionsDeleted: Long,
      searchNew: Long, searchChanged: Long, searchDeleted: Long,
      vectorsNew: Long, vectorsDeleted: Long,
      spanBatchDocs: Long)

  /** ONE crawl arrives; EVERY persisted store converges — the composed
    * form of the reference's sync loop (sync_service.rs:104-163)
    * applied across the whole incremental serving surface in a single
    * call. Given the crawl's FULL current state (`docs` with
    * `(doc_id, text, source)`, `emb` with `(vec_id, embedding)`):
    *
    *  - the per-corpus DECISION TABLE runs its diff cycle (new docs
    *    scored against the frozen gate models and appended; vanished
    *    docs tombstoned and removed as dup sources);
    *  - the SEARCH index at `searchBase` deletes vanished ids first,
    *    then upserts with the `text_hash` revision compare (only
    *    changed documents reindex);
    *  - the VECTOR index at `vectorBase` tombstones vanished ids and
    *    appends new ones under its frozen quantizers;
    *  - the SPAN store at `spanBase` absorbs the monotone NEW slice
    *    (ids above its committed high-water mark) — span trim reports
    *    are append-only crawl history by design (first-owner-keeps is
    *    stable under monotone ids; removing a document's report means
    *    a rebuild, the same trade the reference's snapshot history
    *    makes).
    *
    * Every half of every store cycle is idempotent, so a REPLAYED
    * cycle reports all-zero diffs and changes nothing (spec-pinned).
    * Scale shape: each store classifies the crawl with narrow id
    * anti-joins against its bucketed table (store side bucket-scans,
    * only the crawl's ids shuffle) and then does batch-proportional
    * work — the whole cycle costs the delta, never the corpus.
    */
  def crawlCycle(spark: SparkSession, dir: String,
      docs: DataFrame, emb: DataFrame,
      searchBase: String, vectorBase: String,
      spanBase: String): CrawlCycleReport = {
    val (decNew, decDel) =
      graft.curate.DecisionStore.crawlSync(spark, dir, docs)
    val (sNew, sChanged, sDel) = graft.index.SearchIndexStore
      .searchSync(docs.select("doc_id", "text"), searchBase)
    val (vNew, vDel) = graft.sim.VectorIndexStore
      .crawlSyncVectors(spark, vectorBase, emb)
    val nSpan = graft.dedup.SpanIndexStore
      .spanSync(docs.select("doc_id", "text"), spanBase)
    CrawlCycleReport(decNew, decDel, sNew, sChanged, sDel, vNew, vDel, nSpan)
  }
}
