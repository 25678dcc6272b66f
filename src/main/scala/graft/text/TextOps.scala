package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Materialize.MatOps
import graft.core.Tables

/** Text-quality analysis for training-data curation.
  *
  * All ratios are emitted as parts-per-million computed with integer
  * floor division — exact in every engine, immune to float rounding-tie
  * drift between Spark and the DuckDB oracle (token counts are small
  * integers whose ratios tie at decimal boundaries).
  *
  * Everything is codegen'd higher-order expressions over the token
  * array — one projection, no explode, no shuffle except the final
  * aggregations; at 100 TB these are scan-bound.
  */
object TextOps {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  private def toks: Column = split(col("text"), " ")

  /** Per-document stats: token counts, stopword ratio, type-token ratio,
    * average token length (all ppm, integer-exact).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val stopArrSql = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(split(text, ' '), t -> array_contains($stopArrSql, t))"))
          .cast("long"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"), col("n_stop"),
        expr("(1000000 * n_stop) div n_tokens").as("stop_ppm"),
        expr("(1000000 * n_distinct) div n_tokens").as("ttr_ppm"),
        // total token chars = text length minus the separating spaces
        expr("(1000000 * (n_chars - (n_tokens - 1))) div n_tokens").as("avg_tok_len_ppm")
      )
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Marker-token language-ID heuristic: score each language by marker
    * hits in the token stream, argmax with alphabetical tie-break. The
    * synthetic corpus shares one vocabulary across langs, so accuracy is
    * data-limited — the operator contract is the deterministic scoring.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "und"),
      "en" -> Seq("the", "a", "of"),
      "es" -> Seq("el", "los", "una"),
      "fr" -> Seq("le", "les", "une"),
      "zh" -> Seq("ma", "de", "shi")
    )
    def score(ms: Seq[String]): Column = {
      val arrSql = ms.map(s => s"'$s'").mkString("array(", ", ", ")")
      size(expr(s"filter(split(text, ' '), t -> array_contains($arrSql, t))"))
        .cast("long")
    }
    // guarded spread: five interpreted higher-order-function filters per
    // document — the scoring runs wherever the scan runs (see
    // qualityScore); no-op at production layouts
    val scored = graft.core.Adaptive.spreadScan(spark,
        Tables.documents(spark, dir), dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .select(
        (col("doc_id") +: col("lang") +:
          markers.map { case (l, ms) => score(ms).as(s"s_$l") }): _*
      )
    val best = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    // first marker list in alphabetical order wins ties
    val predAlpha = markers.foldLeft(Option.empty[Column]) {
      case (None, (l, _)) => Some(when(col(s"s_$l") === best, lit(l)))
      case (Some(c), (l, _)) => Some(c.when(col(s"s_$l") === best, lit(l)))
    }.get.otherwise(lit("und"))
    scored
      .withColumn("pred_lang", predAlpha)
      .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
      .drop("text")
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Language CONFUSION MATRIX — the aggregate QC view over [[langId]]:
    * per (declared, detected) pair, the doc count and its share of the
    * declared language's corpus (ppm). The table a corpus owner reads
    * to find systematically mislabeled slices (a source whose "en"
    * documents detect as "fr" is a scraping bug, not noise) and to
    * judge whether the detector itself is trustworthy enough to gate
    * on. One corpus scan (the langId projection), then two
    * matrix-sized aggregations — the confusion matrix is |langs|²
    * regardless of corpus size.
    */
  def langConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cells = langId(spark, dir).select("lang", "pred_lang")
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
    val totals = cells.groupBy("lang").agg(sum(col("n_docs")).as("lang_total"))
    cells.join(totals, "lang") // matrix-sized: broadcasts
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        expr("CAST(1000000 * n_docs DIV lang_total AS BIGINT)").as("share_ppm"))
      .orderBy("lang", "pred_lang") // matrix-sized output: bounded sort
  }

  /** Global token frequency top-100 (count desc, token asc tie-break).
    * Partial aggregation makes this a small-result shuffle at any scale;
    * the global top-k is a TakeOrderedAndProject, no full sort. The rank
    * window runs AFTER the limit(100) — a single-partition window over
    * exactly 100 rows, constant-size at any corpus scale (the lit(1)
    * partition key keeps WindowExec from flagging it as an unpartitioned
    * global window).
    */
  def tokenFreq(spark: SparkSession, dir: String): DataFrame =
    tokenFreqTail(Tables.documents(spark, dir)
      .select(explode(toks).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt")))

  /** The top-100 rank tail over an arbitrary `(token, cnt)` frame —
    * shared by the corpus tokenize path above and the persisted-
    * postings serving path (`SearchIndexStore.tokenFreqIndexed`).
    */
  private[graft] def tokenFreqTail(counted: DataFrame): DataFrame = {
    val top = counted.orderBy(col("cnt").desc, col("token")).limit(100)
    // the window ranks the 100-row post-limit result; partition on a
    // data-derived constant (a foldable literal is optimized out of the
    // spec, leaving the plan with an "unpartitioned window" warning)
    val w = Window.partitionBy(pmod(col("cnt"), lit(1)))
      .orderBy(col("cnt").desc, col("token"))
    top.withColumn("rk", row_number().over(w).cast("long"))
      .orderBy("rk")
  }

  /** BPE-style pre-tokenizer pattern (the GPT-2 shape, minus its
    * trailing-whitespace lookahead — RE2 has no lookahead and the oracle
    * must run the same scan): contractions, space-prefixed letter runs,
    * digit runs, punctuation runs, whitespace runs. Whitespace is an
    * EXPLICIT class, not `\s`: Java's `\s` includes vertical tab, RE2's
    * does not, and the engine and the oracle must tokenize identically.
    * Leftmost-first alternation behaves the same in Java regex and RE2.
    */
  private[graft] val BpePattern =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\f\\r]+|[ \\t\\n\\f\\r]+"

  /** BPE-ish token accounting: per-document token counts under the
    * pre-tokenizer regex (the unit a byte-pair tokenizer would split
    * further) next to whitespace token counts — the "how many tokens is
    * this corpus" pass of a training-data pipeline. Scan-bound: one
    * regex pass per document, partial aggregation only.
    */
  def tokenBpe(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        regexp_extract_all(col("text"), lit(BpePattern), lit(0)).as("pieces"),
        size(toks).cast("long").as("n_ws_tokens"))
      .select(col("lang"),
        col("n_ws_tokens"),
        size(col("pieces")).cast("long").as("n_bpe"),
        size(array_distinct(col("pieces"))).cast("long").as("n_bpe_distinct"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).as("total_bpe"),
        sum(col("n_ws_tokens")).as("total_ws"),
        sum(col("n_bpe_distinct")).as("total_bpe_distinct"),
        max(col("n_bpe")).as("max_bpe"))
      .orderBy("lang")
  }

  /** Composite quality score (0-100, integer-exact): length band,
    * stopword-ratio band, type-token ratio, alphabetic-token ratio —
    * the keep/drop gate of a corpus-curation pass. One projection.
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    // the gate is a pure projection (no exchange of its own), so the
    // higher-order-function token filters — interpreted, not codegen —
    // run wherever the scan runs; spread when the layout caps the scan
    // below session width (exact no-op at production input sizes)
    qualityScoreDocs(graft.core.Adaptive.spreadScan(spark,
      Tables.documents(spark, dir), dir, "documents"))

  /** [[qualityScore]] over an arbitrary `(doc_id, text)` frame — the
    * gate is per-doc and stateless, so batch scoring (the decision
    * store's incremental append) reuses it verbatim.
    */
  def qualityScoreDocs(docs: DataFrame): DataFrame = {
    val stopArrSql = stopwords.map(s => s"'$s'").mkString("array(", ", ", ")")
    docs
      .select(col("doc_id"), col("text"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(split(text, ' '), t -> array_contains($stopArrSql, t))"))
          .cast("long"))
      // alphabetic check via translate, not a regex: Java `$` matches
      // before a trailing newline while DuckDB's regexp_full_match does
      // not — translate-to-empty is bit-identical in both engines
      .withColumn("n_alpha",
        size(expr("""filter(split(text, ' '), t -> t != '' AND
             translate(t, 'abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ', '') = '')"""))
          .cast("long"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("(1000000 * n_stop) div n_tokens").as("stop_ppm"),
        expr("(1000000 * n_distinct) div n_tokens").as("ttr_ppm"),
        expr("(1000000 * n_alpha) div n_tokens").as("alpha_ppm"))
      .withColumn("score",
        lit(100)
          - when(col("n_tokens").between(10, 1000), 0).otherwise(40)
          - when(col("stop_ppm").between(20000, 600000), 0).otherwise(20)
          - when(col("ttr_ppm") >= 200000, 0).otherwise(20)
          - when(col("alpha_ppm") >= 600000, 0).otherwise(20))
      .withColumn("keep", (col("score") >= 60).cast("int"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Winnowing-style rolling-hash fingerprint per document
    * (graft.functions.RollingFp): full-text polynomial hash plus the
    * minimum 8-byte-window hash — the shift-tolerant signature
    * (documents sharing any 8-byte run can share `win_fp`). Base 257
    * mod 1e9+7 so the SQL oracle reproduces it with exact integer math.
    */
  def docRollingFp(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        call_function("rolling_fp", trim(col("text")), lit(8)).as("fp"))
      .select(col("doc_id"),
        element_at(col("fp"), 1).as("full_fp"),
        element_at(col("fp"), 2).as("win_fp"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive (see Indexing.searchDoc)
  }

  /** Distributed BPE merge LEARNING (Sennrich et al. 2016, the
    * word-frequency formulation tokenizer trainers actually use) — the
    * step beyond `tokenBpe`'s fixed pre-tokenizer accounting: learn the
    * top-`merges` byte-pair merges from the corpus. Each round counts
    * adjacent symbol pairs weighted by word frequency, takes the
    * arg-max pair (count desc, then lexicographic — fully
    * deterministic), and applies the merge greedily left-to-right to
    * every word.
    *
    * Scale shape: the working frame is the distinct-WORD table with
    * counts — Zipf-bounded vocabulary, not the corpus — so each round
    * is one partial-agg pair count plus one vocab-sized projection;
    * the arg-max is a 1-row TakeOrdered, and only the K merge rows
    * ever reach the driver (the same bounded-driver-state shape as the
    * IVF Lloyd rounds). Hash-checked against a DuckDB oracle that
    * unrolls the identical rounds in SQL.
    */
  def bpeLearn(spark: SparkSession, dir: String, merges: Int = 10): DataFrame =
    spark.read.parquet(s"${ensureBpeModel(spark, dir, merges)}/merges")

  /** FROZEN BPE MODEL store — one training run per corpus fingerprint,
    * shared by everything that needs the tokenizer (`bpe_learn`,
    * `bpe_apply`, and through it `shard_pack_bpe` / `epoch_plan_bpe`,
    * which previously each re-ran the 10-round learn loop). Freezing
    * the tokenizer is what a production pipeline does anyway — token
    * budgets must mean the same thing across crawls, so the model
    * changes on explicit retrain, not per query (the
    * `DecisionStore.appendDecisions` frozen-model contract). Persisted
    * artifacts, both Zipf-bounded (vocabulary-sized, never corpus):
    *  - `merges/`  the merge table `bpeLearn` returns
    *  - `wordlens/` the post-merge `(w, n_sym)` vocabulary `bpeApply`
    *    joins against the corpus token stream
    * Build-if-missing-or-stale via the shared fingerprint protocol;
    * returns the model's base path.
    */
  def ensureBpeModel(spark: SparkSession, dir: String,
      merges: Int = 10): String = {
    import spark.implicits._
    val base = graft.core.IndexScratch.scratchBase(dir, s"bpe$merges")
    val fp = "bpe-v1:" + graft.core.IndexScratch
      .sourceFingerprint(spark, s"$dir/documents.parquet")
    graft.core.IndexScratch.ensureBuilt(base, fp) {
      val (words, mergeRows) = bpeTrain(spark, dir, merges)
      words.select(col("w"), size(col("syms")).cast("long").as("n_sym"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$base/wordlens")
      mergeRows.toDF("merge_rank", "merge_left", "merge_right", "pair_count")
        .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$base/merges")
    }
    base
  }

  /** The trainer loop shared by `bpeLearn` (wants the merge table) and
    * `bpeApply` (wants the final merged-symbol state of the vocabulary):
    * returns the word frame `(w, syms, cnt)` AFTER all merges plus the
    * merge rows. The word column rides along so the applier can join
    * symbol counts back to the corpus token stream — vocab-sized either
    * way.
    */
  private[graft] def bpeTrain(spark: SparkSession, dir: String, merges: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) =
    bpeTrainDocs(Tables.documents(spark, dir), merges)

  /** [[bpeTrain]] over an arbitrary `(doc_id, text)` frame — the drift
    * store trains its frozen reference model on the BUILD slice only.
    */
  private[graft] def bpeTrainDocs(docs: DataFrame, merges: Int)
      : (DataFrame, Seq[(Long, String, String, Long)]) = {
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"),
        expr("filter(split(w, ''), c -> c != '')").as("syms"), col("cnt"))
      .materializeOnce(eager = true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var k = 1
    var done = false
    while (k <= merges && !done) {
      // the size >= 2 guard matters: Spark's sequence(1, 0) DESCENDS
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, n) = (best.head.getAs[String]("l"),
          best.head.getAs[String]("r"), best.head.getAs[Long]("n"))
        out += ((k.toLong, l, r, n))
        // Spark SQL string literals treat backslash as an escape: double
        // it FIRST, then double single quotes — a symbol containing
        // either would otherwise break (or silently corrupt) the
        // interpolated merge expression
        def q(s: String) = s.replace("\\", "\\\\").replace("'", "''")
        // greedy left-to-right merge fold; comparing against the LITERAL
        // last output symbol gives standard non-overlapping BPE ("aaa"
        // under (a,a) -> ["aa","a"])
        words = words.withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |IF(size(acc) > 0 AND element_at(acc, -1) = '${q(l)}' AND x = '${q(r)}',
             |   concat(slice(acc, 1, size(acc) - 1), array('${q(l)}${q(r)}')),
             |   concat(acc, array(x))))""".stripMargin))
          .materializeOnce()
        k += 1
      }
    }
    (words, out.toSeq)
  }

  /** BPE merge APPLICATION — the step that makes `bpeLearn`'s output a
    * working tokenizer instead of a table: fold the learned merges over
    * the corpus and emit per-document TRUE tokenizer token counts next
    * to the whitespace counts every packing operator otherwise assumes.
    * Feed the result to `Curate.shardPackDocs`/`seqPackDocs` via their
    * `nTokens` parameter and the shard/sequence budgets become
    * tokenizer-exact (CurateSpec pins that composition).
    *
    * Scale shape: merges apply to the distinct-WORD frame (Zipf-bounded
    * vocabulary, same as training — a word's merged symbol count is
    * corpus-position independent, so per-occurrence re-tokenization
    * would be pure waste); the corpus then joins that vocab-sized
    * `(w, n_sym)` side on the token key — identical to
    * `importanceWeights`' token join — and one partial agg rolls up per
    * doc. The LEFT join back to the doc spine keeps degenerate docs
    * (zero non-empty tokens) in the output with zero counts.
    */
  def bpeApply(spark: SparkSession, dir: String, merges: Int = 10): DataFrame = {
    // served from the frozen model: the vocab-sized (w, n_sym) side
    // LOADS, only the corpus token join runs per call
    val wordLen = spark.read
      .parquet(s"${ensureBpeModel(spark, dir, merges)}/wordlens")
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(wordLen, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ws_tokens"), sum(col("n_sym")).as("n_bpe_tokens"))
    Tables.documents(spark, dir).select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_ws_tokens"), lit(0L)).as("n_ws_tokens"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    // no global ORDER BY — corpus-sized output; the driver compare is order-insensitive
  }

  /** Tokenizer FERTILITY by language — BPE tokens per whitespace word,
    * the metric a multilingual pipeline owner reads before setting
    * per-language token budgets (a high-fertility language consumes
    * its budget in fewer words, so mixing by raw token counts
    * over-weights it; reference analogue: the per-locale token-count
    * columns of article.rs). Served from the same frozen model as
    * `bpeApply`: the vocab-sized `(w, n_sym)` side loads, one corpus
    * token scan joins it (broadcast — the model is Zipf-bounded), and
    * the rollup is language-sized. `n_types` (distinct words seen per
    * language) rides along as the vocabulary-coverage denominator.
    */
  def fertilityStats(spark: SparkSession, dir: String,
      merges: Int = 10): DataFrame = {
    val wordLen = spark.read
      .parquet(s"${ensureBpeModel(spark, dir, merges)}/wordlens")
    Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(wordLen), "w")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        countDistinct(col("w")).as("n_types"),
        sum(col("n_sym")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_types"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") / col("n_words"), 6)
          .as("fertility6"))
      .orderBy("lang") // language-space-sized output: bounded sort
  }

  /** Bucket width (tokens) for `lengthHistogram`. */
  private val LenBucket = 16L

  /** Corpus length-distribution histogram: documents per token-count
    * bucket with corpus share in ppm — the report every curation run
    * publishes (length filters, truncation budgets, and packing
    * efficiency all read off this distribution). One scan-bound
    * projection + one partial-agg shuffle of bucket ids; the totals row
    * broadcasts through SingleRowCrossToEquiJoin. Output is bounded by
    * max-doc-length/bucket — a dimension rollup, so the terminal sort
    * is constant cost.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val d = Tables.documents(spark, dir)
      .select(size(toks).cast("long").as("n_tokens"))
    val h = d.groupBy(expr(s"CAST(n_tokens DIV $LenBucket AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = d.agg(count(lit(1)).as("total"))
    h.crossJoin(broadcast(tot))
      .select((col("bucket") * LenBucket).as("bucket_lo"), col("n_docs"),
        expr("CAST((1000000 * n_docs) DIV total AS BIGINT)").as("share_ppm"))
      .orderBy("bucket_lo")
  }

  /** KMV (bottom-k / k-minimum-values) DISTINCT SKETCH per language —
    * the mergeable cardinality sketch a 100 TB pipeline uses where an
    * exact distinct is a full vocabulary shuffle: keep the k smallest
    * 32-bit token hashes per group; `est = (k−1)·2³²/kth_min`. Unlike
    * HLL (whose register layout is engine-private), KMV over a
    * portable hash is DETERMINISTIC — the same k hashes on any engine —
    * so the estimate itself passes the DuckDB hash gate (md5-prefix
    * hash, the same portable primitive simhash/sample_stratified use).
    *
    * The k-smallest selection is a TWO-LEVEL exact top-k so no single
    * window partition ever holds a language's whole vocabulary: level 1
    * ranks within (lang, h % 256) — 256-way split of the hash space —
    * and level 2 ranks the ≤ 256·k survivors per lang. Bounded state at
    * any scale; both levels are deterministic (hashes are distinct
    * within a group).
    *
    * The `n_exact`/`err_ppm` columns are the validation rail (they cost
    * the exact distinct this sketch exists to avoid) — a production
    * caller reads `est_distinct` and drops the rail; the bench keeps it
    * so the error is measured, not assumed (k=256 → σ ≈ 6%).
    */
  def distinctSketch(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"distinctSketch needs k >= 2, got $k")
    // spread the doc scan before the CPU-dense shingle+md5 explode —
    // single-row-group inputs otherwise serialize it onto one core
    // (exact no-op once the scan's own splits reach session width)
    val hashes = shingleHashes(
      graft.core.Adaptive.spreadScan(spark,
        Tables.documents(spark, dir), dir, "documents"))
      .materializeOnce() // one shingle pass feeds the sketch AND the rail
    val exact = hashes.groupBy("lang").agg(count(lit(1)).as("n_exact"))
    exact.join(sketchEstimate(bottomK(hashes, k), k), "lang")
      .select(col("lang"), col("n_exact"), col("kth_hash"), col("est_distinct"),
        expr("CAST(1000000 * ABS(est_distinct - n_exact) DIV n_exact AS BIGINT)")
          .as("err_ppm"))
      .orderBy("lang") // language-table-sized output: bounded sort
  }

  /** Per-language QUALITY CALIBRATION percentiles — the thresholds a
    * keep-top-X% policy reads before anyone hard-codes a cutoff: the
    * p10/p50/p90 of the composite quality score per language (a gate
    * tuned on English silently guts low-resource languages; this table
    * is how that's caught). Rides the `percentile == quantile_cont`
    * cross-engine contract `percentile_stats` pinned; the score join is
    * one narrow doc_id join, the percentile is one partial-agg pass.
    */
  def qualityPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityScore(spark, dir).select(col("doc_id"), col("score"))
    val lang = Tables.documents(spark, dir).select("doc_id", "lang")
    q.join(lang, "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(score, array(0.1D, 0.5D, 0.9D))").as("ps"))
      .select(col("lang"), col("n_docs"),
        round(element_at(col("ps"), 1), 6).as("p10"),
        round(element_at(col("ps"), 2), 6).as("p50"),
        round(element_at(col("ps"), 3), 6).as("p90"))
      .orderBy("lang") // language-table-sized output: bounded sort
  }

  /** Distinct 32-bit shingle hashes per language — the sketch's
    * universe: word-3-gram SHINGLES (the cardinality the MinHash/LSH
    * parameterization reads: band thresholds, expected bucket sizes —
    * and, unlike this corpus's 31-token vocabulary, a space large
    * enough to exercise the estimator), each hashed to the portable
    * md5-prefix 32-bit value.
    */
  def shingleHashes(docs: DataFrame): DataFrame =
    shingleOccurrences(docs)
      .select(col("lang"),
        expr("CAST(CONV(SUBSTRING(md5(g), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .distinct()

  /** Word-3-gram shingle OCCURRENCES per language — `(lang, g)` once
    * per appearance, the multiset the frequency sketches count (the
    * distinct sketch above takes the same rows set-wise).
    */
  def shingleOccurrences(docs: DataFrame): DataFrame =
    shingleOccurrences(docs, Seq("lang"))

  /** [[shingleOccurrences]] carrying arbitrary key columns alongside
    * the gram — the crawl-overlap gauge keys shingles by (lang, side).
    */
  def shingleOccurrences(docs: DataFrame, keys: Seq[String]): DataFrame =
    docs
      .select(keys.map(col) :+ split(col("text"), " ").as("l"): _*)
      .select(keys.map(col) :+ explode(expr(
        """CASE WHEN size(l) >= 3
          |  THEN transform(sequence(0, size(l) - 3),
          |    i -> concat_ws(' ', slice(l, i + 1, 3)))
          |  ELSE array() END""".stripMargin)).as("g"): _*)

  /** The sketch STATE: the k smallest distinct hashes per lang, as a
    * plain `(lang, h)` frame — langs·k rows regardless of corpus size.
    * Two-LEVEL exact top-k so no single window partition ever holds a
    * language's whole vocabulary: level 1 ranks within (lang, h % 256)
    * — a 256-way split of the uniform hash space — and level 2 ranks
    * the ≤ 256·k survivors per lang. Both levels deterministic (hashes
    * are distinct within a group).
    */
  def bottomK(hashes: DataFrame, k: Int): DataFrame =
    bottomKBy(hashes, k, Seq("lang"))

  /** [[bottomK]] with an arbitrary key-column set — the grouped form
    * the fused crawl-novelty series computes many prefix sketches in
    * ONE plan with (exactness per key group is the single-key
    * argument verbatim; `hashes` must be distinct per key group).
    */
  private[graft] def bottomKBy(hashes: DataFrame, k: Int,
      keys: Seq[String]): DataFrame = {
    val lvl1 = Window.partitionBy(keys.map(col) :+ pmod(col("h"), lit(256)): _*)
      .orderBy(col("h"))
    val lvl2 = Window.partitionBy(keys.map(col): _*).orderBy(col("h"))
    hashes
      .withColumn("r1", row_number().over(lvl1)).filter(col("r1") <= k)
      .withColumn("rk", row_number().over(lvl2)).filter(col("rk") <= k)
      .select(keys.map(col) :+ col("h"): _*)
  }

  /** MERGE two sketch states — the property that makes KMV the 100 TB
    * shape (sketch per shard/crawl/micro-batch, merge cheaply): the
    * union's bottom-k IS the merged sketch. Exact by construction —
    * any hash in the merged bottom-k is in at least one input's
    * bottom-k (state frames are langs·k rows, so this is trivially
    * cheap).
    */
  def sketchMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    bottomK(a.union(b).distinct(), k)

  /** The cardinality estimate off a sketch STATE alone (no corpus
    * access): `est = (k−1)·2³²/kth` when the state is full, the exact
    * member count when the universe was smaller than k.
    */
  def sketchEstimate(state: DataFrame, k: Int): DataFrame =
    sketchEstimateBy(state, k, Seq("lang"))

  /** [[sketchEstimate]] over arbitrary key columns (see [[bottomKBy]]). */
  private[graft] def sketchEstimateBy(state: DataFrame, k: Int,
      keys: Seq[String]): DataFrame =
    state.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("max_h"))
      .withColumn("kth_hash", when(col("n_kept") === k, col("max_h")))
      .withColumn("est_distinct",
        // fewer than k distinct values → the sketch IS the exact set
        coalesce(
          expr(s"CAST(FLOOR((${k - 1}) * CAST(4294967296 AS DOUBLE) / kth_hash) AS BIGINT)"),
          col("n_kept")))
      .select(keys.map(col) :+ col("kth_hash") :+ col("est_distinct"): _*)

  /** KMV SET-OPERATION gauge between the existing corpus and a fresh
    * crawl batch (`doc_id % 5 == 0` plays the new crawl — the
    * `dedup_incremental` split) — per language, the union / intersection
    * / novelty estimates a crawl planner reads BEFORE paying for
    * dedup: "how much of this crawl's shingle mass is actually new?".
    * Reference analogue: the sync planner's snapshot diff
    * (sync_service.rs decides per article whether a fetched revision is
    * new work); this is that decision lifted to corpus grain, answered
    * from two sketch states instead of a full content diff.
    *
    * This is the MERGE side of [[distinctSketch]] — the property that
    * makes KMV the 100 TB shape: each crawl keeps a langs·k-row state,
    * and union cardinality comes from merging STATES ([[sketchMerge]] —
    * the union's bottom-k is exactly the bottom-k of the two bottom-k
    * states), never from re-scanning the old corpus. Intersection is
    * the Beyer et al. (SIGMOD'07) KMV estimator: every hash in the
    * merged state is ≤ the merged kth value τ, and τ ≤ each side's own
    * kth, so membership of a merged-state hash in a SIDE is decidable
    * from that side's state alone — `est∩ = K∩/k · est∪` where K∩
    * counts merged-state hashes present in both sides (the divisor is
    * the merged state's actual row count, so a universe smaller than k
    * degrades to the exact intersection). Novelty is inclusion-
    * exclusion on the estimates: `(est∪ − est_old)/est_new`, clamped
    * to [0, 1] and reported in integer ppm (cross-engine exact — the only
    * doubles are the two FLOOR-ed estimate divisions the
    * `distinct_sketch` contract already pinned).
    *
    * The `*_exact` / `err_*_ppm` columns are the validation rail (they
    * cost the vocabulary-grain distinct this sketch exists to avoid) —
    * a production caller reads the estimates off the two persisted
    * states and never touches the corpus; the bench keeps the rail so
    * the error is measured, not assumed.
    *
    * Scale shape: ONE corpus scan → one gram-keyed distinct (the rail;
    * the sketch-only path is the same distinct each side's crawl
    * already paid when it built its state), then every frame is
    * langs·k rows — states, merged state, membership joins, estimates
    * all bounded regardless of corpus size.
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvOverlap needs k >= 2, got $k")
    // spread before the shingle+md5 explode (see distinctSketch)
    val docs = graft.core.Adaptive.spreadScan(spark,
        Tables.documents(spark, dir), dir, "documents")
      .select(col("lang"), col("text"), (col("doc_id") % 5 === 0).as("is_new"))
    // one shingle pass; per-(lang, hash) side flags feed the two side
    // states AND the exact rail without a second corpus scan
    val flags = shingleOccurrences(docs, Seq("lang", "is_new"))
      .select(col("lang"), col("is_new"),
        expr("CAST(CONV(SUBSTRING(md5(g), 1, 8), 16, 10) AS BIGINT)").as("h"))
      .groupBy("lang", "h")
      .agg(max(when(col("is_new"), 1).otherwise(0)).as("has_new"),
        max(when(col("is_new"), 0).otherwise(1)).as("has_old"))
      .materializeOnce()
    val stOld = bottomK(flags.filter(col("has_old") === 1).select("lang", "h"), k)
      .materializeOnce()
    val stNew = bottomK(flags.filter(col("has_new") === 1).select("lang", "h"), k)
      .materializeOnce()
    val exact = flags.groupBy("lang").agg(
      count(lit(1)).as("n_union_exact"),
      sum(when(col("has_old") === 1 && col("has_new") === 1, 1L).otherwise(0L))
        .as("n_inter_exact"))
    // the overlap frame covers every language with a gram on either
    // side (its base is the MERGED state), so this join keeps all of
    // `exact`'s languages
    exact.join(sketchOverlapFrom(stOld, stNew, k), "lang")
      .select(col("lang"), col("est_old"), col("est_new"), col("est_union"),
        col("est_inter"), col("novelty_ppm"),
        col("n_union_exact"), col("n_inter_exact"),
        expr("CAST(1000000 * ABS(est_union - n_union_exact) DIV n_union_exact AS BIGINT)")
          .as("err_union_ppm"))
      .orderBy("lang") // language-table-sized output: bounded sort
  }

  /** Build-if-missing of the persisted crawl sketch STATES — the two
    * langs·k bottom-k frames ([[kmvOverlap]]'s old-corpus / new-crawl
    * split) written once per corpus fingerprint, as each crawl would
    * persist its own. One shingle pass builds both; after that the
    * production overlap gauge never touches the corpus again.
    */
  def ensureKmvStates(spark: SparkSession, dir: String, k: Int = 256): String = {
    val base = graft.core.IndexScratch.scratchBase(dir, "kmvstates")
    graft.core.IndexScratch.ensureBuilt(base,
      graft.core.IndexScratch.sourceFingerprint(spark, s"$dir/documents.parquet")) {
      val docs = Tables.documents(spark, dir)
        .select(col("lang"), col("text"), (col("doc_id") % 5 === 0).as("is_new"))
      val hashes = shingleOccurrences(docs, Seq("lang", "is_new"))
        .select(col("lang"), col("is_new"),
          expr("CAST(CONV(SUBSTRING(md5(g), 1, 8), 16, 10) AS BIGINT)").as("h"))
        .distinct()
        .materializeOnce() // one shingle pass feeds both side states
      bottomK(hashes.filter(!col("is_new")).select("lang", "h"), k)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/old")
      bottomK(hashes.filter(col("is_new")).select("lang", "h"), k)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/new")
    }
    base
  }

  /** The RAIL-FREE production form of [[kmvOverlap]]: the overlap /
    * novelty estimates computed from the two PERSISTED sketch states
    * alone — the form a crawl planner actually calls (the exact rail
    * exists to GRADE the estimator and dominates the benched entry's
    * cost: it pays the vocabulary-grain distinct the sketch avoids).
    * Plan shape: two langs·k parquet scans, then bounded-frame math —
    * no corpus access at all (the `curation_report_indexed` pattern).
    * Hash-gated: the oracle re-derives both states from the documents
    * table and replays the bottom-k merge and every estimate, so a
    * stale or corrupted persisted state flips the hash.
    */
  def kmvOverlapIndexed(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    require(k >= 2, s"kmvOverlapIndexed needs k >= 2, got $k")
    val base = ensureKmvStates(spark, dir, k)
    sketchOverlapFrom(
      spark.read.parquet(s"$base/old"),
      spark.read.parquet(s"$base/new"), k)
      .orderBy("lang") // language-table-sized output: bounded sort
  }

  /** Set-operation estimates from two sketch STATES alone — no corpus
    * access, every frame langs·k rows: the form [[kmvOverlap]] joins
    * its exact rail onto, and the streaming crawl-novelty gauge
    * ([[graft.streaming.Streams.crawlNoveltyGauge]]) reads per batch.
    * LEFT joins with zero defaults on the side estimates: a language
    * present in only ONE state (a brand-new language in the crawl, or
    * one that vanished) is exactly what a novelty gauge must report,
    * not drop — an empty side's sketch estimates 0. The union/K∩
    * frames cover every language either state mentions.
    */
  def sketchOverlapFrom(stOld: DataFrame, stNew: DataFrame, k: Int): DataFrame =
    sketchOverlapBy(stOld, stNew, k, Seq("lang"))

  /** [[sketchOverlapFrom]] over arbitrary key columns — the grouped
    * form lets the crawl-novelty series compute EVERY live batch's
    * overlap row in one plan (keys = (batch_id, lang)) instead of one
    * driver-sequenced fold step per batch.
    */
  private[graft] def sketchOverlapBy(stOld: DataFrame, stNew: DataFrame,
      k: Int, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    val merged = bottomKBy(stOld.union(stNew).distinct(), k, keys)
      .materializeOnce()
    val estOld = sketchEstimateBy(stOld, k, keys)
      .select(kc :+ col("est_distinct").as("est_old"): _*)
    val estNew = sketchEstimateBy(stNew, k, keys)
      .select(kc :+ col("est_distinct").as("est_new"): _*)
    val estU = sketchEstimateBy(merged, k, keys)
      .select(kc :+ col("est_distinct").as("est_union"): _*)
    // Beyer K∩: merged-state hashes present in BOTH side states (valid
    // because every merged hash ≤ τ ≤ each side's kth — see kmvOverlap)
    val kBoth = merged
      .join(stOld.withColumn("in_old", lit(1)), keys :+ "h", "left")
      .join(stNew.withColumn("in_new", lit(1)), keys :+ "h", "left")
      .groupBy(kc: _*)
      .agg(count(lit(1)).as("n_kept"),
        sum(when(col("in_old") === 1 && col("in_new") === 1, 1L).otherwise(0L))
          .as("k_both"))
    estU
      .join(estOld, keys, "left")
      .join(estNew, keys, "left")
      .join(kBoth, keys)
      .withColumn("est_old", coalesce(col("est_old"), lit(0L)))
      .withColumn("est_new", coalesce(col("est_new"), lit(0L)))
      .select(kc ++ Seq(col("est_old"), col("est_new"), col("est_union"),
        expr("CAST(k_both * est_union DIV n_kept AS BIGINT)").as("est_inter"),
        // clamped to [0, 1e6]: inclusion-exclusion on ESTIMATES can
        // stray past either end of the true share's range
        expr("""CASE WHEN est_new > 0
                |  THEN LEAST(1000000L,
                |    CAST(GREATEST(0L, 1000000 * (est_union - est_old)) DIV est_new AS BIGINT))
                |  ELSE 0L END""".stripMargin).as("novelty_ppm")): _*)
  }

  /** Per-doc quality scores keyed by the portable md5-prefix 32-bit
    * doc-id hash — the quantile sketch's sample universe. The hash is
    * a uniform, engine-reproducible sampling key over DOCS (doc_id is
    * unique), so the bottom-k of it is a deterministic uniform sample.
    */
  def scoreHashes(spark: SparkSession, dir: String): DataFrame =
    scoreHashesDocs(Tables.documents(spark, dir))

  /** [[scoreHashes]] over an arbitrary `(doc_id, text, lang)` frame —
    * the streaming gauge scores micro-batches through the same path.
    */
  def scoreHashesDocs(docs: DataFrame): DataFrame =
    qualityScoreDocs(docs).select(col("doc_id"), col("score"))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select(col("lang"), col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"),
        col("score"))

  /** Deterministic bottom-k SAMPLE state per language for the quantile
    * sketch: the k docs with the smallest md5-prefix id hashes (ties —
    * 32-bit collisions — broken by doc_id, so the state is a pure
    * function of the doc SET, independent of partitioning and merge
    * order; that order-independence is what a KLL compactor's coin
    * flips cost, and why this passes a cross-engine hash gate).
    * Same two-level exact top-k as [[bottomK]]: level 1 ranks within
    * (lang, h % 256) so no window partition ever holds a language's
    * whole corpus, level 2 ranks the ≤ 256·k survivors.
    */
  def quantileBottomK(scored: DataFrame, k: Int): DataFrame = {
    val lvl1 = Window.partitionBy(col("lang"), pmod(col("h"), lit(256)))
      .orderBy(col("h"), col("doc_id"))
    val lvl2 = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    scored
      .withColumn("r1", row_number().over(lvl1)).filter(col("r1") <= k)
      .withColumn("rk", row_number().over(lvl2)).filter(col("rk") <= k)
      .select("lang", "doc_id", "h", "score")
  }

  /** MERGE two quantile-sketch states: the union's bottom-k IS the
    * merged state (exact by construction — the KMV merge law, applied
    * to the sample keys). Sketch per shard/crawl/micro-batch, merge
    * cheaply: state frames are langs·k rows.
    */
  def quantileSketchMerge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    quantileBottomK(a.unionByName(b).distinct(), k)

  /** Quantile estimates off a sketch STATE alone (no corpus access):
    * p10/p50/p90 of the sampled scores per language, on the
    * `percentile == quantile_cont` cross-engine contract with the
    * round-6 edge (`percentile_stats` pinned it).
    */
  def quantileSketchEstimate(state: DataFrame): DataFrame =
    state.groupBy("lang")
      .agg(count(lit(1)).as("n_sample"),
        expr("percentile(score, array(0.1D, 0.5D, 0.9D))").as("ps"))
      .select(col("lang"), col("n_sample"),
        round(element_at(col("ps"), 1), 6).as("p10_est"),
        round(element_at(col("ps"), 2), 6).as("p50_est"),
        round(element_at(col("ps"), 3), 6).as("p90_est"))

  /** MERGEABLE QUANTILE SKETCH per language — the percentile fallback
    * for a corpus too large for an exact per-group `percentile` pass
    * (exact percentile state is the group's whole value multiset;
    * past ~1e8 distinct rows per group the agg buffer is the
    * bottleneck). A deterministic bottom-k hash sample plays the role
    * a KLL sketch plays in a randomized pipeline, with one crucial
    * swap: item survival is decided by the portable md5-prefix hash of
    * the doc id instead of compactor coin flips, so the state — and
    * therefore the estimate — is a pure function of the input set,
    * identical on any engine and any partitioning. That determinism is
    * what lets an approximate sketch sit under the exact DuckDB hash
    * gate (the `distinct_sketch` move, applied to quantiles); merge is
    * union-bottom-k (exact), so shard/crawl/micro-batch states fold
    * associatively. Sample error is the bottom-k sampling bound
    * (k = 256 → quantile rank error ~±3% at 95%); the `*_exact` /
    * `err` columns are the validation rail a production caller drops.
    */
  def quantileSketch(spark: SparkSession, dir: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"quantileSketch needs k >= 2, got $k")
    val scored = scoreHashes(spark, dir)
      .materializeOnce() // one scored pass feeds the sketch AND the rail
    val est = quantileSketchEstimate(quantileBottomK(scored, k))
    val exact = scored.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile(score, array(0.1D, 0.5D, 0.9D))").as("ps"))
      .select(col("lang"), col("n_docs"),
        round(element_at(col("ps"), 1), 6).as("p10_exact"),
        round(element_at(col("ps"), 2), 6).as("p50_exact"),
        round(element_at(col("ps"), 3), 6).as("p90_exact"))
    exact.join(est, "lang")
      .select(col("lang"), col("n_docs"), col("n_sample"),
        col("p10_est"), col("p50_est"), col("p90_est"),
        col("p10_exact"), col("p50_exact"), col("p90_exact"))
      .orderBy("lang") // language-table-sized output: bounded sort
  }

  /** Count-Min Sketch geometry: d independent hash rows × w buckets.
    * Error bound: overestimate ≤ total/w per row with prob 1−(1/2)^d
    * under the standard analysis; w = 1024 keeps collision noise
    * below 0.1% of corpus mass, d = 4 rows make a simultaneous
    * 4-way collision on one key negligible.
    */
  val CmsD = 4
  val CmsW = 1024

  /** The CMS hash: row-salted portable md5-prefix, reduced to a
    * bucket. Identical string arithmetic on both engines
    * (`md5(r || ':' || g)`), so the counter matrix — and therefore
    * the estimate — is reproducible in the oracle.
    */
  private def cmsBucket(r: Column, g: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(r.cast("string"), lit(":"), g)), 1, 8),
      16, 10).cast("long"), lit(w.toLong))

  /** Count-Min Sketch STATE per language over shingle occurrences:
    * `(lang, r, b) → counter`, ≤ langs·d·w rows regardless of corpus
    * size. Counters are plain sums — order-free, exactly mergeable by
    * addition, and deterministic on any engine (the property
    * Misra-Gries/SpaceSaving summaries give up: their state depends on
    * processing order, which no cross-engine hash gate can pin). The
    * d-way explode happens map-side and collapses in the same
    * partial agg, so the shuffle carries ≤ d·w rows per task, not
    * d× the corpus.
    */
  def cmsState(occurrences: DataFrame, d: Int = CmsD,
      w: Int = CmsW): DataFrame = {
    require(d >= 1 && w >= 2, s"cmsState needs d >= 1, w >= 2; got d=$d w=$w")
    occurrences
      .select(col("lang"), col("g"),
        explode(expr(s"sequence(0, ${d - 1}L)")).as("r"))
      .select(col("lang"), col("r"), cmsBucket(col("r"), col("g"), w).as("b"))
      .groupBy("lang", "r", "b")
      .agg(count(lit(1)).as("c"))
  }

  /** MERGE two CMS states: counter-wise addition — the linearity that
    * makes CMS the frequency sketch for shard/crawl/micro-batch
    * pipelines (state per ingest unit, fold associatively; deletions
    * would even merge with negative weights).
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("lang", "r", "b").agg(sum(col("c")).as("c"))

  /** Fold a PERSISTED per-batch CMS state directory (the streaming
    * gauge's layout: one `batch_id` partition per micro-batch) into
    * the single live sketch — [[cmsMerge]] over every partition at
    * once. Addition is NOT idempotent, so the streaming side must bind
    * each batch's counters to its batch_id partition (replay =
    * rewrite); this reader is where the fold happens.
    */
  def cmsLoad(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .groupBy("lang", "r", "b").agg(sum(col("c")).as("c"))

  /** Fold the gauge's accumulated per-batch partitions into ONE — the
    * CMS state's compaction (the `RollupStore.compactPartials` move):
    * the folded counters land under the RESERVED batch `-1` (micro-
    * batch ids are nonnegative, so a future batch can never dynamic-
    * overwrite the compacted history), through the staged rename-swap
    * so a concurrent [[cmsLoad]] never sees a mix. Counter addition is
    * associative, so fold-then-read equals read — exactly.
    *
    * `beforeBatch` is the REPLAY FENCE against a live stream (the
    * `RollupStore.compactPartials` contract): a sink-written batch the
    * checkpoint hasn't committed would double-count if folded and then
    * redelivered — pass the committed-batch floor to fold only
    * partitions strictly below it; the default folds everything and is
    * for quiesced states. Returns surviving rows (≤ langs·d·w + any
    * unfolded tail batches).
    */
  def cmsCompact(spark: SparkSession, statePath: String,
      beforeBatch: Long = Long.MaxValue): Long =
    graft.sinks.Sinks.swapRewrite(spark,
      spark.read.parquet(statePath)
        .withColumn("batch_id",
          when(col("batch_id") < beforeBatch, lit(-1L))
            .otherwise(col("batch_id")))
        .groupBy("batch_id", "lang", "r", "b")
        .agg(sum(col("c")).as("c"))
        .select("lang", "r", "b", "c", "batch_id"),
      statePath, partitionCols = Seq("batch_id"))

  /** Point-query the sketch for candidate keys: each candidate probes
    * its d buckets, the estimate is the row-wise MIN (collisions only
    * ever inflate a counter, so the min is the tightest of d upper
    * bounds — est ≥ exact always). Candidates are a bounded frame, so
    * the probe is a broadcast join against the langs·d·w state. The
    * join is LEFT OUTER with absent buckets counting 0: a candidate
    * the sketch never saw (per-shard-top candidates probing a gauge
    * state, the production pattern) must report estimate 0, not
    * silently vanish — and an empty bucket in ANY row forces the min
    * to 0, which is the correct CMS answer. `d`/`w` must match the
    * state's build geometry; a mismatch probes the wrong buckets.
    */
  def cmsEstimate(state: DataFrame, candidates: DataFrame, d: Int = CmsD,
      w: Int = CmsW): DataFrame =
    candidates
      .select(col("lang"), col("g"),
        explode(expr(s"sequence(0, ${d - 1}L)")).as("r"))
      .withColumn("b", cmsBucket(col("r"), col("g"), w))
      .join(state, Seq("lang", "r", "b"), "left_outer")
      .groupBy("lang", "g")
      .agg(min(coalesce(col("c"), lit(0L))).as("est_count"))

  /** HEAVY HITTERS per language — the frequency member of the
    * mergeable-sketch family (`distinct_sketch` = cardinality,
    * `quantile_sketch` = distribution, this = top keys): the per-lang
    * top-N shingles with their exact counts and the Count-Min
    * estimates for the same keys. At 100 TB the exact side is the
    * validation rail a production caller drops: candidates come from
    * per-shard local tops and the CMS — langs·d·w counters, built in
    * one pass, merged by addition across shards — settles their global
    * counts; here the rail measures the sketch's overestimate instead
    * of assuming the bound. Ranking ties break lexicographically, and
    * the top-N selection is the same two-level window as [[bottomK]]
    * (level 1 inside a 256-way hash split of the key space, level 2
    * over ≤ 256·N survivors), so no window partition ever holds a
    * language's whole vocabulary.
    */
  def heavyHitters(spark: SparkSession, dir: String,
      topN: Int = 8): DataFrame = {
    require(topN >= 1, s"heavyHitters needs topN >= 1, got $topN")
    // spread before the shingle explode AND the downstream CMS build
    // (both inherit the scan's single-task layout through the pin
    // otherwise — measured 1.6 s of one-core md5+counter work)
    val occ = shingleOccurrences(
      graft.core.Adaptive.spreadScan(spark,
        Tables.documents(spark, dir), dir, "documents"))
      .materializeOnce() // one shingle pass feeds the sketch AND the rail
    val exact = occ.groupBy("lang", "g").agg(count(lit(1)).as("n_exact"))
    val split = pmod(conv(substring(md5(col("g")), 1, 8), 16, 10)
      .cast("long"), lit(256L))
    val byCount = Seq(col("n_exact").desc, col("g").asc)
    val lvl1 = Window.partitionBy(col("lang"), split).orderBy(byCount: _*)
    val lvl2 = Window.partitionBy(col("lang")).orderBy(byCount: _*)
    val top = exact
      .withColumn("r1", row_number().over(lvl1)).filter(col("r1") <= topN)
      .withColumn("rk", row_number().over(lvl2)).filter(col("rk") <= topN)
      .select("lang", "g", "n_exact", "rk")
      .materializeOnce() // referenced twice: join left side + candidates
    top.join(cmsEstimate(cmsState(occ), top.select("lang", "g")),
        Seq("lang", "g"))
      .select(col("lang"), col("rk").cast("long").as("rk"),
        col("g").as("shingle"),
        col("n_exact"), col("est_count"),
        // no ABS: CMS can only overestimate — a negative error here is
        // a bug the gate should catch, not noise to fold away
        expr("CAST((1000000 * (est_count - n_exact)) DIV n_exact AS BIGINT)")
          .as("over_ppm"))
      .orderBy("lang", "rk") // langs·topN rows: bounded sort
  }
}
