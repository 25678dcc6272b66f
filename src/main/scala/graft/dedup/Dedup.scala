package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication suite for training-data curation: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding near-dup.
  *
  * Design for 100 TB (SURVEY.md §5): signatures are computed per-row in
  * one projection (no explode, no shuffle); candidate generation
  * shuffles only narrow `(doc_id, bucket)` rows — never the token or
  * embedding arrays; candidate id pairs are `distinct`-ed BEFORE the
  * verification join, so each pair is verified exactly once; skewed
  * buckets (boilerplate corpora) are dropped past a size cap — a
  * mega-bucket band carries no information and its near-dup pairs are
  * recovered by the other bands. Verification is exact, so the banded
  * output equals the all-pairs oracle result (miss probability per
  * qualifying pair ≤ 1e-8 at the configured band widths).
  */
object Dedup {

  /** Buckets holding more than this many docs are dropped from candidate
    * generation (LSH skew guard). Generous enough to be a no-op at test
    * scale; at 100 TB a 100k-doc bucket would contribute 5e9 pairs from a
    * single band while its genuine near-dups still collide in the other
    * bands.
    */
  val BucketCap = 100000

  /** MinHash(128) + LSH banding (64 bands × 2 rows) candidate pairs over
    * a `(doc_id, s)` set frame (s: array of 64-bit element hashes),
    * verified with exact set intersection at threshold `2*inter >= union`
    * (Jaccard ≥ 0.5).
    *
    * With r=2, b=64 the miss probability at J=0.5 is (1-0.25)^64 ≈ 1e-8,
    * so the verified output equals the exact all-pairs result the oracle
    * computes. Each band's two minhash values collapse to one 64-bit
    * bucket key via xxhash64 — a key collision can only ADD a candidate
    * (removed by verification), never lose one. Verification joins the
    * narrow hashed sets back once per candidate pair (map-side when the
    * set frame broadcasts under AQE).
    */
  private[graft] def minhashVerifiedPairs(sets: DataFrame): DataFrame = {
    // repartition: the signature pass is CPU-bound per row, and a small
    // single-file scan would otherwise pin it to one task
    // each band's bucket key is self-contained (its own two minhash
    // passes over the set) — a shared 128-signature array column would be
    // inlined per band reference by CollapseProject and recomputed 64×
    //
    // Candidate strategy: narrow-row banding + distinct. On a near-dup-
    // heavy corpus a qualifying pair collides in ~half its bands, so the
    // candidate stream is (pairs × matching bands) no matter what; what
    // we control is ROW WIDTH — these rows are two longs, never the
    // token sets (a first-match variant carrying the 64-bucket arrays
    // through the join measured 4× slower than distinct on 16-byte rows).
    val spark = sets.sparkSession
    // 4× parallelism for the pair join: its OUTPUT is quadratic per
    // bucket group, and the partial-distinct hash table downstream must
    // hold each task's share of the pair stream — at 1× the tables
    // spill and HashAggregate silently degrades to sort-based
    // aggregation (measured 5-10× slower end-to-end)
    val n = spark.sessionState.conf.numShufflePartitions * 4
    val banded = sets.repartition(col("doc_id")).select(
      col("doc_id"),
      explode(expr(
        """transform(sequence(0, 63), b -> xxhash64(b,
             array_min(transform(s, t -> xxhash64(t, 2*b))),
             array_min(transform(s, t -> xxhash64(t, 2*b+1)))))"""
      )).as("bucket"))
    val kept = banded.groupBy("bucket").count().filter(col("count") > BucketCap)
      .select("bucket")
    val capped = banded.join(broadcast(kept), Seq("bucket"), "left_anti")
      // pinned: AQE coalesces this shuffle by byte size, but the join
      // output fans out quadratically per bucket group
      .repartition(n, col("bucket"))
    val cands = capped.as("x")
      .join(capped.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("doc_a"), col("s").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("s").as("sb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni",
        (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
      .filter(lit(2) * col("inter") >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
  }

  /** Exact dedup by content hash: keep the smallest doc_id per distinct
    * normalized text (storage.rs dedup-by-content identity). One shuffle
    * on the 128-bit hash.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(md5(trim(col("text"))).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_hash")
  }

  /** MinHash+LSH near-dup pairs over word token sets, Jaccard ≥ 0.5.
    * Tokens are xxhash64-ed to longs in the scan projection: set sizes
    * and intersections are preserved (64-bit collisions are ~1e-9 at
    * corpus vocabulary sizes), and only 8-byte elements ride the
    * verification join.
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))").as("s"))
    minhashVerifiedPairs(sets)
  }

  /** 32-bit SimHash fingerprint per document: ONE md5 per token, the
    * first 8 hex chars parsed as a 32-bit integer, each output bit j the
    * sign of the ±1 majority over bit j of the token hashes. Portable
    * bit-for-bit across engines (hex parse + integer bit ops), and ~32×
    * cheaper than hashing per (token, bit). One codegen'd projection,
    * no shuffle.
    */
  def simhashFp(spark: SparkSession, dir: String): DataFrame = {
    // repartition: the bit-majority fold is CPU-bound per row and the
    // small single-file scan would otherwise run it in one task
    Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(
        col("doc_id"),
        expr("""transform(array_distinct(split(text, ' ')),
                 t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))""").as("hs"))
      .select(
        col("doc_id"),
        expr("""aggregate(
            sequence(0, 31), cast(0 as bigint),
            (acc, j) -> acc + IF(
              aggregate(hs, 0, (a, h) -> a + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0,
              shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""").as("simhash"))
  }

  /** Word-3-gram Jaccard ≥ 0.5 pairs. Grams are xxhash64-ed to longs in
    * the same projection that builds them, so only 8-byte gram hashes
    * ever leave the scan; candidates come from the shared MinHash
    * banding (not a raw inverted-index self-join, whose hot "stop
    * shingles" blow up quadratically), and verification intersects the
    * hashed gram sets exactly.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // materialize the token array behind an exchange FIRST: referencing
    // `split(text)` inside the per-gram lambda lets CollapseProject
    // inline the split into every element_at — O(len²) characters per
    // document (measured 70 s at sf0.01 vs ~3 s materialized)
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .repartition(col("doc_id"))
    val sets = toks
      .select(col("doc_id"), expr(
        """array_distinct(
             CASE WHEN size(toks) >= 3
               THEN transform(sequence(0, size(toks) - 3),
                      i -> xxhash64(concat_ws(' ', element_at(toks, i+1),
                                                   element_at(toks, i+2),
                                                   element_at(toks, i+3))))
               ELSE array() END)""").as("s"))
      .filter(size(col("s")) > 0)
    minhashVerifiedPairs(sets)
  }

  // --- embedding near-dup -------------------------------------------------

  import graft.sim.Vectors.{dot64, norm64}

  /** Embedding near-duplicate pairs, cosine ≥ 0.35.
    *
    * At this threshold sign-LSH CANNOT prune: a qualifying pair agrees
    * with a hyperplane w.p. p1 = 1-acos(0.35)/π ≈ 0.614 while an
    * unrelated pair (cos ≈ 0) agrees w.p. p2 = 0.5, so the LSH quality
    * exponent ρ = ln(1/p1)/ln(1/p2) ≈ 0.70 — any banding with near-zero
    * miss probability (required: the output must equal the all-pairs
    * oracle exactly) also retains ~all pairs as candidates. Measured: at
    * sf0.01, 124,747 of 124,750 possible pairs survive 40×2 banding.
    * Candidate generation would only add shuffles on top of O(n²) work.
    *
    * So the scalable-exact plan is a BLOCKED GRID — the distributed
    * matrix-product shape: vectors are hashed into B blocks, a tiny B²
    * cell grid broadcasts, and each grid cell equi-joins its two blocks.
    * Replication is O(n·B) narrow rows, every task computes an
    * (n/B)² dot-product tile in one codegen stage, and nothing
    * quadratic is ever shuffled — the O(n²) compute (unavoidable for
    * exact output at this threshold) is spread evenly across B² tasks
    * with no skew by construction. No BroadcastNestedLoopJoin, no
    * cartesian product (PlanAuditSpec asserts this).
    *
    * At production near-dup thresholds (cos ≥ 0.8, p1 ≈ 0.80, ρ ≈ 0.32)
    * hyperplane banding does prune by orders of magnitude — that path is
    * `Similarity.annLsh`'s bucketing, and `SimilaritySpec` pins its
    * recall.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    dedupEmbeddingExact(spark, dir)
  }

  /** Blocked all-pairs grid (see `dedupEmbedding` doc). Also serves as
    * the exact reference the recall tests compare LSH variants against.
    */
  private[graft] def dedupEmbeddingExact(spark: SparkSession, dir: String): DataFrame = {
    val blocks = 16
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .withColumn("norm", norm64("embedding"))
      .withColumn("blk", (col("vec_id") % blocks).cast("int"))
    import spark.implicits._
    // full grid: the a-side/b-side block assignment is fixed by which
    // vector has the smaller id, so every cell (i, j) can hold pairs
    val grid = (0 until blocks).flatMap(i => (0 until blocks).map(j => (i, j)))
      .toDF("ba", "bb")
    e.as("a").join(broadcast(grid), col("a.blk") === col("ba"))
      // spread the B² dot-product tiles across the cluster: without this
      // the (broadcast) joins are map-side and parallelism collapses to
      // the scan's partition count
      .repartition(col("ba"), col("bb"))
      .join(e.as("b"), col("bb") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos6",
        round(dot64("a.embedding", "b.embedding") / (col("a.norm") * col("b.norm")), 6))
      .filter(col("cos6") >= 0.35)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos6"))
  }
}
