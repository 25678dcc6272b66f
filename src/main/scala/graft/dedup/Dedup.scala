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

  /** Candidate id pairs from banded LSH rows `(doc_id, bucket)`:
    * skew-capped self-join on the bucket, ids ordered, deduped across
    * bands before anything wide is joined back. The join and the
    * distinct both move 16-byte rows only.
    */
  private[dedup] def bandedPairs(banded: DataFrame, cap: Int = BucketCap): DataFrame = {
    val kept = banded.groupBy("bucket").count().filter(col("count") <= cap)
      .select("bucket")
    val capped = banded.join(kept, Seq("bucket"), "left_semi")
    capped.as("x")
      .join(capped.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** MinHash(128) + LSH banding (64 bands × 2 rows) candidate pairs over
    * a `(doc_id, s)` set frame, verified with exact set intersection at
    * threshold `2*inter >= union` (Jaccard ≥ 0.5).
    *
    * With r=2, b=64 the miss probability at J=0.5 is (1-0.25)^64 ≈ 1e-8,
    * so the verified output equals the exact all-pairs result the oracle
    * computes. Each band's two minhash values collapse to one 64-bit
    * bucket key via xxhash64 — a key collision can only ADD a candidate
    * (removed by verification), never lose one.
    */
  private[dedup] def minhashVerifiedPairs(sets: DataFrame): DataFrame = {
    // repartition: the signature pass is CPU-bound per row, and a small
    // single-file scan would otherwise pin it to one task
    // each band's bucket key is self-contained (its own two minhash
    // passes over the set) — a shared 128-signature array column would be
    // inlined per band reference by CollapseProject and recomputed 64×
    val banded = sets.repartition(col("doc_id")).select(
      col("doc_id"),
      explode(expr(
        """transform(sequence(0, 63), b -> xxhash64(b,
             array_min(transform(s, t -> xxhash64(t, 2*b))),
             array_min(transform(s, t -> xxhash64(t, 2*b+1)))))"""
      )).as("bucket"))
    bandedPairs(banded)
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

  /** MinHash+LSH near-dup pairs over word token sets, Jaccard ≥ 0.5. */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("array_distinct(split(text, ' '))").as("s"))
    minhashVerifiedPairs(sets).orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash fingerprint per document: ONE md5 per token, the
    * first 8 hex chars parsed as a 32-bit integer, each output bit j the
    * sign of the ±1 majority over bit j of the token hashes. Portable
    * bit-for-bit across engines (hex parse + integer bit ops), and ~32×
    * cheaper than hashing per (token, bit). One codegen'd projection,
    * no shuffle.
    */
  def simhashFp(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
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
      .orderBy("doc_id")
  }

  /** Word-3-gram Jaccard ≥ 0.5 pairs. Grams are xxhash64-ed to longs in
    * the same projection that builds them, so only 8-byte gram hashes
    * ever leave the scan; candidates come from the shared MinHash
    * banding (not a raw inverted-index self-join, whose hot "stop
    * shingles" blow up quadratically), and verification intersects the
    * hashed gram sets exactly.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(
        """array_distinct(
             CASE WHEN size(split(text, ' ')) >= 3
               THEN transform(sequence(0, size(split(text, ' ')) - 3),
                      i -> xxhash64(concat_ws(' ', element_at(split(text, ' '), i+1),
                                                   element_at(split(text, ' '), i+2),
                                                   element_at(split(text, ' '), i+3))))
               ELSE array() END)""").as("s"))
      .filter(size(col("s")) > 0)
    minhashVerifiedPairs(sets).orderBy("doc_a", "doc_b")
  }

  // --- embedding near-dup -------------------------------------------------

  import graft.sim.Vectors.{dot64, norm64, withBandBuckets}

  private val EmbBands = 100  // bands OR'd for recall
  private val EmbRows  = 4    // hyperplanes per band → 16 buckets/band

  /** Embedding near-duplicate pairs, cosine ≥ 0.35 (the corpus's actual
    * upper tail — production near-dup thresholds of ≥0.8 prune far
    * harder with the same plan).
    *
    * Random-hyperplane LSH candidates: 100 bands × 4 planes. A pair at
    * cos 0.35 agrees with a plane w.p. 1-acos(0.35)/π ≈ 0.614, so the
    * band-miss probability is (1-0.614^4)^100 ≈ 2e-7 — and every
    * candidate is verified with the exact dot product, so the output
    * equals the all-pairs oracle (recall pinned at 100% by DedupSpec).
    * The plan is equi-join + distinct over 16-byte rows (no
    * BroadcastNestedLoopJoin, no cross join): at 100 TB candidates are
    * bounded by bucket collisions instead of O(n²).
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // repartition: plane projections are CPU-bound per row; a small
    // single-file scan would otherwise run them in one task
    val banded = withBandBuckets(e.repartition(col("vec_id")), EmbBands, EmbRows)
      .select(col("vec_id").as("doc_id"), explode(col("bucket_arr")).as("bucket"))
    val withNorm = e.withColumn("norm", norm64("embedding"))
    bandedPairs(banded)
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
      .join(withNorm.select(col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("norm").as("na")), "vec_a")
      .join(withNorm.select(col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("norm").as("nb")), "vec_b")
      .withColumn("cos6", round(dot64("ea", "eb") / (col("na") * col("nb")), 6))
      .filter(col("cos6") >= 0.35)
      .select("vec_a", "vec_b", "cos6")
      .orderBy("vec_a", "vec_b")
  }

  /** Exact all-pairs reference for `dedupEmbedding`, used by tests to pin
    * the LSH path's recall at 100% on the fixed corpus. The pair grid is
    * an equi-join on block ids (never a BroadcastNestedLoopJoin), but the
    * compute is O(n²) — test-only.
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
      .join(e.as("b"), col("bb") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos6",
        round(dot64("a.embedding", "b.embedding") / (col("a.norm") * col("b.norm")), 6))
      .filter(col("cos6") >= 0.35)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cos6"))
      .orderBy("vec_a", "vec_b")
  }
}
