package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deduplication suite for training-data curation: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Design for 100 TB (SURVEY.md §5): signatures are computed per-row in
  * one codegen'd projection (higher-order functions over the token
  * array — no explode, no shuffle); only candidate generation shuffles,
  * on (band, bucket) keys whose fan-out is bounded by the band width.
  * Verification runs only on candidate pairs. Similarity thresholds are
  * evaluated with integer cross-multiplication (`2*inter >= union`) so
  * results are exact — no float boundary drift.
  */
object Dedup {

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

  /** MinHash(128) signatures + LSH banding (64 bands × 2 rows) for
    * candidate pairs, then exact token-set Jaccard verification ≥ 0.5.
    *
    * With r=2, b=64 the miss probability at J=0.5 is (1-0.25)^64 ≈ 1e-8,
    * so the verified output equals the exact all-pairs result that the
    * oracle computes — while at scale the bucket join touches only
    * colliding pairs instead of O(n²).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("array_distinct(split(text, ' '))").as("toks"))
      // 128 independent min-hashes in one codegen pass over the token array
      .withColumn("sig", expr(
        "transform(sequence(0, 127), i -> array_min(transform(toks, t -> xxhash64(t, i))))"))
    val banded = docs.select(
      col("doc_id"), col("toks"),
      explode(expr(
        "transform(sequence(0, 63), b -> concat(b, ':', element_at(sig, 2*b+1), ':', element_at(sig, 2*b+2)))"
      )).as("bucket"))
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.toks").as("ta"), col("y.toks").as("tb"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .filter(lit(2) * col("inter") >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .orderBy("doc_a", "doc_b")
  }

  /** 32-bit SimHash fingerprint per document. Bit hashes derive from
    * md5(token || '_' || bit) so the fingerprint is bit-identical across
    * engines (a production build would swap in xxhash64 per bit). One
    * codegen'd projection, no shuffle at all.
    */
  def simhashFp(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        expr("""aggregate(
            sequence(0, 31), cast(0 as bigint),
            (acc, j) -> acc + IF(
              aggregate(array_distinct(split(text, ' ')), 0,
                        (a, t) -> a + IF(substring(md5(concat(t, '_', j)), 1, 1) >= '8', 1, -1)) > 0,
              shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""").as("simhash"))
      .orderBy("doc_id")
  }

  /** Word-3-gram Jaccard ≥ 0.5 pairs via an inverted-index self-join:
    * explode distinct shingles, join on the shingle, count shared
    * shingles per pair, verify with integer cross-multiplication.
    * The shingle join is the scalable path — pairs sharing no shingle
    * are never materialized.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .select(col("doc_id"), expr(
        """array_distinct(
             CASE WHEN size(split(text, ' ')) >= 3
               THEN transform(sequence(0, size(split(text, ' ')) - 3),
                      i -> concat_ws(' ', element_at(split(text, ' '), i+1),
                                          element_at(split(text, ' '), i+2),
                                          element_at(split(text, ' '), i+3)))
               ELSE array() END)""").as("grams"))
    val sizes = grams.select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"))
    val inv = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    val inter = inv.as("x")
      .join(inv.as("y"),
        col("x.gram") === col("y.gram") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "nb"), "doc_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(lit(2) * col("inter") >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.35 over the 64-d float
    * vectors (threshold chosen to exercise the corpus's actual upper
    * tail). Dot products fold the arrays left-to-right in both engines,
    * so values are bit-identical; cos is rounded to 6dp at the edge.
    * At 100 TB the LSH-bucketed variant (graft.sim.Similarity.annLsh)
    * bounds the candidate set.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        expr("""sqrt(aggregate(embedding, cast(0 as double),
                 (acc, x) -> acc + cast(x as double) * cast(x as double)))""").as("norm"))
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        expr("""aggregate(zip_with(a.embedding, b.embedding,
                  (x, y) -> cast(x as double) * cast(y as double)),
                cast(0 as double), (acc, v) -> acc + v)""").as("dot"),
        (col("a.norm") * col("b.norm")).as("nn"))
    pairs
      .withColumn("cos6", round(col("dot") / col("nn"), 6))
      .filter(col("cos6") >= 0.35)
      .select("vec_a", "vec_b", "cos6")
      .orderBy("vec_a", "vec_b")
  }
}
