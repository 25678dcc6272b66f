package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared vector primitives for the similarity / embedding-dedup family.
  *
  * `dot64`/`norm64` unroll the 64-dim arithmetic into plain codegen'd
  * expressions (no lambda interpretation on pair-sized inputs), folding
  * left-to-right so doubles are bit-identical with the DuckDB oracle's
  * `list_reduce`. `bandBuckets` computes random-hyperplane LSH bucket
  * keys: `bands` OR'd bands of `rows` planes each — per-row projection
  * only, the explode of band keys is the only fan-out.
  */
object Vectors {

  /** Deterministic ±1 hyperplane sign for plane p, dimension k
    * (splitmix64-style finalizer — a fixed pseudo-random matrix).
    */
  def planeSign(p: Int, k: Int): Double = {
    var x = p.toLong * 0x9E3779B97F4A7C15L + k.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
    if ((x & 1L) == 0L) 1.0 else -1.0
  }

  /** Exact dot product of two 64-d float array columns, codegen'd. */
  def dot64(a: String, b: String): Column =
    (1 to 64).map(k =>
      element_at(col(a), k).cast("double") * element_at(col(b), k).cast("double")
    ).reduce(_ + _)

  /** L2 norm of a 64-d float array column, codegen'd. */
  def norm64(c: String): Column =
    sqrt((1 to 64).map(k =>
      element_at(col(c), k).cast("double") * element_at(col(c), k).cast("double")
    ).reduce(_ + _))

  /** Adds a `bucket_arr` column of `bands` LSH bucket keys for the
    * `embedding` column: each band packs `rows` hyperplane sign bits and
    * hashes them with the band id (bands never share buckets). Candidate
    * recall at cosine c is 1-(1-p^rows)^bands with p = 1-acos(c)/π.
    *
    * Each band's bucket is a self-contained expression over only its own
    * `rows` planes — deliberately NOT a shared sign-bit array column,
    * which CollapseProject would inline into every per-band reference
    * and re-evaluate the whole plane matrix bands× per row.
    */
  def withBandBuckets(df: DataFrame, bands: Int, rows: Int): DataFrame = {
    val planes = typedLit(
      (0 until bands * rows).map(p => (0 until 64).map(planeSign(p, _))))
    val buckets = transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, aggregate(
        sequence(lit(0), lit(rows - 1)), lit(0),
        (acc, i) => acc * lit(2) + when(
          aggregate(
            zip_with(col("embedding"), element_at(planes, b * lit(rows) + i + lit(1)),
              (x, w) => x.cast("double") * w),
            lit(0.0), (acc2, v) => acc2 + v) > lit(0.0),
          lit(1)).otherwise(lit(0)))))
    df.withColumn("bucket_arr", buckets)
  }
}
