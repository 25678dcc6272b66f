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

  /** Deterministic sparse hyperplane weight for plane p, dimension k
    * (splitmix64-style finalizer — a fixed pseudo-random matrix).
    * Weights are {-1, 0, +1} with ~1/4 density (sparse random
    * projections, Achlioptas 2003): sign-LSH collision behaviour is
    * preserved while each plane dot stays a ~16-term codegen expression
    * instead of 64 — generated stages stay well under Janino's 64 KB
    * method limit even when fused.
    */
  def planeWeight(p: Int, k: Int): Double = {
    var x = p.toLong * 0x9E3779B97F4A7C15L + k.toLong * 0xC2B2AE3D27D4EB4FL +
      0x165667B19E3779F9L
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
    if (((x >>> 1) & 3L) != 0L) 0.0
    else if ((x & 1L) == 0L) 1.0
    else -1.0
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
    * 64-d `embedding` column: each band packs `rows` hyperplane sign
    * bits and hashes them with the band id (bands never share buckets).
    * Candidate recall at cosine c is 1-(1-p^rows)^bands with
    * p = 1-acos(c)/π.
    *
    * The plane dots are UNROLLED codegen expressions, not interpreted
    * lambdas (higher-order functions never codegen — a lambda version
    * measured ~6 ms/row); sparse weights keep each dot to ~16 terms.
    */
  def withBandBuckets(df: DataFrame, bands: Int, rows: Int): DataFrame = {
    def el(k: Int) = element_at(col("embedding"), k).cast("double")
    val buckets = (0 until bands).map { b =>
      val packed = (0 until rows).map { i =>
        val p = b * rows + i
        val terms = (1 to 64).flatMap { k =>
          planeWeight(p, k - 1) match {
            case 1.0  => Some(el(k))
            case -1.0 => Some(lit(0.0) - el(k))
            case _    => None
          }
        }
        val dot = if (terms.isEmpty) lit(0.0) else terms.reduce(_ + _)
        when(dot > lit(0.0), lit(1)).otherwise(lit(0))
      }.reduce((a, c) => a * lit(2) + c)
      xxhash64(lit(b), packed)
    }
    df.withColumn("bucket_arr", array(buckets: _*))
  }
}
