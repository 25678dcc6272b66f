package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `cosineTopK` is the verified brute-force baseline; `annLsh` is the
  * scale path — random-hyperplane signatures bucket the corpus so the
  * per-query candidate set shrinks ~2^planes×, at the cost of recall.
  * Both keep the arithmetic inside codegen'd higher-order functions.
  */
object Similarity {

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm",
      expr("""sqrt(aggregate(embedding, cast(0 as double),
               (acc, x) -> acc + cast(x as double) * cast(x as double)))"""))

  private val dotExpr =
    """aggregate(zip_with(a.embedding, b.embedding,
      |          (x, y) -> cast(x as double) * cast(y as double)),
      |        cast(0 as double), (acc, v) -> acc + v)""".stripMargin

  /** Brute-force cosine top-5 neighbours for each query vector
    * (vec_id < 20). The small query side broadcasts; ranking is a window
    * partitioned per query — a per-partition top-k merge at scale.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
    val q = e.filter(col("vec_id") < 20)
    val scored = broadcast(q).as("a")
      .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        round(expr(dotExpr) / (col("a.norm") * col("b.norm")), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }

  /** Random-hyperplane LSH ANN: 6 deterministic ±1 hyperplanes (weights
    * from xxhash64 parity) → 64 buckets; queries only compare against
    * their own bucket, cutting candidates ~64× at scale. Plane count
    * scales with corpus size (multi-probe or band-OR for recall).
    * Rows-only check: recall is approximate by construction.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigExpr =
      """aggregate(sequence(0, 5), cast(0 as bigint), (acc, p) -> acc +
        |  IF(aggregate(zip_with(embedding, sequence(0, size(embedding) - 1),
        |       (x, k) -> cast(x as double) *
        |                 IF(pmod(xxhash64(concat('hp_', p, '_', k)), 2) = 0, 1.0d, -1.0d)),
        |     cast(0 as double), (s, v) -> s + v) > 0,
        |     shiftleft(cast(1 as bigint), p), cast(0 as bigint)))""".stripMargin
    val e = withNorm(Tables.embeddings(spark, dir).select("vec_id", "embedding"))
      .withColumn("bucket", expr(sigExpr))
    val q = e.filter(col("vec_id") < 20)
    val scored = broadcast(q).as("a")
      .join(e.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
      .select(
        col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        round(expr(dotExpr) / (col("a.norm") * col("b.norm")), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }
}
