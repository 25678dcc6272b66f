package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Vectors.{dot64, norm64, withBandBuckets, withProbeBuckets}

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * `cosineTopK` is the verified brute-force baseline; `annLsh` is the
  * scale path — multi-band random-hyperplane LSH (16 bands × 4 planes,
  * OR'd) buckets the corpus so the per-query candidate set shrinks,
  * with recall ≥ 1-(1-p^4)^16 per neighbour (pinned against the
  * brute-force baseline in SimilaritySpec). Scoring arithmetic is
  * unrolled into codegen'd expressions (Vectors.dot64) — no lambda
  * interpretation on the candidate hot path.
  */
object Similarity {

  private val Queries = 20  // query side: vec_id < 20

  /** Brute-force cosine top-5 neighbours for each query vector
    * (vec_id < 20). The small query side broadcasts; ranking is a window
    * partitioned per query — a per-partition top-k merge at scale.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    cosineTopKFrom(emb, emb.filter(col("vec_id") < Queries))
  }

  /** `cosineTopK` over arbitrary corpus and query frames — the exact
    * baseline the approximate paths are recall-pinned against, with the
    * same query-side parameterization (`excludeSelf` as in
    * `annLshFrom`).
    */
  def cosineTopKFrom(emb: DataFrame, queries: DataFrame,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select("vec_id", "embedding").withColumn("norm", norm64("embedding"))
    val q = queries.select("vec_id", "embedding").withColumn("norm", norm64("embedding"))
    val selfGuard =
      if (excludeSelf) col("a.vec_id") =!= col("b.vec_id") else lit(true)
    val scored = broadcast(q).as("a")
      .join(e.as("b"), selfGuard)
      .select(
        col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"),
        round(dot64("a.embedding", "b.embedding") / (col("a.norm") * col("b.norm")), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }

  /** Multi-band hyperplane LSH ANN: a query's candidates are the vectors
    * sharing ANY of its 16 band buckets (4 planes each). The QUERY side
    * multi-probes — its own bucket plus every 1-bit sign flip per band
    * (Vectors.withProbeBuckets) — so recall rises without growing the
    * corpus index. Candidate generation joins only narrow
    * (vec_id, bucket) rows; embeddings are joined back once per distinct
    * candidate pair for exact scoring. Rows-only check: recall is
    * approximate by construction (the SimilaritySpec floor keeps
    * parameter regressions from shipping).
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    annLshFrom(emb, emb.filter(col("vec_id") < Queries))
  }

  /** `annLsh` over an arbitrary corpus frame with the default query
    * slice — pipelines call this after gating the corpus
    * (Pipeline.indexEmbeddings).
    */
  def annLshFrom(emb: DataFrame): DataFrame =
    annLshFrom(emb, emb.filter(col("vec_id") < Queries))

  /** `annLsh` over arbitrary corpus AND query `(vec_id, embedding)`
    * frames — the index answers whatever query set the caller brings
    * (the corpus-side index never depends on it). The query side is
    * assumed small relative to the corpus (it broadcasts twice: probe
    * keys and exact re-score vectors); for corpus-sized query sets run
    * the bucketed equi-join without the broadcasts.
    *
    * `excludeSelf` (default true) drops the corpus vector whose vec_id
    * EQUALS the query's — right when queries are drawn from the corpus
    * id space (the default slice, pipeline re-query). Pass false for
    * EXTERNAL query frames whose ids are unrelated to corpus ids, or a
    * corpus vector that merely shares an id number would silently
    * vanish from that query's neighbours.
    */
  def annLshFrom(emb: DataFrame, queries: DataFrame,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.withColumn("norm", norm64("embedding"))
    val q = queries.select("vec_id", "embedding").withColumn("norm", norm64("embedding"))
    val banded = withBandBuckets(e.select("vec_id", "embedding"), bands = 16, rows = 4)
      .select(col("vec_id"), explode(col("bucket_arr")).as("bucket"))
    val qb = withProbeBuckets(q.select("vec_id", "embedding"), bands = 16, rows = 4)
      .select(col("vec_id"), explode(col("bucket_arr")).as("bucket"))
    val selfGuard =
      if (excludeSelf) col("a.vec_id") =!= col("b.vec_id") else lit(true)
    val cands = broadcast(qb).as("a")
      .join(banded.as("b"), col("a.bucket") === col("b.bucket") && selfGuard)
      .select(col("a.vec_id").as("q_id"), col("b.vec_id").as("n_id"))
      .distinct()
    val scored = cands
      .join(broadcast(q
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("norm").as("qn"))), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("norm").as("nn")), "n_id")
      .select(col("q_id"), col("n_id"),
        round(dot64("qe", "ne") / (col("qn") * col("nn")), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }

  /** IVF (inverted-file) ANN — the other production scale path next to
    * hyperplane LSH: k-means-style coarse quantization (deterministic
    * seeds, two Lloyd rounds, all as DataFrame aggregations — no driver
    * collection of vectors), an inverted index vector → nearest
    * centroid, and query-time probing of the `nProbe` nearest lists
    * with exact re-scoring. At 100 TB the index side is a narrow
    * (vec_id, cid) frame co-partitioned by cid and the centroid table
    * broadcasts everywhere; per-query work is |probed lists|, not |corpus|.
    * Rows-only check (recall is approximate by construction;
    * SimilaritySpec pins the floor against brute force).
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    annIvfFrom(emb, emb.filter(col("vec_id") < Queries))
  }

  /** `annIvf` over arbitrary corpus AND query `(vec_id, embedding)`
    * frames: the index (centroids + inverted lists) builds from the
    * corpus only; any query frame probes it. `excludeSelf` as in
    * `annLshFrom`: true for corpus-id-space queries, false for
    * external frames whose ids are unrelated to corpus ids.
    */
  def annIvfFrom(emb: DataFrame, queries: DataFrame,
      excludeSelf: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val k = 16
    val nProbe = 4
    val e = emb.select("vec_id", "embedding")
      .withColumn("norm", norm64("embedding"))
    // single-key broadcast join = BroadcastHashJoin fan-out of the tiny
    // centroid table (a raw cross join would plan a BroadcastNestedLoopJoin,
    // which the plan audit bans). The key derives from a column — a
    // `lit(1) === lit(1)` condition would constant-fold to `true` and
    // degrade the join to a nested loop.
    def crossCentroids(base: DataFrame, cents: DataFrame): DataFrame =
      base.withColumn("one", pmod(col("vec_id"), lit(1)).cast("int"))
        .join(broadcast(cents.withColumn("one", pmod(col("cid"), lit(1)).cast("int"))),
          "one")
        .withColumn("ccos",
          dot64("embedding", "cvec") / (col("norm") * col("cnorm")))
    def assign(cents: DataFrame): DataFrame =
      crossCentroids(e, cents)
        .groupBy("vec_id")
        // struct max: highest cosine, ties to the highest cid — deterministic
        .agg(max(struct(col("ccos"), col("cid"))).as("best"))
        .select(col("vec_id"), col("best.cid").as("cid"))

    var centroids = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cid"),
        col("embedding").as("cvec"), col("norm").as("cnorm"))
    for (_ <- 1 to 2) {
      val memb = assign(centroids).join(e, "vec_id")
      // centroid mean via the native vec_sum aggregate: ONE partial-agg
      // shuffle of k × dim double buffers (the posexplode → per-(cid,
      // pos) avg shape this replaces shuffled |corpus| × dim rows)
      centroids = memb
        .groupBy("cid")
        .agg(call_function("vec_sum", col("embedding")).as("sv"),
          count(lit(1)).as("cnt"))
        .select(col("cid"),
          expr("transform(sv, x -> CAST(x / cnt AS FLOAT))").as("cvec"))
        .withColumn("cnorm", norm64("cvec"))
      // no per-round checkpoint: two Lloyd rounds of lineage stay shallow
    }
    // one materialization of the trained centroids: both the inverted
    // index and the query-probe branch read them, and without this the
    // whole training subtree would execute once per branch
    centroids = centroids.localCheckpoint()
    // index-time MULTI-ASSIGNMENT: each vector joins its top-2 lists, not
    // just its nearest — the classic fix for boundary vectors whose true
    // neighbours sit across a Voronoi edge (recall 0.82-0.92 single-
    // assigned → 0.92-0.96 measured). Index rows double, but they stay
    // narrow (vec_id, cid) pairs — an explicit space-for-recall trade
    // that leaves per-query probe cost unchanged.
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val index = crossCentroids(e, centroids)
      .withColumn("ark", row_number().over(wAssign))
      .filter(col("ark") <= 2)
      .select(col("vec_id"), col("cid"))

    val q = queries.select("vec_id", "embedding").withColumn("norm", norm64("embedding"))
    val wProbe = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cid"))
    val probed = crossCentroids(q, centroids)
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nProbe)
      .select(col("vec_id").as("q_id"), col("cid"))
    val cands = probed.join(index, "cid")
      .filter(if (excludeSelf) col("vec_id") =!= col("q_id") else lit(true))
      .select(col("q_id"), col("vec_id").as("n_id"))
      // multi-assigned vectors can reach a query through two probed
      // lists; score each candidate once
      .distinct()
    val scored = cands
      .join(broadcast(q.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        col("norm").as("qn"))), "q_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
        col("norm").as("nn")), "n_id")
      .select(col("q_id"), col("n_id"),
        round(dot64("qe", "ne") / (col("qn") * col("nn")), 6).as("cos6"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .orderBy("q_id", "rk")
  }

  /** Embedding quality-control gate — the validation pass an embedding
    * pipeline runs before indexing (bad vectors poison ANN recall and
    * cosine math silently): per vector, the dimension, the L2 norm, and
    * flags for zero vectors, non-finite components, and dimension
    * mismatches. Scan-bound single projection — codegen'd higher-order
    * predicates over the float array, no shuffle, no explode.
    */
  def embedQc(spark: SparkSession, dir: String, expectDim: Int = 64): DataFrame =
    // no global ORDER BY — corpus-sized QC report (see embedQcFrom doc)
    embedQcFrom(Tables.embeddings(spark, dir), expectDim)

  /** `embedQc` over an arbitrary embeddings frame (unsorted — pipeline
    * consumers filter it, and a global sort of a corpus-sized QC report
    * is pure cost; the query entry adds the sort for readable diffs).
    */
  def embedQcFrom(emb: DataFrame, expectDim: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    emb
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        round(norm64("embedding"), 6).as("norm6"),
        expr("CAST(exists(embedding, x -> isnan(x) OR abs(x) = double('Infinity')) AS INT)")
          .as("flag_nonfinite"),
        expr("CAST(NOT exists(embedding, x -> x != 0.0F) AS INT)").as("flag_zero"))
      .withColumn("flag_dim", (col("dim") =!= expectDim).cast("int"))
  }
}
