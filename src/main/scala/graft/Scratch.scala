package graft

import org.apache.spark.sql.functions._

/** Temporary stage-level profiler for the slow dedup queries (dev tool). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Graft.session()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s  -> $r")
      r
    }
    import graft.core.Tables
    import graft.sim.Vectors.{dot64, norm64}

    // warm
    time("warm q1")(Tables.lineitem(spark, dir).count())

    // --- embedding sub-stages
    val blocks = 16
    val e = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .withColumn("norm", norm64("embedding"))
      .withColumn("blk", (col("vec_id") % blocks).cast("int"))
    import spark.implicits._
    val grid = (0 until blocks).flatMap(i => (0 until blocks).map(j => (i, j)))
      .toDF("ba", "bb")
    val paired = e.as("a").join(broadcast(grid), col("a.blk") === col("ba"))
      .repartition(col("ba"), col("bb"))
      .join(e.as("b"), col("bb") === col("b.blk") && col("a.vec_id") < col("b.vec_id"))
    time("emb pair grid only")(paired.count())
    time("emb grid+dot")(paired
      .withColumn("cos6",
        round(dot64("a.embedding", "b.embedding") / (col("a.norm") * col("b.norm")), 6))
      .filter(col("cos6") >= 0.35).count())
    time("emb full query")(graft.dedup.Dedup.dedupEmbedding(spark, dir).count())

    // --- minhash sub-stages
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))").as("s"))
    val n = spark.sessionState.conf.numShufflePartitions * 4
    val banded = sets.repartition(col("doc_id")).select(
      col("doc_id"),
      explode(expr(
        """transform(sequence(0, 63), b -> xxhash64(b,
             array_min(transform(s, t -> xxhash64(t, 2*b))),
             array_min(transform(s, t -> xxhash64(t, 2*b+1)))))"""
      )).as("bucket"))
    time("mh banded rows")(banded.count())
    val capped = banded.repartition(n, col("bucket"))
    val joined = capped.as("x")
      .join(capped.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    time("mh joined (pre-distinct)")(joined.count())
    val cands = joined.distinct()
    time("mh cands (distinct)")(cands.count())
    val verified = cands
      .join(broadcast(sets.select(col("doc_id").as("doc_a"), col("s").as("sa"))), "doc_a")
      .join(broadcast(sets.select(col("doc_id").as("doc_b"), col("s").as("sb"))), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("uni",
        (size(col("sa")) + size(col("sb"))).cast("long") - col("inter"))
      .filter(lit(2) * col("inter") >= col("uni"))
      .select("doc_a", "doc_b", "inter", "uni")
    time("mh verify bcast")(verified.count())
    time("mh full query (shuffle verify)")(graft.dedup.Dedup.dedupMinhash(spark, dir).count())
    spark.stop()
  }
}
