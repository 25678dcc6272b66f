package graft

import org.apache.spark.sql.functions._

/** Temporary stage-level profiler for the heavy queries (dev tool). */
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
    graft.functions.GraftFunctions.register(spark)

    time("warm q1")(Tables.lineitem(spark, dir).count())

    // minhash sub-stages on the new component-based path
    val sets = Tables.documents(spark, dir)
      .select(col("doc_id"),
        expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))").as("s"))
    val sorted = sets.select(col("doc_id"), array_sort(col("s")).as("s"))
      .repartition(col("doc_id"))
    val banded = sorted.select(col("doc_id"),
      explode(call_function("minhash_band_buckets", col("s"), lit(64))).as("bucket"))
    time("mh banded rows")(banded.count())
    val edges = banded
      .withColumn("root",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id"), col("root")).distinct()
    time("mh star edges")(edges.count())
    time("mh full query")(graft.dedup.Dedup.dedupMinhash(spark, dir).count())
    time("ngram full query")(graft.dedup.Dedup.ngramJaccard(spark, dir).count())
    time("emb full query")(graft.dedup.Dedup.dedupEmbedding(spark, dir).count())
    time("cosine_topk")(graft.sim.Similarity.cosineTopK(spark, dir).count())
    time("ann_lsh")(graft.sim.Similarity.annLsh(spark, dir).count())
    time("simhash_fp")(graft.dedup.Dedup.simhashFp(spark, dir).count())
    spark.stop()
  }
}
