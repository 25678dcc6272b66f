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

    // ngram component structure
    val sets = Tables.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        call_function("ngram_hash_set", split(col("text"), " "), lit(3)).as("s"))
      .filter(size(col("s")) > 0)
    val sorted = sets.select(col("doc_id"), array_sort(col("s")).as("s"))
      .localCheckpoint()
    val banded = sorted.select(col("doc_id"),
      explode(call_function("minhash_band_buckets", col("s"), lit(64))).as("bucket"))
    val edges = banded
      .withColumn("root",
        min(col("doc_id")).over(org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("src"), col("root").as("dst"))
    time("ng star edges")(edges.count())
    val labels = time("ng CC")(graft.dedup.Components.minLabels(edges)).asInstanceOf[org.apache.spark.sql.DataFrame]
    time("ng nodes in comps")(labels.count())
    val compSizes = labels.groupBy("lbl").count()
    println("[scratch] ng comp size histogram: " +
      compSizes.groupBy("count").agg(count(lit(1)).as("n")).orderBy(desc("count"))
        .limit(12).collect().map(r => s"${r.get(0)}x${r.get(1)}").mkString(", "))
    val candPairs = compSizes.select(sum(col("count") * (col("count") - 1) / 2)).first().get(0)
    println(s"[scratch] ng candidate pairs: $candPairs")

    time("ng full query #1")(graft.dedup.Dedup.ngramJaccard(spark, dir).count())
    time("ng full query #2")(graft.dedup.Dedup.ngramJaccard(spark, dir).count())
    time("mh full query")(graft.dedup.Dedup.dedupMinhash(spark, dir).count())
    spark.stop()
  }
}
