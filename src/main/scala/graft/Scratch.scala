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

    time("ng full query")(graft.dedup.Dedup.ngramJaccard(spark, dir).count())
    time("dedup_cluster")(graft.dedup.Dedup.dedupCluster(spark, dir).count())
    time("ann_ivf")(graft.sim.Similarity.annIvf(spark, dir).count())
    time("post-cluster ref_resolve")(graft.json.JsonOps.refResolve(spark, dir).count())
    time("mh full query")(graft.dedup.Dedup.dedupMinhash(spark, dir).count())
    time("simhash_fp")(graft.dedup.Dedup.simhashFp(spark, dir).count())
    time("ann_lsh")(graft.sim.Similarity.annLsh(spark, dir).count())
    time("search_doc")(graft.index.Indexing.searchDoc(spark, dir).count())
    spark.stop()
  }
}
