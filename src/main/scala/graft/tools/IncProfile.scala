package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Decisions, Graft, Tables}
import graft.dedup.{Dedup, MinhashIndexStore}
import graft.functions.GraftFunctions

/** Diagnostic main: stage-level wall-time breakdown of the incremental
  * dedup paths (`dedup_incremental` vs `dedup_incremental_indexed`) at a
  * given corpus dir — the evidence behind the "load beats recompute"
  * claim. Times each stage by forcing it with a noop write / count.
  *
  * Usage: IncProfile <sfDir>
  */
object IncProfile {

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    import spark.implicits._

    val docs = Tables.documents(spark, dir)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val base = timed("ensure_index")(MinhashIndexStore.ensureMinhashIndex(spark, dir))

    Decisions.clear()
    timed("indexed_e2e") {
      MinhashIndexStore.dedupIncrementalAgainstIndex(batch, base)
        .write.format("noop").mode("overwrite").save()
    }
    Decisions.snapshot().foreach(d =>
      println(s"DECISION ${d.site} ${d.choice} stat=${d.stat} thr=${d.threshold}"))

    Decisions.clear()
    timed("recompute_e2e") {
      Dedup.dedupIncremental(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    Decisions.snapshot().foreach(d =>
      println(s"DECISION ${d.site} ${d.choice} stat=${d.stat} thr=${d.threshold}"))

    // canonicalization statistics: how far distinct-set grouping
    // compresses each side (the factor every quadratic stage now scales
    // by instead of document count)
    timed("canonical_stats") {
      val sig = docs.select(col("doc_id"),
        array_sort(expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"))
          .as("s"), (col("doc_id") % 5 === 0).as("is_new"))
      val g = sig.groupBy("s")
        .agg(max(col("is_new")).as("any_new"), count(lit(1)).as("n"))
      println(s"  docs=${docs.count()} groups=${g.count()} " +
        s"batch_groups=${g.filter(col("any_new")).count()} " +
        s"index_sets=${spark.read.parquet(s"$base/sets").count()}")
    }
    spark.stop()
  }
}
