package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.core.{Decisions, Graft}

/** Diagnostic main: run the statistics-adaptive queries at one or more
  * scale-factor directories and report which physical strategy each
  * chooser took (`core.Decisions`), so scale-up behaviour is stated
  * from the engine's own records rather than inferred from wall time.
  *
  * Usage: StrategyReport <sfDir> [<sfDir> ...]
  *
  * Output: one line per (dir, query, decision) —
  * `dir query site choice stat threshold`.
  */
object StrategyReport {

  /** The query entries whose plans contain an adaptive switch. */
  private val Adaptive = Seq(
    "dedup_minhash", "dedup_cluster", "dedup_cluster_best",
    "dedup_cluster_best_indexed", "dedup_incremental",
    "dedup_incremental_indexed", "simhash_near", "ngram_jaccard",
    "dedup_embedding_lsh", "para_dedup", "shard_pack", "seq_pack")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StrategyReport <sfDir> [<sfDir> ...]")
    val spark = Graft.session()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach(dir => report(spark, dir))
    spark.stop()
  }

  def report(spark: SparkSession, dir: String): Unit =
    Adaptive.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        Decisions.clear()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        Decisions.snapshot().foreach { d =>
          println(f"$dir $name ${d.site} ${d.choice} " +
            f"stat=${d.stat}%.0f threshold=${d.threshold}%.0f")
        }
      }
    }
}
