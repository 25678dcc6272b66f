package graft
import org.apache.spark.sql.SparkSession

/** Prints a per-query plan audit: scan pushdown, read schema width,
  * broadcast vs shuffle joins, and whole-stage codegen coverage.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Graft.session(cpus = 8)
    // dev-only subset filter, same contract as Verify's
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        // pre-execution AQE plan: join/exchange/scan structure is final
        // enough to audit; codegen spans only exist in the post-execution
        // final plan, so they are not counted here
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        def count(s: String) = plan.sliding(s.length).count(_ == s)
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).size
        println(f"$name%-20s bhj=${count("BroadcastHashJoin")}%d smj=${count("SortMergeJoin")}%d " +
          f"shj=${count("ShuffledHashJoin")}%d bnlj=${count("BroadcastNestedLoopJoin")}%d " +
          f"exch=${count("Exchange")}%d scans=${count("FileScan")}%d pushedFilters=$pushed%d")
      } catch { case e: Throwable => println(s"$name AUDIT-ERROR ${e.getMessage}") }
    }
    spark.stop()
  }
}
