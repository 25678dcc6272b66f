package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RulesSpec extends SparkSpec {

  test("1-row cross joins rewrite to hash joins with identical results") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "n_chars")
    val totals = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).as("total_chars"))
    val joined = docs.crossJoin(broadcast(totals))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"single-row cross join not rewritten:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    // semantics: every left row appears once, carrying the global totals
    val rows = joined.collect()
    val n = docs.count()
    val tot = docs.agg(sum(col("n_chars"))).first().getLong(0)
    assert(rows.length == n)
    assert(rows.forall(r =>
      r.getAs[Long]("n_docs") == n && r.getAs[Long]("total_chars") == tot))
  }

  test("a pruned-empty 1-row side eliminates the join instead of nested-looping") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "n_chars")
    val totals = docs.agg(count(lit(1)).as("n_docs"))
    // downstream keeps NO totals column: pruning empties the 1-row
    // side's output, the equi-join rewrite has nothing to hash, and
    // pre-fix the plan fell back to BroadcastNestedLoopJoin
    val composed = docs.crossJoin(broadcast(totals)).select("doc_id", "n_chars")
    val plan = composed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"pruned-empty single-row side not eliminated:\n$plan")
    assert(composed.count() == docs.count())
    // a LIMITED side may return zero rows — eliminating that join would
    // wrongly keep all left rows, so it must NOT be eliminated even
    // when pruning empties its output
    val maybeEmpty = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey").filter(col("o_orderkey") < 0).limit(1)
    val kept = docs.crossJoin(broadcast(maybeEmpty)).select("doc_id", "n_chars")
    assert(kept.count() == 0)
  }

  test("the rewrite skips 1-row sides whose head attribute is unhashable") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id")
    // a 1-row aggregate whose FIRST output column is a MapType — hash()
    // rejects maps by default, so the rule must fall through and leave
    // the (working) nested-loop plan in place rather than inject an
    // expression that fails type checking
    val totals = graft.core.Tables.documents(spark, sf)
      .agg(map(lit("n"), count(lit(1))).as("m"))
    val joined = docs.crossJoin(broadcast(totals))
    assert(joined.count() == docs.count())
  }

  test("the rewrite leaves conditioned and multi-row joins alone") {
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "lang")
    // multi-row cross join (5-row side): must stay a nested loop —
    // rewriting it would change nothing semantically but the rule must
    // not claim joins it cannot prove single-row
    val langs = docs.select("lang").distinct().limit(5)
    val cross = docs.crossJoin(broadcast(langs.select(col("lang").as("l2"))))
    assert(cross.count() == docs.count() * langs.count())
    // equi-join unaffected
    val eq = docs.join(
      docs.groupBy("lang").count().withColumnRenamed("lang", "l3"),
      col("lang") === col("l3"))
    assert(eq.count() == docs.count())
  }
}
