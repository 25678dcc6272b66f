package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Literal, Murmur3Hash, Pmod}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project, ResolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extensions for plan shapes the engine keeps hitting.
  *
  * `SingleRowCrossToEquiJoin` automates the derived-constant-key idiom
  * documented in SURVEY §5 (Curate.domainMix): a cross/inner join with
  * no condition against a known 1-row side (a global aggregate — the
  * "corpus totals" frame every normalization pass produces) is
  * semantically a broadcast fan-out, but Spark plans it as a
  * BroadcastNestedLoopJoin. A literal join key cannot fix it —
  * ConstantFolding folds `lit(0) === lit(0)` to `true` and the nested
  * loop returns — so the rule appends a NON-FOLDABLE zero key derived
  * from each side's first output attribute (`pmod(hash(attr), 1)`,
  * always 0, never foldable) and rewrites to an equi-join, which the
  * planner then executes as a BroadcastHashJoin. Pure win: identical
  * semantics (every row matches the single row; empty side → empty
  * either way), hash-join instead of nested-loop.
  *
  * Registered two ways, mirroring GraftFunctions: injected through
  * `GraftSparkExtensions` for SQL-first sessions, appended to
  * `spark.experimental.extraOptimizations` by
  * `GraftFunctions.register` for programmatic ones.
  */
object SingleRowCrossToEquiJoin extends Rule[LogicalPlan] {

  private def singleRow(p: LogicalPlan): Boolean = p.maxRows.contains(1L)

  /** True when the plan returns EXACTLY one row on any input: a global
    * aggregate (no grouping — 1 row even over an empty child), possibly
    * under pruning Projects or hints. `maxRows == 1` alone is not
    * enough for join ELIMINATION (a limit/filter can return zero rows,
    * and eliminating the join would then wrongly keep the other side).
    */
  private def exactlyOneRow(p: LogicalPlan): Boolean = p match {
    case Project(_, c)        => exactlyOneRow(c)
    case ResolvedHint(c, _)   => exactlyOneRow(c)
    case a: Aggregate         => a.groupingExpressions.isEmpty
    case _                    => false
  }

  /** The rewrite hashes each side's first output attribute; types hash()
    * rejects (MapType by default, VariantType) would make the injected
    * expression fail analysis — fall through to the original join there.
    */
  private def hashable(p: LogicalPlan): Boolean =
    Murmur3Hash(Seq(p.output.head), 42).checkInputDataTypes().isSuccess

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // column pruning can empty a 1-row side entirely (a composed query
    // keeps none of the totals columns): the join then contributes no
    // columns and no row-count change, so drop it — the equi-join
    // rewrite below can't apply (nothing to hash on the empty side) and
    // the join would otherwise fall back to a nested loop
    case j @ Join(left, right, Inner | Cross, None, _)
        if right.output.isEmpty && exactlyOneRow(right) =>
      Project(j.output, left)
    case j @ Join(left, right, Inner | Cross, None, _)
        if left.output.isEmpty && exactlyOneRow(left) =>
      Project(j.output, right)
    case j @ Join(left, right, Inner | Cross, None, hint)
        if (singleRow(right) || singleRow(left)) &&
          left.output.nonEmpty && right.output.nonEmpty &&
          hashable(left) && hashable(right) =>
      val lk = Alias(Pmod(Murmur3Hash(Seq(left.output.head), 42),
        Literal(1)), "__graft_cross_lk")()
      val rk = Alias(Pmod(Murmur3Hash(Seq(right.output.head), 42),
        Literal(1)), "__graft_cross_rk")()
      val rewritten = Join(
        Project(left.output :+ lk, left),
        Project(right.output :+ rk, right),
        j.joinType,
        Some(EqualTo(lk.toAttribute, rk.toAttribute)),
        hint)
      Project(j.output, rewritten)
  }
}
