package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Shuffle-exchange counter over a physical plan, by NODE WALK rather
  * than a regex over `treeString` (r16 ADVICE): plan-text formatting is
  * not a stable API — a Spark version bump that reworded the `Exchange`
  * line would shift every pinned count wholesale — while the node
  * types (`ShuffleExchangeLike`, `ReusedExchangeExec`) are the
  * planner's own vocabulary. Semantics:
  *
  *  - `ShuffleExchangeLike` counts 1 (data moves across the network);
  *  - `BroadcastExchange*` does not count (broadcasts are the cheap
  *    shape the plans choose on purpose; the trap is for shuffles);
  *  - `ReusedExchangeExec` counts 0 AND is not descended into — a
  *    reuse reads an existing shuffle's files; only the original
  *    moved data (its subtree is the original exchange, which the
  *    walk reaches through the original reference);
  *  - `AdaptiveSparkPlanExec` is a leaf to `collect`, so the walk
  *    descends explicitly into its current physical plan (the
  *    initial, EnsureRequirements-applied plan pre-execution — the
  *    getter does not force finalization), and likewise into
  *    materialized `QueryStageExec` subtrees;
  *  - physical subquery plans (`plan.subqueries`) are walked too: a
  *    shuffle inside a scalar subquery is real data movement.
  *
  * A shared un-reused subtree referenced from two parents is counted
  * once per reference — identical to how the plan executes it absent
  * exchange reuse, and identical to the old text count, so the pinned
  * numbers carry over. */
object ExchangeCount {
  def shuffleExchanges(plan: SparkPlan): Int = {
    def walk(p: SparkPlan): Int = p match {
      case _: ReusedExchangeExec => 0
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other =>
        val self = other match {
          case _: ShuffleExchangeLike => 1
          case _ => 0
        }
        self + other.children.map(walk).sum +
          other.subqueries.map(walk).sum
    }
    walk(plan)
  }
}
