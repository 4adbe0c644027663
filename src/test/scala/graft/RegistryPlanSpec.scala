package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Registry-wide plan-shape gate: EVERY registered query's physical
  * plan must be free of CartesianProductExec — the one join shape that
  * cannot survive 100 TB. Broadcast nested-loop joins are allowed
  * (they are the designed shape for bounded-side inequality joins:
  * prefix-sum/-max offsets, top-k query broadcasts, range targets);
  * an unbounded-by-unbounded cartesian is not. This generalizes the
  * per-batch PlanAudit reads into a standing regression trap: a future
  * edit that drops a join condition or un-broadcasts a bounded side
  * fails here, not in a 100× production run. */
class RegistryPlanSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("no registry query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, mk) =>
        val plan = mk(spark, sf).queryExecution.executedPlan
        val hits = plan.collect { case c: CartesianProductExec => c }
        if (hits.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian products in: ${offenders.mkString(", ")}")
  }
}
