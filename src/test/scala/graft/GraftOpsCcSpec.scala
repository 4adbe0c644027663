package graft

import graft.api.GraftOps

/** Bounded-round connected components: label = min id within `rounds`
  * hops, exact CC once rounds ≥ diameter. */
class GraftOpsCcSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
  // Chain 1-2-3-4-5 (diameter 4) + isolated node 9.
  private val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")

  private def run(rounds: Int): Map[Long, Long] =
    GraftOps.connectedComponents(nodes, "id", edges, "a", "b", rounds)
      .as[(Long, Long)].collect().toMap

  test("rounds >= diameter yields exact components") {
    assert(run(4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 9L -> 9L))
  }

  test("round t label = min id within distance t") {
    assert(run(1) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L, 9L -> 9L))
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L,
      5L -> 3L, 9L -> 9L))
  }

  test("edge direction does not matter") {
    val rev = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)).toDF("a", "b")
    val out = GraftOps.connectedComponents(nodes, "id", rev, "a", "b", 4)
      .as[(Long, Long)].collect().toMap
    assert(out == run(4))
  }
}
