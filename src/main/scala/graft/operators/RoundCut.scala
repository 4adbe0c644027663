package graft.operators

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Round-state materializer for iterative loops (PageRank, label
  * propagation, CC fixpoint, k-core, k-means, BFS).
  *
  * Two memory-pressure problems with the naive
  * `state = state.localCheckpoint()` round loop (r13 VERDICT finding 2
  * — the official bench ran the graph iteratives 3-7x slower under a
  * co-tenant memory squeeze):
  *
  *   1. every round's blocks stay persisted until the whole query
  *      finishes, so an N-round loop holds N copies of the state in the
  *      unified memory pool, shrinking execution memory and pushing
  *      UNRELATED joins into spill;
  *   2. the default localCheckpoint level stores deserialized blocks,
  *      the largest possible footprint for the squeezed case.
  *
  * `cut` fixes both: it checkpoints eagerly at MEMORY_AND_DISK_SER
  * (serialized, disk-spillable — a squeezed run degrades by the
  * serialization percentage, not by recompute multiples) and retains
  * only the last `keepLast` round states, unpersisting older ones as
  * soon as the newest is materialized. `keepLast` defaults to 2 (the
  * round being built reads the previous round's blocks during the
  * eager materialization; once `cut` returns, N-1 could go, but
  * keeping it costs one extra state and guards consumers that re-read
  * it). Loops whose round tail is re-read after the NEXT cut (the
  * fixpoint-CC change probe reads round N-1 after round N's two cuts)
  * pass keepLast = 3.
  *
  * The unpersist targets the EXACT checkpointed RDD (via the returned
  * Dataset's LogicalRDD), not a diff of the session's persistent-RDD
  * registry — concurrent queries in the same session (parallel test
  * suites) can never have their blocks swept by someone else's loop.
  *
  * IMPORTANT: a localCheckpointed Dataset cannot be recomputed after
  * its blocks are dropped (lineage is truncated) — `cut` must only
  * release states the loop provably never reads again, which is what
  * `keepLast` encodes. The LAST round's state is never released here;
  * it flows into the caller's plan and is reclaimed by the session
  * sweep (Bench unpersists all persistent RDDs after each query).
  */
final class RoundCut(keepLast: Int = 2,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER) {
  require(keepLast >= 1, "RoundCut: keepLast must be >= 1")
  private val held = mutable.Queue.empty[RDD[_]]

  def cut[T](ds: Dataset[T]): Dataset[T] = {
    val out = ds.localCheckpoint(true, level)
    out.queryExecution.analyzed match {
      case lr: LogicalRDD => held.enqueue(lr.rdd)
      case _ => () // not a LogicalRDD (unexpected) — skip tracking;
                   // the session-level sweep still reclaims it
    }
    while (held.size > keepLast)
      held.dequeue().unpersist(blocking = false)
    out
  }
}
