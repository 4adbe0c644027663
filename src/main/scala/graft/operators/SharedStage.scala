package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Materialized-stage layer (r13 VERDICT item 8): lets compositions
  * DECLARE a shared upstream instead of re-deriving it per registry
  * entry.
  *
  * The registry contract is one-query-one-plan — `mm_video_keep_best`
  * and `pipeline_video_retention` each build their own full plan, so
  * the keep-best core (demux → star edges → fixpoint CC) runs twice
  * when both queries execute in one session. That is correct and
  * cheap at sf0.1 (~2 s), but in a real deployment the shared stage
  * is the expensive part and the composition should pay it once.
  *
  * `SharedStage(key)(build)` memoizes the stage's EAGER localCheckpoint
  * per (session, key): the first caller materializes, later callers
  * read the stored blocks. Liveness is checked against the
  * checkpointed RDD's storage level, NOT assumed: sweeping harnesses
  * unpersist RDDs between queries, and a swept localCheckpoint cannot
  * be recomputed (truncated lineage), so a dead entry is silently
  * REBUILT rather than returned. Verify sweeps EVERYTHING between
  * queries (correctness runs want maximal independence), so each
  * Verify query still derives its stages itself; Bench excludes the
  * alive stages from its sweep via `liveRddIds` (r15 VERDICT item 6),
  * so a shared core is built once per bench pass — the long-lived-
  * session semantics — and the repeat that paid the build is recorded
  * (core_builds). In a long-lived session (notebook, service, test
  * suite) consecutive consumers share one materialization. Oracle
  * hashes are unchanged by construction — the memoized plan IS the
  * plan each query built before, checkpoint included.
  *
  * Scale note: the stage is node-local blocks (localCheckpoint), the
  * right tool at one-session scope. A multi-job deployment sharing
  * across drivers should replace the body with a parquet/Delta
  * staging table — the call sites would not change.
  */
object SharedStage {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private val builds =
    scala.collection.concurrent.TrieMap.empty[String, Int]

  private def alive(df: DataFrame): Boolean =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.getStorageLevel != StorageLevel.NONE
      case _ => false
    }

  def apply(session: org.apache.spark.sql.SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    val k = s"${System.identityHashCode(session)}:$key"
    cache.get(k).filter(alive).getOrElse {
      val built = build.localCheckpoint()
      cache.put(k, built)
      builds.updateWith(k) { c => Some(c.getOrElse(0) + 1) }
      built
    }
  }

  /** How many times `key`'s stage has been MATERIALIZED in `session`
    * (cache hits don't count) — the observable the sharing spec pins:
    * two consumers, one build. */
  def buildsFor(session: org.apache.spark.sql.SparkSession,
      key: String): Int =
    builds.getOrElse(s"${System.identityHashCode(session)}:$key", 0)

  /** Total stage materializations in `session` across all keys. A
    * harness diffs this around a query run to attribute cold-core
    * builds to the repeat that paid them (Bench's core_builds field). */
  def totalBuilds(session: org.apache.spark.sql.SparkSession): Int = {
    val p = s"${System.identityHashCode(session)}:"
    builds.collect { case (k, v) if k.startsWith(p) => v }.sum
  }

  /** RDD ids of the currently-ALIVE memoized stages for `session`.
    * Sweeping harnesses (Bench) unpersist every persistent RDD between
    * queries EXCEPT these, so a shared core is paid once per bench
    * pass — the long-lived-session semantics this layer exists for —
    * instead of being rebuilt cold on every repeat (r15 VERDICT item
    * 6: pipeline_media_retention's repeats swung 5.5→24 s on core
    * churn). Verify keeps the sweep-everything discipline: correctness
    * runs want maximal independence, not warm caches. */
  def liveRddIds(session: org.apache.spark.sql.SparkSession): Set[Int] = {
    val p = s"${System.identityHashCode(session)}:"
    cache.collect {
      case (k, df) if k.startsWith(p) && alive(df) =>
        df.queryExecution.analyzed match {
          case lr: LogicalRDD => lr.rdd.id
        }
    }.toSet
  }
}
