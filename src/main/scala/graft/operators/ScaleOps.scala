package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out utilities for the shapes AQE can't always fix on its own
  * (SURVEY §4 "Partitioning & shuffle" posture):
  *
  *  - **Salted join** for skewed keys: a handful of hot keys (the
  *    "null dispensary" / celebrity-user problem) overload one reducer in
  *    a shuffle join. Salting splits each hot key's left rows across
  *    `saltFactor` sub-partitions and replicates the (small-per-key)
  *    right rows to all of them — same result set, `saltFactor`-way
  *    parallel. Deterministic: the salt is a hash of the whole left row,
  *    not a random number, so retries/speculative tasks agree.
  *
  *  - **Bucketed tables** for repeat co-located joins: pre-shuffle both
  *    fact tables into the same bucket layout once at write time; every
  *    subsequent equi-join on the bucket key runs shuffle-free (verified
  *    by plan assertion in ScaleOpsSpec).
  */
object ScaleOps {

  /** Equi-join `left.key == right.key` with the left side salted.
    * Use when `left` is large and skewed on `key`, and `right` is too big
    * to broadcast but small per key. Result equals the plain inner join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.toIndexedSeq.map(col): _*),
        lit(saltFactor)))
    val salts = explode(sequence(lit(0), lit(saltFactor - 1)))
    val saltedRight = right.withColumn("__salt", salts)
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }

  /** Write `df` bucketed by `key` into the session catalog as `table`.
    * Both sides of a repeated join written this way join without any
    * Exchange (bucket layout replaces the shuffle). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Partitioned-by-column write: directory-level partition pruning for
    * the common time/tenant predicates (PartitionFilters in the scan).
    * Repartitions by (keys, bounded salt) first so each Hive partition
    * is written by at most `saltBuckets` tasks — without any
    * repartition, every task writes a file into every partition
    * directory (tasks × partitions small files, the classic layout
    * failure at scale); repartitioning by the bare keys instead routes
    * a hot partition value's entire data to ONE task (straggler/OOM at
    * 100 TB — maxRecordsPerFile splits files, not work). The salt
    * bounds both failure modes: ≤ saltBuckets files per partition dir
    * (before maxRecordsPerFile splits) and hot values spread over
    * saltBuckets tasks. saltBuckets=1 recovers the strict
    * one-task-per-partition layout for known-uniform keys. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], saltBuckets: Int = 8): Unit = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    require(!df.columns.contains("__salt"),
      "writePartitioned: input already has a __salt column (reserved); " +
        "rename or drop it before writing")
    // Deterministic salt (content hash, not monotonically_increasing_id):
    // a nondeterministic shuffle key can drop/duplicate rows when a map
    // task is retried after some reducers already fetched its output.
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(saltBuckets)))
    salted
      .repartition(partitionCols.map(col) :+ col("__salt"): _*)
      .drop("__salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 1000000L)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
