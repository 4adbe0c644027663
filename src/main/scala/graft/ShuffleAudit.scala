package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftMetricsHook
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume audit: runs every registered query once at the given
  * sf dir and attributes, per query, the bytes that actually moved —
  * input read from parquet, shuffle written, shuffle read, and spill.
  *
  * Rationale: wall-clock benches (Bench) measure THIS host; at 1000
  * executors the dominant cost is the network, and the quantity that
  * predicts it is shuffle bytes as a fraction of input bytes. A query
  * whose plan LOOKS one-exchange can still move the whole corpus twice
  * (e.g. a wide pre-aggregation projection defeating map-side combine);
  * this audit measures it instead of trusting the plan shape. The
  * artifact (shuffle_audit.json) is a per-query regression trap: a
  * change that silently doubles a query's shuffled bytes shows up here
  * even when local wall-clock hides it behind 32 fast cores.
  *
  * Attribution protocol: metrics accumulate from TaskEnd events (the
  * same numbers the Spark UI shows per stage); the async listener bus
  * is drained before and after every query so bytes land on the query
  * that caused them; every query runs self-contained (persisted RDDs
  * including SharedStage cores are swept between queries, as in
  * Verify) so a query's row carries its WHOLE cost, cold cores
  * included. Spill is recorded separately: non-zero spill at local
  * scale flags a per-partition working set that would OOM or thrash a
  * real executor at 100 TB partition sizes.
  *
  * Usage: runMain graft.ShuffleAudit [sfDir] [outJson]
  */
object ShuffleAudit {
  private final class Acc extends SparkListener {
    val inputBytes = new AtomicLong
    val shuffleWrite = new AtomicLong
    val shuffleRead = new AtomicLong
    val memSpill = new AtomicLong
    val diskSpill = new AtomicLong
    val tasks = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
        tasks.incrementAndGet()
      }
    }
    def snapshot: Seq[Long] = Seq(inputBytes.get, shuffleWrite.get,
      shuffleRead.get, memSpill.get, diskSpill.get, tasks.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outJson = if (args.length > 1) args(1) else "shuffle_audit.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    // Untimed warmup as in Bench: parquet footer reads etc. must not
    // land on the first query's input-byte row.
    Tables.names.foreach { t =>
      try {
        (if (t == "events") Tables.events(spark, sfDir)
         else Tables.table(spark, sfDir, t)).limit(1)
          .write.mode("overwrite").format("noop").save()
      } catch { case _: Throwable => () }
    }

    // Failed queries are recorded in the artifact, not just stderr:
    // the constrained-memory registry pass (r16 VERDICT item 4) runs
    // this same audit at a deliberately small heap, and "which queries
    // died and which spilled" IS that artifact's payload.
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        GraftMetricsHook.drainListenerBus(spark.sparkContext, 60000L)
        val before = acc.snapshot
        // Static shuffle-exchange count from the FINAL DataFrame's
        // executed plan (fn may run whole jobs building it — loop
        // queries — so fn is called exactly once and the plan is read
        // off the same instance that is then executed). Counted by
        // NODE WALK (ExchangeCount — r16 ADVICE replaced the
        // treeString regex): ShuffleExchangeLike nodes, descending
        // into AdaptiveSparkPlanExec/QueryStageExec/subquery subtrees;
        // BroadcastExchange is deliberately NOT counted (broadcasts
        // are the cheap shape the plans choose on purpose; the trap
        // is for shuffles) and neither is ReusedExchange (a reuse
        // reads an existing shuffle's files; only the original moved
        // data). Loop queries whose registered frame is a checkpoint
        // scan count 0 here (their exchanges ran inside the loop);
        // the byte columns carry their true cost. This is the
        // registry-wide plan-shape trap: a refactor that quietly adds
        // an Exchange to a one-shuffle query moves this number even
        // when AQE/local speed hides it from wall-clock.
        var exchanges = -1
        val ok =
          try {
            val df = fn(spark, sfDir)
            exchanges = ExchangeCount.shuffleExchanges(
              df.queryExecution.executedPlan)
            df.write.mode("overwrite").format("noop").save()
            true
          } catch { case e: Throwable =>
            System.err.println(s"[audit] $name failed: ${e.getMessage}")
            failed.put(name, s"${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r]", " ")
                .take(160))
            false
          }
        GraftMetricsHook.drainListenerBus(spark.sparkContext, 60000L)
        val after = acc.snapshot
        // Self-contained attribution: sweep ALL persisted blocks
        // (SharedStage cores included) so the next query pays — and is
        // billed for — its own materializations. The sweep's own task
        // metrics are nil (unpersist moves no data).
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        if (!ok) None
        else {
          val d = after.zip(before).map { case (a, b) => a - b }
          Some((name, d(0), d(1), d(2), d(3), d(4), d(5), exchanges))
        }
    }

    def fmtMB(b: Long): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(b / 1048576.0))
    // Standing reference gate (r16 VERDICT item 3): shuffle_ref.json
    // is a COMMITTED known-good audit (same format as this artifact's
    // "queries" map); any query whose shuffle-written bytes grow
    // >1.5x over its pin — with a 1 MB absolute floor so kilobyte
    // jitter from compression/codegen layout never flags — self-flags
    // in the artifact. This is the network-cost regression trap the
    // wall-clock bench cannot provide: shuffle bytes predict the
    // 1000-executor cost, and they are deterministic enough to pin
    // where wall-clock is not. Discipline mirrors bench_ref: a flag
    // means adjudicate the plan change, then re-pin deliberately —
    // never bump blind. Only comparable at the pin's scale factor.
    val refShuffle: Map[String, Double] =
      try {
        val s = java.nio.file.Files.readString(
          java.nio.file.Paths.get("shuffle_ref.json"))
        val refSf = "\"sf\":\\s*\"([^\"]+)\"".r.findFirstMatchIn(s)
          .map(_.group(1)).getOrElse("")
        if (refSf != sfDir) Map.empty
        else ("\"([A-Za-z0-9_]+)\":\\s*\\{\"input_mb\":[^}]*" +
          "\"shuffle_write_mb\":\\s*([0-9.]+)").r
          .findAllMatchIn(s)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val flagged = rows.flatMap { case (n, _, sw, _, _, _, _, _) =>
      val swMb = sw / 1048576.0
      refShuffle.get(n).collect {
        case ref if swMb > ref * 1.5 && swMb - ref > 1.0 =>
          // Divide by max(ref, 1 MB): a 0.00 MB pin (111 of the
          // committed pins) would otherwise yield Infinity, which
          // String.format renders as a bare non-JSON token exactly
          // when the gate fires. Against the 1 MB floor the ratio
          // stays finite and reads as "MB over the floor".
          n -> (swMb / math.max(ref, 1.0))
      }
    }.sortBy(-_._2)
    val qjson = rows.map { case (n, in, sw, sr, ms, ds, tk, ex) =>
      val ratio =
        if (in > 0) String.format(java.util.Locale.ROOT, "%.4f",
          Double.box(sw.toDouble / in))
        else "0.0"
      s"""  "$n": {"input_mb": ${fmtMB(in)}, "shuffle_write_mb": ${fmtMB(sw)}, "shuffle_read_mb": ${fmtMB(sr)}, "spill_mem_mb": ${fmtMB(ms)}, "spill_disk_mb": ${fmtMB(ds)}, "tasks": $tk, "exchanges": $ex, "shuffle_over_input": $ratio}"""
    }.mkString("{\n", ",\n", "\n}")
    val flaggedJson = flagged.map { case (n, r) =>
      "\"" + n + "\":" + String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(r))
    }.mkString("{", ",", "}")
    val failedJson = failed.map { case (n, m) =>
      "\"" + n + "\": \"" + m + "\""
    }.mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      s"""{"sf": "$sfDir", "ref_queries": ${refShuffle.size}, """ +
        s""""n_failed": ${failed.size}, "failed": $failedJson, """ +
        s""""flagged_vs_ref": $flaggedJson,\n"queries": $qjson\n}\n""")

    if (flagged.nonEmpty) {
      println(s"[audit] SHUFFLE REGRESSION vs shuffle_ref.json " +
        s"(${flagged.size} queries >1.5x pin):")
      flagged.foreach { case (n, r) =>
        println(f"[audit]   $n%-28s ${r}%.2fx pin") }
    } else if (refShuffle.nonEmpty)
      println(s"[audit] shuffle_ref gate: ${refShuffle.size} pins, " +
        "0 flagged")
    val zero = rows.count(_._3 == 0)
    val spilled = rows.filter(r => r._5 + r._6 > 0)
    println(s"[audit] sf=$sfDir queries=${rows.size} " +
      s"zero_shuffle=$zero spilling=${spilled.size}")
    println("[audit] top 25 by shuffle_write:")
    rows.sortBy(-_._3).take(25).foreach {
      case (n, in, sw, sr, _, _, _, _) =>
        val ratio = if (in > 0) sw.toDouble / in else 0.0
        println(f"[audit]   $n%-28s input=${fmtMB(in)}%9s MB  " +
          f"write=${fmtMB(sw)}%9s MB  read=${fmtMB(sr)}%9s MB  " +
          f"w/in=$ratio%6.2f")
    }
    if (spilled.nonEmpty) {
      println("[audit] queries that spilled:")
      spilled.sortBy(r => -(r._5 + r._6)).foreach {
        case (n, _, _, _, ms, ds, _, _) =>
          println(s"[audit]   $n mem=${fmtMB(ms)} MB disk=${fmtMB(ds)} MB")
      }
    }
    spark.stop()
  }
}
