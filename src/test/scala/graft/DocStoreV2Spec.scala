package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.jobs.ImportJob
import graft.sinks.Sinks

/** The DataSource V2 document sink (`format("graft-docs")`): commit
  * protocol semantics — idempotent replayed batches, schema
  * enforcement, streaming restart parity — plus the ImportJob leg that
  * writes through it (r17 VERDICT item 3). */
class DocStoreV2Spec extends SparkSpec {
  import spark.implicits._

  private val DocSchema = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("doc", StringType, nullable = true)))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  private def readStore(path: String) =
    spark.read.schema(DocSchema).json(path)

  test("batch write lands under its batch_id partition and reads back " +
      "value-exactly, including JSON-hostile characters") {
    val store = tmp("graft-docs-batch")
    val docs = Seq(
      ("a1", """{"k":"plain"}"""),
      ("a2", "line1\nline2\t\"quoted\" \\slash ctl"),
      ("a3", null)).toDF("_id", "doc")
    docs.write.format("graft-docs")
      .option("path", store).option("batchId", 7L)
      .mode("append").save()
    val back = readStore(store)
    // the batch_id layout surfaces as a partition column for free
    assert(back.columns.toSet == Set("_id", "doc", "batch_id"))
    val rows = back.select("_id", "doc").as[(String, String)]
      .collect().toMap
    assert(rows == Map("a1" -> """{"k":"plain"}""",
      "a2" -> "line1\nline2\t\"quoted\" \\slash ctl",
      "a3" -> null),
      s"round-trip mismatch: $rows")
    assert(back.select("batch_id").distinct.as[Long].collect()
      .toSeq == Seq(7L))
  }

  test("a replayed batch id replaces its own partition; a new batch id " +
      "appends — the idempotent-restart contract") {
    val store = tmp("graft-docs-replay")
    def write(ids: Seq[String], batchId: Long): Unit =
      ids.map(i => (i, s"""{"v":"$i"}""")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", batchId)
        .mode("append").save()
    write(Seq("a", "b"), 0L)
    write(Seq("c"), 1L)
    val committed = readStore(store)
      .as[(String, String, Long)].collect().toSet
    assert(committed.map(r => (r._1, r._3)) ==
      Set(("a", 0L), ("b", 0L), ("c", 1L)))
    // replay batch 0 (retried job / restarted driver): store unchanged
    write(Seq("a", "b"), 0L)
    assert(readStore(store).as[(String, String, Long)].collect().toSet
      == committed, "replaying batch 0 changed the store")
    // a replayed batch REPLACES its partition — a shrunken recompute
    // cannot leave stale rows behind
    write(Seq("a"), 0L)
    assert(readStore(store).filter(col("batch_id") === 0L)
      .select("_id").as[String].collect().toSeq == Seq("a"),
      "replaced batch 0 left stale rows")
    // a crashed publish's orphaned swap dir (staged but never swapped)
    // is swept by the replayed publish of the same id
    val orphan = java.nio.file.Paths.get(store, "_staging",
      ".publish-0-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(orphan.resolve("part-x.jsonl"), "junk")
    write(Seq("a"), 0L)
    assert(!java.nio.file.Files.exists(orphan),
      "replayed publish did not sweep its crashed predecessor's orphan")
  }

  test("the fixed store schema is enforced at plan time") {
    val store = tmp("graft-docs-schema")
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("id", "doc")
        .write.format("graft-docs").option("path", store)
        .mode("append").save()
    }
    assert(e.getMessage.contains("graft-docs serves"),
      s"wrong error: ${e.getMessage}")
    val e2 = intercept[Exception] {
      Seq(("a", "x")).toDF("_id", "doc")
        .write.format("graft-docs").mode("append").save()
    }
    assert(e2.getMessage.toLowerCase.contains("path"),
      s"wrong error: ${e2.getMessage}")
  }

  test("streaming write: restart from checkpoint cannot duplicate a " +
      "committed epoch; each epoch owns one batch_id partition") {
    implicit val sqlCtx = spark.sqlContext
    val store = tmp("graft-docs-stream")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-ckpt").toString
    val stream = MemoryStream[(String, String)]
    def start() = stream.toDF().toDF("_id", "doc")
      .writeStream.format("graft-docs")
      .option("path", store).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    stream.addData(Seq(("s1", "d1"), ("s2", "d2")))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the SAME checkpoint — committed epoch 0 must not
    // re-emit; the new data lands in the next epoch's partition
    stream.addData(Seq(("s3", "d3")))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = readStore(store).as[(String, String, Long)]
      .collect().toSet
    assert(rows == Set(("s1", "d1", 0L), ("s2", "d2", 0L),
      ("s3", "d3", 1L)),
      s"restarted stream state wrong: $rows")
  }

  test("native read path: equals the raw-JSON read, prunes batch_id " +
      "partitions at the directory level, prunes columns, and keeps " +
      "_id predicates post-scan") {
    val store = tmp("graft-docs-read")
    for (b <- 0L to 2L)
      Seq((s"id-$b-1", s"doc-$b-1"), (s"id-$b-2", "x\n\"y\\z"))
        .toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()

    // full native read == the schema'd json read of the same layout
    val native = spark.read.format("graft-docs").load(store)
    assert(native.schema.fieldNames.toSeq ==
      Seq("_id", "doc", "batch_id"))
    assert(native.as[(String, String, Long)].collect().toSet ==
      readStore(store).as[(String, String, Long)].collect().toSet)

    // batch_id >= 1 must plan only the two matching directories'
    // files — pruning happens in planInputPartitions, not post-scan.
    // maxPartitionBytes=1 forces one file per partition so the
    // partition count is a direct proxy for files planned (the
    // default bin-packs everything here into one partition).
    val perFile = spark.read.format("graft-docs")
      .option("maxPartitionBytes", "1").load(store)
    val pruned = perFile.filter(col("batch_id") >= 1L)
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec => b
    }
    assert(scans.nonEmpty, "no BatchScanExec in the native read plan")
    val all = perFile.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2
        .BatchScanExec => b
    }
    assert(scans.head.inputPartitions.size <
      all.head.inputPartitions.size,
      s"batch_id predicate did not prune partitions " +
        s"(${scans.head.inputPartitions.size} of " +
        s"${all.head.inputPartitions.size})")
    assert(pruned.select("batch_id").distinct.as[Long].collect()
      .toSet == Set(1L, 2L))

    // column pruning: a projection narrower than the store schema
    assert(spark.read.format("graft-docs").load(store)
      .select("_id").as[String].collect().toSet ==
      (for (b <- 0 to 2; i <- 1 to 2) yield s"id-$b-$i").toSet)

    // a declined (_id) predicate still evaluates correctly post-scan
    assert(native.filter(col("_id") === "id-1-2")
      .select("doc").as[String].collect().toSeq == Seq("x\n\"y\\z"))
  }

  test("streaming read tails committed batches exactly once across a " +
      "restart from checkpoint") {
    val store = tmp("graft-docs-tail")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-tail-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-docs-tail-out").toString
    def writeBatch(ids: Seq[String], b: Long): Unit =
      ids.map(i => (i, s"d-$i")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    def start() = spark.readStream.format("graft-docs").load(store)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    // phase 1: two committed batches exist before the stream starts
    writeBatch(Seq("t0"), 0L)
    writeBatch(Seq("t1"), 1L)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == Set("t0", "t1"))

    // phase 2: a batch lands while the stream is DOWN; the restart
    // must emit exactly it — never re-emit the checkpointed range
    writeBatch(Seq("t2"), 2L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(out)
      .select("_id", "batch_id").as[(String, Long)].collect().toSeq
    assert(rows.sorted == Seq(("t0", 0L), ("t1", 1L), ("t2", 2L)),
      s"restarted tail emitted $rows")
  }

  test("bin-packing: many tiny committed files collapse into few " +
      "partitions at a byte target; per-file parity holds " +
      "(r18 VERDICT item 4)") {
    val store = tmp("graft-docs-pack")
    // 12 batches × 1 tiny file — the many-tiny-micro-batch shape
    for (b <- 0L until 12L)
      Seq((s"p$b", s"v$b")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    def partsAt(target: String): Int =
      spark.read.format("graft-docs")
        .option("maxPartitionBytes", target).load(store)
        .queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2
            .BatchScanExec => b.inputPartitions.size
        }.head
    assert(partsAt("1") == 12, "no-pack floor should be one per file")
    assert(partsAt(s"${128L << 20}") == 1,
      "12 tiny files should pack into ONE default-target partition")
    // a mid target packs into >1 and <12 — and every shape reads the
    // same rows (a pack spanning batches keeps per-file batch_id)
    val expect = (0L until 12L).map(b => (s"p$b", s"v$b", b)).toSet
    for (t <- Seq("1", "60", s"${128L << 20}"))
      assert(spark.read.format("graft-docs")
        .option("maxPartitionBytes", t).load(store)
        .as[(String, String, Long)].collect().toSet == expect,
        s"target $t changed the rows")
    val mid = partsAt("60")
    assert(mid > 1 && mid < 12, s"mid target packed to $mid")
  }

  test("write-side compaction packs small committed batches " +
      "atomically: same rows, fewer dirs/files, tail continuity, " +
      "absorbed-epoch replays idempotent (r19 VERDICT item 2)") {
    val store = tmp("graft-docs-compact")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-compact-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-docs-compact-out").toString
    def writeBatch(ids: Seq[String], b: Long): Unit =
      ids.map(i => (i, s"d-$i")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    def tailOnce(): Unit = {
      val q = spark.readStream.format("graft-docs").load(store)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    for (b <- 0L until 6L) writeBatch(Seq(s"c$b"), b)
    tailOnce() // tail checkpoints past the compaction horizon (id 6)
    assert(spark.read.parquet(out).count() == 6)

    val packed = graft.sinks.Sinks.compactDocStore(spark, store,
      keepFrom = 6L)
    assert(packed == Seq((0L, 5L)), s"packed $packed")
    // one pack dir remains; absorbed dirs deleted
    val dirs = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(dirs == Set("batch_id=5"), s"dirs after compaction: $dirs")
    assert(new java.io.File(store, "batch_id=5").listFiles()
      .count(_.getName.endsWith(".jsonl")) == 1,
      "pack should hold ONE concatenated jsonl")
    // batch read: same rows, absorbed rows now carry the pack's id
    val got = spark.read.format("graft-docs").load(store)
      .as[(String, String, Long)].collect().toSet
    assert(got == (0L until 6L).map(b => (s"c$b", s"d-c$b", 5L)).toSet,
      s"post-compaction read: $got")
    // raw-JSON parity survives (marker/_SUCCESS are _-prefixed)
    assert(readStore(store).select("_id").as[String].collect().toSet
      == (0L until 6L).map(b => s"c$b").toSet)

    // CONCURRENT TAIL, NO GAP: the checkpointed tail re-reads nothing
    tailOnce()
    assert(spark.read.parquet(out).count() == 6,
      "tail past the horizon re-read compacted data")
    // and keeps consuming new batches seamlessly
    writeBatch(Seq("c6"), 6L)
    tailOnce()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == (0L until 7L).map(b => s"c$b").toSet)
    // a FRESH earliest tail reads everything exactly once
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-docs-compact-out2").toString
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-docs-compact-ckpt2").toString
    val q2 = spark.readStream.format("graft-docs").load(store)
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val fresh = spark.read.parquet(out2).select("_id").as[String]
      .collect().toSeq
    assert(fresh.sorted == (0L until 7L).map(b => s"c$b").sorted,
      s"fresh tail read $fresh")

    // REPLAY EXACTLY-ONCE: re-publishing an absorbed epoch is a no-op,
    // not a monotonic-guard failure and not a duplicate
    writeBatch(Seq("c2"), 2L)
    assert(spark.read.format("graft-docs").load(store).count() == 7,
      "replay of an absorbed epoch changed the store")
    assert(!new java.io.File(store, "batch_id=2").exists(),
      "replay of an absorbed epoch re-created its directory")
  }

  test("compaction crash recovery: a complete orphaned pack is " +
      "finished, an incomplete one is dropped, a crashed covered-dir " +
      "sweep is completed — and re-compaction composes markers") {
    val store = tmp("graft-docs-compact-crash")
    def writeBatch(ids: Seq[String], b: Long): Unit =
      ids.map(i => (i, s"d-$i")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    for (b <- 0L until 4L) writeBatch(Seq(s"x$b"), b)
    assert(graft.sinks.Sinks.compactDocStore(spark, store, 4L)
      == Seq((0L, 3L)))
    // simulate a crashed covered-dir sweep: resurrect an absorbed dir
    // (as if the sweep died before deleting it) — readers must still
    // suppress it via the pack's marker, and recovery must delete it
    val zombie = java.nio.file.Paths.get(store, "batch_id=1")
    java.nio.file.Files.createDirectories(zombie)
    java.nio.file.Files.writeString(zombie.resolve("part-z.jsonl"),
      "{\"_id\":\"zombie\",\"doc\":\"stale\"}\n")
    java.nio.file.Files.createFile(zombie.resolve("_SUCCESS"))
    assert(!spark.read.format("graft-docs").load(store)
      .as[(String, String, Long)].collect()
      .exists(_._1 == "zombie"),
      "a covered zombie dir leaked into a read")
    // an INCOMPLETE orphaned pack staging dir is dropped by recovery
    val badStage = java.nio.file.Paths.get(store, "_staging",
      ".compact-9-deadbeef")
    java.nio.file.Files.createDirectories(badStage)
    java.nio.file.Files.writeString(
      badStage.resolve("part-00000-compact.jsonl"), "junk")
    // second compaction round: two more tiny batches + recovery
    for (b <- 4L until 6L) writeBatch(Seq(s"x$b"), b)
    val packed2 = graft.sinks.Sinks.compactDocStore(spark, store, 6L)
    assert(packed2 == Seq((0L, 5L)), s"re-compaction packed $packed2")
    assert(!java.nio.file.Files.exists(zombie),
      "recovery did not sweep the zombie covered dir")
    assert(!java.nio.file.Files.exists(badStage),
      "recovery did not drop the incomplete staged pack")
    val got = spark.read.format("graft-docs").load(store)
      .as[(String, String, Long)].collect().toSet
    assert(got == (0L until 6L).map(b => (s"x$b", s"d-x$b", 5L)).toSet,
      s"post-re-compaction read: $got")
    // a COMPLETE orphaned pack (crash between rename steps) finishes:
    // fake one claiming id 5 with distinguishable content
    val stage = java.nio.file.Paths.get(store, "_staging",
      ".compact-5-cafecafe")
    java.nio.file.Files.createDirectories(stage)
    val packFile = java.nio.file.Paths.get(store, "batch_id=5",
      "part-00000-compact.jsonl")
    java.nio.file.Files.copy(packFile,
      stage.resolve("part-00000-compact.jsonl"))
    java.nio.file.Files.createFile(stage.resolve("_compacted_from=0"))
    java.nio.file.Files.createFile(stage.resolve("_SUCCESS"))
    graft.sinks.GraftDocs.recoverCompactions(
      spark.sparkContext.hadoopConfiguration, store)
    assert(!java.nio.file.Files.exists(stage),
      "recovery left the complete orphaned pack staged")
    assert(spark.read.format("graft-docs").load(store).count() == 6,
      "recovered pack lost rows")
  }

  test("a batch directory without its _SUCCESS marker is invisible to " +
      "batch and streaming reads — no half-published batch can be " +
      "planned or checkpointed past (r18 ADVICE, high)") {
    val store = tmp("graft-docs-marker")
    Seq(("m0", "d0")).toDF("_id", "doc")
      .write.format("graft-docs")
      .option("path", store).option("batchId", 0L)
      .mode("append").save()
    // simulate a mid-publish/crashed batch: data file, no marker
    val partial = java.nio.file.Paths.get(store, "batch_id=1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(partial.resolve("part-x.jsonl"),
      """{"_id":"ghost","doc":"half"}""" + "\n")

    val seen = spark.read.format("graft-docs").load(store)
      .select("_id").as[String].collect().toSet
    assert(seen == Set("m0"), s"un-markered batch leaked into $seen")

    // a tail across the partial batch: must not plan it, and must not
    // checkpoint past it — when the marker lands later (the replayed
    // publish), a restart picks the batch up
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-marker-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-docs-marker-out").toString
    def tail() = spark.readStream.format("graft-docs").load(store)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    val q1 = tail()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == Set("m0"))
    java.nio.file.Files.writeString(partial.resolve("_SUCCESS"), "")
    val q2 = tail()
    try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == Set("m0", "ghost"),
      "the late-completed batch was skipped — offset moved past it")
  }

  test("startingOffsets: latest skips pre-start history, a numeric id " +
      "starts mid-store, and checkpoints take over on restart " +
      "(r18 VERDICT item 3)") {
    val store = tmp("graft-docs-offsets")
    def writeBatch(id: String, b: Long): Unit =
      Seq((id, s"d-$id")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    writeBatch("h0", 0L); writeBatch("h1", 1L); writeBatch("h2", 2L)

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-off-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-docs-off-out").toString
    def tail() = spark.readStream.format("graft-docs")
      .option("startingOffsets", "latest").load(store)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    // latest: the three-batch history must NOT replay
    val q1 = tail()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.schema("_id STRING, doc STRING, batch_id BIGINT")
      .parquet(out).isEmpty, "latest replayed history")
    // batches landing after the start are tailed — across a restart
    // (the checkpoint, not startingOffsets, governs from here on)
    writeBatch("n3", 3L)
    val q2 = tail()
    try q2.processAllAvailable() finally q2.stop()
    writeBatch("n4", 4L)
    val q3 = tail()
    try q3.processAllAvailable() finally q3.stop()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == Set("n3", "n4"),
      "post-start batches must arrive exactly once")

    // an explicit numeric start id is honored (inclusive)
    val out2 = java.nio.file.Files
      .createTempDirectory("graft-docs-off-out2").toString
    val ckpt2 = java.nio.file.Files
      .createTempDirectory("graft-docs-off-ckpt2").toString
    val q4 = spark.readStream.format("graft-docs")
      .option("startingOffsets", "2").load(store)
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2).start()
    try q4.processAllAvailable() finally q4.stop()
    assert(spark.read.parquet(out2).select("_id").as[String]
      .collect().toSet == Set("h2", "n3", "n4"))
  }

  test("batch ids must be monotonic per store: a fresh id below the " +
      "max committed id is rejected at commit; replays pass " +
      "(r18 ADVICE)") {
    val store = tmp("graft-docs-monotonic")
    def write(id: String, b: Long): Unit =
      Seq((id, "d")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    write("a", 5L)
    val e = intercept[Exception] { write("late", 3L) }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(c => "" + c.getMessage).mkString(" | ")
    assert(msgs(e).contains("monotonically increasing"),
      s"wrong error: ${msgs(e)}")
    // the failed commit must not have published anything
    assert(spark.read.format("graft-docs").load(store)
      .select("batch_id").distinct.as[Long].collect().toSeq == Seq(5L))
    write("a", 5L) // replay of an existing id is legal
    write("b", 6L) // and the store continues forward
    assert(spark.read.format("graft-docs").load(store)
      .select("_id").as[String].collect().toSet == Set("a", "b"))
  }

  test("a replay that crashed between delete(dest) and swap is not " +
      "locked out by the monotonic guard (r19 ADVICE): the orphaned " +
      "staging dir is evidence of a prior replay") {
    val store = tmp("graft-docs-lockout")
    def write(id: String, b: Long): Unit =
      Seq((id, "d")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    write("a", 1L); write("b", 2L); write("c", 3L)
    // Simulate a replayed publish of id=2 that crashed AFTER
    // delete(dest) but BEFORE rename(tmp, dest): the id is gone from
    // the committed set (and below max=3), only its staged swap dir
    // remains.
    val dest = java.nio.file.Paths.get(store, "batch_id=2")
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmTree(dest)
    val orphan = java.nio.file.Paths.get(store, "_staging",
      ".publish-2-cafecafe")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.writeString(
      orphan.resolve("part-x.jsonl"), "junk")
    // The next replay of id=2 must publish, not trip the guard.
    write("b2", 2L)
    assert(!java.nio.file.Files.exists(orphan),
      "replay did not sweep its crashed predecessor's staging dir")
    assert(readStore(store).as[(String, String, Long)].collect()
      .toSet.map((r: (String, String, Long)) => (r._1, r._3)) ==
      Set(("a", 1L), ("b2", 2L), ("c", 3L)),
      "crashed replay's batch is permanently unpublishable")
  }

  test("maxBatchesPerTrigger: a deep-history catch-up runs in bounded " +
      "micro-batches, never one giant trigger") {
    val store = tmp("graft-docs-admission")
    for (b <- 0L until 5L)
      Seq((s"r$b", s"d$b")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    val dst = tmp("graft-docs-admission-dst")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-adm-ckpt").toString
    // sink is the connector too: each trigger's epoch owns one dst
    // batch_id partition, so the dst partition count IS the number of
    // micro-batches the catch-up took
    val q = spark.readStream.format("graft-docs")
      .option("maxBatchesPerTrigger", "2").load(store)
      .select("_id", "doc")
      .writeStream.format("graft-docs")
      .option("path", dst).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = readStore(dst)
    assert(out.select("_id").as[String].collect().toSet ==
      (0L until 5L).map(b => s"r$b").toSet, "catch-up lost rows")
    val epochs = out.select("batch_id").distinct.count()
    assert(epochs == 3,
      s"5 batches at 2/trigger should take 3 micro-batches, took $epochs")
  }

  test("the scan reports its post-pruning size from commit metadata, " +
      "so store reads plan on their true bytes") {
    val store = tmp("graft-docs-stats")
    for (b <- 0L to 1L)
      Seq((s"s$b", "x" * 200)).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    def sizeOf(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.optimizedPlan.stats.sizeInBytes
    val full = sizeOf(spark.read.format("graft-docs").load(store))
    // within 4x of the real on-disk bytes (Spark pads per-column),
    // and nowhere near the "unknown" default (spark.sql.defaultSizeInBytes
    // = Long.MaxValue) that would bar broadcast planning forever
    val onDisk = 2 * 220 // two ~220-byte jsonl files
    assert(full >= onDisk / 2 && full <= onDisk * 8L,
      s"scan stats $full not anchored to the ~$onDisk on-disk bytes")
    val pruned = sizeOf(spark.read.format("graft-docs").load(store)
      .filter(col("batch_id") === 0L))
    assert(pruned < full,
      s"batch_id pruning must shrink the estimate ($pruned vs $full)")
  }

  test("vacuum drops history below the horizon: reads shrink, an " +
      "earliest tail starts at the new floor, and the monotonic guard " +
      "still keys off the surviving max") {
    val store = tmp("graft-docs-vacuum")
    def write(id: String, b: Long): Unit =
      Seq((id, "d")).toDF("_id", "doc")
        .write.format("graft-docs")
        .option("path", store).option("batchId", b)
        .mode("append").save()
    for (b <- 0L to 3L) write(s"v$b", b)
    val dropped = Sinks.vacuumDocStore(spark, store, keepFrom = 2L)
    assert(dropped == Seq(0L, 1L), s"dropped $dropped")
    assert(spark.read.format("graft-docs").load(store)
      .select("batch_id").distinct.as[Long].collect().toSet ==
      Set(2L, 3L), "vacuum left the wrong batches")
    // an earliest tail begins at the surviving floor — no phantom
    // wait on the vacuumed range
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-docs-vac-ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft-docs-vac-out").toString
    val q = spark.readStream.format("graft-docs").load(store)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).select("_id").as[String]
      .collect().toSet == Set("v2", "v3"))
    // vacuuming history must NOT re-open the low id range: the guard
    // keys off the surviving max, so a fresh id 1 is still rejected
    val e = intercept[Exception] { write("stale", 1L) }
    def msgs(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(c => "" + c.getMessage).mkString(" | ")
    assert(msgs(e).contains("monotonically increasing"))
    write("v4", 4L) // forward progress unaffected
    assert(spark.read.format("graft-docs").load(store)
      .select("_id").as[String].collect().toSet ==
      Set("v2", "v3", "v4"))
  }

  test("CDC composition: tail one store through importClassifyStream " +
      "into a second store — exactly-once across a restart of BOTH " +
      "sides (r18 VERDICT item 8)") {
    val src = tmp("graft-cdc-src")
    val dst = tmp("graft-cdc-dst")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cdc-ckpt").toString
    def writeSrc(rows: Seq[(String, String)], b: Long): Unit =
      rows.toDF("_id", "doc").write.format("graft-docs")
        .option("path", src).option("batchId", b)
        .mode("append").save()
    // the stored snapshot's (id, content-hash) table — the
    // importDelta discipline's static side
    val snapshot = Seq(("a", "h1"), ("b", "h2")).toDF("id", "h")
    // store → changelog → classification → store: the composition the
    // connector exists for; BOTH ends are the native connector, so
    // the read side's offsets and the write side's epoch-replace
    // jointly carry exactly-once through restarts of either
    def start() = graft.streaming.EventStream.importClassifyStream(
        spark.readStream.format("graft-docs").load(src)
          .select(col("_id").as("id"), col("doc").as("h")),
        snapshot)
      .select(concat_ws(":", col("id"), col("status")).as("_id"),
        col("h").as("doc"))
      .writeStream.format("graft-docs")
      .option("path", dst).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    writeSrc(Seq(("a", "h1"), ("b", "hX")), 0L) // unchanged + changed
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // both sides down; a batch lands in the source meanwhile
    writeSrc(Seq(("c", "h3")), 1L) // absent from snapshot → inserted
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = readStore(dst).select("_id", "doc")
      .as[(String, String)].collect().toSeq
    assert(out.size == 3, s"exactly-once violated: $out")
    assert(out.toSet == Set(("a:unchanged", "h1"), ("b:changed", "hX"),
      ("c:inserted", "h3")), s"classification wrong: $out")
  }

  test("ImportJob writes through the connector: same ids and payload " +
      "bytes as the adapter path, replayed batch idempotent") {
    val d = "/root/testdata/sf0.001"
    val store = tmp("graft-docs-import")
    ImportJob.writeImportDocsV2(spark, d, store)
    val v2 = readStore(store).select("_id", "doc")
      .as[(String, String)].collect().toMap
    // the adapter path's exact (content-hash id, serialized payload)
    val expect = ImportJob.payloads(spark, d)
      .select(Sinks.docId(col("payload")).cast("string"),
        to_json(col("payload")))
      .as[(String, String)].collect().toMap
    assert(v2 == expect, "V2 store differs from the adapter contract")
    // replayed import (same batchId): byte-identical store
    ImportJob.writeImportDocsV2(spark, d, store)
    assert(readStore(store).select("_id", "doc")
      .as[(String, String)].collect().toMap == expect)
    // a new extraction stamp is a NEW batch — appends, never mutates
    ImportJob.writeImportDocsV2(spark, d, store, batchId = 1L,
      extractedEpoch = 1700000001L)
    val after = readStore(store)
    assert(after.count() == expect.size * 2L)
    assert(after.filter(col("batch_id") === 0L).count() == expect.size)
  }
}
