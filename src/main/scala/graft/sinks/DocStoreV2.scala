package graft.sinks

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 document-collection sink — `format("graft-docs")`
  * (r17 VERDICT item 3).
  *
  * The reference's MongoDB collection sink (utils.py:123-146) was until
  * now served by adapter methods ([[Sinks.insertDocCollection]] /
  * [[Sinks.insertDocCollectionJdbc]]); this is the same store contract
  * behind Spark's native connector surface, the shape a real Mongo/ES
  * connector ports into: the engine plans an `AppendData` /
  * streaming-write node, tasks stream documents through
  * [[DataWriter]]s, and the DRIVER adjudicates commit — so task
  * retries, speculative duplicates, and micro-batch replays are all
  * resolved by the connector's commit protocol instead of by each
  * caller re-implementing the idempotence recipe.
  *
  * Store layout (filesystem-backed; a keyed store swaps the commit
  * body, not the API):
  *
  *   path/batch_id=<id>/part-<partition>-<task>.jsonl   committed data
  *   path/_staging/<queryId>/<id>/...                   uncommitted
  *
  * Documents are JSON-lines rows `{"_id": ..., "doc": ...}` with the
  * fixed schema (`_id` STRING, `doc` STRING) — `_id` is the content
  * hash ([[Sinks.docId]]) so the dedup semantics of the adapter paths
  * carry over unchanged. A leading-underscore staging dir is invisible
  * to Spark's file index, so readers (`spark.read.schema(..).json(path)`)
  * only ever see committed batches, and the `batch_id=` layout surfaces
  * as a partition column for free.
  *
  * Exactly-once: [[Sinks.writeBatchIdempotent]]'s recipe moved behind
  * the V2 API. Tasks write to staging and return the staged file in
  * their commit message; only `commit()` on the driver publishes — it
  * REPLACES the batch's own directory with exactly the committed
  * attempts' files. A replayed micro-batch (restart between sink write
  * and checkpoint commit) re-runs the same epochId over the same source
  * offsets (Structured Streaming's contract) and overwrites its own
  * `batch_id=` directory byte-for-byte; a failed/speculative task's
  * staged file is never referenced by any commit message and is swept
  * with the staging dir. Batch writes take their id from the `batchId`
  * write option (default 0) with the same replace-own-partition
  * semantics, so a retried batch JOB is idempotent too.
  *
  * Scale: writers stream rows straight to the store (no task-side
  * buffering beyond the FS client's), the driver touches only METADATA
  * (one rename per task file — O(#tasks), the same cost every
  * FileFormatWriter commit pays), and nothing funnels data through the
  * driver. Single-writer per (path, batch id), like every
  * non-transactional file sink.
  *
  * Reads (`spark.read.format("graft-docs")`): one input partition per
  * committed file, with COLUMN PRUNING and `batch_id` PARTITION
  * PRUNING pushed into the scan — a batch_id predicate is resolved
  * against directory names on the driver, so "read since horizon"
  * never lists or opens the store's older history; `_id`/`doc`
  * predicates are declined and re-evaluated by Spark post-scan.
  *
  * Streaming reads (`spark.readStream.format("graft-docs")`): the
  * commit layout doubles as a changelog — each committed batch is one
  * offset unit, so a stream TAILS the store exactly-once across
  * restarts (offsets checkpoint as plain batch ids).
  */
class GraftDocsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-docs"

  // Reads surface the batch_id layout as a partition column, exactly
  // like the parquet/json file sources do for `k=v` directories.
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocs.ReadSchema

  // The store's schema is FIXED; reject anything else at plan time so a
  // wrong projection fails on the driver, not as malformed store rows.
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    // Writes arrive with the store schema; reads with the store schema
    // plus the batch_id partition column. Anything else is a caller
    // bug — fail at plan time, not as malformed store rows.
    require(shape(schema) == shape(GraftDocs.Schema) ||
      shape(schema) == shape(GraftDocs.ReadSchema),
      s"graft-docs serves (_id STRING, doc STRING[, batch_id BIGINT]); " +
        s"got $schema")
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft-docs requires the 'path' option"))
    // The table carries the schema Spark resolved for THIS use: the
    // 2-column write shape for AppendData by-name resolution, the
    // 3-column read shape for scans.
    new GraftDocsTable(path, schema)
  }
}

private[graft] object GraftDocs {
  val Schema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = false),
    StructField("doc", StringType, nullable = true)))

  /** Read-side schema: the store columns plus the `batch_id` partition
    * column the commit layout provides for free. */
  val ReadSchema: StructType =
    Schema.add(StructField("batch_id", LongType, nullable = false))

  /** Committed batch directories under `path`, optionally pruned by
    * the pushed batch_id predicates — the partition-pruning this
    * layout exists for: a predicate like `batch_id >= horizon` lists
    * and reads ONLY the matching directories, never the store's full
    * history. */
  def committedBatches(conf: Configuration, path: String,
      pruners: Seq[Long => Boolean]): Seq[(Long, Seq[String])] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch_id="))
      .flatMap { dir =>
        scala.util.Try(
            dir.getPath.getName.stripPrefix("batch_id=").toLong)
          .toOption
          .filter(id => pruners.forall(p => p(id)))
          .map(id => id -> fs.listStatus(dir.getPath).toSeq
            .filter(f => f.isFile && f.getPath.getName.endsWith(".jsonl"))
            .map(_.getPath.toString))
      }
      .sortBy(_._1)
  }

  /** Minimal JSON string escaping (quote, backslash, control chars) —
    * the doc payload is itself a JSON string VALUE on the wire, so it
    * must round-trip through any JSON reader byte-exactly. */
  def jsonEscape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case _ if c < 0x20 =>
          b.append(String.format("\\u%04x", Int.box(c.toInt)))
        case _ => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Publish the staged files named by `messages` as the CONTENT of
    * `path/batch_id=<id>` — delete-then-rename, so a replayed commit of
    * the same id replaces its own output instead of appending to it.
    * Metadata-only on the driver: one rename per committed task file. */
  def publish(conf: Configuration, path: String, id: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(s"$path/batch_id=$id")
    val fs = dest.getFileSystem(conf)
    if (fs.exists(dest)) fs.delete(dest, true)
    fs.mkdirs(dest)
    messages.foreach {
      case DocCommitMessage(staged) =>
        val src = new Path(staged)
        if (!fs.rename(src, new Path(dest, src.getName)))
          throw new java.io.IOException(
            s"graft-docs commit: rename $src -> $dest failed")
      case other =>
        throw new IllegalStateException(
          s"graft-docs commit: unexpected message $other")
    }
    fs.create(new Path(dest, "_SUCCESS"), true).close()
  }

  def dropStaging(conf: Configuration, path: String, queryId: String)
      : Unit = {
    val staging = new Path(s"$path/_staging/$queryId")
    val fs = staging.getFileSystem(conf)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

/** Serializable Hadoop-conf carrier (Hadoop's own Writable round-trip;
  * public Hadoop API only — no Spark internals). */
private[sinks] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[sinks] class GraftDocsTable(path: String,
    tableSchema: StructType) extends Table
    with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-docs(`$path`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftDocsScanBuilder(path, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().fields.map(f => (f.name, f.dataType)).toSeq ==
      GraftDocs.Schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"graft-docs writes exactly (_id STRING, doc STRING) — batch_id " +
        s"is commit-assigned, never caller-supplied; got ${info.schema()}")
    val batchId = Option(info.options.get("batchId")).map(_.toLong)
      .getOrElse(0L)
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftDocsBatchWrite(path, info.queryId(), batchId)
        override def toStreaming: StreamingWrite =
          new GraftDocsStreamingWrite(path, info.queryId())
      }
    }
  }
}

private[sinks] case class DocCommitMessage(stagedPath: String)
    extends WriterCommitMessage

private[sinks] class GraftDocsWriterFactory(conf: SerializableHadoopConf,
    stagingBase: String) extends DataWriterFactory
    with StreamingDataWriterFactory {
  // Batch: the staging base IS the batch's staging dir.
  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] =
    new GraftDocsWriter(conf.value, stagingBase, partitionId, taskId)
  // Streaming: one factory serves the whole query; each epoch stages
  // under its own subdirectory so a replayed epoch's files never mix
  // with a later epoch's.
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new GraftDocsWriter(conf.value, s"$stagingBase/$epochId",
      partitionId, taskId)
}

private[sinks] class GraftDocsBatchWrite(path: String, queryId: String,
    batchId: Long) extends BatchWrite {
  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory =
    new GraftDocsWriterFactory(conf, s"$path/_staging/$queryId/$batchId")

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    GraftDocs.publish(conf.value, path, batchId, messages)
    GraftDocs.dropStaging(conf.value, path, queryId)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftDocs.dropStaging(conf.value, path, queryId)
}

private[sinks] class GraftDocsStreamingWrite(path: String, queryId: String)
    extends StreamingWrite {
  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new GraftDocsWriterFactory(conf, s"$path/_staging/$queryId")

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    // Publish replaces `batch_id=<epochId>` wholesale — the replayed-
    // epoch idempotence the foreachBatch recipe provided, now enforced
    // by the sink itself. Staging is swept per-epoch (not per-query):
    // the stream keeps running.
    GraftDocs.publish(conf.value, path, epochId, messages)
    val staging = new Path(s"$path/_staging/$queryId/$epochId")
    val fs = staging.getFileSystem(conf.value)
    if (fs.exists(staging)) fs.delete(staging, true)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(s"$path/_staging/$queryId/$epochId")
    val fs = staging.getFileSystem(conf.value)
    if (fs.exists(staging)) fs.delete(staging, true)
  }
}

/** Task-side writer: streams rows to ONE staged JSONL file; the staged
  * path only becomes visible to readers if this task's attempt is the
  * one the driver commits. A retried attempt overwrites its
  * predecessor's staged file (same task naming would collide across
  * attempts, so the attempt-unique UUID suffix keeps them distinct and
  * the commit message names exactly this attempt's file). */
private[sinks] class GraftDocsWriter(conf: Configuration, stagingDir: String,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val file = new Path(stagingDir,
    f"part-$partitionId%05d-$taskId-${UUID.randomUUID().toString.take(8)}.jsonl")
  private val fs = file.getFileSystem(conf)
  private val out = fs.create(file, true)
  private val writer = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(out, java.nio.charset.StandardCharsets.UTF_8))

  override def write(record: InternalRow): Unit = {
    val id = record.getUTF8String(0)
    require(id != null, "graft-docs: _id must not be null")
    val doc =
      if (record.isNullAt(1)) "null"
      else "\"" + GraftDocs.jsonEscape(record.getUTF8String(1).toString) + "\""
    writer.write(s"""{"_id":"${GraftDocs.jsonEscape(id.toString)}","doc":$doc}""")
    writer.newLine()
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    DocCommitMessage(file.toString)
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    if (fs.exists(file)) fs.delete(file, false)
  }

  override def close(): Unit =
    try writer.close() catch { case _: Exception => () }
}

/** Read side of the connector: column pruning plus PARTITION PRUNING
  * on `batch_id` — the two pushdowns that matter for this layout. A
  * `batch_id` comparison/IN predicate is resolved against directory
  * NAMES on the driver (no data touched, claimed as fully pushed so
  * Spark never re-evaluates it); `_id`/`doc` predicates are declined
  * and stay post-scan. At 100 TB the batch axis is the store's time
  * axis, so "read since horizon" scans only the matching directories. */
private[sinks] class GraftDocsScanBuilder(path: String,
    tableSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  private def batchIdPruner(f: Filter): Option[Long => Boolean] =
    f match {
      case EqualTo("batch_id", v: Long) => Some(_ == v)
      case GreaterThan("batch_id", v: Long) => Some(_ > v)
      case GreaterThanOrEqual("batch_id", v: Long) => Some(_ >= v)
      case LessThan("batch_id", v: Long) => Some(_ < v)
      case LessThanOrEqual("batch_id", v: Long) => Some(_ <= v)
      case In("batch_id", vs) if vs.forall(_.isInstanceOf[Long]) =>
        val set = vs.map(_.asInstanceOf[Long]).toSet
        Some(set.contains)
      case _ => None
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (prunable, residual) =
      filters.partition(f => batchIdPruner(f).isDefined)
    pushed = prunable
    residual // Spark re-evaluates these after the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new GraftDocsScan(path, required,
      pushed.flatMap(batchIdPruner).toSeq)
}

private[sinks] case class GraftDocsInputPartition(file: String,
    batchId: Long) extends InputPartition

private[sinks] class GraftDocsScan(path: String, required: StructType,
    pruners: Seq[Long => Boolean]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-docs(`$path`) PushedBatchIdPredicates: ${pruners.size}"

  /** Streaming read — TAIL the store: each committed `batch_id=`
    * directory is one source offset unit, so the store's write-side
    * commit log IS the read-side changelog (the CDC shape a doc-store
    * connector serves). Offsets are exclusive upper batch ids;
    * `latestOffset` lists directory NAMES only. Committed batches are
    * immutable under the single-writer contract (a replayed writer
    * epoch reproduces its partition byte-for-byte), which is what
    * makes re-reading a planned range after a crash deterministic. */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new GraftDocsMicroBatchStream(path, required, pruners)

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    GraftDocs.committedBatches(conf, path, pruners).flatMap {
      case (id, files) => files.map(GraftDocsInputPartition(_, id))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(
      new SerializableHadoopConf(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration),
      required.fields.map(_.name))
}

private[sinks] case class GraftDocsOffset(nextBatchId: Long)
    extends Offset {
  override def json(): String = nextBatchId.toString
}

private[sinks] class GraftDocsMicroBatchStream(path: String,
    required: StructType, pruners: Seq[Long => Boolean])
    extends MicroBatchStream {
  private val conf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  override def initialOffset(): Offset = GraftDocsOffset(0L)

  override def latestOffset(): Offset = {
    val ids = GraftDocs.committedBatches(conf, path, Seq.empty)
      .map(_._1)
    GraftDocsOffset(if (ids.isEmpty) 0L else ids.max + 1L)
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val lo = start.asInstanceOf[GraftDocsOffset].nextBatchId
    val hi = end.asInstanceOf[GraftDocsOffset].nextBatchId
    // Any pushed batch_id predicates compose with the offset range —
    // a filtered tail reads even fewer directories.
    val rangePruners = pruners ++
      Seq[Long => Boolean](id => id >= lo && id < hi)
    GraftDocs.committedBatches(conf, path, rangePruners).flatMap {
      case (id, files) => files.map(GraftDocsInputPartition(_, id))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDocsReaderFactory(new SerializableHadoopConf(conf),
      required.fields.map(_.name))

  override def deserializeOffset(json: String): Offset =
    GraftDocsOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = () // nothing store-side
  override def stop(): Unit = ()
}

private[sinks] class GraftDocsReaderFactory(conf: SerializableHadoopConf,
    columns: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftDocsInputPartition]
    new GraftDocsPartitionReader(conf.value, p.file, p.batchId, columns)
  }
}

/** Streams one staged-then-committed JSONL file; each line is the
  * writer's own `{"_id": ..., "doc": ...}` wire format (parsed with
  * Jackson — the writer's escaping round-trips exactly). */
private[sinks] class GraftDocsPartitionReader(conf: Configuration,
    file: String, batchId: Long, columns: Array[String])
    extends PartitionReader[InternalRow] {
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(
      new Path(file).getFileSystem(conf).open(new Path(file)),
      java.nio.charset.StandardCharsets.UTF_8))
  private val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  private var line: String = _

  override def next(): Boolean = {
    line = reader.readLine()
    line != null
  }

  override def get(): InternalRow = {
    val node = mapper.readTree(line)
    new GenericInternalRow(columns.map {
      case "_id" => UTF8String.fromString(node.get("_id").asText())
      case "doc" =>
        val d = node.get("doc")
        if (d == null || d.isNull) null
        else UTF8String.fromString(d.asText())
      case "batch_id" => batchId
      case other => throw new IllegalStateException(
        s"graft-docs scan: unknown column $other")
    }.asInstanceOf[Array[Any]])
  }

  override def close(): Unit = reader.close()
}
