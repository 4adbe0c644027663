package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink layer (SURVEY §2.1 S5/S6/S9).
  *
  * The reference writes one JSON file and one MongoDB document per import
  * (etl_import.py:59-64, utils.py:123-146). At scale a sink must write
  * partition-parallel, so:
  *  - S5 JSON: `df.write.json` with deterministic column order (struct
  *    field order IS the JSON key order — no driver-side json.dumps).
  *  - S6 document collection: any Spark connector sink; the app-generated
  *    unique id becomes a content hash (deterministic, collision-safe by
  *    construction — the reference's retry loop is unnecessary).
  *  - S9 chunking: `maxRecordsPerFile` replaces the manual `chunks()`
  *    batching (utils.py:109-114) without a driver materialization.
  */
object Sinks {

  /** S6: deterministic document id — sha256 of the serialized payload.
    * Replaces the reference's random ObjectId + collision-check loop
    * (utils.py:123-146) with something reproducible and shard-safe. */
  def docId(payload: Column): Column = sha2(to_json(payload), 256)

  /** S5+S9: JSON-lines sink with bounded file sizes. `orderBy` before
    * write pins deterministic output for golden comparisons (the analogue
    * of the reference's sort_keys+indent dumps). */
  def writeJsonDocs(df: DataFrame, path: String, orderCol: String,
      maxRecordsPerFile: Int = 100000): Unit =
    df.orderBy(col(orderCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .option("ignoreNullFields", "false")
      .json(path)

  /** S6: document-collection sink emulation: (id, json) pairs written as
    * parquet — swap `.parquet` for a connector format in production. */
  def writeDocCollection(df: DataFrame, payload: Column, path: String): Unit =
    df.select(docId(payload).as("_id"), to_json(payload).as("doc"))
      .write.mode("overwrite").parquet(path)

  /** Idempotent microbatch writer for non-transactional sinks: each
    * batch lands in its own `batch_id=` partition via DYNAMIC partition
    * overwrite, so a replayed batch (restart between sink write and
    * checkpoint commit — the failure window foreachBatch exposes)
    * overwrites its own partition instead of appending duplicates.
    * This is the standard exactly-once recipe when the sink itself has
    * no transactions. Use with
    * `stream.writeStream.foreachBatch(writeBatchIdempotent(path) _)`. */
  def writeBatchIdempotent(path: String)(df: DataFrame, batchId: Long)
      : Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
}
