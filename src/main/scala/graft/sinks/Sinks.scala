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

  /** Retention for `format("graft-docs")` stores: drop every committed
    * batch below `keepFrom`, returning the dropped ids — see
    * [[GraftDocs.vacuumBelow]] for the consumer-lag contract. */
  def vacuumDocStore(spark: org.apache.spark.sql.SparkSession,
      path: String, keepFrom: Long): Seq[Long] =
    GraftDocs.vacuumBelow(spark.sparkContext.hadoopConfiguration,
      path, keepFrom)

  /** OPTIMIZE for `format("graft-docs")` stores: rewrite runs of small
    * committed batches below `keepFrom` into packed ones under the
    * same atomic `_SUCCESS`/monotonic-id protocol — see
    * [[GraftDocs.compactBelow]] for the full contract (tails at or
    * past the horizon never re-read; replayed writes of absorbed
    * epochs are idempotent no-ops). Returns the (lo, hi) ranges
    * packed. */
  def compactDocStore(spark: org.apache.spark.sql.SparkSession,
      path: String, keepFrom: Long,
      targetBytes: Long = 128L << 20): Seq[(Long, Long)] =
    GraftDocs.compactBelow(spark.sparkContext.hadoopConfiguration,
      path, keepFrom, targetBytes)

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

  /** S6 INSERT with the reference's unique-id contract
    * (utils.py:123-146), against a filesystem-backed store: append only
    * documents whose `_id` is not already present. The reference
    * generates a random ObjectId and retries until it finds one with no
    * collision; with content-hash ids the retry loop inverts into a
    * skip — a colliding `_id` IS the same document (sha256 of its
    * serialized payload), so "regenerate until unique" becomes "already
    * stored, don't append". Consequences the contract test pins:
    * replayed batches are idempotent (the restart-between-write-and-ack
    * failure window), distinct payloads never collide, and — under a
    * SINGLE writer — the store never holds two rows with one `_id`.
    * Single-writer is load-bearing (r15 ADVICE): the read-existing →
    * anti-join → append sequence is not atomic, so two concurrent
    * inserts of the same payload can both pass the anti-join and both
    * append. A deployment needing the uniqueness guarantee under
    * concurrent writers must target a keyed/transactional store that
    * enforces it — `insertDocCollectionJdbc` below is that shape: the
    * STORE's primary key rejects the duplicate and the conflict
    * handler treats it as already-stored. The existing-id probe here
    * is an anti join against the store's `_id` column only
    * (column-pruned scan); at real scale the same shape runs against
    * the connector's key index. Returns the number of documents
    * actually appended. */
  def insertDocCollection(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, payload: Column, path: String): Long = {
    val docs = df
      .select(docId(payload).as("_id"), to_json(payload).as("doc"))
      .dropDuplicates("_id")
    val existing =
      try spark.read.parquet(path).select("_id")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.toLowerCase.contains("path does not exist") =>
          spark.emptyDataFrame.select(lit("").as("_id")).limit(0)
      }
    val fresh = docs.join(existing, Seq("_id"), "left_anti")
      .localCheckpoint() // one evaluation: counted AND appended below
    fresh.write.mode("append").parquet(path)
    fresh.count()
  }

  /** S6 insert against a store that ENFORCES uniqueness (r15 VERDICT
    * item 5 — the reference's MongoDB insert loop, utils.py:123-146,
    * against a real unique index instead of an emulated one): one row
    * per document into a JDBC table whose `_id` column carries a
    * PRIMARY KEY constraint. Unlike `insertDocCollection` there is NO
    * read-existing/anti-join prefilter — every row is attempted and
    * the STORE adjudicates. A duplicate-key rejection means the
    * document is already present (content-hash ids: same `_id` IS the
    * same payload), so the reference's "regenerate id and retry" loop
    * inverts into "verified stored, continue" — and because the
    * decision is the store's own constraint, the uniqueness guarantee
    * holds under CONCURRENT writers, which the filesystem-backed
    * variant cannot promise (see its Scaladoc). Partition-parallel:
    * each partition opens one connection and streams single-row
    * INSERTs; at real scale the same shape batches inserts against
    * the connector's keyed store. Returns the number of rows actually
    * inserted (attempted − duplicate-key skips). BEST-EFFORT under
    * Spark task retries: a retried partition re-attempts rows its
    * failed predecessor already landed, and those register as
    * duplicate-key skips — the STORE's content stays exactly right
    * (that is the idempotence the PK provides), but the returned
    * count can undercount "inserted by this call". A caller needing
    * an exact figure should take a store-side count delta around the
    * call. */
  def insertDocCollectionJdbc(df: DataFrame, payload: Column,
      url: String, table: String): Long = {
    // The table name is interpolated into SQL (prepared-statement
    // parameters cannot carry identifiers), so VALIDATE it: each
    // dot-separated segment must be a plain identifier, which closes
    // the injection/syntax hazard — a caller-supplied `docs; DROP
    // TABLE x` fails fast here instead of reaching the store.
    // Deliberately interpolated UNQUOTED after validation: quoting
    // would switch the name to case-sensitive resolution and break
    // every caller relying on the store's own identifier folding
    // (Derby/Postgres fold unquoted names; `docstore` means DOCSTORE
    // to Derby only while unquoted).
    // split with limit=-1 so trailing empty segments are kept and
    // rejected: Java's default split drops them, letting "docstore."
    // or "a..." through to fail store-side with malformed SQL instead
    // of here (r17 ADVICE — the fail-fast contract above).
    table.split("\\.", -1).foreach { seg =>
      require(seg.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"invalid table identifier segment '$seg' in '$table'")
    }
    val docs = df
      .select(docId(payload).as("_id"), to_json(payload).as("doc"))
      .dropDuplicates("_id")
    val inserted = docs.mapPartitions { it =>
      if (!it.hasNext) Iterator.single(0L)
      else {
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val ps = conn.prepareStatement(
            s"""INSERT INTO $table ("_id", "doc") VALUES (?, ?)""")
          var n = 0L
          // "Already stored" is ONLY a unique/PK violation. SQLState
          // class 23 covers every integrity violation (NOT NULL 23502,
          // CHECK 23513/23514, FK 23503) — swallowing those would drop
          // a row the store REJECTED for a non-uniqueness reason while
          // reporting it present (r16 ADVICE). So: 23505 (the standard
          // unique-violation state — Derby, PostgreSQL, H2, HSQLDB) or
          // the drivers that signal dup-key as generic 23000 plus a
          // vendor code (MySQL 1062, SQL Server 2601/2627, Oracle
          // ORA-00001 = code 1). Everything else — other class-23
          // states included — propagates and fails the task.
          def isDuplicateKey(e: java.sql.SQLException): Boolean =
            e.getSQLState == "23505" ||
              (e.getSQLState == "23000" &&
                Set(1, 1062, 2601, 2627).contains(e.getErrorCode))
          it.foreach { r =>
            ps.setString(1, r.getString(0))
            ps.setString(2, r.getString(1))
            try { ps.executeUpdate(); n += 1 }
            catch {
              case e: java.sql.SQLException if isDuplicateKey(e) =>
                () // the store says it's already there — contract met
            }
          }
          Iterator.single(n)
        } finally conn.close()
      }
    }(org.apache.spark.sql.Encoders.scalaLong)
    inserted.toDF("n")
      .agg(coalesce(sum("n"), lit(0L)).as("n"))
      .head().getLong(0)
  }

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
