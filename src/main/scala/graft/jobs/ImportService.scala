package graft.jobs

import java.net.InetSocketAddress
import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S8 — the reference's REST entry point, runnable end-to-end
  * (server.py:6-16): a minimal JDK-built-in HTTP service (zero new
  * dependencies, same `com.sun.net.httpserver` the loopback specs use)
  * wrapping [[ImportJob]]:
  *
  *  - `POST /import/extract` with a form-encoded body carrying
  *    `organization_id` and `dispensary_id` (server.py:8-11) runs the
  *    extract for that organization: the payload is serialized with the
  *    SAME options as [[ImportJob.writeImportFiles]], written to
  *    `outDir/mmj-<org>.json` (etl_import.py:63-64), appended to the
  *    `graft-docs` store as a fresh monotonic batch (the
  *    utils.py:123-146 insert leg, via the connector's commit
  *    protocol), and returned as the response body — the reference
  *    returns the serialized payload itself (etl_import.py:71).
  *    Missing parameters → 400; an unknown organization → 404 (the
  *    reference would 500 on a KeyError; a typed client error is the
  *    sane-semantics divergence, same policy as SURVEY §7.4).
  *  - `GET /healthcheck` returns the reference's exact body
  *    (server.py:13-16).
  *
  * Scoping note: the reference scopes entity extracts by
  * `dispensary_id` AND `organization_id`; the testdata model carries
  * only the organization axis (see [[ImportJob.productDocs]]'s
  * documented divergence), so `dispensary_id` is required for wire
  * parity but does not further scope.
  *
  * Requests serialize through one lock: extraction writes a store
  * batch, and the connector's contract is single-writer per store.
  * The driver-side collect is ONE row (the requested org's payload) —
  * the same bounded-control-flow pattern as the drift summaries. */
object ImportService {

  def start(spark: SparkSession, dataDir: String, outDir: String,
      store: String, port: Int = 0): HttpServer = {
    val server = HttpServer.create(
      new InetSocketAddress("127.0.0.1", port), 0)
    val lock = new Object
    // Resume past the store's committed history: a restarted service
    // must append fresh batches, not replay-overwrite batch 0.
    val committed = graft.sinks.GraftDocs.committedBatches(
      spark.sparkContext.hadoopConfiguration, store, Seq.empty)
    val nextBatch = new AtomicLong(
      if (committed.isEmpty) 0L else committed.map(_._1).max + 1L)

    def respond(ex: HttpExchange, status: Int, body: String): Unit = {
      val bytes = body.getBytes(UTF_8)
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
      ex.close()
    }

    def formParams(ex: HttpExchange): Map[String, String] = {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      body.split("&").iterator
        .map(_.split("=", 2))
        .collect { case Array(k, v) =>
          URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8) }
        .toMap
    }

    server.createContext("/healthcheck", (ex: HttpExchange) => {
      if (ex.getRequestMethod == "GET")
        respond(ex, 200, """{ "success": true, "status": 200 }""")
      else respond(ex, 405, """{ "success": false, "status": 405 }""")
    })

    server.createContext("/import/extract", (ex: HttpExchange) => {
      try {
        if (ex.getRequestMethod != "POST")
          respond(ex, 405, """{ "success": false, "status": 405 }""")
        else {
          val params = formParams(ex)
          (params.get("organization_id"), params.get("dispensary_id"))
          match {
            case (Some(orgId), Some(_)) => lock.synchronized {
              val row = ImportJob.payloads(spark, dataDir)
                .filter(col("organizationId") === orgId)
                .select(to_json(col("payload"),
                    Map("ignoreNullFields" -> "false")).as("value"))
                .collect()
              if (row.isEmpty)
                respond(ex, 404,
                  s"""{ "success": false, "status": 404, """ +
                    s""""error": "unknown organization_id" }""")
              else {
                val json = row(0).getString(0)
                // etl_import.py:63-64 — the per-org file artifact
                val dest = new org.apache.hadoop.fs.Path(
                  s"$outDir/mmj-$orgId.json")
                val fs = dest.getFileSystem(
                  spark.sparkContext.hadoopConfiguration)
                val os = fs.create(dest, true)
                try os.write(json.getBytes(UTF_8)) finally os.close()
                // utils.py:123-146 — the doc-store insert leg, one
                // fresh monotonic batch per extraction request
                import spark.implicits._
                Seq(json).toDF("doc")
                  // content-hash id over the ALREADY-serialized
                  // payload (Sinks.docId serializes a struct; here the
                  // wire bytes are the document)
                  .select(sha2(col("doc"), 256).as("_id"), col("doc"))
                  .write.format("graft-docs")
                  .option("path", store)
                  .option("batchId", nextBatch.getAndIncrement())
                  .mode("append").save()
                respond(ex, 200, json)
              }
            }
            case _ =>
              respond(ex, 400,
                """{ "success": false, "status": 400, """ +
                  """"error": "organization_id and dispensary_id """ +
                  """are required" }""")
          }
        }
      } catch {
        case e: Exception =>
          respond(ex, 500,
            s"""{ "success": false, "status": 500, "error": """ +
              s""""${e.getClass.getSimpleName}" }""")
      }
    })
    server.start()
    server
  }
}
