package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll

import graft.jobs.{ImportJob, ImportService}

/** S8's runnable service twin (r19 VERDICT item 6): the reference's
  * Flask entry points (server.py:6-16) answered end-to-end over a real
  * loopback socket — healthcheck byte parity, the extract POST
  * returning the same payload bytes [[ImportJob.writeImportFiles]]
  * serializes, the mmj-<org>.json file artifact, the doc-store insert
  * leg landing one fresh batch per request, and the 400/404/405 error
  * contract. */
class ImportServiceSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private var server: com.sun.net.httpserver.HttpServer = _
  private var base: String = _
  private var outDir: String = _
  private var store: String = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    super.beforeAll()
    outDir = java.nio.file.Files
      .createTempDirectory("graft-svc-out").toString
    store = java.nio.file.Files
      .createTempDirectory("graft-svc-store").toString + "/imports"
    server = ImportService.start(spark, d, outDir, store)
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  private def get(path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path")).GET()
      .build(), HttpResponse.BodyHandlers.ofString())

  private def post(path: String, form: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"$base$path"))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(form)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /healthcheck returns the reference's exact body " +
      "(server.py:13-16)") {
    val r = get("/healthcheck")
    assert(r.statusCode() == 200)
    assert(r.body() == """{ "success": true, "status": 200 }""")
  }

  test("POST /import/extract returns the org's payload bytes, writes " +
      "the mmj-<org>.json artifact, and inserts one store batch per " +
      "request (server.py:6-11, etl_import.py:63-71)") {
    val r = post("/import/extract",
      "organization_id=org-1&dispensary_id=disp-9")
    assert(r.statusCode() == 200, s"extract failed: ${r.body()}")
    // response body == the serialization writeImportFiles pins
    import org.apache.spark.sql.functions._
    val want = ImportJob.payloads(spark, d)
      .filter(col("organizationId") === "org-1")
      .select(to_json(col("payload"),
        Map("ignoreNullFields" -> "false")))
      .as[String].collect().head
    assert(r.body() == want, "response body drifted from the payload")
    // file artifact parity (the reference's open().write leg)
    val fileBytes = java.nio.file.Files.readString(
      java.nio.file.Paths.get(outDir, "mmj-org-1.json"))
    assert(fileBytes == want, "file artifact drifted")
    // store insert leg: one batch, the content-hash id discipline
    val stored = spark.read.format("graft-docs").load(store)
      .as[(String, String, Long)].collect()
    assert(stored.length == 1 && stored.head._2 == want)
    // a second extraction of another org appends a NEW batch
    val r2 = post("/import/extract",
      "organization_id=org-2&dispensary_id=disp-9")
    assert(r2.statusCode() == 200)
    val batches = spark.read.format("graft-docs").load(store)
      .select("batch_id").as[Long].collect().toSet
    assert(batches == Set(0L, 1L), s"batches: $batches")
  }

  test("error contract: missing params 400, unknown org 404, wrong " +
      "method 405") {
    assert(post("/import/extract", "organization_id=org-1")
      .statusCode() == 400)
    assert(post("/import/extract",
      "organization_id=org-999&dispensary_id=d").statusCode() == 404)
    assert(get("/import/extract").statusCode() == 405)
  }
}
