package graft

import java.io.OutputStream
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.sources.MediaFetch

/** S7's PRODUCTION transport (MediaFetch.httpTransport) against a real
  * HTTP server — a loopback com.sun.net.httpserver instance inside the
  * test JVM, so the wire path the reference drives with urlopen
  * (utils.py:67-106) is exercised end-to-end with zero egress: TCP
  * connect, status handling, redirect following, Content-Length'd
  * multi-block streaming, read timeout on a hung handler, connect
  * failure on a dead port, and the size cap against an over-large
  * body. Every failure mode must surface as that row's error row —
  * never a failed Spark task — because local[2] runs the fetch inside
  * real executor threads hitting the real socket stack. */
class MediaFetchHttpSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpServer = _
  private var base: String = _

  /** Deterministic body for /blob/n: byte j = (j*131 + n) mod 256.
    * Closed-form so payloads can be asserted exactly. */
  private def blobBytes(n: Int): Array[Byte] =
    Array.tabulate[Byte](n)(j => ((j * 131 + n) % 256).toByte)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/blob/", (ex: HttpExchange) => {
      val n = ex.getRequestURI.getPath.stripPrefix("/blob/").toInt
      val body = blobBytes(n)
      ex.sendResponseHeaders(200, body.length.toLong)
      // write in small chunks so a multi-block payload cannot arrive
      // in one read() even against loopback buffering
      val out: OutputStream = ex.getResponseBody
      body.grouped(1024).foreach(out.write)
      out.close()
      ex.close()
    })
    server.createContext("/missing", (ex: HttpExchange) => {
      ex.sendResponseHeaders(404, -1); ex.close()
    })
    server.createContext("/redirect/", (ex: HttpExchange) => {
      val n = ex.getRequestURI.getPath.stripPrefix("/redirect/")
      ex.getResponseHeaders.set("Location", s"$base/blob/$n")
      ex.sendResponseHeaders(302, -1); ex.close()
    })
    server.createContext("/hang", (ex: HttpExchange) => {
      // never send headers: the client's read timeout must fire
      Thread.sleep(5000); ex.close()
    })
    // serve with an executor so a hung /hang handler can't serialize
    // the other routes behind it
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  test("httpTransport streams real multi-block HTTP bodies exactly, " +
      "across partitions") {
    val sizes = Seq(0, 1, 8192, 20000, 65536)
    val urls = sizes.map(n => s"$base/blob/$n").toDF("url").repartition(3)
    val got = MediaFetch.fetchMedia(urls, "url", MediaFetch.httpTransport())
      .collect()
    val byUrl = got.map(r => r.getString(0) -> r).toMap
    assert(byUrl.size == sizes.size)
    sizes.foreach { n =>
      val r = byUrl(s"$base/blob/$n")
      assert(r.getBoolean(3), s"blob/$n not ok: ${r.getString(4)}")
      assert(r.getLong(2) == n.toLong)
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]](1), blobBytes(n)), s"blob/$n bytes differ")
    }
  }

  test("httpTransport follows a 302 redirect to the real payload") {
    val got = MediaFetch.fetchMedia(
      Seq(s"$base/redirect/4096").toDF("url"), "url",
      MediaFetch.httpTransport()).head()
    assert(got.getBoolean(3), String.valueOf(got.getString(4)))
    assert(java.util.Arrays.equals(
      got.getAs[Array[Byte]](1), blobBytes(4096)))
  }

  test("a real 404, a read timeout, and a dead port each yield an " +
      "error row, not a failed task") {
    // a bound-then-closed socket gives a port nothing listens on
    val deadPort = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val urls = Seq(
      s"$base/missing",
      s"$base/hang",
      s"http://127.0.0.1:$deadPort/x").toDF("url")
    val rows = MediaFetch.fetchMedia(urls, "url",
        MediaFetch.httpTransport(connectTimeoutMs = 1000,
          readTimeoutMs = 400))
      .collect().map(r => r.getString(0) -> r).toMap
    rows.values.foreach { r =>
      assert(!r.getBoolean(3) && r.get(1) == null && r.getLong(2) == 0L)
      assert(r.getString(4) != null && r.getString(4).nonEmpty)
    }
    assert(rows(s"$base/missing").getString(4)
      .contains("FileNotFoundException"))
    assert(rows(s"$base/hang").getString(4)
      .toLowerCase.contains("timed out"))
  }

  test("the size cap rejects an over-large real body as an error row") {
    val got = MediaFetch.fetchMedia(
      Seq(s"$base/blob/50000").toDF("url"), "url",
      MediaFetch.httpTransport(), maxBytes = 10000L).head()
    assert(!got.getBoolean(3))
    assert(got.getString(4).contains("exceeds maxBytes"))
  }
}
