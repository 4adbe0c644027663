package graft.sources

import java.io.{ByteArrayOutputStream, InputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** S7's media fetch loop, distributed — the last reference behavior
  * that was reproduced only as URL construction (Scalars.imageUrl).
  *
  * The reference (utils.py:67-106) streams one image at a time on the
  * driver-equivalent: urlopen → read 8192-byte blocks → local file,
  * success judged by a present Content-Length. At 100 TB of media that
  * loop IS the bottleneck, so here the fetch runs inside mapPartitions
  * — every partition pulls its own URLs concurrently, nothing routes
  * through the driver — with the same block-streamed copy (a payload
  * larger than one block must not be slurped in one read) and a
  * per-row error row instead of a failed task (one dead URL in a
  * billion must not kill a stage; the reference logs and moves on,
  * utils.py:103-105).
  *
  * The TRANSPORT is pluggable (`String => InputStream`): production
  * wires `httpTransport` (plain java.net.URL streaming), exercised
  * end-to-end against a loopback HTTP server in MediaFetchHttpSpec
  * (multi-block bodies, redirects, 404/timeout/dead-port error rows,
  * size cap — all over a real socket, zero egress); specs that only
  * need the operator machinery wire `fakeTransport`, a deterministic
  * closed-form byte pattern per URL. */
object MediaFetch {

  type Transport = String => InputStream

  val fetchSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("err", StringType, nullable = true)))

  /** Production transport: plain HTTP(S) streaming, the urlopen
    * equivalent. Follows redirects, no auth — callers needing signed
    * requests supply their own Transport. Both timeouts are ALWAYS
    * set: a bare `openStream()` has none, so one hung connection
    * would pin an executor slot forever — at 1000 executors a few
    * thousand dead hosts in a URL corpus silently drain the whole
    * fetch stage. A timeout surfaces as that row's error row
    * (fetchMedia's per-row fault isolation), never a stuck task. */
  def httpTransport(connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000): Transport = { url =>
    val conn = new java.net.URL(url).openConnection()
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.getInputStream
  }

  /** Deterministic offline transport: URL u yields
    * len(u)·700 mod 100_000 bytes (multi-block for any realistic URL),
    * byte j = (j·31 + len(u)) mod 256 — closed-form so specs can
    * assert exact payloads. URLs containing "missing" throw (the
    * dead-link path). */
  def fakeTransport: Transport = { url =>
    if (url.contains("missing"))
      throw new java.io.FileNotFoundException(url)
    val n = url.length * 700 % 100000
    val bytes = Array.tabulate[Byte](n)(j => ((j * 31 + url.length) % 256).toByte)
    new java.io.ByteArrayInputStream(bytes)
  }

  /** Fetch every row's `urlCol` through `transport`, one row out per
    * row in: (url, payload, n_bytes, ok, err). Distribution/order of
    * the input is preserved-by-partition (no shuffle is introduced);
    * rows whose fetch fails carry ok=false + the exception message and
    * a null payload. `maxBytes` caps a single payload (an oversized
    * object yields an error row, not an OOM'd executor). */
  def fetchMedia(df: DataFrame, urlCol: String, transport: Transport,
      blockSize: Int = 8192, maxBytes: Long = 64L * 1024 * 1024)
      : DataFrame = {
    require(blockSize > 0 && maxBytes > 0,
      "fetchMedia: blockSize and maxBytes must be positive")
    val spark = df.sparkSession
    val rdd = df.select(urlCol).rdd.mapPartitions { it =>
      it.map { r =>
        val url = r.getString(0)
        if (url == null)
          Row(null, null, 0L, false, "null url")
        else {
          try {
            val in = transport(url)
            try {
              val out = new ByteArrayOutputStream()
              val buf = new Array[Byte](blockSize)
              var total = 0L
              // read == 0 is legal for a misbehaving Transport (a
              // blocking stream never returns it for a non-empty
              // buffer) — unbounded, it would spin this task forever,
              // so it is tolerated only maxZeroReads times in a row
              // before the row errors out.
              val maxZeroReads = 1024
              var zeroReads = 0
              var read = in.read(buf)
              while (read >= 0 && total <= maxBytes &&
                  zeroReads < maxZeroReads) {
                if (read == 0) zeroReads += 1
                else {
                  zeroReads = 0
                  out.write(buf, 0, read)
                  total += read
                }
                read = in.read(buf)
              }
              if (zeroReads >= maxZeroReads)
                Row(url, null, 0L, false,
                  s"transport stalled: $maxZeroReads consecutive " +
                    "zero-byte reads")
              else if (total > maxBytes)
                Row(url, null, 0L, false,
                  s"payload exceeds maxBytes=$maxBytes")
              else
                Row(url, out.toByteArray, total, true, null)
            } finally in.close()
          } catch {
            case scala.util.control.NonFatal(e) =>
              Row(url, null, 0L, false,
                s"${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
    }
    spark.createDataFrame(rdd, fetchSchema)
  }
}
