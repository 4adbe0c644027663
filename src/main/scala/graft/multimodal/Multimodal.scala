package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star: image/audio/video as opaque
  * binary columns + typed metadata, with decode/feature-extract as
  * partition-parallel operators).
  *
  * The actual codec step is STUBBED (no image/audio libraries ship in this
  * container): `decodeStub` derives deterministic fake dimensions from the
  * payload bytes. Everything around it — the binary schema, the
  * mapPartitions batch shape, the explicit output StructType, the
  * per-partition amortization pattern (open codec once per partition, not
  * per row) — is the real 100 TB-relevant plumbing and is tested.
  */
object Multimodal {

  /** Typed media-metadata schema carried beside the binary payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB decode: deterministic fake dimensions from payload bytes.
    * Replace the body with a real codec (e.g. javax.imageio / ffmpeg
    * bindings) in production — the operator shape does not change. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val h = if (payload == null || payload.isEmpty) 0
    else payload.foldLeft(17)((acc, b) => acc * 31 + (b & 0xff)) & 0x7fffffff
    (16 + h % 640, 16 + (h / 640) % 480, 3)
  }

  /** Decode/feature-extract as mapPartitions over the binary column:
    * one iterator pass per partition (codec init amortized), explicit
    * output schema (no inference), no driver involvement. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      // Real impl: initialize the codec HERE, once per partition.
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte]
        else r.getAs[Array[Byte]](1)
        val (w, h, c) = fakeDecode(payload)
        Row(id, payload.length.toLong, w, h, c)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** STUB resize: deterministic byte-domain downsample standing in for an
    * image resize (real impl swaps the body for a codec scale call; the
    * operator shape — binary in, binary out + new dims, partition-
    * parallel projection — is unchanged). Keeps every `factor`-th byte. */
  def resizeStub(media: DataFrame, factor: Int): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte]
        else r.getAs[Array[Byte]](1)
        val resized = payload.grouped(factor).map(_.head).toArray
        Row(id, resized, resized.length.toLong)
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("byte_len", LongType, nullable = false))))
  }

  /** Frame sampling for video-shaped payloads: emit every `stride`-th
    * fixed-size chunk as a "frame" (stub for keyframe extraction). A
    * generator-shaped op: one input row → N output rows, columnar via
    * posexplode so it stays in Tungsten.
    * Spark's base64 emits MIME-CHUNKED output (76-char lines joined with
    * \r\n) — the line breaks both corrupt the 4-chars-per-3-bytes chunk
    * arithmetic and stop `.{n}` from matching across lines, silently
    * collapsing any payload over one line to a single "frame" (caught by
    * the DuckDB oracle, whose to_base64 is unchunked). Strip them first. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
      posexplode(split(
        regexp_replace(base64(col("payload")), "[\\r\\n]", ""),
        s"(?<=\\G.{${4 * frameBytes}})"))
        .as(Seq("frame_idx", "frame_b64")))
      // split keeps a trailing "" when the length divides evenly (and
      // yields [""] for empty payloads) — not a frame, drop it here
      // rather than in every caller.
      .filter(col("frame_b64") =!= "")
      .filter(col("frame_idx") % stride === 0)
}
