package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional third arg: comma-separated query-name filter (local
    // iteration only — the driver always passes exactly two args).
    val (sfDir, outDir) = (args(0), args(1))
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // naive parquet timestamps are UTC instants (oracle parity):
      // read them as TIMESTAMP, not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // Same AQE coalescing floor as Bench: the hash gate must execute
      // under the exact config the bench times (a layout-sensitive
      // query would otherwise pass here and diverge there).
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MINPART", "16k"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Reclaim localCheckpoint blocks from iterative queries (see
      // Bench) — dead after the write completes. Blocking, so a big
      // query's blocks can't bleed memory pressure into the next one.
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A FILTERED local-iteration run must not clobber a full dump's
    // oracle map (check.py iterates this file): with `only` set, keep
    // every existing entry and overwrite just the re-dumped ones.
    val keep: Map[String, String] =
      if (only.isEmpty) Map.empty
      else {
        val p = Paths.get(s"$outDir/oracle_sql.json")
        if (!Files.exists(p)) Map.empty
        else {
          val s = Files.readString(p)
          // parse of our own writer's output: top-level string pairs
          val m = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(s)
          import scala.jdk.CollectionConverters._
          m.properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        }
      }
    val merged = keep ++ SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
