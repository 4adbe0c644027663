package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` write format — full
  * column evaluation on every row, no driver collect, no count-only
  * pruning (a count() lets Catalyst drop projection work and flatters
  * the numbers; VERDICT r1 watch item).
  *
  * Each query runs SPARK_GRAFT_BENCH_REPEAT times (default 2) and
  * records the MIN — the r8 artifact showed a dozen untouched queries
  * swinging 2-7× between two runs of identical code (machine
  * contention), which made single-run numbers useless as a regression
  * signal; the min of two back-to-back runs is the stable statistic the
  * VERDICT asked for. Set REPEAT=1 for quick local iteration. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (untimed): touch each source once so JVM/codegen/parquet
    // reader initialization isn't billed to whichever query runs first.
    Tables.names.foreach { t =>
      try {
        (if (t == "events") Tables.events(spark, sfDir)
         else Tables.table(spark, sfDir, t)).limit(1)
          .write.mode("overwrite").format("noop").save()
      } catch { case _: Throwable => () }
    }
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2")
      .toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val times = (1 to repeat).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
          }
          val dt = (System.nanoTime() - t0) / 1e9
          // Iterative queries localCheckpoint intermediates; their blocks
          // are only reclaimed when the dead RDD is GC'd, so across 100+
          // queries they silently eat the unified memory pool and make
          // UNRELATED later queries spill. Drop them eagerly — by this
          // point the query's DataFrames are dead, so nothing can still
          // need the blocks. BLOCKING: r8's tail showed RDD-reclaim
          // warnings bleeding into later queries — wait for the blocks
          // to actually go before the next timer starts.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          dt
        }
        name -> times.min
    }
    val total = results.map(_._2).sum
    // The driver extracts this line from a bounded tail window of the sbt
    // output (~2000 chars; BENCH_r01/r02 both came back parsed:null — r02's
    // full-precision 75-query line overran the window). Keep the line
    // compact: 3-decimal seconds, and if it still would not fit, drop the
    // FASTEST queries from the map (total stays over ALL queries). Full
    // precision for every query goes to bench_full.json for local audit.
    // Locale.ROOT: a comma-decimal default locale would emit 52,123 and
    // break the JSON line (the parsed:null failure class).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(qs: Seq[(String, Double)], omitted: Int): String = {
      val m = qs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      val om = if (omitted > 0) s""","queries_omitted":$omitted""" else ""
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$m$om,"sf":"$sfDir"}"""
    }
    val bySlowest = results.sortBy(-_._2)
    val maxLen = 1600
    val keep = Iterator.range(bySlowest.size, 0, -1)
      .find(n => line(bySlowest.take(n).sortBy(_._1),
        bySlowest.size - n).length <= maxLen)
      .getOrElse(1)
    val full = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"),
      s"""{"total":$total,"sf":"$sfDir","queries":$full}""" + "\n")
    println(line(bySlowest.take(keep).sortBy(_._1), bySlowest.size - keep))
    spark.stop()
  }
}
