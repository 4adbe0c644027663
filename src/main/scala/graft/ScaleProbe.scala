package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the pair-generation backbone — the
  * operators whose 100 TB posture the repo argues from plan shape get
  * their growth MEASURED here instead: each probe runs at 1× and at
  * `mult`× corpus replication (replica text is suffix-perturbed so
  * shingle/band structure keeps the original bucket-size distribution
  * instead of collapsing replicas into mult-sized exact-dup cliques),
  * and the printed ratio is the observed cost growth for a mult×
  * data growth. A bucket-local/capped pipeline should grow ~mult
  * (work per bucket is bounded; bucket COUNT grows); an uncapped
  * pair path would grow ~mult² and this harness would show it.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <mult> [repeats]
  * (times are min over repeats of a noop-sink materialization,
  * same discipline as Bench). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val mult = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    def replicate(k: Int): DataFrame =
      if (k == 1) base
      else base
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(k - 1))).as("__r"))
        .select((col("doc_id") * k + col("__r")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("__r")).as("text"))
    // Content-hash co-occurrence input: ~50-member buckets plus one
    // hot key holding ~1% of all rows (the capped path must absorb
    // it at any scale).
    def frameLike(k: Int): DataFrame = {
      val n = base.count() * k * 5
      spark.range(0, n).select(col("id").as("media_id"),
        when(col("id") % 100 === 0, lit("HOT"))
          .otherwise(concat(lit("f"), pmod(col("id"), lit(n / 50))))
          .as("fhash"))
    }
    def time(df: => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        (System.nanoTime() - t0) / 1e9
      }.min
    val probes: Seq[(String, Int => DataFrame)] = Seq(
      "dedup_exact (hash groupBy)" ->
        (k => graft.api.GraftOps.dedupExact(replicate(k), "doc_id", "text")),
      "minhashCandidatePairs (LSH collect path)" ->
        (k => graft.api.GraftOps
          .minhashCandidatePairs(replicate(k), "doc_id", "text")),
      "cappedKeyPairCounts (salted join path)" ->
        (k => graft.api.GraftOps
          .cappedKeyPairCounts(frameLike(k), "fhash", "media_id")))
    println(f"[scale] sf=$sfDir mult=$mult reps=$reps")
    probes.foreach { case (name, mk) =>
      val t1 = time(mk(1))
      val tk = time(mk(mult))
      println(f"[scale] $name%-42s 1x=$t1%7.2f s  ${mult}x=$tk%7.2f s" +
        f"  growth=${tk / t1}%5.2f (linear=$mult%d.00)")
    }
    spark.stop()
  }
}
