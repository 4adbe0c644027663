package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage profile of one or more registered queries — the guide §1
  * "where is the time actually going" loop without the Spark UI (which
  * is disabled in this sandbox). Runs each query cold then warm and,
  * for the WARM run, prints every stage's wall-clock, summed task time,
  * task count, input/shuffle bytes and spill, sorted by wall time, so
  * an optimization targets the measured stage instead of the suspected
  * one.
  *
  * Usage: runMain graft.StageProfile <q1,q2,...> — env knobs as Bench
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS).
  */
object StageProfile {
  private final case class St(
    var name: String = "", var wallMs: Long = 0, var tasks: Int = 0,
    var taskMs: Long = 0, var input: Long = 0, var sRead: Long = 0,
    var sWrite: Long = 0, var spill: Long = 0)

  private final class Acc extends SparkListener {
    val stages = TrieMap.empty[Int, St]
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val st = stages.getOrElseUpdate(e.stageId, St())
      val m = e.taskMetrics
      if (m != null) st.synchronized {
        st.tasks += 1
        st.taskMs += m.executorRunTime
        st.input += m.inputMetrics.bytesRead
        st.sRead += m.shuffleReadMetrics.totalBytesRead
        st.sWrite += m.shuffleWriteMetrics.bytesWritten
        st.spill += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val i = e.stageInfo
      val st = stages.getOrElseUpdate(i.stageId, St())
      st.name = i.name.takeWhile(_ != '\n').take(90)
      st.wallMs = (for {a <- i.submissionTime; b <- i.completionTime}
        yield b - a).getOrElse(-1L)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <q1,q2,...>")
    val names = args.flatMap(_.split(",")).toSeq.filter(_.nonEmpty)
    val bad = names.filterNot(SparkEntry.queries.contains)
    require(bad.isEmpty, s"unknown queries: ${bad.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MINPART", "16k"))  // see Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mb(b: Long): String = f"${b / 1048576.0}%8.1f"
    names.foreach { n =>
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      def sweep(): Unit = {
        val keep = graft.operators.SharedStage.liveRddIds(spark)
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => keep.contains(r.id))
          .foreach(_.unpersist(blocking = true))
      }
      def profiled(tag: String): Double = {
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        val t = run()
        // drain the async listener bus so every stage lands in the map
        org.apache.spark.GraftMetricsHook
          .drainListenerBus(spark.sparkContext, 60000L)
        spark.sparkContext.removeSparkListener(acc)
        println(f"\n===== $n $tag=$t%.2fs =====")
        println("  wall_ms task_ms tasks  input_MB  shRd_MB  shWr_MB spill_MB  stage")
        acc.stages.toSeq.sortBy(-_._2.wallMs).take(25).foreach {
          case (id, s) =>
            println(f"  ${s.wallMs}%7d ${s.taskMs}%7d ${s.tasks}%5d " +
              f"${mb(s.input)} ${mb(s.sRead)} ${mb(s.sWrite)} " +
              f"${mb(s.spill)}  [$id] ${s.name}")
        }
        t
      }
      profiled("cold"); sweep()
      profiled("warm"); sweep()
    }
    spark.stop()
  }
}
