package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Prints the formatted physical plan of selected queries so scale
  * properties can be audited: filters pushed to the scan, broadcast vs
  * sort-merge join choices, whole-stage-codegen spans, absence of
  * cartesian products. `sbt "runMain graft.PlanAudit [names...]"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
    else Seq("f1_pushdown_filter", "q1_agg", "q3_topk", "q5_join_agg",
      "j5_semi_join", "dedup_minhash_pairs", "emb_cosine_topk",
      "ev_tumbling", "members_doc", "menu_items_doc")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // naive parquet timestamps are UTC instants (oracle parity):
      // read them as TIMESTAMP, not TIMESTAMP_NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
