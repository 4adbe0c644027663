package graft
import org.apache.spark.sql.SparkSession
object TmpRecProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      spark.sql("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) FROM t").show()
      println("RECURSIVE_OK")
    } catch { case e: Throwable => println("UNSUPPORTED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
