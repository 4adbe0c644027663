package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every registered query family; each family object carries
  * both the Spark plan and its DuckDB oracle twin.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Entities.queries("members_doc")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Decorrelated.queries ++ TextOps.queries ++
      Similarity.queries ++ EventOps.queries ++ Entities.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Decorrelated.oracle ++ TextOps.oracle ++
      Similarity.oracle ++ EventOps.oracle ++ Entities.oracle
}
