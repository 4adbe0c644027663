package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the test parquet tables (TESTDATA.md).
  *
  * In production these become `spark.read.jdbc` (with the tenant filter
  * pushed into the source, mirroring the reference's
  * `SELECT * FROM {t} WHERE dispensary_id={id}` — utils.py:24-31) or
  * object-store parquet/orc scans. The harness maps every table to one
  * parquet file under a scale-factor directory. All readers return lazy
  * DataFrames; Catalyst pushes filters/projections into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Schema cache: schema-less `spark.read.parquet` re-reads footers for
  // inference on EVERY call, and the harness resolves each table
  // hundreds of times across the registered queries (~15% of the
  // full-registry bench was footer I/O). Caching `path -> StructType`
  // and handing the schema to the reader skips the inference pass while
  // still returning a FRESH relation per call — so (a) nothing here
  // holds a SparkSession reference (an earlier session-keyed
  // DataFrame cache pinned stopped sessions: the cached Dataset's
  // `sparkSession` field made every map value reach its own key),
  // (b) direct self-joins of two `table(...)` calls work without alias
  // gymnastics (distinct plan instances), and (c) the file LISTING is
  // current each call. Only the SCHEMA is frozen — correct for the
  // immutable harness testdata; callers whose files change schema
  // mid-session should call `invalidateSchemaCache()`.
  private val schemaCache =
    scala.collection.concurrent.TrieMap
      .empty[String, org.apache.spark.sql.types.StructType]

  /** Drop all cached parquet schemas (for sources whose schema evolved
    * mid-session; data-only changes never need this). */
  def invalidateSchemaCache(): Unit = schemaCache.clear()

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  // File-size cache for the spreadCpuDense decision (same
  // immutable-testdata rationale as the schema cache; sizes only gate a
  // repartition, so a stale size can never corrupt results).
  private val sizeCache =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Scale-ADAPTIVE scan spread for CPU-DENSE consumers ONLY
    * (optimization guide §2.5, "input skew: one huge unsplittable file
    * — repartition immediately after the read"). The harness tables are
    * single-file, single-ROW-GROUP parquet, so no split config can give
    * the scan more than one task; a per-row-expensive derivation
    * (pixel decode, PII regex battery, per-row vector math) then runs
    * single-threaded while 31 cores idle. When the file layout cannot
    * feed the session (estimated splits at the session's own
    * maxPartitionBytes < defaultParallelism), spread rows round-robin
    * once right after the scan; on a production layout (many files /
    * row groups) the estimate exceeds the core count and this is a
    * NO-OP — the rule adapts with scale instead of pinning a local
    * constant. Sub-256 KB inputs stay unspread (they broadcast anyway).
    *
    * DELIBERATELY opt-in per call site, NOT applied inside `table()`:
    * r21 A/B-measured the blanket version at +58 s across the 287-query
    * registry at sf0.1 (181.4 s vs 123.0 s) — an extra full-table
    * exchange (plus its sort-before-repartition) taxes every scan-light
    * aggregation/join to parallelize the few scan-heavy maps. Only the
    * ~13 queries whose per-row scan work is the measured bottleneck
    * (image decode, PII scrub, lang-id, unit-vector scoring) win from
    * it, so only those call it. SPARK_GRAFT_SPREAD_SCANS=0 disables it
    * everywhere for A/B runs. */
  def spreadCpuDense(spark: SparkSession, df: DataFrame, path: String)
      : DataFrame = {
    if (sys.env.getOrElse("SPARK_GRAFT_SPREAD_SCANS", "1") == "0") return df
    val bytes = sizeCache.getOrElseUpdate(path,
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getContentSummary(p).getLength
      } catch { case _: Throwable => 0L })
    val maxSplit = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(spark.conf.get(
        "spark.sql.files.maxPartitionBytes", "128m"))
    val estSplits = (bytes + maxSplit - 1) / maxSplit.max(1L)
    val par = spark.sparkContext.defaultParallelism
    if (bytes < 262144L || estSplits >= par) df
    else df.repartition(par)
  }

  /** [[spreadCpuDense]] keyed by harness table name. */
  def tableSpread(spark: SparkSession, sfDir: String, name: String)
      : DataFrame =
    spreadCpuDense(spark, table(spark, sfDir, name),
      s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events.parquet carries parquet TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects outright ([PARQUET_TYPE_ILLEGAL]). Sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong=true`; this reader then restores
    * a micros-precision TimestampType `ts` (integer `DIV 1000` == the
    * truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP, so the
    * oracle sees identical instants). */
  def events(s: SparkSession, d: String): DataFrame = {
    // Runtime-settable SQLConf; set defensively so any session (Verify,
    // Bench, tests) can read events without pre-arranged builder config.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _        => raw
    }
  }

  /** Production source path for S1/S4 (utils.py:24-31, :34-47): JDBC scan
    * with the tenant filter expressed as a DataFrame filter — Catalyst
    * pushes it into the generated `WHERE`, reproducing the reference's
    * hand-inlined `WHERE dispensary_id={id}` without string templating
    * (pushdown asserted against an embedded Derby in SourcesSpec).
    * `partitionColumn/numPartitions` shard the read across executors
    * (the reference reads single-threaded; at 100 TB the source must
    * parallelize or it IS the bottleneck). `charset` covers the
    * reference's latin-1 source encoding (members.py:22-23): it lands in
    * the connection properties as `characterEncoding`, the key MySQL's
    * driver (the reference's backend) reads; drivers that don't know the
    * key ignore it. */
  def jdbcTable(s: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: java.util.Properties,
      charset: Option[String] = None): DataFrame = {
    val p = new java.util.Properties()
    // Not putAll: that copies only the Hashtable's DIRECT entries, so a
    // Properties built with defaults would silently lose its default
    // keys; stringPropertyNames() resolves the full default chain.
    props.stringPropertyNames().forEach { k =>
      p.setProperty(k, props.getProperty(k))
    }
    charset.foreach(c => p.setProperty("characterEncoding", c))
    s.read
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .jdbc(url, table, p)
  }

  /** CSV source with an EXPLICIT schema — never schema inference, which
    * costs an extra full pass over the data and can silently mistype
    * columns at scale. `mode=FAILFAST` surfaces malformed rows instead
    * of nulling them (flip to PERMISSIVE + columnNameOfCorruptRecord
    * for quarantine-style pipelines). */
  def csvTable(s: SparkSession, path: String, ddl: String,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .option("header", header)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** JSON-lines source with an explicit schema (same inference/FAILFAST
    * reasoning as csvTable). One JSON object per line — the splittable
    * layout; a single multi-line document would serialize the read. */
  def jsonTable(s: SparkSession, path: String, ddl: String): DataFrame =
    s.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(ddl))
      .option("mode", "FAILFAST")
      .json(path)

  /** ORC source — columnar like parquet, same pushdown/pruning
    * semantics through the same DataSource V2 scan machinery. */
  def orcTable(s: SparkSession, path: String): DataFrame =
    s.read.orc(path)

  /** Parquet read across files with EVOLVED schemas (columns added over
    * time): mergeSchema unions the footers so old files surface the new
    * columns as null. Off by default because footer-merging at listing
    * time costs a pass over every file's metadata — at 100 TB turn it
    * on only for tables that actually evolved. */
  def parquetMerged(s: SparkSession, path: String): DataFrame =
    s.read.option("mergeSchema", "true").parquet(path)

  /** Session config every graft session needs (local test harness). */
  def sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone"           -> "UTC",
    // The synthetic tables' naive parquet timestamps are UTC instants;
    // the DuckDB oracle reads them the same way. Without this, Spark 4
    // infers TIMESTAMP_NTZ (isAdjustedToUTC=false footers) and every
    // unix_micros/epoch expression fails to resolve.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    "spark.sql.adaptive.enabled"           -> "true")
}
