package graft

import org.apache.spark.sql.functions._

/** Source-format coverage: CSV and JSON-lines readers must round-trip
  * the documents table bit-for-bit against the parquet source, with
  * explicit schemas (no inference pass) and FAILFAST on malformed
  * rows. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val ddl =
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"

  private def parquetDocs =
    Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "source", "n_chars")

  test("csv round-trips the documents table with an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    parquetDocs.write.mode("overwrite").option("header", true).csv(dir)
    val back = Tables.csvTable(spark, dir, ddl)
    assert(back.schema.map(_.dataType) ==
      parquetDocs.schema.map(_.dataType))
    assert(back.except(parquetDocs).count() == 0 &&
      parquetDocs.except(back).count() == 0)
  }

  test("json-lines round-trips the documents table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    parquetDocs.write.mode("overwrite").json(dir)
    val back = Tables.jsonTable(spark, dir, ddl)
    assert(back.except(parquetDocs).count() == 0 &&
      parquetDocs.except(back).count() == 0)
  }

  test("FAILFAST surfaces malformed csv rows instead of nulling them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/bad.csv"),
      "doc_id,lang,source,n_chars\n1,en,s0,10\nnot_a_number,xx,s1,abc\n")
    val ex = intercept[Exception] {
      Tables.csvTable(spark, dir, ddl).collect()
    }
    assert(ex.getMessage.contains("Malformed") ||
      ex.getClass.getName.contains("SparkException"))
  }
}
