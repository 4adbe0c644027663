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

  test("orc round-trips the documents table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    parquetDocs.write.mode("overwrite").orc(dir)
    val back = Tables.orcTable(spark, dir)
    assert(back.except(parquetDocs).count() == 0 &&
      parquetDocs.except(back).count() == 0)
  }

  test("mergeSchema surfaces evolved columns, old files read as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    Seq((1L, "a")).toDF("id", "v")
      .write.parquet(s"$dir/batch=0")
    Seq((2L, "b", 9L)).toDF("id", "v", "added")
      .write.parquet(s"$dir/batch=1")
    val merged = Tables.parquetMerged(spark, dir)
      .select("id", "v", "added")
      .as[(Long, String, Option[Long])].collect().sortBy(_._1)
    assert(merged.toSeq == Seq((1L, "a", None), (2L, "b", Some(9L))))
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
