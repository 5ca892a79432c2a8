package graft

import graft.sources.JsonlIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL ingest: explicit schema, permissive parse, corrupt lines parked
  * in the audit column instead of killed or dropped. */
class JsonlIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  test("good lines parse, bad lines land whole in the corrupt column") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec")
    java.nio.file.Files.writeString(dir.resolve("part-0.jsonl"),
      """{"doc_id": 1, "text": "hello world"}
        |{"doc_id": 2, "text": "tab\t and \"quotes\" survive"}
        |not json at all {{{
        |{"doc_id": 4}
        |""".stripMargin)
    val out = JsonlIngest.read(spark, dir.toString, schema)
      .orderBy(col("doc_id").asc_nulls_last).collect()
    assert(out.length == 4)
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "hello world")
    assert(out(1).getString(1) == "tab\t and \"quotes\" survive")
    // missing key -> null column, NOT corrupt
    assert(out(2).getLong(0) == 4L && out(2).isNullAt(1) &&
      out(2).isNullAt(2))
    // garbage line: data columns null, raw line in the audit column
    val bad = out(3)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
    assert(bad.getString(2).startsWith("not json"), bad.toString)
    // the dead-letter query (must reference a data column too — Spark
    // disallows queries over ONLY the corrupt column from raw files)
    val nBad = JsonlIngest.read(spark, dir.toString, schema)
      .where(col("_corrupt_record").isNotNull)
      .select("doc_id", "_corrupt_record").collect().length
    assert(nBad == 1)
    intercept[IllegalArgumentException] {
      JsonlIngest.read(spark, dir.toString,
        schema.add("_corrupt_record", StringType))
    }
  }
}
