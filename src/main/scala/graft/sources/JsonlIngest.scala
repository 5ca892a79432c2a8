package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (one JSON object per line) corpus ingest — the interchange
  * format text corpora actually arrive in (optionally gzip part files,
  * which Spark splits per file and decompresses in the scan).
  *
  * Scale rules this reader enforces rather than documents:
  *  - the schema is EXPLICIT, never inferred — `inferSchema` is a full
  *    extra pass over 100 TB before the first real one, and a sampled
  *    inference can silently type a sparse key from whichever part files
  *    the sample hit;
  *  - malformed lines don't kill the job OR vanish: PERMISSIVE mode
  *    parks the raw line in `corruptCol` (null columns otherwise), so
  *    the ingest emits its own audit trail. The dead-letter query must
  *    also reference a data column — e.g. `.where(col(corruptCol)
  *    .isNotNull).select("doc_id", corruptCol)` — because Spark rejects
  *    raw-file queries whose referenced columns are ONLY the corrupt
  *    column (cache the parsed frame to lift that);
  *  - missing keys are null — defaulting/cleanup stays in the
  *    downstream cleaning pass (CleanExprs), same contract as the CSV
  *    path (`CsvIngest`).
  */
object JsonlIngest {

  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already defines '$corruptCol'")
    spark.read
      .schema(schema.add(corruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
