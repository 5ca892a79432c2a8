package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Permissive CSV/text ingestion edge — SURVEY.md §2.1 S1/S2 and §2.2
  * P1-P4: everything reads as string, headers are normalized and
  * auto-mapped, missing columns are injected as NULL so downstream selects
  * never fail.
  *
  * Reference behavior (cites into /root/reference/):
  *  - all-string, BOM-tolerant read: etl/order_info_etl.py:175-176
  *  - header normalization: etl/order_info_etl.py:31-35
  *  - explicit rename map: etl/order_info_etl.py:184-190
  *  - case-insensitive auto-map: etl/product_info_etl.py:192-202
  *  - fuzzy attribute discovery: etl/product_info_etl.py:262-277
  *  - missing-column defaulting: etl/order_info_etl.py:223-225
  */
object CsvIngest {

  /** P1: strip, drop BOM, spaces/hyphens → underscore. */
  def normalizeColName(c: String): String =
    c.trim.replace("﻿", "").replace(" ", "_").replace("-", "_")

  /** S1/S2: header CSV or Excel, every column StringType (schema-on-read
    * with explicit coercion later — the reference's `dtype=str` contract).
    * Multiline and quoted CSV fields tolerated. File-extension dispatch
    * mirrors order_info_etl.py:173-180: `.csv/.txt` → the distributed CSV
    * scan, `.xlsx` → [[XlsxIngest]] (OOXML), `.xls` → [[XlsIngest]]
    * (BIFF8 compound file; BIFF5 fails fast with a convert message). */
  def readAllString(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".xlsx")) return XlsxIngest.readAllString(spark, path)
    if (lower.endsWith(".xls")) return XlsIngest.readAllString(spark, path)
    require(lower.endsWith(".csv") || lower.endsWith(".txt"),
      s"unsupported input file type: $path")
    val raw = spark.read
      .option("header", "true")
      .option("encoding", "UTF-8")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
    raw.toDF(raw.columns.map(normalizeColName): _*)
  }

  /** Header-first string grid → all-string DataFrame (shared by the two
    * Excel readers): header names normalized; data rows WIDER than the
    * header get synthetic `unnamed_<i>` columns (the analog of pandas'
    * `Unnamed: N`) rather than silent truncation. */
  private[sources] def gridToDf(spark: SparkSession,
                                rows: Vector[Array[String]],
                                what: String): DataFrame = {
    require(rows.nonEmpty, s"no rows in first sheet of $what")
    val width = rows.iterator.map(_.length).max
    val header = Array.tabulate(width) { i =>
      if (i < rows.head.length)
        normalizeColName(Option(rows.head(i)).getOrElse(""))
      else s"unnamed_$i"
    }
    val data: java.util.List[org.apache.spark.sql.Row] =
      new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.tail.foreach { r =>
      data.add(org.apache.spark.sql.Row.fromSeq((0 until width).map(i =>
        if (i < r.length) r(i) else null)))
    }
    val schema = org.apache.spark.sql.types.StructType(header.map(
      org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType)).toSeq)
    spark.createDataFrame(data, schema)
  }

  /** P2: explicit rename pairs, applied only when present. */
  def renameIfPresent(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** P3: case-insensitive auto-map — if `target` is absent, adopt the first
    * column whose lowercased name matches one of `aliases`. */
  def autoMap(df: DataFrame, target: String, aliases: Seq[String]): DataFrame =
    if (df.columns.contains(target)) df
    else df.columns.find(c => aliases.contains(c.toLowerCase)) match {
      case Some(found) => df.withColumnRenamed(found, target)
      case None => df
    }

  /** P4: fuzzy attribute discovery — first column whose lowercase name
    * contains ALL of `needles`. */
  def findFuzzy(df: DataFrame, needles: Seq[String]): Option[String] =
    df.columns.find(c => needles.forall(c.toLowerCase.contains))

  /** P12: inject NULL string columns for any of `required` that is absent.
    * Returns the frame plus the set of columns that were injected — callers
    * that need pandas-parity null stringification (see
    * [[graft.etl.OrderEtl]]) distinguish injected-column NULLs ("None")
    * from missing-cell NULLs ("nan"). */
  def ensureColumns(df: DataFrame, required: Seq[String]): (DataFrame, Set[String]) = {
    val missing = required.filterNot(df.columns.contains)
    // one projection, not a withColumn per missing column — each
    // withColumn is a full analyzer pass over the (44-column) plan
    val out =
      if (missing.isEmpty) df
      else df.select(df.columns.map(col) ++
        missing.map(c => lit(null).cast("string").as(c)): _*)
    (out, missing.toSet)
  }
}
