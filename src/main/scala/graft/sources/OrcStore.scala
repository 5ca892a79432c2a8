package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** ORC face of the warehouse: the same partitioned-columnar layout
  * contract as [[WarehouseStore]]'s parquet paths, for consumers in the
  * Hive/ORC ecosystem. ORC ships inside spark-sql (no new dependency)
  * and carries the same scale machinery — partition pruning on the
  * directory columns, min/max stripe statistics for predicate pushdown,
  * column projection — so a query over an OrcStore table plans exactly
  * like its parquet twin: pruned directories, pushed filters, narrow
  * read schema. */
object OrcStore {

  /** Overwrite-by-default (truncate-reload idempotence, S5); pass
    * `SaveMode.Append` for incremental drops. */
  def save(df: DataFrame, path: String, partitionCols: Seq[String] = Nil,
           mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
