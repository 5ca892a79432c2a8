package graft.sources

import graft.etl.OrderEtl.Warehouse
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse persistence (SURVEY.md §2.1 S4-S7): dims as plain parquet
  * (they're KB-MB at any scale), the fact table partitioned by
  * (year, month) of date_id.
  *
  * Why this layout at 100 TB: the dashboard/view queries all constrain or
  * group on date attributes, so date partitioning turns them into
  * partition-pruned scans; within a partition, parquet row-group stats
  * give min/max pruning on the remaining predicates. `overwrite` on the
  * staging path is the truncate-reload idempotence of the reference
  * (S5); `append` on fact is the incremental load path. fact files are
  * written pre-sorted by product_id so per-product rollups read
  * clustered row groups.
  */
object WarehouseStore {

  def saveFact(fact: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    fact
      .withColumn("p_year", year(col("date_id")))
      .withColumn("p_month", month(col("date_id")))
      .repartition(col("p_year"), col("p_month"))
      .sortWithinPartitions(col("product_id"))
      .write.mode(mode)
      .partitionBy("p_year", "p_month")
      .parquet(s"$path/fact_sales")

  def save(wh: Warehouse, path: String): Unit = {
    wh.dimDate.write.mode(SaveMode.Overwrite).parquet(s"$path/dim_date")
    wh.dimCustomer.write.mode(SaveMode.Overwrite).parquet(s"$path/dim_customer")
    wh.dimProduct.write.mode(SaveMode.Overwrite).parquet(s"$path/dim_product")
    wh.dimPlatform.write.mode(SaveMode.Overwrite).parquet(s"$path/dim_platform")
    saveFact(wh.factSales, path)
  }

  /** Bucketed catalog table: pre-shuffled on `keys` into `numBuckets` so
    * joins/aggregations on those keys skip the exchange entirely (the
    * "co-located join" layout for fact↔fact joins at scale, where neither
    * side broadcasts). Requires a catalog (saveAsTable), unlike the plain
    * parquet paths above. */
  def saveBucketed(df: DataFrame, table: String, keys: Seq[String],
                   numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction for the incrementally-appended fact: every
    * `saveFact(..., Append)` batch adds a file per touched (year, month)
    * directory, and a year of hourly loads turns partition listings and
    * scan task counts into the bottleneck. Rewrites each affected
    * partition into ~`targetBytes` files, restoring the product_id
    * cluster ordering that appends interleave.
    *
    * Only partitions matched by `years` (None = all) rewrite — at scale,
    * compaction runs against the recent write window, not the archive.
    * The rewrite stages to a DOT-PREFIXED sibling temp dir (a bare
    * `p_month=N.compact_tmp` parses as a legitimate key=value partition
    * dir and silently flips the p_month column to string — the exact
    * torn-temp-as-data hazard the artifact stores eliminated this
    * round), then swaps with a TWO-RENAME sequence (live aside,
    * compacted in, drop the set-aside) so a complete month partition
    * exists at every instant; both torn states heal at the next
    * compaction's entry. Single-writer maintenance op. */
  def compactFact(spark: SparkSession, path: String,
                  targetBytes: Long = 128L * 1024 * 1024,
                  years: Option[Seq[Int]] = None): Unit = {
    import org.apache.hadoop.fs.Path
    val factPath = new Path(s"$path/fact_sales")
    val fs = factPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(factPath)) return
    val yearDirs = fs.listStatus(factPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_year="))
      .filter(s => years.forall(
        _.contains(s.getPath.getName.stripPrefix("p_year=").toInt)))
    yearDirs.foreach { yd =>
      // heal a torn prior swap: a month dir missing with its compacted
      // copy staged (crash between the renames) promotes the copy;
      // failing that the set-aside originals are restored; stale dot
      // dirs next to a live month are dropped
      fs.listStatus(yd.getPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(".p_month="))
        .foreach { dd =>
          val live = new Path(yd.getPath, dd.getPath.getName
            .stripPrefix(".").replaceAll("\\.compact_(tmp|old)$", ""))
          if (!fs.exists(live) &&
              dd.getPath.getName.endsWith(".compact_tmp"))
            require(fs.rename(dd.getPath, live),
              s"compactFact recovery: promote ${dd.getPath} manually")
          else if (!fs.exists(live))
            require(fs.rename(dd.getPath, live),
              s"compactFact recovery: restore ${dd.getPath} manually")
          else fs.delete(dd.getPath, true)
        }
      fs.listStatus(yd.getPath)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("p_month="))
        .foreach { md =>
          val files = fs.listStatus(md.getPath)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          if (files.length > 1) {
            val nFiles = math.max(1,
              math.ceil(files.map(_.getLen).sum.toDouble / targetBytes).toInt)
            val tmp = new Path(md.getPath.getParent,
              s".${md.getPath.getName}.compact_tmp")
            val old = new Path(md.getPath.getParent,
              s".${md.getPath.getName}.compact_old")
            fs.delete(tmp, true)
            fs.delete(old, true)
            spark.read.parquet(md.getPath.toString)
              .repartition(nFiles)
              .sortWithinPartitions(col("product_id"))
              .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
            // two-rename swap: a complete month exists at every instant
            require(fs.rename(md.getPath, old),
              s"compactFact: could not set ${md.getPath} aside — originals untouched")
            require(fs.rename(tmp, md.getPath),
              s"compactFact: swap failed for ${md.getPath} — compacted data at " +
                s"$tmp, originals at $old; re-running recovers")
            fs.delete(old, true)
          }
        }
    }
  }

  /** Partition-pruned fact read: the year filter lands on the p_year
    * partition column BEFORE it is dropped, so Spark lists and reads only
    * the matching (p_year=…) directories — at 100 TB this is the
    * difference between scanning one year and scanning the table. */
  def loadFactYear(spark: SparkSession, path: String, year: Int): DataFrame =
    spark.read.parquet(s"$path/fact_sales").where(col("p_year") === year)

  def load(spark: SparkSession, path: String): Warehouse =
    Warehouse(
      dimDate = spark.read.parquet(s"$path/dim_date"),
      dimCustomer = spark.read.parquet(s"$path/dim_customer"),
      dimProduct = spark.read.parquet(s"$path/dim_product"),
      dimPlatform = spark.read.parquet(s"$path/dim_platform"),
      factSales = spark.read.parquet(s"$path/fact_sales")
        .drop("p_year", "p_month"))
}
