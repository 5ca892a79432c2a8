package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Deterministic-sharded gzip JSONL export — the hand-off format for
  * training loaders, complementing [[JsonlIngest]] on the way out.
  *
  * Shard assignment reuses [[graft.operators.TrainingData.deterministicShuffle]]'s
  * engine-portable contract: `shard = pmod(stableId63(id), numShards)`,
  * `pos` = rank within the shard by (key, id). A loader that reads
  * directories `shard=0..n-1` in `pos` order replays the IDENTICAL
  * global permutation on any engine, any cluster size, any day — and
  * because the assignment is a pure function of the id, re-exporting
  * after an upstream fix rewrites each document into the same shard
  * (only changed shards differ, loaders can resume by shard).
  *
  * Layout: `path/shard=N/part-*.json.gz`, one JSON object per line,
  * rows within each part file already in `pos` order (the shard
  * window's sort IS (key, id) order — no extra sort). Gzip per part
  * file: Spark decompresses per-file on read, so numShards is also the
  * read parallelism floor. Size it like shuffle partitions (a few ×
  * cores at the target scale), never 1.
  *
  * Scale shape: ONE exchange (the shard window's hash partition on
  * `shard`); text bytes move through it once — the same cost as any
  * global reshard. No driver-side state at all. */
object JsonlExport {

  def write(df: DataFrame, idCol: String, path: String,
            numShards: Int): Unit = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    graft.operators.TrainingData.deterministicShuffle(df, idCol, numShards)
      // explicit (shard, pos) task-local sort: it satisfies the writer's
      // required ordering on the partition column (so no second sort is
      // inserted) AND pins pos order inside each part file — the
      // writer's own partition-column sort makes no tie-order promise
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .option("compression", "gzip")
      .json(path)
  }

  /** Read an export back: explicit data schema (same rule as
    * [[JsonlIngest]] — never infer over 100 TB), `shard` recovered from
    * the partition directories, `pos` from the data. The caller's
    * schema must NOT declare them. */
  def read(spark: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt_record"): DataFrame = {
    require(!schema.fieldNames.contains("shard") && !schema.fieldNames.contains("pos"),
      "shard/pos are supplied by the export layout — leave them out of the schema")
    JsonlIngest.read(spark, path,
      schema.add("pos", IntegerType, nullable = true), corruptCol)
  }
}
