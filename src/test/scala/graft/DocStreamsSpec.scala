package graft

import graft.operators.Dedup
import graft.streaming.DocStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous near-dup ingest: MemoryStream micro-batches through the
  * persisted MinHash store, cross-checked against the one-shot batch
  * pipeline on the same documents. */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("nearDupIngest: bootstrap + incremental batches produce exactly " +
    "the one-shot pair set; a replayed (already-seen) batch logs no " +
    "pairs and leaves the store intact") {
    implicit val sqlCtx = spark.sqlContext
    val base = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_docstream_spec_${System.nanoTime()}")
    base.deleteOnExit()
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val (b0, b1) = rows.partition(_._1 % 2 == 0)
    val mem = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupIngest(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      s"$base/store", s"$base/pairs", s"$base/ckpt", threshold = 0.4,
      availableNow = false)
    try {
      mem.addData(b0.toIndexedSeq: _*); q.processAllAvailable() // bootstrap
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable() // incremental
      def pairSet() = spark.read.parquet(s"$base/pairs")
        .select("d1", "d2", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val oneShot = Dedup.minhashDuplicates(docs, "doc_id", "text", 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pairSet() == oneShot,
        s"missing=${(oneShot -- pairSet()).take(5)} " +
          s"extra=${(pairSet() -- oneShot).take(5)}")
      // an already-seen batch is a store no-op and logs zero pairs
      mem.addData(b0.toIndexedSeq: _*); q.processAllAvailable()
      assert(pairSet() == oneShot)
      assert(Dedup.minhashIncremental(docs, "doc_id", "text",
        s"$base/store", 0.4).count() == 0L)
      // the documented at-most-once wart, and its executable remedy: a
      // replay rewrites a batch's pair partition to empty — simulate the
      // loss, then re-derive the FULL pair set from the store alone
      val fs = new org.apache.hadoop.fs.Path(s"$base/pairs")
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(spark.read.parquet(s"$base/pairs/batch=1").count() > 0,
        "incremental batch logged no pairs — the wipe below would be vacuous")
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/pairs/batch=1"), true)
      assert(pairSet() != oneShot, "wiping batch=1 changed nothing")
      val derived = Dedup.derivePairsFromStore(spark, s"$base/store", 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(derived == oneShot,
        s"missing=${(oneShot -- derived).take(5)} " +
          s"extra=${(derived -- oneShot).take(5)}")
    } finally q.stop()
  }
}
