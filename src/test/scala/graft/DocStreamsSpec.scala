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
    "the one-shot pair set; a replayed batch rewrites the IDENTICAL " +
    "pair partition (exactly-once log); a re-sent batch is a store " +
    "no-op whose partition re-emits its ids' pairs") {
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
    def toSet(df: org.apache.spark.sql.DataFrame) = df
      .select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    try {
      mem.addData(b0.toIndexedSeq: _*); q.processAllAvailable() // bootstrap
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable() // incremental
      def pairSet() = toSet(spark.read.parquet(s"$base/pairs"))
      val oneShot = toSet(Dedup.minhashDuplicates(docs, "doc_id", "text", 0.4))
      assert(pairSet() == oneShot,
        s"missing=${(oneShot -- pairSet()).take(5)} " +
          s"extra=${(pairSet() -- oneShot).take(5)}")
      // a re-SENT batch (same ids again, new batch id) is a store no-op;
      // its partition re-emits the pairs touching those ids (the
      // documented re-send contract — distinct union is unchanged)
      mem.addData(b0.toIndexedSeq: _*); q.processAllAvailable()
      assert(pairSet() == oneShot)
      assert(toSet(spark.read.parquet(s"$base/pairs/batch=2")) ==
        oneShot.filter(p => p._1 % 2 == 0 || p._2 % 2 == 0),
        "re-sent batch partition != pairs touching its ids")
      assert(Dedup.minhashIncremental(docs, "doc_id", "text",
        s"$base/store", 0.4).count() == 0L)
      // exactly-once under REPLAY: wipe batch=1's partition, then drive
      // the same batch through the production foreachBatch body — the
      // partition must come back byte-identical (the at-most-once wart
      // this design replaced rewrote it EMPTY, because every id read as
      // already-seen)
      val batch1 = toSet(spark.read.parquet(s"$base/pairs/batch=1"))
      assert(batch1.nonEmpty,
        "incremental batch logged no pairs — the wipe below would be vacuous")
      val fs = new org.apache.hadoop.fs.Path(s"$base/pairs")
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(s"$base/pairs/batch=1"), true)
      assert(pairSet() != oneShot, "wiping batch=1 changed nothing")
      DocStreams.processBatch(b1.toIndexedSeq.toDF("doc_id", "text"), 1L,
        "doc_id", "text", s"$base/store", s"$base/pairs",
        threshold = 0.4, bands = 4, ngram = 3)
      assert(toSet(spark.read.parquet(s"$base/pairs/batch=1")) == batch1,
        "replayed batch did not rewrite the identical pair partition")
      assert(pairSet() == oneShot)
      // and the from-nothing remedy still holds: the FULL pair set
      // derives from the store alone
      val derived = toSet(Dedup.derivePairsFromStore(spark, s"$base/store", 0.4))
      assert(derived == oneShot,
        s"missing=${(oneShot -- derived).take(5)} " +
          s"extra=${(derived -- oneShot).take(5)}")
    } finally q.stop()
  }
}
