package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous near-dup ingest: a document stream drained micro-batch by
  * micro-batch through the persisted MinHash signature store — the
  * [[IncrementalIngest]] shape (stateless stream, durable state in a
  * store the batch operators own) applied to [[graft.operators.Dedup
  * .minhashIncremental]]. Each batch is deduped against everything the
  * store has seen (all prior batches included), its signatures are
  * appended, and the duplicate pairs it surfaced land in a per-batch
  * output partition.
  *
  * Exactly-once: the STORE side is safe under replay by
  * `minhashIncremental`'s own contracts — already-seen ids are
  * skipped, and the bands-before-postings append order makes
  * re-running a torn batch the recovery. The PAIRS side writes
  * `pairsPath/batch=<id>/` with overwrite, so a replayed batch never
  * DUPLICATES pairs; but a replay whose store append already landed
  * sees every id as seen and rewrites its partition to empty — so the
  * pair log is at-most-once per batch under replay, stated loudly,
  * while the store (the system of record for dedup state) is
  * exactly-once. Pipelines that need a replay-stable pair log derive
  * it from the store with [[graft.operators.Dedup
  * .derivePairsFromStore]] (bands → candidates → postings-verified
  * Jaccard, no corpus rescan; spec-gated here against a wiped pair
  * partition) rather than trusting a replayed log partition.
  *
  * Bootstrap: the first batch to arrive creates the store
  * ([[Dedup.saveMinhashStore]] + intra-batch [[Dedup
  * .minhashDuplicates]]); every later batch rides the incremental
  * path. This is the production cold-start — no separate seeding job.
  */
object DocStreams {

  def nearDupIngest(docs: DataFrame, idCol: String, textCol: String,
                    storePath: String, pairsPath: String,
                    checkpointDir: String, threshold: Double,
                    bands: Int = 4, ngram: Int = 3,
                    availableNow: Boolean = true): StreamingQuery = {
    require(docs.isStreaming, "nearDupIngest: docs must be a streaming frame")
    val writer = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pairs =
          // bootstrapped iff the store MANIFEST exists — the save's
          // single commit point, so a torn bootstrap re-runs cleanly
          if (Dedup.minhashStoreReady(spark, storePath)) {
            Dedup.minhashIncremental(batch, idCol, textCol, storePath,
              threshold, bands, ngram)
          } else {
            Dedup.saveMinhashStore(batch, idCol, textCol, storePath,
              bands, ngram)
            Dedup.minhashDuplicates(batch, idCol, textCol, threshold,
              bands, ngram)
          }
        pairs.write.mode("overwrite")
          .parquet(s"$pairsPath/batch=$batchId")
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
