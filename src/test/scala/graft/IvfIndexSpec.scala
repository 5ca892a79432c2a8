package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** IVF ANN: index structure, determinism, and recall against the exact
  * brute-force baseline. */
class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("assignment covers the corpus and is deterministic") {
    val model = IvfIndex.train(emb, "embedding", k = 8)
    val idx = IvfIndex.assign(emb, "vec_id", "embedding", model)
    assert(idx.count() == emb.count())
    val cells = idx.groupBy("cell").count().collect().map(_.getInt(0)).toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 8))
    val again = IvfIndex.assign(emb, "vec_id", "embedding",
      IvfIndex.train(emb, "embedding", k = 8))
    assert(idx.collect().map(r => (r.getLong(0), r.getInt(2))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getInt(2))).toSet)
  }

  test("recall@5 vs brute force is high with generous probes") {
    val model = IvfIndex.train(emb, "embedding", k = 8)
    val idx = IvfIndex.assign(emb, "vec_id", "embedding", model)
    val queries = emb.where(col("vec_id") < 20)
    val exact = Similarity.bruteTopK(emb, queries, "vec_id", "embedding", 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = IvfIndex.search(idx, queries, "vec_id", "embedding", model,
      k = 5, nProbe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall") // random near-orthogonal data:
    // neighbors are weakly clustered, so probing half the cells must still
    // recover at least half the true top-5
  }
}
