package graft

import graft.operators.LinkGraph

/** Integer-protocol PageRank: hand-stepped ranks, dangling evaporation,
  * multi-edge collapse, and bounds. */
class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int)
  : Map[String, Double] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("hand-stepped 3-node graph: A->B, B->A, A->C (C dangling)") {
    val e = Seq(("A", "B"), ("B", "A"), ("A", "C"))
    // iter 1 (micros): A deg 2, B deg 1; contribs: B<-A 500000,
    // C<-A 500000, A<-B 1000000.
    // A = 150000 + 85*1000000/100 = 1000000
    // B = 150000 + 85*500000/100  = 575000
    // C = 575000; C is dangling -> its mass evaporates next round.
    assert(ranks(e, 1) == Map("A" -> 1.0, "B" -> 0.575, "C" -> 0.575))
    // iter 2: contribs: A<-B 575000, B<-A 500000, C<-A 500000
    // A = 150000 + 488750 = 638750; B = C = 150000 + 425000 = 575000
    assert(ranks(e, 2) == Map("A" -> 0.63875, "B" -> 0.575, "C" -> 0.575))
  }

  test("hub authority: the node every other node links to outranks " +
    "the leaves; duplicate and null edges do not distort it") {
    val spokes = (1 to 6).map(i => (s"n$i", "hub"))
    val dup = spokes ++ spokes // exact duplicates must collapse
    val r = LinkGraph.pageRank(
      (dup.map { case (a, b) => (a: String, b: String) } :+
        ((null: String), "hub") :+ ("n1", (null: String)))
        .toDF("src", "dst"),
      "src", "dst", iters = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("hub") > r("n1"))
    assert((1 to 6).map(i => r(s"n$i")).distinct.size == 1)
    assert(r.keySet == (1 to 6).map(i => s"n$i").toSet + "hub")
  }

  test("deterministic across partitioning and input order") {
    val rnd = new scala.util.Random(31)
    val edges = (0 until 300).map(_ =>
      (s"h${rnd.nextInt(40)}", s"h${rnd.nextInt(40)}"))
    val a = LinkGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = LinkGraph.pageRank(
        edges.reverse.toDF("src", "dst").repartition(7), "src", "dst", 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("refusals: iteration and damping bounds") {
    val e = Seq(("a", "b")).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(e, "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(e, "src", "dst", 51)
    }
    intercept[IllegalArgumentException] {
      LinkGraph.pageRank(e, "src", "dst", 3, dampingPct = 101)
    }
  }
}
