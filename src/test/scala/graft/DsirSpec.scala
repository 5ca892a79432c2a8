package graft

import graft.operators.TrainingData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** DSIR importance weights and Gumbel-top-k resampling: hand-replicated
  * LM arithmetic, sign semantics, determinism, and the refusal envelope. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // trainQualityLm's per-token nll, replicated: round(-ln((c+a)/(N+a(V+1))), 6)
  private def nll(c: Long, n: Long, v: Int, alpha: Double = 0.5): BigDecimal =
    BigDecimal(-math.log((c + alpha) / (n + alpha * (v + 1))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)

  test("weights equal the hand-replicated two-LM log ratio exactly") {
    // target: 'good' dominant; raw: 'bad' dominant; both vocabs full
    val target = Seq("good good nice", "good text").toDF("text")
    val raw = Seq("bad bad noise", "bad text").toDF("text")
    val docs = Seq((1L, "good good"), (2L, "bad"), (3L, "text"))
      .toDF("doc_id", "text")
    val v = 10
    val tLm = TrainingData.trainQualityLm(target, "text", v)
    val rLm = TrainingData.trainQualityLm(raw, "text", v)
    val got = TrainingData.dsirWeights(docs, "doc_id", "text", tLm, rLm)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // target corpus: N=5 (good:3, nice:1, text:1); raw: N=5 (bad:3,
    // noise:1, text:1). OOV class c=0 formula with alpha numerator.
    def tN(tok: String) = tok match {
      case "good" => nll(3, 5, v); case "nice" | "text" => nll(1, 5, v)
      case _ => BigDecimal(-math.log(0.5 / (5 + 0.5 * 11)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def rN(tok: String) = tok match {
      case "bad" => nll(3, 5, v); case "noise" | "text" => nll(1, 5, v)
      case _ => BigDecimal(-math.log(0.5 / (5 + 0.5 * 11)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    def w(toks: String*) =
      ((toks.map(rN).sum - toks.map(tN).sum) * 1000000).toLongExact
        .toDouble / 1e6
    assert(got(1L) == ((2L, w("good", "good"))))
    assert(got(2L) == ((1L, w("bad"))))
    assert(got(3L) == ((1L, w("text"))))
    // sign semantics: target-like positive, raw-like negative, shared ~0
    assert(got(1L)._2 > 0 && got(2L)._2 < 0 && got(3L)._2 == 0.0)
  }

  test("token-less documents emit nothing; an LM without its OOV row " +
    "refuses loudly") {
    val lm = TrainingData.trainQualityLm(Seq("a b").toDF("text"), "text", 5)
    val docs = Seq((1L, "a"), (2L, "   ")).toDF("doc_id", "text")
    val got = TrainingData.dsirWeights(docs, "doc_id", "text", lm, lm)
      .select("doc").as[Long].collect().toSeq
    assert(got == Seq(1L))
    val noOov = lm.where(col("token").isNotNull)
    intercept[IllegalArgumentException] {
      TrainingData.dsirWeights(docs, "doc_id", "text", noOov, lm)
    }
  }

  test("resample: weight gaps larger than the Gumbel range dominate " +
    "the draw; the draw itself is deterministic across partitioning") {
    // two populations whose weight gap (>>30) exceeds the Gumbel
    // noise's reachable span, so every pick must be target-like
    val target = Seq.fill(4)("alpha alpha alpha").toDF("text")
    val raw = Seq.fill(4)("omega omega omega").toDF("text")
    val tLm = TrainingData.trainQualityLm(target, "text", 5)
    val rLm = TrainingData.trainQualityLm(raw, "text", 5)
    // 40 'alpha'-heavy docs (weight >> 0), 40 'omega'-heavy (<< 0);
    // long docs scale the gap past any noise
    val docs = (0L until 80L).map { i =>
      val tok = if (i % 2 == 0) "alpha" else "omega"
      (i, Seq.fill(30)(tok).mkString(" "))
    }.toDF("doc_id", "text")
    val sel = TrainingData.dsirResample(docs, "doc_id", "text", tLm, rLm,
        k = 30)
      .select("doc").as[Long].collect().toSet
    assert(sel.size == 30)
    assert(sel.forall(_ % 2 == 0), s"raw-like doc drawn: $sel")
    val sel2 = TrainingData.dsirResample(docs.repartition(7), "doc_id",
        "text", tLm, rLm, k = 30)
      .select("doc").as[Long].collect().toSet
    assert(sel2 == sel)
  }

  test("resample key replication: selection equals the independently " +
    "recomputed Gumbel-top-k on a mixed fixture") {
    val ref = Seq("x y z w").toDF("text")
    val tLm = TrainingData.trainQualityLm(ref, "text", 5)
    // same LM both sides -> weight 0 for every doc: selection is decided
    // purely by the id-hash Gumbel, the worst case for determinism
    val docs = (0L until 50L).map(i => (i, "x y")).toDF("doc_id", "text")
    val sel = TrainingData.dsirResample(docs, "doc_id", "text", tLm, tLm,
        k = 10)
      .select("doc").as[Long].collect().toSet
    def gumbelMicro(id: Long): Long = {
      val skey = graft.functions.StableId63.hash(
        UTF8String.fromString(id.toString))
      val u = math.min((skey.toDouble + 0.5) / 9.223372036854775808e18,
        0.999999999999)
      BigDecimal(-math.log(-math.log(u)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .*(BigDecimal(1000000)).toLongExact
    }
    val want = (0L until 50L).map(i => (i, gumbelMicro(i)))
      .sortBy { case (i, g) => (-g, i) }.take(10).map(_._1).toSet
    assert(sel == want)
  }

  test("resample refuses k < 1") {
    val lm = TrainingData.trainQualityLm(Seq("a").toDF("text"), "text", 2)
    intercept[IllegalArgumentException] {
      TrainingData.dsirResample(Seq((1L, "a")).toDF("doc_id", "text"),
        "doc_id", "text", lm, lm, 0)
    }
  }
}
