package graft
import org.apache.spark.sql.functions._

/** Adversarial-duplicate-mass measurement (dev tool, round-11 verdict
  * next #7): q132 (image dedup clusters) and q143 (near-dup keep-best)
  * compose pair generation with connected components, and their
  * SCALE.md ratios ride fixtures whose cluster structure is fixed.
  * This main re-times both pipelines with the duplicate mass pushed
  * ×4 — image clusters via seed modulus 251→63 (4× members per
  * cluster ⇒ 4× near-dup edges), text clusters by overwriting 3/4 of
  * the corpus with group-identical texts (clusters of 6 exact
  * near-dups) — at whatever SPARK_GRAFT_SF_DIR points to. Median of 3
  * passes per pipeline, same discipline as Bench. */
object AdversarialMass {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(name: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = runs.map(_._1).sorted.apply(1)
      println(f"[adv] $name%-34s median=$med%7.2f s  rows=${runs.head._2}")
    }

    // ---- q132 shape: image dHash -> banded near-dups -> components.
    // seedMod 251 = the gate fixture; 63 = 4x duplicate mass.
    def imageClusters(seedMod: Int): Long = {
      import graft.multimodal.Multimodal.{MediaMeta, MediaRow}
      val media = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("n_chars").cast("long"))
        .as[(Long, Long)]
        .map { case (id, _) =>
          val seed = (id % seedMod).toInt
          val w = 9 * (1 + seed % 4)
          val h = 8 * (1 + seed % 3)
          val samples = Array.tabulate(w * h)(i =>
            (seed + 31 * (i % w) + 13 * (i / w)) % 256)
          MediaRow(id, "image/png",
            graft.multimodal.PngCodec.encode(w, h, 1, samples),
            MediaMeta("synth", Some(w), Some(h), None))
        }
      val hashes = graft.multimodal.Multimodal.imageDHash(media)
      graft.multimodal.Multimodal.imageDupClusters(hashes, maxHamming = 3)
        .count()
    }

    // ---- q143 shape: minhash pairs -> components -> keep-best.
    // mode 0 = the gate fixture (natural corpus).
    // mode 1 = 4x EXACT-dup mass in disjoint groups: 6 of every 8 docs
    //   carry group-identical text whose every token embeds the group
    //   id — shingle sets are disjoint across groups, so clusters are
    //   exactly the 6-doc groups (the pure collapse path).
    // mode 2 = shared-boilerplate CLIQUE: the dup texts share all
    //   filler tokens and differ only in the group token, so distinct
    //   groups are mutual near-dups (Jaccard >= 0.4) — one corpus-wide
    //   near-dup clique, the inherent quadratic worst case of
    //   Jaccard-verified pair generation.
    def keepBest(mode: Int): Long = {
      val base = Tables.documents(spark, sfDir)
      val grp = (col("doc_id") / 8).cast("long").cast("string")
      val docs = mode match {
        case 0 => base
        case 1 =>
          val toks = ('a' to 'l').map(c => concat(lit(c.toString), grp))
          base.withColumn("text",
            when(col("doc_id") % 8 < 6, concat_ws(" ", toks: _*))
              .otherwise(col("text")))
        case 2 =>
          val dupText = concat(lit("shared duplicate body text for group "),
            grp, lit(" with enough filler tokens that shingles and "),
            lit("minhash signatures are well defined across the band "),
            lit("structure of the corpus fixture "), grp)
          base.withColumn("text",
            when(col("doc_id") % 8 < 6, dupText).otherwise(col("text")))
      }
      graft.operators.Dedup.nearDupKeepBest(docs, "doc_id", "text",
        "n_chars", threshold = 0.4).count()
    }

    time("q132 images, gate mass (mod 251)")(imageClusters(251))
    time("q132 images, 4x mass (mod 63)")(imageClusters(63))
    time("q143 keep-best, gate corpus")(keepBest(0))
    time("q143 keep-best, 4x exact-dup mass")(keepBest(1))
    time("q143 keep-best, boilerplate clique")(keepBest(2))
    spark.stop()
  }
}
