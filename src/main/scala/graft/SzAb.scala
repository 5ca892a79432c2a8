package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev one-off ([[ShjAb]]'s pattern): A/B the size-aggregate attach in
  * the jaccard kernel at synthetic scale — (a) r17 shape, per-side
  * renames inside the aggregate subtree (two independent aggregates);
  * (b) r18 shape, self-join aliases of ONE aggregate frame (exchange
  * reuse eligible); (c) sz localCheckpointed (aggregate provably runs
  * once, at the cost of one eager driver job). Decides whether the
  * double size-aggregate is worth a materialization. */
object SzAb {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(200000L)
    val perDoc = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // synthetic postings: ~nDocs*perDoc rows, light shingle sharing
    val tok = spark.range(nDocs)
      .select(col("id").as("doc"),
        explode(sequence(lit(0), lit(perDoc - 1))).as("j"))
      .select(col("doc"),
        (xxhash64(col("doc") * lit(perDoc) + col("j")) % 5000000L).as("hv"))
      .distinct()
      .localCheckpoint()
    println(s"[szab] postings=${tok.count()}")
    val a = tok.select(col("doc").as("d1"), col("hv"))
    val b = tok.select(col("doc").as("d2"), col("hv"))
    val inter = a.join(b, Seq("hv")).where(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      .localCheckpoint() // isolate: time ONLY the size-attach tail
    println(s"[szab] pairs=${inter.count()}")
    def tail(variant: String): Long = {
      val sz = tok.groupBy(col("doc")).agg(count(lit(1)).as("n"))
      val out = variant match {
        case "renames" =>
          inter
            .join(sz.select(col("doc").as("d1"), col("n").as("n1")), Seq("d1"))
            .join(sz.select(col("doc").as("d2"), col("n").as("n2")), Seq("d2"))
            .select(col("d1"), col("d2"),
              (col("inter").cast("double") /
                (col("n1") + col("n2") - col("inter"))).as("j"))
        case "alias" =>
          inter
            .join(sz.alias("s1"), col("d1") === col("s1.doc"))
            .join(sz.alias("s2"), col("d2") === col("s2.doc"))
            .select(col("d1"), col("d2"),
              (col("inter").cast("double") /
                (col("s1.n") + col("s2.n") - col("inter"))).as("j"))
        case "ckpt" =>
          val szc = sz.localCheckpoint()
          inter
            .join(szc.alias("s1"), col("d1") === col("s1.doc"))
            .join(szc.alias("s2"), col("d2") === col("s2.doc"))
            .select(col("d1"), col("d2"),
              (col("inter").cast("double") /
                (col("s1.n") + col("s2.n") - col("inter"))).as("j"))
      }
      out.write.format("noop").mode("overwrite").save()
      0L
    }
    val variants = Seq("renames", "alias", "ckpt")
    variants.foreach(tail) // warm
    // interleaved rounds so ambient host drift hits all variants alike
    val times = scala.collection.mutable.Map(
      variants.map(_ -> Vector.empty[Double]): _*)
    (1 to 5).foreach { _ =>
      variants.foreach { v =>
        System.gc()
        val t0 = System.nanoTime(); tail(v)
        times(v) :+= (System.nanoTime() - t0) / 1e9
      }
    }
    variants.map(v => v -> times(v)).foreach { case (v, xs) =>
      val s = xs.sorted
      val med = if (s.length % 2 == 1) s(s.length / 2)
                else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
      println(f"[szab] $v%-8s median=$med%.3f s " +
        s"passes=${xs.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
