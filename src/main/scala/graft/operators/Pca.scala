package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis of an embedding corpus by the POWER
  * METHOD (fixed iterations), plus the "all-but-the-top" postprocess
  * (Mu & Viswanath, "All-but-the-Top: Simple and Effective
  * Postprocessing for Word Representations", ICLR 2018 — public
  * literature): embedding sets share a large common direction that
  * dominates cosine similarity; removing the mean and the top
  * principal direction measurably sharpens retrieval and dedup — the
  * reason a 100 TB embedding pipeline wants PC1 at all. Also the
  * drift-analysis primitive: PC1 of (snapshot B − snapshot A) names
  * the direction a corpus moved.
  *
  * Exact fixed-point protocol (the q145 FP20 discipline — floor(x·2²⁰)
  * per element — so a SQL oracle replays every iteration hash-exact):
  * vectors and the direction live as FP20 longs; the per-row scalar is
  * s = (Σ cxⱼ·wⱼ) DIV 2²⁰ and its vector contribution cxⱼ·s DIV 2²⁰
  * (all DIV truncate toward zero — both engines' semantics); the
  * per-iteration accumulation u is an EXACT long sum, so it is
  * order-independent and partitioning-invariant — no float ever
  * accumulates across rows. The only floats are the driver-side
  * normalization u/‖u‖ (IEEE divide + correctly-rounded sqrt of an
  * exact integer — bit-identical in any engine) floored back to FP20,
  * and the final projection scaling.
  *
  * Scale shape (100 TB): NO corpus materialization — each iteration is
  * one narrow scan of the source (fixed-point encode + two
  * higher-order folds per row) feeding a ≤ dim-key positional
  * aggregate (map-side partial) and a dim-row collect; the driver
  * loop is bounded (the KMeans/LinkGraph discipline). Mean and count
  * compute once the same way. Overflow envelope: |x| < 2¹² per
  * element and n < 2³¹ rows keep every product under 2⁵³ and every
  * sum under 2⁶³ — enforced loudly where cheap (n), documented where
  * not (|x|; embeddings are unit-ish by construction). */
object Pca {

  val Fp = 1048576L // 2^20

  /** Corpus mean (FP20) + unit principal direction (FP20). */
  case class Component(dim: Int, meanFp: Array[Long], dirFp: Array[Long]) {
    require(dim >= 1 && meanFp.length == dim && dirFp.length == dim,
      s"Pca.Component: dim $dim vs mean ${meanFp.length}/dir ${dirFp.length}")
  }

  /** DIV 2²⁰ truncating toward zero on either sign (`m − m % Fp` is
    * exactly divisible; the double division is exact below 2⁵³). */
  private def divFp(m: Column): Column = ((m - (m % Fp)) / Fp).cast("long")

  private def fxCol(vecCol: String): Column =
    transform(col(vecCol).cast("array<double>"),
      x => floor(x * Fp).cast("long"))

  /** Elementwise long-array sum as ONE map-side hash aggregate with
    * `dim` sum buffers — no positional explode: exploding shuffles
    * n×dim narrow rows where this ships one dim-wide partial per map
    * partition (measured 3.5× → 1.6× at 10× data on the q182 gate). */
  private def sumElements(vecs: DataFrame, arrCol: String,
                          dim: Int): Array[Long] = {
    val aggs = (0 until dim).map(j =>
      sum(element_at(col(arrCol), j + 1)).as(s"__u$j"))
    val row = vecs.agg(aggs.head, aggs.tail: _*).collect()(0)
    Array.tabulate(dim)(j => row.getLong(j))
  }

  /** (mean_fp per position, n, dim): one cheap shape scan (count +
    * uniform-length check), then one dim-wide sum aggregate. */
  private def meanAndCount(emb: DataFrame, vecCol: String)
  : (Array[Long], Long) = {
    val shape = emb.select(size(col(vecCol)).as("d"))
      .agg(count(lit(1)).as("n"), min(col("d")).as("lo"),
        max(col("d")).as("hi")).collect()(0)
    val n = shape.getLong(0)
    require(n > 0L, "Pca: empty corpus")
    require(n < Int.MaxValue.toLong,
      s"Pca: n = $n exceeds the documented exact-sum envelope (2^31)")
    require(shape.getInt(1) == shape.getInt(2),
      s"Pca: ragged vector lengths (${shape.getInt(1)}..${shape.getInt(2)}) " +
        "— uniform dimension required")
    val dim = shape.getInt(1)
    require(dim >= 1, "Pca: zero-length vectors")
    val sums = sumElements(emb.select(fxCol(vecCol).as("__fx")), "__fx", dim)
    // mean = sum DIV n, truncating toward zero (both engines)
    (sums.map(_ / n), n)
  }

  /** Centered FP20 rows as column `__cx`, deflated by `prevDirs` in
    * training order: for each previous direction d, the row loses its
    * d-component — cx ← cx − (d·((cx·d) DIV 2²⁰) DIV 2²⁰) — every step
    * in the exact protocol, every scalar STAGED as a named projection
    * (the q154 HOF lesson: a lambda-captured expression TREE
    * re-evaluates per element; a staged attribute reads a slot). */
  private def residualFrame(emb: DataFrame, vecCol: String,
      mean: Array[Long], prevDirs: Seq[Array[Long]]): DataFrame = {
    var df = emb.select(
      zip_with(fxCol(vecCol), typedLit(mean.toSeq), (a, b) => a - b)
        .as("__cx"))
    prevDirs.foreach { d =>
      val dLit = typedLit(d.toSeq)
      df = df
        .select(col("__cx"),
          divFp(aggregate(zip_with(col("__cx"), dLit, (a, b) => a * b),
            lit(0L), (acc, v) => acc + v)).as("__s"))
        .select(zip_with(col("__cx"), dLit,
          (c, dj) => c - divFp(dj * col("__s"))).as("__cx"))
    }
    df
  }

  /** The power loop over a (re-buildable) centered frame: per
    * iteration one staged scan + one dim-wide sum aggregate + a
    * dim-row collect. */
  private def powerIterate(base: () => DataFrame, dim: Int,
                           iters: Int): Array[Long] = {
    var w = Array.fill(dim)(math.floor(Fp / math.sqrt(dim)).toLong)
    for (_ <- 1 to iters) {
      val wLit = typedLit(w.toSeq)
      val staged = base()
        .select(col("__cx"),
          divFp(aggregate(zip_with(col("__cx"), wLit, (a, b) => a * b),
            lit(0L), (acc, v) => acc + v)).as("__s"))
        .select(transform(col("__cx"),
          c => divFp(c * col("__s"))).as("__c"))
      val u = sumElements(staged, "__c", dim)
      val norm = math.sqrt(
        u.map(v => BigInt(v) * BigInt(v)).sum.toDouble)
      require(norm > 0.0,
        "Pca: degenerate iteration (u = 0) — constant or " +
          "rank-deficient corpus?")
      w = u.map(v => math.floor(v.toDouble / norm * Fp).toLong)
    }
    w
  }

  /** Top principal direction by `iters` power iterations from the
    * uniform start floor(2²⁰/√dim). Deterministic, partitioning-
    * invariant. */
  def topComponent(emb: DataFrame, idCol: String, vecCol: String,
                   iters: Int): Component =
    topComponents(emb, idCol, vecCol, r = 1, iters = iters).head

  /** Top `r` principal directions by power iteration with DATA
    * deflation (Hotelling-style, applied to the rows rather than the
    * covariance — after each component trains, every row loses its
    * component along it, and the next component trains on the
    * residuals; with the FP20 protocol the whole sequence stays
    * integer-exact and partitioning-invariant). Directions come back
    * in training order sharing one mean. Component i's coordinate is
    * DEFINED against the residual it trained on (see [[projectMany]])
    * — under fixed-point arithmetic directions are orthogonal only to
    * ~2⁻²⁰, so the residual projection is the protocol, not a detail.
    *
    * Cost: (r·iters + 1) corpus scans, each narrow; the deflation
    * chain adds one staged dot + one staged subtract per PREVIOUS
    * component inside the same scan — no extra action, no shuffle. */
  def topComponents(emb: DataFrame, idCol: String, vecCol: String,
                    r: Int, iters: Int): Seq[Component] = {
    require(r >= 1 && r <= 8,
      s"Pca: r must be in [1, 8]: $r — each component costs `iters` " +
        "corpus scans; raise the bound deliberately if needed")
    require(iters >= 1 && iters <= 20,
      s"Pca: iters must be in [1, 20]: $iters — each iteration is a " +
        "corpus scan; raise deliberately if needed")
    val (mean, _) = meanAndCount(emb, vecCol)
    val dim = mean.length
    require(r <= dim,
      s"Pca: r = $r exceeds the vector dimension $dim")
    val dirs = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    for (_ <- 0 until r) {
      dirs += powerIterate(
        () => residualFrame(emb, vecCol, mean, dirs.toSeq), dim, iters)
    }
    dirs.map(w => Component(dim, mean, w)).toSeq
  }

  /** PC1 projection score per row: (id, pc1) with
    * pc1 = ((cx·dir) DIV 2²⁰) / 2²⁰ — the centered coordinate along
    * the principal direction. One narrow scan. */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              comp: Component): DataFrame = {
    val cx = zip_with(fxCol(vecCol), typedLit(comp.meanFp.toSeq),
      (a, b) => a - b)
    val s = divFp(aggregate(zip_with(cx, typedLit(comp.dirFp.toSeq),
      (a, b) => a * b), lit(0L), (acc, v) => acc + v))
    emb.select(col(idCol).as("id"),
      (s.cast("double") / lit(Fp.toDouble)).as("pc1"))
  }

  /** Coordinates along EVERY component of a [[topComponents]] train,
    * in one narrow scan: (id, pc1 … pcr). Component i's coordinate is
    * the dot of the (i−1)-times-deflated residual with direction i —
    * the exact quantity component i trained on (directions are only
    * ~2⁻²⁰-orthogonal under fixed point, so projecting the RAW
    * centered vector would be a silently different protocol). */
  def projectMany(emb: DataFrame, idCol: String, vecCol: String,
                  comps: Seq[Component]): DataFrame = {
    require(comps.nonEmpty, "Pca.projectMany: no components")
    require(comps.forall(c => c.dim == comps.head.dim &&
        java.util.Arrays.equals(c.meanFp, comps.head.meanFp)),
      "Pca.projectMany: components must share one mean/dim — train " +
        "them together via topComponents")
    var df = emb.select(col(idCol).as("id"),
      zip_with(fxCol(vecCol), typedLit(comps.head.meanFp.toSeq),
        (a, b) => a - b).as("__cx"))
    comps.zipWithIndex.foreach { case (c, i) =>
      val dLit = typedLit(c.dirFp.toSeq)
      df = df.withColumn(s"__p${i + 1}",
        divFp(aggregate(zip_with(col("__cx"), dLit, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v)))
      if (i < comps.size - 1)
        df = df.withColumn("__cx", zip_with(col("__cx"), dLit,
          (cc, dj) => cc - divFp(dj * col(s"__p${i + 1}"))))
    }
    df.select(col("id") +: comps.indices.map(i =>
      (col(s"__p${i + 1}").cast("double") / lit(Fp.toDouble))
        .as(s"pc${i + 1}")): _*)
  }

  /** Variance explained per component: (component, ss, ratio) where
    * ss = Σ rows s_i² (s_i the residual-projection coordinate the
    * component trained on, FP20² units) and ratio = ss / ss_total
    * with ss_total = Σ rows Σ_j cx_j² — the "is PC1 actually the
    * common direction worth removing" audit before [[removeTop]]
    * rewrites a corpus. ONE narrow scan: the per-row squared norm and
    * every coordinate compute in the same staged chain; per-row
    * squares are exact longs (envelope: |x| ≤ 90 keeps cx² < 2⁵³),
    * cross-row sums are exact DECIMAL(38,0); ss is emitted as the
    * IEEE double of that exact integer (identical rounding in any
    * engine), ratio one further IEEE division. */
  def varianceExplained(emb: DataFrame, idCol: String, vecCol: String,
                        comps: Seq[Component]): DataFrame = {
    require(comps.nonEmpty, "Pca.varianceExplained: no components")
    require(comps.forall(c => c.dim == comps.head.dim &&
        java.util.Arrays.equals(c.meanFp, comps.head.meanFp)),
      "Pca.varianceExplained: components must share one mean/dim — " +
        "train them together via topComponents")
    var df = emb.select(
      zip_with(fxCol(vecCol), typedLit(comps.head.meanFp.toSeq),
        (a, b) => a - b).as("__cx"))
      .withColumn("__rss", aggregate(col("__cx"), lit(0L),
        (acc, v) => acc + v * v))
    comps.zipWithIndex.foreach { case (c, i) =>
      val dLit = typedLit(c.dirFp.toSeq)
      df = df.withColumn(s"__p$i",
        divFp(aggregate(zip_with(col("__cx"), dLit, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v)))
      if (i < comps.size - 1)
        df = df.withColumn("__cx", zip_with(col("__cx"), dLit,
          (cc, dj) => cc - divFp(dj * col(s"__p$i"))))
    }
    val aggs = sum(col("__rss").cast("decimal(38,0)")).as("__sstot") +:
      comps.indices.map(i =>
        sum((col(s"__p$i") * col(s"__p$i")).cast("decimal(38,0)"))
          .as(s"__ss$i"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val sstot = row.getDecimal(0).doubleValue
    require(sstot > 0.0,
      "Pca.varianceExplained: zero total variance — constant corpus?")
    val spark = emb.sparkSession
    import spark.implicits._
    comps.indices.map { i =>
      val ss = row.getDecimal(i + 1).doubleValue
      (i + 1, ss, ss / sstot)
    }.toDF("component", "ss", "ratio")
  }

  /** All-but-the-top residual: center, then remove the PC1 component —
    * (id, vec as double array). residual = (cx − (s·dir DIV 2²⁰)) /
    * 2²⁰, every step in the exact protocol. One narrow scan. */
  def removeTop(emb: DataFrame, idCol: String, vecCol: String,
                comp: Component): DataFrame = {
    val dirLit = typedLit(comp.dirFp.toSeq)
    // staged like the training iteration: the scalar must NOT sit
    // inside the final zip_with lambda (per-element re-evaluation)
    emb
      .select(col(idCol).as("id"),
        zip_with(fxCol(vecCol), typedLit(comp.meanFp.toSeq),
          (a, b) => a - b).as("__cx"))
      .select(col("id"), col("__cx"),
        divFp(aggregate(zip_with(col("__cx"), dirLit, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v)).as("__s"))
      .select(col("id"),
        zip_with(col("__cx"), dirLit, (c, dj) =>
          (c - divFp(dj * col("__s"))).cast("double") / lit(Fp.toDouble))
          .as("vec"))
  }
}
