package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact-moment statistics over feature columns — the pre-training
  * feature-analysis pass (which quality signals are redundant, which
  * carry independent information) run with the repo's engine-portable
  * exactness discipline instead of streaming float co-moments.
  *
  * Pearson correlation from RAW MOMENTS: corr = (n·Sxy − Sx·Sy) /
  * √((n·Sxx − Sx²)(n·Syy − Sy²)). Each feature is quantized ONCE to an
  * integer (⌊x·10^scale⌋ — floor of a correctly-rounded double product,
  * bit-identical on any engine), then every moment is an EXACT decimal
  * sum of integer products — order-independent, partitioning-invariant,
  * no float accumulates. Floats appear only in the final closed-form
  * formula (one expression, correctly-rounded IEEE ops on the exact
  * aggregates), rounded at 6.
  *
  * Overflow envelope: quantized |x| ≤ 10^12 gives products ≤ 10^24 and
  * DECIMAL(38,0) sums safe to ~10^13 rows — loud nulls past that, not
  * silent wraps (documented; DuckDB's HUGEINT mirrors wider).
  *
  * Scale shape: ONE map-side-combined aggregate over the corpus
  * producing a single row of moments (p(p+1)/2 + p + 1 numbers for p
  * features); the pairwise table is projected from that one row —
  * nothing else touches the data. */
object Stats {

  private val D38 = DecimalType(38, 0)

  /** Pairwise Pearson correlations for every column pair (i < j).
    *
    * Null contract (LISTWISE deletion, the [[graft.operators
    * .TrainingData.winsorizeByGroup]] exclusion discipline): a row
    * with ANY null feature is excluded from EVERY moment — n, sums,
    * and products all see the same complete-row set, so every pair's
    * corr is computed over one consistent population. The alternative
    * (pairwise deletion) silently mixes per-pair populations; counting
    * all rows while null-skipping sums corrupts every moment — both
    * rejected, documented here, not silent.
    *
    * @param scale decimal digits preserved by quantization (0 for
    *              already-integer features)
    * @return (feat_a, feat_b, n, corr) — n = complete rows; corr
    *         rounded at 6, null when a variance is zero. */
  def featureCorrelations(df: DataFrame, cols: Seq[String],
                          scale: Int = 0): DataFrame = {
    require(cols.size >= 2 && cols.size <= 32,
      s"featureCorrelations: need 2..32 columns, got ${cols.size}")
    require(scale >= 0 && scale <= 9,
      s"featureCorrelations: scale must be in [0, 9]: $scale")
    require(cols.distinct.size == cols.size,
      "featureCorrelations: duplicate columns")
    val factor = math.pow(10.0, scale)
    val q = cols.map(c =>
      floor(col(c).cast(DoubleType) * factor).cast("long").as(s"__q_$c"))
    val quantized = df
      .where(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(q: _*)
    def dq(c: String): Column = col(s"__q_$c").cast(D38)
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
      cols.map(c => sum(dq(c)).as(s"__s_$c")) ++
      (for (i <- cols.indices; j <- i until cols.size) yield
        sum(dq(cols(i)) * dq(cols(j))).as(s"__p_${cols(i)}_${cols(j)}"))
    val m = quantized.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    pairsOf(cols, m)
  }

  private def pairsOf(cols: Seq[String], m: DataFrame): DataFrame = {
    val pairs = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      val n = col("__n").cast(DoubleType)
      val sx = col(s"__s_$a").cast(DoubleType)
      val sy = col(s"__s_$b").cast(DoubleType)
      val sxx = col(s"__p_${a}_$a").cast(DoubleType)
      val syy = col(s"__p_${b}_$b").cast(DoubleType)
      val sxy = col(s"__p_${a}_$b").cast(DoubleType)
      val num = n * sxy - sx * sy
      val den = sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      m.select(lit(a).as("feat_a"), lit(b).as("feat_b"),
        col("__n").as("n"),
        when(den === 0.0, lit(null).cast(DoubleType))
          .otherwise(round(num / den, 6)).as("corr"))
    }
    pairs.reduce(_ unionAll _)
  }

  /** Order-independent content fingerprint: XOR of 63-bit md5 row
    * hashes + exact row count — the migration-validation primitive
    * ("is the copied table byte-equivalent?") that needs no sort, no
    * collect, and compares across ENGINES because the hash is the
    * repo's engine-portable [[graft.functions.StableId63]]. XOR is
    * commutative/associative, so the aggregate is map-side combined
    * and partitioning-invariant by construction. Caveat (documented,
    * inherent): XOR is duplicate-PAIR-blind — a row appearing twice
    * cancels itself — which the row count catches unless the dup
    * displaces another row; for a stronger check fingerprint disjoint
    * partitions of the table separately.
    *
    * The caller supplies the canonical row rendering (column order,
    * numeric formatting) — determinism of the render is the caller's
    * contract, exactly as with the P9 surrogate key.
    *
    * @return one row: (n_rows, fingerprint). */
  def contentFingerprint(df: DataFrame, canonical: Column): DataFrame =
    df.select(graft.functions.StableId63.stableId63(canonical).as("__h"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("fingerprint"))

  val BenfordExpected: Seq[Double] = Seq(
    0.301030, 0.176091, 0.124939, 0.096910, 0.079181,
    0.066947, 0.057992, 0.051153, 0.045757)

  /** Benford first-digit audit (Benford, "The Law of Anomalous
    * Numbers", Proc. Am. Phil. Soc. 1938 — public literature):
    * organically-generated monetary/size values put digit d first with
    * probability log₁₀(1+1/d); fabricated, capped, or unit-mangled
    * data doesn't. A per-digit share table against the Benford
    * expectation is the cheap data-quality screen before a 100 TB
    * ingest is trusted.
    *
    * Determinism: the first digit is extracted in the INTEGER domain —
    * first character of ⌊value⌋'s decimal render (values must be
    * ≥ 1; rows below are excluded and counted in no bucket) — no
    * log10 of data anywhere. The nine expected shares are pinned
    * literals (6 dp), not libm calls, so engines can't disagree on
    * them; each chi² term is one IEEE expression over exact counts
    * and those literals. No qualifying rows at all (empty input, or
    * every value below 1) → an empty frame with the full schema, not
    * an NPE on the null SUM (the [[graft.operators.CrawlPolicy
    * .apportionBudget]] isNullAt discipline).
    *
    * Scale shape: one narrow scan → a ≤9-key map-side HashAggregate.
    *
    * @return (digit, n, share, expected, chi_term) for digits 1–9. */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val digit = substring(
      floor(col(valCol).cast(DoubleType)).cast("long").cast("string"), 1, 1)
      .cast("int")
    val counts = df
      .where(col(valCol).isNotNull && col(valCol).cast(DoubleType) >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totalRow = counts.agg(sum(col("n"))).collect()(0)
    // SUM over zero rows is null, not 0 — with total 0 `counts` is
    // empty, so the join below yields the empty frame and no division
    // ever evaluates
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val expected = BenfordExpected.zipWithIndex
      .map { case (e, i) => (i + 1, e) }.toDF("digit", "expected")
    counts.join(broadcast(expected), Seq("digit"))
      .withColumn("share", round(col("n").cast(DoubleType) / total.toDouble, 6))
      .withColumn("chi_term", round(
        (col("n").cast(DoubleType) - col("expected") * total.toDouble) *
          (col("n").cast(DoubleType) - col("expected") * total.toDouble) /
          (col("expected") * total.toDouble), 6))
      .select(col("digit"), col("n"), col("share"), col("expected"),
        col("chi_term"))
  }
}
