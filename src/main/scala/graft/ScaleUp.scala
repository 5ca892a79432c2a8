package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not library surface): synthesize an ~Nx corpus (default
  * sf1.0 = 10x sf0.1) for the SCALE.md scale one-off — facts replicate
  * with shifted keys, dims copy as-is (the realistic cluster shape:
  * facts grow 10x, dims don't).
  *
  * Key shifts keep join integrity: replica r adds r·2^32 to the fact
  * keys (o_orderkey/l_orderkey move together; customer/part keys are
  * untouched so every replicated fact still resolves its dims).
  * Document text is perturbed per replica — every 5th token gets a
  * replica tag, so every 5-gram shingle of a non-zero replica differs
  * and CROSS-replica near-dup similarity collapses while WITHIN-replica
  * similarity structure is preserved exactly (the same deterministic
  * transform applies to both sides of every original near-dup pair).
  * Without this, 10 replicas of each doc form 10-cliques in the
  * similarity graph and pair counts grow ~100x for 10x data — a
  * data-construction artifact, not a scaling measurement.
  *
  * Writes only under target/ (or the given destination). */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1.0")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val keyOff = 1L << 32
    val repl = broadcast(spark.range(reps).select(col("id").as("__rep")))
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(s"[scaleup] $name: $n rows")
    }
    // replica-shift integrity: replica r adds r·keyOff, so every shifted
    // key must be < keyOff in the SOURCE — pointed at a larger corpus
    // (e.g. an already-scaled output), replicated keys would silently
    // collide across replicas and corrupt join integrity. One cheap agg
    // per shifted table; fail loudly instead.
    // min matters as much as max: a negative key + r·keyOff lands inside a
    // NEIGHBORING replica's key range — the exact collision this guard
    // exists to prevent — so both bounds ride the same single-pass agg.
    def assertBelowKeyOff(df: DataFrame, key: String, table: String): DataFrame = {
      val b = df.agg(min(col(key).cast("long")), max(col(key).cast("long")))
        .collect()(0)
      if (!b.isNullAt(0))
        require(b.getLong(0) >= 0 && b.getLong(1) < keyOff,
          s"$table.$key range [${b.getLong(0)}, ${b.getLong(1)}] not in " +
            "[0, 2^32) — replica key shifts would collide; use a larger " +
            "keyOff or a raw source")
      df
    }
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      write(spark.read.parquet(s"$src/$t.parquet"), t)
    }
    def shifted(c: String) = col(c) + col("__rep") * keyOff
    write(assertBelowKeyOff(spark.read.parquet(s"$src/orders.parquet"),
        "o_orderkey", "orders").crossJoin(repl)
      .withColumn("o_orderkey", shifted("o_orderkey")).drop("__rep"), "orders")
    write(assertBelowKeyOff(spark.read.parquet(s"$src/lineitem.parquet"),
        "l_orderkey", "lineitem").crossJoin(repl)
      .withColumn("l_orderkey", shifted("l_orderkey")).drop("__rep"), "lineitem")
    write(assertBelowKeyOff(Tables.events(spark, src), "event_id", "events")
      .crossJoin(repl)
      .withColumn("event_id", shifted("event_id")).drop("__rep"), "events")
    write(assertBelowKeyOff(spark.read.parquet(s"$src/documents.parquet"),
        "doc_id", "documents").crossJoin(repl)
      .withColumn("doc_id", shifted("doc_id"))
      .withColumn("text", when(col("__rep") === 0, col("text")).otherwise(
        expr("array_join(transform(split(text, ' '), (t, i) -> " +
          "if(i % 5 = 0, concat(t, '_', __rep), t)), ' ')")))
      .drop("__rep"), "documents")
    // embeddings: replicas get a deterministic dim-0 offset so replica
    // vectors are NOT exact duplicates (identical vectors would make
    // every near-dup/ANN pass collapse replicas into 10-cliques — a
    // construction artifact, not a scaling measurement)
    write(assertBelowKeyOff(spark.read.parquet(s"$src/embeddings.parquet"),
        "vec_id", "embeddings").crossJoin(repl)
      .withColumn("vec_id", shifted("vec_id"))
      .withColumn("embedding",
        expr("transform(embedding, (x, i) -> " +
          "if(i = 0, cast(x + __rep * 0.37 as float), x))"))
      .drop("__rep"), "embeddings")
    spark.stop()
  }
}
