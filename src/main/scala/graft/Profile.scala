package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for operator stages (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    val toks = docs.select(col("doc_id"), explode(graft.functions.TextExprs.tokens(col("text"))).as("t"))
    time("token explode")(toks.count())
    val sh = docs.select(col("doc_id"), explode(graft.functions.TextExprs.shingles(col("text"), 3)).as("t"))
    time("shingle explode")(sh.count())
    val shHash = docs.select(col("doc_id"),
      explode(transform(graft.functions.TextExprs.shingles(col("text"), 3),
        t => graft.functions.TextExprs.tokenHash32Expr(t))).as("hv"))
    time("shingle+hash explode")(shHash.count())
    time("postings distinct")(shHash.distinct().count())
    val post = shHash.distinct()
    time("self-join pairs")(
      post.select(col("doc_id").as("d1"), col("hv")).join(post.select(col("doc_id").as("d2"), col("hv")), Seq("hv"))
        .where(col("d1") < col("d2")).groupBy("d1", "d2").count().count())
    time("q20 full")(SparkEntry.queries("q20_jaccard_dups")(spark, sfDir).count())
    time("q21 full")(SparkEntry.queries("q21_minhash_lsh")(spark, sfDir).count())
    // ETL pipeline breakdown
    val synth = graft.etl.ReferenceShapedData.syntheticOrders(spark, sfDir)
    time("etl synth join")(synth.count())
    val stg = graft.etl.OrderEtl.toStaging(graft.etl.OrderEtl.cleanOrders(synth))
    time("etl staging")(stg.count())
    // the narrow shared projection loadWarehouse persists, in isolation
    val dimKeys = stg.select(col("orderNo"), col("commercePlatform"),
      col("product_key"), col("customer_id"), col("state_code"),
      col("postalCode"), col("goodsNumber"), col("submitTime"))
    time("dimKeys compute only")(dimKeys.count())
    dimKeys.columns.foreach { c =>
      time(s"dimKeys col $c (noop)") {
        dimKeys.select(col(c)).write.format("noop").mode("overwrite").save(); 0L
      }
    }
    time("dimKeys full eval (noop)") {
      dimKeys.write.format("noop").mode("overwrite").save(); 0L
    }
    time("dimKeys parquet write") {
      dimKeys.write.mode("overwrite").parquet("/tmp/graft_profile_dk"); 0L
    }
    time("dimKeys parquet read+agg")(
      spark.read.parquet("/tmp/graft_profile_dk")
        .select(col("commercePlatform")).distinct().count())
    val dkPersisted = dimKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("dimKeys persist+count")(dkPersisted.count())
    time("platform distinct (cached)")(
      dkPersisted.select(col("commercePlatform")).distinct().count())
    dkPersisted.unpersist(blocking = true)
    val wh = graft.etl.OrderEtl.loadWarehouse(graft.etl.OrderEtl.emptyWarehouse(spark), stg)
    time("etl dimPlatform")(wh.dimPlatform.count())
    time("etl dimProduct")(wh.dimProduct.count())
    time("etl dimCustomer")(wh.dimCustomer.count())
    time("etl dimDate")(wh.dimDate.count())
    time("etl fact")(wh.factSales.count())
    time("q34 full")(SparkEntry.queries("q34_reference_etl_fact")(spark, sfDir).count())
    // cleaning cost attribution on the synthetic frame
    import graft.functions.CleanExprs
    val synth2 = graft.etl.ReferenceShapedData.syntheticOrders(spark, sfDir)
    time("parse ts only")(synth2.select(CleanExprs.parseTs(col("submitTime")).as("t")).where(col("t").isNotNull).count())
    time("hash only")(synth2.select(CleanExprs.stableId(col("name"), col("oneAddress"), col("postalCode")).as("h")).where(col("h") > 0).count())
    time("state only")(synth2.select(CleanExprs.stateCode(col("State")).as("s")).where(col("s").isNotNull).count())
    spark.stop()
  }
}
