package graft

import graft.sources.{JsonlExport, JsonlIngest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** JSONL export: deterministic shard layout, lossless gzip round trip,
  * pos-ordered part files. */
class JsonlExportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("export round trip: lossless text, deterministic shards, bounded sizes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_export")
    try {
      val n = docs.count()
      JsonlExport.write(docs, "doc_id", dir.toString, numShards = 8)
      // layout: shard=N directories with gzip parts
      val shardDirs = Option(dir.toFile.listFiles()).get
        .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
      assert(shardDirs.nonEmpty && shardDirs.subsetOf(
        (0 until 8).map(s => s"shard=$s").toSet), shardDirs.toString)
      assert(Option(dir.toFile.listFiles()).get
        .filter(_.getName.startsWith("shard="))
        .flatMap(d => Option(d.listFiles()).get)
        .filter(f => f.getName.startsWith("part-")) // skip .crc siblings
        .forall(_.getName.endsWith(".json.gz")))

      val back = JsonlExport.read(spark, dir.toString, schema)
      assert(back.count() == n)
      // every row parses (n_bad = 0) and md5(text) survives the JSON
      // escape + gzip round trip for every doc
      // collect (not count) so the data column survives pruning — Spark
      // rejects raw-file queries referencing ONLY the corrupt column
      assert(back.where(col("_corrupt_record").isNotNull)
        .select("doc_id", "_corrupt_record").collect().isEmpty)
      val origMd5 = docs.select(col("doc_id"), md5(col("text")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val backMd5 = back.select(col("doc_id"), md5(col("text")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(backMd5 == origMd5)

      // shard assignment matches the deterministicShuffle contract and
      // re-exporting reproduces it bit-for-bit
      val expected = graft.operators.TrainingData
        .deterministicShuffle(docs, "doc_id", 8)
        .select(col("doc_id"), col("shard"), col("pos"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      val got = back.select(col("doc_id"), col("shard").cast("int"), col("pos"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      assert(got == expected)

      // shard sizes stay balanced (md5-keyed): no shard over 2x the mean
      val sizes = back.groupBy("shard").count().collect().map(_.getLong(1))
      assert(sizes.max <= 2 * (n / 8).max(1), sizes.mkString(","))

      // pos is contiguous 1..count within each shard, and part files are
      // PHYSICALLY in pos order (loaders stream them without sorting)
      val posOk = back.groupBy("shard")
        .agg(count(lit(1)).as("c"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("d"))
        .collect()
      posOk.foreach { r =>
        val c = r.getLong(1)
        assert(r.getInt(2) == 1 && r.getInt(3).toLong == c &&
          r.getLong(4) == c, r.toString)
      }
      val aShard = Option(dir.toFile.listFiles()).get
        .filter(_.getName.startsWith("shard=")).head
      val firstPart = Option(aShard.listFiles()).get
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".json.gz")).sortBy(_.getName).head
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream(firstPart))
      val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .take(20).toSeq
      in.close()
      val posSeq = lines.map(l =>
        """"pos":(\d+)""".r.findFirstMatchIn(l).get.group(1).toInt)
      assert(posSeq == posSeq.sorted, posSeq.mkString(","))

      // schema must not pre-declare the layout columns
      intercept[IllegalArgumentException] {
        JsonlExport.read(spark, dir.toString,
          schema.add("shard", LongType))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
