package graft

import graft.sources.OrcStore
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** ORC warehouse face: lossless round trip, partition pruning on the
  * directory column, predicate pushdown into the stripe reader — the
  * same plan shape the parquet paths get. */
class OrcStoreSpec extends SparkSpec {
  import spark.implicits._

  private def withDir(test: java.io.File => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toFile
    try test(dir) finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  private def sample = Seq(
    (1L, "alpha", "en", 11L), (2L, "beta", "de", 22L),
    (3L, "gamma", "en", 33L), (4L, "delta", "fr", 44L))
    .toDF("id", "text", "lang", "n")

  test("round trip is lossless, partitioned by lang") {
    withDir { dir =>
      OrcStore.save(sample, dir.getAbsolutePath, Seq("lang"))
      val back = OrcStore.load(spark, dir.getAbsolutePath)
        .select("id", "text", "lang", "n")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3))).toSet
      assert(back == sample.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3))).toSet)
    }
  }

  test("append mode accumulates; overwrite truncates (S4/S5 semantics)") {
    withDir { dir =>
      OrcStore.save(sample, dir.getAbsolutePath)
      OrcStore.save(sample, dir.getAbsolutePath, mode = SaveMode.Append)
      assert(OrcStore.load(spark, dir.getAbsolutePath).count() == 8L)
      OrcStore.save(sample, dir.getAbsolutePath)
      assert(OrcStore.load(spark, dir.getAbsolutePath).count() == 4L)
    }
  }

  test("lang filter prunes partitions; numeric filter pushes to the reader") {
    withDir { dir =>
      OrcStore.save(sample, dir.getAbsolutePath, Seq("lang"))
      val q = OrcStore.load(spark, dir.getAbsolutePath)
        .where(col("lang") === "en" && col("n") > 20L)
        .select("id")
      val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
      // directory column constrained before the scan plans its file list
      assert(scan.contains("PartitionFilters") && scan.contains("lang"),
        scan.take(600))
      // stripe-stats predicate reaches the ORC reader
      assert(scan.contains("PushedFilters") && scan.contains("n"),
        scan.take(600))
      assert(q.collect().map(_.getLong(0)).toSet == Set(3L))
    }
  }
}
