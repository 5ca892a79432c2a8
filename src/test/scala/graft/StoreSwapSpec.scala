package graft.operators

import org.apache.hadoop.fs.Path

/** Manifest protocol invariants shared by all three persisted artifact
  * families: CAS commits (writer-side isolation — of two racing
  * writers exactly one wins, the loser fails loudly with nothing
  * visible) and version-pinned resolution (snapshot reads bounded by
  * vacuum's keepVersions retention window). Lives in the operators
  * package to exercise [[StoreSwap]] directly; the family-level specs
  * (DedupSpec / IvfIndexSpec / TextSearchSpec) gate the same protocol
  * through the public verbs. */
class StoreSwapSpec extends graft.SparkSpec {

  private def freshRoot(): String = {
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_storeswap_${System.nanoTime()}")
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("commitManifest is CAS: a second claim of the same version fails " +
    "loudly, keeps the winner's content, and leaves no tmp litter") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(root))
    StoreSwap.commitManifest(fs, root, 1, Seq("d/f1.parquet"))
    StoreSwap.commitManifest(fs, root, 2, Seq("d/f1.parquet", "d/f2.parquet"))
    val e = intercept[java.util.ConcurrentModificationException] {
      StoreSwap.commitManifest(fs, root, 2, Seq("d/f1.parquet", "d/f3.parquet"))
    }
    assert(e.getMessage.contains("concurrent writer") &&
      e.getMessage.contains("re-run"),
      s"loser's error must name the conflict and the remedy: ${e.getMessage}")
    assert(StoreSwap.latestManifest(fs, root).contains(
      2 -> Seq("d/f1.parquet", "d/f2.parquet")),
      "the losing claim must not disturb the winner's manifest")
    assert(!fs.listStatus(new Path(root)).exists(
      _.getPath.getName.startsWith("._manifest_tmp_")),
      "the losing claim left its tmp manifest behind")
  }

  test("commitManifest under a real thread race: of N simultaneous " +
    "claimants for one version exactly one wins and its content is " +
    "what readers resolve") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(root))
    StoreSwap.commitManifest(fs, root, 1, Seq("d/base.parquet"))
    val n = 8
    val barrier = new java.util.concurrent.CyclicBarrier(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val losses = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until n).map { i =>
      new Thread(() => {
        barrier.await()
        try {
          StoreSwap.commitManifest(fs, root, 2, Seq(s"d/w$i.parquet"))
          wins.incrementAndGet()
        } catch {
          case _: java.util.ConcurrentModificationException =>
            losses.incrementAndGet()
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(wins.get == 1 && losses.get == n - 1,
      s"expected exactly one winner of $n, got ${wins.get} " +
        s"(losses ${losses.get})")
    val (v, files) = StoreSwap.latestManifest(fs, root).get
    assert(v == 2 && files.length == 1 &&
      files.head.matches("d/w\\d\\.parquet"),
      s"committed content must be exactly one claimant's, intact: $files")
  }

  test("manifestAt resolves any retained version and refuses an unknown " +
    "or vacuumed one naming the retained window") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(root))
    StoreSwap.commitManifest(fs, root, 1, Seq("d/f1.parquet"))
    StoreSwap.commitManifest(fs, root, 2, Seq("d/f2.parquet"))
    assert(StoreSwap.manifestAt(fs, root, 1)._2 == Seq("d/f1.parquet"))
    assert(StoreSwap.manifestAt(fs, root, 2)._2 == Seq("d/f2.parquet"))
    val e = intercept[IllegalArgumentException](
      StoreSwap.manifestAt(fs, root, 99))
    assert(e.getMessage.contains("v99") && e.getMessage.contains("1,2") &&
      e.getMessage.contains("keepVersions"),
      s"refusal must name the missing version and the retained window: " +
        e.getMessage)
  }
}
