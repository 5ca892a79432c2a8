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

  test("listDirFiles and moveStagedIn are recursive: a two-level " +
    "partitioned layout lists and moves completely (a depth-limited " +
    "lister would unlist live files and the next vacuum would delete " +
    "them)") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    def touch(rel: String): Unit = {
      val p = new Path(s"$root/$rel")
      fs.mkdirs(p.getParent)
      fs.create(p, true).close()
    }
    touch("fact/flat.parquet")
    touch("fact/p_year=2024/one.parquet")
    touch("fact/p_year=2024/p_month=1/deep.parquet")
    touch("fact/p_year=2024/p_month=2/deep2.parquet")
    touch("fact/p_year=2024/p_month=1/_ignored.crc") // non-parquet skipped
    assert(StoreSwap.listDirFiles(fs, root, "fact").sorted == Seq(
      "fact/flat.parquet", "fact/p_year=2024/one.parquet",
      "fact/p_year=2024/p_month=1/deep.parquet",
      "fact/p_year=2024/p_month=2/deep2.parquet"),
      "every depth must list, non-parquet must not")
    // staged two-level layout moves in preserving partition dirs
    val stage = new Path(root, ".save_stage_t_fact")
    fs.mkdirs(new Path(stage, "p_year=2025/p_month=3"))
    fs.create(new Path(stage, "p_year=2025/p_month=3/f.parquet"), true).close()
    val moved = StoreSwap.moveStagedIn(fs, root, "fact", stage, "tag_")
    assert(moved == Seq("fact/p_year=2025/p_month=3/tag_f.parquet"), moved)
    assert(fs.exists(new Path(s"$root/${moved.head}")))
    assert(!fs.exists(stage), "staging root must be dropped")
  }

  test("vacuum graceMs protects a mid-flight verb: young staging roots, " +
    "tmp manifests, and moved-in-but-unflipped files survive; the same " +
    "sweep with grace 0 (quiescent) reclaims them") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(root))
    // committed store: one listed file
    fs.mkdirs(new Path(s"$root/d"))
    fs.create(new Path(s"$root/d/live.parquet"), true).close()
    StoreSwap.commitManifest(fs, root, 1, Seq("d/live.parquet"))
    // a mid-flight mutation: staging root + an already-moved-in (but
    // not yet flipped) file + a tmp manifest, all freshly written
    fs.mkdirs(new Path(s"$root/.ingest_stage_x_d"))
    fs.create(new Path(s"$root/d/unflipped.parquet"), true).close()
    fs.create(new Path(s"$root/._manifest_tmp_x"), true).close()
    val dropped = StoreSwap.vacuumManifested(spark, root, Seq("d"),
      "spec", keepVersions = 1, graceMs = 3600 * 1000L)
    assert(dropped == 0L, s"grace must protect young bytes, dropped $dropped")
    assert(fs.exists(new Path(s"$root/.ingest_stage_x_d")) &&
      fs.exists(new Path(s"$root/d/unflipped.parquet")) &&
      fs.exists(new Path(s"$root/._manifest_tmp_x")),
      "in-flight staging/tmp/moved-in files must survive a graced vacuum")
    // the mutation now commits — its moved-in file becomes listed
    StoreSwap.commitManifest(fs, root, 2,
      Seq("d/live.parquet", "d/unflipped.parquet"))
    // quiescent sweep (grace 0): the leftovers reclaim, listed files stay
    val dropped2 = StoreSwap.vacuumManifested(spark, root, Seq("d"), "spec")
    assert(dropped2 == 0L, "both files are listed by the kept manifest")
    assert(!fs.exists(new Path(s"$root/.ingest_stage_x_d")) &&
      !fs.exists(new Path(s"$root/._manifest_tmp_x")),
      "quiescent vacuum reclaims staging litter")
    assert(fs.exists(new Path(s"$root/d/unflipped.parquet")),
      "the committed file must survive")
  }

  test("versioned layout: floor-rule resolution per manifest version, " +
    "claim-or-verify on re-commit, and vacuum keeps the oldest kept " +
    "manifest's floor layout") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(root))
    fs.mkdirs(new Path(s"$root/d"))
    def commitV(v: Int, withLayout: Boolean = false): Unit = {
      fs.create(new Path(s"$root/d/f$v.parquet"), true).close()
      StoreSwap.commitManifest(fs, root, v, Seq(s"d/f$v.parquet"),
        layoutCommitted = withLayout)
    }
    StoreSwap.commitLayout(fs, root, 1, Seq("pb" -> 8))
    commitV(1, withLayout = true)
    commitV(2) // a verb that doesn't change layout
    StoreSwap.commitLayout(fs, root, 3, Seq("pb" -> 64))
    commitV(3, withLayout = true)
    assert(StoreSwap.readLayoutAt(fs, root, Some(1)) == Map("pb" -> 8))
    assert(StoreSwap.readLayoutAt(fs, root, Some(2)) == Map("pb" -> 8),
      "floor rule: v2 resolves the layout committed at v1")
    assert(StoreSwap.readLayoutAt(fs, root, Some(3)) == Map("pb" -> 64))
    // idempotent re-commit with same values passes; different values refuse
    StoreSwap.commitLayout(fs, root, 3, Seq("pb" -> 64))
    val e = intercept[java.util.ConcurrentModificationException](
      StoreSwap.commitLayout(fs, root, 3, Seq("pb" -> 16)))
    assert(e.getMessage.contains("different values"), e.getMessage)
    // vacuum to the latest 1: v3's floor (the v3 layout) survives,
    // the v1 layout is out of window and reclaimed
    StoreSwap.vacuumManifested(spark, root, Seq("d"), "spec")
    assert(StoreSwap.layoutVersions(fs, root) == Seq(3))
    assert(StoreSwap.readLayoutAt(fs, root, Some(3)) == Map("pb" -> 64))
  }

  test("orphan layout (a crashed layout-writing verb): a layout-less " +
    "commit of that version refuses loudly, the crashed verb's re-run " +
    "passes, and vacuum reclaims an aged abandoned orphan") {
    val root = freshRoot()
    val fs = StoreSwap.fsOf(spark, root)
    fs.mkdirs(new Path(s"$root/d"))
    fs.create(new Path(s"$root/d/f1.parquet"), true).close()
    // crash window: layout v1 committed, manifest v1 not
    StoreSwap.commitLayout(fs, root, 1, Seq("pb" -> 8))
    val e = intercept[java.util.ConcurrentModificationException] {
      StoreSwap.commitManifest(fs, root, 1, Seq("d/f1.parquet"))
    }
    assert(e.getMessage.contains("Re-run") ||
      e.getMessage.contains("re-run") || e.getMessage.contains("orphan"),
      s"refusal must name the remedy: ${e.getMessage}")
    // the crashed verb re-runs: claim-or-verify passes, it takes v1
    StoreSwap.commitLayout(fs, root, 1, Seq("pb" -> 8))
    StoreSwap.commitManifest(fs, root, 1, Seq("d/f1.parquet"),
      layoutCommitted = true)
    assert(StoreSwap.readLayoutAt(fs, root, Some(1)) == Map("pb" -> 8))
    // an abandoned orphan ABOVE the newest manifest: vacuum (quiescent)
    // reclaims it, and the next layout-less commit proceeds
    StoreSwap.commitLayout(fs, root, 2, Seq("pb" -> 16))
    intercept[java.util.ConcurrentModificationException] {
      StoreSwap.commitManifest(fs, root, 2, Seq("d/f1.parquet"))
    }
    StoreSwap.vacuumManifested(spark, root, Seq("d"), "spec")
    assert(StoreSwap.layoutVersions(fs, root) == Seq(1),
      "vacuum must reclaim the abandoned orphan layout")
    fs.create(new Path(s"$root/d/f2.parquet"), true).close()
    StoreSwap.commitManifest(fs, root, 2,
      Seq("d/f1.parquet", "d/f2.parquet"))
    assert(StoreSwap.readLayoutAt(fs, root, Some(2)) == Map("pb" -> 8),
      "v2 must floor-resolve v1's layout after the orphan is gone")
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
