package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared copy-on-write plumbing for the persisted artifact stores (the
  * MinHash signature store, the IVF index): every reader resolves the
  * CURRENT file-set through the highest-numbered `_manifest.v<N>` at the
  * store root (one relative parquet path per line), and every mutation
  * verb lands new files first — staged writes MOVED into the live tree
  * under verb-unique names — then commits ONE rename-committed manifest
  * that makes them visible. Old files are unlisted, never deleted by a
  * mutation; the store's vacuum verb is the retention point.
  *
  * Crash contract: anything before the manifest flip is invisible
  * garbage, so re-running the verb is always the recovery, a reader
  * pinned on an older manifest keeps a complete consistent file-set
  * (never a missing partition), and there is no ordering contract
  * between a store's directories — the flip is the single commit point.
  * Mutation verbs are single-writer (the repo-wide store contract);
  * vacuum must not run while a reader is pinned past the latest
  * manifest (the standard retention rule).
  *
  * At 100 TB the manifest is the same driver-side metadata object a
  * table format carries; chunked manifests are the named next step if
  * the file count ever dominates.
  */
private[graft] object StoreSwap {

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  val ManifestPrefix = "_manifest.v"

  // -- shared routing/guard helpers (one definition for every family;
  //    these used to be re-implemented per store module) --

  /** stable63-derived id bucket: the delete-path routing every
    * id-bucketed store dir uses — the bucket of any id is computable
    * from the id ALONE, so purges route without scanning. */
  def idBucket(id: org.apache.spark.sql.Column,
               n: Int): org.apache.spark.sql.Column =
    pmod(graft.functions.StableId63.stableId63(id.cast("string")),
      lit(n.toLong))

  /** Partition-prune a store scan to `touched` buckets — skipped when
    * the probe touches every bucket anyway (an isin over the full
    * bucket range prunes nothing and bloats the filter). */
  def prunePartitions(df: DataFrame, partCol: String,
                      touched: Seq[Long], total: Int): DataFrame =
    if (touched.length >= total) df
    else df.where(col(partCol).isin(touched: _*))

  /** Broadcast-if-provably-small under the shared ANN-family guard
    * ([[IvfIndex.fitsBroadcast]]): delta-sized probes ride broadcast
    * joins into store scans, oversized ones degrade to shuffle joins
    * instead of a driver OOM. */
  def maybeBroadcast(df: DataFrame): DataFrame =
    if (IvfIndex.fitsBroadcast(df, IvfIndex.MaxBroadcastQueries))
      broadcast(df) else df

  /** `_layout` file: named bucket counts persisted at save time so
    * every later verb routes with the SAME counts the data was
    * written with. */
  def writeLayout(fs: FileSystem, path: String,
                  counts: Seq[(String, Int)]): Unit =
    writeLayoutFile(fs, new Path(s"$path/_layout"), counts)

  private def writeLayoutFile(fs: FileSystem, p: Path,
                              counts: Seq[(String, Int)]): Unit = {
    val out = fs.create(p, true)
    try out.write(counts.map { case (k, v) => s"$k=$v\n" }
      .mkString.getBytes("UTF-8"))
    finally out.close()
  }

  /** The `_layout` counts, empty when the file is absent (legacy
    * stores) — callers apply their own per-key defaults. */
  def readLayout(fs: FileSystem, path: String): Map[String, Int] =
    readLayoutFile(fs, new Path(s"$path/_layout"))

  private def readLayoutFile(fs: FileSystem, p: Path): Map[String, Int] = {
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.linesIterator.map(_.trim).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v.toInt }.toMap
  }

  /** VERSIONED layout files — `_layout.v<N>`, committed alongside
    * manifest version N by any verb that sets or changes routing
    * values (save, re-bucket). A plain unversioned `_layout` is a
    * value's history erased: a pinned snapshot read would resolve the
    * CURRENT bucket counts / window length against files written with
    * the OLD ones and silently mis-route. Resolution is the floor
    * rule — the highest layout version ≤ the manifest version being
    * read (verbs between layout changes commit manifests without
    * layout files) — falling back to the plain `_layout` for legacy
    * stores. Save verbs keep writing the plain file too, so older
    * readers and `ready()`-style probes are unaffected. */
  val LayoutPrefix = "_layout.v"

  def layoutVersions(fs: FileSystem, path: String): Seq[Int] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(LayoutPrefix))
      .flatMap(n => scala.util.Try(n.drop(LayoutPrefix.length).toInt).toOption)
      .sorted
  }

  /** Write the versioned layout (the history the floor rule reads)
    * and mirror it to the plain `_layout` (legacy compatibility).
    * Claim-or-verify on the versioned file: a re-run after a crash
    * (same version, same counts) passes idempotently; a RACING writer
    * with DIFFERENT counts fails loudly here, before its manifest
    * claim, so a committed version's layout can never be another
    * writer's counts. Called BEFORE [[commitManifest]] — a crash
    * between the two leaves an orphan layout file no committed
    * manifest resolves, and [[commitManifest]] REFUSES to let a
    * layout-less verb claim that version number (the orphan counts
    * would bind to old-count files and mis-route every pruned read);
    * the remedy is re-running the crashed verb, or vacuuming the aged
    * orphan away when quiescent. */
  def commitLayout(fs: FileSystem, path: String, version: Int,
                   counts: Seq[(String, Int)]): Unit = {
    fs.mkdirs(new Path(path))
    val dest = new Path(s"$path/$LayoutPrefix$version")
    def verifyOrConflict(): Unit = {
      val existing = readLayoutFile(fs, dest)
      if (existing != counts.toMap)
        throw new java.util.ConcurrentModificationException(
          s"commitLayout: $dest already exists with different values " +
            s"($existing vs ${counts.toMap}) — a concurrent or crashed " +
            "writer claimed this version with other routing counts; " +
            "re-run the verb (it will read the new manifest), or delete " +
            "the orphan layout file if no manifest v" + version + " exists")
    }
    if (fs.exists(dest)) verifyOrConflict()
    else {
      val tmp = new Path(path,
        s"._layout_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      writeLayoutFile(fs, tmp, counts)
      if (fs.getScheme == "file") {
        val raw = (p: Path) => java.nio.file.Paths.get(p.toUri.getPath)
        try java.nio.file.Files.createLink(raw(dest), raw(tmp))
        catch {
          case _: java.nio.file.FileAlreadyExistsException => verifyOrConflict()
        }
        fs.delete(tmp, false)
      } else if (!fs.rename(tmp, dest)) { fs.delete(tmp, false); verifyOrConflict() }
    }
    writeLayoutFile(fs, new Path(s"$path/_layout"), counts)
  }

  /** The layout in effect at manifest version `asOf` (None = latest):
    * floor rule over the versioned files, plain-`_layout` fallback. */
  def readLayoutAt(fs: FileSystem, path: String,
                   asOf: Option[Int]): Map[String, Int] = {
    val vs = layoutVersions(fs, path)
    val pick = asOf match {
      case Some(v) => vs.filter(_ <= v).lastOption
      case None    => vs.lastOption
    }
    pick.map(v => readLayoutFile(fs, new Path(s"$path/$LayoutPrefix$v")))
      .filter(_.nonEmpty)
      .getOrElse(readLayout(fs, path))
  }

  def manifestVersions(fs: FileSystem, path: String): Seq[Int] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => scala.util.Try(n.drop(ManifestPrefix.length).toInt).toOption)
      .sorted
  }

  private def readManifest(fs: FileSystem, path: String,
                           v: Int): (Int, Seq[String]) = {
    val in = fs.open(new Path(s"$path/$ManifestPrefix$v"))
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    v -> text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def latestManifest(fs: FileSystem, path: String): Option[(Int, Seq[String])] =
    manifestVersions(fs, path).lastOption.map(v => readManifest(fs, path, v))

  /** Resolve a PINNED manifest version — the snapshot-read entry: every
    * mutation is copy-on-write behind a fresh manifest, so any version
    * vacuum has not reclaimed is a complete, consistent point-in-time
    * file-set. Refuses loudly (naming the retained window) when the
    * version was never committed or has been vacuumed past. One honest
    * edge: the streaming replay verb (`dropAppendPartials`) physically
    * reclaims a replayed batch's files like a targeted vacuum, so a
    * version listing those files stops being readable — resolution
    * still succeeds but the scan fails loudly on the missing paths,
    * exactly as documented on the replay verbs. */
  def manifestAt(fs: FileSystem, path: String, version: Int)
  : (Int, Seq[String]) = {
    val have = manifestVersions(fs, path)
    require(have.contains(version),
      s"manifestAt: $path has no manifest v$version (retained: " +
        s"${if (have.isEmpty) "none" else have.mkString(",")}) — " +
        "either it was never committed or vacuum reclaimed it; " +
        "re-run vacuum with a larger keepVersions to retain history")
    readManifest(fs, path, version)
  }

  /** Resolve the store's manifest or refuse: every store this module
    * writes commits one at save time, so a path without one is not a
    * store (or a torn save — absent either way). */
  def requireManifest(fs: FileSystem, path: String,
                      verb: String): (Int, Seq[String]) =
    latestManifest(fs, path).getOrElse(throw new IllegalArgumentException(
      s"$verb: $path is not a committed store layout (no store manifest)"))

  /** CAS-committed manifest write — the write-side half of the store's
    * isolation story. The content lands complete in a dot-tmp file first
    * (a partially-written manifest can never be the version a reader
    * resolves), then CLAIMS `_manifest.v<version>` atomically-if-absent:
    *
    *  - `file:` scheme: a hard link (`Files.createLink`) — `link(2)`
    *    fails with EEXIST atomically, so of two racing writers exactly
    *    one wins (a plain rename would silently clobber on POSIX);
    *  - other schemes: `FileSystem.rename`, which on HDFS is atomic and
    *    returns false when the destination exists.
    *
    * The loser gets a [[java.util.ConcurrentModificationException]]:
    * the store advanced under its entry read, so its version-N+1 claim
    * is stale. Nothing it staged is visible (copy-on-write files it
    * moved in are unlisted garbage — vacuum reclaims them); the remedy
    * is to re-run the verb, which re-reads the NEW manifest. This turns
    * the repo-wide single-writer contract from documentation into an
    * enforced optimistic-concurrency protocol: lost updates are
    * impossible, concurrent writers serialize or fail loudly.
    *
    * `layoutCommitted` = this verb committed `_layout.v<version>`
    * itself (saves, re-bucket). A verb that did NOT must refuse when
    * an orphan layout file already claims this version: a
    * layout-writing verb crashed between its two commits, and letting
    * a layout-LESS verb take the version number would bind the
    * never-applied routing counts to files written under the old ones
    * — every pruned read would silently miss. The remedy is loud:
    * re-run the crashed verb (its claim-or-verify passes and it takes
    * this version), or delete the orphan file if that work is
    * abandoned. */
  def commitManifest(fs: FileSystem, path: String, version: Int,
                     files: Seq[String],
                     layoutCommitted: Boolean = false): Unit = {
    // ORPHAN check only: a layout file whose manifest version IS
    // committed is a live layout, and the right diagnosis for this
    // caller is the ordinary CAS conflict below (its version claim is
    // stale) — never an instruction to delete a layout a committed
    // manifest resolves
    if (!layoutCommitted &&
        fs.exists(new Path(s"$path/$LayoutPrefix$version")) &&
        !fs.exists(new Path(s"$path/$ManifestPrefix$version")))
      throw new java.util.ConcurrentModificationException(
        s"commitManifest: $path/$LayoutPrefix$version exists but this verb " +
          "did not commit it and no manifest v" + version + " exists — a " +
          "layout-writing verb (save/re-bucket) crashed between its " +
          "layout and manifest commits. Re-run that verb to complete it, " +
          "or delete the orphan layout file if its work is abandoned; " +
          "committing past it would mis-route every version-pinned read")
    val tmp = new Path(path,
      s"._manifest_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(files.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val dest = new Path(s"$path/$ManifestPrefix$version")
    def conflict(): Nothing = {
      fs.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"commitManifest: $dest already exists — a concurrent writer " +
          "committed since this verb read the manifest. Nothing from " +
          "this attempt is visible; re-run the verb (it will read the " +
          "new manifest) and vacuum when quiescent to reclaim the " +
          "attempt's unlisted files")
    }
    if (fs.exists(dest)) conflict()
    if (fs.getScheme == "file") {
      val raw = (p: Path) => java.nio.file.Paths.get(p.toUri.getPath)
      try java.nio.file.Files.createLink(raw(dest), raw(tmp))
      catch { case _: java.nio.file.FileAlreadyExistsException => conflict() }
      fs.delete(tmp, false)
    } else if (!fs.rename(tmp, dest)) conflict()
  }

  /** All parquet files currently under a store directory, as
    * store-relative paths — RECURSIVE to any partition depth (flat
    * `dir/file.parquet`, one-level `dir/part=v/file.parquet`,
    * two-level `dir/p_year=Y/p_month=M/file.parquet`, …). Depth-2+
    * layouts used to be silently unlisted here — which would have made
    * the next vacuum DELETE live files of any multi-level family. */
  def listDirFiles(fs: FileSystem, path: String, dir: String): Seq[String] = {
    val base = new Path(s"$path/$dir")
    if (!fs.exists(base)) return Seq.empty
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val childRel = s"$rel/${st.getPath.getName}"
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) Seq(childRel)
        else if (st.isDirectory) walk(st.getPath, childRel)
        else Seq.empty
      }
    walk(base, dir)
  }

  /** Manifest-resolved read of one store directory: only the files the
    * manifest lists exist for this reader, with any partition column
    * recovered from the paths (basePath) and partition pruning intact. */
  def readStoreDir(spark: SparkSession, path: String, dir: String,
                   manifestFiles: Seq[String]): DataFrame = {
    val mine = manifestFiles.filter(_.startsWith(dir + "/"))
      .map(f => s"$path/$f")
    require(mine.nonEmpty,
      s"readStoreDir: the store manifest at $path lists no $dir files")
    spark.read.option("basePath", s"$path/$dir").parquet(mine: _*)
  }

  /** Move every staged file under `tmpRoot` into the live `dir` under a
    * fresh `tag`-prefixed name (copy-on-write: nothing in the live tree
    * is deleted or overwritten), returning the moved files'
    * store-relative paths. RECURSIVE: flat and any-depth partitioned
    * staged layouts keep their relative partition dirs; the staging
    * root is dropped. */
  def moveStagedIn(fs: FileSystem, path: String, dir: String,
                   tmpRoot: Path, tag: String): Seq[String] = {
    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path, relDir: String): Unit =
      fs.listStatus(p).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
          val liveDir = new Path(s"$path/$relDir")
          fs.mkdirs(liveDir)
          val name = s"$tag${st.getPath.getName}"
          require(fs.rename(st.getPath, new Path(liveDir, name)),
            s"moveStagedIn: rename of ${st.getPath} into $liveDir failed — " +
              "nothing is visible yet; re-run the verb")
          moved += s"$relDir/$name"
        } else if (st.isDirectory)
          walk(st.getPath, s"$relDir/${st.getPath.getName}")
      }
    if (fs.exists(tmpRoot)) {
      walk(tmpRoot, dir)
      fs.delete(tmpRoot, true)
    }
    moved.toSeq
  }

  /** The staging protocol every mutation verb follows, in one place:
    * build an invocation-unique dot-prefixed staging root next to the
    * live tree (the name matches vacuum's `^\.[a-z]+_stage_` sweep),
    * let the caller write into it, then move the staged files in
    * copy-on-write under `tag`-prefixed names ([[moveStagedIn]]).
    * Returns the moved files' store-relative paths for the caller's
    * manifest flip. */
  def stageAndMoveIn(fs: FileSystem, path: String, dir: String,
                     verb: String, tag: String)
                    (write: String => Unit): Seq[String] = {
    // the staging ROOT is always invocation-unique, even when the
    // caller's file tag is deterministic (a streaming replay prefix):
    // two writers replaying the same batch must never share a root —
    // one's delete would eat the other's in-flight staged output and a
    // torn MIX could move in
    val tmpRoot = new Path(path,
      s".${verb}_stage_${java.util.UUID.randomUUID().toString.take(8)}_$dir")
    fs.delete(tmpRoot, true)
    write(tmpRoot.toString)
    moveStagedIn(fs, path, dir, tmpRoot, tag)
  }

  /** Drop every file no RETAINED manifest lists — the shared retention
    * verb: reclaims copy-on-write garbage (unflipped crash leftovers,
    * superseded rewrite inputs, a losing CAS writer's moved-in files),
    * empty partition dirs, manifest versions older than the retained
    * window, and leftover staging roots.
    *
    * `keepVersions` is the time-travel retention knob: the newest K
    * manifests survive, and with them every file any of them lists, so
    * a snapshot read pinned inside the window ([[manifestAt]]) stays
    * complete. The default (1) is pure garbage collection — history
    * collapses to the present, exactly the pre-retention behavior.
    * Versioned layout files follow the same window (the floor layout
    * of the oldest kept manifest survives, so every retained snapshot
    * still resolves the routing values it was written with).
    *
    * `graceMs` scopes the sweep to bytes OLDER than the horizon: with
    * the default 0, vacuum assumes QUIESCENCE — a concurrent in-flight
    * verb's staging root, tmp manifest, or moved-in-but-not-yet-
    * flipped files are indistinguishable from crash garbage and WILL
    * be deleted (the verb then fails loudly at its rename or commits a
    * manifest listing deleted files). Pass a horizon comfortably above
    * the longest verb runtime (e.g. 1h) to vacuum safely alongside
    * live writers: anything younger than the horizon is presumed
    * in-flight and left alone, and the next vacuum reclaims it once
    * it has aged past.
    *
    * @return number of data files deleted. */
  def vacuumManifested(spark: SparkSession, path: String,
                       dirs: Seq[String], verb: String,
                       keepVersions: Int = 1, graceMs: Long = 0L): Long = {
    require(keepVersions >= 1,
      s"$verb: keepVersions must be >= 1 (got $keepVersions) — " +
        "vacuum never deletes the latest manifest's file-set")
    require(graceMs >= 0L, s"$verb: graceMs must be >= 0 (got $graceMs)")
    val fs = fsOf(spark, path)
    requireManifest(fs, path, verb)
    val cutoff = System.currentTimeMillis() - graceMs
    // a path can vanish between listing and stat when a live writer
    // finishes its move mid-sweep (the graced mode's normal case) —
    // already-gone means nothing to delete, never an abort
    def aged(p: Path): Boolean =
      graceMs == 0L || {
        try fs.getFileStatus(p).getModificationTime < cutoff
        catch { case _: java.io.FileNotFoundException => false }
      }
    // ONE versions snapshot drives retention end to end: re-listing at
    // the manifest sweep would catch (and DELETE) a version a live
    // writer committed mid-vacuum — silent loss of a committed write
    val allVersions = manifestVersions(fs, path)
    val kept = allVersions.takeRight(keepVersions)
    val listed = kept.flatMap(v => readManifest(fs, path, v)._2).toSet
    var dropped = 0L
    dirs.foreach { dir =>
      listDirFiles(fs, path, dir).filterNot(listed).foreach { rel =>
        val p = new Path(s"$path/$rel")
        if (aged(p)) {
          fs.delete(p, false)
          dropped += 1
        }
      }
      // prune now-empty partition dirs bottom-up (any depth)
      def pruneEmpty(p: Path): Boolean = { // returns "now empty"
        val children = fs.listStatus(p).toSeq
        val remaining = children.filterNot(st =>
          st.isDirectory && pruneEmpty(st.getPath) && aged(st.getPath) && {
            fs.delete(st.getPath, true); true
          })
        remaining.isEmpty
      }
      val root = new Path(s"$path/$dir")
      if (fs.exists(root)) pruneEmpty(root)
    }
    allVersions.filterNot(kept.contains).foreach(v =>
      fs.delete(new Path(s"$path/$ManifestPrefix$v"), false))
    // layout retention: keep the floor layout of the oldest kept
    // manifest and everything after it — and reclaim ORPHAN layouts
    // above the newest committed manifest (a crashed layout-writing
    // verb's leftover, which commitManifest refuses to commit past;
    // vacuum is the quiescent reclaim point for its staging too)
    kept.headOption.foreach { oldestKept =>
      val lvs = layoutVersions(fs, path)
      lvs.filter(_ <= oldestKept).lastOption.foreach { floor =>
        lvs.filter(_ < floor).foreach(v =>
          fs.delete(new Path(s"$path/$LayoutPrefix$v"), false))
      }
      allVersions.lastOption.foreach { newest =>
        lvs.filter(_ > newest)
          .filter(v => aged(new Path(s"$path/$LayoutPrefix$v")))
          .foreach(v => fs.delete(new Path(s"$path/$LayoutPrefix$v"), false))
      }
    }
    fs.listStatus(new Path(path)).toSeq
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith("._manifest_tmp_") || n.startsWith("._layout_tmp_") ||
          n.matches("^\\.[a-z]+_stage_.*")
      }
      .filter(s => graceMs == 0L || s.getModificationTime < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
    dropped
  }

  /** Fold every multi-file partition (multi-file BY THE MANIFEST —
    * unlisted garbage never gets compacted into the store) of the given
    * `(dir, partCol)` pairs into ~`targetBytes` files, as one
    * partition-pruned job per directory staged then moved in
    * copy-on-write, with ONE manifest flip across all directories.
    * Callers follow with the store's vacuum verb (compaction is already
    * gated on "no ingest in flight"). */
  def compactManifested(spark: SparkSession, path: String,
                        dirs: Seq[(String, String)], verb: String,
                        targetBytes: Long): Unit = {
    val fs = fsOf(spark, path)
    val (mfVersion, mfFiles) = requireManifest(fs, path, verb)
    val tag = s"c${java.util.UUID.randomUUID().toString.take(8)}_"
    var moved = Seq.empty[String]
    var dropped = Set.empty[String]
    dirs.foreach { case (dir, partCol) =>
      val groups = mfFiles.filter(_.startsWith(dir + "/"))
        .filter(_.count(_ == '/') == 2) // partitioned entries only
        .groupBy(_.split("/")(1))
        .filter(_._2.length > 1)
      if (groups.nonEmpty && fs.exists(new Path(s"$path/$dir"))) {
        val slices = groups.toSeq.map { case (partName, fls) =>
          val bytes = fls
            .map(f => fs.getFileStatus(new Path(s"$path/$f")).getLen).sum
          partName.split("=", 2)(1).toLong ->
            math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        }.sortBy(_._1)
        val pruned = readStoreDir(spark, path, dir, mfFiles)
          .where(col(partCol).isin(slices.map(_._1): _*))
        // deterministic content-hash slice for oversized partitions
        // (never repartition on a nondeterministic column — task
        // retries would duplicate or drop rows)
        val sliceExpr = slices.filter(_._2 > 1).foldLeft(lit(0)) {
          case (acc, (v, n)) =>
            when(col(partCol) === lit(v),
              pmod(hash(pruned.columns.map(col): _*), lit(n))).otherwise(acc)
        }
        moved = moved ++ stageAndMoveIn(fs, path, dir, "compact", tag)(
          root => pruned.withColumn("__slice", sliceExpr)
            .repartition(slices.map(_._2).sum, col(partCol), col("__slice"))
            .drop("__slice")
            .write.mode("overwrite").partitionBy(partCol)
            .parquet(root))
        dropped = dropped ++ groups.values.flatten
      }
    }
    if (dropped.nonEmpty)
      commitManifest(fs, path, mfVersion + 1,
        mfFiles.filterNot(dropped) ++ moved)
  }
}
