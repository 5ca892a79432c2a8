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
private[operators] object StoreSwap {

  def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  val ManifestPrefix = "_manifest.v"

  def manifestVersions(fs: FileSystem, path: String): Seq[Int] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => scala.util.Try(n.drop(ManifestPrefix.length).toInt).toOption)
      .sorted
  }

  def latestManifest(fs: FileSystem, path: String): Option[(Int, Seq[String])] =
    manifestVersions(fs, path).lastOption.map { v =>
      val in = fs.open(new Path(s"$path/$ManifestPrefix$v"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      v -> text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }

  /** Resolve the store's manifest or refuse: every store this module
    * writes commits one at save time, so a path without one is not a
    * store (or a torn save — absent either way). */
  def requireManifest(fs: FileSystem, path: String,
                      verb: String): (Int, Seq[String]) =
    latestManifest(fs, path).getOrElse(throw new IllegalArgumentException(
      s"$verb: $path is not a committed store layout (no store manifest)"))

  /** Rename-committed manifest write: the content lands in a dot-tmp
    * file first, so a partially-written manifest can never be the
    * highest version a reader resolves. */
  def commitManifest(fs: FileSystem, path: String, version: Int,
                     files: Seq[String]): Unit = {
    val tmp = new Path(path,
      s"._manifest_tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(files.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(s"$path/$ManifestPrefix$version")),
      s"commitManifest: rename to $path/$ManifestPrefix$version failed — " +
        "the mutation is NOT visible; re-run the verb")
  }

  /** All parquet files currently under a store directory, as
    * store-relative paths — flat files (`dir/file.parquet`) and
    * partitioned ones (`dir/part=value/file.parquet`). */
  def listDirFiles(fs: FileSystem, path: String, dir: String): Seq[String] = {
    val root = new Path(s"$path/$dir")
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq.flatMap { st =>
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        Seq(s"$dir/${st.getPath.getName}")
      else if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(f => s"$dir/${st.getPath.getName}/${f.getPath.getName}")
      else Seq.empty
    }
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
    * store-relative paths. Handles flat and single-level-partitioned
    * staged layouts; the staging root is dropped. */
  def moveStagedIn(fs: FileSystem, path: String, dir: String,
                   tmpRoot: Path, tag: String): Seq[String] = {
    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    def moveFile(f: Path, liveDir: Path, rel: String): Unit = {
      fs.mkdirs(liveDir)
      val name = s"$tag${f.getName}"
      require(fs.rename(f, new Path(liveDir, name)),
        s"moveStagedIn: rename of $f into $liveDir failed — nothing is " +
          "visible yet; re-run the verb")
      moved += s"$rel/$name"
    }
    if (fs.exists(tmpRoot)) {
      fs.listStatus(tmpRoot).foreach { st =>
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          moveFile(st.getPath, new Path(s"$path/$dir"), dir)
        else if (st.isDirectory)
          fs.listStatus(st.getPath)
            .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .foreach(f => moveFile(f.getPath,
              new Path(s"$path/$dir/${st.getPath.getName}"),
              s"$dir/${st.getPath.getName}"))
      }
      fs.delete(tmpRoot, true)
    }
    moved.toSeq
  }

  /** Drop every file the latest manifest does not list — the shared
    * retention verb: reclaims copy-on-write garbage (unflipped crash
    * leftovers, superseded rewrite inputs), empty partition dirs,
    * superseded manifest versions, and leftover staging roots.
    *
    * @return number of data files deleted. */
  def vacuumManifested(spark: SparkSession, path: String,
                       dirs: Seq[String], verb: String): Long = {
    val fs = fsOf(spark, path)
    val (version, files) = requireManifest(fs, path, verb)
    val listed = files.toSet
    var dropped = 0L
    dirs.foreach { dir =>
      listDirFiles(fs, path, dir).filterNot(listed).foreach { rel =>
        fs.delete(new Path(s"$path/$rel"), false)
        dropped += 1
      }
      val root = new Path(s"$path/$dir")
      if (fs.exists(root))
        fs.listStatus(root).toSeq.filter(_.isDirectory).foreach { pd =>
          if (fs.listStatus(pd.getPath).isEmpty) fs.delete(pd.getPath, true)
        }
    }
    manifestVersions(fs, path).filter(_ < version).foreach(v =>
      fs.delete(new Path(s"$path/$ManifestPrefix$v"), false))
    fs.listStatus(new Path(path)).toSeq
      .filter { s =>
        val n = s.getPath.getName
        n.startsWith("._manifest_tmp_") || n.startsWith(".ingest_stage_") ||
          n.startsWith(".purge_stage_") || n.startsWith(".compact_stage_") ||
          n.startsWith(".append_stage_") || n.startsWith(".rebuild_stage_")
      }
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
        val tmpRoot = new Path(path, s".compact_stage_$dir")
        fs.delete(tmpRoot, true)
        pruned.withColumn("__slice", sliceExpr)
          .repartition(slices.map(_._2).sum, col(partCol), col("__slice"))
          .drop("__slice")
          .write.mode("overwrite").partitionBy(partCol)
          .parquet(tmpRoot.toString)
        moved = moved ++ moveStagedIn(fs, path, dir, tmpRoot, tag)
        dropped = dropped ++ groups.values.flatten
      }
    }
    if (dropped.nonEmpty)
      commitManifest(fs, path, mfVersion + 1,
        mfFiles.filterNot(dropped) ++ moved)
  }
}
