package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Object-store-safe commit protocol for one table (the manifest-pointer
  * alternative to [[StateStore]]'s staged-rename protocol — reference
  * equivalent: the transactional KV batch, store/kv/store.go:332–467).
  *
  * S3-class stores have no atomic directory rename, so "stage then rename
  * into place" cannot be the visibility barrier. Here data files are
  * written ONCE under stable per-commit directories and never moved;
  * visibility comes from metadata:
  *
  *   1. `d-<commitId>-g<gen>/` — the commit's data files. Deterministic
  *      per (commitId, generation): a crash-replay rewrites the SAME
  *      directory in overwrite mode, so orphans self-clean on retry.
  *   2. `_manifests/m-<gen>.json` — the full committed file list as of
  *      generation `gen` (JSON lines, one per commit).
  *   3. `_gen` — the generation POINTER. The swap of this one small file
  *      is the only "atomic" operation the protocol needs: a single-object
  *      PUT on an object store (here: tmp file + single-file rename, the
  *      local/HDFS equivalent).
  *
  * Readers resolve pointer → manifest → file list. A crash anywhere
  * before the pointer swap leaves only files no manifest references —
  * readers never observe a partial batch; no directory rename is ever
  * issued. Unreferenced attempt directories are swept opportunistically
  * by the next successful commit of the same commitId (overwrite) or by
  * [[sweepOrphans]].
  *
  * The manifest is rewritten whole per commit — fine for a micro-batch
  * cadence where [[replaceAll]] (compaction) periodically collapses the
  * log; a production object-store deployment would adopt Delta/Iceberg,
  * which are this exact shape plus manifest checkpointing.
  */
final class ManifestTable(val tablePath: String, schema: StructType,
    partitionCol: Option[String] = None)(
    implicit spark: SparkSession) {

  private val genPointerPath = s"$tablePath/_gen"
  private val manifestDir = s"$tablePath/_manifests"

  private def fsOf(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(spark.sessionState.newHadoopConf()), path)
  }

  /** Test hook: simulate a crash after the data write, before publish. */
  private[graft] var failBeforePublish: Boolean = false

  // -------------------------------------------------------------- pointer

  /** Current generation, or None for an empty table. */
  def currentGeneration(): Option[Long] = {
    val (fs, p) = fsOf(genPointerPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        Some(s.toLong)
      } finally in.close()
    }
  }

  /** Swap the generation pointer. One SMALL single file: on an object
    * store this is one atomic PUT; locally/HDFS a tmp + single-FILE
    * rename (file renames need no directory atomicity).
    *
    * The swap must NOT delete the live pointer first: a crash between
    * that delete and the rename would leave readers with no pointer at
    * all — an empty table, worse than stale (found by
    * ObjectStoreProtocolSpec's fail-before-copy injection). POSIX rename
    * overwrites atomically and an object-store "rename" is a PUT-copy
    * that overwrites too, so the overwrite path is the normal one; the
    * delete+retry fallback only serves filesystems whose rename refuses
    * existing destinations — and on THOSE (e.g. strict HDFS rename
    * semantics, where every swap after generation 1 takes the fallback)
    * the delete→rename pair reopens a residual no-pointer window. That
    * is accepted for the S3-class/POSIX targets this protocol is
    * documented for; an HDFS deployment wanting atomic overwrite should
    * swap via `FileContext.rename(..., Options.Rename.OVERWRITE)`
    * instead. */
  private def publish(gen: Long): Unit = {
    val (fs, p) = fsOf(genPointerPath)
    val tmp = new Path(s"$genPointerPath.tmp")
    val out = fs.create(tmp, true)
    try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, p)) {
      if (fs.exists(p)) fs.delete(p, false)
      require(fs.rename(tmp, p), s"pointer swap failed for $tablePath")
    }
  }

  // ------------------------------------------------------------- manifest

  private def manifestPath(gen: Long): String = f"$manifestDir/m-$gen%09d.json"

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  /** Committed (commitId, relative file paths), in commit order. */
  private[graft] def manifestEntries(gen: Long): Seq[(String, Seq[String])] = {
    val (fs, p) = fsOf(manifestPath(gen))
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
        finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { line =>
        // Minimal parser for the writer's own fixed shape:
        // {"commit_id":"...","files":["a","b"]}
        val commitId = line.split("\"commit_id\":\"", 2)(1).split("\"", 2)(0)
        val filesPart = line.split("\"files\":\\[", 2)(1).split("\\]", 2)(0)
        val files =
          if (filesPart.isEmpty) Seq.empty[String]
          else filesPart.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        (commitId, files)
      }.toSeq
    }
  }

  private def writeManifest(gen: Long, entries: Seq[(String, Seq[String])]): Unit = {
    val (fs, p) = fsOf(manifestPath(gen))
    fs.mkdirs(p.getParent)
    val json = entries.map { case (id, files) =>
      s"""{"commit_id":${quote(id)},"files":[${files.map(quote).mkString(",")}]}"""
    }.mkString("", "\n", "\n")
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def listDataFiles(dir: String): Seq[String] = {
    val (fs, p) = fsOf(dir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) buf += f.toString
    }
    // Relative to tablePath, so the table survives a root move.
    val prefix = fsOf(tablePath)._2.toUri.getPath
    buf.toSeq.map(f => new Path(f).toUri.getPath.stripPrefix(prefix).stripPrefix("/")).sorted
  }

  /** Write one commit's data files under `dir`, hive-partitioned by
    * `partitionCol` when set (so downstream reads prune on it). */
  private def writeData(df: DataFrame, dir: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(dir)
  }

  // --------------------------------------------------------------- commit

  /** Append `df` as `commitId`. Idempotent: an already-manifested
    * commitId skips (returns false). Crash-safe: the pointer swap is the
    * last step, and a replay after a crash rewrites the same attempt
    * directory in overwrite mode. */
  def commit(df: DataFrame, commitId: String): Boolean = {
    val gen = currentGeneration().getOrElse(0L)
    val entries = manifestEntries(gen)
    if (entries.exists(_._1 == commitId)) return false
    val next = gen + 1
    val dataDir = s"$tablePath/d-$commitId-g$next"
    writeData(df, dataDir)
    val files = listDataFiles(dataDir)
    if (failBeforePublish)
      throw new IllegalStateException(s"injected crash before publish of $commitId")
    writeManifest(next, entries :+ (commitId -> files))
    publish(next)
    true
  }

  /** Replace the WHOLE table with `df` under `commitId` (compaction): new
    * manifest references only the replacement; prior generations' files
    * become invisible immediately and sweepable later. */
  def replaceAll(df: DataFrame, commitId: String): Unit = {
    val next = currentGeneration().getOrElse(0L) + 1
    val dataDir = s"$tablePath/d-$commitId-g$next"
    writeData(df, dataDir)
    val files = listDataFiles(dataDir)
    if (failBeforePublish)
      throw new IllegalStateException(s"injected crash before publish of $commitId")
    writeManifest(next, Seq(commitId -> files))
    publish(next)
  }

  // ----------------------------------------------------------------- read

  /** The table as of the current generation — only manifested files.
    *
    * With `partitionCol` set the data files carry the column only in their
    * `col=value/` directory names. Spark's partition parsing requires the
    * `col=value` segments to sit DIRECTLY under `basePath` (a non-partition
    * commit dir in between raises CONFLICTING_DIRECTORY_STRUCTURES), so
    * each commit directory is scanned with itself as the base and the
    * scans unioned: every branch still gets PartitionFilters, so a
    * predicate on `partitionCol` prunes whole directories exactly like the
    * rename-protocol layout. The union's width is the live commit count,
    * which [[replaceAll]] (compaction) periodically collapses to one —
    * same steady state as Iceberg/Delta manifest compaction. Partition
    * parsing moves the column to the end of the schema — re-select
    * restores the declared order. */
  def read(): DataFrame =
    currentGeneration().map(readAt).getOrElse(emptyDf)

  /** TIME-TRAVEL read: the table exactly as of generation `gen` — every
    * commit the `m-<gen>` manifest references, nothing later. Manifests
    * are never deleted (small metadata), so any historical generation
    * resolves; its DATA remains readable until [[sweepOrphans]] reclaims
    * directories outside its retention window — the same contract as
    * Delta/Iceberg time travel vs VACUUM. Reading a swept generation
    * fails on the missing files rather than returning partial data. */
  def readAt(gen: Long): DataFrame = {
    require(gen >= 0, s"negative generation $gen")
    // A generation that never existed must fail loudly, not read as an
    // empty table: gen 0 is the only legitimately empty generation
    // (pre-first-commit), and manifests are never deleted, so a missing
    // m-<gen> for any other requested generation means the caller's gen is
    // a typo / beyond the pointer — or the metadata dir is damaged.
    if (gen > 0) {
      val (fs, p) = fsOf(manifestPath(gen))
      require(fs.exists(p), s"generation $gen does not exist " +
        s"(current: ${currentGeneration().getOrElse(0L)})")
    }
    val rel = manifestEntries(gen).flatMap(_._2)
    if (rel.isEmpty) emptyDf
    else partitionCol match {
      case None =>
        spark.read.schema(schema).parquet(rel.map(f => s"$tablePath/$f"): _*)
      case Some(_) =>
        rel.groupBy(_.split("/", 2)(0)).toSeq.sortBy(_._1)
          .map { case (commitDir, files) =>
            spark.read
              .option("basePath", s"$tablePath/$commitDir")
              .schema(schema)
              .parquet(files.map(f => s"$tablePath/$f"): _*)
              .select(schema.fieldNames.map(
                org.apache.spark.sql.functions.col).toSeq: _*)
          }
          .reduce(_ unionByName _)
    }
  }

  private def emptyDf: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Delete data directories referenced by no retained manifest
    * generation (crashed attempts, pre-compaction generations older than
    * the retention window). `retainGenerations` = how many trailing
    * generations stay time-travel readable via [[readAt]]; 1 keeps only
    * the current one — the VACUUM/retention trade exactly as in
    * Delta/Iceberg. Safe any time in the single-writer model: a directory
    * outside every retained manifest can never become referenced again
    * (generations only grow). Returns deleted dirs. */
  def sweepOrphans(retainGenerations: Int = 1): Seq[String] = {
    require(retainGenerations >= 1, "must retain at least the current generation")
    val (fs, root) = fsOf(tablePath)
    if (!fs.exists(root)) return Seq.empty
    val live: Set[String] = currentGeneration() match {
      case None => Set.empty
      case Some(gen) =>
        val lo = math.max(0L, gen - (retainGenerations - 1).toLong)
        (lo to gen).flatMap(g =>
          manifestEntries(g).flatMap(_._2).map(_.split("/", 2)(0))).toSet
    }
    val victims = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter { p =>
        p.getName.startsWith("d-") && !live.contains(p.getName)
      }
    victims.foreach(p => fs.delete(p, true))
    victims.map(_.getName).toSeq
  }
}
