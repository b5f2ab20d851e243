package graft.sources

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8
import java.util.UUID

import scala.util.Try

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Upsert
import graft.operators.Upsert.MergeStats

/** Versioned multi-table snapshot store over plain parquet — the atomic
  * CROSS-TABLE commit the reference gets from loading all four tables in
  * one SQL Server transaction (`/root/reference/etl_sales_analytics.py`
  * main: one connection, commit at the end). A plain-directory warehouse
  * (Upsert.upsertParquet) can only swap tables one at a time, so a crash
  * mid-load leaves the warehouse mutually inconsistent; this layer makes
  * the whole load all-or-nothing.
  *
  * Layout under `root`:
  * {{{
  *   _commits/v0000000001.manifest   // commit log: one file per version
  *   data/<table>/<uuid>/...parquet  // immutable data directories
  * }}}
  * A manifest maps table → relative data dir and is the ONLY commit
  * point: data dirs are invisible until a manifest references them.
  * Publication is `FileSystem.create(path, overwrite = false)` of the
  * next version's manifest — an atomic claim on HDFS and local FS, so
  * two racing committers can't both win a version. Readers walk versions
  * newest-first and take the first COMPLETE manifest (header + footer
  * checksum line), so a torn write from a crashed committer is skipped,
  * not half-read.
  *
  * Scale notes: the manifest is O(tables), never O(data) — commit cost
  * is independent of table size; readers resolve one small file then
  * scan parquet as usual (column pruning and filter pushdown are
  * untouched because the data files are plain parquet). Old versions
  * stay readable (snapshot isolation / time travel) until [[vacuum]].
  */
object Snapshot {

  private val CommitsDir = "_commits"
  private val DataDir = "data"
  private val Header = "GRAFT-SNAPSHOT v1"

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(new Path(root, CommitsDir), f"v$v%010d.manifest")

  private def versionOf(p: Path): Option[Long] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".manifest"))
      Try(n.stripPrefix("v").stripSuffix(".manifest").toLong).toOption
    else None
  }

  /** (version, path) of every commit-log file, newest first — including
    * torn ones (a torn file still occupies its version slot). */
  private def versions(fs: FileSystem, root: String): Seq[(Long, Path)] = {
    val dir = new Path(root, CommitsDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .flatMap(s => versionOf(s.getPath).map(_ -> s.getPath))
      .sortBy(-_._1)
  }

  /** Parse a manifest file; None if torn (missing header or footer, or
    * footer count disagreeing with the entries). */
  private def parseManifest(fs: FileSystem, p: Path): Option[Map[String, String]] = {
    val text =
      try {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, UTF_8.name()).mkString
        finally in.close()
      } catch { case _: IOException => return None }
    val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
    if (lines.isEmpty || lines.head != Header) return None
    val footer = lines.last
    if (!footer.startsWith("END ")) return None
    val entries = lines.tail.init.map(_.split("\t", -1)).collect {
      case Array(t, rel) => t -> rel
    }
    if (Try(footer.stripPrefix("END ").toLong).toOption.contains(entries.size.toLong))
      Some(entries.toMap)
    else None
  }

  /** Newest COMPLETE committed version and its table map. */
  private def current(fs: FileSystem, root: String): Option[(Long, Map[String, String])] =
    versions(fs, root).view
      .flatMap { case (v, p) => parseManifest(fs, p).map(v -> _) }
      .headOption

  /** Newest committed version, if any. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    current(fsOf(spark, root), root).map(_._1)

  /** Table → absolute data path of the newest committed snapshot. */
  def tables(spark: SparkSession, root: String): Map[String, String] =
    current(fsOf(spark, root), root).map(_._2).getOrElse(Map.empty)
      .map { case (t, rel) => t -> new Path(root, rel).toString }

  /** Read one table of the newest committed snapshot. */
  def read(spark: SparkSession, root: String, table: String): DataFrame = {
    val byName = tables(spark, root)
    val path = byName.getOrElse(table,
      throw new IllegalArgumentException(
        s"snapshot: no table '$table' at $root (have: ${byName.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(path)
  }

  /** Table → absolute data path AS OF a specific committed `version`
    * (time travel). Committed versions are immutable — data dirs are
    * write-once and only [[vacuum]] deletes them — so a pinned version
    * keeps reading the same bytes while the snapshot advances.
    * Throws if the version never committed completely or was vacuumed. */
  def tablesAt(spark: SparkSession, root: String, version: Long): Map[String, String] = {
    val fs = fsOf(spark, root)
    val manifest = versions(fs, root)
      .collectFirst { case (v, p) if v == version => p }
      .getOrElse(throw new IllegalArgumentException(
        s"snapshot: no version $version at $root (have: ${
          versions(fs, root).map(_._1).sorted.mkString(", ")})"))
    parseManifest(fs, manifest)
      .getOrElse(throw new IllegalStateException(
        s"snapshot: version $version at $root is torn/incomplete"))
      .map { case (t, rel) => t -> new Path(root, rel).toString }
  }

  /** Read one table as of `version` — how a pipeline pins its input
    * (reproducible ablations, audits, incremental-delta baselines)
    * while writers keep committing. */
  def readAt(spark: SparkSession, root: String, table: String, version: Long): DataFrame = {
    val byName = tablesAt(spark, root, version)
    val path = byName.getOrElse(table,
      throw new IllegalArgumentException(
        s"snapshot: no table '$table' at $root version $version (have: ${
          byName.keys.toSeq.sorted.mkString(", ")})"))
    spark.read.parquet(path)
  }

  /** Atomically publish new contents for `newTables` (other tables keep
    * their current data). Data is written FIRST (invisible), then the
    * manifest claims the next version; a crash anywhere before the claim
    * leaves only unreferenced files. With `expectBase = Some(v)` the
    * commit fails instead of publishing if anyone committed after
    * version v (optimistic concurrency for read-modify-write callers);
    * `None` means blind last-writer-wins on the touched tables. */
  def commit(spark: SparkSession, root: String, newTables: Map[String, DataFrame],
      expectBase: Option[Long] = None): Long = {
    require(newTables.nonEmpty, "snapshot commit: no tables given")
    val fs = fsOf(spark, root)
    val written = newTables.map { case (t, df) => t -> writeData(spark, root, t, df) }
    commitManifest(fs, root, written, expectBase)
  }

  /** MERGE-style upsert of several staged tables in ONE atomic commit —
    * the reference's single-transaction four-table load. Each stage
    * merges against its table in the CURRENT snapshot (same semantics
    * and MergeStats contract as [[Upsert.upsertParquet]], including the
    * stage-unique-on-keys precondition); all merged tables then publish
    * under one version, so readers see the whole load or none of it.
    * Fails without publishing if another writer commits concurrently. */
  def mergeCommit(spark: SparkSession, root: String,
      stages: Map[String, (DataFrame, Seq[String])]): (Long, Map[String, MergeStats]) = {
    require(stages.nonEmpty, "snapshot mergeCommit: no tables given")
    val fs = fsOf(spark, root)
    val base = current(fs, root)
    val baseTables = base.map(_._2).getOrElse(Map.empty)
    val merged = stages.map { case (t, (stage, keys)) =>
      val stageP = stage.persist()
      try {
        val staged = stageP.count()
        Upsert.requireUniqueKeys(stageP, keys, staged)
        val existing = baseTables.get(t)
          .map(rel => spark.read.parquet(new Path(root, rel).toString))
        val before = existing.map(_.count()).getOrElse(0L)
        val out = existing.map(Upsert.upsert(_, stageP, keys)).getOrElse(stageP)
        val rel = writeData(spark, root, t, out)
        val total = spark.read.parquet(new Path(root, rel).toString).count()
        val inserted = total - before
        (t, rel, MergeStats(inserted, staged - inserted, total))
      } finally stageP.unpersist()
    }
    val v = commitManifest(fs, root,
      merged.map { case (t, rel, _) => t -> rel }.toMap,
      expectBase = Some(base.map(_._1).getOrElse(0L)))
    (v, merged.map { case (t, _, s) => t -> s }.toMap)
  }

  /** Drop all but the newest `keepLast` complete versions: older commit
    * files and every data directory no retained version references.
    * Run only while no commit is in flight — an uncommitted writer's
    * data dirs look unreferenced and would be swept. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val fs = fsOf(spark, root)
    val all = versions(fs, root)
    val complete = all.filter { case (_, p) => parseManifest(fs, p).isDefined }
    val kept = complete.take(keepLast).map(_._2).toSet
    val referenced = complete.take(keepLast)
      .flatMap { case (_, p) => parseManifest(fs, p) }
      .flatMap(_.values).toSet
    all.collect { case (_, p) if !kept.contains(p) => fs.delete(p, false) }
    val dataRoot = new Path(root, DataDir)
    if (fs.exists(dataRoot))
      for {
        tableDir <- fs.listStatus(dataRoot).toSeq
        child <- fs.listStatus(tableDir.getPath).toSeq
        rel = s"$DataDir/${tableDir.getPath.getName}/${child.getPath.getName}"
        if !referenced.contains(rel)
      } fs.delete(child.getPath, true)
  }

  /** Write `df` to a fresh immutable data dir; returns the relative path
    * (not yet visible to readers — only a manifest makes it so). */
  private def writeData(spark: SparkSession, root: String, table: String,
      df: DataFrame): String = {
    require(table.nonEmpty && !table.exists(c => c == '/' || c == '\t' || c == '\n'),
      s"snapshot: invalid table name '$table'")
    val rel = s"$DataDir/$table/${UUID.randomUUID().toString}"
    df.write.parquet(new Path(root, rel).toString)
    rel
  }

  /** How long a committer waits for an in-flight claim on its target
    * slot to complete before giving up (overridable for tests). */
  private[graft] var claimWaitMs: Long = 30000L

  /** Claim version baseV+1 with `updates` layered over the newest
    * complete manifest — NEVER a higher slot. Skipping past an occupied
    * slot is the lost-update race: a slow writer holding slot N (file
    * created, body still flushing — it parses as torn) would let us
    * claim N+1 layered over base N-1, permanently shadowing N's tables
    * the moment it completes, even though both commits "succeeded".
    * Claiming ONLY baseV+1 serializes commits on the version number
    * itself: while a claim is in flight we wait for it to complete (our
    * base then advances — `expectBase` callers abort as stale, blind
    * callers retry on the new base). A claim that never completes (its
    * writer crashed) blocks committers until `claimWaitMs`, then this
    * throws — loud, not silent; [[vacuum]] sweeps the dead claim file
    * and unblocks the slot. */
  private def commitManifest(fs: FileSystem, root: String,
      updates: Map[String, String], expectBase: Option[Long]): Long = {
    val deadline = System.currentTimeMillis() + claimWaitMs
    while (true) {
      val base = current(fs, root)
      val baseV = base.map(_._1).getOrElse(0L)
      expectBase.foreach { e =>
        if (baseV != e) throw new IllegalStateException(
          s"snapshot commit conflict at $root: expected base version $e, found $baseV")
      }
      val merged = base.map(_._2).getOrElse(Map.empty) ++ updates
      val next = baseV + 1L
      val target = manifestPath(root, next)
      fs.mkdirs(target.getParent)
      if (fs.exists(target)) {
        // The slot is claimed but not complete (complete would have
        // advanced baseV). Wait for the claimant rather than jumping
        // over it with a stale base.
        if (System.currentTimeMillis() >= deadline) throw new IllegalStateException(
          s"snapshot commit: version slot $next at $root held by an incomplete claim " +
            s"for over ${claimWaitMs}ms — claimant crashed? run vacuum to clear it")
        Thread.sleep(50L)
      } else {
        val claimed =
          try {
            val out = fs.create(target, false)
            try {
              val body = (Header +:
                merged.toSeq.sorted.map { case (t, rel) => s"$t\t$rel" } :+
                s"END ${merged.size}").mkString("\n")
              out.write(body.getBytes(UTF_8))
            } finally out.close()
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case e: IOException if e.getMessage != null &&
              e.getMessage.contains("already exists") => false
          }
        if (claimed) return next
        // Lost the create race for this slot — loop: the winner's commit
        // will advance our base (or show up as the in-flight claim above).
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
