package graft.index

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.Jsonl

/** Snapshot metadata persisted in `meta.json`. */
final case class IndexMeta(
    version: Int,
    numDocs: Long,
    maxDocId: Long,
    totalTokens: Long,
    avgdl: Double,
    numTerms: Long,
    k1: Double,
    b: Double,
    blockSize: Int) {
  def toJson: String = Jsonl.write(Map(
    "version" -> version, "numDocs" -> numDocs, "maxDocId" -> maxDocId,
    "totalTokens" -> totalTokens, "avgdl" -> avgdl, "numTerms" -> numTerms,
    "k1" -> k1, "b" -> b, "blockSize" -> blockSize))
}

object IndexMeta {
  def fromJson(s: String): IndexMeta = {
    val m = Jsonl.parse(s)
    IndexMeta(m("version").toInt, m("numDocs").toLong, m("maxDocId").toLong,
      m("totalTokens").toLong, m("avgdl").toDouble, m("numTerms").toLong,
      m("k1").toDouble, m("b").toDouble, m("blockSize").toInt)
  }
}

/** On-disk index layout and snapshot/commit management.
  *
  * Replaces the reference's 6-file mmap layout + WAL/backup machinery
  * (reference: docs/Disk-Structure.md, app/Index/Index_Transaction.cpp) with
  * immutable versioned snapshots and an atomic commit point:
  *
  * {{{
  *   <root>/CURRENT          -- text "v<N>"; atomically replaced = commit point
  *   <root>/v<N>/meta.json
  *   <root>/v<N>/manifest.jsonl   -- one JSON line per completed stage:
  *                                   lineage (inputs), rows, files, millis
  *   <root>/v<N>/docs/            -- (doc_id, conv_id, turn_idx)
  *   <root>/v<N>/doc_stats/       -- (doc_id, word_count, dl)
  *   <root>/v<N>/postings/letter=?/ -- (term, part, first_doc, last_doc,
  *                                      df, max_tf, bytes)
  *   <root>/v<N>/dict/letter=?/     -- (term, df, parts)
  * }}}
  *
  * The design is the Iceberg-snapshot pattern expressed over plain Parquet
  * (no Iceberg runtime jar ships in this sandbox, SURVEY.md §7.3): writers
  * build `v<N+1>` fully, then flip `CURRENT`. Readers resolve `CURRENT` once.
  * Crash before the flip leaves a partial staging dir that is simply ignored
  * (and resumable — completed stages are recorded in manifest.jsonl, the
  * analog of the reference's transaction WAL restart, Index.cpp:196-218).
  */
final class IndexStore(val root: String) {
  private val rootPath: Path = Paths.get(root)

  def currentVersion: Option[Int] = {
    val cur = rootPath.resolve("CURRENT")
    if (Files.exists(cur))
      Some(Files.readString(cur).trim.stripPrefix("v").toInt)
    else None
  }

  def snapshotDir(v: Int): String = rootPath.resolve(s"v$v").toString
  def currentDir: Option[String] = currentVersion.map(snapshotDir)

  def nextVersion: Int = currentVersion.getOrElse(0) + 1

  /** Atomically flip CURRENT to version v (the commit point). */
  def commit(v: Int): Unit = {
    Files.createDirectories(rootPath)
    val tmp = rootPath.resolve(s".CURRENT.tmp")
    Files.writeString(tmp, s"v$v")
    Files.move(tmp, rootPath.resolve("CURRENT"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def meta(v: Int): IndexMeta =
    IndexMeta.fromJson(Files.readString(Paths.get(snapshotDir(v), "meta.json")))
  def currentMeta: IndexMeta = meta(currentVersion.get)

  def writeMeta(v: Int, m: IndexMeta): Unit =
    Files.writeString(Paths.get(snapshotDir(v), "meta.json"), m.toJson)

  // ---- incremental-scan watermark (reference S4 analog) -----------------
  // The reference marks a temp mtime watermark BEFORE scanning and promotes
  // it after success (app/Index/Index_Last_Updated.cpp:9-78) so mid-scan
  // changes re-index next run. Batch analog: the promoted watermark is the
  // max `ts` actually indexed — anything later re-enters the next batch.

  def writeWatermark(v: Int, maxTs: java.sql.Timestamp): Unit =
    Files.writeString(Paths.get(snapshotDir(v), "watermark"),
      maxTs.toInstant.toString)

  def watermark(v: Int): Option[java.sql.Timestamp] = {
    val p = Paths.get(snapshotDir(v), "watermark")
    if (Files.exists(p))
      Some(java.sql.Timestamp.from(
        java.time.Instant.parse(Files.readString(p).trim)))
    else None
  }

  def currentWatermark: Option[java.sql.Timestamp] =
    currentVersion.flatMap(watermark)

  // ---- stage manifest (checkpoint-resume lineage) ----------------------

  private def manifestPath(v: Int): Path =
    Paths.get(snapshotDir(v), "manifest.jsonl")

  def completedStages(v: Int): Set[String] = {
    val p = manifestPath(v)
    if (!Files.exists(p)) Set.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty).map(l => Jsonl.parse(l)("stage")).toSet
  }

  def recordStage(v: Int, stage: String, rows: Long, millis: Long,
      extra: Map[String, Any] = Map.empty): Unit = {
    Files.createDirectories(Paths.get(snapshotDir(v)))
    val outDir = Paths.get(snapshotDir(v), stage)
    val files =
      if (Files.isDirectory(outDir))
        Files.list(outDir).iterator().asScala.count(p =>
          p.getFileName.toString.endsWith(".parquet"))
      else 0
    val line = Jsonl.write(Map("stage" -> stage, "rows" -> rows,
      "millis" -> millis, "files" -> files,
      "ts" -> java.time.Instant.now.toString) ++ extra)
    Files.writeString(manifestPath(v), line + "\n",
      StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  // ---- table readers ---------------------------------------------------

  def docs(spark: SparkSession): DataFrame =
    spark.read.parquet(s"${currentDir.get}/docs")
  def docStats(spark: SparkSession): DataFrame =
    spark.read.parquet(s"${currentDir.get}/doc_stats")
  def postings(spark: SparkSession): DataFrame =
    spark.read.parquet(s"${currentDir.get}/postings")
  def dict(spark: SparkSession): DataFrame =
    spark.read.parquet(s"${currentDir.get}/dict")
}
