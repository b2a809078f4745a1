package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Turn

/** The reference's ACTUAL input surface: a directory tree of text files
  * (reference: app/Indexer/Indexer.cpp:190-215 recursive scan). This source
  * lets a reference user point the Spark engine at the same folder — each
  * file becomes one doc (`conv_id` = path relative to the root, `turn_idx`
  * = 0, `ts` = mtime, so `BuildIndexMain --updated-only` reproduces the
  * reference's mtime-watermark incremental scan, S4).
  *
  * Scan semantics preserved:
  *   - extension allowlist `.txt`/`.md` (S2, Indexer.cpp:47-51);
  *   - hidden paths skipped — any `/.` segment (S3, Indexer.cpp:199-202);
  *   - the `.md` empty-word-set quirk (S6, Indexer.cpp:122-127:
  *     `get_words` returns words only for `.txt`): an `.md` file keeps its
  *     doc row but contributes ZERO tokens (word_count/dl = 0) —
  *     reproduced by blanking its text; disable via `mdEmptyQuirk = false`
  *     to actually index markdown content.
  *
  * Spark shape: the built-in `binaryFile` source (distributed listing +
  * read; at 100 TB the listing parallelizes and files stream per task —
  * no driver materialization).
  */
object FileCorpus {

  def read(spark: SparkSession, dir: String,
      extensions: Seq[String] = Seq(".txt", ".md"),
      includeHidden: Boolean = false,
      mdEmptyQuirk: Boolean = true): Dataset[Turn] = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new org.apache.hadoop.fs.Path(dir)).toString
    val rootPrefix = if (root.endsWith("/")) root else root + "/"
    val extMatch = extensions.map(e => col("path").endsWith(e))
      .reduce(_ || _)
    val base = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .filter(extMatch)
    val visible =
      if (includeHidden) base
      else base.filter(!col("path").contains("/."))
    val emptied =
      if (!mdEmptyQuirk) col("content").cast("string")
      else when(col("path").endsWith(".md"), lit(""))
        .otherwise(col("content").cast("string"))
    visible.select(
        regexp_replace(col("path"), lit(rootPrefix), lit("")).as("conv_id"),
        lit(0).as("turn_idx"),
        lit("file").as("role"),
        emptied.as("text"),
        lit(null).cast("string").as("tool"),
        col("modificationTime").cast("timestamp").as("ts"))
      .as[Turn]
  }
}
