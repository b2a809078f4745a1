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
  *     to actually index markdown content;
  *   - filename tokenization (T3, Indexer.cpp:92-111): a `.txt` file's
  *     FILENAME words join its word set (interior rule 5-14; the filename's
  *     trailing token gets the final rule 4-19 — always `txt` here, len 3,
  *     so never kept), so `networking` finds `networking-guide.txt` even
  *     when the body never says it. Carried by appending
  *     [[graft.tokenize.Tokenizer.FileEnd]] + basename to the body text:
  *     the marker finalizes the body's last token with its own end-of-file
  *     rule first, exactly the reference's two independent streams. Under
  *     the quirk `.md` contributes no filename words either (get_words
  *     short-circuits before the utf8 path); with `mdEmptyQuirk = false`
  *     (our extension that indexes markdown) the filename applies too.
  *     tf semantics (our extension — the reference keeps a SET): a filename
  *     occurrence counts like a body occurrence (tf/dl +1); the distinct
  *     word set is identical to the reference's union either way.
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
    // body + FileEnd + basename: the marker preserves the body-final token's
    // end-of-file rule while the filename words tokenize as their own stream
    val fname = substring_index(col("path"), "/", -1)
    val withName = concat(col("content").cast("string"),
      lit(graft.tokenize.Tokenizer.FileEnd.toString), fname)
    val emptied =
      if (!mdEmptyQuirk) withName
      else when(col("path").endsWith(".md"), lit(""))
        .otherwise(withName)
    visible.select(
        // positional strip (not a regex): the root may contain regex
        // metacharacters, and the prefix must strip at position 0 only
        col("path").substr(lit(rootPrefix.length + 1), length(col("path")))
          .as("conv_id"),
        lit(0).as("turn_idx"),
        lit("file").as("role"),
        emptied.as("text"),
        lit(null).cast("string").as("tool"),
        col("modificationTime").cast("timestamp").as("ts"))
      .as[Turn]
  }
}
