package graft.verify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.index.{Codec, IndexStore}

/** Structural index validation — the Spark analog of the reference's
  * `--check` / `Index::expensive_index_check` (reference:
  * app/Index/Index_Check.cpp:12-385, docs/Index-Checks.md): a handful of
  * aggregations/joins over the snapshot tables instead of a sequential
  * byte-structure walk. Each check returns its violation count; a healthy
  * snapshot returns all zeros.
  *
  * Checks (reference analog in parens):
  *   - docs: unique doc_id, unique (conv_id, turn_idx), ids dense 0..max
  *     (paths separators consistency / no duplicate IDs)
  *   - doc_stats: exactly one row per doc; dl >= word_count >= 0
  *     (counts file size = 4 x paths)
  *   - dict: terms lowercase a-z within the tokenizer's length bounds;
  *     unique; df > 0 (words sorted, chars in range)
  *   - postings: part doc ranges well-formed and non-overlapping per term,
  *     part numbering contiguous (reversed/additional chain well-formedness)
  *   - postings decode: stored df / max_tf / first_doc / last_doc match the
  *     decoded payload; doc ids strictly increasing (no 0-gaps, no dups)
  *   - referential: every posting doc range within [0, max doc_id]; every
  *     dict term has parts and vice versa (no additional block referenced
  *     twice / IDs in range)
  */
object IndexCheck {

  /** Run all checks on the current snapshot; returns (check, violations). */
  def run(spark: SparkSession, store: IndexStore): DataFrame = {
    import spark.implicits._
    val docs = store.docs(spark)
    val stats = store.docStats(spark)
    val dict = store.dict(spark)
    val posts = store.postings(spark)
    val meta = store.currentMeta

    def cnt(name: String, df: DataFrame): (String, Long) = (name, df.count())

    val dupDocIds = docs.groupBy($"doc_id").count().filter($"count" > 1)
    val dupDocKeys = docs.groupBy($"conv_id", $"turn_idx").count()
      .filter($"count" > 1)
    val dense = {
      val (n, mx) = docs.agg(count(lit(1)), max($"doc_id"))
        .as[(Long, Long)].head()
      if (n == mx + 1) 0L else 1L
    }

    val statsJoin = docs.join(stats, Seq("doc_id"), "full_outer")
      .filter($"conv_id".isNull || $"word_count".isNull)
    val statsBad = stats.filter($"word_count" < 0 || $"dl" < $"word_count")

    val dictBadTerm = dict.filter(
      !$"term".rlike("^[a-z]+$") || length($"term") < 4 || length($"term") > 19)
    val dictDup = dict.groupBy($"term").count().filter($"count" > 1)
    val dictBadDf = dict.filter($"df" <= 0)

    val partW = Window.partitionBy($"term").orderBy($"part")
    val partsOrdered = posts
      .withColumn("prev_last", lag($"last_doc", 1).over(partW))
      .withColumn("rn", row_number().over(partW) - 1)
    val partOverlap = partsOrdered.filter(
      $"first_doc" > $"last_doc" ||
      ($"prev_last".isNotNull && $"prev_last" >= $"first_doc"))
    val partNumbering = partsOrdered.filter($"part" =!= $"rn")

    val decodeBad = posts.select($"term", $"part", $"first_doc", $"last_doc",
        $"df", $"max_tf", $"bytes")
      .as[(String, Int, Long, Long, Long, Int, Array[Byte])]
      .flatMap { case (term, part, fd, ld, df, maxTf, bytes) =>
        val ps = Codec.decodeAll(bytes)
        val increasing = ps.length < 2 ||
          ps.sliding(2).forall(w => w(0).docId < w(1).docId)
        val ok = ps.nonEmpty && increasing &&
          ps.length.toLong == df && ps.head.docId == fd &&
          ps.last.docId == ld && ps.map(_.tf).max == maxTf &&
          ps.forall(p => p.tf > 0 && p.dl >= 0)
        if (ok) None else Some((term, part))
      }

    val docRange = posts.filter($"first_doc" < 0 || $"last_doc" > meta.maxDocId)
    val dictNoParts = dict.join(posts.select($"term").distinct(),
      Seq("term"), "left_anti")
    val partsNoDict = posts.select($"term").distinct()
      .join(dict.select($"term"), Seq("term"), "left_anti")
    val dfMismatch = posts.groupBy($"term").agg(sum($"df").as("pdf"))
      .join(dict.select($"term", $"df"), Seq("term"))
      .filter($"pdf" =!= $"df")

    val results = Seq(
      cnt("docs_duplicate_ids", dupDocIds),
      cnt("docs_duplicate_keys", dupDocKeys),
      ("docs_ids_dense", dense),
      cnt("doc_stats_missing_or_orphan", statsJoin),
      cnt("doc_stats_bounds", statsBad),
      cnt("dict_term_charset_or_length", dictBadTerm),
      cnt("dict_duplicate_terms", dictDup),
      cnt("dict_nonpositive_df", dictBadDf),
      cnt("postings_part_range_overlap", partOverlap),
      cnt("postings_part_numbering", partNumbering),
      ("postings_decode_mismatch", decodeBad.count()),
      cnt("postings_doc_range", docRange),
      cnt("dict_without_parts", dictNoParts),
      cnt("parts_without_dict", partsNoDict),
      cnt("dict_df_vs_parts_df", dfMismatch))
    spark.createDataset(results).toDF("check_name", "violations")
  }

  /** True iff every check passes. */
  def healthy(spark: SparkSession, store: IndexStore): Boolean = {
    import spark.implicits._
    run(spark, store).filter($"violations" > 0).count() == 0
  }

  /** Check names in report order (shared with the driver oracle). */
  val CheckNames: Seq[String] = Seq(
    "docs_duplicate_ids", "docs_duplicate_keys", "docs_ids_dense",
    "doc_stats_missing_or_orphan", "doc_stats_bounds",
    "dict_term_charset_or_length", "dict_duplicate_terms",
    "dict_nonpositive_df", "postings_part_range_overlap",
    "postings_part_numbering", "postings_decode_mismatch",
    "postings_doc_range", "dict_without_parts", "parts_without_dict",
    "dict_df_vs_parts_df")
}
