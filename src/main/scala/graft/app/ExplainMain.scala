package graft.app

import org.apache.spark.sql.SparkSession

/** Plan inspection: prints `explain("formatted")` for selected catalog
  * queries plus the search-path plans, to audit pushdown / pruning /
  * broadcast / codegen spans.
  *
  * Usage: ExplainMain [sfDir] [queryName ...]  (default: the audit set)
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_agg_pushdown", "q_filter_scan", "q_join_broadcast",
        "q_join_agg", "q_fts_dict", "q_fts_search_count", "q_sim_ann_brute",
        "q_dedup_minhash", "q_dedup_spans", "q_dedup_spans_inc",
        "q_dedup_survivors", "q_text_perplexity", "q_fts_fuzzy",
        "q_fts_snippet", "q_fts_mlt", "q_sim_ann_pq", "q_fts_slop_bool",
        "q_fts_facets", "q_fts_del_count", "q_fts_del_bm25",
        "q_fts_boost_bm25", "q_fts_syn_count", "q_fts_spell",
        "q_fts_asof_count", "q_fts_asof_bm25", "q_fts_batch_count",
        "q_fts_batch_bm25", "q_fts_page2", "q_fts_explain",
        "q_fts_dict_stats", "q_fts_percolate")
    val spark = Mains.session("graft-explain")
    names.foreach { n =>
      EntryQueries.all.get(n) match {
        case Some(fn) =>
          println(s"\n================ $n ================")
          fn(spark, sfDir).explain("formatted")
        case None => System.err.println(s"unknown query: $n")
      }
    }
    // layered-read audit: a dictionary prefix lookup against the MERGED
    // (two-layer) snapshot must still show letter= partition pruning and a
    // pushed StartsWith in every layer's scan
    println(s"\n================ merged dict prefix lookup ================")
    import org.apache.spark.sql.functions.{col, substring}
    val mergedStore = new graft.index.IndexStore(
      EntryQueries.indexDirMerged(spark, sfDir))
    mergedStore.dict(spark)
      .filter(col("letter") === "s" && col("term").startsWith("strea"))
      .explain("formatted")
    spark.stop()
  }
}
