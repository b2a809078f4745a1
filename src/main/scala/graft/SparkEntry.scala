package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.app.{EntryQueries, OracleSql}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One `queries` entry per implemented operator family (SURVEY.md §2 +
  * the training-data pipeline ops), each with a DuckDB oracle in
  * [[OracleSql]] where SQL-expressible.
  */
object SparkEntry {
  /** Flagship: end-to-end engine run on sf0.001 — build the inverted index
    * over the documents corpus, then BM25 top-10; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EntryQueries.all("q_fts_bm25")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.all
}
