package graft.app

import org.apache.spark.sql.SparkSession

import graft.fixtures.TranscriptGen
import graft.index.{IndexBuilder, IndexStore}
import graft.model.EngineConf
import graft.search.Searcher

/** CLI entry points (the analog of the reference's `app -i` / `app "query"`
  * modes, reference: app/main.cpp:42-159). */
object Mains {
  def session(appName: String, cpus: String =
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Build (or incrementally merge into) an index.
  *
  * Usage: BuildIndexMain <indexDir> <corpusParquetDir | gen:<nConvs>> */
object BuildIndexMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: BuildIndexMain <indexDir> <corpusParquet|gen:N>")
      sys.exit(2)
    }
    val Array(indexDir, src) = args.take(2)
    val spark = Mains.session("graft-build")
    import spark.implicits._
    val corpus =
      if (src.startsWith("gen:"))
        TranscriptGen.dataset(spark, src.stripPrefix("gen:").toLong,
          partitions = spark.sparkContext.defaultParallelism)
      else spark.read.parquet(src).as[graft.model.Turn]
    val store = new IndexStore(indexDir)
    val meta =
      if (store.currentVersion.isEmpty)
        IndexBuilder.build(spark, corpus, indexDir)
      else graft.index.IndexMerger.merge(spark, corpus, indexDir)
    println(s"built snapshot v${meta.version}: docs=${meta.numDocs} " +
      s"terms=${meta.numTerms} avgdl=${f"${meta.avgdl}%.3f"}")
    spark.stop()
  }
}

/** Structural integrity check (the reference's `app --check`,
  * app/main.cpp:118-122). Exit 0 iff healthy; prints per-check violations.
  *
  * Usage: CheckIndexMain <indexDir> */
object CheckIndexMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 1) {
      System.err.println("usage: CheckIndexMain <indexDir>"); sys.exit(2)
    }
    val spark = Mains.session("graft-check")
    val store = new IndexStore(args(0))
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at ${args(0)}")
      spark.stop(); sys.exit(1)
    }
    val rows = graft.verify.IndexCheck.run(spark, store).collect()
    rows.foreach(r => println(f"${r.getString(0)}%-32s ${r.getLong(1)}"))
    val bad = rows.map(_.getLong(1)).sum
    println(if (bad == 0) "index check: OK" else s"index check: $bad violations")
    spark.stop()
    if (bad != 0) sys.exit(1)
  }
}

/** Search an index.
  *
  * Usage: SearchMain <indexDir> <query> [--mode=count|bm25] [--k=10] */
object SearchMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: SearchMain <indexDir> <query> [--mode=count|bm25] [--k=10]")
      sys.exit(2)
    }
    val indexDir = args(0)
    val query = args(1)
    val mode = args.collectFirst { case s if s.startsWith("--mode=") =>
      s.stripPrefix("--mode=") }.getOrElse("count")
    val k = args.collectFirst { case s if s.startsWith("--k=") =>
      s.stripPrefix("--k=").toInt }.getOrElse(10)
    val spark = Mains.session("graft-search")
    val store = new IndexStore(indexDir)
    if (store.currentVersion.isEmpty) {
      System.err.println(s"no index snapshot at $indexDir")
      spark.stop(); sys.exit(1)
    }
    val searcher = new Searcher(spark, store)
    val rows = mode match {
      case "bm25" => searcher.searchBm25(query, k).collect()
      case _ => searcher.searchCount(query).collect()
    }
    println(s"\nSearch Results (${rows.length}):")
    rows.zipWithIndex.foreach { case (r, i) =>
      println(s" $i. ${r.get(0)}:${r.get(1)} -> ${r.get(2)}")
    }
    spark.stop()
  }
}
