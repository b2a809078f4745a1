package graft.app

import org.apache.spark.sql.SparkSession

import graft.index.IndexStore
import graft.model.Turn
import graft.search.Searcher

/** The reference's single-binary CLI, flag for flag (reference:
  * app/main.cpp:14-159, app/CliParser/CliParser.cpp:12-46) — a reference
  * user's command line runs unchanged:
  *
  * {{{
  *   app -i                          # index (scan config_path_to_scan)
  *   app -s                          # interactive search REPL
  *   app --check [-v]                # expensive index check
  *   app -a -i                       # index ALL files (ignore watermark)
  *   app -c -i                       # scan the current directory
  *   app --index_path=/x -i          # any --config_key=value overwrite
  *   app --config_file=/f -i         # explicit config.txt path
  *   app some words here             # one-shot search (count parity)
  * }}}
  *
  * Parser semantics preserved exactly: leading dash args split into
  * options (`-x` / `--word`) and config pairs (`--key=value`); the FIRST
  * non-dash arg ends option parsing and everything after (dashes included)
  * joins the query with single spaces (CliParser.cpp:17-40). Config file
  * defaults to `$HOME/.config/filesystem-full-text-search-indexer/
  * config.txt` (main.cpp:60-74); `-a`/`-c` are config overwrites applied
  * before the action loop; actions run in the order passed; no query and
  * no action prints help (main.cpp:145-147).
  */
object AppMain {

  final case class Cli(options: Seq[String], config: Seq[(String, String)],
      query: String)

  /** Reference CliParser.parse, verbatim semantics. */
  def parseArgs(args: Array[String]): Cli = {
    val opts = Seq.newBuilder[String]
    val cfg = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < args.length && args(i).startsWith("-")) {
      val arg = args(i)
      if (arg.length > 2 && arg(1) == '-') {
        val full = arg.substring(2)
        val eq = full.indexOf('=')
        if (eq >= 0) cfg += (full.substring(0, eq) -> full.substring(eq + 1))
        else opts += full
      } else opts += arg.substring(1)
      i += 1
    }
    Cli(opts.result(), cfg.result(), args.drop(i).mkString(" "))
  }

  /** CLI pairs over the file config — update KNOWN keys only, any value
    * (reference update_value, Config.cpp:26-30: the empty-value skip is
    * file-parsing semantics, not CLI). */
  def applyOverwrites(base: Map[String, String],
      pairs: Seq[(String, String)]): Map[String, String] =
    pairs.foldLeft(base) { case (m, (k, v)) =>
      if (m.contains(k)) m.updated(k, v) else m
    }

  /** The fully-resolved config for a parsed CLI: default/explicit config
    * file, then `--key=value` overwrites, then the `-a` / `-c` option
    * overwrites (main.cpp:81-111). */
  def resolveConfig(cli: Cli,
      home: Option[String] = sys.env.get("HOME"),
      cwd: String = System.getProperty("user.dir")): Map[String, String] = {
    val defaultFile = home.map(
      _ + "/.config/filesystem-full-text-search-indexer/config.txt")
    val file = cli.config.collectFirst { case ("config_file", v) => v }
      .orElse(defaultFile)
    val base = file.map(ConfigFile.read).getOrElse(ConfigFile.defaults)
    val cfg = applyOverwrites(base, cli.config.filter(_._1 != "config_file"))
    val all = cli.options.exists(o => o == "a" || o == "all")
    val cur = cli.options.exists(o =>
      o == "c" || o == "current" || o == "current-dir")
    var out = cfg
    if (all || cur) out = out.updated("config_updated_files_only", "false")
    if (cur) out = out.updated("config_path_to_scan", cwd)
    out
  }

  private def help(): Unit = println(
    """usage: app [OPTIONS] [--config_key=value ...] [SEARCH_QUERY]
      |
      |Options:
      |  -h, --help            Show this help
      |  -i, --index           Index files (config_path_to_scan)
      |  -s, --search          Interactive search
      |  --check               Expensive index integrity check
      |  -v, --verbose         Verbose check output
      |  -a, --all             Index all files regardless of updated status
      |  -c, --current-dir     Scan the current directory
      |  --config_file=/path   Config file (default ~/.config/filesystem-full-text-search-indexer/config.txt)
      |  --config_key=value    Overwrite any config option
      |
      |Examples:
      |  app -i              # Index files
      |  app -s              # Start interactive search
      |  app myquery         # Search for 'myquery'""".stripMargin)

  def main(args: Array[String]): Unit = {
    val cli = parseArgs(args)
    if (args.isEmpty ||
        cli.options.exists(o => o == "help" || o == "h")) {
      help(); return
    }
    val cfg = resolveConfig(cli)
    val indexPath = cfg("index_path")
    val scanPath = cfg("config_path_to_scan")
    val verbose = cli.options.exists(o => o == "v" || o == "verbose")
    val conf = ConfigFile.engineConf(cfg)

    var sparkStarted = false
    lazy val spark: SparkSession = {
      val s = Mains.session("graft-app",
        ConfigFile.int(cfg, "config_threads_to_use").toString)
      s.sparkContext.setLogLevel(ConfigFile.logLevel(cfg))
      sparkStarted = true
      s
    }
    def requirePaths(needScan: Boolean): Boolean = {
      val ok = indexPath.nonEmpty && (!needScan || scanPath.nonEmpty)
      if (!ok) System.err.println(
        "Invalid config. Required options not set. Please set either in " +
          "your config file or using commandline options.")
      ok
    }

    def doIndex(): Unit = if (requirePaths(needScan = true)) {
      import org.apache.spark.sql.functions.col
      val store = new IndexStore(indexPath)
      val full: org.apache.spark.sql.Dataset[Turn] =
        graft.sources.FileCorpus.read(spark, scanPath,
          includeHidden = ConfigFile.bool(cfg, "config_scan_dot_paths"))
      val wm =
        if (ConfigFile.bool(cfg, "config_updated_files_only"))
          store.currentWatermark
        else None
      val corpus = wm.map(t => full.filter(col("ts") > t)).getOrElse(full)
      if (wm.nonEmpty && corpus.isEmpty) {
        println(s"nothing newer than watermark ${wm.orNull}; index unchanged")
        return
      }
      val (meta, _) =
        Mains.indexAndPromote(spark, store, corpus, indexPath, conf)
      println(s"indexed snapshot v${meta.version}: docs=${meta.numDocs} " +
        s"terms=${meta.numTerms}")
    }

    def withSearcher(f: Searcher => Unit): Unit =
      if (requirePaths(needScan = false)) {
        val store = new IndexStore(indexPath)
        if (store.currentVersion.isEmpty)
          System.err.println(s"no index snapshot at $indexPath")
        else {
          val searcher = new Searcher(spark, store, conf)
          try f(searcher) finally searcher.close()
        }
      }

    def countOnce(searcher: Searcher, q: String): Unit = {
      val t0 = System.nanoTime()
      val rows = searcher.searchCount(q).collect()
      Mains.printResults(rows, (System.nanoTime() - t0) / 1e6)
    }

    def doSearch(q: String): Unit = withSearcher(countOnce(_, q))

    def doRepl(): Unit = withSearcher { searcher =>
      searcher.warm()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in))
      var line: String = null
      println("Search\n\nEnter Search Query(Search by pressing ENTER), " +
        "exit by sending 'q' or 'quit':")
      while ({ line = in.readLine(); line != null } &&
          !Set("q", "quit", "exit").contains(line.trim)) {
        if (line.trim.nonEmpty) countOnce(searcher, line.trim)
      }
    }

    def doCheck(): Unit = if (requirePaths(needScan = false)) {
      val store = new IndexStore(indexPath)
      if (store.currentVersion.isEmpty)
        System.err.println(s"no index snapshot at $indexPath")
      else {
        val rows = graft.verify.IndexCheck.run(spark, store).collect()
        if (verbose)
          rows.foreach(r => println(f"${r.getString(0)}%-32s ${r.getLong(1)}"))
        val bad = rows.map(_.getLong(1)).sum
        println(if (bad == 0) "index check: OK"
          else s"index check: $bad violations")
      }
    }

    // action loop in option order (main.cpp:116-141), then the trailing
    // query (main.cpp:145-153)
    var actionUsed = false
    cli.options.foreach {
      case "check" => actionUsed = true; doCheck()
      case "i" | "index" => actionUsed = true; doIndex()
      case "s" | "search" => actionUsed = true; doRepl()
      case _ => ()
    }
    if (cli.query.isEmpty && !actionUsed) help()
    else if (cli.query.nonEmpty) doSearch(cli.query)
    if (sparkStarted) spark.stop()
  }
}
