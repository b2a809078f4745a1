package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.app.ConfigFile

/** The reference config.txt surface (C4, app/Config/Config.cpp:14-106):
  * known keys only, silent bad-line skip, verbatim values, reference
  * defaults. */
class ConfigFileSpec extends AnyFunSuite {

  test("parse: known keys override defaults, everything else skipped silently") {
    val cfg = ConfigFile.parse(Seq(
      "config_exact_match=true",          // known -> set
      "config_min_char_for_match=6",      // known int -> set
      "unknown_key=whatever",             // unknown -> skipped
      "no equals sign here",              // no '=' -> skipped
      "config_threads_to_use=",           // empty value -> skipped (getline fails)
      "index_path=/idx/a=b",              // value keeps its own '='
      "",                                 // blank -> skipped
      " config_exact_match=false"))       // leading space: unknown key, skipped
    assert(cfg("config_exact_match") == "true")
    assert(cfg("config_min_char_for_match") == "6")
    assert(cfg("config_threads_to_use") == "1") // default survives empty value
    assert(cfg("index_path") == "/idx/a=b")
    assert(!cfg.contains("unknown_key"))
    // untouched keys keep reference defaults
    assert(cfg("config_updated_files_only") == "true")
    assert(cfg("config_local_index_memory") == "50000")
  }

  test("engineConf mapping + non-integer fallback") {
    val good = ConfigFile.parse(Seq("config_exact_match=true",
      "config_min_char_for_match=7", "config_local_index_memory=1234"))
    val ec = ConfigFile.engineConf(good)
    assert(ec.exactMatch && ec.minCharForMatch == 7 &&
      ec.maxPostingsPerPart == 1234)
    val bad = ConfigFile.parse(Seq("config_min_char_for_match=abc"))
    assert(ConfigFile.engineConf(bad).minCharForMatch == 4) // default, not crash
  }

  test("missing file yields defaults; real file round-trips") {
    assert(ConfigFile.read("/nonexistent/config.txt") == ConfigFile.defaults)
    val p = Files.createTempFile("graft-config", ".txt")
    Files.writeString(p, "config_exact_match=true\nbadline\nindex_path=/x\n")
    val cfg = ConfigFile.read(p.toString)
    assert(cfg("config_exact_match") == "true" && cfg("index_path") == "/x")
  }

  test("log level mapping") {
    def lv(s: String) =
      ConfigFile.logLevel(ConfigFile.parse(Seq(s"config_min_log_level=$s")))
    assert(lv("1") == "INFO" && lv("2") == "WARN" && lv("3") == "ERROR")
  }

  private def writeCfg(lines: String*): String = {
    val p = Files.createTempFile("graft-cli-cfg", ".txt")
    Files.writeString(p, lines.mkString("\n") + "\n")
    p.toString
  }

  test("BuildIndexMain resolution: config-only invocation, CLI overrides") {
    import graft.app.BuildIndexMain
    val cfg = writeCfg("index_path=/idx", "config_path_to_scan=/corpus",
      "config_threads_to_use=8", "config_scan_dot_paths=true",
      "config_local_index_memory=4096")
    // the reference's config-driven run: no positionals at all
    val r = BuildIndexMain.resolve(Array(s"--config=$cfg"), envCpus = "4")
      .toOption.get
    assert(r.indexDir == "/idx" && r.src == "fs:/corpus")
    assert(r.updatedOnly) // reference default config_updated_files_only=true
    assert(r.cpus == "8" && r.includeHidden)
    assert(r.engineConf.maxPostingsPerPart == 4096)
    assert(r.logLevel.contains("ERROR")) // reference default min level 3
    // CLI positionals override the file
    val r2 = BuildIndexMain
      .resolve(Array("/other", "gen:10", s"--config=$cfg"), "4").toOption.get
    assert(r2.indexDir == "/other" && r2.src == "gen:10")
    // no config: CLI behavior unchanged (no watermark scan by default)
    val r3 = BuildIndexMain.resolve(Array("/i", "gen:5"), "4").toOption.get
    assert(!r3.updatedOnly && r3.cpus == "4" && r3.logLevel.isEmpty)
    // neither CLI nor config supplies the required paths -> usage error
    assert(BuildIndexMain.resolve(Array(s"--config=/nonexistent"), "4").isLeft)
    assert(BuildIndexMain.resolve(Array("/only-index"), "4").isLeft)
  }

  test("SearchMain resolution: config exact/min-char with CLI override") {
    import graft.app.SearchMain
    val cfg = writeCfg("index_path=/idx", "config_exact_match=true",
      "config_min_char_for_match=6")
    val r = SearchMain.resolve(Array("hello", s"--config=$cfg")).toOption.get
    assert(r.indexDir == "/idx" && r.query == "hello")
    assert(r.conf.exactMatch && r.conf.minCharForMatch == 6)
    // CLI flag overrides the file value
    val r2 = SearchMain
      .resolve(Array("/d", "q", "--min-char=2", s"--config=$cfg")).toOption.get
    assert(r2.indexDir == "/d" && r2.conf.minCharForMatch == 2)
    assert(SearchMain.resolve(Array("justquery")).isLeft) // no index anywhere
  }
}
