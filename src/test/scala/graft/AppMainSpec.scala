package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.app.AppMain

/** The reference single-binary CLI surface (app/main.cpp,
  * app/CliParser/CliParser.cpp): parser and config-resolution semantics,
  * flag for flag. */
class AppMainSpec extends AnyFunSuite {

  test("parser: dash args split into options/config, first non-dash ends them") {
    val cli = AppMain.parseArgs(Array(
      "-i", "--check", "--index_path=/x", "-av", "hello", "-not-an-option",
      "world"))
    assert(cli.options == Seq("i", "check", "av"))
    assert(cli.config == Seq("index_path" -> "/x"))
    // everything after the first non-dash arg joins the query — dashes too
    // (CliParser.cpp:17-18 break, then the join loop)
    assert(cli.query == "hello -not-an-option world")
  }

  test("parser: --word without '=' is an option, value may contain '='") {
    val cli = AppMain.parseArgs(Array("--verbose", "--index_path=/a=b"))
    assert(cli.options == Seq("verbose"))
    assert(cli.config == Seq("index_path" -> "/a=b"))
    assert(cli.query.isEmpty)
  }

  test("config resolution: file, then --key=value, then -a/-c overwrites") {
    val f = Files.createTempFile("graft-app-cfg", ".txt")
    Files.writeString(f,
      "index_path=/from-file\nconfig_updated_files_only=true\n")
    val cli = AppMain.parseArgs(Array(
      s"--config_file=$f", "--index_path=/from-cli", "-a", "-i"))
    val cfg = AppMain.resolveConfig(cli, home = None, cwd = "/here")
    assert(cfg("index_path") == "/from-cli") // CLI beats file
    assert(cfg("config_updated_files_only") == "false") // -a overwrite
    val cli2 = AppMain.parseArgs(Array(s"--config_file=$f", "-c", "-i"))
    val cfg2 = AppMain.resolveConfig(cli2, home = None, cwd = "/here")
    assert(cfg2("config_path_to_scan") == "/here") // -c scans cwd
    assert(cfg2("config_updated_files_only") == "false")
  }

  test("config resolution: unknown CLI keys ignored; empty CLI value sticks") {
    val cli = AppMain.parseArgs(Array("--bogus_key=1", "--index_path=", "-i"))
    val cfg = AppMain.resolveConfig(cli, home = None, cwd = "/")
    assert(!cfg.contains("bogus_key"))
    // CLI update_value sets any value, even empty (Config.cpp:26-30)
    assert(cfg("index_path") == "")
  }

  test("config resolution: default file path under HOME, missing file ok") {
    val cli = AppMain.parseArgs(Array("-i"))
    val cfg = AppMain.resolveConfig(cli, home = Some("/nonexistent-home"),
      cwd = "/")
    assert(cfg == graft.app.ConfigFile.defaults)
  }
}
