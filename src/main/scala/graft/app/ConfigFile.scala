package graft.app

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.model.EngineConf

/** The reference's `key=value` config-file surface (C4, reference:
  * app/Config/Config.cpp:14-106), so a reference user's `config.txt`
  * carries over unchanged:
  *
  *   - only the reference's known keys are accepted; unknown keys, lines
  *     without `=`, and lines with an empty value are SILENTLY skipped
  *     (Config.cpp:42-51 — `update_value` ignores unknown keys, the
  *     stream getline pair skips malformed lines);
  *   - a missing file is not an error (config may come from the CLI,
  *     Config.cpp:35-38);
  *   - CLI flags override file values (Config.cpp:94-97 applies
  *     `overwrites` after `read_config`);
  *   - when a config file is used, the REFERENCE defaults apply for keys
  *     it doesn't set (e.g. `config_updated_files_only` defaults TRUE,
  *     `config_threads_to_use` 1) — full parity over our CLI defaults.
  *
  * Key mapping to the Spark engine (n/a keys accepted and ignored so a
  * carried-over file never errors):
  *
  *   - `index_path`                 → index directory
  *   - `config_path_to_scan`        → the `fs:` corpus root
  *   - `config_scan_dot_paths`      → include hidden paths (S3)
  *   - `config_updated_files_only`  → mtime-watermark incremental scan (S4)
  *   - `config_exact_match`         → [[EngineConf.exactMatch]]
  *   - `config_min_char_for_match`  → [[EngineConf.minCharForMatch]]
  *   - `config_threads_to_use`      → `local[N]` parallelism (the
  *     reference's indexer thread count; on a cluster: executor count)
  *   - `config_local_index_memory`  → [[EngineConf.maxPostingsPerPart]]
  *     (both bound the in-memory posting run between flushes — approximate
  *     unit parity: the reference counts words per thread-local index,
  *     Indexer.cpp:246-250)
  *   - `config_min_log_level`       → session log level (1=INFO 2=WARN
  *     3=ERROR)
  *   - `lock_acquisition_timeout`   → n/a (immutable snapshots need no
  *     lock; accepted, ignored)
  *
  * Deviation (documented): a non-integer value for an int key falls back
  * to its default with a stderr warning instead of the reference's
  * all-or-nothing catch (Config.cpp:66-81) — per-key recovery beats
  * silently dropping every other valid setting.
  */
object ConfigFile {

  /** Reference defaults, key-for-key (app/Config/Config.cpp:14-24). */
  val defaults: Map[String, String] = Map(
    "index_path" -> "",
    "lock_acquisition_timeout" -> "30",
    "config_scan_dot_paths" -> "false",
    "config_path_to_scan" -> "",
    "config_updated_files_only" -> "true",
    "config_threads_to_use" -> "1",
    "config_local_index_memory" -> "50000",
    "config_min_log_level" -> "3",
    "config_exact_match" -> "false",
    "config_min_char_for_match" -> "4")

  /** Parse config lines: known `key=value` pairs over the defaults;
    * everything else silently skipped (reference semantics — values are
    * verbatim, no trimming). */
  def parse(lines: Iterable[String]): Map[String, String] =
    lines.foldLeft(defaults) { (m, line) =>
      line.split("=", 2) match {
        case Array(k, v) if m.contains(k) && v.nonEmpty => m.updated(k, v)
        case _ => m
      }
    }

  /** Read a config file; a missing file yields the defaults. */
  def read(path: String): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) defaults
    else parse(Files.readAllLines(p).asScala.toSeq)
  }

  def int(cfg: Map[String, String], key: String): Int =
    cfg(key).toIntOption.getOrElse {
      System.err.println(
        s"config: non-integer value '${cfg(key)}' for $key; using default " +
          defaults(key))
      defaults(key).toInt
    }

  def bool(cfg: Map[String, String], key: String): Boolean = cfg(key) == "true"

  /** EngineConf view of a parsed config. */
  def engineConf(cfg: Map[String, String]): EngineConf =
    EngineConf.default.copy(
      exactMatch = bool(cfg, "config_exact_match"),
      minCharForMatch = int(cfg, "config_min_char_for_match"),
      maxPostingsPerPart = math.max(1, int(cfg, "config_local_index_memory")))

  def logLevel(cfg: Map[String, String]): String =
    int(cfg, "config_min_log_level") match {
      case n if n <= 1 => "INFO"
      case 2 => "WARN"
      case _ => "ERROR"
    }

  /** `--config=<file>` from an arg list. */
  def fromArgs(args: Array[String]): Option[Map[String, String]] =
    args.collectFirst { case s if s.startsWith("--config=") =>
      read(s.stripPrefix("--config=")) }
}
