package graft.util

import scala.collection.immutable.ListMap

/** Minimal flat-JSON read/write for meta/manifest files — values are strings,
  * numbers or booleans only (no nesting). Dependency-free on purpose: the
  * only JSON this engine persists is small key/value metadata.
  */
object Jsonl {

  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def write(m: Map[String, Any]): String =
    m.map { case (k, v) =>
      val vs = v match {
        case s: String => "\"" + esc(s) + "\""
        case b: Boolean => b.toString
        case n: Double => if (n == n.floor && !n.isInfinite) n.toLong.toString else n.toString
        case other => other.toString
      }
      "\"" + esc(k) + "\": " + vs
    }.mkString("{", ", ", "}")

  /** Parse a flat JSON object (as produced by [[write]]). */
  def parse(s: String): Map[String, String] = {
    var m = ListMap.empty[String, String]
    var i = s.indexOf('{') + 1
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb += '\n'; case 'r' => sb += '\r'; case 't' => sb += '\t'
            case 'u' => sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar; i += 4
            case c => sb += c
          }
        } else sb += s.charAt(i)
        i += 1
      }
      i += 1
      sb.toString
    }
    skipWs()
    while (i < n && s.charAt(i) != '}') {
      skipWs()
      if (s.charAt(i) == ',') { i += 1; skipWs() }
      if (i < n && s.charAt(i) == '"') {
        val k = readString()
        skipWs(); require(s.charAt(i) == ':'); i += 1; skipWs()
        val v = if (s.charAt(i) == '"') readString() else {
          val start = i
          while (i < n && !",}".contains(s.charAt(i))) i += 1
          s.substring(start, i).trim
        }
        m += (k -> v)
      } else i += 1
      skipWs()
    }
    m
  }
}
