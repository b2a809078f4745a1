package graft.tokenize

/** Character folding table replicating the reference's `Helper::convert_char`
  * (reference: app/Helper/Helper.cpp:27-74).
  *
  * Semantics: 'a'-'z' kept; 'A'-'Z' lower-cased; the explicit accent map
  * (Helper.cpp:63-74) folds to its ASCII base letter; every other character
  * becomes the separator '!'.
  *
  * Deviation (documented, SURVEY.md §7.6.6): the reference operates per *byte*
  * with an implementation-defined signed-char map for multibyte literals; we
  * define the cleaner per-*codepoint* semantics — fold the listed codepoints,
  * all other non-ASCII codepoints → separator. Identical on ASCII input.
  */
object CharFold {
  final val Sep: Char = '!'

  // Accent fold pairs exactly as listed in Helper.cpp:63-74.
  private val accents: Map[Char, Char] = Map(
    'ä' -> 'a', 'Ä' -> 'a', 'å' -> 'a', 'Å' -> 'a', 'à' -> 'a', 'À' -> 'a',
    'á' -> 'a', 'Á' -> 'a', 'â' -> 'a', 'Â' -> 'a', 'ã' -> 'a', 'Ã' -> 'a',
    'ö' -> 'o', 'Ö' -> 'o', 'ò' -> 'o', 'Ò' -> 'o', 'ó' -> 'o', 'Ó' -> 'o',
    'ô' -> 'o', 'Ô' -> 'o', 'õ' -> 'o', 'Õ' -> 'o', 'é' -> 'e', 'É' -> 'e',
    'è' -> 'e', 'È' -> 'e', 'ê' -> 'e', 'Ê' -> 'e', 'ë' -> 'e', 'Ë' -> 'e',
    'ü' -> 'u', 'Ü' -> 'u', 'ù' -> 'u', 'Ù' -> 'u', 'ú' -> 'u', 'Ú' -> 'u',
    'û' -> 'u', 'Û' -> 'u', 'ì' -> 'i', 'Ì' -> 'i', 'í' -> 'i', 'Í' -> 'i',
    'î' -> 'i', 'Î' -> 'i', 'ï' -> 'i', 'Ï' -> 'i', 'ñ' -> 'n', 'Ñ' -> 'n',
    'ý' -> 'y', 'Ý' -> 'y', 'ÿ' -> 'y', 'Ÿ' -> 'y', 'ç' -> 'c', 'Ç' -> 'c',
    'ß' -> 's')

  // Dense lookup table for the BMP range that contains all mapped chars.
  private val TableSize = 0x180
  private val table: Array[Char] = {
    val t = new Array[Char](TableSize)
    var i = 0
    while (i < TableSize) {
      val c = i.toChar
      t(i) =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else accents.getOrElse(c, Sep)
      i += 1
    }
    t
  }

  /** Fold one char; anything outside the table range is a separator. */
  @inline def fold(c: Char): Char = if (c < TableSize) table(c) else Sep
}
