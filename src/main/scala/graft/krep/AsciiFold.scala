package graft.krep

/** Byte-wise ASCII-only case folding.
  *
  * Mirrors the reference's 256-entry `lower_table` built with C-locale
  * `tolower` (reference: krep.c:124-134): only bytes 'A'..'Z' fold; all other
  * bytes (including multi-byte UTF-8 sequences) pass through unchanged. This
  * is deliberately NOT UTF-8-aware `lower()` — the reference compares bytes.
  */
object AsciiFold {
  /** lower_table[b & 0xFF] == folded byte. */
  val table: Array[Byte] = {
    val t = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      t(i) = if (i >= 'A'.toInt && i <= 'Z'.toInt) (i + 32).toByte else i.toByte
      i += 1
    }
    t
  }

  @inline def fold(b: Byte): Byte = table(b & 0xff)

  def foldBytes(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = table(bytes(i) & 0xff); i += 1 }
    out
  }

  /** Word-character class of the reference (`is_word_char`, krep.h:298-303):
    * [A-Za-z0-9_]. Defines both whole-word boundaries and token boundaries.
    */
  @inline def isWordByte(b: Byte): Boolean = {
    val c = b & 0xff
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
    (c >= '0' && c <= '9') || c == '_'
  }
}
