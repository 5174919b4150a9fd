package graft.functions

import java.text.Normalizer

/** Accent stripping / best-effort ASCII transliteration.
  *
  * Semantics of the reference's `strip_accents_unicode` step
  * (/root/reference/emm/preprocessing/functions.py:53, which wraps the
  * `unidecode` package): map accented latin characters to their ASCII base
  * form, plus a transliteration table for common non-latin scripts.
  *
  * Implementation is NFKD normalization + combining-mark removal + an explicit
  * substitution table for characters NFKD cannot decompose (ligatures, stroked
  * letters, Greek / Cyrillic romanization).
  */
object AsciiFold {

  private val direct: Map[Char, String] = {
    val latin = Map(
      'ß' -> "ss", 'ẞ' -> "SS", 'æ' -> "ae", 'Æ' -> "AE", 'œ' -> "oe",
      'Œ' -> "OE", 'ø' -> "o", 'Ø' -> "O", 'đ' -> "d", 'Đ' -> "D",
      'ð' -> "d", 'Ð' -> "D", 'þ' -> "th", 'Þ' -> "TH", 'ł' -> "l",
      'Ł' -> "L", 'ħ' -> "h", 'Ħ' -> "H", 'ı' -> "i", 'ĸ' -> "k",
      'ŋ' -> "ng", 'Ŋ' -> "NG", 'ŧ' -> "t", 'Ŧ' -> "T", '©' -> "(c)",
      '®' -> "(r)", '€' -> "EUR", '£' -> "PS", '¥' -> "Y=", '·' -> "*",
      '«' -> "<<", '»' -> ">>", '„' -> ",,", '‚' -> ",", '’' -> "'",
      '‘' -> "'", '“' -> "\"", '”' -> "\"", '–' -> "-", '—' -> "--",
      '…' -> "...", '°' -> "deg", '±' -> "+-", '×' -> "x", '÷' -> "/",
      '¼' -> " 1/4", '½' -> " 1/2", '¾' -> " 3/4", '¡' -> "!", '¿' -> "?")
    val greekLower = Map(
      'α' -> "a", 'β' -> "b", 'γ' -> "g", 'δ' -> "d", 'ε' -> "e",
      'ζ' -> "z", 'η' -> "e", 'θ' -> "th", 'ι' -> "i", 'κ' -> "k",
      'λ' -> "l", 'μ' -> "m", 'ν' -> "n", 'ξ' -> "x", 'ο' -> "o",
      'π' -> "p", 'ρ' -> "r", 'σ' -> "s", 'ς' -> "s", 'τ' -> "t",
      'υ' -> "u", 'φ' -> "ph", 'χ' -> "kh", 'ψ' -> "ps", 'ω' -> "o")
    val greekUpper = Map(
      'Α' -> "A", 'Β' -> "B", 'Γ' -> "G", 'Δ' -> "D", 'Ε' -> "E",
      'Ζ' -> "Z", 'Η' -> "E", 'Θ' -> "Th", 'Ι' -> "I", 'Κ' -> "K",
      'Λ' -> "L", 'Μ' -> "M", 'Ν' -> "N", 'Ξ' -> "X", 'Ο' -> "O",
      'Π' -> "P", 'Ρ' -> "R", 'Σ' -> "S", 'Τ' -> "T", 'Υ' -> "U",
      'Φ' -> "Ph", 'Χ' -> "Kh", 'Ψ' -> "Ps", 'Ω' -> "O")
    val cyrLower = Map(
      'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
      'е' -> "e", 'ё' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i",
      'й' -> "i", 'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n",
      'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t",
      'у' -> "u", 'ф' -> "f", 'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch",
      'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
      'э' -> "e", 'ю' -> "iu", 'я' -> "ia")
    val cyrUpper = cyrLower.map { case (k, v) =>
      Character.toUpperCase(k) -> v.capitalize
    }
    latin ++ greekLower ++ greekUpper ++ cyrLower ++ cyrUpper
  }

  def fold(s: String): String = {
    if (s == null) return null
    val nfkd = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb   = new java.lang.StringBuilder(nfkd.length)
    var i    = 0
    while (i < nfkd.length) {
      val c = nfkd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) {
        direct.get(c) match {
          case Some(rep)        => sb.append(rep)
          case None if c < 128  => sb.append(c)
          case None             =>
            // unidecode drops characters it cannot transliterate; keep other
            // printable BMP chars only if they're ASCII after case fold
            ()
        }
      }
      i += 1
    }
    sb.toString
  }
}
