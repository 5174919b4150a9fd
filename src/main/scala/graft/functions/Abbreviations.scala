package graft.functions

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Abbreviation normalization.
  *
  * Semantics of the reference's abbreviation handling
  * (/root/reference/emm/preprocessing/abbreviation_util.py:31-139): map all
  * spelled-out initialisms to one merged form so "B. V." == "B.V." == "B V"
  * == "BV", and detect abbreviation/open-form relations between name pairs.
  * Re-implemented on java.util.regex with UNICODE_CHARACTER_CLASS so `\w`
  * matches like Python's unicode-aware `\w`.
  */
object Abbreviations {
  private val U = Pattern.UNICODE_CHARACTER_CLASS

  // at least three lower-case chars anywhere => name is not FULL-UPPER
  private val NotFullUpper = Pattern.compile(".*[a-z].*[a-z].*[a-z].*", U)
  // run of >=2 capitals (FC Barcelona -> FC)
  private val AbbrFinderUpper = Pattern.compile("([A-Z]{2,})", U)
  // CamelCase merged word pieces (PetroBras)
  private val AbbrFinderCamel = Pattern.compile("(?:[A-Z][a-z]+){2,}", U)
  // one-char words separated by spaces and/or dots: "A B C", "A. B. C.", "A.B.C."
  private val AbbrFinderPunc = Pattern.compile(
    "(?:^|\\s)(" +
      "(?:(?:\\w\\s)+(?:\\w(?=\\s|$)))|" +
      "(?:(?:\\w\\.\\s)+(?:\\w(?=\\s|$)|\\w\\.))|" +
      "(?:(?:\\w\\.)+(?:\\w(?=\\s|$)|\\w\\.)))",
    U)
  private val AbbrFinderPunc2 = Pattern.compile(
    "(?:^|\\s)((?:\\w(?:\\.\\s|$|\\s|\\.))+|(?:\\w+(?:\\.\\s|$|\\.))+)", U)
  private val Separator  = Pattern.compile("(\\s|\\.)", U)
  private val Separator2 = Pattern.compile("(\\s|\\.)+", U)
  private val EndMarker  = Pattern.compile("<END_MARKER> ?")
  private val CamelPiece = Pattern.compile("[A-Z][a-z]+", U)

  private def findAll(p: Pattern, s: String): ArrayBuffer[String] = {
    val out = ArrayBuffer.empty[String]
    val m   = p.matcher(s)
    while (m.find()) out += (if (m.groupCount() >= 1) m.group(1) else m.group())
    out
  }

  /** "B. V." / "B.V" / "B V" -> "BV"; other text untouched. */
  def abbreviationsToWords(name: String): String = {
    if (name == null) return null
    var n = name + " "
    for (abbr <- findAll(AbbrFinderPunc, n + " ")) {
      val merged = Separator.matcher(abbr).replaceAll("") + "<END_MARKER>"
      n = n.replace(abbr, merged)
    }
    EndMarker.matcher(n).replaceAll(" ").trim
  }

  private val legalFormAbbrs: Set[String] = Set(
    "bv", "nv", "vof",                                   // Netherlands
    "bvba", "vzw", "asbl", "vog", "snc", "scs", "sca",
    "sa", "sprl", "cvba", "scrl",                        // Belgium
    "gmbh", "kgaa", "ag", "ohg",                         // Germany
    "ska", "spzoo",                                      // Poland
    "plc")                                               // UK/US

  /** Merge only known legal-form abbreviations ("B. V." -> "BV"). */
  def legalAbbreviationsToWords(name: String): String = {
    if (name == null) return null
    var n = name
    for (abbr <- findAll(AbbrFinderPunc2, n)) {
      val merged = Separator2.matcher(abbr).replaceAll("")
      if (legalFormAbbrs.contains(merged)) n = n.replace(abbr, merged)
    }
    n
  }

  /** Abbreviations present in `name` as merged initials (FC, BV, ...). */
  def findAbbrMergedInitials(name: String): Seq[String] = {
    val padded = name + " "
    val out    = ArrayBuffer.empty[String]
    if (NotFullUpper.matcher(padded).matches())
      out ++= findAll(AbbrFinderUpper, padded)
    for (abbr <- findAll(AbbrFinderPunc, padded + " "))
      out += Separator.matcher(abbr).replaceAll("")
    out.toSeq
  }

  /** Abbreviations present as CamelCase merged word pieces (PetroBras). */
  def findAbbrMergedWordPieces(name: String): Seq[String] =
    findAll(AbbrFinderCamel, name).toSeq

  private def containsInitialsOpenForm(abbr: String, name: String): Boolean = {
    val sb = new StringBuilder("\\b")
    abbr.toLowerCase.foreach(c => sb.append(Pattern.quote(c.toString)).append("\\w+\\s?"))
    Pattern.compile(sb.toString, U).matcher(name.toLowerCase).find()
  }

  private def containsWordPiecesOpenForm(abbr: String, name: String): Boolean = {
    val words = findAll(CamelPiece, abbr)
    val sb    = new StringBuilder
    words.foreach(w => sb.append(Pattern.quote(w.toLowerCase)).append("\\w*\\s?"))
    Pattern.compile(sb.toString, U).matcher(name.toLowerCase).find()
  }

  /** Does `open` contain an open form of an abbreviation found in `abbr`?
    * ("SK", "Fenerbahce Spor Klubu") -> true.
    */
  def abbrMatch(abbr: String, open: String): Boolean = {
    if (abbr == null || open == null) return false
    findAbbrMergedInitials(abbr).exists(containsInitialsOpenForm(_, open)) ||
    findAbbrMergedWordPieces(abbr).exists(containsWordPiecesOpenForm(_, open))
  }
}
