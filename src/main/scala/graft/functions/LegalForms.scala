package graft.functions

import java.util.Locale

/** Legal-entity-form (LEF) term table + stripping.
  *
  * Semantics of the reference's `remove_legal_form` step and LEF features
  * (/root/reference/emm/preprocessing/functions.py:82-91,
  * /root/reference/emm/features/features_lef.py:61-266), which use the public
  * `cleanco` termlist. We embed our own table of well-known international
  * legal-form suffixes (public knowledge) and implement prefix/middle/suffix
  * stripping over normalized tokens.
  */
object LegalForms {

  /** Multi-token terms are space separated; all lower case, no dots. */
  val terms: Seq[String] = Seq(
    // Netherlands / Belgium
    "bv", "b v", "nv", "n v", "vof", "v o f", "cv", "bvba", "vzw", "asbl",
    "sprl", "cvba", "scrl", "comm v", "besloten vennootschap",
    "naamloze vennootschap", "stichting", "vereniging", "coöperatie",
    "cooperatie", "onderlinge waarborgmaatschappij",
    // Germany / Austria / Switzerland
    "gmbh", "g m b h", "ag", "a g", "kg", "kgaa", "ohg", "ug", "e v", "ev",
    "gmbh & co kg", "gmbh & co", "ag & co kg", "gesellschaft mit beschränkter haftung",
    "aktiengesellschaft", "eingetragener verein", "se & co kgaa",
    // UK / US / international english
    "ltd", "limited", "plc", "llc", "l l c", "llp", "lp", "inc", "incorporated",
    "corp", "corporation", "co", "company", "holding", "holdings", "group",
    "public limited company", "limited liability company",
    "limited liability partnership", "limited partnership", "pty", "pty ltd",
    "pte", "pte ltd", "pllc", "pc", "dba",
    // France / Luxembourg
    "sa", "s a", "sarl", "s a r l", "sas", "s a s", "sasu", "sci", "snc",
    "scs", "sca", "eurl", "société anonyme", "societe anonyme",
    "société par actions simplifiée", "societe par actions simplifiee",
    // Italy / Spain / Portugal / Latin America
    "spa", "s p a", "srl", "s r l", "sl", "s l", "slu", "sau", "sociedad anonima",
    "sociedad limitada", "lda", "ltda", "sa de cv", "s de rl", "s de rl de cv",
    "cia", "compania", "companhia",
    // Nordics
    "ab", "a b", "oy", "oyj", "as", "a s", "asa", "aps", "hb", "kb",
    "aktiebolag", "osakeyhtiö", "osakeyhtio", "aktieselskab", "ansvarlig selskap",
    // Poland / Czechia / Hungary / Russia
    "sp z o o", "spzoo", "sp z oo", "sp zoo", "sp k", "ska", "zrt", "kft", "bt", "sro",
    "s r o", "ooo", "oao", "zao", "pao",
    // Japan / China / Korea (romanized)
    "kk", "k k", "kabushiki kaisha", "godo kaisha", "yugen kaisha",
    "co ltd", "company limited",
    // misc
    "ulc", "rt", "ad", "doo", "d o o", "dd", "d d", "ead", "eood", "ood",
    "sdn bhd", "bhd", "tbk", "pt", "jsc", "ojsc", "cjsc", "pjsc", "psc",
    "saog", "saoc", "gie", "vvag", "mbh", "e k", "ek", "eg", "e g",
    "partg", "partg mbb", "kgag", "unltd", "unlimited")

  private val termTokens: Seq[Array[String]] =
    terms.map(_.split(' ')).sortBy(-_.length)
  private val maxLen = termTokens.map(_.length).max
  private val termSet: Set[Seq[String]] = termTokens.map(_.toSeq).toSet

  private def norm(tok: String): String =
    tok.toLowerCase(Locale.ROOT).replaceAll("[.,;:()]+", "")

  /** Longest legal term starting at token position i, or 0 if none. */
  private def matchLen(toks: IndexedSeq[String], i: Int): Int = {
    var k = math.min(maxLen, toks.length - i)
    while (k > 0) {
      if (termSet.contains(toks.slice(i, i + k))) return k
      k -= 1
    }
    0
  }

  /** All LEF terms occurring in the name (normalized), in order. */
  def extract(name: String): Seq[String] = {
    if (name == null) return Nil
    val toks = name.split("\\s+").filter(_.nonEmpty).map(norm).toIndexedSeq
    val out  = scala.collection.mutable.ArrayBuffer.empty[String]
    var i    = 0
    while (i < toks.length) {
      val k = matchLen(toks, i)
      if (k > 0) { out += toks.slice(i, i + k).mkString(" "); i += k }
      else i += 1
    }
    out.toSeq
  }

  /** Strip legal-form terms (prefix, middle and/or suffix) from a name,
    * keeping original casing/spacing of the untouched tokens.
    */
  def removeLegalForm(name: String, prefix: Boolean = true,
                      middle: Boolean = true, suffix: Boolean = true): String = {
    if (name == null) return null
    val raw  = name.split("\\s+").filter(_.nonEmpty)
    val toks = raw.map(norm).toIndexedSeq
    val keep = Array.fill(raw.length)(true)
    // suffix: repeatedly strip trailing terms
    if (suffix) {
      var end = raw.length
      var changed = true
      while (changed && end > 0) {
        changed = false
        var k = math.min(maxLen, end)
        while (k > 0 && !changed) {
          if (end - k >= 0 && termSet.contains(toks.slice(end - k, end))) {
            (end - k until end).foreach(keep(_) = false); end -= k; changed = true
          }
          k -= 1
        }
      }
    }
    // prefix: repeatedly strip leading terms
    if (prefix) {
      var start = 0
      var changed = true
      while (changed && start < raw.length) {
        changed = false
        var k = math.min(maxLen, raw.length - start)
        while (k > 0 && !changed) {
          if (keep.slice(start, start + k).forall(identity) &&
              termSet.contains(toks.slice(start, start + k))) {
            (start until start + k).foreach(keep(_) = false); start += k; changed = true
          }
          k -= 1
        }
      }
    }
    // middle: drop any interior run matching a term
    if (middle) {
      var i = 0
      while (i < raw.length) {
        if (keep(i)) {
          val k = matchLen(toks, i)
          if (k > 0 && (i until i + k).forall(keep(_))) {
            (i until i + k).foreach(keep(_) = false); i += k
          } else i += 1
        } else i += 1
      }
    }
    val res = raw.indices.filter(keep(_)).map(raw(_)).mkString(" ")
    if (res.isEmpty) name else res // never reduce a name to nothing
  }

  sealed trait LefMatch { def label: String }
  case object Identical   extends LefMatch { val label = "identical" }
  case object Partial     extends LefMatch { val label = "partial" }
  case object NoMatch     extends LefMatch { val label = "no_match" }
  case object Lef1Missing extends LefMatch { val label = "lef1_missing" }
  case object Lef2Missing extends LefMatch { val label = "lef2_missing" }
  case object BothMissing extends LefMatch { val label = "both_missing" }

  /** Classify the relation between the LEF sets of two names
    * (reference: features_lef.py:198-266 semantics).
    */
  def matchClass(name1: String, name2: String): String = {
    val l1 = extract(name1).toSet
    val l2 = extract(name2).toSet
    if (l1.isEmpty && l2.isEmpty) BothMissing.label
    else if (l1.isEmpty) Lef1Missing.label
    else if (l2.isEmpty) Lef2Missing.label
    else if (l1 == l2) Identical.label
    else if ((l1 intersect l2).nonEmpty) Partial.label
    else NoMatch.label
  }
}
