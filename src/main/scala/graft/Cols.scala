package graft

/** Normalized internal column vocabulary.
  *
  * Mirrors the convention-named columns of the reference engine
  * (ing-bank/EntityMatchingModel: emm/parameters.py:31-73,
  * emm/helper/util.py:34-60): user column names are free and renamed to this
  * fixed vocabulary at the API edge.
  */
object Cols {
  val Name         = "name"
  val Preprocessed = "preprocessed"
  val Uid          = "uid"
  val EntityId     = "entity_id"
  val Country      = "country"
  val Account      = "account"
  val Freq         = "counterparty_account_count_distinct"

  val GtUid          = "gt_uid"
  val GtEntityId     = "gt_entity_id"
  val GtName         = "gt_name"
  val GtPreprocessed = "gt_preprocessed"
  val GtCountry      = "gt_country"

  val NmScore   = "nm_score"
  val BestRank  = "best_rank"
  val BestMatch = "best_match"
  val AggScore  = "agg_score"

  def score(i: Int): String = s"score_$i"
  def rank(i: Int): String  = s"rank_$i"

  /** gt_-prefixed counterpart of a ground-truth column carried onto pairs. */
  def gt(c: String): String = s"gt_$c"
}
