package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window passage chunker — the retrieval/RAG splitter a
  * training-data platform runs between curation and indexing: each
  * document becomes overlapping word windows of `size` words every
  * `stride` words. Declared semantics: window starts are 0, stride,
  * 2·stride, … while start < n_words (the tail window may be shorter,
  * never empty; a doc with fewer than `size` words yields exactly one
  * window — itself). Tokenization is the house `split(trim(text), " ")`
  * so every engine replays the exact same word positions; null texts
  * drop.
  *
  * Map-only: one `transform(sequence(...))` + posexplode per doc — no
  * shuffle, no state; output cardinality ≈ n_words/stride per doc. The
  * companion passage-level dedup (q391) hashes these windows with md5
  * (portable across engines — the q232 CDC convention) rather than
  * xxhash64, so the oracle can replay fingerprints byte-for-byte.
  */
object Passages {

  def windows(docs: DataFrame, idCol: String, textCol: String,
              winSize: Int, stride: Int): DataFrame = {
    require(winSize >= 1 && stride >= 1,
      "window size and stride must be positive, got " +
        s"size=$winSize stride=$stride")
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        split(trim(col(textCol)), " ").as("__ws"))
      .select(col("doc_id"), col("__ws"),
        posexplode(expr(
          s"""transform(sequence(0, CAST((size(__ws) - 1) div $stride AS INT)),
              k -> slice(__ws, k * $stride + 1, $winSize))"""))
          .as(Seq("win_idx", "__seg")))
      .select(col("doc_id"), col("win_idx").cast("long").as("win_idx"),
        array_join(col("__seg"), " ").as("passage"),
        size(col("__seg")).cast("long").as("n_words"))
  }
}
