package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.data.Dedup
import graft.multimodal.BinaryMedia

/** Training-data-pipeline operators: near-dup detection (exact jaccard,
  * MinHash LSH, SimHash), embedding similarity search, multimodal columns.
  * Probabilistic/hash-dependent outputs (MinHash, SimHash, LSH buckets) have
  * no SQL oracle -> rows-only driver check; the exact operators have full
  * DuckDB oracles.
  */
object DataQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(s, dir, name)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact word-5-gram jaccard near-dup pairs (full oracle)
    "q40_ngram_jaccard_pairs" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "text", "doc_id",
        k = 5, threshold = 0.5)
    },

    // MinHash+LSH banding near-dup, verified by exact shingle jaccard
    "q41_minhash_lsh_pairs" -> { (s, dir) =>
      Dedup.minHashLshPairs(t(s, dir, "documents"), "text", "doc_id",
        k = 5, numHashes = 32, rowsPerBand = 4, threshold = 0.5)
    },

    // SimHash near-dup candidates at hamming distance <= 3
    "q42_simhash_pairs" -> { (s, dir) =>
      Dedup.simHashPairs(t(s, dir, "documents"), "text", "doc_id", maxHamming = 3)
    },

    // brute-force cosine top-k over the embeddings table (full oracle)
    "q43_ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Knn.bruteForceTopK(emb.filter(col("vec_id") < 100), emb, k = 5)
    },

    // random-hyperplane LSH bucketed near-dup over embeddings
    "q44_ann_lsh_pairs" -> { (s, dir) =>
      Knn.lshCosinePairs(t(s, dir, "embeddings"), nBits = 6, minCosine = 0.35)
    },

    // multimodal: binary payload + metadata struct (oracle on byte stats)
    "q45_media_stats" -> { (s, dir) =>
      val media = BinaryMedia.attach(t(s, dir, "documents"), "doc_id", "text", "text/plain")
      media.select(
        col("media_id"),
        length(col("media")).cast("int").as("n_bytes"),
        col("meta.format").as("format"),
        col("meta.width").as("width"))
    },

    // multimodal: stubbed decode -> feature vector (plumbing; rows-only)
    "q46_media_features" -> { (s, dir) =>
      val media = BinaryMedia.attach(t(s, dir, "documents"), "doc_id", "text")
      BinaryMedia.extractFeatures(media)
        .select(col("media_id"), col("n_bytes"),
                size(col("features")).as("feat_dim"))
    })

  val oracleSql: Map[String, String] = Map(
    "q40_ngram_jaccard_pairs" ->
      """WITH words AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
         sh AS (
           SELECT doc_id, unnest(list_distinct(
             CASE WHEN len(ws) >= 5
                  THEN [array_to_string(ws[i:i+4], ' ') for i in range(1, len(ws) - 3)]
                  ELSE [array_to_string(ws, ' ')] END)) AS s
           FROM words),
         sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, CAST(n_common AS BIGINT) AS n_common,
                CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) AS jaccard
         FROM common
         JOIN sizes sa ON sa.doc_id = id_a
         JOIN sizes sb ON sb.doc_id = id_b
         WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5""",
    "q43_ann_bruteforce" ->
      """SELECT query_id, target_id, cosine, rank FROM (
           SELECT q.vec_id AS query_id, t.vec_id AS target_id,
                  round(list_cosine_similarity(q.embedding::DOUBLE[], t.embedding::DOUBLE[]), 9) AS cosine,
                  CAST(row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], t.embedding::DOUBLE[]), 9) DESC,
                                t.vec_id) AS INT) AS rank
           FROM embeddings q CROSS JOIN embeddings t
           WHERE q.vec_id < 100)
         WHERE rank <= 5""",
    "q45_media_stats" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         'text/plain' AS format,
         CAST(octet_length(encode(text)) % 640 AS INT) AS width
         FROM documents""")
}
