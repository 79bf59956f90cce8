package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextOps}

/**
 * LLM-data-pipeline operator queries (beyond-reference surface per
 * BASELINE.json): dedup, similarity search, text analysis, multimodal.
 * Fact tables come through the Delta scan (RelationalQueries.ensureViews).
 *
 * Oracle notes: DuckDB SQL differs syntactically (list functions) but is
 * validated to produce identical values; float-threshold comparisons are
 * integer-ized (Jaccard) or rounded identically on both sides (cosine).
 * Operators whose oracle would require reimplementing the algorithm in
 * SQL (MinHash/LSH/SimHash/lang-id/fingerprints/multimodal) ship without
 * oracle SQL → driver records rows-only; their correctness is asserted in
 * PipelineSpec against exact baselines instead.
 */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = {
    RelationalQueries.ensureViews(s, dir); s.table("documents")
  }
  private def emb(s: SparkSession, dir: String): DataFrame = {
    RelationalQueries.ensureViews(s, dir); s.table("embeddings")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- text analysis ---
    "text_token_stats" -> ((s, dir) => TextOps.tokenStats(docs(s, dir))),
    "text_bpe_tokens" -> ((s, dir) =>
      docs(s, dir).groupBy(col("lang"))
        .agg(sum(TextOps.subwordCount(col("text"))).as("subtoks"))
        .orderBy(col("lang"))),
    "text_quality" -> ((s, dir) => TextOps.qualityStats(docs(s, dir))),
    "text_langid" -> ((s, dir) =>
      docs(s, dir).groupBy(TextOps.langId(col("text")).as("pred"))
        .agg(count(lit(1)).as("n")).orderBy(col("pred"))),
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.simhash(col("text")).as("sh")).orderBy(col("doc_id"))),

    // --- dedup ---
    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "dedup_exact_norm" -> ((s, dir) => Dedup.exactNormalized(docs(s, dir))),
    "dedup_jaccard_pairs" -> ((s, dir) => Dedup.jaccardPairs(docs(s, dir))),
    "dedup_minhash_pairs" -> ((s, dir) => Dedup.minhashPairs(docs(s, dir))),
    "dedup_simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),

    // --- similarity search ---
    "ann_cosine_topk" -> ((s, dir) => Similarity.bruteForceTopK(emb(s, dir), 0L, 10)),
    "ann_pairs_block" -> ((s, dir) => Similarity.pairsAboveThreshold(emb(s, dir), 200L, 0.25)),
    "ann_lsh_topk" -> ((s, dir) => Similarity.lshTopK(emb(s, dir), 0L, 10)),
    "emb_centroids" -> ((s, dir) => Similarity.centroids(emb(s, dir))),

    // --- near-dup cluster canonicalization (drop-list materialization) ---
    "dedup_canonical" -> ((s, dir) =>
      Dedup.canonicalize(Dedup.jaccardPairs(docs(s, dir)))),
    "emb_near_dup_lsh" -> ((s, dir) =>
      Similarity.lshNearDupPairs(emb(s, dir), minSim = 0.2)),

    // --- multimodal ---
    "multimodal_features" -> ((s, dir) => Multimodal.mediaFeatures(docs(s, dir))))

  val oracleSql: Map[String, String] = Map(
    "text_token_stats" ->
      """SELECT lang, count(*) AS n,
        | sum(len(string_split_regex(trim(text), '\s+'))) AS toks,
        | round(avg(length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / n_chars), 4) AS alpha_ratio
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "text_bpe_tokens" ->
      """SELECT lang,
        | sum(list_sum(list_transform(string_split_regex(trim(text), '\s+'),
        |   w -> cast(ceil(length(w)/4.0) AS BIGINT)))) AS subtoks
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS copies
        |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin,
    "dedup_exact_norm" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS copies
        |FROM documents GROUP BY md5(lower(regexp_replace(text, '\s+', ' ', 'g')))
        |ORDER BY doc_id""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |   SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
        |     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |   FROM toks) raw WHERE s <> ''),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |cand AS (SELECT a.doc_id ia, b.doc_id ib, count(*) inter
        |         FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ia AS id_a, ib AS id_b, inter, sa.sz + sb.sz - inter AS uni
        |FROM cand JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
        |WHERE inter * 7 >= (sa.sz + sb.sz - inter) * 2
        |ORDER BY id_a, id_b""".stripMargin,
    "ann_cosine_topk" ->
      """WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv), 4) AS sim
        |FROM embeddings, q WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "ann_pairs_block" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,
    "emb_centroids" ->
      """SELECT label, i, round(avg(embedding[i]), 4) AS v
        |FROM embeddings, range(1, 65) r(i)
        |GROUP BY label, i ORDER BY label, i""".stripMargin)
}
