package graft.queries

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators over `documents` /
  * `embeddings`: dedup family (d1–d5), similarity search (s1–s3),
  * text analysis (t1–t4), multimodal plumbing (m1).
  *
  * Thresholds are data-aware: the synthetic corpus has a ~31-token
  * vocabulary (token-set Jaccard is high everywhere, so near-dup means
  * >= 0.95) and uniformly random embeddings (max pairwise cosine
  * ~0.5, so "near-dup" means >= 0.4).
  *
  * Oracle float convention: cosine is written out explicitly as
  * `dot/(sqrt(dot_aa)*sqrt(dot_bb))` over `DOUBLE[]` casts so DuckDB
  * evaluates the same double-precision expression tree as the Spark
  * side (its native list_cosine_similarity is float32).
  */
object PipelineQueries {

  private val cosSql =
    """ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""

  val all: Seq[Q] = Seq(

    Q("d1_dedup_exact",
      (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
             |CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    Q("d2_dedup_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text", 0.95)
        .orderBy("a", "b"),
      Some("""WITH tok AS (SELECT DISTINCT doc_id, t.tok FROM documents,
             |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
             |sz AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
             |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n
             |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT i AS a, j AS b,
             |  round(n / CAST(sa.c + sb.c - n AS DOUBLE), 4) AS jaccard
             |FROM inter JOIN sz sa ON sa.doc_id = i JOIN sz sb ON sb.doc_id = j
             |WHERE n / CAST(sa.c + sb.c - n AS DOUBLE) >= 0.95
             |ORDER BY 1, 2""".stripMargin)),

    Q("d3_dedup_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.95).orderBy("a", "b"),
      None),

    Q("d4_dedup_simhash",
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3).orderBy("a", "b"),
      None),

    Q("d5_dedup_embedding",
      (s, d) => Dedup.embeddingCosinePairs(Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("a", "b"),
      Some(s"""WITH $cosSql,
              |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
              |  list_dot_product(a.v, b.v)
              |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
              |  FROM ce a JOIN ce b ON a.vec_id < b.vec_id)
              |SELECT a, b, round(cos, 4) AS cosine FROM p WHERE cos >= 0.4
              |ORDER BY a, b""".stripMargin)),

    Q("s1_knn_brute",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnBrute(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
              |sc AS (SELECT qid, c.vec_id AS cid,
              |  list_dot_product(qv, c.v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM q JOIN ce c ON c.vec_id <> qid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("s2_knn_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnLsh(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      None),

    Q("s3_knn_ivf",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvf(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      None),

    Q("t1_token_stats",
      (s, d) => TextAnalysis.tokenStats(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
             |CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_word_tokens,
             |round(length(regexp_replace(text, '[^a-z0-9]', '', 'g'))
             |  / CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS DOUBLE), 4) AS avg_word_len
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("t2_quality_score",
      (s, d) => TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextAnalysis.qualityScoreSql + "\nORDER BY doc_id")),

    Q("t3_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      None),

    Q("t4_fingerprint",
      (s, d) => TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "fp"),
      None),

    Q("t5_bigrams",
      (s, d) => Tables.documents(s, d)
        .select(expr("filter(split(text, ' '), x -> x != '')").as("toks"))
        .select(explode(expr(
          "transform(sequence(1, greatest(size(toks)-1, 0)), i -> concat(element_at(toks, i), ' ', element_at(toks, i+1)))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 10)
        .orderBy("bigram"),
      Some("""SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM (
             |  SELECT s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT)+1] AS bigram FROM (
             |    SELECT s, unnest(generate_series(1, greatest(len(s)-1, 0))) AS i FROM (
             |      SELECT list_filter(string_split(text, ' '), x -> x <> '') AS s
             |      FROM documents)))
             |GROUP BY 1 HAVING count(*) >= 10 ORDER BY 1""".stripMargin)),

    Q("smp1_hash_sample",
      // deterministic multiplicative-hash Bernoulli sample (~7%):
      // reproducible across engines/runs, no RNG state, pushes to scan
      (s, d) => Tables.lineitem(s, d)
        .filter(expr("(l_orderkey * 2654435761 + l_linenumber) % 100 < 7"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct("l_orderkey").as("n_orders"),
          round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS cnt,
             |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             |round(sum(l_quantity),2) AS sum_qty FROM lineitem
             |WHERE (l_orderkey * 2654435761 + l_linenumber) % 100 < 7""".stripMargin)),

    Q("smp2_stratified_sample",
      // per-stratum deterministic rates: downsample the dominant
      // language, keep the rest — the corpus-rebalancing primitive
      (s, d) => Tables.documents(s, d)
        .filter(expr(
          "(doc_id * 2654435761) % 97 < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"), min("doc_id").as("first_id"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
             |CAST(min(doc_id) AS BIGINT) AS first_id FROM documents
             |WHERE (doc_id * 2654435761) % 97 < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("m1_binary_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          expr("CASE WHEN ascii(substring(CAST(payload AS STRING), 1, 1)) % 3 = 0 THEN 'img' " +
            "WHEN ascii(substring(CAST(payload AS STRING), 1, 1)) % 3 = 1 THEN 'audio' ELSE 'video' END").as("fmt"),
          ((length(col("payload")) % 64) * 16).cast("long").as("width"),
          ((length(col("payload")) % 48) * 9).cast("long").as("height"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             |CASE WHEN ascii(substr(text, 1, 1)) % 3 = 0 THEN 'img'
             |  WHEN ascii(substr(text, 1, 1)) % 3 = 1 THEN 'audio' ELSE 'video' END AS fmt,
             |CAST((octet_length(encode(text)) % 64) * 16 AS BIGINT) AS width,
             |CAST((octet_length(encode(text)) % 48) * 9 AS BIGINT) AS height
             |FROM documents ORDER BY doc_id""".stripMargin))
  )
}
