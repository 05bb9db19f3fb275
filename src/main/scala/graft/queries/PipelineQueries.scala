package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.operators.{Corpus, Dedup, Multimodal, Quantiles, Retrieval, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators over `documents` /
  * `embeddings`: dedup family (d1–d6), similarity search (s1–s3),
  * text analysis (t1–t5), sampling (smp1–2), multimodal plumbing (m1).
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
  *
  * Oracle hash convention: every sketch (MinHash slots, SimHash bits,
  * LSH hyperplanes) derives from `md5` hex digits, so the DuckDB
  * oracles rebuild the identical signatures in plain SQL and the LSH
  * pipelines are verified end-to-end — candidates, buckets, and
  * rerank — not rows-only.
  */
object PipelineQueries {

  private val cosSql =
    """ce AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""

  private val tokSql =
    """tok AS (SELECT DISTINCT doc_id, t.tok FROM documents,
      |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> '')""".stripMargin

  /** Unrolled Luhn sum over the first `n` digits of `c` (a column name
    * or lambda variable), doubling at odd 1-based positions — the
    * 16-digit card layout. Pure ANSI (substr/CAST/CASE), parsed
    * identically by Spark and DuckDB, usable inside array lambdas on
    * both (t7's card validator). */
  private def luhnSum(c: String, n: Int): String =
    (1 to n).map { p =>
      val d = s"CAST(substr($c, $p, 1) AS INT)"
      if (p % 2 == 1) s"(CASE WHEN 2 * $d > 9 THEN 2 * $d - 9 ELSE 2 * $d END)"
      else d
    }.mkString("(", " + ", ")")

  /** Integer-BM25 lexical ranking CTE chain (s18/s17b): replays
    * [[graft.operators.Retrieval.bm25TopK]]'s exact arithmetic —
    * idf surrogate (N·10⁴ div df), ×10A-scaled BM25 term, 90% df
    * cutoff, impact-ordered per-token cap 16 (row_number over the
    * same (term DESC, doc ASC) total order TopKAgg keeps), query =
    * docs 0–4, self excluded. Final ranking in CTE `lexr`. */
  private val bm25LexSql =
    """binst AS (SELECT doc_id, t.tok FROM documents,
      |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
      |btf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM binst GROUP BY 1, 2),
      |bdl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM binst GROUP BY 1),
      |bdf AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM btf GROUP BY 1),
      |bglob AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS a FROM binst),
      |bsc AS (SELECT btf.tok, btf.doc_id,
      |    (((n * 10000) // df) * tf * 22 * a) // (10 * a * tf + 3 * a + 9 * dl * n) AS st
      |  FROM btf JOIN bdl USING (doc_id) JOIN bdf ON bdf.tok = btf.tok CROSS JOIN bglob
      |  WHERE df * 100 <= n * 90),
      |bcap AS (SELECT tok, doc_id, st FROM (SELECT tok, doc_id, st,
      |    row_number() OVER (PARTITION BY tok ORDER BY st DESC, doc_id) AS prk FROM bsc)
      |  WHERE prk <= 16),
      |bqt AS (SELECT DISTINCT doc_id AS qid, tok FROM binst WHERE doc_id < 5),
      |bcd AS (SELECT qid, bcap.doc_id AS cid, CAST(sum(st) AS BIGINT) AS score
      |  FROM bqt JOIN bcap USING (tok) WHERE bcap.doc_id <> qid GROUP BY 1, 2),
      |lexr AS (SELECT qid, cid, score,
      |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rk FROM bcd)""".stripMargin

  /** `k` unrolled greedy MMR selections (s20's oracle): expects `cand`
    * (qid, cid, rel, cv) and `sims` (qid, a, b, sim) CTEs; defines
    * p1..pK (per-step picks) and `mmr_out` (their union). λ in tenths:
    * mmr = lam·rel − (10−lam)·max-sim-to-selected, ties by cid. */
  private def mmrStepsSql(k: Int, lam: Int): String = {
    val mu = 10 - lam
    val steps = (1 to k).map { j =>
      if (j == 1)
        s"""p1 AS (SELECT qid, cid, 1 AS rk, $lam * rel AS mmr FROM (
           |  SELECT qid, cid, rel,
           |    row_number() OVER (PARTITION BY qid ORDER BY $lam * rel DESC, cid) AS rn
           |  FROM cand) WHERE rn = 1),
           |msel1 AS (SELECT qid, cid FROM p1)""".stripMargin
      else
        s"""av$j AS (SELECT c.qid, c.cid, c.rel FROM cand c
           |  LEFT JOIN msel${j - 1} s ON s.qid = c.qid AND s.cid = c.cid
           |  WHERE s.cid IS NULL),
           |mx$j AS (SELECT sims.qid, sims.a AS cid, max(sims.sim) AS msim
           |  FROM sims JOIN msel${j - 1} s ON s.qid = sims.qid AND s.cid = sims.b
           |  GROUP BY 1, 2),
           |p$j AS (SELECT qid, cid, $j AS rk, mmr FROM (
           |  SELECT a.qid, a.cid, $lam * a.rel - $mu * coalesce(m.msim, 0) AS mmr,
           |    row_number() OVER (PARTITION BY a.qid
           |      ORDER BY $lam * a.rel - $mu * coalesce(m.msim, 0) DESC, a.cid) AS rn
           |  FROM av$j a LEFT JOIN mx$j m ON m.qid = a.qid AND m.cid = a.cid)
           |  WHERE rn = 1),
           |msel$j AS (SELECT qid, cid FROM msel${j - 1}
           |  UNION ALL SELECT qid, cid FROM p$j)""".stripMargin
    }.mkString(",\n")
    val un = (1 to k).map(j => s"SELECT qid, cid, rk, mmr FROM p$j")
      .mkString(" UNION ALL ")
    s"$steps,\nmmr_out AS ($un)"
  }

  /** Non-distinct variant: one row per token INSTANCE. */
  private val tokAllSql =
    """tokall AS (SELECT doc_id, t.tok FROM documents,
      |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> '')""".stripMargin

  /** First 8 hex digits of md5(tok) parsed positionally into a BIGINT
    * (the minhash base hash; mirrors Spark's `conv(substr(md5(tok),
    * 1, 8), 16, 10)`). */
  private def baseHashSqlOf(e: String): String =
    (0 until 8).map { m =>
      s"(strpos('0123456789abcdef', substr(md5($e), ${m + 1}, 1)) - 1) * ${1L << (4 * (7 - m))}"
    }.mkString("(", " + ", ")")

  private val baseHashSql: String = baseHashSqlOf("tok")

  /** House base hash of the doc id itself (split assignment). */
  private val docIdBaseHashSql: String = baseHashSqlOf("CAST(doc_id AS VARCHAR)")

  /** VALUES list of the affine minhash coefficients — generated from
    * the SAME arrays the Spark operator uses (Dedup.minhashCoeffs). */
  private val minhashCoeffSql: String = {
    val (ca, cb) = Dedup.minhashCoeffs(64)
    (0 until 64).map(i => s"(${i}, ${ca(i)}, ${cb(i)})").mkString(", ")
  }

  /** Shared CTE chain rebuilding the MinHash-LSH near-dup DOC pairs
    * end-to-end (signatures, banding, candidates, true-Jaccard) —
    * terminal CTE `prs(a, b, jac)` carries the UNROUNDED jaccard of
    * every band-colliding pair. d3 selects the thresholded pairs;
    * d11 runs connected components over them. */
  private val minhashPairsSql: String =
    s"""$tokSql,
       |sz AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
       |th AS (SELECT DISTINCT tok, ($baseHashSql) % ${Dedup.MinhashP} AS h FROM tok),
       |co AS (SELECT * FROM (VALUES $minhashCoeffSql) AS co(i, ca, cb)),
       |mh AS (SELECT t.doc_id, co.i,
       |    min((co.ca * th.h + co.cb) % ${Dedup.MinhashP}) AS mh
       |  FROM tok t JOIN th ON th.tok = t.tok, co GROUP BY 1, 2),
       |sig AS (SELECT doc_id, i // 4 AS band,
       |    string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS sig
       |  FROM mh GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
       |  FROM sig x JOIN sig y
       |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS n
       |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |prs AS (SELECT c.i AS a, c.j AS b,
       |    n / CAST(sa.c + sb.c - n AS DOUBLE) AS jac
       |  FROM cand c JOIN inter ON inter.i = c.i AND inter.j = c.j
       |  JOIN sz sa ON sa.doc_id = c.i JOIN sz sb ON sb.doc_id = c.j)""".stripMargin

  /** Connected components over the thresholded pair graph, as 8
    * unrolled (edge-relax + double pointer-jump) rounds ending in
    * `cc(node, component)` — covers component diameters far beyond
    * any tested corpus, and an unconverged label would FAIL the
    * compare visibly (differ from Spark's true closure), never pass
    * silently. A naive recursive min-label walk is O(Σ c²) rows on
    * clique-heavy near-dup graphs (one 2057-doc cluster at sf0.1
    * made it intractable); MATERIALIZED pins every multi-referenced
    * CTE so DuckDB can't re-inline the whole upstream minhash
    * pipeline per reference. */
  /** Unrolled connected-components rounds over an `e2(x, y)`
    * symmetric edge CTE the caller must define: l0 seed, `n` rounds
    * of edge-relax + double pointer-jump, terminal `cc(node,
    * component)`. Shared by d11/d12 (minhash pair graph) and s6
    * (embedding epsilon graph). */
  private def ccFromE2Sql(n: Int): String = {
    val rounds = (1 to n).map { k =>
      val prev = if (k == 1) "l0" else s"l${k - 1}"
      s"""r$k AS MATERIALIZED (SELECT a.node, least(a.lbl, min(b.lbl)) AS lbl
         |  FROM $prev a JOIN e2 ON e2.x = a.node JOIN $prev b ON b.node = e2.y
         |  GROUP BY a.node, a.lbl),
         |ja$k AS MATERIALIZED (SELECT a.node, coalesce(b.lbl, a.lbl) AS lbl
         |  FROM r$k a LEFT JOIN r$k b ON b.node = a.lbl),
         |l$k AS MATERIALIZED (SELECT a.node, coalesce(b.lbl, a.lbl) AS lbl
         |  FROM ja$k a LEFT JOIN ja$k b ON b.node = a.lbl)""".stripMargin
    }.mkString(",\n")
    s"""l0 AS MATERIALIZED (SELECT x AS node, least(x, min(y)) AS lbl
       |  FROM e2 GROUP BY 1),
       |$rounds,
       |cc AS (SELECT node, lbl AS component FROM l$n)""".stripMargin
  }

  private val fuzzyCcSql: String =
    s"""pr AS MATERIALIZED (SELECT a, b FROM prs WHERE jac >= 0.95),
       |e2 AS MATERIALIZED (SELECT a AS x, b AS y FROM pr
       |  UNION SELECT b, a FROM pr),
       |${ccFromE2Sql(8)}""".stripMargin

  // Full ANN-tier oracle SQL extracted to vals so the recall
  // matrix (s9b) can compose every deployed tier's EXACT replay
  // as nested subqueries against the brute-truth arms.
  private val s1OracleSql: String =
    s"""WITH $cosSql,
                  |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
                  |sc AS (SELECT qid, c.vec_id AS cid,
                  |  list_dot_product(qv, c.v)
                  |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
                  |  FROM q JOIN ce c ON c.vec_id <> qid),
                  |r AS (SELECT qid, cid, cos,
                  |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s2OracleSql: String =
    s"""WITH $cosSql,
                  |comp AS (SELECT t, p, i,
                  |    ((strpos('0123456789abcdef',
                  |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
                  |      - 7.5) / 8 AS c
                  |  FROM (SELECT unnest(generate_series(0, 3)) AS t) ts,
                  |       (SELECT unnest(generate_series(0, 7)) AS p) ps,
                  |       (SELECT unnest(generate_series(0, 63)) AS i) is1),
                  |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
                  |sb AS (SELECT ce.vec_id, planes.t,
                  |    CASE WHEN list_dot_product(ce.v, planes.pl) >= 0
                  |         THEN (1::BIGINT << p) ELSE 0 END AS bit
                  |  FROM ce, planes),
                  |bk AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sb GROUP BY 1, 2),
                  |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                  |  FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
                  |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
                  |sc AS (SELECT qid, cid,
                  |  list_dot_product(qv.v, cv.v)
                  |    / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos,
                  |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s5OracleSql: String =
    s"""WITH $cosSql,
                  |pqc AS (SELECT mr.m, cr.c, ir.i,
                  |    ((strpos('0123456789abcdef',
                  |        substr(md5('pq_' || CAST(mr.m AS VARCHAR) || '_' || CAST(cr.c AS VARCHAR) || '_' || CAST(ir.i AS VARCHAR)), 1, 1)) - 1)
                  |      - 7.5) / 8 AS comp
                  |  FROM (SELECT unnest(generate_series(0, 7)) AS m) mr,
                  |       (SELECT unnest(generate_series(0, 15)) AS c) cr,
                  |       (SELECT unnest(generate_series(0, 7)) AS i) ir),
                  |cb AS (SELECT m, c, list(comp ORDER BY i) AS cl FROM pqc GROUP BY 1, 2),
                  |sb AS (SELECT vec_id, mr.m, v[mr.m*8+1 : mr.m*8+8] AS sv
                  |  FROM ce, (SELECT unnest(generate_series(0, 7)) AS m) mr),
                  |dist AS (SELECT vec_id, sb.m, cb.c,
                  |    -2 * list_dot_product(sv, cl) + list_dot_product(cl, cl) AS d
                  |  FROM sb JOIN cb ON cb.m = sb.m),
                  |codes AS (SELECT vec_id, m, c AS code FROM (
                  |    SELECT vec_id, m, c, d,
                  |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rk
                  |    FROM dist) WHERE rk = 1),
                  |recon AS (SELECT codes.vec_id, flatten(list(cb.cl ORDER BY codes.m)) AS rv
                  |  FROM codes JOIN cb ON cb.m = codes.m AND cb.c = codes.code GROUP BY 1),
                  |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
                  |ax AS (SELECT qid, recon.vec_id AS cid,
                  |    list_dot_product(qv, rv)
                  |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(rv, rv))) AS apx
                  |  FROM q JOIN recon ON recon.vec_id <> qid),
                  |cand AS (SELECT qid, cid, apx FROM (
                  |    SELECT qid, cid, apx,
                  |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
                  |    FROM ax) WHERE ark <= 40),
                  |sc AS (SELECT qid, cid, apx,
                  |    list_dot_product(qv.v, cv.v)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos, apx,
                  |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s13OracleSql: String =
    s"""WITH $cosSql,
                  |st AS (SELECT d, min(v[d]) AS lo, max(v[d]) AS hi
                  |  FROM ce, (SELECT unnest(generate_series(1, 64)) AS d) ds GROUP BY d),
                  |mm AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM st),
                  |codes AS (SELECT vec_id, list_transform(generate_series(1, 64),
                  |    d -> CASE WHEN his[d] = los[d] THEN 0
                  |         ELSE least(255, greatest(0, CAST(floor((v[d] - los[d]) / (his[d] - los[d]) * 256) AS INT))) END) AS cd
                  |  FROM ce, mm),
                  |recon AS (SELECT vec_id,
                  |    list_transform(generate_series(1, 64),
                  |      d -> CAST(CAST(los[d] + (cd[d] + 0.5) * (his[d] - los[d]) / 256.0 AS REAL) AS DOUBLE)) AS rv
                  |  FROM codes, mm),
                  |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
                  |ax AS (SELECT qid, r.vec_id AS cid,
                  |    list_dot_product(qv, rv)
                  |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(rv, rv))) AS apx
                  |  FROM q JOIN recon r ON r.vec_id <> qid),
                  |cut AS (SELECT qid, cid, apx FROM (
                  |    SELECT qid, cid, apx,
                  |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
                  |    FROM ax) WHERE ark <= 40),
                  |sc AS (SELECT qid, cid, apx,
                  |    list_dot_product(qv.v, cv.v)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cut JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos, apx,
                  |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s14OracleSql: String =
    s"""WITH $cosSql,
                  |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS scv
                  |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
                  |ad AS (SELECT ce.vec_id, seeds.cell,
                  |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.scv)
                  |      + list_dot_product(seeds.scv, seeds.scv) AS dist
                  |  FROM ce, seeds),
                  |crk AS (SELECT vec_id, cell,
                  |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
                  |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
                  |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
                  |st AS (SELECT d, min(v[d]) AS lo, max(v[d]) AS hi
                  |  FROM ce, (SELECT unnest(generate_series(1, 64)) AS d) ds GROUP BY d),
                  |mm AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM st),
                  |codes AS (SELECT vec_id, list_transform(generate_series(1, 64),
                  |    d -> CASE WHEN his[d] = los[d] THEN 0
                  |         ELSE least(255, greatest(0, CAST(floor((v[d] - los[d]) / (his[d] - los[d]) * 256) AS INT))) END) AS cd
                  |  FROM ce, mm),
                  |recon AS (SELECT vec_id,
                  |    list_transform(generate_series(1, 64),
                  |      d -> CAST(CAST(los[d] + (cd[d] + 0.5) * (his[d] - los[d]) / 256.0 AS REAL) AS DOUBLE)) AS rv
                  |  FROM codes, mm),
                  |cand AS (SELECT DISTINCT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
                  |ax AS (SELECT qid, cid,
                  |    list_dot_product(r.rv, qv.v)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(r.rv, r.rv))) AS apx
                  |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN recon r ON r.vec_id = cid),
                  |cut AS (SELECT qid, cid, apx FROM (
                  |    SELECT qid, cid, apx,
                  |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
                  |    FROM ax) WHERE ark <= 40),
                  |sc AS (SELECT qid, cid, apx,
                  |    list_dot_product(qv.v, cv.v)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cut JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos, apx,
                  |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s10OracleSql: String =
    s"""WITH $cosSql,
                  |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
                  |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
                  |ad AS (SELECT ce.vec_id, seeds.cell,
                  |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.cvec)
                  |      + list_dot_product(seeds.cvec, seeds.cvec) AS dist
                  |  FROM ce, seeds),
                  |crk AS (SELECT vec_id, cell,
                  |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
                  |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
                  |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
                  |pqc AS (SELECT mr.m, cr.c, ir.i,
                  |    ((strpos('0123456789abcdef',
                  |        substr(md5('pq_' || CAST(mr.m AS VARCHAR) || '_' || CAST(cr.c AS VARCHAR) || '_' || CAST(ir.i AS VARCHAR)), 1, 1)) - 1)
                  |      - 7.5) / 8 AS comp
                  |  FROM (SELECT unnest(generate_series(0, 7)) AS m) mr,
                  |       (SELECT unnest(generate_series(0, 15)) AS c) cr,
                  |       (SELECT unnest(generate_series(0, 7)) AS i) ir),
                  |cb AS (SELECT m, c, list(comp ORDER BY i) AS cl FROM pqc GROUP BY 1, 2),
                  |sb AS (SELECT vec_id, mr.m, v[mr.m*8+1 : mr.m*8+8] AS sv
                  |  FROM ce, (SELECT unnest(generate_series(0, 7)) AS m) mr),
                  |dist AS (SELECT vec_id, sb.m, cb.c,
                  |    -2 * list_dot_product(sv, cl) + list_dot_product(cl, cl) AS d
                  |  FROM sb JOIN cb ON cb.m = sb.m),
                  |codes AS (SELECT vec_id, m, c AS code FROM (
                  |    SELECT vec_id, m, c, d,
                  |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rk
                  |    FROM dist) WHERE rk = 1),
                  |recon AS (SELECT codes.vec_id, flatten(list(cb.cl ORDER BY codes.m)) AS rv
                  |  FROM codes JOIN cb ON cb.m = codes.m AND cb.c = codes.code GROUP BY 1),
                  |cand AS (SELECT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
                  |ax AS (SELECT cand.qid, cand.cid,
                  |    list_dot_product(qv.v, recon.rv)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(recon.rv, recon.rv))) AS apx
                  |  FROM cand JOIN ce qv ON qv.vec_id = cand.qid
                  |       JOIN recon ON recon.vec_id = cand.cid),
                  |cut AS (SELECT qid, cid, apx FROM (
                  |    SELECT qid, cid, apx,
                  |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
                  |    FROM ax) WHERE ark <= 40),
                  |sc AS (SELECT qid, cid, apx,
                  |    list_dot_product(qv.v, cv.v)
                  |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cut JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos, apx,
                  |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s8OracleSql: String =
    s"""WITH $cosSql,
                  |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
                  |sc AS (SELECT qid, c.vec_id AS cid, list_dot_product(qv, c.v) AS ip
                  |  FROM q JOIN ce c ON c.vec_id <> qid),
                  |r AS (SELECT qid, cid, ip,
                  |  row_number() OVER (PARTITION BY qid ORDER BY ip DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(ip, 4) AS ip
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s8bOracleSql: String =
    s"""WITH $cosSql,
                  |m2 AS (SELECT max(list_dot_product(v, v)) AS m2 FROM ce),
                  |ca AS (SELECT vec_id,
                  |    v || [CAST(CAST(sqrt(greatest(m2 - list_dot_product(v, v), 0)) AS REAL) AS DOUBLE)] AS va
                  |  FROM ce, m2),
                  |qa AS (SELECT vec_id, v || [CAST(0 AS DOUBLE)] AS va FROM ce WHERE vec_id < 5),
                  |comp AS (SELECT t, p, i,
                  |    ((strpos('0123456789abcdef',
                  |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
                  |      - 7.5) / 8 AS c
                  |  FROM (SELECT unnest(generate_series(0, 7)) AS t) ts,
                  |       (SELECT unnest(generate_series(0, 3)) AS p) ps,
                  |       (SELECT unnest(generate_series(0, 64)) AS i) is1),
                  |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
                  |sbc AS (SELECT ca.vec_id, planes.t,
                  |    CASE WHEN list_dot_product(ca.va, planes.pl) >= 0
                  |         THEN (1::BIGINT << p) ELSE 0 END AS bit
                  |  FROM ca, planes),
                  |bkc AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sbc GROUP BY 1, 2),
                  |sbq AS (SELECT qa.vec_id, planes.t,
                  |    CASE WHEN list_dot_product(qa.va, planes.pl) >= 0
                  |         THEN (1::BIGINT << p) ELSE 0 END AS bit
                  |  FROM qa, planes),
                  |bkq AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sbq GROUP BY 1, 2),
                  |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                  |  FROM bkq q JOIN bkc c ON q.t = c.t AND q.bucket = c.bucket
                  |  WHERE q.vec_id <> c.vec_id),
                  |sc AS (SELECT qid, cid,
                  |  list_dot_product(qv.va, cv.va)
                  |    / (sqrt(list_dot_product(qv.va, qv.va)) * sqrt(list_dot_product(cv.va, cv.va))) AS cos
                  |  FROM cand JOIN qa qv ON qv.vec_id = qid JOIN ca cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos,
                  |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s8cOracleSql: String =
    s"""WITH $cosSql,
                  |m2 AS (SELECT max(list_dot_product(v, v)) AS m2 FROM ce),
                  |ca AS (SELECT vec_id,
                  |    v || [CAST(CAST(sqrt(greatest(m2 - list_dot_product(v, v), 0)) AS REAL) AS DOUBLE)] AS va
                  |  FROM ce, m2),
                  |qa AS (SELECT vec_id, v || [CAST(0 AS DOUBLE)] AS va FROM ce WHERE vec_id < 5),
                  |comp AS (SELECT t, p, i,
                  |    ((strpos('0123456789abcdef',
                  |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
                  |      - 7.5) / 8 AS c
                  |  FROM (SELECT unnest(generate_series(0, 7)) AS t) ts,
                  |       (SELECT unnest(generate_series(0, 3)) AS p) ps,
                  |       (SELECT unnest(generate_series(0, 64)) AS i) is1),
                  |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
                  |sbc AS (SELECT ca.vec_id, planes.t,
                  |    CASE WHEN list_dot_product(ca.va, planes.pl) >= 0
                  |         THEN (1::BIGINT << p) ELSE 0 END AS bit
                  |  FROM ca, planes),
                  |bkc AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sbc GROUP BY 1, 2),
                  |sbq AS (SELECT qa.vec_id, planes.t,
                  |    CASE WHEN list_dot_product(qa.va, planes.pl) >= 0
                  |         THEN (1::BIGINT << p) ELSE 0 END AS bit
                  |  FROM qa, planes),
                  |bkq AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sbq GROUP BY 1, 2),
                  |bkqp AS (SELECT vec_id, t, bucket FROM bkq
                  |  UNION ALL SELECT vec_id, t, xor(bucket, 1) FROM bkq
                  |  UNION ALL SELECT vec_id, t, xor(bucket, 2) FROM bkq),
                  |cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
                  |  FROM bkqp q JOIN bkc c ON q.t = c.t AND q.bucket = c.bucket
                  |  WHERE q.vec_id <> c.vec_id),
                  |sc AS (SELECT qid, cid,
                  |  list_dot_product(qv.va, cv.va)
                  |    / (sqrt(list_dot_product(qv.va, qv.va)) * sqrt(list_dot_product(cv.va, cv.va))) AS cos
                  |  FROM cand JOIN qa qv ON qv.vec_id = qid JOIN ca cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos,
                  |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s3OracleSql: String =
    s"""WITH $cosSql,
                  |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
                  |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
                  |ad AS (SELECT ce.vec_id, seeds.cell,
                  |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.cv)
                  |      + list_dot_product(seeds.cv, seeds.cv) AS dist
                  |  FROM ce, seeds),
                  |crk AS (SELECT vec_id, cell,
                  |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
                  |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
                  |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
                  |cand AS (SELECT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
                  |sc AS (SELECT qid, cid,
                  |  list_dot_product(qv.v, cv.v)
                  |    / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
                  |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
                  |r AS (SELECT qid, cid, cos,
                  |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                  |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                  |  round(cos, 4) AS cosine
                  |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s11OracleSql: String =
    s"""WITH $cosSql,
              |comp AS (SELECT t, p, i,
              |    ((strpos('0123456789abcdef',
              |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
              |      - 7.5) / 8 AS c
              |  FROM (SELECT unnest(generate_series(0, 3)) AS t) ts,
              |       (SELECT unnest(generate_series(0, 7)) AS p) ps,
              |       (SELECT unnest(generate_series(0, 63)) AS i) is1),
              |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
              |sb AS (SELECT ce.vec_id, planes.t,
              |    CASE WHEN list_dot_product(ce.v, planes.pl) >= 0
              |         THEN (1::BIGINT << p) ELSE 0 END AS bit
              |  FROM ce, planes),
              |bk AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sb GROUP BY 1, 2),
              |cpair AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nb
              |  FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
              |  WHERE x.vec_id <> y.vec_id),
              |gsc AS (SELECT src, nb,
              |    list_dot_product(sv.v, nv.v)
              |      / (sqrt(list_dot_product(sv.v, sv.v)) * sqrt(list_dot_product(nv.v, nv.v))) AS gcos
              |  FROM cpair JOIN ce sv ON sv.vec_id = src JOIN ce nv ON nv.vec_id = nb),
              |graph AS (SELECT src, nb FROM (
              |    SELECT src, nb,
              |      row_number() OVER (PARTITION BY src ORDER BY gcos DESC, nb) AS grk
              |    FROM gsc) WHERE grk <= 5),
              |seeds AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
              |  FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
              |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
              |expd AS (SELECT DISTINCT qid, cid FROM (
              |    SELECT qid, cid FROM seeds
              |    UNION ALL
              |    SELECT s.qid, g.nb AS cid FROM seeds s JOIN graph g ON g.src = s.cid)
              |  WHERE qid <> cid),
              |sc AS (SELECT qid, cid,
              |    list_dot_product(qv.v, cv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM expd JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  private val s21OracleSql: String =
    s"""WITH $cosSql,
              |comp AS (SELECT t, p, i,
              |    ((strpos('0123456789abcdef',
              |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
              |      - 7.5) / 8 AS c
              |  FROM (SELECT unnest(generate_series(0, 3)) AS t) ts,
              |       (SELECT unnest(generate_series(0, 7)) AS p) ps,
              |       (SELECT unnest(generate_series(0, 63)) AS i) is1),
              |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
              |sb AS (SELECT ce.vec_id, planes.t,
              |    CASE WHEN list_dot_product(ce.v, planes.pl) >= 0
              |         THEN (1::BIGINT << p) ELSE 0 END AS bit
              |  FROM ce, planes),
              |bk AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sb GROUP BY 1, 2),
              |cpair AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nb
              |  FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
              |  WHERE x.vec_id <> y.vec_id),
              |gsc AS (SELECT src, nb,
              |    list_dot_product(sv.v, nv.v)
              |      / (sqrt(list_dot_product(sv.v, sv.v)) * sqrt(list_dot_product(nv.v, nv.v))) AS gcos
              |  FROM cpair JOIN ce sv ON sv.vec_id = src JOIN ce nv ON nv.vec_id = nb),
              |graph AS (SELECT src, nb FROM (
              |    SELECT src, nb,
              |      row_number() OVER (PARTITION BY src ORDER BY gcos DESC, nb) AS grk
              |    FROM gsc) WHERE grk <= 5),
              |seeds AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
              |  FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket
              |  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id),
              |expd AS (SELECT DISTINCT qid, cid FROM (
              |    SELECT qid, cid FROM seeds
              |    UNION ALL
              |    SELECT s.qid, g.nb AS cid FROM seeds s JOIN graph g ON g.src = s.cid)
              |  WHERE qid <> cid),
              |sc AS (SELECT qid, cid,
              |    list_dot_product(qv.v, cv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM expd JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |bm AS (SELECT qid, cid FROM (
              |    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS brk
              |    FROM sc) WHERE brk <= 4),
              |exp2 AS (SELECT DISTINCT b.qid, g.nb AS cid
              |  FROM bm b JOIN graph g ON g.src = b.cid
              |  WHERE b.qid <> g.nb
              |    AND NOT EXISTS (SELECT 1 FROM sc WHERE sc.qid = b.qid AND sc.cid = g.nb)),
              |sc2 AS (SELECT qid, cid,
              |    list_dot_product(qv.v, cv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM exp2 JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |allsc AS (SELECT * FROM sc UNION ALL SELECT * FROM sc2),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM allsc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  val all: Seq[Q] = Seq(

    Q("d1_dedup_exact",
      (s, d) => Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id"),
      Some("""SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
             |CAST(count(*) AS BIGINT) AS n_copies
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)),

    Q("d2_dedup_ngram_jaccard",
      // The EXACT/ORACLE tier, opt-in by name (round-6 API change):
      // the public front door `Dedup.jaccardPairs` routes to the
      // MinHash-LSH scale tier (d3's path) — at the round-5 10× sweep
      // this exact tier took 25 min where d3 took seconds. It stays
      // registered as the full-recall baseline d3 is verified against.
      (s, d) => Dedup.ngramJaccardPairsExact(Tables.documents(s, d), "doc_id", "text", 0.95)
        .orderBy("a", "b"),
      Some(s"""WITH $tokSql,
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
      // maxBucket = 4096 keeps the degenerate-bucket guard armed while
      // staying ABOVE the corpus's distinct-set count at every tested
      // SF (~400 sets at sf0.01, ~3.9k at sf0.1), so the cap never
      // binds and the output is oracle-exact at both — a cap below
      // the set count silently drops band candidates the uncapped
      // oracle keeps (verified: 1024 loses 26k true near-dup pairs at
      // sf0.1). The recall trade only engages on corpora degenerate
      // enough to exceed the cap.
      (s, d) => Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.95, maxBucket = 4096)
        .orderBy("a", "b"),
      Some(s"""WITH $minhashPairsSql
              |SELECT a, b, round(jac, 4) AS jaccard FROM prs WHERE jac >= 0.95
              |ORDER BY 1, 2""".stripMargin)),

    Q("d11_fuzzy_clusters",
      // The fuzzy-dedup CLUSTER table — what a 100-TB pipeline
      // actually materializes from MinHash dedup: every document
      // labeled with the minimum doc id of its near-duplicate
      // component (connected components over the verified d3 pair
      // graph, so A~B~C clusters transitively even when A and C never
      // band-collide). Runs entirely at the distinct-token-set level
      // (O(docs) output, never O(c²) pairs); the oracle replays
      // signatures, banding, verification, AND the transitive closure
      // via recursive SQL.
      (s, d) => Dedup.fuzzyClusters(Tables.documents(s, d), "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.95, maxBucket = 4096)
        .orderBy("member_id"),
      Some(s"""WITH $minhashPairsSql,
              |$fuzzyCcSql
              |SELECT coalesce(cc.component, dd.doc_id) AS keep_id, dd.doc_id AS member_id
              |FROM documents dd LEFT JOIN cc ON cc.node = dd.doc_id
              |ORDER BY member_id""".stripMargin)),

    Q("d4_dedup_simhash",
      // OPERATOR CONTRACT (pinned by the round-5 10× sweep): the
      // banded-LSH candidate stage caps degenerate buckets, trading
      // RECALL at high clone density — at 10× scale the cap dropped
      // ~5.4% of pairs (5,247,001 vs 5,547,709); cap-off reproduces
      // the oracle exactly. At sweep SFs the cap never binds, so the
      // oracle compare stays exact; at 100 TB the cap is what keeps a
      // hot bucket from going quadratic. The trade is OBSERVABLE in
      // output (round 8): every pair row carries n_capped_buckets /
      // n_dropped_rows from the pre-cap bucket table — nonzero means
      // raise the cap (or route through d2's exact tier).
      (s, d) => Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3).orderBy("a", "b"),
      Some(s"""WITH $tokSql,
              |bits AS (SELECT doc_id, b,
              |    CASE WHEN ((strpos('0123456789abcdef', substr(md5(tok), b // 4 + 1, 1)) - 1)
              |               // (1::BIGINT << (b % 4))) % 2 = 1 THEN 1 ELSE -1 END AS v
              |  FROM tok, (SELECT unnest(generate_series(0, 59)) AS b) bs),
              |sv AS (SELECT doc_id, b, sum(v) AS sv FROM bits GROUP BY 1, 2),
              |sim AS (SELECT doc_id,
              |    CAST(sum(CASE WHEN sv >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sh
              |  FROM sv GROUP BY 1),
              |sk AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tok) AS setk
              |  FROM tok GROUP BY 1),
              |reps AS (SELECT min(doc_id) AS rep FROM sk GROUP BY setk),
              |bkt AS (SELECT k, (sh >> (k*15)) & 32767 AS bh, CAST(count(*) AS BIGINT) AS n
              |  FROM reps JOIN sim ON sim.doc_id = reps.rep,
              |       (SELECT unnest(generate_series(0, 3)) AS k) ks
              |  GROUP BY 1, 2),
              |cst AS (SELECT
              |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_capped_buckets,
              |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN n - 4096 ELSE 0 END) AS BIGINT), 0) AS n_dropped_rows
              |  FROM bkt)
              |SELECT x.doc_id AS a, y.doc_id AS b,
              |  CAST(bit_count(xor(x.sh, y.sh)) AS BIGINT) AS hamming,
              |  cst.n_capped_buckets, cst.n_dropped_rows
              |FROM sim x JOIN sim y ON x.doc_id < y.doc_id CROSS JOIN cst
              |WHERE bit_count(xor(x.sh, y.sh)) <= 3
              |ORDER BY 1, 2""".stripMargin)),

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

    Q("d10_containment",
      // Asymmetric containment (quote/subset detection): ordered
      // pairs where ≥ 99% of the needle's distinct tokens appear in
      // the hay — the case symmetric Jaccard dilutes away. θ = 0.99
      // with a ≤ 31-token vocabulary means exact subset.
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text", 0.99)
        .orderBy("needle_id", "hay_id"),
      Some(s"""WITH $tokSql,
              |sz AS (SELECT doc_id, count(*) AS c FROM tok GROUP BY 1),
              |inter AS (SELECT a.doc_id AS i, b.doc_id AS o, count(*) AS n
              |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
              |  GROUP BY 1, 2)
              |SELECT i AS needle_id, o AS hay_id,
              |  round(n / CAST(si.c AS DOUBLE), 4) AS containment
              |FROM inter JOIN sz si ON si.doc_id = i
              |WHERE n / CAST(si.c AS DOUBLE) >= 0.99
              |ORDER BY needle_id, hay_id""".stripMargin)),

    Q("d5b_dedup_embedding_lsh",
      // The SCALE path for embedding near-dup pairs (d5 is the
      // all-pairs oracle baseline): hyperplane-bucket collisions →
      // capped buckets → exact cosine rerank. The oracle rebuilds
      // every hyperplane from the md5 formula and replays bucketing +
      // rerank, so candidate generation itself is hash-verified.
      (s, d) => Similarity.embeddingLshPairs(
          Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("a", "b"),
      Some(s"""WITH $cosSql,
              |comp AS (SELECT t, p, i,
              |    ((strpos('0123456789abcdef',
              |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
              |      - 7.5) / 8 AS c
              |  FROM (SELECT unnest(generate_series(0, 3)) AS t) ts,
              |       (SELECT unnest(generate_series(0, 7)) AS p) ps,
              |       (SELECT unnest(generate_series(0, 63)) AS i) is1),
              |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
              |sb AS (SELECT ce.vec_id, planes.t,
              |    CASE WHEN list_dot_product(ce.v, planes.pl) >= 0
              |         THEN (1::BIGINT << p) ELSE 0 END AS bit
              |  FROM ce, planes),
              |bk AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sb GROUP BY 1, 2),
              |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
              |  FROM bk x JOIN bk y ON x.t = y.t AND x.bucket = y.bucket
              |    AND x.vec_id < y.vec_id),
              |sc AS (SELECT a, b,
              |  list_dot_product(av.v, bv.v)
              |    / (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) AS cos
              |  FROM cand JOIN ce av ON av.vec_id = a JOIN ce bv ON bv.vec_id = b)
              |SELECT a, b, round(cos, 4) AS cosine FROM sc WHERE cos >= 0.4
              |ORDER BY a, b""".stripMargin)),

    Q("d6_dedup_clusters",
      (s, d) => Dedup.exactClusters(Tables.documents(s, d), "doc_id", "text")
        .orderBy("member_id"),
      Some("""SELECT CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS keep_id,
             |doc_id AS member_id
             |FROM documents ORDER BY member_id""".stripMargin)),

    Q("d12_dedup_funnel",
      // The dedup FUNNEL — the tiers composed the way a production
      // corpus pipeline runs them, reported as one row of survivor
      // counts: raw docs → byte-exact survivors → normalized-text
      // survivors → fuzzy (MinHash component) survivors. Each tier is
      // its oracle-verified operator (d6, d8, d11); the funnel pins
      // their composition and the monotone survivor shrinkage.
      (s, d) => {
        val docs = Tables.documents(s, d)
        def survivors(cl: org.apache.spark.sql.DataFrame) =
          cl.filter(col("keep_id") === col("member_id"))
            .agg(count(lit(1)).as("n"))
        docs.agg(count(lit(1)).as("n_raw"))
          .crossJoin(survivors(Dedup.exactClusters(docs, "doc_id", "text"))
            .withColumnRenamed("n", "n_exact"))
          .crossJoin(survivors(Corpus.normalizedClusters(docs, "doc_id", "text"))
            .withColumnRenamed("n", "n_norm"))
          .crossJoin(survivors(Dedup.fuzzyClusters(docs, "doc_id", "text",
            numHashes = 64, bands = 16, threshold = 0.95, maxBucket = 4096))
            .withColumnRenamed("n", "n_fuzzy"))
      },
      Some(s"""WITH $minhashPairsSql,
              |$fuzzyCcSql
              |SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_raw,
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT min(doc_id) FROM documents GROUP BY text)) AS n_exact,
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT min(doc_id) FROM documents
              |     GROUP BY ${Corpus.normalizeSql})) AS n_norm,
              |  (SELECT CAST(count(*) AS BIGINT) FROM documents dd
              |   LEFT JOIN cc ON cc.node = dd.doc_id
              |   WHERE coalesce(cc.component, dd.doc_id) = dd.doc_id) AS n_fuzzy""".stripMargin)),

    Q("d13_dedup_editdist",
      // Edit-distance near-dup tier: winnowed LONG-gram (k=20, w=8,
      // mod-P rolling hash) fingerprint collisions generate
      // candidates — any shared 27-char substring guarantees
      // candidacy — then exact Levenshtein verifies at ≤20% relative
      // distance with a pure-BIGINT ratio test. The oracle replays
      // the identical mod-P polynomial, window-min winnowing, and
      // DuckDB's own levenshtein — candidates AND verification are
      // cross-engine-checked end-to-end.
      (s, d) => Dedup.editDistancePairs(Tables.documents(s, d),
          "doc_id", "text", k = 20, w = 8, num = 1, denom = 5,
          maxBucket = 4096)
        .orderBy("a", "b"),
      Some(s"""WITH f AS (${TextAnalysis.fingerprintModSql(20, 8)}),
              |cand AS (SELECT DISTINCT fa.doc_id AS a, fb.doc_id AS b
              |  FROM f fa JOIN f fb ON fa.fp = fb.fp AND fa.doc_id < fb.doc_id),
              |v AS (SELECT c.a, c.b,
              |    CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
              |    CAST(greatest(length(ta.text), length(tb.text)) AS BIGINT) AS mx
              |  FROM cand c JOIN documents ta ON ta.doc_id = c.a
              |              JOIN documents tb ON tb.doc_id = c.b)
              |SELECT a, b, dist FROM v WHERE dist * 5 <= mx * 1
              |ORDER BY a, b""".stripMargin)),

    Q("d14_substring_profile",
      // Duplicated-substring profile (Lee et al. 2022's exact-
      // substring diagnostic, winnowing-sketched): per document, how
      // many winnowed 20-gram fingerprints occur in ≥1 other doc,
      // and the duplication ratio in integer basis points. No pair
      // enumeration — two keyed aggregates, linear in corpus size
      // however duplicative the corpus is (the d13 candidate graph
      // can go quadratic on templated corpora; this profile cannot).
      (s, d) => Dedup.substringDupProfile(Tables.documents(s, d),
          "doc_id", "text", k = 20, w = 8)
        .orderBy("doc_id"),
      Some(s"""WITH f AS (${TextAnalysis.fingerprintModSql(20, 8)}),
              |dfc AS (SELECT fp, count(*) AS ndocs FROM f GROUP BY 1),
              |p AS (SELECT fo.doc_id, CAST(count(*) AS BIGINT) AS n_fp,
              |    CAST(sum(CASE WHEN d.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
              |  FROM f fo JOIN dfc d ON fo.fp = d.fp GROUP BY 1)
              |SELECT doc_id, n_fp, n_shared, n_shared * 10000 // n_fp AS dup_bp
              |FROM p ORDER BY doc_id""".stripMargin)),

    Q("d15_dedup_fuzzy_incremental",
      // Incremental FUZZY dedup — d7's exact-digest tier generalized
      // to MinHash: a new batch (doc_id % 10 = 0) probes the corpus
      // band index; candidates scale with |batch|·bucket-width, not
      // |corpus|². The oracle replays the FULL minhash pair pipeline
      // and filters to pairs touching the batch — pinning the
      // incremental ≡ full-filtered invariant (the fuzzy analogue of
      // q52's incremental ≡ recompute).
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.incrementalMinhashPairs(
            existing = docs.filter(col("doc_id") % 10 =!= 0),
            batch = docs.filter(col("doc_id") % 10 === 0),
            "doc_id", "text", numHashes = 64, bands = 16, threshold = 0.95,
            maxBucket = 4096)
          .orderBy("a", "b")
      },
      Some(s"""WITH $minhashPairsSql
              |SELECT a, b, round(jac, 4) AS jaccard FROM prs
              |WHERE jac >= 0.95 AND (a % 10 = 0 OR b % 10 = 0)
              |ORDER BY a, b""".stripMargin)),

    Q("s1_knn_brute",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnBrute(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      Some(s1OracleSql)),

    Q("s2_knn_lsh",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnLsh(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      // Full LSH replication: the oracle rebuilds every hyperplane
      // from the same md5 formula ((digit − 7.5)/8 is a multiple of
      // 1/16, exact in float and double), recomputes bucket bits with
      // the identical double expression, and reranks candidates.
      Some(s2OracleSql)),

    Q("s3_knn_ivf",
      // lloydIters = 0 keeps the operator a deterministic per-row
      // float expression tree (exactly oracle-verifiable); Lloyd
      // refinement averages floats across rows (engine-specific sum
      // order) and is spec-tested instead.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvf(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, lloydIters = 0).orderBy("query_id", "rk")
      },
      Some(s3OracleSql)),

    Q("s3b_knn_ivf_refined",
      // The PRODUCTION IVF variant (Lloyd-refined centroids) under a
      // containment oracle. Refined centroids average floats across
      // rows (sum order is engine-specific), so no SQL engine can
      // replicate the emitted set bit-for-bit; what IS engine-checkable
      // is the recall property: every emitted neighbor's true cosine
      // must reach the query's 10th-exact cosine minus ε = 0.1
      // (measured worst margin across SFs: −0.032 — 3× headroom). The
      // exact threshold comes from the brute-force operator, itself
      // hash-verified end-to-end as s1; the oracle pins the per-query
      // contract (10 emitted, 10 within bound) — an IVF regression
      // that under-fills cells or emits out-of-bound neighbors fails
      // the hash compare.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
        val ivf = Similarity.knnIvf(e, q, "vec_id", "embedding", k = 10, lloydIters = 2)
        val kth = Similarity.knnBrute(e, q, "vec_id", "embedding", k = 10)
          .filter(col("rk") === 10).select(col("query_id"), col("cosine").as("kth"))
        ivf.join(kth, Seq("query_id"))
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_emitted"),
            sum((col("cosine") >= col("kth") - 0.1).cast("long")).as("n_within_eps"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_emitted,
             |CAST(10 AS BIGINT) AS n_within_eps
             |FROM embeddings WHERE vec_id < 5 ORDER BY 1""".stripMargin)),

    Q("s19_knn_filtered",
      // FILTERED vector search — kNN under a metadata predicate
      // (label < 3, ~30% selectivity), the standing-index variant
      // every production vector store exposes. Quantizer trained on
      // the FULL corpus (the filter is per-query, not per-index);
      // candidates are PRE-filtered at the corpus scan, never
      // top-k-then-filter. lloydIters = 0 keeps the whole operator a
      // deterministic expression tree, so the oracle replays it
      // exactly; Round10Specs pins the pushed-down scan filter.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfFiltered(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", col("label") < 3, k = 10, lloydIters = 0)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |cef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |  FROM embeddings WHERE label < 3),
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
              |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
              |adc AS (SELECT cef.vec_id, seeds.cell,
              |    list_dot_product(cef.v, cef.v) - 2.0 * list_dot_product(cef.v, seeds.cv)
              |      + list_dot_product(seeds.cv, seeds.cv) AS dist
              |  FROM cef, seeds),
              |corpus AS (SELECT vec_id AS cid, cell FROM (
              |    SELECT vec_id, cell,
              |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
              |    FROM adc) WHERE rk = 1),
              |adq AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.cv)
              |      + list_dot_product(seeds.cv, seeds.cv) AS dist
              |  FROM ce, seeds WHERE ce.vec_id < 5),
              |qcells AS (SELECT vec_id AS qid, cell FROM (
              |    SELECT vec_id, cell,
              |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk
              |    FROM adq) WHERE rk <= 2),
              |cand AS (SELECT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
              |sc AS (SELECT qid, cid,
              |  list_dot_product(qv.v, cv.v)
              |    / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN cef cv ON cv.vec_id = cid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("s20_mmr",
      // MMR diversified rerank (round 11) — the RAG result-diversity
      // stage: from each query's brute-cosine top-8, greedily keep 4
      // by mmr = 0.7·rel − 0.3·max-sim-to-selected, ALL-INTEGER
      // (floor(cos·10⁴), λ in tenths) so the greedy argmax is
      // bit-identical on both engines; the oracle unrolls the same 4
      // selections. Candidate generation dominates at scale (any
      // retrieval tier feeds it); the rerank is per-query bounded
      // (nCand² sims + k argmax passes), never corpus-bounded.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.mmrRerank(e, e.filter(col("vec_id") < 3), "vec_id",
            "embedding", nCand = 8, k = 4, lambdaTenths = 7)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |qs AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 3),
              |scx AS (SELECT qid, c.vec_id AS cid,
              |    list_dot_product(qv, c.v)
              |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos,
              |    c.v AS cv
              |  FROM qs JOIN ce c ON c.vec_id <> qid),
              |cand AS (SELECT qid, cid, CAST(floor(cos * 10000) AS BIGINT) AS rel, cv
              |  FROM (SELECT qid, cid, cos, cv,
              |      row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS crk
              |    FROM scx) WHERE crk <= 8),
              |sims AS (SELECT x.qid, x.cid AS a, y.cid AS b,
              |    CAST(floor(list_dot_product(x.cv, y.cv)
              |      / (sqrt(list_dot_product(x.cv, x.cv)) * sqrt(list_dot_product(y.cv, y.cv)))
              |      * 10000) AS BIGINT) AS sim
              |  FROM cand x JOIN cand y ON x.qid = y.qid AND x.cid <> y.cid),
              |${mmrStepsSql(4, 7)}
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  CAST(mmr AS BIGINT) AS mmr_e4
              |FROM mmr_out ORDER BY query_id, rk""".stripMargin)),

    Q("p0_corpus_pipeline",
      // The composed END-TO-END training-data pipeline as one operator
      // (the corpus-side analog of g10): exact-dedup survivors →
      // quality filter → language ID → deterministic hash sample →
      // per-language corpus statistics. Every stage is the
      // oracle-verified operator it names (d6, t2, t3, smp1's hash
      // family); composition adds only the doc_id equi-joins, which
      // co-partition on one key. The oracle replays the whole chain
      // in SQL via the same shared fragment builders.
      (s, d) => {
        val docs = Tables.documents(s, d)
        val keep = Dedup.exactClusters(docs, "doc_id", "text")
          .filter(col("keep_id") === col("member_id"))
          .select(col("member_id").as("doc_id"))
        TextAnalysis.qualityScore(docs, "doc_id", "text")
          .join(TextAnalysis.langId(docs, "doc_id", "text"), Seq("doc_id"))
          .join(keep, Seq("doc_id"), "left_semi")
          .filter(col("quality_bp") >= 6000)
          .filter(expr("((doc_id % 1000003) * 2654435761) % 100 < 50"))
          .groupBy("pred_lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("sum_tokens"),
            expr("sum(quality_bp) div count(1)").as("avg_quality_bp"))
          .orderBy("pred_lang")
      },
      Some(s"""WITH q AS (${TextAnalysis.qualityScoreSql}),
              |l AS (${TextAnalysis.langIdSql}),
              |keep AS (SELECT doc_id FROM (
              |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS k FROM documents)
              |  WHERE doc_id = k)
              |SELECT pred_lang, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              |  CAST(sum(quality_bp) // count(*) AS BIGINT) AS avg_quality_bp
              |FROM q JOIN l USING (doc_id) JOIN keep USING (doc_id)
              |WHERE quality_bp >= 6000
              |  AND ((doc_id % 1000003) * 2654435761) % 100 < 50
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t9_tfidf",
      // Inverted-index term weighting: per-language top-5 tokens by an
      // integer-scaled tf-idf surrogate, score = tf · (N·10⁴ div df).
      // Integer division instead of ln(N/df) keeps the ranking
      // bit-identical on any ANSI engine (log differs in the last ulp
      // across libm implementations, which flips ties); the surrogate
      // is order-isomorphic to tf/df weighting for fixed N.
      (s, d) => {
        val docs = Tables.documents(s, d)
        val tok = docs.select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val n = docs.agg(count(lit(1)).as("n"))
        val df_ = tok.groupBy("tok").agg(countDistinct("doc_id").as("df"))
        val tf = tok.groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
        tf.join(df_, Seq("tok")).crossJoin(broadcast(n))
          .withColumn("score", expr("tf * ((n * 10000) div df)"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("lang").orderBy(desc("score"), asc("tok"))))
          .filter(col("rk") <= 5)
          .select(col("lang"), col("rk"), col("tok"), col("score"))
          .orderBy("lang", "rk")
      },
      Some("""WITH tok AS (SELECT doc_id, lang, t.tok FROM documents,
             |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
             |nn AS (SELECT count(*) AS n FROM documents),
             |dfq AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1),
             |tfq AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
             |sc AS (SELECT lang, tfq.tok, tf * (((SELECT n FROM nn) * 10000) // df) AS score
             |  FROM tfq JOIN dfq ON dfq.tok = tfq.tok),
             |r AS (SELECT lang, tok, score,
             |  row_number() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS rk FROM sc)
             |SELECT lang, CAST(rk AS INT) AS rk, tok, CAST(score AS BIGINT) AS score
             |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)),

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

    Q("t24_quality_rules",
      // The published Gopher rule set as independent 0/1 flags (which
      // rule rejected, not just that one did) — t2 is the composite
      // score; this is the auditable filter. All measures integer-
      // exact (x100 / bp, integer division), replayed verbatim by the
      // oracle.
      (s, d) => TextAnalysis.qualityRules(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextAnalysis.qualityRulesSql + "\nORDER BY doc_id")),

    Q("t3_langid",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(TextAnalysis.langIdSql + "\nORDER BY doc_id")),

    Q("t4_fingerprint",
      (s, d) => TextAnalysis.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id", "fp"),
      Some(TextAnalysis.fingerprintSql() + "\nORDER BY doc_id, fp")),

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

    Q("t6_heavy_hitters",
      // Exact per-stratum heavy hitters (top tokens per language) —
      // the corpus-profiling primitive. Two-level aggregate: Spark's
      // hash agg does map-side partials, so the shuffle carries one
      // row per (lang, tok) per partition, never raw tokens; the
      // top-k window shuffles only the aggregated counts. At 100 TB
      // the same plan holds (count-min sketch is the approximate
      // alternative when even (lang, tok) cardinality is too large).
      (s, d) => {
        val tf = Tables.documents(s, d)
          .select(col("lang"),
            explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
        tf.withColumn("rk", row_number().over(
            Window.partitionBy("lang").orderBy(desc("cnt"), asc("tok"))))
          .filter(col("rk") <= 5)
          .select("lang", "rk", "tok", "cnt")
          .orderBy("lang", "rk")
      },
      Some("""WITH tf AS (
             |  SELECT lang, t.tok, CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t(tok)
             |  GROUP BY 1, 2),
             |r AS (SELECT lang, tok, cnt,
             |  CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS INT) AS rk
             |  FROM tf)
             |SELECT lang, rk, tok, cnt FROM r WHERE rk <= 5
             |ORDER BY lang, rk""".stripMargin)),

    Q("t6b_heavy_hitters_cms",
      // The approximate tier t6's comment promises: count-min-sketch
      // heavy hitters. depth=4 × width=1024 cells are the only
      // corpus-wide aggregate; estimates come from a broadcast of the
      // finished sketch. md5-affine hashing (the minhash convention)
      // makes the whole sketch bit-reproducible in DuckDB, so the
      // oracle verifies construction, estimation, and top-k — not
      // rows-only.
      (s, d) => TextAnalysis.cmsHeavyHitters(Tables.documents(s, d), "text", 4, 1024, 25),
      Some(TextAnalysis.cmsHeavyHittersSql(4, 1024, 25))),

    Q("smp1_hash_sample",
      // deterministic multiplicative-hash Bernoulli sample (~7%):
      // reproducible across engines/runs, no RNG state, pushes to
      // scan. The key is masked (mod 1000003) BEFORE the multiply so
      // the product never leaves signed-64 range under ANSI overflow
      // checking at any SF.
      (s, d) => Tables.lineitem(s, d)
        .filter(expr("((l_orderkey % 1000003) * 2654435761 + l_linenumber) % 100 < 7"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct("l_orderkey").as("n_orders"),
          round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT CAST(count(*) AS BIGINT) AS cnt,
             |CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
             |round(sum(l_quantity),2) AS sum_qty FROM lineitem
             |WHERE ((l_orderkey % 1000003) * 2654435761 + l_linenumber) % 100 < 7""".stripMargin)),

    Q("smp7_bootstrap",
      // POISSON BOOTSTRAP (round 7; Chamandy et al. 2012, "Estimating
      // uncertainty for massive data streams" — THE distributed
      // bootstrap): instead of a global with-replacement resample
      // (which needs coordination), each element draws an independent
      // Poisson(1) weight per replicate, so replicates stream
      // map-side at any corpus size. Weights are DETERMINISTIC: the
      // 32-bit house hash of (doc, replicate) compared against the
      // Poisson(1) CDF pre-scaled to exact 2³² integers — no RNG
      // state, retry/engine-stable, replayed bit-for-bit by the
      // oracle. Output: per-replicate effective sample size and the
      // weighted mean doc length in exact integer centi-chars — the
      // spread across replicates IS the uncertainty estimate.
      (s, d) => {
        val th = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L, 4279248373L)
        val h = expr("CAST(conv(substr(md5(concat(CAST(doc_id AS STRING), '_r', CAST(r AS STRING))), 1, 8), 16, 10) AS BIGINT)")
        val w = th.zipWithIndex
          .foldLeft(org.apache.spark.sql.functions.when(lit(false), 0L)) {
            case (acc, (t, i)) => acc.when(h < t, i.toLong)
          }.otherwise(5L)
        Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
          .withColumn("r", explode(expr("sequence(0, 4)")))
          .withColumn("w", w)
          .groupBy(col("r").cast("long").as("replicate"))
          .agg(sum("w").as("n_eff"),
            sum(expr("w * n_chars")).as("__ws"))
          .withColumn("mean_nchars_x100", expr("__ws * 100 div n_eff"))
          .drop("__ws")
          .orderBy("replicate")
      },
      Some {
        val h = baseHashSqlOf(
          "CAST(doc_id AS VARCHAR) || '_r' || CAST(r AS VARCHAR)")
        s"""WITH x AS (SELECT doc_id, n_chars, r
           |    FROM documents, (SELECT unnest(generate_series(0, 4)) AS r)),
           |hw AS (SELECT r, n_chars,
           |    CASE WHEN $h < 1580030168 THEN 0
           |         WHEN $h < 3160060337 THEN 1
           |         WHEN $h < 3950075421 THEN 2
           |         WHEN $h < 4213413783 THEN 3
           |         WHEN $h < 4279248373 THEN 4
           |         ELSE 5 END AS w
           |  FROM x)
           |SELECT CAST(r AS BIGINT) AS replicate,
           |  CAST(sum(w) AS BIGINT) AS n_eff,
           |  CAST(sum(w * n_chars) AS BIGINT) * 100 // CAST(sum(w) AS BIGINT)
           |    AS mean_nchars_x100
           |FROM hw GROUP BY 1 ORDER BY 1""".stripMargin
      }),

    Q("smp5_train_test_split",
      // Deterministic train/validation/test assignment — the split a
      // training pipeline must reproduce bit-for-bit across reruns
      // and engines: md5 of the doc id → 31-bit house base hash →
      // percent bucket → 80/10/10. Assignment is a pure projection
      // (no shuffle, no RNG state, survives repartitioning and
      // retries); the per-(lang, split) rollup checks the strata
      // stay proportional under the hash. Same md5-affine convention
      // as every other sketch, so the oracle replays it exactly.
      (s, d) => {
        val pct = expr(
          s"CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)" +
            s" % ${Dedup.MinhashP} % 100")
        Tables.documents(s, d)
          .withColumn("split",
            when(pct < 80, "train").when(pct < 90, "valid").otherwise("test"))
          .groupBy("lang", "split").agg(count(lit(1)).as("n"))
          .orderBy("lang", "split")
      },
      Some(s"""WITH a AS (SELECT lang,
              |    CASE WHEN pct < 80 THEN 'train'
              |         WHEN pct < 90 THEN 'valid' ELSE 'test' END AS split
              |  FROM (SELECT lang, ($docIdBaseHashSql) % ${Dedup.MinhashP} % 100 AS pct
              |        FROM documents))
              |SELECT lang, split, CAST(count(*) AS BIGINT) AS n
              |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("smp8_group_split",
      // GROUP-aware train/valid/test split — the leakage-safe variant
      // of smp5: the split keys on md5(source), so every document of
      // a source lands in the SAME split (near-duplicates and shared
      // boilerplate inside a source can never straddle train/test —
      // the GroupShuffleSplit contract). Pure projection like smp5:
      // no shuffle for the assignment itself, deterministic across
      // engines. The per-(source, split) rollup IS the leakage
      // certificate — one row per source.
      (s, d) => {
        val pct = expr(
          s"CAST(conv(substr(md5(source), 1, 8), 16, 10) AS BIGINT)" +
            s" % ${Dedup.MinhashP} % 100")
        Tables.documents(s, d)
          .withColumn("split",
            when(pct < 80, "train").when(pct < 90, "valid").otherwise("test"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(filter(split(col("text"), " "), t => t =!= ""))
              .cast("long")).as("n_tokens"))
          .orderBy("source", "split")
      },
      Some(s"""WITH h AS (SELECT source,
              |    (${baseHashSqlOf("source")}) % ${Dedup.MinhashP} % 100 AS pct,
              |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS nt
              |  FROM documents)
              |SELECT source,
              |  CASE WHEN pct < 80 THEN 'train'
              |       WHEN pct < 90 THEN 'valid' ELSE 'test' END AS split,
              |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens
              |FROM h GROUP BY 1, 2 ORDER BY source, split""".stripMargin)),

    Q("smp2_stratified_sample",
      // per-stratum deterministic rates: downsample the dominant
      // language, keep the rest — the corpus-rebalancing primitive
      (s, d) => Tables.documents(s, d)
        .filter(expr(
          "((doc_id % 1000003) * 2654435761) % 97 < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)"))
        .groupBy("lang").agg(count(lit(1)).as("cnt"), min("doc_id").as("first_id"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
             |CAST(min(doc_id) AS BIGINT) AS first_id FROM documents
             |WHERE ((doc_id % 1000003) * 2654435761) % 97 < (CASE WHEN lang = 'en' THEN 20 ELSE 60 END)
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
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("m2_media_features",
      // The partition-wise DECODE stage itself (Multimodal.decode →
      // mapPartitions over primitive byte arrays), oracle-verified:
      // the stub codec's integer feature sums (Σ byte value per
      // position-mod-4 slot) are replayed positionally in SQL. The
      // float pooled features ride the same loop but stay out of the
      // oracle (float accumulation order is engine-specific).
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        Multimodal.decode(payload, "doc_id", "payload", nFeat = 4)
          .select(col("id").as("doc_id"), col("fmt"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("featSums")(0).as("f0"), col("featSums")(1).as("f1"),
            col("featSums")(2).as("f2"), col("featSums")(3).as("f3"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |s AS (SELECT doc_id, (i - 1) % 4 AS j,
             |        ascii(substr(text, CAST(i AS INT), 1)) AS v
             |      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |            FROM b)),
             |f AS (SELECT doc_id,
             |        CAST(sum(CASE WHEN j = 0 THEN v ELSE 0 END) AS BIGINT) AS f0,
             |        CAST(sum(CASE WHEN j = 1 THEN v ELSE 0 END) AS BIGINT) AS f1,
             |        CAST(sum(CASE WHEN j = 2 THEN v ELSE 0 END) AS BIGINT) AS f2,
             |        CAST(sum(CASE WHEN j = 3 THEN v ELSE 0 END) AS BIGINT) AS f3
             |      FROM s GROUP BY 1)
             |SELECT b.doc_id,
             |  CASE ascii(substr(text, 1, 1)) % 3 WHEN 0 THEN 'img'
             |    WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
             |  CAST((n % 64 + 1) * 16 AS BIGINT) AS width,
             |  CAST((n % 48 + 1) * 9 AS BIGINT) AS height,
             |  f0, f1, f2, f3
             |FROM b JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("m8_image_decode",
      // REAL compressed-image decode through javax.imageio (public
      // JDK): payloads are re-encoded as genuine PNGs (byte i →
      // raster pixel i with r=g=b=value, zero-padded rows — see
      // Multimodal.encodeGrayPng) and decoded by ImageIoCodec through
      // the same partition-wise stage as m2. BT.601 luma of (v,v,v)
      // is exactly v and PNG is lossless, so the decoded feature sums
      // must equal the plain positional byte sums — the oracle
      // verifies an actual PNG encode→decode round trip without
      // itself decoding PNG.
      (s, d) => {
        // spreadSmall: the real-codec encode+decode below is the
        // heavy stage, and a sub-split documents table scans as ONE
        // task (r16 — 2.8 s single-core measured); no-op at scale
        val payload = Tables.spreadSmall(s, d, "documents", Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        val pngs = Multimodal.encodeGrayPng(payload, "doc_id", "payload", width = 32)
        Multimodal.decode(pngs, "id", "png", nFeat = 4,
            codecs = Seq(graft.operators.ImageIoCodec))
          .select(col("id").as("doc_id"), col("fmt"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("featSums")(0).as("f0"), col("featSums")(1).as("f1"),
            col("featSums")(2).as("f2"), col("featSums")(3).as("f3"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |s AS (SELECT doc_id, (i - 1) % 4 AS j,
             |        ascii(substr(text, CAST(i AS INT), 1)) AS v
             |      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |            FROM b)),
             |f AS (SELECT doc_id,
             |        CAST(sum(CASE WHEN j = 0 THEN v ELSE 0 END) AS BIGINT) AS f0,
             |        CAST(sum(CASE WHEN j = 1 THEN v ELSE 0 END) AS BIGINT) AS f1,
             |        CAST(sum(CASE WHEN j = 2 THEN v ELSE 0 END) AS BIGINT) AS f2,
             |        CAST(sum(CASE WHEN j = 3 THEN v ELSE 0 END) AS BIGINT) AS f3
             |      FROM s GROUP BY 1)
             |SELECT b.doc_id, 'png' AS fmt, CAST(32 AS BIGINT) AS width,
             |  CAST(greatest((n + 31) // 32, 1) AS BIGINT) AS height,
             |  coalesce(f0, 0) AS f0, coalesce(f1, 0) AS f1,
             |  coalesce(f2, 0) AS f2, coalesce(f3, 0) AS f3
             |FROM b LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("m10_jpeg_decode",
      // LOSSY-codec decode tier (round 10; pure-Scala in round 11):
      // payloads re-encoded as REAL JPEGs (same gray raster as m8's
      // PNGs) through the engine-deterministic GrayJpeg codec and
      // decoded by GrayJpegCodec — encode ∘ decode is bit-identical
      // across JVMs/platforms (strict FP + StrictMath DCT basis), so
      // the round-10 same-JVM caveat is retired and GrayJpegSpec pins
      // GOLDEN decoded rasters. The oracle still pins decode
      // INVARIANTS (DuckDB cannot replay a DCT): geometry derived
      // from the byte count in SQL, and a constant-1 deviation flag —
      // the decoded luma total must sit within 4 gray levels per
      // pixel of the original byte total (tightened from 16: the
      // in-house q85 quantization keeps block-mean error well under
      // one level; AC basis functions sum to zero per block, so sums
      // see DC error only). A decode regression past the bound flips
      // dev_ok and fails the hash gate.
      (s, d) => {
        // spreadSmall: see m8 — full-width JPEG round-trip (r16)
        val payload = Tables.spreadSmall(s, d, "documents", Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        // stub decode of the raw payload = exact positional byte sums
        val orig = Multimodal.decode(payload, "doc_id", "payload", nFeat = 1).toDF()
          .select(col("id").as("doc_id"), col("featSums")(0).as("orig_sum"))
        val jp = Multimodal.encodeGrayJpeg(payload, "doc_id", "payload", width = 32)
        val dec = Multimodal.decode(jp, "id", "jpg", nFeat = 1,
            codecs = Seq(graft.operators.GrayJpegCodec)).toDF()
          .select(col("id").as("doc_id"), col("fmt"),
            col("width").cast("long").as("width"),
            col("height").cast("long").as("height"),
            col("featSums")(0).as("luma_sum"))
        dec.join(orig, Seq("doc_id"))
          .select(col("doc_id"), col("fmt"), col("width"), col("height"),
            (abs(col("luma_sum") - col("orig_sum")) <=
              col("width") * col("height") * 4).cast("long").as("dev_ok"))
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |SELECT doc_id, 'jpeg' AS fmt, CAST(32 AS BIGINT) AS width,
             |  CAST(greatest((n + 31) // 32, 1) AS BIGINT) AS height,
             |  CAST(1 AS BIGINT) AS dev_ok
             |FROM b ORDER BY doc_id""".stripMargin)),

    Q("m11_header_meta",
      // HEADER-ONLY metadata extraction over REAL codec output: even
      // doc_ids ride as genuine PNGs, odd as genuine JPEGs, and the
      // sniffer reads signature + IHDR / SOI + SOF segment walk ONLY
      // — never a raster. The oracle derives the expected geometry
      // from the original byte count (width fixed at 32, height =
      // ceil(n/32), 8-bit) — a parser regression on either format's
      // header layout fails the hash gate. This is the 100-TB
      // metadata pass: a corpus profile must not decode the corpus.
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val pngs = Multimodal.encodeGrayPng(
          payload.filter(col("doc_id") % 2 === 0), "doc_id", "payload", width = 32)
          .select(col("id"), col("png").as("bin"))
        val jpgs = Multimodal.encodeGrayJpeg(
          payload.filter(col("doc_id") % 2 === 1), "doc_id", "payload", width = 32)
          .select(col("id"), col("jpg").as("bin"))
        Multimodal.sniffHeaders(pngs.unionByName(jpgs), "id", "bin")
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
             |SELECT doc_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
             |  CAST(32 AS BIGINT) AS width,
             |  CAST(greatest((n + 31) // 32, 1) AS BIGINT) AS height,
             |  CAST(8 AS BIGINT) AS depth
             |FROM b ORDER BY doc_id""".stripMargin)),

    Q("m12_resize",
      // Integer box-filter downsample (32-wide raster, 4x4 blocks →
      // 8-wide) — the brief's resize stage, exact end-to-end: edge
      // blocks divide by their real pixel count, and the oracle
      // replays every output pixel positionally in SQL (the
      // position-weighted checksum catches a single misplaced
      // pixel).
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        Multimodal.resizeGray(payload, "doc_id", "payload", width = 32, factor = 4)
          .orderBy("doc_id")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |dims AS (SELECT doc_id, greatest((n + 31) // 32, 1) AS h FROM b),
             |s AS (SELECT doc_id, ((i - 1) % 32) // 4 AS bx, ((i - 1) // 32) // 4 AS by,
             |        ascii(substr(text, CAST(i AS INT), 1)) AS v
             |      FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |            FROM b)),
             |blk AS (SELECT doc_id, bx, by, CAST(sum(v) AS BIGINT) AS sv
             |        FROM s GROUP BY 1, 2, 3),
             |pxv AS (SELECT blk.doc_id, bx, by,
             |          sv // (4 * least(4, d.h - by * 4)) AS pv
             |        FROM blk JOIN dims d USING (doc_id)),
             |agg AS (SELECT doc_id, CAST(sum(pv) AS BIGINT) AS px_sum,
             |          CAST(sum((by * 8 + bx) * pv) AS BIGINT) AS px_pos_sum
             |        FROM pxv GROUP BY 1)
             |SELECT d.doc_id, CAST(8 AS BIGINT) AS out_w,
             |  CAST((d.h + 3) // 4 AS BIGINT) AS out_h,
             |  coalesce(px_sum, 0) AS px_sum, coalesce(px_pos_sum, 0) AS px_pos_sum
             |FROM dims d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("m13_mp4_meta",
      // ISO-BMFF (MP4) HEADER-ONLY box walk (round 12;
      // Multimodal.mp4Meta): ftyp brand, moov→mvhd duration (ms via
      // the recorded timescale), trak count, and max 16.16-fixed tkhd
      // geometry — never a byte of sample data; even ids place a
      // 64-bit-largesize mdat BEFORE moov (the streaming-capture
      // layout the walk must step over), mvhd/tkhd alternate
      // version 0/1. The stub container derives every field from the
      // documents table, so the oracle recomputes the expected
      // metadata without parsing a byte — a walk regression on any
      // box layout fails the hash gate.
      (s, d) => {
        val specs = Tables.documents(s, d).select(col("doc_id"),
          length(col("text")).cast("long").as("dur"),
          (lit(1) + col("doc_id") % 3).cast("int").as("nt"),
          (lit(320) + (col("doc_id") % 4) * 16).as("w"),
          (lit(180) + (col("doc_id") % 5) * 12).as("h"))
        val stubs = Multimodal.encodeMp4Stub(specs, "doc_id", "dur", "nt", "w", "h")
        Multimodal.mp4Meta(stubs, "id", "bin").orderBy("doc_id")
      },
      Some("""SELECT doc_id, 'isom' AS brand,
             |  CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
             |  CAST(length(text) AS BIGINT) AS duration_ms,
             |  CAST(320 + (doc_id % 4) * 16 AS BIGINT) AS width,
             |  CAST(180 + (doc_id % 5) * 12 AS BIGINT) AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    Q("m14_mp4_sample_map",
      // ISO-BMFF SAMPLE TABLES, header-only (round 13+14; Multimodal
      // .mp4SampleMap): stts/ctts/stsc/stsz/stco + elst joined into
      // one row per sample — chunk assignment from stsc run-lengths,
      // size from stsz, dts from cumulative stts, pts = dts + the
      // ctts composition offset shifted by the elst edit list (both
      // in mdhd-timescale ms), and the stco offset resolved RELATIVE
      // to the mdat body the same walk located (the stub wrote
      // absolute offsets; recovering the relative form verifies stco
      // end-to-end). The sampled stub derives every table from the
      // document text (32-byte samples, 4 per chunk, 40 ms deltas;
      // ODD track ids carry a +25 ctts, track ids divisible by 3 an
      // elst media_time=20; mdat before moov via 64-bit largesize on
      // even ids, after on odd), so the oracle recomputes the full
      // map from text length alone — never a byte parsed.
      (s, d) => {
        val specs = Tables.documents(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload"),
          (lit(1) + col("doc_id") % 3).cast("int").as("nt"))
        val stubs = Multimodal.encodeMp4Sampled(specs, "doc_id", "payload", "nt")
        Multimodal.mp4SampleMap(stubs, "id", "bin").toDF()
          .orderBy("doc_id", "track_id", "sample_idx")
      },
      Some("""WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
             |        1 + doc_id % 3 AS nt FROM documents),
             |s AS (SELECT doc_id, nt, n,
             |        unnest(generate_series(0, (n + 31) // 32 - 1)) AS si
             |      FROM b WHERE n > 0),
             |t AS (SELECT doc_id, si, n,
             |        unnest(generate_series(1, nt)) AS tid FROM s)
             |SELECT doc_id, CAST(tid AS BIGINT) AS track_id,
             |  CAST(si AS BIGINT) AS sample_idx,
             |  CAST(si // 4 AS BIGINT) AS chunk_idx,
             |  CAST(least(32, n - si * 32) AS BIGINT) AS size,
             |  CAST(si * 40 AS BIGINT) AS dts_ms,
             |  CAST(si * 40
             |    + CASE WHEN tid % 2 = 1 THEN 25 ELSE 0 END
             |    - CASE WHEN tid % 3 = 0 THEN 20 ELSE 0 END AS BIGINT) AS pts_ms,
             |  CAST(si * 32 AS BIGINT) AS rel_offset
             |FROM t ORDER BY 1, 2, 3""".stripMargin)),

    Q("m15_mp4_demux",
      // Container-real frame extraction (round 13; Multimodal
      // .mp4SampleDemux): each sample's byte range is resolved through
      // the header-only sample map and sliced out of mdat — the m3
      // frame-sampling semantics driven by the container's OWN
      // stts/stsc/stsz/stco instead of raw-payload arithmetic. Exact
      // per-sample byte sums pin walk + offset resolution + slice in
      // one oracle (a one-byte offset error flips a sum). Track 1 is
      // odd, so its pts carries the round-14 ctts offset (+25 ms).
      (s, d) => {
        val specs = Tables.documents(s, d).select(col("doc_id"),
          col("text").cast("binary").as("payload"),
          (lit(1) + col("doc_id") % 3).cast("int").as("nt"))
        val stubs = Multimodal.encodeMp4Sampled(specs, "doc_id", "payload", "nt")
        Multimodal.mp4SampleDemux(stubs, "id", "bin", track = 1L)
          .orderBy("doc_id", "sample_idx")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |f AS (SELECT doc_id, text, n,
             |        unnest(generate_series(0, (n + 31) // 32 - 1)) AS si
             |      FROM b WHERE n > 0),
             |sel AS (SELECT doc_id, text, si, least(n - si * 32, 32) AS nb
             |        FROM f),
             |pos AS (SELECT doc_id, si, nb,
             |        ascii(substr(text, CAST(si * 32 + i AS INT), 1)) AS v
             |      FROM sel, unnest(generate_series(1, nb)) AS t(i))
             |SELECT doc_id, CAST(1 AS BIGINT) AS track_id,
             |  CAST(si AS BIGINT) AS sample_idx,
             |  CAST(si * 40 + 25 AS BIGINT) AS pts_ms,
             |  CAST(nb AS BIGINT) AS n_bytes,
             |  CAST(sum(v) AS BIGINT) AS byte_sum
             |FROM pos GROUP BY 1, 2, 3, 4, 5 ORDER BY 1, 3""".stripMargin)),

    Q("m3_frame_sample",
      // Frame sampling over video-like payloads (Multimodal
      // .frameSample): 32-byte frames, every 2nd sampled, exact
      // per-frame byte sums — the partition-wise demux/sample stage
      // of a multimodal pipeline, oracle-verified positionally (the
      // ascii-byte identity m1/m2 established for this corpus).
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        Multimodal.frameSample(payload, "doc_id", "payload", frameBytes = 32, stride = 2)
          .select(col("id").as("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
            col("n_bytes").cast("long").as("n_bytes"), col("byte_sum"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |f AS (SELECT doc_id, text, n,
             |        unnest(generate_series(0, (n + 31) // 32 - 1)) AS fi
             |      FROM b WHERE n > 0),
             |sel AS (SELECT doc_id, text, fi, least(n - fi * 32, 32) AS nb
             |        FROM f WHERE fi % 2 = 0),
             |pos AS (SELECT doc_id, fi, nb,
             |        ascii(substr(text, CAST(fi * 32 + i AS INT), 1)) AS v
             |      FROM sel, unnest(generate_series(1, nb)) AS t(i))
             |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
             |  CAST(nb AS BIGINT) AS n_bytes, CAST(sum(v) AS BIGINT) AS byte_sum
             |FROM pos GROUP BY 1, 2, 3 ORDER BY 1, 2""".stripMargin)),

    Q("m5_av_sync",
      // A/V stream alignment — the multimodal join: "video" frames
      // (32-byte frames, every 2nd) matched to the nearest preceding
      // "audio" frame (16-byte frames, every 3rd) of the SAME
      // payload by byte-offset timestamp, tolerance 64 bytes — a
      // backward as-of join per media id, the exact shape real
      // frame-PTS alignment takes. Composes the frameSample demux
      // with AsofJoin.directed; exact-integer byte sums ride along
      // so the oracle verifies the full demux+align pipeline.
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val video = Multimodal.frameSample(payload, "doc_id", "payload", 32, 2)
          .toDF().select(col("id"), col("frame_idx").cast("long").as("vidx"),
            (col("frame_idx") * 32).cast("long").as("vts"),
            col("byte_sum").as("v_sum"))
        val audio = Multimodal.frameSample(payload, "doc_id", "payload", 16, 3)
          .toDF().select(col("id"),
            (col("frame_idx") * 16).cast("long").as("ats"),
            col("frame_idx").cast("long").as("aidx"),
            col("byte_sum").as("a_sum"))
        graft.operators.AsofJoin.directed(video, audio, "id", "vts", "ats",
            forward = false, tolerance = Some(64L))
          .select(col("id").as("doc_id"), col("vidx"), col("v_sum"),
            col("aidx"), col("a_sum"), col("asof_gap"))
          .orderBy("doc_id", "vidx")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n
             |        FROM documents),
             |vf AS (SELECT doc_id, fi AS vidx, fi * 32 AS vts,
             |    least(n - fi * 32, 32) AS nb, text
             |  FROM (SELECT doc_id, text, n,
             |        unnest(generate_series(0, (n + 31) // 32 - 1)) AS fi
             |      FROM b WHERE n > 0) WHERE fi % 2 = 0),
             |vs AS (SELECT doc_id, vidx, vts, CAST(sum(v) AS BIGINT) AS v_sum
             |  FROM (SELECT doc_id, vidx, vts, nb,
             |      ascii(substr(text, CAST(vts + i AS INT), 1)) AS v
             |    FROM vf, unnest(generate_series(1, nb)) AS t(i))
             |  GROUP BY 1, 2, 3),
             |af AS (SELECT doc_id, fi AS aidx, fi * 16 AS ats,
             |    least(n - fi * 16, 16) AS nb, text
             |  FROM (SELECT doc_id, text, n,
             |        unnest(generate_series(0, (n + 15) // 16 - 1)) AS fi
             |      FROM b WHERE n > 0) WHERE fi % 3 = 0),
             |asum AS (SELECT doc_id, aidx, ats, CAST(sum(v) AS BIGINT) AS a_sum
             |  FROM (SELECT doc_id, aidx, ats, nb,
             |      ascii(substr(text, CAST(ats + i AS INT), 1)) AS v
             |    FROM af, unnest(generate_series(1, nb)) AS t(i))
             |  GROUP BY 1, 2, 3),
             |m AS (SELECT vs.doc_id, vs.vidx, vs.v_sum, a.aidx, a.a_sum,
             |    vs.vts - a.ats AS gap,
             |    row_number() OVER (PARTITION BY vs.doc_id, vs.vidx
             |      ORDER BY a.ats DESC, a.aidx DESC, a.a_sum DESC) AS rk
             |  FROM vs LEFT JOIN asum a ON a.doc_id = vs.doc_id AND a.ats <= vs.vts)
             |SELECT doc_id, vidx, v_sum,
             |  CASE WHEN gap <= 64 THEN aidx END AS aidx,
             |  CASE WHEN gap <= 64 THEN a_sum END AS a_sum,
             |  CASE WHEN gap <= 64 THEN gap END AS asof_gap
             |FROM m WHERE rk = 1
             |ORDER BY doc_id, vidx""".stripMargin)),

    Q("t7_pii_scrub",
      // PII redaction over the standard scrub classes: email, phone,
      // SSN-shaped ids, IPv4, and card numbers with LUHN validation.
      // The synthetic corpus carries no PII, so a deterministic
      // contact line is appended per doc before scrubbing — including
      // a card number whose Luhn CHECK DIGIT is computed in-query and
      // a deliberately invalid sibling, so the validator provably
      // separates them (n_cc_valid counts Luhn passes only; redaction
      // is deliberately conservative and masks every 16-digit run —
      // over-redaction is the safe default for training data).
      // Patterns are RE2-safe with [.] instead of backslash-dot (the
      // escape a Spark SQL literal would eat and DuckDB would not);
      // the Luhn sum is one unrolled substr/CASE fragment both
      // engines parse identically. DuckDB needs the 'g' flag to match
      // Spark's replace-all semantics.
      (s, d) => Tables.documents(s, d)
        .withColumn("cc15",
          expr("'4' || lpad(CAST(doc_id % 100000000000000 AS STRING), 14, '0')"))
        .withColumn("ccd", expr(s"(10 - ${luhnSum("cc15", 15)} % 10) % 10"))
        .withColumn("raw", expr(
          "concat(text, ' contact user', CAST(doc_id AS STRING), " +
            "'@mail.example or call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
            "' ssn 123-45-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), " +
            "' ip 10.', CAST(doc_id % 256 AS STRING), '.0.', CAST(doc_id % 200 + 1 AS STRING), " +
            "' card ', cc15, CAST(ccd AS STRING), " +
            "' ref ', cc15, CAST((ccd + 1) % 10 AS STRING))"))
        .select(col("doc_id"),
          expr("size(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+', 0))")
            .as("n_emails"),
          expr("size(regexp_extract_all(raw, '555-[0-9]{4}', 0))").as("n_phones"),
          expr("size(regexp_extract_all(raw, '[0-9]{3}-[0-9]{2}-[0-9]{4}', 0))")
            .as("n_ssn"),
          expr("size(regexp_extract_all(raw, " +
            "'[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', 0))").as("n_ipv4"),
          expr("size(regexp_extract_all(raw, '[0-9]{16}', 0))").as("n_cc_shaped"),
          expr(s"size(filter(regexp_extract_all(raw, '[0-9]{16}', 0), " +
            s"x -> ${luhnSum("x", 16)} % 10 = 0))").as("n_cc_valid"),
          expr("regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(" +
            "raw, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>'), " +
            "'555-[0-9]{4}', '<PHONE>'), " +
            "'[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>'), " +
            "'[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>'), " +
            "'[0-9]{16}', '<CC16>')").as("scrubbed"))
        .orderBy("doc_id"),
      Some(s"""WITH c0 AS (SELECT doc_id, text,
              |    '4' || lpad(CAST(doc_id % 100000000000000 AS STRING), 14, '0') AS cc15
              |  FROM documents),
              |c1 AS (SELECT doc_id, text, cc15,
              |    (10 - ${luhnSum("cc15", 15)} % 10) % 10 AS ccd FROM c0),
              |raw AS (SELECT doc_id,
              |  text || ' contact user' || CAST(doc_id AS STRING)
              |    || '@mail.example or call 555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
              |    || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')
              |    || ' ip 10.' || CAST(doc_id % 256 AS STRING) || '.0.' || CAST(doc_id % 200 + 1 AS STRING)
              |    || ' card ' || cc15 || CAST(ccd AS STRING)
              |    || ' ref ' || cc15 || CAST((ccd + 1) % 10 AS STRING) AS raw
              |  FROM c1)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+')) AS INT) AS n_emails,
              |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS INT) AS n_phones,
              |  CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS INT) AS n_ssn,
              |  CAST(len(regexp_extract_all(raw, '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS INT) AS n_ipv4,
              |  CAST(len(regexp_extract_all(raw, '[0-9]{16}')) AS INT) AS n_cc_shaped,
              |  CAST(len(list_filter(regexp_extract_all(raw, '[0-9]{16}'),
              |    x -> ${luhnSum("x", 16)} % 10 = 0)) AS INT) AS n_cc_valid,
              |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              |    raw, '[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
              |    '555-[0-9]{4}', '<PHONE>', 'g'),
              |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
              |    '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g'),
              |    '[0-9]{16}', '<CC16>', 'g') AS scrubbed
              |FROM raw ORDER BY doc_id""".stripMargin)),

    Q("t8_repetition",
      // Repetition / diversity metrics per document: type-token ratio
      // and top-token share in exact integer basis points (the div
      // trick from t2 — never round a ratio across engines).
      (s, d) => {
        val tok = Tables.documents(s, d).select(col("doc_id"),
          explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))
        tok.groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id").agg(
            sum("c").as("total"), count(lit(1)).as("n_distinct"), max("c").as("max_c"))
          .select(col("doc_id"), col("total"), col("n_distinct"),
            expr("n_distinct * 10000 div total").as("ttr_bp"),
            expr("max_c * 10000 div total").as("top_bp"))
          .orderBy("doc_id")
      },
      Some("""WITH tk AS (SELECT doc_id, t.tok FROM documents,
             |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
             |c AS (SELECT doc_id, tok, count(*) AS c FROM tk GROUP BY 1, 2),
             |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
             |    CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS max_c
             |  FROM c GROUP BY 1)
             |SELECT doc_id, total, n_distinct,
             |  n_distinct * 10000 // total AS ttr_bp,
             |  max_c * 10000 // total AS top_bp
             |FROM a ORDER BY doc_id""".stripMargin)),

    Q("smp4_bottomk_sample",
      // Bottom-k (order-statistics) uniform sample: the k documents
      // with the smallest md5-derived hash — a coordination-free
      // exact-size uniform sample (each partition contributes its
      // local bottom-k; only k rows per partition reach the final
      // merge). The same sketch family (k minimum values) underlies
      // distinct-count and set-similarity estimation. House md5 hash
      // so the oracle replays the ranking exactly.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
            .as("hk"))
        .orderBy("hk", "doc_id").limit(25)
        .select("doc_id", "lang", "hk"),
      Some(s"""SELECT doc_id, lang, hk FROM (
              |  SELECT doc_id, lang,
              |    ${(0 until 8).map { m =>
                     s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${m + 1}, 1)) - 1) * ${1L << (4 * (7 - m))}"
                   }.mkString("(", " + ", ")")} AS hk
              |  FROM documents)
              |ORDER BY hk, doc_id LIMIT 25""".stripMargin)),

    Q("smp3_weighted_sample",
      // Length-weighted deterministic Bernoulli sample: acceptance
      // probability ∝ n_chars (capped at 90%), same overflow-safe
      // masked multiplicative hash as smp1/smp2.
      (s, d) => Tables.documents(s, d)
        .filter(expr(
          "((doc_id % 1000003) * 2654435761) % 10000 < least(9000, n_chars * 12)"))
        .groupBy("lang").agg(
          count(lit(1)).as("cnt"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("first_id"))
        .orderBy("lang"),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS cnt,
             |CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |CAST(min(doc_id) AS BIGINT) AS first_id
             |FROM documents
             |WHERE ((doc_id % 1000003) * 2654435761) % 10000 < least(9000, n_chars * 12)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("smp9_priority_sample",
      // PRIORITY SAMPLING (Duffield–Lund–Thorup): each doc draws
      // priority w/u (w = n_chars, u = md5-uniform in (0,1]); the k
      // highest priorities are a weighted-without-replacement sample
      // whose DLT estimator max(w, tau) — tau the (k+1)-th priority —
      // is unbiased for any subset-sum query. INTEGER-exact: priority
      // = (w << 32) div (hk+1) so both engines rank identically, and
      // DISTRIBUTED: sample and tau ride top-(k+1) (TakeOrdered —
      // per-partition heads, never a global sort/window at any
      // scale). The bounded-size weighted companion to smp3's
      // Bernoulli (unbounded size) and smp4's uniform bottom-k.
      (s, d) => {
        val p = Tables.documents(s, d).select(
          col("doc_id"), col("lang"), col("n_chars"),
          expr("CAST(n_chars AS BIGINT) * 4294967296 DIV (" +
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)" +
            " + 1)").as("priority"))
        val top26 = p.orderBy(col("priority").desc, col("doc_id")).limit(26)
        val tau = top26.agg(min("priority").as("tau")) // the 26th priority
        top26.orderBy(col("priority").desc, col("doc_id")).limit(25)
          .crossJoin(org.apache.spark.sql.functions.broadcast(tau))
          .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"),
            greatest(col("n_chars").cast("long"), col("tau")).as("w_est"))
          .orderBy(col("priority").desc, col("doc_id"))
      },
      Some(s"""WITH p AS (
              |  SELECT doc_id, lang, n_chars,
              |    CAST(n_chars AS BIGINT) * 4294967296 // (
              |      ${(0 until 8).map { m =>
                       s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${m + 1}, 1)) - 1) * ${1L << (4 * (7 - m))}"
                     }.mkString("(", " + ", ")")} + 1) AS priority
              |  FROM documents),
              |top26 AS (SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT 26),
              |tau AS (SELECT min(priority) AS tau FROM top26)
              |SELECT doc_id, lang, n_chars, priority,
              |  CAST(greatest(n_chars, tau) AS BIGINT) AS w_est
              |FROM (SELECT * FROM top26 ORDER BY priority DESC, doc_id LIMIT 25), tau
              |ORDER BY priority DESC, doc_id""".stripMargin)),

    Q("s5_knn_pq",
      // Product-quantization ANN — the compression tier: 64-dim
      // floats stored as 8 4-bit codes (8 bytes/vector), search over
      // codebook reconstructions, top-40 candidates reranked at full
      // precision. The codebook is md5-derived (multiples of 1/16 —
      // exact in float and double), every stage is a per-row
      // fixed-order expression tree, so the oracle rebuilds codes,
      // reconstructions, candidate cut, AND rerank bit-for-bit.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnPq(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s5OracleSql)),

    Q("s10_knn_ivfpq",
      // The composed FAISS-style IVF-PQ deployment tier: IVF cells
      // bound the candidate set, PQ codes rank inside the probed
      // cells (8 bytes scanned per corpus vector), top-40 reranked at
      // full precision. lloydIters = 0 keeps every stage a
      // deterministic expression tree, so the oracle is the s3 cell
      // CTEs composed with the s5 code CTEs — bit-for-bit, no ε.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfPq(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, lloydIters = 0).orderBy("query_id", "rk")
      },
      Some(s10OracleSql)),

    Q("s11_knn_graph",
      // Graph-refined ANN (round 7) — the GRAPH-index tier the
      // IVF/LSH/PQ lineup lacked: an approximate corpus kNN graph
      // (top-5 cosine neighbors among LSH bucket-mates) refines each
      // query's bucket-probe candidates by ONE
      // neighbor-of-a-neighbor hop before the exact rerank — the
      // HNSW/NN-Descent reachability principle as joins
      // (Similarity.knnGraph). Deterministic end-to-end, so the
      // oracle replays planes, buckets, the graph, the expansion,
      // and the rerank bit-for-bit; the recall-⊇-s2 claim is
      // spec-pinned separately.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnGraph(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, m = 5).orderBy("query_id", "rk")
      },
      Some(s11OracleSql)),

    Q("s21_knn_graph_beam",
      // Multi-hop beam-search graph ANN (round 12;
      // Similarity.knnGraphBeam): s11's single neighbor-of-a-neighbor
      // hop iterated HNSW-style — hop 1 is the FULL seed expansion
      // (candidates ⊇ s11 by construction), hop 2 expands only each
      // query's top-4 beam, anti-joined against the visited set
      // before scoring. Per-query cost after hop 1 is beam × m, not
      // corpus-sized. Deterministic, so the oracle unrolls both hops.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnGraphBeam(e, e.filter(col("vec_id") < 5), "vec_id",
          "embedding", k = 10, m = 5, beam = 4, hops = 2)
          .orderBy("query_id", "rk")
      },
      Some(s21OracleSql)),

    Q("s12_knn_incremental",
      // INCREMENTAL ANN maintenance (round 8) — the append path a
      // 100-TB vector store actually runs: the IVF coarse quantizer
      // is trained on the standing base (vec_id < 400) and FROZEN;
      // the batch (vec_id >= 400) appends by nearest-standing-cell
      // assignment only — O(batch × nCells), zero base touches, no
      // retrain (Similarity.knnIvfIncremental). With lloydIters=0
      // the seeds are the 16 smallest ids, which live in the base,
      // so incremental == full rebuild over base ∪ batch — the
      // oracle deliberately replays the REBUILD in SQL (d15/d20's
      // incremental-equals-full gate, applied to ANN).
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, lloydIters = 0).orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv
              |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
              |ad AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.cv)
              |      + list_dot_product(seeds.cv, seeds.cv) AS dist
              |  FROM ce, seeds),
              |crk AS (SELECT vec_id, cell,
              |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
              |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
              |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
              |cand AS (SELECT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
              |sc AS (SELECT qid, cid,
              |  list_dot_product(qv.v, cv.v)
              |    / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("s12b_knn_incremental_refined",
      // The PRODUCTION append path (round 8): the standing quantizer
      // is Lloyd-REFINED on the base corpus and frozen; the batch
      // appends by nearest-standing-cell assignment, queries probe
      // the merged index. Refined centroids average floats across
      // rows (engine-specific sum order), so like s3b the oracle
      // pins the per-query recall CONTRACT instead of the emitted
      // set: 10 emitted, all 10 within eps=0.1 of the query's
      // 10th-exact cosine (the s1-verified brute tier supplies the
      // threshold).
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
        val inc = Similarity.knnIvfIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400), q,
          "vec_id", "embedding", k = 10, lloydIters = 2)
        val kth = Similarity.knnBrute(e, q, "vec_id", "embedding", k = 10)
          .filter(col("rk") === 10).select(col("query_id"), col("cosine").as("kth"))
        inc.join(kth, Seq("query_id"))
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_emitted"),
            sum((col("cosine") >= col("kth") - 0.1).cast("long")).as("n_within_eps"))
          .orderBy("query_id")
      },
      Some("""SELECT vec_id AS query_id, CAST(10 AS BIGINT) AS n_emitted,
             |CAST(10 AS BIGINT) AS n_within_eps
             |FROM embeddings WHERE vec_id < 5 ORDER BY 1""".stripMargin)),

    Q("s13_knn_sq",
      // Scalar-quantization ANN (round 8) — the compression tier
      // production vector stores deploy MOST (FAISS SQ8): 8-bit
      // affine codes against per-dimension corpus [min,max] (4x
      // smaller than float32, zero codebook training), asymmetric
      // midpoint-dequant scoring, full-precision rerank of the top
      // rerank*k (Similarity.knnSq). min/max are exact
      // order-independent aggregates and every score is a fixed-order
      // double fold (the order list_dot_product evaluates), so the
      // oracle replays stats, codes, dequant, cut, and rerank
      // bit-for-bit.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnSq(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s13OracleSql)),

    Q("s14_knn_ivfsq",
      // IVF-SQ composed tier (round 8) — cells bound the candidate
      // set (s3's deterministic assignment), global 8-bit scalar
      // codes rank inside probed cells (s13's encode — zero codebook
      // training), full-precision rerank: the deployment layout that
      // pairs with s10's IVF-PQ when encode throughput matters more
      // than the last 2x of compression. lloydIters=0 keeps every
      // stage an expression tree; the oracle composes the s3 cell
      // CTEs with the s13 code CTEs bit-for-bit.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfSq(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s14OracleSql)),

    Q("s15_knn_ivfsq_incremental",
      // INCREMENTAL IVF-SQ (round 8) — s12's append path composed
      // with s13's codes: BOTH halves of the standing index frozen
      // on the base (coarse quantizer AND per-dim SQ stats — what a
      // production store snapshots at index build); the batch
      // appends by nearest-standing-cell + frozen-stats encode,
      // O(batch) work. The oracle replays the INCREMENTAL semantics
      // directly: stats CTE over the BASE rows only — deliberately
      // NOT a rebuild oracle (frozen stats differ from a retrain
      // when the batch extends a dimension's range; that staleness
      // is the documented trade until the next scheduled retrain).
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfSqIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |base AS (SELECT * FROM ce WHERE vec_id < 400),
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS scv
              |  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 16)),
              |ad AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.scv)
              |      + list_dot_product(seeds.scv, seeds.scv) AS dist
              |  FROM ce, seeds),
              |crk AS (SELECT vec_id, cell,
              |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
              |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
              |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
              |st AS (SELECT d, min(v[d]) AS lo, max(v[d]) AS hi
              |  FROM base, (SELECT unnest(generate_series(1, 64)) AS d) ds GROUP BY d),
              |mm AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his FROM st),
              |codes AS (SELECT vec_id, list_transform(generate_series(1, 64),
              |    d -> CASE WHEN his[d] = los[d] THEN 0
              |         ELSE least(255, greatest(0, CAST(floor((v[d] - los[d]) / (his[d] - los[d]) * 256) AS INT))) END) AS cd
              |  FROM ce, mm),
              |recon AS (SELECT vec_id,
              |    list_transform(generate_series(1, 64),
              |      d -> CAST(CAST(los[d] + (cd[d] + 0.5) * (his[d] - los[d]) / 256.0 AS REAL) AS DOUBLE)) AS rv
              |  FROM codes, mm),
              |cand AS (SELECT DISTINCT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
              |ax AS (SELECT qid, cid,
              |    list_dot_product(r.rv, qv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(r.rv, r.rv))) AS apx
              |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN recon r ON r.vec_id = cid),
              |cut AS (SELECT qid, cid, apx FROM (
              |    SELECT qid, cid, apx,
              |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
              |    FROM ax) WHERE ark <= 40),
              |sc AS (SELECT qid, cid, apx,
              |    list_dot_product(qv.v, cv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM cut JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |r AS (SELECT qid, cid, cos, apx,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("s16_knn_ivfpq_incremental",
      // INCREMENTAL IVF-PQ (round 9) — closes the incremental
      // taxonomy (s12 IVF-flat, s15 IVF-SQ, here IVF-PQ): coarse
      // quantizer frozen on the base (vec_id < 400), batch appended
      // by nearest-standing-cell + codebook encode, O(batch) work.
      // The PQ codebook is md5-derived and data-independent, so the
      // frozen-codebook posture is EXACT by construction (no
      // staleness trade, unlike s15's frozen stats); oracle = s15's
      // cell CTEs composed with s5's code CTEs, bit-for-bit.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnIvfPqIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |base AS (SELECT * FROM ce WHERE vec_id < 400),
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS scv
              |  FROM (SELECT * FROM base ORDER BY vec_id LIMIT 16)),
              |ad AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.scv)
              |      + list_dot_product(seeds.scv, seeds.scv) AS dist
              |  FROM ce, seeds),
              |crk AS (SELECT vec_id, cell,
              |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
              |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
              |qcells AS (SELECT vec_id AS qid, cell FROM crk WHERE rk <= 2 AND vec_id < 5),
              |pqc AS (SELECT mr.m, cr.c, ir.i,
              |    ((strpos('0123456789abcdef',
              |        substr(md5('pq_' || CAST(mr.m AS VARCHAR) || '_' || CAST(cr.c AS VARCHAR) || '_' || CAST(ir.i AS VARCHAR)), 1, 1)) - 1)
              |      - 7.5) / 8 AS comp
              |  FROM (SELECT unnest(generate_series(0, 7)) AS m) mr,
              |       (SELECT unnest(generate_series(0, 15)) AS c) cr,
              |       (SELECT unnest(generate_series(0, 7)) AS i) ir),
              |cbk AS (SELECT m, c, list(comp ORDER BY i) AS cl FROM pqc GROUP BY 1, 2),
              |sb AS (SELECT vec_id, mr.m, v[mr.m*8+1 : mr.m*8+8] AS sv
              |  FROM ce, (SELECT unnest(generate_series(0, 7)) AS m) mr),
              |dist2 AS (SELECT vec_id, sb.m, cbk.c,
              |    -2 * list_dot_product(sv, cl) + list_dot_product(cl, cl) AS d
              |  FROM sb JOIN cbk ON cbk.m = sb.m),
              |codes AS (SELECT vec_id, m, c AS code FROM (
              |    SELECT vec_id, m, c, d,
              |      row_number() OVER (PARTITION BY vec_id, m ORDER BY d, c) AS rk
              |    FROM dist2) WHERE rk = 1),
              |recon AS (SELECT codes.vec_id, flatten(list(cbk.cl ORDER BY codes.m)) AS rv
              |  FROM codes JOIN cbk ON cbk.m = codes.m AND cbk.c = codes.code GROUP BY 1),
              |cand AS (SELECT DISTINCT qid, cid FROM qcells JOIN corpus USING (cell) WHERE qid <> cid),
              |ax AS (SELECT qid, cid,
              |    list_dot_product(qv.v, r.rv)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(r.rv, r.rv))) AS apx
              |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN recon r ON r.vec_id = cid),
              |cut AS (SELECT qid, cid, apx FROM (
              |    SELECT qid, cid, apx,
              |      row_number() OVER (PARTITION BY qid ORDER BY apx DESC, cid) AS ark
              |    FROM ax) WHERE ark <= 40),
              |sc AS (SELECT qid, cid, apx,
              |    list_dot_product(qv.v, cv.v)
              |      / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM cut JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |r AS (SELECT qid, cid, cos, apx,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine, round(apx, 4) AS apx_cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("t22_rake_keywords",
      // RAKE keyword extraction (round 9; Rose et al. 2010): phrases
      // = maximal stopword-free token runs (per-doc prefix-count
      // segmentation — window bounded by doc length, never
      // cross-doc), word score = degree·10⁴ div frequency over the
      // whole corpus (map-side aggregates + join-back), phrase score
      // = Σ word scores, top phrase per doc via groupBy-max +
      // join-back (the hot-key shape, no window over all phrases).
      // All-integer scoring — the oracle replays every division.
      (s, d) => TextAnalysis.rakeKeywords(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id, u.i - 1 AS pos, s[CAST(u.i AS INT)] AS w
             |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS s
             |        FROM documents),
             |       unnest(generate_series(1, len(s))) AS u(i)),
             |fl AS (SELECT doc_id, pos, w,
             |    list_contains(['the','a','and','of','to','in','is','on','for','with'], w) AS is_stop
             |  FROM tk),
             |pid AS (SELECT doc_id, pos, w, is_stop,
             |    sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id FROM fl),
             |nst AS (SELECT doc_id, pos, w, phrase_id FROM pid WHERE NOT is_stop),
             |ph AS (SELECT doc_id, phrase_id, string_agg(w, ' ' ORDER BY pos) AS phrase,
             |    CAST(count(*) AS BIGINT) AS plen
             |  FROM nst GROUP BY 1, 2),
             |mem AS (SELECT n.doc_id, n.phrase_id, n.w, p.plen
             |  FROM nst n JOIN ph p USING (doc_id, phrase_id)),
             |wsc AS (SELECT w, CAST(sum(plen) AS BIGINT) * 10000
             |    // CAST(count(*) AS BIGINT) AS wscore_bp FROM mem GROUP BY 1),
             |sc AS (SELECT doc_id, phrase_id, CAST(sum(wscore_bp) AS BIGINT) AS score_bp
             |  FROM mem JOIN wsc USING (w) GROUP BY 1, 2),
             |scp AS (SELECT sc.doc_id, sc.phrase_id, sc.score_bp, ph.phrase
             |  FROM sc JOIN ph USING (doc_id, phrase_id)),
             |best AS (SELECT doc_id, max(score_bp) AS score_bp FROM scp GROUP BY 1)
             |SELECT scp.doc_id, min(scp.phrase) AS top_phrase, scp.score_bp
             |FROM scp JOIN best ON scp.doc_id = best.doc_id AND scp.score_bp = best.score_bp
             |GROUP BY 1, 3 ORDER BY 1""".stripMargin)),

    Q("t23_unicode_normalize",
      // Unicode NFC normalization (round 9) — the canonical-
      // composition pass every pipeline runs BEFORE hashing/dedup
      // (combining sequences and precomposed characters are the same
      // text but different bytes to xxhash64). Native NfcNormalize
      // expression (JVM Normalizer, the Unicode standard — DuckDB's
      // nfc_normalize is byte-identical); combining marks are
      // synthesized onto each doc so the transform is exercised on
      // every row. Output hashes the normalized BYTES.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          concat(substring(col("text"), 1, 10),
            lit(" café naivë")).as("raw"))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("n_raw"),
          org.apache.spark.sql.graftbridge.VectorFunctions.nfc(col("raw"))
            .as("norm_text"))
        .withColumn("n_nfc", length(col("norm_text")).cast("long"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
             |  nfc_normalize(raw) AS norm_text,
             |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc
             |FROM (SELECT doc_id,
             |    substr(text, 1, 10) || ' cafe' || chr(769) || ' naive' || chr(776) AS raw
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    Q("t13_code_prose",
      // Code-vs-prose classification by character-class composition —
      // the standard cheap filter a training-data pipeline runs
      // before language-specific tooling. All-integer basis points
      // via the translate-and-measure idiom (length minus length
      // after deleting the class), one narrow projection pass, no
      // shuffle at all until the output sort.
      (s, d) => {
        // `div`, not `/`: Column./ is DOUBLE division in Spark — the
        // oracle's `//` is integer division, and only `div` matches it
        def classBp(chars: String) = expr(
          s"(CAST(length(text) - length(translate(text, '$chars', '')) AS BIGINT)" +
            s" * 10000) div length(text)")
        Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"),
            classBp(";{}()=<>[]|&#").as("sym_bp"),
            classBp("0123456789").as("digit_bp"),
            classBp(" ").as("space_bp"))
          .withColumn("is_code",
            (col("sym_bp") > 150 || col("digit_bp") > 1500).cast("int"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  (length(text) - length(translate(text, ';{}()=<>[]|&#', ''))) * 10000
             |    // length(text) AS sym_bp,
             |  (length(text) - length(translate(text, '0123456789', ''))) * 10000
             |    // length(text) AS digit_bp,
             |  (length(text) - length(translate(text, ' ', ''))) * 10000
             |    // length(text) AS space_bp,
             |  CAST(CASE WHEN
             |    (length(text) - length(translate(text, ';{}()=<>[]|&#', ''))) * 10000
             |      // length(text) > 150
             |    OR (length(text) - length(translate(text, '0123456789', ''))) * 10000
             |      // length(text) > 1500
             |    THEN 1 ELSE 0 END AS INT) AS is_code
             |FROM documents WHERE length(text) > 0
             |ORDER BY doc_id""".stripMargin)),

    Q("s6_embedding_clusters",
      // Embedding density clustering for curation: the epsilon-ball
      // cosine graph (d5's verified pairs) closed under connectivity
      // — single-linkage clusters labeled by their minimum member,
      // every vector present (singletons self-labeled). Clustering
      // runs on GraphOps.connectedComponents (contraction, O(log n)
      // levels); at corpus scale the pair input swaps to the d5b LSH
      // path unchanged. Oracle: explicit-double cosine pairs +
      // unrolled relax/pointer-jump CC — the same closure convention
      // d11 established.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val pairs = Dedup.embeddingCosinePairs(e, "vec_id", "embedding", 0.4)
        val comp = graft.graph.GraphOps.connectedComponents(
          pairs.select(col("a").as("src"), col("b").as("dst")))
        e.select(col("vec_id"))
          .join(comp.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
          .select(coalesce(col("component"), col("vec_id")).as("cluster_id"),
            col("vec_id"))
          .orderBy("vec_id")
      },
      Some(s"""WITH $cosSql,
              |p AS (SELECT a.vec_id AS a, b.vec_id AS b
              |  FROM ce a JOIN ce b ON a.vec_id < b.vec_id
              |  WHERE list_dot_product(a.v, b.v)
              |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4),
              |e2 AS MATERIALIZED (SELECT a AS x, b AS y FROM p
              |  UNION SELECT b, a FROM p),
              |${ccFromE2Sql(16)}
              |SELECT coalesce(cc.component, ce.vec_id) AS cluster_id, ce.vec_id
              |FROM ce LEFT JOIN cc ON cc.node = ce.vec_id
              |ORDER BY vec_id""".stripMargin)),

    Q("m4_phash_dedup",
      // Perceptual-hash near-dup over the binary media column: 60-bit
      // average hash (bit j = positional byte-group sum j above the
      // payload mean, exact-integer compare), 4×15-bit hamming-LSH
      // bands (pigeonhole-complete for hamming ≤ 3), capped buckets,
      // popcount verify — image dedup plumbing with the stub codec;
      // a real decoder swaps in under the same banding/verify. The
      // oracle replays hash, bands, candidates, and verification.
      // CONTRACT NOTE (d4's cap trade, measured at the 10× clone-
      // heavy sweep): pigeonhole-completeness holds only while no
      // band bucket exceeds maxBucket=4096 — there the cap dropped
      // 612 of 399,147 true pairs (0.15%); cap disabled reproduces
      // the oracle exactly. At driver SFs the cap never binds, and
      // (round 8) the trade is observable: n_capped_buckets /
      // n_dropped_rows ride every pair row (CapObservabilitySpec
      // pins nonzero values when a cap binds).
      (s, d) => Multimodal.perceptualHashPairs(
          Tables.documents(s, d)
            .select(col("doc_id"), col("text").cast("binary").as("payload")),
          "doc_id", "payload", maxHamming = 3)
        .orderBy("a", "b"),
      Some("""WITH s AS (SELECT doc_id, (i - 1) % 60 AS j,
             |    ascii(substr(text, CAST(i AS INT), 1)) AS v
             |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |        FROM documents)),
             |g AS (SELECT doc_id, j, CAST(sum(v) AS BIGINT) AS sj FROM s GROUP BY 1, 2),
             |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tv FROM s GROUP BY 1),
             |ph AS (SELECT g.doc_id,
             |    CAST(sum(CASE WHEN sj * 60 > tv
             |         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS ph
             |  FROM g JOIN tot ON tot.doc_id = g.doc_id GROUP BY 1),
             |bd AS (SELECT doc_id, k, (ph >> (k*15)) & 32767 AS bh, ph
             |  FROM ph, (SELECT unnest(generate_series(0, 3)) AS k) ks),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.ph AS pa, y.ph AS pb
             |  FROM bd x JOIN bd y ON x.k = y.k AND x.bh = y.bh AND x.doc_id < y.doc_id),
             |bn AS (SELECT k, bh, CAST(count(*) AS BIGINT) AS n FROM bd GROUP BY 1, 2),
             |cst AS (SELECT
             |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_capped_buckets,
             |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN n - 4096 ELSE 0 END) AS BIGINT), 0) AS n_dropped_rows
             |  FROM bn)
             |SELECT a, b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming,
             |  cst.n_capped_buckets, cst.n_dropped_rows
             |FROM cand CROSS JOIN cst WHERE bit_count(xor(pa, pb)) <= 3
             |ORDER BY a, b""".stripMargin)),

    Q("m9_phash_real",
      // m4's perceptual-hash dedup with a REAL CODEC IN THE LOOP
      // (round 7): payloads round-trip through genuine PNG encode
      // (Multimodal.encodeGrayPng) and javax.imageio decode before
      // hashing. PNG losslessness + the BT.601 luma identity make the
      // decoded positional group sums equal the raw byte sums, and
      // the black row-padding contributes zero to every group — so
      // the CORRECT result is byte-identical to m4's, and the oracle
      // is m4's SQL verbatim: any decode defect (stride, color
      // model, padding, truncation) breaks the hash and fails the
      // compare. Empty docs pre-filtered (their PNG is a 1-pixel
      // black image, not an empty payload — m4's emptiness guard
      // must run on the SOURCE side here).
      (s, d) => {
        // spreadSmall: see m8 — full-width PNG round-trip (r16)
        val payload = Tables.spreadSmall(s, d, "documents", Tables.documents(s, d)
          .filter(length(col("text")) > 0)
          .select(col("doc_id"), col("text").cast("binary").as("payload")))
        val pngs = Multimodal.encodeGrayPng(payload, "doc_id", "payload", width = 32)
        Multimodal.perceptualHashPairs(pngs, "id", "png", maxHamming = 3,
            codecs = Seq(graft.operators.ImageIoCodec))
          .orderBy("a", "b")
      },
      Some("""WITH s AS (SELECT doc_id, (i - 1) % 60 AS j,
             |    ascii(substr(text, CAST(i AS INT), 1)) AS v
             |  FROM (SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
             |        FROM documents)),
             |g AS (SELECT doc_id, j, CAST(sum(v) AS BIGINT) AS sj FROM s GROUP BY 1, 2),
             |tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tv FROM s GROUP BY 1),
             |ph AS (SELECT g.doc_id,
             |    CAST(sum(CASE WHEN sj * 60 > tv
             |         THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS ph
             |  FROM g JOIN tot ON tot.doc_id = g.doc_id GROUP BY 1),
             |bd AS (SELECT doc_id, k, (ph >> (k*15)) & 32767 AS bh, ph
             |  FROM ph, (SELECT unnest(generate_series(0, 3)) AS k) ks),
             |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b, x.ph AS pa, y.ph AS pb
             |  FROM bd x JOIN bd y ON x.k = y.k AND x.bh = y.bh AND x.doc_id < y.doc_id),
             |bn AS (SELECT k, bh, CAST(count(*) AS BIGINT) AS n FROM bd GROUP BY 1, 2),
             |cst AS (SELECT
             |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_capped_buckets,
             |    coalesce(CAST(sum(CASE WHEN n > 4096 THEN n - 4096 ELSE 0 END) AS BIGINT), 0) AS n_dropped_rows
             |  FROM bn)
             |SELECT a, b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming,
             |  cst.n_capped_buckets, cst.n_dropped_rows
             |FROM cand CROSS JOIN cst WHERE bit_count(xor(pa, pb)) <= 3
             |ORDER BY a, b""".stripMargin)),

    Q("d16_threshold_sweep",
      // Threshold sensitivity sweep for embedding dedup — the tuning
      // table a pipeline owner reads before picking d5's cutoff:
      // pair counts per cosine bucket (width 0.05, from 0.30 up).
      // Bucket = floor(cos·20) on the SAME fixed-order double
      // expression both engines evaluate, so bucketing is exact; one
      // all-pairs pass at this surface's scale, the d5b LSH path at
      // corpus scale.
      (s, d) => {
        import org.apache.spark.sql.graftbridge.VectorFunctions.{vec_cosine, vec_norm}
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", vec_norm(col("v")))
        val a = e.select(col("vec_id").as("a"), col("v").as("va"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
        a.join(b, col("a") < col("b"))
          .withColumn("cosine", vec_cosine(col("va"), col("vb"), col("na"), col("nb")))
          .filter(col("cosine") >= 0.30)
          .select(floor(col("cosine") * 20).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
          .orderBy("bucket")
      },
      Some(s"""WITH $cosSql,
              |p AS (SELECT a.vec_id AS a, b.vec_id AS b,
              |  list_dot_product(a.v, b.v)
              |    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cos
              |  FROM ce a JOIN ce b ON a.vec_id < b.vec_id)
              |SELECT CAST(floor(cos * 20) AS BIGINT) AS bucket,
              |  CAST(count(*) AS BIGINT) AS n_pairs
              |FROM p WHERE cos >= 0.30
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("s7_radius_search",
      // Radius (range) similarity search — kNN's fixed-threshold
      // complement: ALL neighbors with cosine ≥ θ per query vector,
      // ordered. Same codegen'd vector math as s1; at corpus scale
      // the candidate cut swaps to the LSH/IVF tiers unchanged (a
      // radius is a rank-free cut, so no re-rank pass is needed).
      (s, d) => {
        import org.apache.spark.sql.graftbridge.VectorFunctions.{vec_cosine, vec_norm}
        val e = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding").as("v"))
          .withColumn("nrm", vec_norm(col("v")))
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
        q.join(e, col("vec_id") =!= col("query_id"))
          .withColumn("cosine", vec_cosine(col("qv"), col("v"), col("qn"), col("nrm")))
          .filter(col("cosine") >= 0.35)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            round(col("cosine"), 4).as("cosine"))
          .orderBy("query_id", "neighbor_id")
      },
      Some(s"""WITH $cosSql,
              |q AS (SELECT vec_id AS query_id, v AS qv FROM ce WHERE vec_id < 5),
              |sc AS (SELECT query_id, c.vec_id AS neighbor_id,
              |  list_dot_product(qv, c.v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM q JOIN ce c ON c.vec_id <> query_id)
              |SELECT query_id, neighbor_id, round(cos, 4) AS cosine
              |FROM sc WHERE cos >= 0.35
              |ORDER BY query_id, neighbor_id""".stripMargin)),

    Q("s4_knn_sql",
      // Brute kNN written entirely in SQL through the registered
      // vec_dot/vec_cosine functions (GraftFunctions SQL surface) —
      // same double expression tree as the s1 Column path, so the s1
      // oracle convention carries over unchanged.
      (s, d) => {
        org.apache.spark.sql.graftbridge.GraftFunctions.install(s)
        Tables.embeddings(s, d).createOrReplaceTempView("embeddings_sql")
        s.sql("""WITH q AS (SELECT vec_id AS qid, embedding AS qe
                |    FROM embeddings_sql WHERE vec_id % 97 = 0),
                |sc AS (SELECT qid, c.vec_id AS cid, vec_cosine(qe, c.embedding) AS cos
                |  FROM q JOIN embeddings_sql c ON c.vec_id <> qid),
                |r AS (SELECT qid, cid, cos,
                |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
                |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
                |  round(cos, 4) AS cosine
                |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)
      },
      Some(s"""WITH $cosSql,
              |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id % 97 = 0),
              |sc AS (SELECT qid, c.vec_id AS cid,
              |  list_dot_product(qv, c.v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM q JOIN ce c ON c.vec_id <> qid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("c1_chunk",
      // Context-window slicing: 32-token windows every 24 tokens
      // (25% overlap), final partial window kept. Narrow plan — the
      // only exchange is the output ORDER BY.
      (s, d) => Corpus.chunk(Tables.documents(s, d), "doc_id", "text", 32, 24)
        .orderBy("doc_id", "chunk_id"),
      Some(Corpus.chunkSql(32, 24) + "\nORDER BY doc_id, chunk_id")),

    Q("c2_pack",
      // 512-token context-window packing per source shard: running
      // token offset in doc-id order → (bin, bin_offset). The window
      // partitions by shard, so parallelism = shard count and no
      // global sort exists anywhere in the plan.
      (s, d) => Corpus.pack(Tables.documents(s, d), "doc_id", "text", "source", 512)
        .orderBy("source", "doc_id"),
      Some("""SELECT source, doc_id, n_tokens,
             |  CAST(start_tok // 512 AS BIGINT) AS bin,
             |  CAST(start_tok % 512 AS BIGINT) AS bin_offset
             |FROM (SELECT source, doc_id, n_tokens,
             |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
             |  FROM (SELECT source, doc_id,
             |      CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
             |        AS n_tokens
             |    FROM documents))
             |ORDER BY source, doc_id""".stripMargin)),

    Q("d7_dedup_incremental",
      // Batch-over-corpus dedup: odd doc_ids are the arriving batch,
      // even ids the standing corpus; emit batch ids whose content is
      // genuinely new. Digest-composite anti-join — bodies never
      // shuffle.
      (s, d) => Corpus.incrementalSurvivors(
          Tables.documents(s, d), "doc_id", "text", col("doc_id") % 2 === 1)
        .orderBy("doc_id"),
      Some("""SELECT d.doc_id FROM documents d
             |WHERE d.doc_id % 2 = 1 AND NOT EXISTS (
             |  SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0 AND e.text = d.text)
             |ORDER BY d.doc_id""".stripMargin)),

    Q("d8_dedup_normalized",
      // Case/punctuation/whitespace-insensitive dedup clusters — the
      // tier between byte-exact d1/d6 and fuzzy d2–d4.
      (s, d) => Corpus.normalizedClusters(Tables.documents(s, d), "doc_id", "text")
        .orderBy("keep_id", "member_id"),
      Some(s"""SELECT keep_id, member_id FROM (
              |  SELECT min(doc_id) OVER (PARTITION BY norm) AS keep_id,
              |         doc_id AS member_id
              |  FROM (SELECT doc_id, ${Corpus.normalizeSql} AS norm FROM documents))
              |ORDER BY keep_id, member_id""".stripMargin)),

    Q("d9_decontaminate",
      // Benchmark decontamination: every 97th document plays the eval
      // set; training docs sharing any word trigram with it are
      // flagged with their distinct-overlap count. The trigram order
      // is 3 (not the published 13) because the synthetic corpus has
      // a ~31-token vocabulary — at n=13 only byte-clones collide and
      // the query degenerates to d1.
      (s, d) => Corpus.decontaminate(
          Tables.documents(s, d), "doc_id", "text", col("doc_id") % 97 === 0, 3)
        .orderBy("doc_id"),
      Some("""WITH g AS (
             |  SELECT doc_id, doc_id % 97 = 0 AS is_test,
             |    array_to_string(s[CAST(i AS INT):CAST(i + 2 AS INT)], ' ') AS gram
             |  FROM (SELECT doc_id, s, unnest(generate_series(1, len(s) - 2)) AS i
             |        FROM (SELECT doc_id,
             |                list_filter(string_split(text, ' '), x -> x <> '') AS s
             |              FROM documents)
             |        WHERE len(s) >= 3)),
             |t AS (SELECT DISTINCT gram FROM g WHERE is_test),
             |tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE NOT is_test)
             |SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
             |FROM tr JOIN t USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("p1_tokenize_pack",
      // The composed model-ready export (second flagship pipeline
      // beside p0): tokenize → frequency-rank vocabulary ids →
      // position-ordered id sequences → 512-token context-window
      // packing per shard. The oracle replays every stage in SQL —
      // the emitted CSV id streams must match byte-for-byte.
      (s, d) => Corpus.tokenizePack(Tables.documents(s, d), "doc_id", "text", "source", 512)
        .orderBy("source", "doc_id"),
      Some("""WITH tok AS (SELECT source, doc_id, i AS pos, s[CAST(i AS INT)] AS tok
             |  FROM (SELECT source, doc_id, s, unnest(generate_series(1, len(s))) AS i
             |        FROM (SELECT source, doc_id,
             |                list_filter(string_split(text, ' '), x -> x <> '') AS s
             |              FROM documents))),
             |r AS (SELECT tok, dense_rank() OVER (ORDER BY c DESC, tok) AS rank
             |      FROM (SELECT tok, count(*) AS c FROM tok GROUP BY 1)),
             |d AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |        string_agg(CAST(rank AS VARCHAR), ',' ORDER BY pos) AS ids_csv
             |      FROM tok JOIN r USING (tok) GROUP BY 1, 2),
             |p AS (SELECT source, doc_id, n_tokens, ids_csv,
             |        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
             |      FROM d)
             |SELECT source, doc_id, CAST(start_tok // 512 AS BIGINT) AS bin,
             |  CAST(start_tok % 512 AS BIGINT) AS bin_offset, n_tokens, ids_csv
             |FROM p ORDER BY source, doc_id""".stripMargin)),

    Q("t11_inverted_index",
      // Inverted index (token → document-frequency + ordered posting
      // list) — the retrieval primitive. The grouped form here is the
      // vocabulary-sized profiling surface; at corpus scale the
      // (token, doc) pair table IS the index (posting lists for hot
      // tokens don't belong in one row) and this aggregate is its
      // compaction for the tail. Postings emitted as CSV — the
      // cross-engine-stable hash surface.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
        .distinct()
        .groupBy("tok")
        .agg(count(lit(1)).as("df"),
          expr("array_join(transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)), ',')")
            .as("postings"))
        .orderBy("tok"),
      Some(s"""WITH $tokSql
              |SELECT tok, CAST(count(*) AS BIGINT) AS df,
              |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
              |FROM tok GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t10_rarity",
      // Rare-token informativeness score: vocabulary ranked by
      // descending corpus frequency (total order — ties broken by
      // token), rank summed over each document's token instances.
      (s, d) => Corpus.rarityScores(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""WITH $tokAllSql,
              |r AS (SELECT tok, CAST(dense_rank() OVER (ORDER BY c DESC, tok) AS BIGINT)
              |        AS rank
              |      FROM (SELECT tok, count(*) AS c FROM tokall GROUP BY 1))
              |SELECT t.doc_id, CAST(sum(r.rank) AS BIGINT) AS rarity
              |FROM tokall t JOIN r USING (tok) GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("c3_mix",
      // Weighted corpus mixing (Corpus.mixSources): per-language
      // target weights in basis points — en downsampled to 0.5
      // epochs, zh UPSAMPLED to 2.3 (2 full copies + a 30%
      // deterministic-Bernoulli third), everything else exactly 1.0.
      // Each emitted row carries its repetition index. Narrow plan —
      // rows expand in place, the only exchange is the output sort.
      (s, d) => Corpus.mixSources(Tables.documents(s, d), "doc_id", "lang",
        Map("en" -> 5000L, "zh" -> 23000L), defaultBp = 10000L)
        .orderBy("doc_id", "rep"),
      Some("""SELECT doc_id, stratum, rep FROM (
             |  SELECT doc_id, stratum, w,
             |    unnest(generate_series(1, greatest((w + 9999) // 10000, 1))) AS rep
             |  FROM (SELECT doc_id, lang AS stratum,
             |      CASE WHEN lang = 'en' THEN 5000 WHEN lang = 'zh' THEN 23000
             |           ELSE 10000 END AS w
             |    FROM documents))
             |WHERE rep * 10000 <= w
             |   OR ((doc_id % 1000003) * 2654435761 + rep) % 10000 < w % 10000
             |ORDER BY doc_id, rep""".stripMargin)),

    Q("c4_shard",
      // Deterministic export sharding: md5-hash doc ids into 16
      // shards (coordination-free, stable under task retries — the
      // smp4 hash family) and emit the per-shard MANIFEST (doc count,
      // token mass, id range) a training-export job publishes beside
      // its files to prove balance. One narrow projection + one
      // 16-group aggregate.
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 16")
            .as("shard"),
          expr("size(filter(split(text, ' '), x -> x <> ''))").cast("long").as("n_tokens"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("shard"),
      Some(s"""SELECT hk % 16 AS shard, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              |  CAST(min(doc_id) AS BIGINT) AS min_id,
              |  CAST(max(doc_id) AS BIGINT) AS max_id
              |FROM (SELECT doc_id,
              |    ${(0 until 8).map { m =>
                     s"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), ${m + 1}, 1)) - 1) * ${1L << (4 * (7 - m))}"
                   }.mkString("(", " + ", ")")} AS hk,
              |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens
              |  FROM documents)
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("c5_curriculum",
      // Curriculum construction: documents ranked by the t2 quality
      // score, cut into 4 equal-depth curriculum stages (exact ntile
      // over (score, doc_id) — the unique tie-break makes stage
      // assignment deterministic), per-stage manifest with token
      // mass and score bounds. The cut is the Quantiles stats pass:
      // sampled bounds → bucketed rank → tile arithmetic — same
      // output as the window form, no global sort at any scale.
      (s, d) => {
        val scored = TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
        Quantiles.ntileByStats(scored, 4,
            Seq(col("quality_bp"), col("doc_id")), "stage")
          .groupBy("stage")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
            min("quality_bp").as("min_q"), max("quality_bp").as("max_q"))
          .orderBy("stage")
      },
      Some(s"""WITH q AS (${TextAnalysis.qualityScoreSql}),
              |st AS (SELECT n_tokens, quality_bp,
              |    CAST(ntile(4) OVER (ORDER BY quality_bp, doc_id) AS BIGINT) AS stage
              |  FROM q)
              |SELECT stage, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
              |  min(quality_bp) AS min_q, max(quality_bp) AS max_q
              |FROM st GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t14_cooccurrence",
      // Token co-occurrence network (PMI numerator): unordered
      // within-document token pairs weighted by document frequency,
      // kept at support ≥ 20 docs. Pairs enumerate per doc from the
      // DISTINCT token set (the d2 prefix machinery's little
      // sibling); at real vocabulary sizes the same query runs after
      // a frequency cut on the token list — the standard co-occurrence
      // recipe. One pair-exchange, map-side combined.
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "").distinct()
        tok.as("x").join(tok.as("y"),
            col("x.doc_id") === col("y.doc_id") && col("x.tok") < col("y.tok"))
          .groupBy(col("x.tok").as("w1"), col("y.tok").as("w2"))
          .agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") >= 20)
          .orderBy("w1", "w2")
      },
      Some(s"""WITH $tokSql
              |SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS n_docs
              |FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.tok < b.tok
              |GROUP BY 1, 2 HAVING count(*) >= 20
              |ORDER BY 1, 2""".stripMargin)),

    Q("t15_bpe_merges",
      // Tokenizer TRAINING primitive — one BPE iteration: count
      // adjacent symbol pairs across all token instances (characters
      // as the initial alphabet) and emit the top-20 merge
      // candidates, count-desc with lexicographic tie-break. The
      // pair counting is the whole cost of BPE training at corpus
      // scale; each further merge round is this same job over the
      // re-segmented stream. Explode is narrow; one pair-keyed
      // aggregate; top-k over the (tiny) distinct-pair table.
      (s, d) => {
        val pairs = Tables.documents(s, d)
          .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("w"))
          .select(explode(expr(
            "transform(sequence(1, greatest(length(w) - 1, 0)), " +
              "i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(count(lit(1)).as("cnt"))
        pairs.withColumn("rk", row_number().over(
            Window.orderBy(col("cnt").desc, col("a"), col("b"))))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("long").as("rk"), col("a"), col("b"), col("cnt"))
          .orderBy("rk")
      },
      Some(s"""WITH $tokAllSql,
              |pr AS (SELECT substr(tok, CAST(i AS INT), 1) AS a,
              |    substr(tok, CAST(i AS INT) + 1, 1) AS b
              |  FROM (SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
              |        FROM tokall WHERE length(tok) >= 2)),
              |c AS (SELECT a, b, CAST(count(*) AS BIGINT) AS cnt FROM pr GROUP BY 1, 2),
              |r AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, a, b) AS rk FROM c)
              |SELECT CAST(rk AS BIGINT) AS rk, a, b, cnt FROM r WHERE rk <= 20
              |ORDER BY rk""".stripMargin)),

    Q("t12_lm_score",
      // Bigram language-model document scoring — the cheap
      // perplexity-style quality signal: train bigram transition
      // counts on the corpus itself, score each document by
      // Σ floor(10⁴·c(w1,w2)/c(w1·)) over its bigram instances
      // (integer-scaled conditional frequency — exact integer
      // division keeps the score bit-identical on any ANSI engine;
      // ln-space scores differ in the last ulp). Count tables are
      // vocabulary-sized; Spark broadcasts them when they fit and
      // falls back to hash joins when a real corpus's bigram
      // vocabulary doesn't.
      (s, d) => {
        val bi = Tables.documents(s, d)
          .select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("toks"))
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, greatest(size(toks)-1, 0)), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i+1) AS w2))")).as("b"))
          .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val cw = bi.groupBy("w1").agg(count(lit(1)).as("cw"))
        val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        bi.join(cb, Seq("w1", "w2")).join(cw, Seq("w1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            sum(expr("(cb * 10000) div cw")).as("lm_score"))
          .orderBy("doc_id")
      },
      Some("""WITH bi AS (
             |  SELECT doc_id, s[CAST(i AS INT)] AS w1, s[CAST(i AS INT)+1] AS w2
             |  FROM (SELECT doc_id, s, unnest(generate_series(1, greatest(len(s)-1, 0))) AS i
             |        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS s
             |              FROM documents))),
             |cw AS (SELECT w1, CAST(count(*) AS BIGINT) AS cw FROM bi GROUP BY 1),
             |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bi GROUP BY 1, 2)
             |SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum((cb * 10000) // cw) AS BIGINT) AS lm_score
             |FROM bi JOIN cb USING (w1, w2) JOIN cw USING (w1)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("s8_knn_mips",
      // Maximum-inner-product top-k (recommendation-shaped retrieval:
      // magnitude matters, so no normalization). Baseline tier of
      // Similarity.knnMips; the scale tier is the norm-augmentation
      // reduction to cosine noted on the operator, riding s2/s3
      // unchanged.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnMips(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
          .orderBy("query_id", "rk")
      },
      Some(s8OracleSql)),

    Q("s8b_knn_mips_lsh",
      // The MIPS SCALE tier as code — norm-augmentation (Bachrach et
      // al. 2014): one extra corpus component sqrt(M²−‖x‖²) (M² = max
      // corpus squared norm, an exact order-independent aggregate), 0
      // on queries, then the search IS s2's LSH at 65 dims — buckets
      // bound candidates, never an O(|Q|×|C|) join. The oracle
      // replays M², the augment component (double→float→double, exact
      // both ways), every md5 hyperplane, bucketing, and rerank.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnMipsLsh(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10).orderBy("query_id", "rk")
      },
      Some(s8bOracleSql)),

    Q("s8c_knn_mips_multiprobe",
      // s8b + MULTI-PROBE (round 9, Lv et al. VLDB 2007): each query
      // additionally probes the buckets at Hamming distance 1 in its
      // first two sign bits — recall from the SAME index, no extra
      // corpus storage (the scale-preferred alternative to adding
      // tables). Probe set is fixed, so the oracle replays it as two
      // extra XOR'd bucket rows per (query, table).
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.knnMipsLsh(e, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, multiProbe = 2).orderBy("query_id", "rk")
      },
      Some(s8cOracleSql)),

    Q("d21_url_dedup",
      // URL canonicalization dedup (round 9) — the web-corpus
      // normalization step BEFORE content dedup: deterministic messy
      // URLs synthesized from documents (mixed-case scheme/host,
      // trailing slash, utm tracking params, fragments), canonicalized
      // (fragment/utm strip, slash collapse, lowercase), exact-deduped
      // by canonical target (survivor = min doc_id). doc_id%2 case
      // noise, %3 slash noise, %5 utm noise, %11 fragments all
      // collapse; canonical identity = (source, page id%7) — ~140
      // targets over 500 docs, so real multi-variant groups exist.
      (s, d) => Dedup.urlDedup(
          Tables.documents(s, d).withColumn("url", expr(
            "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END, " +
              "source, '.example.com/page-', CAST(doc_id % 7 AS STRING), " +
              "CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END, " +
              "'?page=1&utm_source=feed&utm_campaign=c', CAST(doc_id % 5 AS STRING), " +
              "CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END)")),
          "doc_id", "url")
        .orderBy("canonical"),
      Some("""WITH u AS (SELECT doc_id,
             |    CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END
             |    || source || '.example.com/page-' || CAST(doc_id % 7 AS VARCHAR)
             |    || CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END
             |    || '?page=1&utm_source=feed&utm_campaign=c' || CAST(doc_id % 5 AS VARCHAR)
             |    || CASE WHEN doc_id % 11 = 0 THEN '#section-2' ELSE '' END AS url
             |  FROM documents),
             |c AS (SELECT doc_id,
             |    lower(regexp_replace(regexp_replace(regexp_replace(url,
             |      '#.*$', ''), '&?utm_[a-z_]+=[^&#]*', '', 'g'), '/\?', '?')) AS canonical
             |  FROM u)
             |SELECT canonical, CAST(min(doc_id) AS BIGINT) AS survivor_id,
             |  CAST(count(*) AS BIGINT) AS n_urls
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("s17_hybrid_rrf",
      // HYBRID retrieval (round 9) — the RAG deployment pattern:
      // lexical top-10 (inverted-index shared-distinct-token ranking,
      // t11's candidate shape) fused with vector top-10 (s1 cosine)
      // by reciprocal-rank fusion (Cormack et al. 2009),
      // Σ 10⁴ div (60 + rank) — ALL-INTEGER fusion over two k-sized
      // lists, so the fuse is k·queries-sized and oracle-exact.
      // documents and embeddings share the id space by construction.
      (s, d) => {
        val tok = Tables.documents(s, d).select(col("doc_id"),
            explode(expr("filter(split(text, ' '), x -> x != '')")).as("t"))
          .distinct()
        val lexPairs = tok.filter(col("doc_id") < 5).withColumnRenamed("doc_id", "qid")
          .join(tok.withColumnRenamed("doc_id", "cid"), Seq("t"))
          .filter(col("qid") =!= col("cid"))
          .groupBy("qid", "cid").agg(count(lit(1)).as("n_shared"))
        val lex = lexPairs.withColumn("rk", row_number().over(
            Window.partitionBy("qid").orderBy(desc("n_shared"), asc("cid"))))
          .filter(col("rk") <= 10)
          .select(col("qid").as("query_id"), col("cid").as("neighbor_id"), col("rk"))
        val e = Tables.embeddings(s, d)
        val vec = Similarity.knnBrute(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10)
          .select("query_id", "neighbor_id", "rk")
        Similarity.rrfFuse(lex, vec, k = 5).orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql,
              |tok AS (SELECT DISTINCT doc_id, t.tok FROM documents,
              |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
              |lexp AS (SELECT q.doc_id AS qid, c.doc_id AS cid,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM tok q JOIN tok c ON q.tok = c.tok AND c.doc_id <> q.doc_id
              |  WHERE q.doc_id < 5 GROUP BY 1, 2),
              |lex AS (SELECT qid, cid, rk FROM (SELECT qid, cid,
              |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, cid) AS rk
              |  FROM lexp) WHERE rk <= 10),
              |qv AS (SELECT vec_id AS qid, v AS qvec FROM ce WHERE vec_id < 5),
              |sc AS (SELECT qid, c.vec_id AS cid,
              |    list_dot_product(qvec, c.v)
              |      / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM qv JOIN ce c ON c.vec_id <> qid),
              |vec AS (SELECT qid, cid, rk FROM (SELECT qid, cid,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
              |  FROM sc) WHERE rk <= 10),
              |fa AS (SELECT qid, cid, 10000 // (60 + rk) AS ra FROM lex),
              |fb AS (SELECT qid, cid, 10000 // (60 + rk) AS rb FROM vec),
              |fu AS (SELECT coalesce(fa.qid, fb.qid) AS qid,
              |    coalesce(fa.cid, fb.cid) AS cid,
              |    coalesce(ra, 0) + coalesce(rb, 0) AS rrf
              |  FROM fa FULL OUTER JOIN fb ON fa.qid = fb.qid AND fa.cid = fb.cid),
              |r AS (SELECT qid, cid, rrf,
              |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rk FROM fu)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  CAST(rrf AS BIGINT) AS rrf
              |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("s18_bm25",
      // Integer-scaled BM25 retrieval (round 10) — the REAL lexical
      // ranker the round-9 verdict asked for in place of s17's raw
      // shared-token count: idf surrogate (N·10⁴ div df), full BM25
      // tf/dl saturation cleared of fractions by ×10A scaling, a df
      // cutoff at 90% of the corpus (the stopword posture — a token
      // in ~every doc never generates candidates), and per-token
      // candidate cap 16 over IMPACT-ORDERED posting lists (TopKAgg —
      // bounded state, no hot-token window sort). The cap BINDS here
      // (posting lists ~0.8·N, 16 kept), and the oracle replays the
      // capped algorithm exactly — row_number over the same
      // (term-score DESC, doc ASC) total order.
      (s, d) => {
        val docs = Tables.documents(s, d)
        Retrieval.bm25TopK(docs, "doc_id", "text",
            docs.filter(col("doc_id") < 5), k = 10, maxDfPct = 90, cap = 16)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $bm25LexSql
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
              |  cid AS neighbor_id, score
              |FROM lexr WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("s17b_hybrid_bm25",
      // s17's hybrid retrieval with the lexical arm upgraded to the
      // bounded BM25 ranker (s18): BM25 top-10 fused with brute
      // cosine top-10 by all-integer RRF. Per query the lexical arm
      // touches ≤ |query tokens| · 16 candidates — never a hot
      // token's full posting list — which is the per-query bound a
      // 100-TB RAG deployment needs.
      (s, d) => {
        val docs = Tables.documents(s, d)
        val e = Tables.embeddings(s, d)
        val vec = Similarity.knnBrute(e, e.filter(col("vec_id") < 5),
            "vec_id", "embedding", k = 10)
          .select("query_id", "neighbor_id", "rk")
        // through the front door: the lexical arm is FORCED to the
        // capped BM25 ranker (HybridFrontDoorSpec pins the plan)
        Retrieval.hybridTopK(docs, "doc_id", "text",
            docs.filter(col("doc_id") < 5), vec, k = 5,
            lexK = 10, maxDfPct = 90, cap = 16)
          .orderBy("query_id", "rk")
      },
      Some(s"""WITH $cosSql, $bm25LexSql,
              |lex AS (SELECT qid, cid, rk FROM lexr WHERE rk <= 10),
              |qv AS (SELECT vec_id AS qid, v AS qvec FROM ce WHERE vec_id < 5),
              |vsc AS (SELECT qid, c.vec_id AS cid,
              |    list_dot_product(qvec, c.v)
              |      / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM qv JOIN ce c ON c.vec_id <> qid),
              |vec AS (SELECT qid, cid, rk FROM (SELECT qid, cid,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
              |  FROM vsc) WHERE rk <= 10),
              |fa AS (SELECT qid, cid, 10000 // (60 + rk) AS ra FROM lex),
              |fb AS (SELECT qid, cid, 10000 // (60 + rk) AS rb FROM vec),
              |fu AS (SELECT coalesce(fa.qid, fb.qid) AS qid,
              |    coalesce(fa.cid, fb.cid) AS cid,
              |    coalesce(ra, 0) + coalesce(rb, 0) AS rrf
              |  FROM fa FULL OUTER JOIN fb ON fa.qid = fb.qid AND fa.cid = fb.cid),
              |fr AS (SELECT qid, cid, rrf,
              |    row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, cid) AS rk FROM fu)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  CAST(rrf AS BIGINT) AS rrf
              |FROM fr WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin)),

    Q("q65b_sql_bm25",
      // The round-10 lexical ranker on the PURE-SQL front door (the
      // q65_sql_surface convention): the same integer-scaled BM25 —
      // idf surrogate (N·10⁴ div df), ×10A-cleared tf/dl saturation,
      // 90% df cutoff, per-token cap 16 — expressed entirely through
      // spark.sql over a registered view, zero DataFrame calls after
      // registration. The cap here is the row_number REPLAY form (the
      // oracle's own shape); the scale path stays s18's TopKAgg — this
      // query proves a SQL-only client can run the ranker and get
      // bit-identical rankings. Oracle = s18's, verbatim.
      (s, d) => {
        Tables.documents(s, d).createOrReplaceTempView("documents_sql")
        s.sql("""
          WITH binst AS (
            SELECT doc_id, tok FROM documents_sql
            LATERAL VIEW explode(filter(split(text, ' '), x -> x != '')) t AS tok),
          btf AS (SELECT doc_id, tok, count(*) AS tf FROM binst GROUP BY 1, 2),
          bdl AS (SELECT doc_id, count(*) AS dl FROM binst GROUP BY 1),
          bdf AS (SELECT tok, count(*) AS df FROM btf GROUP BY 1),
          bglob AS (SELECT count(DISTINCT doc_id) AS n, count(*) AS a FROM binst),
          bsc AS (SELECT btf.tok, btf.doc_id,
              (cast((cast(n as decimal(38,0)) * 10000) div df as decimal(38,0))
                 * tf * 22 * a)
                div (10 * cast(a as decimal(38,0)) * tf + 3 * a + 9 * dl * n) AS st
            FROM btf JOIN bdl USING (doc_id) JOIN bdf ON bdf.tok = btf.tok
            CROSS JOIN bglob WHERE df * 100 <= n * 90),
          bcap AS (SELECT tok, doc_id, st FROM (SELECT tok, doc_id, st,
              row_number() OVER (PARTITION BY tok ORDER BY st DESC, doc_id) AS prk
            FROM bsc) WHERE prk <= 16),
          bqt AS (SELECT DISTINCT doc_id AS qid, tok FROM binst WHERE doc_id < 5),
          bcd AS (SELECT qid, bcap.doc_id AS cid, CAST(sum(st) AS BIGINT) AS score
            FROM bqt JOIN bcap USING (tok) WHERE bcap.doc_id <> qid GROUP BY 1, 2),
          lexr AS (SELECT qid, cid, score,
              row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS rk
            FROM bcd)
          SELECT qid AS query_id, CAST(rk AS INT) AS rk,
            cid AS neighbor_id, score
          FROM lexr WHERE rk <= 10 ORDER BY query_id, rk""")
      },
      Some(s"""WITH $bm25LexSql
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk,
              |  cid AS neighbor_id, score
              |FROM lexr WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("q65c_sql_filtered_knn",
      // Filtered vector search on the PURE-SQL front door: the s19
      // deployment pattern (kNN under a metadata predicate,
      // pre-filtered BEFORE scoring — never top-k-then-filter) written
      // entirely in spark.sql through the registered vec_cosine
      // function. Brute scoring here (the SQL-expressible baseline;
      // s19's IVF tier is the scale path) — the point is the
      // PRE-FILTER shape: the predicate lands in the candidate CTE, so
      // Catalyst pushes it into the corpus scan.
      (s, d) => {
        org.apache.spark.sql.graftbridge.GraftFunctions.install(s)
        Tables.embeddings(s, d).createOrReplaceTempView("embeddings_sql")
        s.sql("""
          WITH q AS (SELECT vec_id AS qid, embedding AS qe
              FROM embeddings_sql WHERE vec_id < 5),
          c AS (SELECT vec_id, embedding FROM embeddings_sql WHERE label < 3),
          sc AS (SELECT qid, c.vec_id AS cid, vec_cosine(qe, c.embedding) AS cos
            FROM q JOIN c ON c.vec_id <> qid),
          r AS (SELECT qid, cid, cos,
            row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
            FROM sc)
          SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
            round(cos, 4) AS cosine
          FROM r WHERE rk <= 10 ORDER BY query_id, rk""")
      },
      Some(s"""WITH $cosSql,
              |cef AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              |  FROM embeddings WHERE label < 3),
              |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
              |sc AS (SELECT qid, c.vec_id AS cid,
              |  list_dot_product(qv, c.v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM q JOIN cef c ON c.vec_id <> qid),
              |r AS (SELECT qid, cid, cos,
              |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM sc)
              |SELECT qid AS query_id, CAST(rk AS INT) AS rk, cid AS neighbor_id,
              |  round(cos, 4) AS cosine
              |FROM r WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin)),

    Q("q65d_sql_timetravel",
      // The versioned-table read surface on PURE SQL: vt_read's
      // VERSION AS OF, vt_read_eq's indexed point probe, and
      // vt_history's audit — all through spark.sql table functions
      // (GraftTableFunctions; the registry mechanism `range(n)`
      // rides), zero DataFrame calls after the table is built. The
      // table is committed from `documents` (v1 = even doc_ids,
      // v2 = append odd), so every SQL read has a DuckDB-derivable
      // oracle: time travel to v1 must see exactly the even half.
      (s, d) => {
        org.apache.spark.sql.graftbridge.GraftTableFunctions.install(s)
        val dir = java.nio.file.Files.createTempDirectory("q65d").toFile
        dir.delete()
        val root = dir.getAbsolutePath
        val docs = Tables.documents(s, d).select("doc_id", "source", "text")
        graft.sources.VersionedTable.commit(
          docs.filter(col("doc_id") % 2 === 0), root)
        graft.sources.VersionedTable.commit(
          docs.filter(col("doc_id") % 2 === 1), root, mode = "append")
        s.sql(s"""
          SELECT 0 AS version, '_manifests' AS source, count(*) AS n
            FROM vt_history('$root')
          UNION ALL
          SELECT 1 AS version, source, count(*) AS n
            FROM vt_read('$root', 1) GROUP BY source
          UNION ALL
          SELECT 2 AS version, source, count(*) AS n
            FROM vt_read('$root', 2) GROUP BY source
          UNION ALL
          SELECT 3 AS version, 'eq_probe' AS source, count(*) AS n
            FROM vt_read_eq('$root', 'source', 'src0')
          ORDER BY version, source""")
      },
      Some("""SELECT 0 AS version, '_manifests' AS source, CAST(2 AS BIGINT) AS n
             |UNION ALL
             |SELECT 1 AS version, source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents WHERE doc_id % 2 = 0 GROUP BY source
             |UNION ALL
             |SELECT 2 AS version, source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY source
             |UNION ALL
             |SELECT 3 AS version, 'eq_probe' AS source, CAST(count(*) AS BIGINT) AS n
             |  FROM documents WHERE source = 'src0'
             |ORDER BY version, source""".stripMargin)),

    Q("q65f_sql_dml",
      // The versioned-table WRITE surface on PURE SQL (round 12;
      // GraftCatalog + GraftDmlRules): CREATE TABLE AS, INSERT INTO,
      // MERGE INTO (upsert), UPDATE, DELETE, and VERSION AS OF
      // read-back — every statement through spark.sql, every mutation
      // landing on the existing OCC commit paths (commit / merge /
      // updateWhereDv / deleteWhereDv). The table derives from
      // `orders`, so both the final state AND each version's count are
      // DuckDB-derivable: v1 = CREATE's empty commit, v2 = the CTAS
      // rows, v3 = +INSERT, then MERGE/UPDATE/DELETE shape the final.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65f")
        s.sql("DROP TABLE IF EXISTS graft.q65f")
        s.sql("""CREATE TABLE graft.q65f AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65f WHERE o_orderkey % 100 < 10""")
        s.sql("""INSERT INTO graft.q65f
          SELECT o_orderkey, o_custkey, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65f WHERE o_orderkey % 100 = 10""")
        s.sql("""MERGE INTO graft.q65f t
          USING (SELECT o_orderkey AS k, o_custkey AS c,
                        CAST(round(o_totalprice) * 2 + 1 AS BIGINT) AS p
                 FROM orders_q65f
                 WHERE o_orderkey % 100 BETWEEN 5 AND 15) s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
        s.sql("UPDATE graft.q65f SET p = p + 7 WHERE k % 10 = 3")
        s.sql("DELETE FROM graft.q65f WHERE c % 7 = 0")
        s.sql("""
          SELECT CAST(-1 AS BIGINT) AS stage, k, c, p FROM graft.q65f
          UNION ALL
          SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 (SELECT count(*) FROM graft.q65f VERSION AS OF 1)
          UNION ALL
          SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 (SELECT count(*) FROM graft.q65f VERSION AS OF 2)
          UNION ALL
          SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 (SELECT count(*) FROM graft.q65f VERSION AS OF 3)
          ORDER BY stage, k, c""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 100 < 10),
             |ins AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 100 = 10),
             |v3 AS (SELECT * FROM base UNION ALL SELECT * FROM ins),
             |m AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) * 2 + 1 AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 100 BETWEEN 5 AND 15),
             |v4 AS (
             |  SELECT * FROM v3 WHERE k NOT IN (SELECT k FROM m)
             |  UNION ALL SELECT * FROM m),
             |v5 AS (SELECT k, c,
             |         CASE WHEN k % 10 = 3 THEN p + 7 ELSE p END AS p FROM v4),
             |v6 AS (SELECT * FROM v5 WHERE c % 7 <> 0)
             |SELECT CAST(-1 AS BIGINT) AS stage, k, c, p FROM v6
             |UNION ALL
             |SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |       CAST(0 AS BIGINT)
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |       (SELECT CAST(count(*) AS BIGINT) FROM base)
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |       (SELECT CAST(count(*) AS BIGINT) FROM v3)
             |ORDER BY stage, k, c""".stripMargin)),

    Q("q65g_sql_alter",
      // Pure-SQL schema lifecycle on the column-mapping machinery
      // (round 12; GraftCatalog.alterTable): ALTER TABLE RENAME
      // COLUMN (metadata-only — the on-disk name never changes), ADD
      // COLUMN (NULL-backfilled), UPDATE under the NEW name, DROP
      // COLUMN — and the dropped column remains queryable via
      // VERSION AS OF, because each era's manifest carries its own
      // schema+mapping. Every expected value derives from `orders`.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65g")
        s.sql("DROP TABLE IF EXISTS graft.q65g")
        s.sql("""CREATE TABLE graft.q65g AS
          SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p,
                 o_custkey AS c
          FROM orders_q65g WHERE o_orderkey % 50 = 0""")
        s.sql("ALTER TABLE graft.q65g RENAME COLUMN p TO price")
        s.sql("ALTER TABLE graft.q65g ADD COLUMN flag BIGINT")
        s.sql("UPDATE graft.q65g SET flag = price % 10 WHERE k % 100 = 0")
        s.sql("ALTER TABLE graft.q65g DROP COLUMN c")
        s.sql("""
          SELECT k, price, flag,
            (SELECT CAST(sum(c) AS BIGINT)
             FROM graft.q65g VERSION AS OF 2) AS v2_c_sum
          FROM graft.q65g ORDER BY k""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k,
             |         CAST(round(o_totalprice) AS BIGINT) AS p,
             |         o_custkey AS c
             |  FROM orders WHERE o_orderkey % 50 = 0)
             |SELECT k, p AS price,
             |  CASE WHEN k % 100 = 0 THEN p % 10 ELSE NULL END AS flag,
             |  (SELECT CAST(sum(c) AS BIGINT) FROM base) AS v2_c_sum
             |FROM base ORDER BY k""".stripMargin)),

    Q("q65h_sql_maintenance",
      // The MAINTENANCE + CDC surface on PURE SQL (round 13): the
      // vt_changes table function reads the change feed between
      // versions (insert files, DV deletes, and an OPTIMIZE's full
      // rewrite), and the DSv2 stored procedures CALL graft.optimize /
      // CALL graft.restore run cluster-rewrite and rollback with zero
      // DataFrame calls (GraftProcedures; Spark's public
      // ProcedureCatalog). Versions: v1 CREATE (empty), v2 CTAS rows,
      // v3 +INSERT, v4 DV DELETE, v5 OPTIMIZE rewrite, v6 RESTORE to
      // v3 — every stage's row counts derive from `orders`, so DuckDB
      // replays the whole lifecycle.
      (s, d) => {
        org.apache.spark.sql.graftbridge.GraftTableFunctions.install(s)
        Tables.orders(s, d).createOrReplaceTempView("orders_q65h")
        s.sql("DROP TABLE IF EXISTS graft.q65h")
        s.sql("""CREATE TABLE graft.q65h AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65h WHERE o_orderkey % 20 < 2""")
        s.sql("""INSERT INTO graft.q65h
          SELECT o_orderkey, o_custkey, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65h WHERE o_orderkey % 20 = 2""")
        s.sql("DELETE FROM graft.q65h WHERE k % 40 = 1")
        s.sql("CALL graft.optimize('q65h', 'k', 8, 4)")
        s.sql("CALL graft.restore('q65h', 3)")
        s.sql("""
          SELECT 1 AS stage, _change_type, count(*) AS n
            FROM vt_changes('q65h', 2, 3) GROUP BY _change_type
          UNION ALL
          SELECT 2 AS stage, _change_type, count(*) AS n
            FROM vt_changes('q65h', 3, 4) GROUP BY _change_type
          UNION ALL
          SELECT 3 AS stage, _change_type, count(*) AS n
            FROM vt_changes('q65h', 4, 5) GROUP BY _change_type
          UNION ALL
          SELECT 4 AS stage, 'versions' AS _change_type, count(*) AS n
            FROM vt_history('q65h')
          UNION ALL
          SELECT 5 AS stage, 'restored_rows' AS _change_type, count(*) AS n
            FROM graft.q65h
          UNION ALL
          SELECT 6 AS stage, 'sum_p' AS _change_type,
                 CAST(sum(p) AS BIGINT) AS n
            FROM graft.q65h
          ORDER BY stage, _change_type""")
      },
      Some("""WITH a AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 20 < 2),
             |b AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 20 = 2),
             |ab AS (SELECT * FROM a UNION ALL SELECT * FROM b),
             |live AS (SELECT * FROM ab WHERE k % 40 <> 1)
             |SELECT 1 AS stage, 'insert' AS _change_type,
             |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n
             |UNION ALL
             |SELECT 2, 'delete',
             |  (SELECT CAST(count(*) AS BIGINT) FROM ab WHERE k % 40 = 1)
             |UNION ALL
             |SELECT 3, 'delete', (SELECT CAST(count(*) AS BIGINT) FROM live)
             |UNION ALL
             |SELECT 3, 'insert', (SELECT CAST(count(*) AS BIGINT) FROM live)
             |UNION ALL
             |SELECT 4, 'versions', CAST(6 AS BIGINT)
             |UNION ALL
             |SELECT 5, 'restored_rows', (SELECT CAST(count(*) AS BIGINT) FROM ab)
             |UNION ALL
             |SELECT 6, 'sum_p', (SELECT CAST(sum(p) AS BIGINT) FROM ab)
             |ORDER BY stage, _change_type""".stripMargin)),

    Q("q65i_sql_nested_alter",
      // Pure-SQL NESTED schema lifecycle (round 13; nested-struct
      // column mapping): RENAME COLUMN props.p (a struct leaf — the
      // colmap keys the dotted logical path, the on-disk name never
      // changes), ADD COLUMNS (props.flag) NULL-backfilled INSIDE the
      // struct, RENAME the PARENT struct (its mapped descendants
      // re-key their logical prefix; physical paths — and therefore
      // every stats key — never move), DROP a nested leaf, then read
      // the current era flat AND the v2 era under ITS nested names
      // via VERSION AS OF. All metadata-only commits; every expected
      // value derives from `orders`.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65i")
        s.sql("DROP TABLE IF EXISTS graft.q65i")
        s.sql("""CREATE TABLE graft.q65i AS
          SELECT o_orderkey AS k,
                 named_struct('p', CAST(round(o_totalprice) AS BIGINT),
                              'c', o_custkey) AS props
          FROM orders_q65i WHERE o_orderkey % 50 = 0""")
        s.sql("ALTER TABLE graft.q65i RENAME COLUMN props.p TO price")
        s.sql("ALTER TABLE graft.q65i ADD COLUMNS (props.flag BIGINT)")
        s.sql("ALTER TABLE graft.q65i RENAME COLUMN props TO meta")
        s.sql("ALTER TABLE graft.q65i DROP COLUMN meta.c")
        s.sql("""
          SELECT k, meta.price AS price, meta.flag AS flag,
            (SELECT CAST(sum(props.c) AS BIGINT)
             FROM graft.q65i VERSION AS OF 2) AS v2_c_sum
          FROM graft.q65i ORDER BY k""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k,
             |         CAST(round(o_totalprice) AS BIGINT) AS p,
             |         o_custkey AS c
             |  FROM orders WHERE o_orderkey % 50 = 0)
             |SELECT k, p AS price, CAST(NULL AS BIGINT) AS flag,
             |  (SELECT CAST(sum(c) AS BIGINT) FROM base) AS v2_c_sum
             |FROM base ORDER BY k""".stripMargin)),

    Q("q65l_sql_array_alter",
      // Pure-SQL ARRAY-OF-STRUCT schema lifecycle (round 14; the
      // `<arr>.element.<field>` colmap convention — the public
      // Iceberg/Parquet element path): RENAME an element-struct field
      // (metadata-only — the colmap keys `events.element.amt`, the
      // on-disk name never changes), ADD a field INSIDE the element
      // struct (NULL-backfilled per element on old files), DROP one,
      // then read the current era EXPLODED and the v2 era under ITS
      // element names via VERSION AS OF. Real event schemas carry
      // array<struct<...>> — this was the remaining evolution gap.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65l")
        s.sql("DROP TABLE IF EXISTS graft.q65l")
        s.sql("""CREATE TABLE graft.q65l AS
          SELECT o_custkey AS k,
                 sort_array(collect_list(named_struct(
                   'ts', o_orderkey,
                   'amt', CAST(round(o_totalprice) AS BIGINT),
                   'tmp', o_custkey))) AS events
          FROM orders_q65l WHERE o_orderkey % 20 = 0
          GROUP BY o_custkey""")
        s.sql("ALTER TABLE graft.q65l RENAME COLUMN events.element.amt TO amount")
        s.sql("ALTER TABLE graft.q65l ADD COLUMNS (events.element.note BIGINT)")
        s.sql("ALTER TABLE graft.q65l DROP COLUMN events.element.tmp")
        s.sql("""
          SELECT k, e.ts AS ts, e.amount AS amount, e.note AS note,
            (SELECT CAST(sum(ev.amt) AS BIGINT) FROM (
               SELECT explode(events) AS ev
               FROM graft.q65l VERSION AS OF 2)) AS v2_amt_sum
          FROM graft.q65l LATERAL VIEW explode(events) x AS e
          ORDER BY k, ts""")
      },
      Some("""WITH base AS (
             |  SELECT o_custkey AS k, o_orderkey AS ts,
             |         CAST(round(o_totalprice) AS BIGINT) AS amt
             |  FROM orders WHERE o_orderkey % 20 = 0)
             |SELECT k, ts, amt AS amount, CAST(NULL AS BIGINT) AS note,
             |  (SELECT CAST(sum(amt) AS BIGINT) FROM base) AS v2_amt_sum
             |FROM base ORDER BY k, ts""".stripMargin)),

    Q("q65j_sql_clone",
      // SHALLOW CLONE on PURE SQL (round 13; CALL graft.clone): fork
      // a table (metadata-only — the clone references the source's
      // files by absolute path), write to the fork, and read source
      // and fork back independently: the source must not observe the
      // fork's insert/delete, the fork keeps the source's DV-deleted
      // rows deleted, and the pre-clone source era stays
      // time-travelable. Every count derives from `orders`.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65j")
        s.sql("DROP TABLE IF EXISTS graft.q65j_src")
        s.sql("DROP TABLE IF EXISTS graft.q65j_fork")
        s.sql("""CREATE TABLE graft.q65j_src AS
          SELECT o_orderkey AS k, o_custkey AS c
          FROM orders_q65j WHERE o_orderkey % 10 = 0""")
        s.sql("DELETE FROM graft.q65j_src WHERE k % 30 = 0")
        s.sql("CALL graft.clone('q65j_src', 'q65j_fork')")
        s.sql("INSERT INTO graft.q65j_fork SELECT -k, c FROM graft.q65j_fork")
        s.sql("DELETE FROM graft.q65j_fork WHERE k > 0 AND k % 50 = 10")
        // self-contain the fork (byte-copy localization): rows must be
        // IDENTICAL after — the oracle's counts double as the
        // materialize-preserves-content gate
        s.sql("CALL graft.materialize('q65j_fork')")
        s.sql("""
          SELECT 'src' AS side, count(*) AS n,
                 CAST(sum(k) AS BIGINT) AS sum_k FROM graft.q65j_src
          UNION ALL
          SELECT 'src_v2', count(*), CAST(sum(k) AS BIGINT)
          FROM graft.q65j_src VERSION AS OF 2
          UNION ALL
          SELECT 'fork', count(*), CAST(sum(k) AS BIGINT) FROM graft.q65j_fork
          ORDER BY side""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_custkey AS c
             |  FROM orders WHERE o_orderkey % 10 = 0),
             |live AS (SELECT * FROM base WHERE k % 30 <> 0),
             |fork AS (
             |  SELECT k FROM live WHERE NOT (k > 0 AND k % 50 = 10)
             |  UNION ALL SELECT -k FROM live)
             |SELECT 'src' AS side, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(k) AS BIGINT) AS sum_k FROM live
             |UNION ALL
             |SELECT 'src_v2', CAST(count(*) AS BIGINT),
             |  CAST(sum(k) AS BIGINT) FROM base
             |UNION ALL
             |SELECT 'fork', CAST(count(*) AS BIGINT),
             |  CAST(sum(k) AS BIGINT) FROM fork
             |ORDER BY side""".stripMargin)),

    Q("q65k_sql_tags",
      // Pure-SQL NAMED TAGS (round 14; the public Iceberg/Delta
      // snapshot-pin concept): `CALL graft.tag` pins the current
      // version under a human-readable name, more data lands, and the
      // pinned era reads back THREE ways — `vt_read('t@name')`,
      // `VERSION AS OF 'name'`, and (after `drop_tag` + re-tag) the
      // moved pin — with zero out-of-band version bookkeeping. The
      // vacuum interaction (a tagged era survives retention) is
      // spec-gated in TagSpec; here the oracle pins the read
      // semantics end-to-end from `orders` alone.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65k")
        s.sql("DROP TABLE IF EXISTS graft.q65k")
        s.sql("""CREATE TABLE graft.q65k AS
          SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS amt
          FROM orders_q65k WHERE o_orderkey % 40 = 0""")
        s.sql("CALL graft.tag('q65k', 'v1-corpus')")
        s.sql("""INSERT INTO graft.q65k
          SELECT o_orderkey + 10000000, o_custkey
          FROM orders_q65k WHERE o_orderkey % 40 = 20""")
        s.sql("CALL graft.tag('q65k', 'v2-corpus')")
        s.sql("""
          SELECT 'era1' AS era, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(amt) AS BIGINT) AS amt_sum
          FROM vt_read('q65k@v1-corpus')
          UNION ALL
          SELECT 'era1_asof', CAST(count(*) AS BIGINT),
                 CAST(sum(amt) AS BIGINT)
          FROM graft.q65k VERSION AS OF 'v1-corpus'
          UNION ALL
          SELECT 'era2', CAST(count(*) AS BIGINT),
                 CAST(sum(amt) AS BIGINT)
          FROM vt_read('q65k@v2-corpus')
          ORDER BY era""")
      },
      Some("""WITH era1 AS (
             |  SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS amt
             |  FROM orders WHERE o_orderkey % 40 = 0),
             |era2 AS (SELECT * FROM era1
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, o_custkey
             |  FROM orders WHERE o_orderkey % 40 = 20)
             |SELECT 'era1' AS era, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(amt) AS BIGINT) AS amt_sum FROM era1
             |UNION ALL
             |SELECT 'era1_asof', CAST(count(*) AS BIGINT),
             |  CAST(sum(amt) AS BIGINT) FROM era1
             |UNION ALL
             |SELECT 'era2', CAST(count(*) AS BIGINT),
             |  CAST(sum(amt) AS BIGINT) FROM era2
             |ORDER BY era""".stripMargin)),

    Q("q65m_sql_merge_cdc",
      // CDC-APPLY MERGE (round 15): the graft-cdc feed's SQL consumer
      // idiom — conditional WHEN MATCHED DELETE / UPDATE with a
      // guarded INSERT, first-match-wins clause order — lowered onto
      // VersionedTable.mergeApply's conditional copy-on-write (only
      // files holding an applicable key rewrite; one atomic commit, so
      // VERSION AS OF still serves the pre-apply era). The CDC batch
      // derives from `orders`: deletes for k%50 IN (0,1), updates for
      // (2,3) (price doubled, partial SET keeps c), inserts for 5,
      // and delete rows for ABSENT keys (6) that must no-op.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65m")
        s.sql("DROP TABLE IF EXISTS graft.q65m")
        s.sql("""CREATE TABLE graft.q65m AS
          SELECT o_orderkey AS k, o_custkey AS c,
                 CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65m WHERE o_orderkey % 50 < 5""")
        s.sql("""
          MERGE INTO graft.q65m t USING (
            SELECT o_orderkey AS k, o_custkey AS c,
                   CAST(round(o_totalprice) * 2 AS BIGINT) AS p,
                   CASE WHEN o_orderkey % 50 IN (0, 1, 6) THEN 'delete'
                        WHEN o_orderkey % 50 IN (2, 3) THEN 'update'
                        ELSE 'insert' END AS _change_type
            FROM orders_q65m WHERE o_orderkey % 50 IN (0, 1, 2, 3, 5, 6)) s
          ON t.k = s.k
          WHEN MATCHED AND s._change_type = 'delete' THEN DELETE
          WHEN MATCHED THEN UPDATE SET p = s.p
          WHEN NOT MATCHED AND s._change_type <> 'delete'
            THEN INSERT (k, c, p) VALUES (s.k, s.c, s.p)""")
        s.sql("""
          SELECT CAST(-1 AS BIGINT) AS stage, k, c, p FROM graft.q65m
          UNION ALL
          SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 (SELECT count(*) FROM graft.q65m VERSION AS OF 2)
          ORDER BY stage, k, c, p""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 50 < 5),
             |cdcp AS (
             |  SELECT o_orderkey AS k, o_custkey AS c,
             |         CAST(round(o_totalprice) * 2 AS BIGINT) AS p
             |  FROM orders),
             |final AS (
             |  SELECT b.k, b.c,
             |         CASE WHEN b.k % 50 IN (2, 3) THEN u.p ELSE b.p END AS p
             |  FROM base b JOIN cdcp u ON b.k = u.k
             |  WHERE b.k % 50 NOT IN (0, 1)
             |  UNION ALL
             |  SELECT k, c, p FROM cdcp WHERE k % 50 = 5)
             |SELECT CAST(-1 AS BIGINT) AS stage, k, c, p FROM final
             |UNION ALL
             |SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             |       (SELECT CAST(count(*) AS BIGINT) FROM base)
             |ORDER BY stage, k, c, p""".stripMargin)),

    Q("q65n_sql_constraints",
      // Write-path CHECK constraints (round 16): `ALTER TABLE ... ADD
      // CONSTRAINT p_pos CHECK (p >= 0)` records a carried table
      // property every write path enforces as ONE commit-sized
      // vectorized pass — a violating INSERT aborts before publish,
      // leaving the table AND its version counter unchanged (the
      // VERSION AS OF 3 row proves the failed insert never became an
      // era), then a valid INSERT lands normally. The `-1` flag row
      // asserts the violation actually threw.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65n")
        s.sql("DROP TABLE IF EXISTS graft.q65n")
        s.sql("""CREATE TABLE graft.q65n AS
          SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65n WHERE o_orderkey % 60 = 0""")
        s.sql("ALTER TABLE graft.q65n ADD CONSTRAINT p_pos CHECK (p >= 0)")
        val failed = try {
          s.sql("""INSERT INTO graft.q65n
            SELECT o_orderkey + 20000000,
                   -CAST(round(o_totalprice) AS BIGINT)
            FROM orders_q65n WHERE o_orderkey % 60 = 30""")
          99L
        } catch { case _: Exception => 1L }
        s.sql("""INSERT INTO graft.q65n
          SELECT o_orderkey + 10000000, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65n WHERE o_orderkey % 60 = 30""")
        s.sql(s"""
          SELECT k, p FROM graft.q65n
          UNION ALL
          SELECT CAST(-1 AS BIGINT), CAST(-$failed AS BIGINT)
          UNION ALL
          SELECT CAST(-2 AS BIGINT),
                 (SELECT count(*) FROM graft.q65n VERSION AS OF 3)
          ORDER BY k, p""")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 60 = 0),
             |ins AS (
             |  SELECT o_orderkey + 10000000 AS k,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 60 = 30)
             |SELECT k, p FROM base
             |UNION ALL SELECT k, p FROM ins
             |UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
             |UNION ALL SELECT CAST(-2 AS BIGINT),
             |  (SELECT CAST(count(*) AS BIGINT) FROM base)
             |ORDER BY k, p""".stripMargin)),

    Q("q65p_sql_merge_on_pred",
      // Compound-ON MERGE (round 16): `ON t.k = s.k AND t.seg = 0` —
      // the partitioned/clustered-table idiom. MATCHED narrows to the
      // pred-true rows (seg 0 updates), a key existing only among
      // pred-false rows is UNMATCHED (its source row inserts alongside
      // the untouched seg 1/2 rows), and the copy-on-write file set is
      // pruned to files holding pred-true matches.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65p")
        s.sql("DROP TABLE IF EXISTS graft.q65p")
        s.sql("""CREATE TABLE graft.q65p AS
          SELECT o_orderkey AS k, o_orderkey % 3 AS seg,
                 CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65p WHERE o_orderkey % 20 = 0""")
        s.sql("""
          MERGE INTO graft.q65p t USING (
            SELECT o_orderkey AS k,
                   CAST(round(o_totalprice) * 3 AS BIGINT) AS p
            FROM orders_q65p WHERE o_orderkey % 10 = 0) s
          ON t.k = s.k AND t.seg = 0
          WHEN MATCHED AND s.p > 0 THEN UPDATE SET p = s.p
          WHEN NOT MATCHED THEN INSERT (k, seg, p) VALUES (s.k, -1, s.p)""")
        s.sql("SELECT k, seg, p FROM graft.q65p ORDER BY k, seg, p")
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey AS k, o_orderkey % 3 AS seg,
             |         CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 20 = 0),
             |src AS (
             |  SELECT o_orderkey AS k,
             |         CAST(round(o_totalprice) * 3 AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 10 = 0)
             |SELECT b.k, b.seg,
             |       CASE WHEN b.seg = 0 THEN s.p ELSE b.p END AS p
             |FROM base b LEFT JOIN src s ON b.k = s.k
             |UNION ALL
             |SELECT s.k, CAST(-1 AS BIGINT) AS seg, s.p
             |FROM src s LEFT JOIN (SELECT k FROM base WHERE seg = 0) m
             |  ON s.k = m.k
             |WHERE m.k IS NULL
             |ORDER BY k, seg, p""".stripMargin)),

    Q("q65o_sql_column_default",
      // Column DEFAULT values (round 16): `ADD COLUMN src STRING
      // DEFAULT 'legacy'` is METADATA-ONLY (zero data rewrites) — the
      // parquet scan backfills the existence default for every file
      // predating the column, the SQL INSERT path fills the CURRENT
      // default for omitted columns, and `SET DEFAULT` moves only the
      // current default (new writes), never the recorded history. The
      // VERSION AS OF 2 row proves the pre-add era is intact.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65o")
        s.sql("DROP TABLE IF EXISTS graft.q65o")
        s.sql("""CREATE TABLE graft.q65o AS
          SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p
          FROM orders_q65o WHERE o_orderkey % 40 = 0""")
        s.sql("ALTER TABLE graft.q65o ADD COLUMN src STRING DEFAULT 'legacy'")
        s.sql("""INSERT INTO graft.q65o (k, p)
          SELECT o_orderkey + 10000000, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65o WHERE o_orderkey % 40 = 20""")
        s.sql("ALTER TABLE graft.q65o ALTER COLUMN src SET DEFAULT 'fresh'")
        s.sql("""INSERT INTO graft.q65o (k, p)
          SELECT o_orderkey + 20000000, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65o WHERE o_orderkey % 40 = 10""")
        s.sql("""
          SELECT k, p, src FROM graft.q65o
          UNION ALL
          SELECT CAST(-1 AS BIGINT),
                 (SELECT count(*) FROM graft.q65o VERSION AS OF 2), 'era2'
          ORDER BY k, p, src""")
      },
      Some("""WITH b0 AS (
             |  SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p,
             |         'legacy' AS src
             |  FROM orders WHERE o_orderkey % 40 = 0),
             |b1 AS (
             |  SELECT o_orderkey + 10000000 AS k,
             |         CAST(round(o_totalprice) AS BIGINT) AS p, 'legacy' AS src
             |  FROM orders WHERE o_orderkey % 40 = 20),
             |b2 AS (
             |  SELECT o_orderkey + 20000000 AS k,
             |         CAST(round(o_totalprice) AS BIGINT) AS p, 'fresh' AS src
             |  FROM orders WHERE o_orderkey % 40 = 10)
             |SELECT k, p, src FROM b0
             |UNION ALL SELECT k, p, src FROM b1
             |UNION ALL SELECT k, p, src FROM b2
             |UNION ALL SELECT CAST(-1 AS BIGINT),
             |  (SELECT CAST(count(*) AS BIGINT) FROM b0), 'era2'
             |ORDER BY k, p, src""".stripMargin)),

    Q("q65q_sql_identity",
      // IDENTITY columns (round 16): `id BIGINT GENERATED ALWAYS AS
      // IDENTITY` — the surrogate-key DDL. Values are generated at
      // the INSERT path from a carried manifest high-water mark
      // (`identitynext.<phys>`), unique by construction and
      // range-disjoint across commits under OCC (a racing writer
      // regenerates from the winner's mark); SPARSE like the public
      // Delta/Iceberg contract (uniqueness + direction, never
      // contiguity), so the oracle checks the INVARIANTS — count,
      // uniqueness, positivity, cross-commit disjointness — which ARE
      // deterministic, not the layout-dependent raw values.
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_q65q")
        s.sql("DROP TABLE IF EXISTS graft.q65q")
        s.sql("""CREATE TABLE graft.q65q
          (id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, p BIGINT)""")
        s.sql("""INSERT INTO graft.q65q (k, p)
          SELECT o_orderkey, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65q WHERE o_orderkey % 30 = 0""")
        s.sql("""INSERT INTO graft.q65q (k, p)
          SELECT o_orderkey, CAST(round(o_totalprice) AS BIGINT)
          FROM orders_q65q WHERE o_orderkey % 30 = 15""")
        s.sql("""
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(count(DISTINCT id) AS BIGINT) AS n_ids,
                 CAST(min(id) >= 1 AS BIGINT) AS ids_positive,
                 CAST((SELECT min(id) FROM graft.q65q WHERE k % 30 = 15) >
                      (SELECT max(id) FROM graft.q65q WHERE k % 30 = 0)
                      AS BIGINT) AS ranges_disjoint,
                 CAST(sum(p) AS BIGINT) AS p_sum
          FROM graft.q65q""")
      },
      Some("""WITH b AS (
             |  SELECT o_orderkey AS k, CAST(round(o_totalprice) AS BIGINT) AS p
             |  FROM orders WHERE o_orderkey % 30 IN (0, 15))
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |       CAST(count(*) AS BIGINT) AS n_ids,
             |       CAST(1 AS BIGINT) AS ids_positive,
             |       CAST(1 AS BIGINT) AS ranges_disjoint,
             |       CAST(sum(p) AS BIGINT) AS p_sum
             |FROM b""".stripMargin)),

    Q("d17_paragraph_dedup",
      // Paragraph-granularity exact dedup (the CCNet recipe): only the
      // corpus-wide first occurrence of each paragraph survives;
      // per-document survival profile. One text-keyed exchange + one
      // per-doc rollup — no pair enumeration (Dedup.paragraphDedup).
      (s, d) => Dedup.paragraphDedup(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH p AS (SELECT doc_id, i, parts[i] AS para FROM
             |    (SELECT doc_id, string_split(text, '. ') AS parts FROM documents),
             |    unnest(generate_series(1, len(parts))) AS t(i)),
             |k AS (SELECT doc_id, para,
             |    row_number() OVER (PARTITION BY para ORDER BY doc_id, i) AS rn FROM p)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras,
             |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN rn = 1 THEN length(para) ELSE 0 END) AS BIGINT) AS kept_chars
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("d18_span_dedup",
      // Exact-substring SPAN removal (Lee et al. 2022's ExactSubstr
      // policy, round 7): non-first occurrences of every 40-gram mark
      // their span, marks coalesce into maximal islands, islands are
      // cut out and the remainder stitched back in position order.
      // Linear in corpus chars — one gram-keyed exchange + per-doc
      // windows; no pair enumeration however duplicated the corpus
      // (Dedup.spanDedup). The oracle replays gram marking, island
      // coalescing, complement segments, AND the cleaned-text md5 —
      // the reconstruction is verified byte-for-byte, not just the
      // counts.
      (s, d) => Dedup.spanDedup(Tables.documents(s, d), "doc_id", "text", k = 40)
        .orderBy("doc_id"),
      Some("""WITH dd AS (SELECT doc_id, text, length(text) AS len FROM documents),
             |occ AS (SELECT doc_id, text,
             |    unnest(generate_series(1, len - 39)) AS p
             |  FROM dd WHERE len >= 40),
             |mk AS (SELECT doc_id, p,
             |    row_number() OVER (PARTITION BY substr(text, p, 40)
             |      ORDER BY doc_id, p) AS rn FROM occ),
             |dup AS (SELECT doc_id, p AS s, p + 39 AS e FROM mk WHERE rn > 1),
             |run AS (SELECT doc_id, s, e,
             |    max(e) OVER (PARTITION BY doc_id ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run
             |  FROM dup),
             |num AS (SELECT doc_id, s, e,
             |    sum(CASE WHEN run IS NULL OR s > run + 1 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM run),
             |spans AS (SELECT doc_id, isl, min(s) AS ss, max(e) AS se
             |  FROM num GROUP BY 1, 2),
             |gaps AS (
             |  SELECT doc_id,
             |      coalesce(lag(se) OVER (PARTITION BY doc_id ORDER BY ss), 0) + 1 AS gs,
             |      ss - 1 AS ge
             |    FROM spans
             |  UNION ALL
             |  SELECT sp.doc_id, max(sp.se) + 1 AS gs, dd.len AS ge
             |    FROM spans sp JOIN dd ON dd.doc_id = sp.doc_id
             |    GROUP BY sp.doc_id, dd.len
             |  UNION ALL
             |  SELECT doc_id, 1 AS gs, len AS ge FROM dd
             |    WHERE doc_id NOT IN (SELECT doc_id FROM spans)),
             |segs AS (SELECT g.doc_id, g.gs,
             |    substr(dd.text, CAST(g.gs AS INT), CAST(g.ge - g.gs + 1 AS INT)) AS seg
             |  FROM gaps g JOIN dd ON dd.doc_id = g.doc_id WHERE g.ge >= g.gs),
             |cleaned AS (SELECT doc_id,
             |    coalesce(string_agg(seg, '' ORDER BY gs), '') AS ct
             |  FROM segs GROUP BY 1),
             |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
             |    CAST(sum(se - ss + 1) AS BIGINT) AS chars_removed
             |  FROM spans GROUP BY 1)
             |SELECT dd.doc_id,
             |  coalesce(st.n_dup_spans, 0) AS n_dup_spans,
             |  coalesce(st.chars_removed, 0) AS chars_removed,
             |  CAST(length(coalesce(c.ct, '')) AS BIGINT) AS clean_len,
             |  md5(coalesce(c.ct, '')) AS clean_md5
             |FROM dd LEFT JOIN cleaned c ON c.doc_id = dd.doc_id
             |        LEFT JOIN stats st ON st.doc_id = dd.doc_id
             |ORDER BY dd.doc_id""".stripMargin)),

    Q("d20_span_dedup_incremental",
      // INCREMENTAL d18 (round 7) — the production path: the batch
      // (upper half of doc ids) probes the standing distinct-gram
      // index of history (lower half) + its own earlier occurrences;
      // O(batch chars) per batch, never O(corpus). The oracle is the
      // FULL d18 replay over history ∪ batch filtered to batch docs —
      // so the incremental ≡ full-run equivalence is itself the
      // correctness gate (valid because every history id precedes
      // every batch id; d15's pattern for the fuzzy tier).
      (s, d) => {
        val docs = Tables.documents(s, d)
        val mid = docs.agg(max("doc_id")).head().getLong(0) / 2
        Dedup.spanDedupIncremental(
          docs.filter(col("doc_id") <= mid), docs.filter(col("doc_id") > mid),
          "doc_id", "text", k = 40).orderBy("doc_id")
      },
      Some("""WITH dd AS (SELECT doc_id, text, length(text) AS len FROM documents),
             |mid AS (SELECT max(doc_id) // 2 AS m FROM documents),
             |occ AS (SELECT doc_id, text,
             |    unnest(generate_series(1, len - 39)) AS p
             |  FROM dd WHERE len >= 40),
             |mk AS (SELECT doc_id, p,
             |    row_number() OVER (PARTITION BY substr(text, p, 40)
             |      ORDER BY doc_id, p) AS rn FROM occ),
             |dup AS (SELECT doc_id, p AS s, p + 39 AS e FROM mk WHERE rn > 1),
             |run AS (SELECT doc_id, s, e,
             |    max(e) OVER (PARTITION BY doc_id ORDER BY s
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS run
             |  FROM dup),
             |num AS (SELECT doc_id, s, e,
             |    sum(CASE WHEN run IS NULL OR s > run + 1 THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM run),
             |spans AS (SELECT doc_id, isl, min(s) AS ss, max(e) AS se
             |  FROM num GROUP BY 1, 2),
             |gaps AS (
             |  SELECT doc_id,
             |      coalesce(lag(se) OVER (PARTITION BY doc_id ORDER BY ss), 0) + 1 AS gs,
             |      ss - 1 AS ge
             |    FROM spans
             |  UNION ALL
             |  SELECT sp.doc_id, max(sp.se) + 1 AS gs, dd.len AS ge
             |    FROM spans sp JOIN dd ON dd.doc_id = sp.doc_id
             |    GROUP BY sp.doc_id, dd.len
             |  UNION ALL
             |  SELECT doc_id, 1 AS gs, len AS ge FROM dd
             |    WHERE doc_id NOT IN (SELECT doc_id FROM spans)),
             |segs AS (SELECT g.doc_id, g.gs,
             |    substr(dd.text, CAST(g.gs AS INT), CAST(g.ge - g.gs + 1 AS INT)) AS seg
             |  FROM gaps g JOIN dd ON dd.doc_id = g.doc_id WHERE g.ge >= g.gs),
             |cleaned AS (SELECT doc_id,
             |    coalesce(string_agg(seg, '' ORDER BY gs), '') AS ct
             |  FROM segs GROUP BY 1),
             |stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
             |    CAST(sum(se - ss + 1) AS BIGINT) AS chars_removed
             |  FROM spans GROUP BY 1)
             |SELECT dd.doc_id,
             |  coalesce(st.n_dup_spans, 0) AS n_dup_spans,
             |  coalesce(st.chars_removed, 0) AS chars_removed,
             |  CAST(length(coalesce(c.ct, '')) AS BIGINT) AS clean_len,
             |  md5(coalesce(c.ct, '')) AS clean_md5
             |FROM dd LEFT JOIN cleaned c ON c.doc_id = dd.doc_id
             |        LEFT JOIN stats st ON st.doc_id = dd.doc_id
             |WHERE dd.doc_id > (SELECT m FROM mid)
             |ORDER BY dd.doc_id""".stripMargin)),

    Q("d19_semdedup",
      // SemDeDup (round 7; Abbas et al. 2023): semantic dedup INSIDE
      // deterministic IVF cells — duplicates = cosine ≥ 0.4 to a
      // smaller-id cellmate, survivors keep per-vector counts; O(n)
      // output, cell-local pair join, capped degenerate cells
      // (Similarity.semDedup). lloydIters=0 keeps the cell assignment
      // an expression tree, so the oracle composes s3's cell CTEs
      // with the d5 pair predicate bit-for-bit.
      (s, d) => Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4).orderBy("vec_id"),
      Some(s"""WITH $cosSql,
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS scv
              |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
              |ad AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.scv)
              |      + list_dot_product(seeds.scv, seeds.scv) AS dist
              |  FROM ce, seeds),
              |crk AS (SELECT vec_id, cell,
              |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
              |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
              |csz AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM corpus GROUP BY 1),
              |p AS (SELECT a.cid AS cid, CAST(count(*) AS BIGINT) AS nds
              |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND b.cid < a.cid
              |  JOIN ce av ON av.vec_id = a.cid JOIN ce bv ON bv.vec_id = b.cid
              |  WHERE list_dot_product(av.v, bv.v)
              |    / (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.4
              |  GROUP BY 1)
              |SELECT c.cid AS vec_id, CAST(c.cell AS BIGINT) AS cell,
              |  coalesce(p.nds, 0) AS n_dup_smaller,
              |  CAST(CASE WHEN p.cid IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
              |  CAST(CASE WHEN csz.n > 65536 THEN 1 ELSE 0 END AS BIGINT) AS cell_capped
              |FROM corpus c JOIN csz ON csz.cell = c.cell LEFT JOIN p ON p.cid = c.cid
              |ORDER BY vec_id""".stripMargin)),

    Q("d22_semdedup_incremental",
      // Incremental SemDeDup (round 12; Similarity.semDedupIncremental)
      // — the frozen-quantizer posture applied to d19: the upper-id
      // quarter of the corpus arrives as a batch, assigns to the
      // STANDING corpus's cells, and pairs only against smaller-id
      // cellmates — O(batch × cell width), the standing pair join
      // never re-runs. Because batch ids exceed all standing ids and
      // lloydIters=0 pins the seeds to the first 16 ids, the output
      // is BIT-IDENTICAL to the full d19 run filtered to the batch —
      // which is exactly what the oracle computes.
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // 1-row bounded collect: the id split point
        val split = emb.agg(max("vec_id")).head().getLong(0) * 3 / 4 + 1
        Similarity.semDedupIncremental(
          emb.filter(col("vec_id") < split),
          emb.filter(col("vec_id") >= split),
          "vec_id", "embedding", threshold = 0.4).orderBy("vec_id")
      },
      Some(s"""WITH $cosSql,
              |sp AS (SELECT 1 + (3 * max(vec_id)) // 4 AS s FROM ce),
              |seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS scv
              |  FROM (SELECT * FROM ce ORDER BY vec_id LIMIT 16)),
              |ad AS (SELECT ce.vec_id, seeds.cell,
              |    list_dot_product(ce.v, ce.v) - 2.0 * list_dot_product(ce.v, seeds.scv)
              |      + list_dot_product(seeds.scv, seeds.scv) AS dist
              |  FROM ce, seeds),
              |crk AS (SELECT vec_id, cell,
              |  row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM ad),
              |corpus AS (SELECT vec_id AS cid, cell FROM crk WHERE rk = 1),
              |csz AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM corpus GROUP BY 1),
              |p AS (SELECT a.cid AS cid, CAST(count(*) AS BIGINT) AS nds
              |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND b.cid < a.cid
              |  JOIN ce av ON av.vec_id = a.cid JOIN ce bv ON bv.vec_id = b.cid
              |  WHERE list_dot_product(av.v, bv.v)
              |    / (sqrt(list_dot_product(av.v, av.v)) * sqrt(list_dot_product(bv.v, bv.v))) >= 0.4
              |  GROUP BY 1)
              |SELECT c.cid AS vec_id, CAST(c.cell AS BIGINT) AS cell,
              |  coalesce(p.nds, 0) AS n_dup_smaller,
              |  CAST(CASE WHEN p.cid IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept,
              |  CAST(CASE WHEN csz.n > 65536 THEN 1 ELSE 0 END AS BIGINT) AS cell_capped
              |FROM corpus c JOIN csz ON csz.cell = c.cell LEFT JOIN p ON p.cid = c.cid
              |WHERE c.cid >= (SELECT s FROM sp)
              |ORDER BY vec_id""".stripMargin)),

    Q("t16_char_entropy",
      // Character-level Shannon entropy (gibberish/boilerplate
      // signal), computed per row with codegen HOFs — narrow plan, no
      // char-explode shuffle (TextAnalysis.charEntropy; the oracle IS
      // the explode form, so the narrow path is verified against it).
      (s, d) => TextAnalysis.charEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
             |cnt AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS cnt FROM ch GROUP BY doc_id, c),
             |sl AS (SELECT doc_id, sum(cnt * log2(cnt)) AS sl FROM cnt GROUP BY 1)
             |SELECT d.doc_id,
             |  CASE WHEN length(d.text) = 0 THEN 0.0
             |       ELSE round(log2(CAST(length(d.text) AS DOUBLE)) - sl.sl / length(d.text), 4)
             |  END AS entropy
             |FROM documents d JOIN sl USING (doc_id) ORDER BY doc_id""".stripMargin)),

    Q("smp6_systematic_sample",
      // Systematic (every k-th under a deterministic total order)
      // sampling — the census design whose only hard part at scale IS
      // the global rank; rides Quantiles.globalRank (stats pass, no
      // single-task sort at any SF).
      // spreadSmall (r17, profiled): the sub-split orders scan is ONE
      // task, so globalRank's checkpoint + sample + histogram chain
      // ran serial (~1.1 s single-task of 1.4 s total); a no-op at any
      // real scale by spreadSmall's input-size gate, and the rank is a
      // deterministic function of the keys, so output is unchanged.
      (s, d) => Quantiles.globalRank(
          Tables.spreadSmall(s, d, "orders",
            Tables.orders(s, d).select("o_orderkey", "o_orderdate")),
          Seq(col("o_orderdate"), col("o_orderkey")), "rk")
        .filter(pmod(col("rk"), lit(200)) === 1)
        .select("o_orderkey", "rk")
        .orderBy("rk"),
      Some("""WITH r AS (SELECT o_orderkey,
             |    row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rk FROM orders)
             |SELECT o_orderkey, rk FROM r WHERE rk % 200 = 1 ORDER BY rk""".stripMargin)),

    Q("c6_temperature_mix",
      // Temperature-based source mixing (sample ∝ n^(1/2): big sources
      // down-weighted, small surfaced) — integer-exact end to end:
      // ⌊√n⌋ weights (IEEE sqrt is correctly rounded), div targets,
      // md5-bottom-k selection per source (Corpus.temperatureMix).
      (s, d) => Corpus.temperatureMix(Tables.documents(s, d), "doc_id", "source",
          total = 1000L)
        .orderBy("src"),
      Some(s"""WITH w AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS n,
              |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w
              |  FROM documents GROUP BY 1),
              |t AS (SELECT src, n, w,
              |    CAST((w * 1000) // (SELECT sum(w) FROM w) AS BIGINT) AS target FROM w),
              |h AS (SELECT doc_id, source AS src, $docIdBaseHashSql AS hk FROM documents),
              |r AS (SELECT doc_id, src,
              |    row_number() OVER (PARTITION BY src ORDER BY hk, doc_id) AS rn FROM h),
              |sel AS (SELECT r.src, r.doc_id FROM r JOIN t USING (src) WHERE rn <= target),
              |g AS (SELECT src, CAST(count(*) AS BIGINT) AS taken,
              |    CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
              |  FROM sel GROUP BY 1)
              |SELECT g.src, t.n, t.target, g.taken, g.min_id, g.max_id
              |FROM g JOIN t USING (src) ORDER BY src""".stripMargin)),

    Q("c10_token_budget",
      // TOKEN-budget recipe composition (c6 counts documents; a
      // training run buys tokens): per source, admit docs in md5
      // order until the source's token budget fills — crossing doc
      // admitted, overshoot ≤ 1 doc. src0 capped tight (300), src1
      // uncapped within its mass, the rest on the 700 default.
      (s, d) => Corpus.tokenBudgetMix(Tables.documents(s, d), "doc_id", "text",
          "source", Map("src0" -> 300L, "src1" -> 100000L), defaultBudget = 700L)
        .orderBy("src", "cum_tokens", "doc_id"),
      Some(s"""WITH h AS (SELECT doc_id, source AS src,
              |    CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
              |    $docIdBaseHashSql AS hk FROM documents),
              |c AS (SELECT doc_id, src, n_tokens,
              |    CAST(sum(n_tokens) OVER (PARTITION BY src ORDER BY hk, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
              |  FROM h)
              |SELECT doc_id, src, n_tokens, cum_tokens FROM c
              |WHERE cum_tokens - n_tokens <
              |  (CASE src WHEN 'src0' THEN 300 WHEN 'src1' THEN 100000 ELSE 700 END)
              |ORDER BY src, cum_tokens, doc_id""".stripMargin)),

    Q("t17_readability",
      // Flesch-Kincaid readability: words / sentences / vowel-group
      // syllables, all from single regexp passes — narrow no-shuffle
      // projection (TextAnalysis.readability).
      (s, d) => TextAnalysis.readability(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH b AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_words,
             |    CAST(greatest(len(list_filter(string_split(text, '. '), x -> x <> '')), 1) AS BIGINT) AS n_sentences,
             |    CAST(length(regexp_replace(lower(text), '[aeiouy]+', '.', 'g'))
             |       - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g')) AS BIGINT) AS syllables
             |  FROM documents)
             |SELECT doc_id, n_words, n_sentences, syllables,
             |  round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             |      + 11.8 * (CAST(syllables AS DOUBLE) / n_words) - 15.59, 4) AS fk_grade
             |FROM b WHERE n_words > 0 ORDER BY doc_id""".stripMargin)),

    Q("t18_ngram_novelty",
      // Per-document 5-gram novelty: share of the doc's DISTINCT word
      // shingles whose corpus-wide first occurrence is this doc
      // (integer basis points). One shingle-keyed exchange, per-doc
      // rollup — no pair enumeration (TextAnalysis.ngramNovelty).
      (s, d) => TextAnalysis.ngramNovelty(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id"),
      Some("""WITH tk AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
             |sh0 AS (SELECT doc_id, list_distinct(list_transform(
             |      generate_series(1, len(toks) - 4),
             |      i -> array_to_string(toks[i:i+4], ' '))) AS shs
             |  FROM tk WHERE len(toks) >= 5),
             |sh AS (SELECT doc_id, unnest(shs) AS sh FROM sh0),
             |f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1)
             |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
             |  CAST(sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
             |  CAST((sum(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) * 10000)
             |    // count(*) AS BIGINT) AS novelty_bp
             |FROM sh JOIN f USING (sh) GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("m6_shot_boundaries",
      // Shot-boundary detection over a framed byte stream: per-frame
      // 12-bit positional aHash (Multimodal.frameHashes — the
      // integer-compare convention of m4, per frame), then a cut
      // wherever consecutive frames' hashes differ by hamming ≥ 4.
      // The lag window partitions PER DOCUMENT — no global sort at
      // any scale; with a real codec the group sums become
      // downsampled luma and the banding/compare is unchanged.
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val ph = Multimodal.frameHashes(payload, "doc_id", "payload",
          frameBytes = 32, nBits = 12).toDF()
        val w = Window.partitionBy("id").orderBy("frame_idx")
        ph.withColumn("prev", lag("ph", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("id").as("doc_id"),
            col("frame_idx").cast("long").as("frame_idx"),
            expr("CAST(bit_count(ph ^ prev) AS BIGINT)").as("hamming"))
          .withColumn("is_cut", (col("hamming") >= 4).cast("long"))
          .orderBy("doc_id", "frame_idx")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
             |f AS (SELECT doc_id, text, n,
             |    unnest(generate_series(0, (n + 31) // 32 - 1)) AS fi FROM b WHERE n > 0),
             |pos AS (SELECT doc_id, fi,
             |    (i - 1) % 12 AS grp,
             |    ascii(substr(text, CAST(fi * 32 + i AS INT), 1)) AS v
             |  FROM (SELECT doc_id, fi, text, least(n - fi * 32, 32) AS nb FROM f),
             |       unnest(generate_series(1, nb)) AS t(i)),
             |gs AS (SELECT doc_id, fi, grp, sum(v) AS gsum FROM pos GROUP BY 1, 2, 3),
             |tot AS (SELECT doc_id, fi, sum(gsum) AS total FROM gs GROUP BY 1, 2),
             |ph AS (SELECT gs.doc_id, gs.fi,
             |    CAST(sum(CASE WHEN gs.gsum * 12 > tot.total
             |      THEN (1::BIGINT << grp) ELSE 0 END) AS BIGINT) AS ph
             |  FROM gs JOIN tot ON gs.doc_id = tot.doc_id AND gs.fi = tot.fi
             |  GROUP BY 1, 2),
             |lg AS (SELECT doc_id, fi, ph,
             |    lag(ph) OVER (PARTITION BY doc_id ORDER BY fi) AS prev FROM ph)
             |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
             |  CAST(bit_count(xor(ph, prev)) AS BIGINT) AS hamming,
             |  CAST(CASE WHEN bit_count(xor(ph, prev)) >= 4 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
             |FROM lg WHERE prev IS NOT NULL ORDER BY doc_id, frame_idx""".stripMargin)),

    Q("m7_energy_segments",
      // Voice-activity-style energy segmentation over a framed byte
      // stream: per-frame energy Σ(byte−128)² (Multimodal
      // .frameEnergies, same primitive-array pass as m3/m6), frames
      // above the threshold are "active", and consecutive active
      // frames coalesce into segments via the islands trick
      // (frame_idx − row_number). The window partitions PER DOCUMENT
      // — no global sort at any scale; with a real audio codec the
      // bytes become PCM samples and the thresholding/coalescing is
      // unchanged. ORACLE ASSUMES ASCII TEXT: the DuckDB side walks
      // the payload per CHARACTER (substr/ascii) while Spark walks
      // per BYTE — identical only while driver testdata is ASCII
      // (same posture as m3/m6); a non-ASCII round should fail here.
      (s, d) => {
        val payload = Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
        val fe = Multimodal.frameEnergies(payload, "doc_id", "payload",
          frameBytes = 32).toDF()
        val w = Window.partitionBy("id").orderBy("frame_idx")
        fe.filter(col("energy") >= 65000)
          .withColumn("grp", col("frame_idx") - row_number().over(w))
          .groupBy(col("id"), col("grp"))
          .agg(min("frame_idx").cast("long").as("seg_start"),
            max("frame_idx").cast("long").as("seg_end"),
            count(lit(1)).as("n_frames"),
            sum("energy").as("sum_energy"))
          .select(col("id").as("doc_id"), col("seg_start"), col("seg_end"),
            col("n_frames"), col("sum_energy"))
          .orderBy("doc_id", "seg_start")
      },
      Some("""WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
             |f AS (SELECT doc_id, text, n,
             |    unnest(generate_series(0, (n + 31) // 32 - 1)) AS fi FROM b WHERE n > 0),
             |pos AS (SELECT doc_id, fi,
             |    ascii(substr(text, CAST(fi * 32 + i AS INT), 1)) - 128 AS dv
             |  FROM (SELECT doc_id, fi, text, least(n - fi * 32, 32) AS nb FROM f),
             |       unnest(generate_series(1, nb)) AS t(i)),
             |en AS (SELECT doc_id, fi, sum(dv * dv) AS energy FROM pos GROUP BY 1, 2),
             |act AS (SELECT doc_id, fi, energy,
             |    fi - row_number() OVER (PARTITION BY doc_id ORDER BY fi) AS grp
             |  FROM en WHERE energy >= 65000)
             |SELECT doc_id, CAST(min(fi) AS BIGINT) AS seg_start,
             |  CAST(max(fi) AS BIGINT) AS seg_end,
             |  CAST(count(*) AS BIGINT) AS n_frames,
             |  CAST(sum(energy) AS BIGINT) AS sum_energy
             |FROM act GROUP BY doc_id, grp ORDER BY doc_id, seg_start""".stripMargin)),

    Q("s9_recall_eval",
      // ANN quality measurement — the eval every deployed ANN index
      // needs: recall@k of the LSH tier (s2's exact configuration)
      // against brute-force ground truth (s1's), per query, in exact
      // integer basis points. Both tiers are already deterministic
      // (cos DESC, id tie-break), so the recall is deterministic too.
      // Cost = the two tier scans + an O(queries × k) semi-join;
      // ground truth over a query SAMPLE (here vec_id < 5) is how
      // recall is audited at 100 TB — never brute-force over the full
      // query log.
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 5)
        val truth = Similarity.knnBrute(e, q, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val approx = Similarity.knnLsh(e, q, "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val matched = truth.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_matched"))
        q.select(col("vec_id").as("query_id"))
          .join(matched, Seq("query_id"), "left")
          .select(col("query_id"),
            lit(10L).as("k"),
            coalesce(col("n_matched"), lit(0L)).as("n_matched"),
            (coalesce(col("n_matched"), lit(0L)) * 1000L).as("recall_bp"))
          .orderBy("query_id")
      },
      Some(s"""WITH $cosSql,
              |q AS (SELECT vec_id AS qid, v AS qv FROM ce WHERE vec_id < 5),
              |bsc AS (SELECT qid, c.vec_id AS cid,
              |  list_dot_product(qv, c.v)
              |    / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
              |  FROM q JOIN ce c ON c.vec_id <> qid),
              |br AS (SELECT qid, cid FROM (SELECT qid, cid,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM bsc)
              |  WHERE rk <= 10),
              |comp AS (SELECT t, p, i,
              |    ((strpos('0123456789abcdef',
              |        substr(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 1)) - 1)
              |      - 7.5) / 8 AS c
              |  FROM (SELECT unnest(generate_series(0, 3)) AS t) ts,
              |       (SELECT unnest(generate_series(0, 7)) AS p) ps,
              |       (SELECT unnest(generate_series(0, 63)) AS i) is1),
              |planes AS (SELECT t, p, list(c ORDER BY i) AS pl FROM comp GROUP BY 1, 2),
              |sb AS (SELECT ce.vec_id, planes.t,
              |    CASE WHEN list_dot_product(ce.v, planes.pl) >= 0
              |         THEN (1::BIGINT << p) ELSE 0 END AS bit
              |  FROM ce, planes),
              |bk AS (SELECT vec_id, t, CAST(sum(bit) AS BIGINT) AS bucket FROM sb GROUP BY 1, 2),
              |cand AS (SELECT DISTINCT q2.vec_id AS qid, c.vec_id AS cid
              |  FROM bk q2 JOIN bk c ON q2.t = c.t AND q2.bucket = c.bucket
              |  WHERE q2.vec_id < 5 AND q2.vec_id <> c.vec_id),
              |lsc AS (SELECT qid, cid,
              |  list_dot_product(qv.v, cv.v)
              |    / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))) AS cos
              |  FROM cand JOIN ce qv ON qv.vec_id = qid JOIN ce cv ON cv.vec_id = cid),
              |lr AS (SELECT qid, cid FROM (SELECT qid, cid,
              |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk FROM lsc)
              |  WHERE rk <= 10),
              |m AS (SELECT br.qid, CAST(count(*) AS BIGINT) AS n_matched
              |  FROM br JOIN lr ON br.qid = lr.qid AND br.cid = lr.cid GROUP BY 1)
              |SELECT q.qid AS query_id, CAST(10 AS BIGINT) AS k,
              |  CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
              |  CAST(coalesce(m.n_matched, 0) * 1000 AS BIGINT) AS recall_bp
              |FROM q LEFT JOIN m ON m.qid = q.qid ORDER BY 1""".stripMargin)),

    Q("s9b_recall_matrix",
      // STANDING recall audit across EVERY deployed ANN tier (round
      // 10): one query emits recall@10 vs brute truth for each of the
      // eight oracle-replayable tiers — cosine tiers (lsh/ivf/pq/sq/
      // ivfpq/ivfsq) against s1's cosine brute, MIPS tiers
      // (mips_lsh and its 2-probe variant) against s8's
      // inner-product brute (recall against the WRONG modality's
      // truth would grade magnitude-blind tiers on a metric they
      // never optimize). Exact integer basis points: every tier
      // below is a deterministic expression tree, so a regression in
      // ANY tier flips a bp value and fails the hash gate — the
      // joint audit the per-tier specs can't provide. s3b's
      // Lloyd-refined variant is EXCLUDED by construction (float
      // accumulation order is engine-specific; its own containment
      // oracle is its standing audit).
      //
      // COST GOVERNANCE (round 13): the audit's query sample is the
      // EXPLICIT `s9bQuerySample` constant below (today: vec_id < 5,
      // the full historical set at driver SF — at 100 TB this is a
      // sample of the query log, never all of it), and both brute
      // truths are lineage-cut so the O(corpus × queries) brute scan
      // runs ONCE per modality instead of once per tier that grades
      // against it (8× for cosine, 2× for MIPS before round 13).
      // Adding a tier adds ONLY that tier's own scan + one semi-join —
      // audit growth is linear in tiers, not tiers × brute.
      (s, d) => {
        val s9bQuerySample = 5L // audit query-sample bound (vec_id < N)
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < s9bQuerySample)
        // r17 (guide §2.6, VERDICT r16 #5): the two brute-truth cuts
        // were a serial prefix ahead of the tier threads, but only the
        // final recallOf plan ASSEMBLY consumes them — tier training
        // doesn't. They now materialize on the same pool, overlapped
        // with every tier's eager construction; each tier awaits its
        // truth only after its own constructor has run (arguments
        // evaluate left-to-right inside the future).
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        val pool = java.util.concurrent.Executors.newFixedThreadPool(11)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        val truthCosF = Future(graft.Ckpt.cut(
          Similarity.knnBrute(e, q, "vec_id", "embedding", k = 10)
            .select("query_id", "neighbor_id")))
        val truthMipsF = Future(graft.Ckpt.cut(
          Similarity.knnMips(e, q, "vec_id", "embedding", k = 10)
            .select("query_id", "neighbor_id")))
        def truthCos: DataFrame = Await.result(truthCosF, 10.minutes)
        def truthMips: DataFrame = Await.result(truthMipsF, 10.minutes)
        def recallOf(tier: String, approx: DataFrame, truth: DataFrame): DataFrame = {
          val matched = truth
            .join(approx.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"), "left_semi")
            .groupBy("query_id").agg(count(lit(1)).as("n_matched"))
          q.select(col("vec_id").as("query_id"))
            .join(matched, Seq("query_id"), "left")
            .select(lit(tier).as("tier"), col("query_id"),
              lit(10L).as("k"),
              coalesce(col("n_matched"), lit(0L)).as("n_matched"),
              (coalesce(col("n_matched"), lit(0L)) * 1000L).as("recall_bp"))
        }
        // EXACT same configurations as the tier queries themselves —
        // the audit must grade what s2/s3/s5/s13/s10/s14/s8b/s8c ship.
        // CONSTRUCTION CONCURRENCY (r16, guide §2.6): building a tier
        // is not lazy — the quantizer/centroid/codebook training and
        // graph-build actions inside the Similarity constructors run
        // eagerly, and at round start they were the audit's serial
        // spine (measured: 8.0 s of construction vs 0.7 s of action).
        // The tiers are independent given the two cut truths, so each
        // constructor runs under its own driver thread; the frames,
        // the final union plan, and the single evaluating action are
        // byte-identical to the sequential build.
        // r17 (ADVICE r16): a dedicated pool SIZED TO THE TASK COUNT —
        // the global ExecutionContext is sized to host cores, so on a
        // low-core host the heaviest tier queued behind the others and
        // a hung constructor hung the query forever with no
        // diagnostic. Finite Await surfaces WHICH tier stalled.
        try Seq[Future[DataFrame]](
          Future(recallOf("lsh",
            Similarity.knnLsh(e, q, "vec_id", "embedding", k = 10), truthCos)),
          Future(recallOf("ivf",
            Similarity.knnIvf(e, q, "vec_id", "embedding", k = 10,
              lloydIters = 0), truthCos)),
          Future(recallOf("pq",
            Similarity.knnPq(e, q, "vec_id", "embedding", k = 10), truthCos)),
          Future(recallOf("sq",
            Similarity.knnSq(e, q, "vec_id", "embedding", k = 10), truthCos)),
          Future(recallOf("ivfpq",
            Similarity.knnIvfPq(e, q, "vec_id", "embedding", k = 10,
              lloydIters = 0), truthCos)),
          Future(recallOf("ivfsq",
            Similarity.knnIvfSq(e, q, "vec_id", "embedding", k = 10), truthCos)),
          Future(recallOf("mips_lsh",
            Similarity.knnMipsLsh(e, q, "vec_id", "embedding", k = 10), truthMips)),
          Future(recallOf("mips_mp2",
            Similarity.knnMipsLsh(e, q, "vec_id", "embedding", k = 10,
              multiProbe = 2), truthMips)),
          // round 12: the graph tiers — s21's beam walk must grade ≥
          // s11's single hop here by construction (superset
          // candidates); the expensive kNN graph is built ONCE and
          // shared by both audits (one thread: beam depends on it)
          Future {
            val lshGraph = graft.Ckpt.cut(
              Similarity.lshKnnGraph(e, "vec_id", "embedding", m = 5))
            recallOf("graph",
              Similarity.knnGraph(e, q, "vec_id", "embedding", k = 10, m = 5,
                prebuiltGraph = Some(lshGraph)), truthCos)
              .unionByName(recallOf("graph_beam",
                Similarity.knnGraphBeam(e, q, "vec_id", "embedding", k = 10,
                  m = 5, beam = 4, hops = 2,
                  prebuiltGraph = Some(lshGraph)), truthCos))
          }
        ).zip(Seq("lsh", "ivf", "pq", "sq", "ivfpq", "ivfsq", "mips_lsh",
            "mips_mp2", "graph+beam"))
          .map { case (fut, tier) =>
            try Await.result(fut, 10.minutes)
            catch { case _: java.util.concurrent.TimeoutException =>
              throw new RuntimeException(
                s"s9b tier '$tier' construction stalled past 10 minutes") }
          }
          .reduce(_.unionByName(_)).orderBy("tier", "query_id")
        finally pool.shutdown()
      },
      // each tier's FULL oracle rides as a nested-WITH subquery — the
      // independent replay of the exact arithmetic the tier queries
      // pin, composed once
      Some(s"""WITH qs AS (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5),
              |tc AS (SELECT query_id, neighbor_id FROM ($s1OracleSql)),
              |tm AS (SELECT query_id, neighbor_id FROM ($s8OracleSql)),
              |res AS (
              |  SELECT 'lsh' AS tier, query_id, neighbor_id FROM ($s2OracleSql)
              |  UNION ALL SELECT 'ivf', query_id, neighbor_id FROM ($s3OracleSql)
              |  UNION ALL SELECT 'pq', query_id, neighbor_id FROM ($s5OracleSql)
              |  UNION ALL SELECT 'sq', query_id, neighbor_id FROM ($s13OracleSql)
              |  UNION ALL SELECT 'ivfpq', query_id, neighbor_id FROM ($s10OracleSql)
              |  UNION ALL SELECT 'ivfsq', query_id, neighbor_id FROM ($s14OracleSql)
              |  UNION ALL SELECT 'graph', query_id, neighbor_id FROM ($s11OracleSql)
              |  UNION ALL SELECT 'graph_beam', query_id, neighbor_id FROM ($s21OracleSql)),
              |resm AS (
              |  SELECT 'mips_lsh' AS tier, query_id, neighbor_id FROM ($s8bOracleSql)
              |  UNION ALL SELECT 'mips_mp2', query_id, neighbor_id FROM ($s8cOracleSql)),
              |mc AS (SELECT tier, r.query_id, CAST(count(*) AS BIGINT) AS n
              |  FROM res r JOIN tc ON tc.query_id = r.query_id
              |    AND tc.neighbor_id = r.neighbor_id GROUP BY 1, 2),
              |mm AS (SELECT tier, r.query_id, CAST(count(*) AS BIGINT) AS n
              |  FROM resm r JOIN tm ON tm.query_id = r.query_id
              |    AND tm.neighbor_id = r.neighbor_id GROUP BY 1, 2),
              |am AS (SELECT * FROM mc UNION ALL SELECT * FROM mm),
              |grid AS (SELECT t.tier, qs.query_id FROM qs CROSS JOIN (VALUES
              |  ('lsh'), ('ivf'), ('pq'), ('sq'), ('ivfpq'), ('ivfsq'),
              |  ('mips_lsh'), ('mips_mp2'), ('graph'), ('graph_beam')) t(tier))
              |SELECT grid.tier, grid.query_id, CAST(10 AS BIGINT) AS k,
              |  CAST(coalesce(am.n, 0) AS BIGINT) AS n_matched,
              |  CAST(coalesce(am.n, 0) * 1000 AS BIGINT) AS recall_bp
              |FROM grid LEFT JOIN am ON am.tier = grid.tier
              |  AND am.query_id = grid.query_id
              |ORDER BY 1, 2""".stripMargin)),

    Q("c8_epoch_shuffle",
      // Reproducible epoch-wise corpus shuffling — the training-order
      // primitive: each epoch orders the corpus by a seeded md5 key,
      // so every run (and every engine) derives the SAME order, and
      // epochs are decorrelated. The global position rides
      // Quantiles.globalRank over (epoch, key) — one stats pass, no
      // single-task sort at any scale; per-epoch position is rank
      // arithmetic (each epoch holds exactly n rows).
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id")
        val n = docs.agg(count(lit(1)).as("__n"))
        val keyed = docs
          .select(explode(expr("sequence(CAST(0 AS BIGINT), 1)")).as("epoch"), col("doc_id"))
          .withColumn("ok",
            md5(concat(col("epoch").cast("string"), lit("_"), col("doc_id").cast("string"))))
        Quantiles.globalRank(keyed, Seq(col("epoch"), col("ok"), col("doc_id")), "rk")
          .crossJoin(broadcast(n))
          .select(col("epoch"),
            (col("rk") - col("epoch") * col("__n")).as("pos"),
            col("doc_id"))
          .orderBy("epoch", "pos")
      },
      Some("""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
             |k AS (SELECT e.epoch, doc_id,
             |    md5(CAST(epoch AS VARCHAR) || '_' || CAST(doc_id AS VARCHAR)) AS ok
             |  FROM documents,
             |       (SELECT CAST(unnest(generate_series(0, 1)) AS BIGINT) AS epoch) e),
             |r AS (SELECT epoch, doc_id,
             |    row_number() OVER (ORDER BY epoch, ok, doc_id) AS rk FROM k)
             |SELECT epoch, CAST(rk - epoch * n.n AS BIGINT) AS pos, doc_id
             |FROM r, n ORDER BY 1, 2""".stripMargin)),

    Q("c9_extract",
      // HTML/boilerplate extraction front end (round 9) — the corpus
      // pipeline's real ingestion step: documents wrapped into a
      // deterministic HTML page (nav + h1 + two content paragraphs +
      // link-spam div + footer), then Corpus.extractText classifies
      // each tag-stripped block on length / link density / stopword
      // density (the jusText-family text-density recipe) and
      // reassembles the GOOD blocks in document order. All features
      // are codegen'd string expressions; output is ints + strings,
      // so the oracle compare is exact with zero float-boundary risk.
      (s, d) => Corpus.extractText(
          Corpus.wrapHtml(Tables.documents(s, d), "doc_id", "text"),
          "doc_id", "html")
        .orderBy("doc_id"),
      Some("""WITH t0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
             |h0 AS (SELECT doc_id, t, len(t) AS n, greatest(len(t) // 2, 1) AS h FROM t0),
             |ht AS (SELECT doc_id,
             |  '<html><body><nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>'
             |  || '<h1>' || array_to_string(t[1:3], ' ') || '</h1>'
             |  || '<p>' || array_to_string(t[1:CAST(h AS INT)], ' ') || '</p>'
             |  || '<p>' || array_to_string(t[CAST(h + 1 AS INT):CAST(n AS INT)], ' ') || '</p>'
             |  || '<div>' || array_to_string(list_transform(t[4:9], w -> '<a href="#">' || w || '</a>'), ' ') || '</div>'
             |  || '<footer>copyright <a href="/terms">terms</a> <a href="/privacy">privacy</a></footer></body></html>' AS html
             |  FROM h0),
             |blocks AS (SELECT doc_id, u.i - 1 AS bpos, parts[CAST(u.i AS INT)] AS raw
             |  FROM (SELECT doc_id, regexp_split_to_array(html, '</(p|nav|footer|div|h1)>') AS parts FROM ht),
             |       unnest(generate_series(1, len(parts))) AS u(i)),
             |feat AS (SELECT doc_id, bpos,
             |    trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS txt,
             |    coalesce(list_sum(list_transform(regexp_extract_all(raw, '<a[^>]*>([^<]*)</a>', 1), x -> length(x))), 0) AS lc
             |  FROM blocks),
             |cls AS (SELECT doc_id, bpos, txt,
             |    (length(txt) >= 30
             |     AND CAST(lc AS DOUBLE) / greatest(length(txt), 1) <= 0.3
             |     AND CAST(len(list_filter(list_filter(string_split(txt, ' '), x -> x <> ''),
             |           x -> list_contains(['the','a','and','of','to','in','is','on','for','with'], x))) AS DOUBLE)
             |         / greatest(len(list_filter(string_split(txt, ' '), x -> x <> '')), 1) >= 0.05) AS good
             |  FROM feat)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
             |  CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
             |  coalesce(string_agg(CASE WHEN good THEN txt END, ' ' ORDER BY bpos), '') AS main_text,
             |  CAST(length(coalesce(string_agg(CASE WHEN good THEN txt END, ' ' ORDER BY bpos), '')) AS BIGINT) AS main_len
             |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("c7_length_buckets",
      // Sequence-length bucketing for batch packing: docs binned by
      // token count into power-of-two capacity buckets, with the
      // exact-integer padding waste and utilization (bp) a trainer
      // pays padding each doc to its bucket cap. Pure narrow
      // projection + one aggregate — the length histogram every
      // batching strategy is tuned against. The cap lookup is a
      // 21-element literal array scan, codegen'd, no join.
      (s, d) => Tables.documents(s, d)
        .select(expr(
          "CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)").as("n"))
        .withColumn("cap", expr(
          "array_min(filter(transform(sequence(0, 20), i -> shiftleft(CAST(1 AS BIGINT), i)), p -> p >= n))"))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"),
          sum("n").as("sum_tokens"),
          sum(expr("cap - n")).as("padding"),
          expr("sum(n) * 10000 div (count(1) * first(cap))").as("utilization_bp"))
        .orderBy("cap"),
      Some("""WITH tk AS (SELECT doc_id,
             |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n
             |  FROM documents),
             |b AS (SELECT doc_id, n,
             |    list_min(list_filter(list_transform(generate_series(0, 20),
             |      i -> (1::BIGINT << i)), p -> p >= n)) AS cap FROM tk)
             |SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n) AS BIGINT) AS sum_tokens,
             |  CAST(sum(cap - n) AS BIGINT) AS padding,
             |  CAST(sum(n) * 10000 // (count(*) * cap) AS BIGINT) AS utilization_bp
             |FROM b GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("t19_zipf_slope",
      // Zipf exponent of the corpus vocabulary: least-squares slope of
      // ln(freq) on ln(rank) over the top-1000 tokens (deterministic
      // count-desc/token tie-break; the window runs on the LIMITed
      // 1000-row table — bounded, like the IVF codebook). Healthy
      // natural-language corpora sit near −1; the slope is the
      // canonical corpus-composition diagnostic.
      (s, d) => {
        val top = Tables.documents(s, d)
          .select(explode(expr("filter(split(text, ' '), x -> x <> '')")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("tok")).limit(1000)
        val ranked = top.withColumn("r",
          row_number().over(Window.orderBy(desc("cnt"), asc("tok"))).cast("long"))
        ranked
          .select(expr("ln(CAST(r AS DOUBLE))").as("x"),
            expr("ln(CAST(cnt AS DOUBLE))").as("y"))
          .agg(count(lit(1)).as("n_tokens"),
            round(expr("(avg(x * y) - avg(x) * avg(y)) / (avg(x * x) - avg(x) * avg(x))"), 4)
              .as("zipf_slope"))
      },
      Some("""WITH tk AS (SELECT t.tok FROM documents,
             |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
             |top AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk
             |  GROUP BY 1 ORDER BY cnt DESC, tok LIMIT 1000),
             |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS r FROM top),
             |xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y FROM rk)
             |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
             |  round((avg(x * y) - avg(x) * avg(y)) / (avg(x * x) - avg(x) * avg(x)), 4)
             |    AS zipf_slope
             |FROM xy""".stripMargin)),

    Q("t20_bpe_train",
      // Learned-tokenizer TRAINING (t15 iterated to a merge table):
      // 8 BPE rounds over the distinct-word vocabulary, each round one
      // narrow pair-count aggregate + a 1-row driver collect (bounded
      // stats-collect, the Quantiles contract) + a chained `replace`
      // re-segmentation — the marker-wrapped encoding makes plain
      // leftmost `replace` equal the leftmost-greedy BPE fold on both
      // engines (see Bpe.scala). The oracle replays all 8 rounds
      // unrolled in SQL.
      (s, d) => {
        import s.implicits._
        val (merges, _) = graft.operators.Bpe.train(
          Tables.documents(s, d), "text", nMerges = 8)
        merges.toDF().select(col("rk"), col("a"), col("b"), col("cnt"))
          .orderBy("rk")
      },
      Some(s"""WITH $tokAllSql,
              |${graft.operators.Bpe.oracleTrainCtes(8)}
              |${graft.operators.Bpe.oracleMergesSelect(8)}""".stripMargin)),

    Q("t21_bpe_encode",
      // Tokenizing WITH the learned merges — the production path p1
      // lacks (p1 ranks whole words; this emits learned SUBWORD
      // pieces): train 8 merges, build the vocabulary-sized
      // (word → pieces) map, and join it back to the position-ordered
      // token stream. Per-doc output is the space-joined piece stream
      // + piece count — byte-exact across engines because training is
      // (see t20) and the map join/aggregation are order-pinned.
      (s, d) => {
        val docs = Tables.documents(s, d)
        val (_, trained) = graft.operators.Bpe.train(docs, "text", nMerges = 8)
        graft.operators.Bpe.encode(docs, "doc_id", "text", trained)
          .orderBy("doc_id")
      },
      Some(s"""WITH $tokAllSql,
              |${graft.operators.Bpe.oracleTrainCtes(8)},
              |map AS (SELECT word,
              |    replace(replace(replace(seg, chr(2) || chr(1), ' '), chr(1), ''), chr(2), '') AS pieces,
              |    CAST(len(string_split(trim(seg, chr(1) || chr(2)), chr(2) || chr(1))) AS BIGINT) AS np
              |  FROM s8),
              |ti AS (SELECT doc_id, i AS pos, sl[CAST(i AS INT)] AS word
              |  FROM (SELECT doc_id, sl, unnest(generate_series(1, len(sl))) AS i
              |        FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS sl
              |              FROM documents)))
              |SELECT doc_id, CAST(sum(np) AS BIGINT) AS n_pieces,
              |  string_agg(pieces, ' ' ORDER BY pos) AS pieces_str
              |FROM ti JOIN map USING (word) GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
