package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lexical retrieval: integer-scaled BM25 over an inverted index with
  * the two bounds a per-query retrieval path MUST have at corpus
  * scale — a document-frequency cutoff (the stopword posture: a token
  * in nearly every document carries no signal, and its posting list
  * IS the corpus) and a per-token candidate cap over IMPACT-ORDERED
  * posting lists (each surviving token contributes at most `cap`
  * candidates, chosen by that token's own BM25 term score — the
  * classic impact-ordering/WAND posture). With both bounds, per-query
  * candidate work is ≤ |query tokens| · cap regardless of corpus
  * size; without them a single hot token degenerates retrieval to
  * O(corpus) per query.
  *
  * Scoring is ALL-INTEGER so the ranking is bit-identical on any
  * ANSI engine (no libm ln): Robertson idf is replaced by the
  * integer surrogate `(N·10⁴) div df` (order-isomorphic to 1/df,
  * the same trade [[graft.queries.PipelineQueries]] documents for
  * t9_tfidf), and the BM25 term (k₁ = 1.2, b = 0.75) is cleared of
  * fractions by multiplying numerator and denominator by 10·A
  * (A = corpus token count, N = doc count, dl = doc length):
  *
  *   term = (idf · tf · 22 · A) div (10·A·tf + 3·A + 9·dl·N)
  *
  * — exactly `idf · tf·(k₁+1) / (tf + k₁·(1−b+b·dl/avgdl))` scaled,
  * with decimal(38,0) intermediates so the products cannot wrap at
  * 100-TB counts.
  */
object Retrieval {

  /** (doc, tok, tf, dl) instance table from a text column: one row
    * per distinct (doc, token) with its in-doc frequency and the
    * doc's total token count. */
  private def tokTf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val inst = docs.select(col(idCol).as("__doc"),
        explode(expr(s"filter(split($textCol, ' '), x -> x != '')")).as("__tok"))
    val dl = inst.groupBy("__doc").agg(count(lit(1)).as("__dl"))
    inst.groupBy("__doc", "__tok").agg(count(lit(1)).as("__tf"))
      .join(dl, "__doc")
  }

  /** Frozen corpus statistics a BM25 index is scored against:
    * `(N, A)` one-row globals and the per-token df table. Freezing
    * them at index-build time is the lexical analogue of the ANN
    * tiers' frozen coarse quantizer: APPENDED documents score
    * against the standing statistics, so incremental == rebuild
    * holds EXACTLY (same stats in, same scores out) and the index
    * never needs a corpus-wide rescore per batch. The documented
    * trade (every production engine makes it): idf staleness grows
    * with append volume until a scheduled full rebuild refreshes
    * the stats — scores stay deterministic throughout. */
  final case class Bm25Stats(glob: DataFrame, dfTok: DataFrame)

  /** Derive the frozen statistics from a corpus snapshot. */
  def bm25StatsOf(docs: DataFrame, idCol: String, textCol: String): Bm25Stats = {
    val tf = tokTf(docs, idCol, textCol)
    Bm25Stats(
      tf.agg(countDistinct("__doc").as("__n"), sum("__tf").as("__a")),
      tf.groupBy("__tok").agg(count(lit(1)).as("__df")))
  }

  /** Capped, df-cut, impact-ordered postings for `docs` scored
    * against FROZEN `stats` (see [[Bm25Stats]]). Same bounds as
    * [[bm25Postings]]; a token absent from the frozen df table has
    * unknown rarity and is skipped (it cannot pass a df cutoff it
    * was never measured for — the conservative posture; the next
    * rebuild folds it in). */
  def bm25PostingsWith(stats: Bm25Stats, docs: DataFrame,
                       idCol: String, textCol: String,
                       maxDfPct: Int = 90, cap: Int = 64): DataFrame = {
    require(maxDfPct >= 1 && maxDfPct <= 100, s"maxDfPct in [1,100]: $maxDfPct")
    require(cap >= 1, s"cap must be positive: $cap")
    val tf = tokTf(docs, idCol, textCol)
    val scored = tf.join(stats.dfTok, "__tok").crossJoin(broadcast(stats.glob))
      .filter(col("__df") * 100 <= col("__n") * maxDfPct)
      .withColumn("__idf", expr("(cast(__n as decimal(38,0)) * 10000) div __df"))
      .withColumn("__score", expr(
        "(cast(__idf as decimal(38,0)) * __tf * 22 * __a) div " +
          "(10 * cast(__a as decimal(38,0)) * __tf + 3 * __a + 9 * __dl * __n)"))
    val topk = udaf(graft.functions.TopKAgg(cap))
    scored.groupBy("__tok")
      .agg(topk(col("__score").cast("double"), col("__doc")).as("__top"))
      .select(col("__tok").as("tok"), explode(col("__top")).as("p"))
      .select(col("tok"), col("p._2").as("doc"),
        col("p._1").cast("long").as("score_term"))
  }

  /** INCREMENTAL index append: the batch's postings scored against
    * the standing index's frozen stats. The union with the base
    * postings is the live index; per-token lists are capped per
    * SEGMENT (base and batch each ≤ cap — the segment/merge posture
    * of every log-structured text index; a compaction re-runs the
    * cap across segments). Work is O(batch), zero base touches. */
  def bm25AppendPostings(stats: Bm25Stats, batch: DataFrame,
                         idCol: String, textCol: String,
                         maxDfPct: Int = 90, cap: Int = 64): DataFrame =
    bm25PostingsWith(stats, batch, idCol, textCol, maxDfPct, cap)

  /** Impact-ordered, df-cut, capped posting lists:
    * `(tok, doc, score_term)` where every token passing the df cutoff
    * (`df·100 ≤ N·maxDfPct`) keeps its `cap` best documents by
    * integer BM25 term score (ties by doc id). The cap rides
    * [[graft.functions.TopKAgg]] — an ObjectHashAggregate with
    * map-side partials holding ≤ cap pairs per token per partition —
    * NOT a row_number window, which would sort a hot token's entire
    * posting list in one task. Term scores stay exact through the
    * Double buffer below 2⁵³ (idf ≤ 10⁴·N/df keeps real corpora far
    * under it). Exposed for spec-level bound checks. */
  def bm25Postings(docs: DataFrame, idCol: String, textCol: String,
                   maxDfPct: Int = 90, cap: Int = 64): DataFrame =
    // one scoring implementation: a full build IS the frozen-stats
    // build against its own snapshot's stats, so the incremental
    // path can never drift from the rebuild arithmetic
    bm25PostingsWith(bm25StatsOf(docs, idCol, textCol), docs,
      idCol, textCol, maxDfPct, cap)

  /** HYBRID retrieval FRONT DOOR — the deployment entry point a RAG
    * stack calls: the lexical arm is ALWAYS the bounded BM25 ranker
    * (df cutoff + impact-ordered per-token cap — per-query work
    * ≤ |query tokens|·cap regardless of corpus size), never the raw
    * shared-token ranking (which touches a hot token's entire posting
    * list; that form survives only as the s17 oracle baseline). The
    * vector arm is caller-supplied `(query_id, neighbor_id, rk)` so
    * any deployed ANN tier plugs in (brute for oracles, IVF/PQ tiers
    * at scale). Fusion is the all-integer RRF
    * ([[Similarity.rrfFuse]]). HybridFrontDoorSpec pins the routing
    * at the PLAN level: the lexical arm must carry the TopKAgg
    * map-side partial aggregate. */
  def hybridTopK(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, vecArm: DataFrame, k: Int,
                 lexK: Int = 10, maxDfPct: Int = 90, cap: Int = 64,
                 excludeSelf: Boolean = true): DataFrame = {
    val lex = bm25TopK(docs, idCol, textCol, queries, lexK,
        maxDfPct, cap, excludeSelf)
      .select("query_id", "neighbor_id", "rk")
    Similarity.rrfFuse(lex, vecArm, k)
  }

  /** Per-query BM25 top-k: queries' DISTINCT tokens probe the capped
    * posting lists, candidate scores sum per (query, doc), and each
    * query keeps `k` by (score DESC, doc ASC). The final window runs
    * over ≤ |query tokens|·cap candidate rows per query — bounded by
    * construction, never by luck. Output:
    * `(query_id, rk, neighbor_id, score)`. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               maxDfPct: Int = 90, cap: Int = 64,
               excludeSelf: Boolean = true): DataFrame = {
    val postings = bm25Postings(docs, idCol, textCol, maxDfPct, cap)
    val qtok = queries.select(col(idCol).as("qid"),
        explode(expr(s"filter(split($textCol, ' '), x -> x != '')")).as("tok"))
      .distinct()
    val cand0 = qtok.join(postings, "tok")
    val cand = if (excludeSelf) cand0.filter(col("qid") =!= col("doc")) else cand0
    cand.groupBy(col("qid"), col("doc"))
      .agg(sum("score_term").as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("score"), asc("doc"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk").cast("int").as("rk"),
        col("doc").as("neighbor_id"), col("score").cast("long").as("score"))
  }
}
