package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Ckpt

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), in three tiers:
  *
  *  - [[knnBrute]]: exact all-pairs cosine top-k — the correctness
  *    baseline and the oracle target.
  *  - [[knnLsh]]: random-hyperplane LSH — candidates limited to
  *    vectors sharing a hash-table bucket (degenerate buckets capped),
  *    exact rerank inside.
  *  - [[knnIvf]]: inverted-file (coarse-centroid) partitioning with
  *    Lloyd refinement — probe the nearest `nProbe` cells only.
  *
  * Vector math stays in the codegen'd [[org.apache.spark.sql.graftbridge.FloatVecDot]]
  * (sequential double accumulation) — no UDF boxing in the hot path,
  * and bit-identical to a plain-SQL engine evaluating the same
  * expression over `DOUBLE[]` casts. Hyperplane components derive from
  * `md5` hex digits, so the oracle engine reproduces every bucket bit.
  */
object Similarity {

  import org.apache.spark.sql.graftbridge.VectorFunctions.{vec_dot, vec_norm}

  private def withNorm(df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame =
    df.select(col(idCol).as(s"${prefix}id"), col(vecCol).as(s"${prefix}v"))
      .withColumn(s"${prefix}n", vec_norm(col(s"${prefix}v")))

  private val dot = (a: String, b: String) => vec_dot(col(a), col(b))

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest
    * rows of `corpus` (self-matches by id excluded). O(|Q|×|C|) — the
    * baseline; use the LSH/IVF variants when both sides are large.
    */
  def knnBrute(corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "c")
    val scored = q.join(c, col("qid") =!= col("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** MMR (maximal-marginal-relevance) diversified rerank — the RAG
    * result-diversity stage (Carbonell & Goldstein 1998): from each
    * query's `nCand` brute-cosine candidates, greedily keep `k` by
    *
    *   mmr = λ·rel − (1−λ)·max_sim(candidate, already-selected)
    *
    * ALL-INTEGER (λ in tenths; rel/sim as floor(cos·10⁴)) so the
    * greedy argmax — ties by candidate id — is bit-identical on any
    * engine and the unrolled-steps oracle replays it exactly. Work
    * shape: candidate generation is the dominant cost (any retrieval
    * tier can feed it); the rerank itself touches nCand² pair sims
    * and k tiny argmax passes per query — per-query bounded, never
    * corpus-bounded. The candidate and pair-sim frames are
    * checkpoint-cut so step j's plan doesn't re-expand steps 1..j−1.
    * Output: (query_id, rk, neighbor_id, mmr_e4). */
  def mmrRerank(corpus: DataFrame, queries: DataFrame,
                idCol: String, vecCol: String,
                nCand: Int, k: Int, lambdaTenths: Int = 7): DataFrame = {
    require(k >= 1 && nCand >= k, s"need nCand >= k >= 1: $nCand, $k")
    require(lambdaTenths >= 0 && lambdaTenths <= 10, s"lambda: $lambdaTenths")
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "c")
    val cand = Ckpt.cutLight(q.join(c, col("qid") =!= col("cid"))
      .withColumn("cos", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("crk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cos"), asc("cid"))))
      .filter(col("crk") <= nCand)
      .select(col("qid"), col("cid"),
        expr("CAST(floor(cos * 10000) AS BIGINT)").as("rel"),
        col("cv"), col("cn")))
    mmrGreedy(cand, k, lambdaTenths)
  }

  /** MMR rerank over CALLER-SUPPLIED candidates — the 100-TB shape:
    * any deployed ANN tier generates `(query_id, neighbor_id)`
    * candidate pairs (IVF/PQ/LSH — each already per-query bounded),
    * and this computes relevance and pair similarities ONLY for those
    * rows — |cands|² work per query, never a corpus touch. Vectors
    * come from `corpus`/`queries` by id (at scale: the stored vector
    * table, joined on the candidate ids — a semijoin-sized read).
    * Same integer greedy as [[mmrRerank]]; MmrSpec pins brute-fed
    * equivalence. */
  def mmrRerankFrom(candidates: DataFrame, corpus: DataFrame,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, lambdaTenths: Int = 7): DataFrame = {
    require(lambdaTenths >= 0 && lambdaTenths <= 10, s"lambda: $lambdaTenths")
    val q = withNorm(queries, idCol, vecCol, "q")
    val c = withNorm(corpus, idCol, vecCol, "c")
    val cand = Ckpt.cutLight(candidates
      .select(col("query_id").as("qid"), col("neighbor_id").as("cid"))
      .join(q, "qid").join(c, "cid")
      .withColumn("cos", dot("qv", "cv") / (col("qn") * col("cn")))
      .select(col("qid"), col("cid"),
        expr("CAST(floor(cos * 10000) AS BIGINT)").as("rel"),
        col("cv"), col("cn")))
    mmrGreedy(cand, k, lambdaTenths)
  }

  /** The shared integer greedy over a prepared candidate frame
    * `(qid, cid, rel, cv, cn)` — k argmax passes, each per-query
    * bounded; candidate and pair-sim frames are checkpoint-cut so
    * step j's plan doesn't re-expand steps 1..j−1. */
  private def mmrGreedy(cand: DataFrame, k: Int, lambdaTenths: Int): DataFrame = {
    val sims = Ckpt.cutLight(cand.as("x").join(cand.as("y"),
        col("x.qid") === col("y.qid") && col("x.cid") =!= col("y.cid"))
      .select(col("x.qid").as("qid"), col("x.cid").as("a"), col("y.cid").as("b"),
        (vec_dot(col("x.cv"), col("y.cv")) / (col("x.cn") * col("y.cn"))).as("pc"))
      .select(col("qid"), col("a"), col("b"),
        expr("CAST(floor(pc * 10000) AS BIGINT)").as("sim")))
    val lam = lambdaTenths; val mu = 10 - lambdaTenths
    var sel: DataFrame = null
    var j = 0
    while (j < k) {
      j += 1
      val avail =
        if (sel == null) cand.select("qid", "cid", "rel")
        else cand.select("qid", "cid", "rel")
          .join(sel.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
      val ms =
        if (sel == null) avail.withColumn("msim", lit(0L))
        else avail.join(
            sims.join(sel.select(col("qid"), col("cid").as("b")), Seq("qid", "b"))
              .groupBy("qid", "a").agg(max("sim").as("msim"))
              .select(col("qid"), col("a").as("cid"), col("msim")),
            Seq("qid", "cid"), "left")
          .withColumn("msim", coalesce(col("msim"), lit(0L)))
      val pick = Ckpt.cutLight(ms
        .withColumn("mmr", lit(lam.toLong) * col("rel") - lit(mu.toLong) * col("msim"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(desc("mmr"), asc("cid"))))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), lit(j).as("rk"), col("mmr")))
      sel = if (sel == null) pick else sel.unionByName(pick)
    }
    sel.select(col("qid").as("query_id"), col("rk").cast("int").as("rk"),
      col("cid").as("neighbor_id"), col("mmr").as("mmr_e4"))
  }

  /** Exact maximum-inner-product top-k (MIPS) — recommendation-shaped
    * retrieval where magnitude matters, so scores are raw dot products
    * with NO normalization (a long vector beats a well-aligned short
    * one). Same O(|Q|×|C|) baseline shape as [[knnBrute]]; the scale
    * tier is the standard norm-augmentation reduction (append
    * sqrt(M²−‖x‖²) to corpus vectors, 0 to queries; Bachrach et al.,
    * RecSys 2014) which turns MIPS into cosine and rides [[knnLsh]] /
    * [[knnIvf]] unchanged.
    */
  def knnMips(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"))
    q.join(c, col("qid") =!= col("cid"))
      .withColumn("ip", dot("qv", "cv"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("ip"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("ip"), 4).as("ip"))
  }

  /** MIPS at scale — the norm-augmentation reduction (Bachrach et al.,
    * RecSys 2014) AS CODE: corpus vectors get one extra component
    * sqrt(M²−‖x‖²) where M² = max corpus squared norm (every augmented
    * corpus vector then has norm ≈ M), queries get 0 — inner product
    * is preserved while norms become constant, so augmented-space
    * COSINE order per query ≈ inner-product order, and the whole
    * search rides [[knnLsh]] unchanged at dims+1. M² is an exact
    * order-independent max aggregate folded in as a 1-row broadcast
    * (never a driver collect), the augment component is computed in
    * double and stored as float — both replayable bit-for-bit by the
    * oracle. Output is augmented-space cosine; neighbor identity (the
    * retrieval result) is what the recall spec pins against
    * [[knnMips]] brute truth.
    *
    * Defaults differ from [[knnLsh]]'s (4 planes × 8 tables, not
    * 8 × 4): an item whose inner product is a fraction f of the best
    * possible has augmented-space cosine ≈ f, so per-bit collision
    * probability is 1 − arccos(f)/π — mid-IP neighbors sit at much
    * wider angles than near-duplicate cosine neighbors, and recall
    * needs shorter codes in more tables (the standard dial; more
    * tables = proportionally more shuffle, the documented trade).
    */
  def knnMipsLsh(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, planes: Int = 4, tables: Int = 8,
                 dims: Int = 64, maxBucket: Int = 4096,
                 multiProbe: Int = 0): DataFrame = {
    val c0 = corpus.select(col(idCol).as("__id"), col(vecCol).as("__v"))
    val m2 = c0.agg(max(vec_dot(col("__v"), col("__v"))).as("__m2"))
    val caug = c0.crossJoin(broadcast(m2))
      .withColumn("__va", concat(col("__v"), array(
        sqrt(greatest(col("__m2") - vec_dot(col("__v"), col("__v")), lit(0.0)))
          .cast("float"))))
      .select(col("__id").as(idCol), col("__va").as(vecCol))
    val qaug = queries
      .select(col(idCol), concat(col(vecCol), array(lit(0.0f))).as(vecCol))
    knnLsh(caug, qaug, idCol, vecCol, k, planes, tables, dims + 1, maxBucket,
      multiProbe)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR 2009 — the public
    * hybrid-retrieval standard): two per-query rankings (columns
    * `query_id`, `neighbor_id`, `rk`) merge by
    * Σ 10⁴ div (k₀ + rank), a candidate absent from one list simply
    * contributing nothing from it. ALL-INTEGER scoring — no float
    * anywhere, so the fusion is oracle-exact — and the inputs are
    * top-k lists, so the fuse is a join over k·queries rows, never
    * corpus-sized. Output: per-query top `k` by (rrf DESC, id ASC). */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, k0: Int = 60): DataFrame = {
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col("query_id"), col("neighbor_id"),
        expr(s"10000 div (${k0} + rk)").as(s"rrf_$tag"))
    side(a, "a").join(side(b, "b"), Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(col("rrf_a"), lit(0L)) + coalesce(col("rrf_b"), lit(0L)))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("rrf"), asc("neighbor_id"))))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank").as("rk"),
        col("neighbor_id"), col("rrf"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic hyperplane component in [-0.9375, +0.9375]: the
    * first hex digit of md5("t_p_i") mapped to (digit − 7.5)/8 — a
    * multiple of 1/16, exactly representable in both float and
    * double, and computable by any engine with `md5` (the oracle
    * rebuilds every plane from the same formula). 16 quantization
    * levels per component is ample for sign-random-projection LSH.
    */
  private[operators] def planeComponent(t: Int, p: Int, i: Int): Float = {
    val d = Integer.parseInt(md5hex(s"${t}_${p}_${i}").substring(0, 1), 16)
    ((d - 7.5) / 8.0).toFloat
  }

  /** LSH ANN: `tables` independent hash tables of `planes`
    * random-hyperplane bits each; candidates = bucket collisions in
    * any table (corpus side of each bucket capped at `maxBucket`
    * members — the degenerate-bucket guard); exact cosine rerank to
    * top-k within candidates. Hyperplanes are literal float arrays, so
    * every sign bit is one codegen'd [[FloatVecDot]] against a
    * constant — no interpreted higher-order functions in the
    * bucketing pass.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, planes: Int = 8, tables: Int = 4, dims: Int = 64,
             maxBucket: Int = 4096, multiProbe: Int = 0): DataFrame = {
    require(multiProbe >= 0 && multiProbe <= planes,
      s"multiProbe must be in [0, planes]: $multiProbe")
    def bucketCol(vcol: String, t: Int) =
      (0 until planes).map { p =>
        val plane = Array.tabulate(dims)(i => planeComponent(t, p, i))
        when(vec_dot(col(vcol), typedLit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    // bucket rows carry IDS ONLY through every exchange (cap window,
    // bucket join, candidate distinct); the vectors rejoin AFTER the
    // candidate pairs are deduped — guide §2.3/§8: shuffle keys, not
    // payloads. Before r16 each bucket row carried the full
    // float-vector + norm through the explode, the cap exchange, the
    // join, AND the distinct (tables× the corpus vector bytes on the
    // wire); now those stages move 8-byte ids and the vectors cross
    // once, in the final scoring join.
    def bucketed(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}id"), col(vecCol).as(s"${prefix}v"))
        .withColumn("__bk", array((0 until tables).map(t => bucketCol(s"${prefix}v", t)): _*))
        .select(col(s"${prefix}id"), posexplode(col("__bk")))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    // MULTI-PROBE (query side only): each query additionally probes
    // the buckets at Hamming distance 1 in its first `multiProbe` sign
    // bits — recall from the SAME index, no extra corpus storage or
    // shuffle (the standard alternative to adding tables; Lv et al.,
    // VLDB 2007). Deterministic (fixed flip set), so oracles replay it.
    val q0 = bucketed(queries, "q")
    val q =
      if (multiProbe == 0) q0
      else q0.select(col("qid"), col("table"),
        explode(array(col("bucket") +:
          (0 until multiProbe).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*))
          .as("bucket"))
    val c = Dedup.capBuckets(bucketed(corpus, "c"), Seq("table", "bucket"), "cid", maxBucket)
    val cand = q.join(c, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    cand
      .join(withNorm(queries, idCol, vecCol, "q"), Seq("qid"))
      .join(withNorm(corpus, idCol, vecCol, "c"), Seq("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Graph-refined ANN — the GRAPH-index tier (the NN-Descent /
    * HNSW-family principle, Dong et al. WWW 2011: a neighbor's
    * neighbor is likely a neighbor). Stage 1 builds an approximate
    * corpus kNN graph: each point's top-`m` cosine neighbors among
    * its LSH bucket-mates — the adjacency a deployed graph index
    * maintains. Stage 2 seeds each query with its own bucket
    * collisions ([[knnLsh]]'s candidate set) and expands ONE hop
    * through the graph. Stage 3 scores the expanded set exactly and
    * keeps top-k. Recovers every neighbor the plain bucket probe
    * misses that is graph-adjacent to a found one — the reachability
    * argument of an HNSW beam step, expressed as joins instead of
    * pointer chases (iterating stage 2 = more beam steps; one hop is
    * already a strict recall improvement over [[knnLsh]], spec-pinned).
    *
    * Scale shape: graph build is the capped bucket self-join +
    * per-point top-m window — O(vectors × tables) rows through the
    * exchange, cap-bounded within buckets, never O(n²); the graph is
    * O(vectors × m) and joins against per-query seed sets, so
    * expansion multiplies candidates by ≤ m+1. Deterministic
    * throughout (md5 planes, cosine ties to the smaller id), so the
    * oracle replays bucketing, graph, expansion, and rerank exactly.
    */
  /** LSH-bucketed row expansion shared by the graph tiers: one row
    * per (id, table, bucket) — ids only; vectors rejoin by id after
    * candidate dedup (guide §2.3: shuffle keys, not payloads; r16). */
  private def lshBucketed(df: DataFrame, idCol: String, vecCol: String,
                          prefix: String, planes: Int, tables: Int,
                          dims: Int): DataFrame = {
    def bucketCol(vcol: String, t: Int) =
      (0 until planes).map { p =>
        val plane = Array.tabulate(dims)(i => planeComponent(t, p, i))
        when(vec_dot(col(vcol), typedLit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    df.select(col(idCol).as(s"${prefix}id"), col(vecCol).as(s"${prefix}v"))
      .withColumn("__bk", array((0 until tables).map(t => bucketCol(s"${prefix}v", t)): _*))
      .select(col(s"${prefix}id"), posexplode(col("__bk")))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
  }

  /** The corpus kNN graph s11/s21 walk — directional top-m by cosine
    * among capped LSH bucket-mates, `(src, nb)`. Exposed so a caller
    * auditing several graph tiers at once (s9b) builds the expensive
    * index ONE time and hands it to both. */
  def lshKnnGraph(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int = 5, planes: Int = 8, tables: Int = 4,
                  dims: Int = 64, maxBucket: Int = 4096,
                  prebuiltBuckets: Option[DataFrame] = None): DataFrame = {
    // graph-tier callers (knnGraph/knnGraphBeam) bucket the corpus
    // for their query seeds anyway — passing that table in skips a
    // second full bucketing pass (tables × planes vec_dots per
    // corpus row) + cap window (r16)
    val b = prebuiltBuckets.getOrElse(
      Dedup.capBuckets(lshBucketed(corpus, idCol, vecCol, "c", planes, tables, dims),
        Seq("table", "bucket"), "cid", maxBucket))
    val cv = withNorm(corpus, idCol, vecCol, "c")
    // dedup the (src, nb) ID pairs first; vectors rejoin once for the
    // scoring — before r16 both sides' vectors rode the self-join AND
    // the distinct (2 × vector bytes per candidate pair on the wire)
    b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.cid") =!= col("y.cid"))
      .select(col("x.cid").as("src"), col("y.cid").as("nb"))
      .distinct()
      .join(cv.select(col("cid").as("src"), col("cv").as("sv"), col("cn").as("sn")), Seq("src"))
      .join(cv.select(col("cid").as("nb"), col("cv").as("nv"), col("cn").as("nn")), Seq("nb"))
      .withColumn("gcos", dot("sv", "nv") / (col("sn") * col("nn")))
      .select("src", "nb", "gcos")
      .withColumn("grk", row_number().over(
        Window.partitionBy("src").orderBy(desc("gcos"), asc("nb"))))
      .filter(col("grk") <= m)
      .select("src", "nb")
  }

  def knnGraph(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
               k: Int, m: Int = 5, planes: Int = 8, tables: Int = 4,
               dims: Int = 64, maxBucket: Int = 4096,
               prebuiltGraph: Option[DataFrame] = None): DataFrame = {
    // one materialized bucket table serves BOTH the query seeds and
    // the graph build (r16; previously each ran its own full pass).
    // With a prebuilt graph the buckets are consumed once (seeds), so
    // the cut would be pure overhead — keep the frame lazy then.
    val b0 = Dedup.capBuckets(lshBucketed(corpus, idCol, vecCol, "c", planes, tables, dims),
      Seq("table", "bucket"), "cid", maxBucket)
    val b = if (prebuiltGraph.isDefined) b0 else Ckpt.cut(b0)
    val graph = prebuiltGraph.getOrElse(
      lshKnnGraph(corpus, idCol, vecCol, m, planes, tables, dims, maxBucket,
        prebuiltBuckets = Some(b)))
    val q = lshBucketed(queries, idCol, vecCol, "q", planes, tables, dims)
    val seeds = q.join(b.select("table", "bucket", "cid"), Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val expanded = seeds
      .unionByName(seeds.join(graph, col("cid") === col("src"))
        .select(col("qid"), col("nb").as("cid")))
      .filter(col("qid") =!= col("cid"))
      .distinct()
    val qv = withNorm(queries, idCol, vecCol, "q")
    val cv = withNorm(corpus, idCol, vecCol, "c")
    expanded.join(qv, "qid").join(cv, "cid")
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Multi-hop beam-search graph ANN (round 12) — [[knnGraph]]'s one
    * neighbor-of-a-neighbor hop iterated the way an HNSW-style
    * deployment walks its graph: hop 1 expands EVERY bucket seed
    * (exactly knnGraph's candidate set, so s21's candidates are ⊇
    * s11's by construction and recall can only improve), then each
    * further hop expands only the per-query top-`beam` of everything
    * scored so far, de-duplicated against the visited set before
    * scoring. Per-query work after hop 1 is bounded by
    * `hops × beam × m` — the beam, not the corpus, prices the walk,
    * which is what makes a deep graph index affordable at 100 TB.
    * Deterministic end-to-end (md5-derived planes, ties broken by
    * id), so the unrolled rounds replay in the DuckDB oracle. */
  def knnGraphBeam(corpus: DataFrame, queries: DataFrame, idCol: String,
                   vecCol: String, k: Int, m: Int = 5, beam: Int = 4,
                   hops: Int = 2, planes: Int = 8, tables: Int = 4,
                   dims: Int = 64, maxBucket: Int = 4096,
                   prebuiltGraph: Option[DataFrame] = None): DataFrame = {
    require(hops >= 1 && beam >= 1, "need at least one hop and a beam")
    // one materialized bucket table serves both seeds and the graph
    // build (r16, as in [[knnGraph]]; lazy when the graph is prebuilt)
    val b0 = Dedup.capBuckets(lshBucketed(corpus, idCol, vecCol, "c", planes, tables, dims),
      Seq("table", "bucket"), "cid", maxBucket)
    val b = if (prebuiltGraph.isDefined) b0 else Ckpt.cut(b0)
    // the graph is consumed once per hop — cut it unless the caller
    // already materialized a shared one
    val graph = prebuiltGraph.getOrElse(Ckpt.cut(
      lshKnnGraph(corpus, idCol, vecCol, m, planes, tables, dims, maxBucket,
        prebuiltBuckets = Some(b))))
    val q = lshBucketed(queries, idCol, vecCol, "q", planes, tables, dims)
    val seeds = q.join(b.select("table", "bucket", "cid"), Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "cid").distinct()
    val qv = withNorm(queries, idCol, vecCol, "q")
    val cv = withNorm(corpus, idCol, vecCol, "c")
    def scored(cand: DataFrame): DataFrame =
      cand.join(qv, "qid").join(cv, "cid")
        .select(col("qid"), col("cid"),
          (dot("qv", "cv") / (col("qn") * col("cn"))).as("cosine"))
    // hop 1: the full seed expansion — knnGraph's candidate set
    var visited = Ckpt.cut(scored(seeds
      .unionByName(seeds.join(graph, col("cid") === col("src"))
        .select(col("qid"), col("nb").as("cid")))
      .filter(col("qid") =!= col("cid"))
      .distinct()))
    for (h <- 2 to hops) {
      val bm = visited.withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
        .filter(col("rk") <= beam).select("qid", "cid")
      val fresh = bm.join(graph, col("cid") === col("src"))
        .select(col("qid"), col("nb").as("cid"))
        .filter(col("qid") =!= col("cid"))
        .distinct()
        .join(visited.select("qid", "cid"), Seq("qid", "cid"), "left_anti")
      val next = visited.unionByName(scored(fresh))
      // lineage cut per INTERMEDIATE hop only: hop h+1 consumes the
      // union twice (beam + dedup), the final union exactly once
      visited = if (h < hops) Ckpt.cut(next) else next
    }
    visited
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Embedding near-duplicate PAIRS through the same hyperplane
    * bucketing as [[knnLsh]] — the scale path that replaces
    * `Dedup.embeddingCosinePairs`' all-pairs baseline: candidates are
    * bucket collisions in any table (capped), then exact cosine ≥
    * `threshold` rerank. Shuffle volume is O(vectors × tables)
    * fixed-width rows + capped within-bucket pairs — never O(n²).
    * Recall trade: a near-dup pair colliding in NO table is missed
    * (standard sign-random-projection guarantee; raise `tables` to
    * tighten).
    */
  def embeddingLshPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, planes: Int = 8, tables: Int = 4,
                        dims: Int = 64, maxBucket: Int = 4096): DataFrame = {
    // ids-only bucket rows; vectors rejoin after the pair dedup —
    // guide §2.3/§8 (r16), same restructure as [[knnLsh]]
    val b = Dedup.capBuckets(
      lshBucketed(df, idCol, vecCol, "c", planes, tables, dims),
      Seq("table", "bucket"), "cid", maxBucket)
    val cv = withNorm(df, idCol, vecCol, "c")
    b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.cid") < col("y.cid"))
      .select(col("x.cid").as("a"), col("y.cid").as("b"))
      .distinct()
      .join(cv.select(col("cid").as("a"), col("cv").as("va"), col("cn").as("na")), Seq("a"))
      .join(cv.select(col("cid").as("b"), col("cv").as("vb"), col("cn").as("nb")), Seq("b"))
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Deterministic PQ codebook component — same md5 family as
    * [[planeComponent]], namespaced `pq_m_c_i`: subspace `m`,
    * centroid `c`, dimension `i` → a multiple of 1/16 in
    * [-0.9375, +0.9375], exactly representable in float AND double,
    * rebuildable by any engine with `md5`. */
  private[operators] def pqComponent(m: Int, c: Int, i: Int): Float = {
    val d = Integer.parseInt(md5hex(s"pq_${m}_${c}_${i}").substring(0, 1), 16)
    ((d - 7.5) / 8.0).toFloat
  }

  /** Product-quantization ANN — the COMPRESSION tier: each `dims`-dim
    * vector is encoded as `m` 4-bit codes (one per `dims/m`-dim
    * subspace, nearest of `ksub` codebook centroids by L2), so a
    * 64-dim float vector stores in 8 bytes — the representation a
    * 100-TB vector store actually scans. Search reconstructs each
    * corpus vector from its codes (codebook lookup — the asymmetric
    * distance computation surface), ranks by query-to-reconstruction
    * cosine, and reranks the top `rerank·k` candidates with the
    * full-precision vectors.
    *
    * Everything is a per-row expression tree over md5-derived exact
    * codebook literals — argmin encode (ties to the smaller centroid
    * id), codebook lookup, fixed-order dot products — so the whole
    * pipeline (codes, reconstructions, candidate cut, rerank) is
    * bit-reproducible by the plain-SQL oracle; no cross-row float
    * aggregation anywhere. Scale shape: encode is narrow (one pass,
    * no shuffle); search shuffles only the top-R candidate rows per
    * query into the rerank.
    */
  /** PQ-encode `corpus` and reconstruct each vector from its codes:
    * (cid, crv, crn) — the asymmetric-distance surface both [[knnPq]]
    * and [[knnIvfPq]] score against. Encode is narrow (one pass, no
    * shuffle); every stage is a per-row expression tree over
    * md5-derived exact codebook literals, bit-reproducible in SQL. */
  private[operators] def pqReconstruct(corpus: DataFrame, idCol: String,
                                       vecCol: String, m: Int, ksub: Int,
                                       dims: Int): DataFrame = {
    require(dims % m == 0, "m must divide dims")
    val sub = dims / m
    // codebook as Scala constants: per (m, c) the centroid float array
    // and its exact self-dot (components are multiples of 1/16 —
    // sums of 8 squares are exact in double on any engine)
    val cbook = Array.tabulate(m, ksub)((mi, ci) =>
      Array.tabulate(sub)(i => pqComponent(mi, ci, i)))
    def cc(mi: Int, ci: Int): Double =
      cbook(mi)(ci).foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)

    // encode: argmin_c (−2·v_sub·ctr + ctr·ctr) per subspace — the
    // common v_sub·v_sub term cannot change the argmin and is dropped.
    // The argmin is `least` over the ksub (score, c) structs: the
    // same (d, c) total order the oracle's row_number replays (float
    // ties break toward the smaller centroid id), but codegen'd
    // struct comparison instead of an interpreted array_sort per
    // subspace per row. Plans are built as THREE flat selects rather
    // than the previous 137-withColumn fold — each withColumn is an
    // analyzer pass over a fresh Project, and the fold cost ~1.2 s of
    // driver planning per run (measured: s5 wall 2.7 s vs 1.5 s total
    // task time at sf0.1).
    val withSubs = corpus.select(
      col(idCol).as("cid") +: (0 until m).map(mi =>
        expr(s"slice(`$vecCol`, ${mi * sub + 1}, $sub)").as(s"__sub_$mi")): _*)
    val encoded = withSubs.select(
      col("cid") +: (0 until m).map { mi =>
        least((0 until ksub).map { ci =>
          struct((lit(-2.0) * vec_dot(col(s"__sub_$mi"), typedLit(cbook(mi)(ci)))
            + lit(cc(mi, ci))).as("d"), lit(ci).as("c"))
        }: _*).getField("c").as(s"__c_$mi")
      }: _*)

    // reconstruct from codes: per-subspace codebook-literal lookup +
    // array concat — all codegen'd (the previous
    // flatten ∘ transform ∘ nested-literal-index form ran the
    // interpreted higher-order path per row)
    encoded.select(col("cid"),
        concat((0 until m).map { mi =>
          element_at(typedLit(cbook(mi).map(_.toSeq).toSeq), col(s"__c_$mi") + 1)
        }: _*).as("crv"))
      .withColumn("crn", vec_norm(col("crv")))
  }

  /** Flat-scan candidate cut: per-query top-`r` of `scored` (columns
    * qid, cid, apx + anything) via the bounded-state [[graft.functions.TopKAgg]]
    * aggregate — ≤ r pairs per query per partition through the
    * exchange, never a per-query window sort of the whole corpus.
    * Rejoins `q` (qid, qv, qn — query-sized, broadcastable) so the
    * rerank stage sees the same shape the window form produced. */
  private[graft] def flatTopCut(scored: DataFrame, q: DataFrame, r: Int): DataFrame = {
    val topr = org.apache.spark.sql.functions.udaf(graft.functions.TopKAgg(r))
    scored.groupBy("qid")
      .agg(topr(col("apx"), col("cid")).as("__top"))
      .select(col("qid"), explode(col("__top")).as("__t"))
      .select(col("qid"), col("__t._2").as("cid"), col("__t._1").as("apx"))
      .join(broadcast(q), Seq("qid"))
      .select("qid", "qv", "qn", "cid", "apx")
  }

  def knnPq(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
            k: Int, m: Int = 8, ksub: Int = 16, dims: Int = 64,
            rerank: Int = 4): DataFrame = {
    val recon = pqReconstruct(corpus, idCol, vecCol, m, ksub, dims)
    val q = withNorm(queries, idCol, vecCol, "q")
    // bounded-state top-(rerank·k) cut — see [[flatTopCut]]; the
    // row_number-window form sorted the FULL corpus inside every qid
    // partition, the one remaining 100x scale-killer in the flat tiers
    val cand = flatTopCut(
      q.join(recon, col("qid") =!= col("cid"))
        .withColumn("apx", dot("qv", "crv") / (col("qn") * col("crn"))),
      q, rerank * k)
    cand.join(withNorm(corpus, idCol, vecCol, "c"), Seq("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }

  /** IVF ANN: coarse k-means cells (seeded from the first `nCells`
    * corpus rows by id, `lloydIters` refinement rounds), queries probe
    * their `nProbe` nearest cells, exact rerank within probed cells.
    *
    * With `lloydIters = 0` the whole operator is a deterministic
    * per-row float expression tree (seed centroids + argmin assignment
    * + rerank) and therefore exactly oracle-verifiable; Lloyd
    * refinement averages floats across rows, whose sum order is
    * engine-specific, so refined variants are spec-tested instead.
    */
  /** IVF coarse partitioning shared by [[knnIvf]] and [[knnIvfPq]]:
    * (corpusCells (cell, cid, cv, cn), queryCells (cell, qid, qv, qn))
    * — corpus rows in their nearest cell, queries replicated to their
    * `nProbe` nearest. */
  /** ||v-c||² = v·v − 2 v·c + c·c per (row, centroid), each term a
    * codegen'd vec_dot (centroids held as float arrays to stay on
    * the fast path); centroid table rides as a broadcast. */
  private def ivfAssignDist(df: DataFrame, vcol: String,
                            centroids: DataFrame): DataFrame = {
    val cb = broadcast(centroids.withColumn("ctrf", col("ctr").cast("array<float>")))
    df.crossJoin(cb)
      .withColumn("dist",
        vec_dot(col(vcol), col(vcol))
          - lit(2.0) * vec_dot(col(vcol), col("ctrf"))
          + vec_dot(col("ctrf"), col("ctrf")))
  }

  /** IVF centroid training over a normed corpus `(cid, cv, cn)`:
    * deterministic seeds (the nCells smallest ids; the global window
    * runs over nCells post-limit rows only, not the corpus), then
    * `lloydIters` Lloyd refinement rounds. This IS the standing
    * index's coarse quantizer — [[knnIvfIncremental]] freezes it and
    * assigns batches against it without retraining. */
  private def ivfCentroids(c: DataFrame, nCells: Int,
                           lloydIters: Int): DataFrame = {
    var centroids = Ckpt.cut(c.orderBy("cid").limit(nCells)
      .select(col("cid").as("cell"), col("cv").as("ctr"))
      .withColumn("cell", row_number().over(Window.orderBy("cell")) - 1))
    for (_ <- 1 to lloydIters) {
      val assigned = ivfAssignDist(c, "cv", centroids)
        .withColumn("rk", row_number().over(Window.partitionBy("cid").orderBy(asc("dist"), asc("cell"))))
        .filter(col("rk") === 1)
      centroids = Ckpt.cut(assigned
        .select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)").as("ctr")))
    }
    centroids
  }

  /** Nearest-standing-cell assignment of a normed frame: one row per
    * input row, `(cell, <prefix>id, <prefix>v, <prefix>n)`. */
  private def ivfNearestCell(df: DataFrame, prefix: String,
                             centroids: DataFrame): DataFrame =
    ivfAssignDist(df, s"${prefix}v", centroids)
      .withColumn("rk", row_number().over(
        Window.partitionBy(s"${prefix}id").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") === 1)
      .select(col("cell"), col(s"${prefix}id"), col(s"${prefix}v"), col(s"${prefix}n"))

  private def ivfCells(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, nCells: Int, nProbe: Int,
                       lloydIters: Int): (DataFrame, DataFrame) = {
    val c = withNorm(corpus, idCol, vecCol, "c").cache()
    val centroids = ivfCentroids(c, nCells, lloydIters)
    val corpusCells = ivfNearestCell(c, "c", centroids)
      .select("cell", "cid", "cv", "cn")
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = ivfAssignDist(q, "qv", centroids)
      .withColumn("rk", row_number().over(Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= nProbe).select("cell", "qid", "qv", "qn")
    (corpusCells, queryCells)
  }

  /** Nearest-STANDING-cell assignment of `batch` against the coarse
    * quantizer trained (and frozen) on `base` — the per-append step of
    * [[knnIvfIncremental]], exposed for the streaming append sink:
    * one row per batch vector, `(cell, cid, cv, cn)`. */
  private[graft] def assignToStandingCells(base: DataFrame, batch: DataFrame,
      idCol: String, vecCol: String, nCells: Int = 16,
      lloydIters: Int = 0): DataFrame = {
    val cb = withNorm(base, idCol, vecCol, "c")
    val centroids = ivfCentroids(cb, nCells, lloydIters)
    ivfNearestCell(withNorm(batch, idCol, vecCol, "c"), "c", centroids)
  }

  /** FILTERED ANN — kNN restricted to corpus rows satisfying `pred`
    * (the vector-store "filtered search" primitive: nearest English
    * docs, nearest where label = 3). The coarse quantizer is trained
    * on the FULL corpus — the filter is a per-query constraint and
    * must not move the standing index — but the probe join sees only
    * PRE-FILTERED candidates: the predicate lands on the corpus scan
    * (cell assignment is row-local, so filtering before assignment
    * yields exactly the filtered slice of the standing cell table, at
    * O(|σ(corpus)| · nCells) assignment work instead of O(corpus)).
    * This is pre-filtering, never "top-k then filter" — post-filtering
    * under-fills results whenever the predicate is selective, the
    * classic filtered-ANN failure. At 100 TB the stored cell table is
    * partitioned by cell and min/max-pruned on the filter column, so
    * the same predicate bounds index I/O scan-side; a query can
    * legitimately return fewer than k rows when the filtered corpus
    * within the probed cells runs dry (widen nProbe to trade cost for
    * fill). */
  def knnIvfFiltered(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, pred: Column, k: Int, nCells: Int = 16,
                     nProbe: Int = 2, lloydIters: Int = 0): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "c").cache()
    val centroids = ivfCentroids(c, nCells, lloydIters)
    val filteredCells = ivfNearestCell(
      withNorm(corpus.filter(pred), idCol, vecCol, "c"), "c", centroids)
      .select("cell", "cid", "cv", "cn")
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = ivfAssignDist(q, "qv", centroids)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= nProbe).select("cell", "qid", "qv", "qn")
    queryCells.join(filteredCells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nCells: Int = 16, nProbe: Int = 2, lloydIters: Int = 2): DataFrame = {
    val (corpusCells, queryCells) =
      ivfCells(corpus, queries, idCol, vecCol, nCells, nProbe, lloydIters)
    queryCells.join(corpusCells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** INCREMENTAL IVF maintenance — the production append path (a
    * 100-TB vector store is indexed once and appended to, never
    * rebuilt per batch): the standing index is the frozen coarse
    * quantizer ([[ivfCentroids]] trained on `base` only) plus base's
    * cell table (materialized once in a deployment); a batch appends
    * by assigning each new vector to its nearest STANDING cell —
    * O(batch × nCells) work, ZERO touches of base rows, no retrain —
    * and queries probe the merged cell table. The dedup family's
    * incremental gate (d7/d15/d20) applied to ANN.
    *
    * CONTRACT: with `lloydIters = 0` and `base` holding the nCells
    * smallest ids, a full rebuild over base ∪ batch seeds from
    * exactly the same rows, so **incremental == rebuild** — pinned
    * by the s12 oracle (which replays the rebuild in SQL) and by
    * IvfAppendSpec. With Lloyd refinement the frozen-quantizer
    * output intentionally differs from a retrain (that IS the
    * deployment trade: batches see the standing centroids until the
    * next scheduled retrain); the spec pins the structural invariant
    * instead — every appended vector lands in its nearest standing
    * cell and base assignments are untouched by the append.
    */
  def knnIvfIncremental(base: DataFrame, batch: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        nCells: Int = 16, nProbe: Int = 2,
                        lloydIters: Int = 0): DataFrame = {
    val cb = withNorm(base, idCol, vecCol, "c").cache()
    val centroids = ivfCentroids(cb, nCells, lloydIters)
    val standing = ivfNearestCell(cb, "c", centroids)
    val appended = ivfNearestCell(withNorm(batch, idCol, vecCol, "c"), "c", centroids)
    val corpusCells = standing.unionByName(appended)
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = ivfAssignDist(q, "qv", centroids)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= nProbe).select("cell", "qid", "qv", "qn")
    queryCells.join(corpusCells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"))
  }

  /** Scalar-quantization ANN (SQ8) — the OTHER compression tier next
    * to [[knnPq]], and the one production vector stores deploy most:
    * each dimension is affinely quantized to an 8-bit code against
    * per-dimension corpus [min, max] (64 bytes per 64-dim vector —
    * 4× smaller than float32, no codebook training at all). Search
    * scores queries against the MIDPOINT dequantization (asymmetric
    * distance), then reranks the top `rerank·k` candidates at full
    * precision.
    *
    * Determinism: the per-dim min/max are exact order-independent
    * aggregates; quantize/dequantize/score are fixed-order double
    * folds (zip_with + sequential aggregate — the evaluation order
    * DuckDB's list_dot_product uses), so the entire pipeline is
    * bit-reproducible by the plain-SQL oracle. Scale shape: one
    * narrow stats pass (1-row broadcast), encode is per-row, search
    * shuffles only the top-R candidates per query into the rerank.
    */
  /** SQ8-encode `corpus` and reconstruct each vector from its codes:
    * (cid, rv, rn) — the asymmetric-distance surface [[knnSq]] and
    * [[knnIvfSq]] score against. Per-dimension [lo, hi] is one
    * aggregate over (row, dim) pairs folded to a single broadcastable
    * row of two arrays; encode/dequant are per-row, no shuffle. */
  /** Per-dimension [lo, hi] of a training corpus as ONE broadcastable
    * row of two arrays — the SQ8 "codebook" (frozen with the standing
    * index in the incremental tier, exactly like the IVF centroids). */
  private[operators] def sqStats(corpus: DataFrame, idCol: String,
                                 vecCol: String): DataFrame =
    corpus.select(col(vecCol).cast("array<double>").as("cv"))
      .select(posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy("d").agg(min("x").as("lo"), max("x").as("hi"))
      .agg(expr("transform(array_sort(collect_list(struct(d, lo))), s -> s.lo)").as("los"),
        expr("transform(array_sort(collect_list(struct(d, hi))), s -> s.hi)").as("his"))

  /** SQ8-encode `corpus` against a SUPPLIED stats row and reconstruct:
    * (cid, rv, rn). Split from [[sqReconstruct]] so the incremental
    * tier can freeze the stats on the base corpus. */
  private[operators] def sqEncodeWith(stats: DataFrame, corpus: DataFrame,
                                      idCol: String, vecCol: String,
                                      dims: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    // reconstruction is FLOAT (the precision SQ8 actually restores):
    // scoring then rides the codegen'd FloatVecDot fast path instead
    // of an interpreted HOF fold (measured 4.8s → sub-2s on the s13
    // suite entry), and the oracle mirrors the float rounding with an
    // explicit REAL cast — the s5 reconstruction-parity convention.
    //
    // code + dequant are ONE fused transform (r16): as two chained
    // columns, CollapseProject inlined the whole 64-element `codes`
    // transform into EVERY element of the dequant lambda — 64×64
    // interpreted CASE evaluations per row instead of 64 (measured in
    // the s13 physical plan; the encode stage was ~64× overweight).
    // The per-element arithmetic is unchanged (same INT code, same
    // +0.5D double promotion), so reconstruction is bit-identical.
    c.crossJoin(broadcast(stats))
      .withColumn("rv", expr(
        s"CAST(transform(sequence(0, $dims - 1), d -> " +
          "los[d] + ((CASE WHEN his[d] = los[d] THEN 0 " +
          "ELSE least(255, greatest(0, CAST(floor((cv[d] - los[d]) / (his[d] - los[d]) * 256) AS INT))) END) " +
          "+ 0.5D) * (his[d] - los[d]) / 256.0D) AS ARRAY<FLOAT>)"))
      .withColumn("rn", vec_norm(col("rv")))
      .select("cid", "rv", "rn")
  }

  private[graft] def sqReconstruct(corpus: DataFrame, idCol: String,
                                       vecCol: String, dims: Int): DataFrame =
    sqEncodeWith(sqStats(corpus, idCol, vecCol), corpus, idCol, vecCol, dims)

  /** INCREMENTAL IVF-SQ — [[knnIvfIncremental]]'s append path with
    * [[knnSq]]'s codes: BOTH halves of the standing index are frozen
    * on the base corpus (the coarse quantizer AND the per-dimension
    * SQ stats — what a production store snapshots at index build);
    * a batch appends by nearest-standing-cell assignment plus
    * encoding against the frozen stats — O(batch) work, zero base
    * touches — and queries probe the merged cells, rank by code
    * reconstruction, rerank at full precision. With lloydIters=0
    * every stage is an expression tree over the BASE-derived
    * constants, so the oracle replays the INCREMENTAL semantics
    * directly (base-only stats CTEs — not a rebuild oracle: frozen
    * stats intentionally differ from a retrain when the batch
    * extends a dimension's range; that staleness is the documented
    * trade until the next scheduled retrain).
    */
  def knnIvfSqIncremental(base: DataFrame, batch: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, k: Int,
                          nCells: Int = 16, nProbe: Int = 2, dims: Int = 64,
                          rerank: Int = 4, lloydIters: Int = 0): DataFrame = {
    val cb = withNorm(base, idCol, vecCol, "c").cache()
    val centroids = ivfCentroids(cb, nCells, lloydIters)
    val cells = ivfNearestCell(cb, "c", centroids)
      .unionByName(ivfNearestCell(withNorm(batch, idCol, vecCol, "c"), "c", centroids))
      .select("cell", "cid")
    val stats = sqStats(base, idCol, vecCol)
    val recon = sqEncodeWith(stats, base.unionByName(batch), idCol, vecCol, dims)
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = ivfAssignDist(q, "qv", centroids)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= nProbe).select("cell", "qid", "qv", "qn")
    val cand = queryCells.join(cells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qv", "qn", "cid").distinct()
      .join(recon, Seq("cid"))
      .withColumn("apx", dot("qv", "rv") / (col("qn") * col("rn")))
      .withColumn("ark", row_number().over(
        Window.partitionBy("qid").orderBy(desc("apx"), asc("cid"))))
      .filter(col("ark") <= rerank * k)
      .select("qid", "qv", "qn", "cid", "apx")
    cand.join(withNorm(base.unionByName(batch), idCol, vecCol, "c")
        .withColumnRenamed("cid", "cid2")
        .withColumnRenamed("cv", "cv2").withColumnRenamed("cn", "cn2"),
        col("cid") === col("cid2"))
      .withColumn("cosine", dot("qv", "cv2") / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }

  def knnSq(corpus: DataFrame, queries: DataFrame, idCol: String,
            vecCol: String, k: Int, dims: Int = 64,
            rerank: Int = 4): DataFrame = {
    val enc = sqReconstruct(corpus, idCol, vecCol, dims)
    val q = withNorm(queries, idCol, vecCol, "q")
    // candidate cut = bounded-state top-(rerank·k) AGGREGATE, not a
    // row_number window: the window form makes every qid partition
    // hold ALL n corpus rows (one task sorts the whole corpus per
    // query at 100x); TopKAgg keeps ≤ rerank·k (apx, cid) pairs per
    // query per partition through the shuffle (ObjectHashAggregate
    // with map-side partials), same (apx DESC, cid ASC) total order
    val cand = flatTopCut(
      q.join(enc, col("qid") =!= col("cid"))
        .withColumn("apx", dot("qv", "rv") / (col("qn") * col("rn"))),
      q, rerank * k)
    cand.join(withNorm(corpus, idCol, vecCol, "c").withColumnRenamed("cid", "cid2")
        .withColumnRenamed("cv", "cv2").withColumnRenamed("cn", "cn2"),
        col("cid") === col("cid2"))
      .withColumn("cosine", dot("qv", "cv2") / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }

  /** IVF-SQ composed ANN ([[knnIvf]] cells bounding the candidate
    * set, [[knnSq]] 8-bit codes ranking inside probed cells, full-
    * precision rerank) — the cells-times-scalar-codes layout that
    * pairs with [[knnIvfPq]]'s cells-times-codebook one; SQ wins
    * when encode throughput and zero codebook training matter more
    * than the last 2× of compression. lloydIters=0 keeps every stage
    * a deterministic expression tree, so the oracle composes the s3
    * cell CTEs with the s13 code CTEs bit-for-bit.
    */
  def knnIvfSq(corpus: DataFrame, queries: DataFrame, idCol: String,
               vecCol: String, k: Int, nCells: Int = 16, nProbe: Int = 2,
               dims: Int = 64, rerank: Int = 4,
               lloydIters: Int = 0): DataFrame = {
    val (corpusCells, queryCells) =
      ivfCells(corpus, queries, idCol, vecCol, nCells, nProbe, lloydIters)
    val recon = sqReconstruct(corpus, idCol, vecCol, dims)
    val cand = queryCells.join(corpusCells.select("cell", "cid"), Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qv", "qn", "cid").distinct()
      .join(recon, Seq("cid"))
      .withColumn("apx", dot("qv", "rv") / (col("qn") * col("rn")))
      .withColumn("ark", row_number().over(
        Window.partitionBy("qid").orderBy(desc("apx"), asc("cid"))))
      .filter(col("ark") <= rerank * k)
      .select("qid", "qv", "qn", "cid", "apx")
    cand.join(withNorm(corpus, idCol, vecCol, "c").withColumnRenamed("cid", "cid2")
        .withColumnRenamed("cv", "cv2").withColumnRenamed("cn", "cn2"),
        col("cid") === col("cid2"))
      .withColumn("cosine", dot("qv", "cv2") / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }

  /** Standing-cell assignment for a batch against a frozen quantizer
    * trained on `base` — exposed for the append spec: returns
    * (cell, id) for every batch row. */
  def ivfAppendCells(base: DataFrame, batch: DataFrame, idCol: String,
                     vecCol: String, nCells: Int = 16,
                     lloydIters: Int = 0): DataFrame = {
    val cb = withNorm(base, idCol, vecCol, "c")
    val centroids = ivfCentroids(cb, nCells, lloydIters)
    ivfNearestCell(withNorm(batch, idCol, vecCol, "c"), "c", centroids)
      .select(col("cell"), col("cid").as("vec_id"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    * at web-scale through semantic deduplication"): embedding-level
    * semantic dedup INSIDE coarse clusters — the published recipe
    * k-means-partitions the corpus, then removes all but one of each
    * group of semantically near-identical points within a cluster,
    * never comparing across clusters. Here the cells are [[knnIvf]]'s
    * deterministic IVF assignment (lloydIters=0 keeps every stage an
    * expression tree the SQL oracle replays bit-for-bit), and the
    * survivor rule is min-id-greedy: a vector is a duplicate iff a
    * SMALLER-id vector in its cell has cosine ≥ `threshold` — one
    * pass, deterministic, no iterative clustering in the keep
    * decision. Returns one row per corpus vector: (vec_id, cell,
    * n_dup_smaller, kept).
    *
    * Scale shape: the pair join is cell-local (cells are the
    * data-partitioned unit, degenerate cells capped at `maxCell` via
    * the standard guard), output is O(n) rows — never a pair list;
    * the published pipeline's k-means refinement slots in by raising
    * `lloydIters` (spec-tested like s3b, not oracle-replayable).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nCells: Int = 16, lloydIters: Int = 0,
               maxCell: Int = 65536): DataFrame = {
    val (cells, _) = ivfCells(corpus, corpus.limit(1), idCol, vecCol,
      nCells, nProbe = 1, lloydIters = lloydIters)
    val b = Dedup.capBuckets(cells, Seq("cell"), "cid", maxCell)
    val dups = b.as("x").join(b.as("y"),
        col("x.cell") === col("y.cell") && col("y.cid") < col("x.cid"))
      .filter(dot("x.cv", "y.cv") / (col("x.cn") * col("y.cn")) >= threshold)
      .groupBy(col("x.cid").as("cid"))
      .agg(count(lit(1)).as("n_dup_smaller"))
    // cap observability: vectors the cap excluded from the pair join
    // would otherwise read kept=1 with no signal that completeness
    // was traded — `cell_capped` marks every vector in an over-full
    // cell so callers can detect (and re-run capless or re-cell) the
    // degenerate cells. Map-side-combined cell sizes, broadcast back.
    val cellSizes = cells.groupBy("cell").agg(count(lit(1)).as("__csz"))
    cells.select("cid", "cell")
      .join(broadcast(cellSizes), Seq("cell"))
      .join(dups, Seq("cid"), "left")
      .select(col("cid").as("vec_id"), col("cell").cast("long").as("cell"),
        coalesce(col("n_dup_smaller"), lit(0L)).as("n_dup_smaller"),
        when(col("n_dup_smaller").isNull, 1L).otherwise(0L).as("kept"),
        when(col("__csz") > maxCell, 1L).otherwise(0L).as("cell_capped"))
  }

  /** Incremental SemDeDup (round 12): dedup a `batch` of new vectors
    * against a STANDING corpus without re-pairing the standing rows —
    * the frozen-quantizer posture the other incrementals use
    * (s12/s15/s16 freeze their codebooks, d15 its band buckets, d20
    * its span digests). Batch vectors assign to the STANDING-seeded
    * cells, then pair only against smaller-id cellmates (standing ∪
    * earlier batch), so the work is O(|batch| × cell width) — at a
    * 100-TB corpus the day's increment never touches the corpus-sized
    * pair join again.
    *
    * Exactness contract (the d15/d20 gate): when batch ids exceed all
    * standing ids and the standing corpus has ≥ `nCells` rows, the
    * output is BIT-IDENTICAL to `semDedup(standing ∪ batch)` filtered
    * to the batch — `lloydIters = 0` makes the full run's seeds the
    * first `nCells` ids, which the batch cannot displace, standing
    * rows' smaller-id pair sets cannot contain batch rows, and the
    * cap keeps lowest ids first so the union-side cap below
    * reproduces the full run's. Output schema matches [[semDedup]]. */
  def semDedupIncremental(standing: DataFrame, batch: DataFrame,
                          idCol: String, vecCol: String, threshold: Double,
                          nCells: Int = 16, maxCell: Int = 65536): DataFrame = {
    // standing-seeded cells; the batch assigns through the SAME frozen
    // centroid expressions (nProbe = 1 — SemDeDup's home-cell contract)
    val (sCells, bCells0) = ivfCells(standing, batch, idCol, vecCol,
      nCells, nProbe = 1, lloydIters = 0)
    val bCells = bCells0.select(col("cell"), col("qid").as("cid"),
      col("qv").as("cv"), col("qn").as("cn"))
    val all = Dedup.capBuckets(sCells.unionByName(bCells),
      Seq("cell"), "cid", maxCell)
    val batchIds = bCells.select("cid")
    // pair join is batch-sided: x ranges over surviving batch rows only
    val x = all.join(batchIds, Seq("cid"), "left_semi")
    val dups = x.as("x").join(all.as("y"),
        col("x.cell") === col("y.cell") && col("y.cid") < col("x.cid"))
      .filter(dot("x.cv", "y.cv") / (col("x.cn") * col("y.cn")) >= threshold)
      .groupBy(col("x.cid").as("cid"))
      .agg(count(lit(1)).as("n_dup_smaller"))
    // cell sizes over the UNION (what the full run reports)
    val cellSizes = sCells.select("cell").unionByName(bCells.select("cell"))
      .groupBy("cell").agg(count(lit(1)).as("__csz"))
    bCells.select("cid", "cell")
      .join(broadcast(cellSizes), Seq("cell"))
      .join(dups, Seq("cid"), "left")
      .select(col("cid").as("vec_id"), col("cell").cast("long").as("cell"),
        coalesce(col("n_dup_smaller"), lit(0L)).as("n_dup_smaller"),
        when(col("n_dup_smaller").isNull, 1L).otherwise(0L).as("kept"),
        when(col("__csz") > maxCell, 1L).otherwise(0L).as("cell_capped"))
  }

  /** IVF-PQ — the standard public FAISS-style composition and the
    * layout a 100-TB vector store actually deploys: coarse IVF cells
    * bound the candidate set (queries probe `nProbe` cells), PQ codes
    * give the cheap in-cell ranking (8 bytes/vector scanned instead of
    * 256), and only the top `rerank·k` per query are re-scored at full
    * precision. Scale shape: the cell join shuffles (corpus rows +
    * nProbe·queries) fixed-width rows partitioned by cell; the PQ scan
    * inside a cell is a per-row expression; the full-precision join
    * touches rerank·k rows per query. With `lloydIters = 0` every
    * stage is a deterministic expression tree — the s10 oracle
    * composes the s3 cell CTEs with the s5 code CTEs bit-for-bit. */
  /** INCREMENTAL IVF-PQ — [[knnIvfSqIncremental]]'s append posture
    * composed with [[knnPq]]'s codes, closing the incremental
    * taxonomy (IVF-flat s12, IVF-SQ s15, IVF-PQ here): the coarse
    * quantizer is trained on the standing BASE and frozen, the batch
    * appends by nearest-standing-cell assignment + codebook encode —
    * O(batch) work, zero base touches. The PQ codebook is md5-derived
    * (data-independent), so the frozen-codebook posture is exact by
    * construction rather than a staleness trade (contrast s15's
    * frozen SQ stats); with lloydIters = 0 every stage is a
    * deterministic expression tree and the oracle composes the s15
    * cell CTEs with the s5 code CTEs bit-for-bit. */
  def knnIvfPqIncremental(base: DataFrame, batch: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, k: Int,
                          nCells: Int = 16, nProbe: Int = 2,
                          m: Int = 8, ksub: Int = 16, dims: Int = 64,
                          rerank: Int = 4, lloydIters: Int = 0): DataFrame = {
    val cb = withNorm(base, idCol, vecCol, "c").cache()
    val centroids = ivfCentroids(cb, nCells, lloydIters)
    val cells = ivfNearestCell(cb, "c", centroids)
      .unionByName(ivfNearestCell(withNorm(batch, idCol, vecCol, "c"), "c", centroids))
      .select("cell", "cid")
    val recon = pqReconstruct(base.unionByName(batch), idCol, vecCol, m, ksub, dims)
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = ivfAssignDist(q, "qv", centroids)
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") <= nProbe).select("cell", "qid", "qv", "qn")
    // bounded-state top-(rerank·k) cut — see [[knnIvfPq]]'s note; the
    // distinct() stays on the slim (qid, cid) pair set pre-cut
    val cand = flatTopCut(
      queryCells.join(cells, Seq("cell"))
        .filter(col("qid") =!= col("cid"))
        .select("qid", "cid").distinct()
        .join(recon, Seq("cid"))
        .join(broadcast(q.select("qid", "qv", "qn")), Seq("qid"))
        .withColumn("apx", dot("qv", "crv") / (col("qn") * col("crn")))
        .select("qid", "cid", "apx"),
      q, rerank * k)
    cand.join(withNorm(base.unionByName(batch), idCol, vecCol, "c")
        .withColumnRenamed("cid", "cid2")
        .withColumnRenamed("cv", "cv2").withColumnRenamed("cn", "cn2"),
        col("cid") === col("cid2"))
      .withColumn("cosine", dot("qv", "cv2") / (col("qn") * col("cn2")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }

  def knnIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nCells: Int = 16, nProbe: Int = 2, lloydIters: Int = 0,
               m: Int = 8, ksub: Int = 16, dims: Int = 64,
               rerank: Int = 4): DataFrame = {
    val (corpusCells, queryCells) =
      ivfCells(corpus, queries, idCol, vecCol, nCells, nProbe, lloydIters)
    val recon = pqReconstruct(corpus, idCol, vecCol, m, ksub, dims)
    val cSide = corpusCells.select("cell", "cid").join(recon, Seq("cid"))
    // bounded-state top-(rerank·k) cut — [[flatTopCut]], the same
    // TopKAgg rewrite s5/s13/s18 got in round 9: the row_number-window
    // form sorted O(queries × probed-cell width) rows through the
    // exchange, the last unbounded per-query sort in the ANN family
    val cand = flatTopCut(
      queryCells.join(cSide, Seq("cell"))
        .filter(col("qid") =!= col("cid"))
        .withColumn("apx", dot("qv", "crv") / (col("qn") * col("crn")))
        .select("qid", "cid", "apx"),
      withNorm(queries, idCol, vecCol, "q"), rerank * k)
    cand.join(withNorm(corpus, idCol, vecCol, "c"), Seq("cid"))
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("cosine"), asc("cid"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("query_id"), col("rk"), col("cid").as("neighbor_id"),
        round(col("cosine"), 4).as("cosine"), round(col("apx"), 4).as("apx_cosine"))
  }
}
