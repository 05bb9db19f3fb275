package graft.operators

import org.apache.spark.sql.DataFrame
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
             maxBucket: Int = 4096): DataFrame = {
    def bucketCol(vcol: String, t: Int) =
      (0 until planes).map { p =>
        val plane = Array.tabulate(dims)(i => planeComponent(t, p, i))
        when(vec_dot(col(vcol), typedLit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    def bucketed(df: DataFrame, prefix: String): DataFrame =
      withNorm(df, idCol, vecCol, prefix)
        .withColumn("__bk", array((0 until tables).map(t => bucketCol(s"${prefix}v", t)): _*))
        .select(col(s"${prefix}id"), col(s"${prefix}v"), col(s"${prefix}n"),
          posexplode(col("__bk")))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val q = bucketed(queries, "q")
    val c = Dedup.capBuckets(bucketed(corpus, "c"), Seq("table", "bucket"), "cid", maxBucket)
    val cand = q.join(c, Seq("table", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select("qid", "qv", "qn", "cid", "cv", "cn").distinct()
    cand
      .withColumn("cosine", dot("qv", "cv") / (col("qn") * col("cn")))
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
    def bucketCol(vcol: String, t: Int) =
      (0 until planes).map { p =>
        val plane = Array.tabulate(dims)(i => planeComponent(t, p, i))
        when(vec_dot(col(vcol), typedLit(plane)) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    val b = Dedup.capBuckets(
      withNorm(df, idCol, vecCol, "c")
        .withColumn("__bk", array((0 until tables).map(t => bucketCol("cv", t)): _*))
        .select(col("cid"), col("cv"), col("cn"), posexplode(col("__bk")))
        .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket"),
      Seq("table", "bucket"), "cid", maxBucket)
    b.as("x").join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.cid") < col("y.cid"))
      .select(col("x.cid").as("a"), col("x.cv").as("va"), col("x.cn").as("na"),
        col("y.cid").as("b"), col("y.cv").as("vb"), col("y.cn").as("nb"))
      .distinct()
      .withColumn("cosine", dot("va", "vb") / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
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
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nCells: Int = 16, nProbe: Int = 2, lloydIters: Int = 2): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "c").cache()
    // deterministic seeds: the nCells smallest ids. The global window
    // runs over nCells rows only (post-limit), not the corpus.
    var centroids = Ckpt.cut(c.orderBy("cid").limit(nCells)
      .select(col("cid").as("cell"), col("cv").as("ctr"))
      .withColumn("cell", row_number().over(Window.orderBy("cell")) - 1))

    // ||v-c||² = v·v − 2 v·c + c·c, each term a codegen'd vec_dot
    // (centroids held as float arrays to stay on the fast path).
    def assign(df: DataFrame, vcol: String): DataFrame = {
      val cb = broadcast(centroids.withColumn("ctrf", col("ctr").cast("array<float>")))
      df.crossJoin(cb)
        .withColumn("dist",
          vec_dot(col(vcol), col(vcol))
            - lit(2.0) * vec_dot(col(vcol), col("ctrf"))
            + vec_dot(col("ctrf"), col("ctrf")))
    }

    for (_ <- 1 to lloydIters) {
      val assigned = assign(c, "cv")
        .withColumn("rk", row_number().over(Window.partitionBy("cid").orderBy(asc("dist"), asc("cell"))))
        .filter(col("rk") === 1)
      centroids = Ckpt.cut(assigned
        .select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)").as("ctr")))
    }

    val corpusCells = assign(c, "cv")
      .withColumn("rk", row_number().over(Window.partitionBy("cid").orderBy(asc("dist"), asc("cell"))))
      .filter(col("rk") === 1).select("cell", "cid", "cv", "cn")
    val q = withNorm(queries, idCol, vecCol, "q")
    val queryCells = assign(q, "qv")
      .withColumn("rk", row_number().over(Window.partitionBy("qid").orderBy(asc("dist"), asc("cell"))))
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
}
