package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), in three tiers:
  *
  *  - [[knnBrute]]: exact all-pairs cosine top-k — the correctness
  *    baseline and the oracle target.
  *  - [[knnLsh]]: random-hyperplane LSH — candidates limited to
  *    vectors sharing a hash-table bucket, exact rerank inside.
  *  - [[knnIvf]]: inverted-file (coarse-centroid) partitioning with
  *    Lloyd refinement — probe the nearest `nProbe` cells only.
  *
  * Vector math stays in codegen'd `aggregate`/`zip_with` higher-order
  * functions (doubles) — no UDF boxing in the hot path. Hyperplanes
  * and centroid seeds are derived from `xxhash64`, so every run is
  * deterministic.
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

  /** Deterministic pseudo-random hyperplane component in [-1, 1):
    * splitmix64 of (table, plane, dim) — no RNG state, reproducible
    * across runs and partitions. */
  private def planeComponent(t: Int, p: Int, i: Int): Float = {
    var z = t.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L + i.toLong + 1L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z & 0xFFFFFL).toDouble / 0x80000L.toDouble - 1.0).toFloat
  }

  /** LSH ANN: `tables` independent hash tables of `planes`
    * random-hyperplane bits each; candidates = bucket collisions in
    * any table; exact cosine rerank to top-k within candidates.
    * Hyperplanes are literal float arrays, so every sign bit is one
    * codegen'd [[FloatVecDot]] against a constant — no interpreted
    * higher-order functions in the bucketing pass.
    */
  def knnLsh(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, planes: Int = 8, tables: Int = 4, dims: Int = 64): DataFrame = {
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
    val c = bucketed(corpus, "c")
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

  /** IVF ANN: coarse k-means cells (seeded from the first `nCells`
    * corpus rows by id, `lloydIters` refinement rounds), queries probe
    * their `nProbe` nearest cells, exact rerank within probed cells.
    */
  def knnIvf(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nCells: Int = 16, nProbe: Int = 2, lloydIters: Int = 2): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol, "c").cache()
    // deterministic seeds: the nCells smallest ids
    var centroids = c.orderBy("cid").limit(nCells)
      .select(col("cid").as("cell"), col("cv").as("ctr"))
      .withColumn("cell", row_number().over(Window.orderBy("cell")) - 1)
      .localCheckpoint()

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
      centroids = assigned
        .select(col("cell"), posexplode(col("cv")))
        .groupBy("cell", "pos").agg(avg(col("col").cast("double")).as("m"))
        .groupBy("cell")
        .agg(expr("transform(sort_array(collect_list(struct(pos, m))), s -> s.m)").as("ctr"))
        .localCheckpoint()
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
