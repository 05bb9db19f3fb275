package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family for large-corpus pipelines.
  *
  * Scale posture: every variant avoids the O(n²) cross join — exact
  * dedup is one hash shuffle on the content digest; MinHash/SimHash
  * generate candidates by banding (shuffle is O(docs×bands) fixed-width
  * rows) and only verify within buckets; the n-gram Jaccard join uses
  * prefix filtering (PPJoin-style) so only documents sharing a rare
  * prefix token are compared.
  */
object Dedup {

  /** Exact duplicate groups: one row per distinct content with the
    * surviving (minimum) id and the duplicate count. Grouping key is
    * the raw content; at 100 TB swap in `xxhash64(content)` as the
    * shuffle key with a content equality check inside groups.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(col(contentCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Distinct (id, token) pairs from whitespace tokenization. */
  private[operators] def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()

  /** Near-duplicate pairs by token-set Jaccard >= `threshold`, using
    * prefix filtering: tokens are globally ordered rarest-first and
    * only the first `|A| - ceil(t*|A|) + 1` tokens of each document
    * generate join candidates — an exact optimization (no false
    * negatives) that keeps the token join off the high-frequency
    * tokens that would otherwise quadratically blow up.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val tok = tokens(df, idCol, textCol).cache()
    val size = tok.groupBy("id").agg(count(lit(1)).as("sz"))

    val freq = tok.groupBy("tok").agg(count(lit(1)).as("freq"))
    val ranked = tok.join(freq, "tok")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(asc("freq"), asc("tok"))))
    val prefix = ranked.join(size, "id")
      .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("id", "tok")

    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()

    val inter = cand
      .join(tok.select(col("id").as("i"), col("tok")), Seq("i"))
      .join(tok.select(col("id").as("j"), col("tok")), Seq("j", "tok"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))

    inter
      .join(size.select(col("id").as("i"), col("sz").as("szi")), Seq("i"))
      .join(size.select(col("id").as("j"), col("sz").as("szj")), Seq("j"))
      .withColumn("jaccard", col("n").cast("double") / (col("szi") + col("szj") - col("n")))
      .filter(col("jaccard") >= threshold)
      .select(col("i").as("a"), col("j").as("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + banded LSH near-duplicate pairs, verified by true
    * Jaccard >= `threshold`. `numHashes` hash slots in `bands` bands;
    * a pair is a candidate when any band signature collides.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val tok = tokens(df, idCol, textCol).cache()

    // minhash slot i = min over tokens of xxhash64(tok, i)
    val mh = tok
      .select(col("id"), explode(expr(
        s"transform(sequence(0, ${numHashes - 1}), i -> struct(i AS i, xxhash64(tok, i) AS h))")).as("s"))
      .select(col("id"), col("s.i").as("i"), col("s.h").as("h"))
      .groupBy("id", "i").agg(min("h").as("mh"))

    // band signature = hash of the band's minhashes in slot order
    val sig = mh.withColumn("band", expr(s"i div $rows"))
      .groupBy("id", "band")
      .agg(xxhash64(to_json(sort_array(collect_list(struct(col("i"), col("mh")))))).as("sig"))

    val cand = sig.as("a").join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()

    verifyJaccard(cand, tok, threshold)
  }

  /** 64-bit SimHash near-duplicate pairs: candidates share at least one
    * of 4 16-bit bands (exact for hamming distance <= 3), verified by
    * `bit_count(xor) <= maxHamming`.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val tok = tokens(df, idCol, textCol)
    val bitSums = tok
      .select(col("id"), explode(expr(
        "transform(sequence(0, 63), b -> struct(b AS b, CASE WHEN (shiftright(xxhash64(tok), b) & 1) = 1 THEN 1 ELSE -1 END AS v))")).as("s"))
      .select(col("id"), col("s.b").as("b"), col("s.v").as("v"))
      .groupBy("id", "b").agg(sum("v").as("sv"))
    val sim = bitSums
      .groupBy("id")
      .agg(expr("sum(CASE WHEN sv >= 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)").as("simhash"))

    val banded = sim.withColumn("band", explode(expr(
      "transform(sequence(0, 3), k -> struct(k AS k, (shiftright(simhash, k*16) & 65535) AS bh))")))
      .select(col("id"), col("simhash"), col("band.k").as("k"), col("band.bh").as("bh"))

    banded.as("a").join(banded.as("b"),
        col("a.k") === col("b.k") && col("a.bh") === col("b.bh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a"), col("b.id").as("b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs (cosine >= `threshold`).
    * Exact all-pairs formulation for oracle parity; the bucketed scale
    * path is [[Similarity.lshCandidates]].
    */
  def embeddingCosinePairs(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double): DataFrame = {
    import org.apache.spark.sql.graftbridge.VectorFunctions.{vec_cosine, vec_norm}
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", vec_norm(col("v")))
    val a = withNorm.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = withNorm.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cosine", vec_cosine(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("a"), col("b"), round(col("cosine"), 4).as("cosine"))
  }

  /** Shared verification: true Jaccard over candidate pairs. */
  private def verifyJaccard(cand: DataFrame, tok: DataFrame,
                            threshold: Double): DataFrame = {
    val size = tok.groupBy("id").agg(count(lit(1)).as("sz"))
    cand
      .join(tok.select(col("id").as("i"), col("tok")), Seq("i"))
      .join(tok.select(col("id").as("j"), col("tok")), Seq("j", "tok"))
      .groupBy("i", "j").agg(count(lit(1)).as("n"))
      .join(size.select(col("id").as("i"), col("sz").as("szi")), Seq("i"))
      .join(size.select(col("id").as("j"), col("sz").as("szj")), Seq("j"))
      .withColumn("jaccard", col("n").cast("double") / (col("szi") + col("szj") - col("n")))
      .filter(col("jaccard") >= threshold)
      .select(col("i").as("a"), col("j").as("b"), round(col("jaccard"), 4).as("jaccard"))
  }
}
