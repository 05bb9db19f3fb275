package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family for large-corpus pipelines.
  *
  * Scale posture: every variant avoids the O(n²) cross join — exact
  * dedup is one hash shuffle on the content digest; MinHash/SimHash
  * generate candidates by banding and only verify within buckets; the
  * token-set Jaccard join uses PPJoin-style prefix filtering.
  *
  * All set-based variants additionally run a *signature-dedup* stage
  * first: documents with identical distinct-token sets collapse to one
  * representative (one hash shuffle), pair generation runs over the
  * distinct sets only, and member pairs are expanded afterward. With
  * real corpora (and especially near-duplicate-heavy ones — the whole
  * point of dedup) this removes the quadratic verify work for exact
  * clones while producing byte-identical output to the naive
  * formulation.
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

  /** Signature-dedup stage: collapse identical distinct-token sets.
    *  - members: (setId, id) — every doc mapped to its set
    *  - repTok:  (setId, tok) — the set's tokens (via min-id rep)
    *  - repSize: (setId, sz)
    */
  private def tokenSetGroups(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val tok = tokens(df, idCol, textCol)
    val byDoc = tok.groupBy("id")
      .agg(xxhash64(to_json(sort_array(collect_list(col("tok"))))).as("setId"),
        count(lit(1)).as("sz"))
      .localCheckpoint()
    val members = byDoc.select("setId", "id")
    val repIds = byDoc.groupBy("setId").agg(min("id").as("id"), min("sz").as("sz"))
    val repTok = tok.join(repIds.select("setId", "id"), Seq("id"))
      .select("setId", "tok").localCheckpoint()
    (members, repTok, repIds.select("setId", "sz"))
  }

  /** Doc pairs within one set (a<b), tagged with a constant payload. */
  private def withinSetPairs(members: DataFrame, payload: (String, org.apache.spark.sql.Column)): DataFrame =
    members.as("x").join(members.as("y"),
        col("x.setId") === col("y.setId") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"), payload._2.as(payload._1))

  /** Expand set-level pairs (sa, sb, payload) to doc-level (a<b). */
  private def expandCrossPairs(repPairs: DataFrame, members: DataFrame,
                               payloadCol: String): DataFrame =
    repPairs
      .join(members.select(col("setId").as("sa"), col("id").as("ia")), Seq("sa"))
      .join(members.select(col("setId").as("sb"), col("id").as("ib")), Seq("sb"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col(payloadCol))

  /** Dictionary-encode each distinct token set as a 64-bit mask when
    * the vocabulary fits (V <= 64): intersection becomes
    * `bit_count(a & b)` — one codegen'd instruction instead of a
    * token-level join. Returns None when the vocabulary is too large.
    * The small-vocab case is exactly the one where token joins
    * degenerate (every pair shares tokens), so the two paths cover
    * each other's worst case.
    */
  private def setMasks(repTok: DataFrame, repSize: DataFrame): Option[DataFrame] = {
    val vocab = repTok.select("tok").distinct()
    if (vocab.count() > 64) None
    else {
      val dict = vocab.withColumn("tokid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("tok")) - 1)
      Some(repTok.join(broadcast(dict), Seq("tok"))
        .groupBy("setId")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), tokid)")).as("mask"))
        .join(repSize, Seq("setId"))
        .localCheckpoint())
    }
  }

  /** True-Jaccard verification over candidate set pairs; returns
    * (sa, sb, jaccard) with the threshold applied (unrounded).
    * Uses the bitmask path when available, else the token join. */
  private def verifySetJaccard(cand: DataFrame, repTok: DataFrame,
                               repSize: DataFrame, threshold: Double): DataFrame =
    setMasks(repTok, repSize) match {
      case Some(masks) =>
        cand
          .join(masks.select(col("setId").as("sa"), col("mask").as("ma"),
            col("sz").as("sza")), Seq("sa"))
          .join(masks.select(col("setId").as("sb"), col("mask").as("mb"),
            col("sz").as("szb")), Seq("sb"))
          .withColumn("n", expr("CAST(bit_count(ma & mb) AS BIGINT)"))
          .withColumn("jaccard", col("n").cast("double") / (col("sza") + col("szb") - col("n")))
          .filter(col("jaccard") >= threshold)
      case None =>
        cand
          .join(repTok.select(col("setId").as("sa"), col("tok")), Seq("sa"))
          .join(repTok.select(col("setId").as("sb"), col("tok")), Seq("sb", "tok"))
          .groupBy("sa", "sb").agg(count(lit(1)).as("n"))
          .join(repSize.select(col("setId").as("sa"), col("sz").as("sza")), Seq("sa"))
          .join(repSize.select(col("setId").as("sb"), col("sz").as("szb")), Seq("sb"))
          .withColumn("jaccard", col("n").cast("double") / (col("sza") + col("szb") - col("n")))
          .filter(col("jaccard") >= threshold)
    }

  /** Near-duplicate pairs by token-set Jaccard >= `threshold`:
    * signature dedup, then PPJoin prefix filtering over the distinct
    * sets (tokens ordered rarest-first; only the first
    * `|A| - ceil(t*|A|) + 1` tokens generate candidates — exact, no
    * false negatives), then verification and member expansion.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val (members, repTok, repSize) = tokenSetGroups(df, idCol, textCol)

    val repPairs = setMasks(repTok, repSize) match {
      case Some(masks) =>
        // tiny vocabulary: prefix filtering can't prune (every pair
        // shares tokens), but popcount over dictionary bitmasks makes
        // the all-distinct-sets comparison one codegen'd instruction
        // per pair
        masks.as("a").join(masks.as("b"), col("a.setId") < col("b.setId"))
          .select(col("a.setId").as("sa"), col("b.setId").as("sb"),
            expr("CAST(bit_count(a.mask & b.mask) AS BIGINT)").as("n"),
            col("a.sz").as("sza"), col("b.sz").as("szb"))
          .withColumn("jaccard", col("n").cast("double") / (col("sza") + col("szb") - col("n")))
          .filter(col("jaccard") >= threshold)
      case None =>
        val freq = repTok.groupBy("tok").agg(count(lit(1)).as("freq"))
        val ranked = repTok.join(freq, "tok")
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("setId")
              .orderBy(asc("freq"), asc("tok"))))
        val prefix = ranked.join(repSize, "setId")
          .filter(col("rk") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
          .select("setId", "tok")
        val cand = prefix.as("a").join(prefix.as("b"),
            col("a.tok") === col("b.tok") && col("a.setId") < col("b.setId"))
          .select(col("a.setId").as("sa"), col("b.setId").as("sb")).distinct()
        verifySetJaccard(cand, repTok, repSize, threshold)
    }

    val cross = expandCrossPairs(repPairs, members, "jaccard")
    val within = withinSetPairs(members, "jaccard" -> lit(1.0))
    cross.union(within)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash + banded LSH near-duplicate pairs, verified by true
    * Jaccard >= `threshold`. `numHashes` hash slots in `bands` bands;
    * a pair is a candidate when any band signature collides.
    * Identical token sets share every band trivially, so they are
    * collapsed first and expanded at the end (same output, none of
    * the clone-vs-clone verify work).
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val (members, repTok, repSize) = tokenSetGroups(df, idCol, textCol)

    // minhash slot i = min over tokens of xxhash64(tok, i)
    val mh = repTok
      .select(col("setId"), explode(expr(
        s"transform(sequence(0, ${numHashes - 1}), i -> struct(i AS i, xxhash64(tok, i) AS h))")).as("s"))
      .select(col("setId"), col("s.i").as("i"), col("s.h").as("h"))
      .groupBy("setId", "i").agg(min("h").as("mh"))

    // band signature = hash of the band's minhashes in slot order
    val sig = mh.withColumn("band", expr(s"i div $rows"))
      .groupBy("setId", "band")
      .agg(xxhash64(to_json(sort_array(collect_list(struct(col("i"), col("mh")))))).as("sig"))
      .localCheckpoint()

    val cand = sig.as("a").join(sig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.setId") < col("b.setId"))
      .select(col("a.setId").as("sa"), col("b.setId").as("sb")).distinct()

    val cross = expandCrossPairs(
      verifySetJaccard(cand, repTok, repSize, threshold), members, "jaccard")
    val within = withinSetPairs(members, "jaccard" -> lit(1.0))
    cross.union(within)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash near-duplicate pairs: candidates share at least one
    * of 4 16-bit bands (exact for hamming distance <= 3), verified by
    * `bit_count(xor) <= maxHamming`. Signature dedup as above —
    * identical sets have identical simhash (hamming 0).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val (members, repTok, _) = tokenSetGroups(df, idCol, textCol)
    val bitSums = repTok
      .select(col("setId"), explode(expr(
        "transform(sequence(0, 63), b -> struct(b AS b, CASE WHEN (shiftright(xxhash64(tok), b) & 1) = 1 THEN 1 ELSE -1 END AS v))")).as("s"))
      .select(col("setId"), col("s.b").as("b"), col("s.v").as("v"))
      .groupBy("setId", "b").agg(sum("v").as("sv"))
    val sim = bitSums
      .groupBy("setId")
      .agg(expr("sum(CASE WHEN sv >= 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END)").as("simhash"))
      .localCheckpoint()

    val banded = sim.withColumn("band", explode(expr(
      "transform(sequence(0, 3), k -> struct(k AS k, (shiftright(simhash, k*16) & 65535) AS bh))")))
      .select(col("setId"), col("simhash"), col("band.k").as("k"), col("band.bh").as("bh"))

    // hamming filter BEFORE distinct: prune candidate volume ahead of
    // the dedup shuffle (a pair can collide in <= 4 bands)
    val repPairs = banded.as("a").join(banded.as("b"),
        col("a.k") === col("b.k") && col("a.bh") === col("b.bh") &&
          col("a.setId") < col("b.setId"))
      .select(col("a.setId").as("sa"), col("b.setId").as("sb"),
        expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()

    expandCrossPairs(repPairs, members, "hamming")
      .union(withinSetPairs(members, "hamming" -> lit(0L)))
  }

  /** Embedding-cosine near-duplicate pairs (cosine >= `threshold`).
    * Exact all-pairs formulation with codegen'd vector math for
    * oracle parity; the bucketed scale path is [[Similarity.knnLsh]].
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
}
