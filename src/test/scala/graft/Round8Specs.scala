package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Round-8: the digest-keyed span-dedup exchange (the 100-TB wire
  * format — 16-byte 128-bit gram keys instead of k=40-char gram
  * text) is pinned equal to the text-keyed ground truth on a
  * clone-heavy corpus, and the incremental tier's "history always
  * wins" contract is pinned under a deliberately interleaved id
  * space (the case where full-run equivalence does NOT apply).
  */
class DigestSpanSpec extends SparkSpec {
  import spark.implicits._

  private val k = 40

  test("digest-keyed path == text-keyed path on a clone-heavy corpus") {
    // clone-heavy: every doc duplicated once under a shifted id, plus
    // cross-doc shared boilerplate via the natural sf corpus overlap
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
    val n = base.agg(max("doc_id")).as[Long].head() + 1
    val corpus = base.unionByName(
      base.select((col("doc_id") + n).as("doc_id"), col("text")))
    val dig = Dedup.spanDedup(corpus, "doc_id", "text", k, keyByDigest = true)
    val txt = Dedup.spanDedup(corpus, "doc_id", "text", k, keyByDigest = false)
    assert(dig.exceptAll(txt).count() == 0L && txt.exceptAll(dig).count() == 0L)
  }

  test("incremental digest path == incremental text path") {
    val docs = Tables.documents(spark, sfDir)
    val mid = docs.agg(max("doc_id")).as[Long].head() / 2
    val h = docs.filter(col("doc_id") <= mid)
    val b = docs.filter(col("doc_id") > mid)
    val dig = Dedup.spanDedupIncremental(h, b, "doc_id", "text", k, keyByDigest = true)
    val txt = Dedup.spanDedupIncremental(h, b, "doc_id", "text", k, keyByDigest = false)
    assert(dig.exceptAll(txt).count() == 0L && txt.exceptAll(dig).count() == 0L)
  }

  test("history occurrences win regardless of doc_id order (interleaved ids)") {
    // the batch doc has a SMALLER id than the history doc carrying
    // the same text — full-run-over-union semantics would keep the
    // batch copy; the incremental contract keeps history's.
    val t = "0123456789" * 8 // 80 chars, > k
    val history = Seq(100L -> t).toDF("doc_id", "text")
    val batch = Seq(5L -> t).toDF("doc_id", "text")
    val out = Dedup.spanDedupIncremental(history, batch, "doc_id", "text", k)
      .select("doc_id", "clean_len").as[(Long, Long)].collect().toMap
    assert(out(5L) == 0L, "batch clone of a history doc must clean to empty even with a smaller id")
  }
}

/** Round-8 incremental ANN maintenance (the d7/d15/d20 incremental
  * gate applied to similarity): a vector batch appends to the
  * STANDING IVF index — frozen coarse quantizer, nearest-cell
  * assignment, zero base touches — instead of a rebuild.
  */
class IvfAppendSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sfDir)

  test("lloydIters=0: incremental search == full rebuild (seeds live in base)") {
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val q = emb.filter(col("vec_id") < 5)
    val inc = Similarity.knnIvfIncremental(base, batch, q, "vec_id", "embedding",
      k = 10, lloydIters = 0)
    val full = Similarity.knnIvf(emb, q, "vec_id", "embedding", k = 10, lloydIters = 0)
    assert(inc.exceptAll(full).count() == 0L && full.exceptAll(inc).count() == 0L)
  }

  test("frozen-quantizer append: batch cells match a nearest-standing-cell recompute") {
    // the Lloyd-refined deployment posture: centroids trained on base
    // only; the appended assignment must equal an independent
    // nearest-cell recompute of the SAME batch against the SAME
    // frozen quantizer (idempotence / determinism of the append),
    // and appending must leave base assignments untouched.
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    val a1 = Similarity.ivfAppendCells(base, batch, "vec_id", "embedding", lloydIters = 2)
    val a2 = Similarity.ivfAppendCells(base, batch, "vec_id", "embedding", lloydIters = 2)
    assert(a1.exceptAll(a2).count() == 0L && a2.exceptAll(a1).count() == 0L)
    assert(a1.count() == batch.count(), "every batch vector must land in exactly one cell")
    // base assignments are a pure function of (base, quantizer) —
    // computing them before and 'after' the append is the same call;
    // the invariant worth pinning is that the append path never
    // reassigns a base id:
    val baseCells = Similarity.ivfAppendCells(base, base, "vec_id", "embedding", lloydIters = 2)
    assert(baseCells.join(a1, "vec_id").count() == 0L,
      "append output must contain batch ids only — no base reassignment rides the append")
  }
}

/** Round-8 cap observability: the d4/m4 bucket-cap recall trade and
  * d19's cell cap must be VISIBLE in operator output — nonzero
  * n_capped_buckets / n_dropped_rows / cell_capped when a cap binds,
  * zero otherwise — so a deployment can detect traded completeness
  * from the result table instead of a source comment.
  */
class CapObservabilitySpec extends SparkSpec {
  import spark.implicits._

  test("phash pairs report bound caps; uncapped runs report zero") {
    // 6 clone payloads: identical hashes → every band bucket holds 6
    // DISTINCT ids (no signature collapse for media payloads), so
    // maxBucket=2 binds in all 4 bands and drops 4 rows from each.
    val base = ("A" * 40) + ("z" * 40) + ("A" * 40)
    val docs = (1L to 6L).map(_ -> base).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val capped = graft.operators.Multimodal
      .perceptualHashPairs(docs, "doc_id", "payload", maxBucket = 2)
      .select("n_capped_buckets", "n_dropped_rows").distinct()
      .as[(Long, Long)].collect()
    assert(capped.toSeq == Seq((4L, 16L)),
      s"4 bands x (6-2) dropped rows expected, got ${capped.toSeq}")
    val uncapped = graft.operators.Multimodal
      .perceptualHashPairs(docs, "doc_id", "payload", maxBucket = 4096)
      .select("n_capped_buckets", "n_dropped_rows").distinct()
      .as[(Long, Long)].collect()
    assert(uncapped.toSeq == Seq((0L, 0L)))
  }

  test("semDedup marks every vector of an over-full cell as cell_capped") {
    val e = Tables.embeddings(spark, sfDir)
    val out = graft.operators.Similarity
      .semDedup(e, "vec_id", "embedding", threshold = 0.4, maxCell = 3)
    // cells larger than 3 exist at sf0.001 (500 vecs over 16 cells)
    val marked = out.filter(col("cell_capped") === 1).count()
    assert(marked > 0L, "over-full cells must be marked")
    // the marking must be exactly cell-size > maxCell, per cell
    val bad = out.groupBy("cell")
      .agg(count(lit(1)).as("n"), sum("cell_capped").as("m"))
      .filter(!((col("n") > 3 && col("m") === col("n")) ||
                (col("n") <= 3 && col("m") === 0L)))
      .count()
    assert(bad == 0L)
    val capless = graft.operators.Similarity
      .semDedup(e, "vec_id", "embedding", threshold = 0.4)
    assert(capless.filter(col("cell_capped") === 1).count() == 0L)
  }
}
