package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

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
