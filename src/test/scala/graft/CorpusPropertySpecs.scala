package graft

import org.apache.spark.sql.functions._
import graft.operators.Corpus

/** Generative properties for the corpus-prep operators: one seeded
  * random corpus, every doc shape from empty to 50 tokens, each
  * property checked for every document in ONE Spark pass per
  * parameterization.
  */
class CorpusPropertySpecs extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(42)
  private val docs: Seq[(Long, String)] = (0 until 200).map { i =>
    val n = rng.nextInt(51) // 0..50 tokens
    (i.toLong, (0 until n).map(j => s"w${rng.nextInt(9)}_$j").mkString(" "))
  }
  private def toks(s: String): Array[String] = s.split(" ").filter(_.nonEmpty)

  test("chunk properties hold for every doc shape at several (width, stride)") {
    val df = docs.toDF("id", "txt")
    for ((w, st) <- Seq((4, 4), (6, 4), (8, 8), (5, 3))) {
      val got = Corpus.chunk(df, "id", "txt", w, st)
        .groupBy("doc_id").agg(
          sort_array(collect_list(struct(col("chunk_id"), col("chunk_text"), col("n_tokens"))))
            .as("cs"))
        .as[(Long, Seq[(Long, String, Long)])].collect().toMap
      for ((id, txt) <- docs) {
        val t = toks(txt)
        val cs = got(id)
        val expectedCount = if (t.isEmpty) 1 else (t.length - 1) / st + 1
        assert(cs.size == expectedCount, s"doc $id (w=$w,st=$st): ${cs.size}")
        cs.foreach { case (ci, text, n) =>
          val start = ci.toInt * st
          val expect = t.slice(start, start + w)
          assert(toks(text).sameElements(expect), s"doc $id chunk $ci (w=$w,st=$st)")
          assert(n == expect.length)
        }
        if (st == w) // tiling: concatenation reconstructs the doc exactly
          assert(cs.map(_._2).filter(_.nonEmpty).flatMap(toks).sameElements(t))
        // every token position is covered by at least one chunk
        if (t.nonEmpty && st <= w)
          assert(cs.map(_._3).sum >= t.length)
      }
    }
  }

  test("pack properties: bins tile each shard's concatenated token stream") {
    val sharded = docs.map { case (id, txt) => (id, txt, s"s${id % 3}") }
    val df = sharded.toDF("id", "txt", "src")
    for (budget <- Seq(1, 7, 512)) {
      val got = Corpus.pack(df, "id", "txt", "src", budget)
        .select("source", "doc_id", "n_tokens", "bin", "bin_offset")
        .as[(String, Long, Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      for ((src, rows) <- got) {
        var start = 0L
        rows.foreach { case (_, id, n, bin, off) =>
          assert(n == toks(sharded.find(_._1 == id).get._2).length, s"doc $id n_tokens")
          assert(bin == start / budget, s"doc $id bin @$budget")
          assert(off == start % budget, s"doc $id offset @$budget")
          start += n
        }
        // stream total is conserved
        assert(start == rows.map(_._3).sum)
      }
    }
  }
}
