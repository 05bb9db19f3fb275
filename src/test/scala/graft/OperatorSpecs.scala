package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.VectorFunctions._
import graft.operators._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof picks latest right row at or before left time") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 8L, 900L), (1L, 15L, 901L), (1L, 20L, 902L))
      .toDF("k", "rt", "rid")
    val out = AsofJoin(left, right, "k", "t", "rt")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(900L)) // rt=8 <= t=10
    assert(out(101L).contains(902L)) // equal time matches
    assert(out(102L).isEmpty)        // no right rows for k=2
  }

  test("asof tie on right time resolves to greatest payload") {
    val left = Seq((1L, 10L, 1L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L)).toDF("k", "rt", "rid")
    val out = AsofJoin(left, right, "k", "t", "rt").select("rid").as[Long].collect()
    assert(out.toSeq == Seq(9L))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("banded range join equals naive inequality join incl. boundaries") {
    val left = Seq((1L, 0.0, 10.0), (2L, 9.5, 25.0), (3L, 100.0, 100.0))
      .toDF("lid", "lo", "hi")
    val right = Seq((10L, 0.0), (11L, 10.0), (12L, 9.5), (13L, 25.0001), (14L, 100.0))
      .toDF("rid", "p")
    val got = RangeJoin.joinPointInRange(left, right, "lo", "hi", "p", bucketWidth = 7.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    val want = Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L), (3L, 14L))
    assert(got == want)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "alpha beta gamma delta"),   // exact dup of 0
    (2L, "alpha beta gamma epsilon"), // 3/5 jaccard vs 0
    (3L, "zeta eta theta iota")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts copies") {
    val m = Dedup.exact(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(m(0L) == 2L && m(2L) == 1L && m(3L) == 1L)
    assert(!m.contains(1L))
  }

  test("jaccard pairs with prefix filtering finds exact and near dups") {
    val pairs = Dedup.ngramJaccardPairsExact(docs, "doc_id", "text", 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
    val loose = Dedup.ngramJaccardPairsExact(docs, "doc_id", "text", 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(loose == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("minhash LSH recovers identical documents") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 64, 16, 0.9)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("simhash identical docs have hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("embedding cosine pairs finds identical vectors") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force knn ranks the aligned vector first") {
    val out = Similarity.knnBrute(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2)
      .select("rk", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(out(1) == 1L)
  }

  test("vec_dot matches manual dot product and handles nulls") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b")
      .select(vec_dot($"a", $"b").as("d"))
    assert(df.as[Double].head() == 11.0)
    val n = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(vec_dot($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
  }

  test("lsh and ivf both recover an identical duplicate as top hit") {
    val corpus = vecs
    val queries = vecs.filter($"vec_id" === 2L)
    val lsh = Similarity.knnLsh(corpus, queries, "vec_id", "embedding",
      k = 1, planes = 4, tables = 4, dims = 4)
      .select("neighbor_id").as[Long].collect()
    assert(lsh.headOption.contains(3L))
    val ivf = Similarity.knnIvf(corpus, queries, "vec_id", "embedding",
      k = 1, nCells = 2, nProbe = 2, lloydIters = 1)
      .select("neighbor_id").as[Long].collect()
    assert(ivf.headOption.contains(3L))
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats count whitespace and word tokens") {
    val df = Seq((1L, "the quick  brown fox")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df, "doc_id", "text")
      .select("n_ws_tokens", "n_word_tokens").as[(Long, Long)].head()
    assert(r == ((4L, 4L)))
  }

  test("quality score is bounded and favors stopword-bearing text") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was good"),
      (2L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityScore(df, "doc_id", "text")
      .select("doc_id", "quality_bp").as[(Long, Long)].collect().toMap
    assert(m.values.forall(q => q >= 0L && q <= 10000L))
    assert(m(1L) > m(2L))
  }

  test("langid predicts a known language deterministically") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "la creación de los niños es una historia")).toDF("doc_id", "text")
    val m = TextAnalysis.langId(df, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(m(1L) == "en")
    assert(m(2L) == "es")
  }

  test("winnowing fingerprints overlap for shared substrings") {
    val df = Seq(
      (1L, "abcdefghijklmnop"),
      (2L, "abcdefghijklmnop"),
      (3L, "zzzzzzzzzzzzzzzz")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(fps(1L) == fps(2L))
    assert((fps(1L) intersect fps(3L)).isEmpty)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary decode stub is deterministic with stable schema") {
    val df = Seq((1L, "hello world".getBytes), (2L, Array.empty[Byte]))
      .toDF("id", "payload")
    val out = Multimodal.decode(df, "id", "payload", nFeat = 4).collect()
      .map(m => m.id -> m).toMap
    assert(out(1L).width == ("hello world".length % 64 + 1) * 16)
    assert(out(1L).features.length == 4)
    assert(out(2L).fmt == "empty")
    val again = Multimodal.decode(df, "id", "payload", nFeat = 4).collect()
      .map(m => m.id -> m.features.toSeq).toMap
    assert(again(1L) == out(1L).features.toSeq)
  }
}
