package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus pipelines: token statistics,
  * quality scoring, language ID, and winnowing fingerprints. All but
  * the langid profile scorer and the rolling hash stay inside Spark's
  * codegen'd built-ins; the two exceptions are tight JVM lambdas over
  * strings (no Row boxing).
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is")

  private def inList(items: Seq[String]): String =
    items.map(s => s"'$s'").mkString(", ")

  /** Per-document token statistics: whitespace tokens, regex word
    * tokens (BPE-ish `[a-z0-9]+` pieces), and mean word-token length.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("n_ws_tokens"),
      size(expr(s"regexp_extract_all($textCol, '[a-z0-9]+', 0)")).cast("long").as("n_word_tokens"),
      round(length(regexp_replace(col(textCol), "[^a-z0-9]", "")).cast("double") /
        size(expr(s"regexp_extract_all($textCol, '[a-z0-9]+', 0)")), 4).as("avg_word_len"))

  /** Heuristic quality score: stopword presence (fluency proxy),
    * moderate length, low punctuation/symbol density. All ratios are
    * emitted as integer basis points (x/10000) computed with integer
    * division only — float rounding at a 4-decimal boundary differs
    * between engines by 1 ulp, which flipped `round(x, 4)` on real
    * data; integer arithmetic is bit-identical everywhere.
    * quality_bp = 5000·min(ntok,50)/50 + 3000·min(5·nstop/ntok, 1)
    *            + 2000·(1 − min(10·npunct/len, 1)).
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("long")
    val len = length(col(textCol)).cast("long")
    val nPunct = len - length(regexp_replace(col(textCol), "[^a-z0-9 ]", "")).cast("long")
    df.select(col(idCol).as("doc_id"), nTok.as("n_tokens"),
        nStop.as("__ns"), len.as("__len"), nPunct.as("__np"))
      .select(col("doc_id"), col("n_tokens"),
        expr("__ns * 10000 div n_tokens").as("stop_bp"),
        expr("__np * 10000 div __len").as("punct_bp"),
        expr("""(least(n_tokens, 50) * 200 * 5
               | + (least(__ns * 5, n_tokens) * 10000 div n_tokens) * 3
               | + (10000 - (least(__np * 10, __len) * 10000 div __len)) * 2) div 10
               |""".stripMargin).as("quality_bp"))
  }

  /** SQL fragment reproducing [[qualityScore]] for the DuckDB oracle. */
  def qualityScoreSql: String = {
    val stop = inList(Stopwords)
    s"""WITH c AS (SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '' AND t IN ($stop))) AS BIGINT) AS ns,
       |  CAST(length(text) AS BIGINT) AS l,
       |  CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS np
       |  FROM documents)
       |SELECT doc_id, n_tokens,
       |  ns * 10000 // n_tokens AS stop_bp,
       |  np * 10000 // l AS punct_bp,
       |  (least(n_tokens, 50) * 200 * 5
       |   + (least(ns * 5, n_tokens) * 10000 // n_tokens) * 3
       |   + (10000 - (least(np * 10, l) * 10000 // l)) * 2) // 10 AS quality_bp
       |FROM c""".stripMargin
  }

  /** Character-trigram profiles for a few languages (tiny, embedded —
    * a real deployment would load trained profiles). Scores are
    * deterministic; accuracy on synthetic word-salad text is
    * heuristic by nature.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    // distinctive grams only — es/fr/de share too much of the generic
    // "de/la/en" mass for overlapping profiles to separate them
    "en" -> Seq("the ", " the", "ing ", " of ", " and", " to ", " is ", "ed "),
    "es" -> Seq(" de ", "ción", " los", " las", " una", " que ", "ado ", "ñ"),
    "de" -> Seq(" der", " die", " und", "sch", "ung ", "ein", "ich", "cht"),
    "fr" -> Seq(" le ", " les", " des", " est", "eau", "aux", " une", "oir"),
    "zh" -> Seq("的", "一", "是", "了", "我", "不", "在", "人", "有", "他"))

  private val langidF: String => String = { text =>
    val t = if (text == null) "" else text.toLowerCase
    val scores = profiles.map { case (lang, grams) =>
      var s = 0
      grams.foreach { g =>
        var idx = t.indexOf(g)
        while (idx >= 0) { s += 1; idx = t.indexOf(g, idx + 1) }
      }
      (lang, s)
    }
    // deterministic: max score, ties broken alphabetically
    scores.toSeq.sortBy { case (l, s) => (-s, l) }.head._1
  }

  /** Predict language per document from trigram-profile hits. */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val f = udf(langidF)
    df.select(col(idCol).as("doc_id"), f(col(textCol)).as("pred_lang"))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): Karp-
    * Rabin rolling hashes of k-grams, minimum per sliding window of
    * `w`, rightmost-min tiebreak, deduplicated. The standard
    * plagiarism / near-dup sketch.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    val f = udf { text: String =>
      if (text == null || text.length < k) Array.empty[Long]
      else {
        val n = text.length - k + 1
        val hs = new Array[Long](n)
        val B = 1000003L
        var pow = 1L
        var i = 0
        while (i < k - 1) { pow *= B; i += 1 }
        var h = 0L
        i = 0
        while (i < k) { h = h * B + text.charAt(i); i += 1 }
        hs(0) = h
        i = 1
        while (i < n) {
          h = (h - text.charAt(i - 1) * pow) * B + text.charAt(i + k - 1)
          hs(i) = h
          i += 1
        }
        val out = scala.collection.mutable.LinkedHashSet.empty[Long]
        var s = 0
        while (s + w <= n) {
          var mi = s
          var j = s + 1
          while (j < s + w) { if (hs(j) <= hs(mi)) mi = j; j += 1 }
          out += hs(mi)
          s += 1
        }
        out.toArray
      }
    }
    df.select(col(idCol).as("doc_id"), explode(f(col(textCol))).as("fp"))
  }
}
