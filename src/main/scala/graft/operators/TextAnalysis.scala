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

  /** Heuristic quality score in [0,1]: stopword presence (fluency
    * proxy), moderate length, low punctuation/symbol density.
    */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), " "), t => t =!= "")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t => t.isin(Stopwords.map(lit): _*))).cast("double")
    val nPunct = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "[^a-z0-9 ]", ""))).cast("double")
    df.select(col(idCol).as("doc_id"),
      nTok.cast("long").as("n_tokens"),
      round(nStop / nTok, 4).as("stop_ratio"),
      round(nPunct / length(col(textCol)), 4).as("punct_ratio"),
      round(least(nTok / 50.0, lit(1.0)) * 0.5
        + least(nStop / nTok * 5.0, lit(1.0)) * 0.3
        + (lit(1.0) - least(nPunct / length(col(textCol)) * 10.0, lit(1.0))) * 0.2,
        4).as("quality"))
  }

  /** SQL fragment reproducing [[qualityScore]] for the DuckDB oracle. */
  def qualityScoreSql: String = {
    val stop = inList(Stopwords)
    s"""SELECT doc_id,
       |CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
       |round(len(list_filter(string_split(text, ' '), t -> t <> '' AND t IN ($stop)))
       |  / CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE), 4) AS stop_ratio,
       |round((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
       |  / CAST(length(text) AS DOUBLE), 4) AS punct_ratio,
       |round(least(len(list_filter(string_split(text, ' '), t -> t <> '')) / 50.0, 1.0) * 0.5
       | + least(len(list_filter(string_split(text, ' '), t -> t <> '' AND t IN ($stop)))
       |     / CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS DOUBLE) * 5.0, 1.0) * 0.3
       | + (1.0 - least((length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')))
       |     / CAST(length(text) AS DOUBLE) * 10.0, 1.0)) * 0.2, 4) AS quality
       |FROM documents""".stripMargin
  }

  /** Character-trigram profiles for a few languages (tiny, embedded —
    * a real deployment would load trained profiles). Scores are
    * deterministic; accuracy on synthetic word-salad text is
    * heuristic by nature.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", " th", "he ", "ing", " of", "of ", "ed ", " to", "er "),
    "es" -> Seq(" de", "de ", "la ", " la", "os ", " el", "el ", "ión", "ci", "ent"),
    "de" -> Seq("en ", "er ", "ch ", " de", "der", "ie ", " di", "die", "sch", "ein"),
    "fr" -> Seq(" de", "de ", " le", "le ", "es ", "ent", " la", "la ", "ion", "que"),
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
