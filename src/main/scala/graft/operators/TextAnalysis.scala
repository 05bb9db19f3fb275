package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Gopher-style RULE-FLAG quality filter (Rae et al. 2021, table A1
    * — the published web-corpus rules, distinct from [[qualityScore]]'s
    * composite score): each rule is an independent 0/1 flag so a
    * pipeline can audit WHICH rule rejected a document, not just that
    * one did. Thresholds are the published ones; every underlying
    * measure is emitted as an exact integer (x100 / basis points,
    * integer division) so the flags and the evidence are bit-identical
    * across engines. keep = conjunction of all six.
    *
    *  - r_wordcount: 50 ≤ words ≤ 100000
    *  - r_wordlen:   3 ≤ mean word chars ≤ 10
    *  - r_symbol:    ('#' + '...') per word < 0.1
    *  - r_bullet:    lines starting with a bullet < 90%
    *  - r_ellipsis:  lines ending in '...' < 30%
    *  - r_alpha:     words containing an alphabetic char ≥ 80%
    *  - r_stop:      ≥ 2 distinct [[Stopwords]] present
    */
  def qualityRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = filter(split(t, " "), x => x =!= "")
    val nWords = size(toks).cast("long")
    val sumChars = length(regexp_replace(t, " ", "")).cast("long")
    val nAlpha = size(filter(toks, x => x.rlike("[a-z]"))).cast("long")
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val nEll = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val nEllLine = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val padded = concat(lit(" "), t, lit(" "))
    val nStop = Stopwords.map(w =>
      when(padded.contains(s" $w "), 1L).otherwise(0L)).reduce(_ + _)
    df.select(col(idCol).as("doc_id"), nWords.as("n_words"),
        sumChars.as("__sc"), nAlpha.as("__na"), (nHash + nEll).as("__nsym"),
        nLines.as("__nl"), nBullet.as("__nb"), nEllLine.as("__ne"),
        nStop.as("n_stopwords"))
      .select(col("doc_id"), col("n_words"),
        expr("__sc * 100 div n_words").as("word_len_x100"),
        expr("__nsym * 10000 div n_words").as("symbol_bp"),
        expr("__nb * 10000 div __nl").as("bullet_bp"),
        expr("__ne * 10000 div __nl").as("ellipsis_bp"),
        expr("__na * 10000 div n_words").as("alpha_bp"),
        col("n_stopwords"))
      .select(col("doc_id"), col("n_words"), col("word_len_x100"),
        col("symbol_bp"), col("bullet_bp"), col("ellipsis_bp"),
        col("alpha_bp"), col("n_stopwords"),
        expr("CAST(n_words BETWEEN 50 AND 100000 AS INT)").as("r_wordcount"),
        expr("CAST(word_len_x100 BETWEEN 300 AND 1000 AS INT)").as("r_wordlen"),
        expr("CAST(symbol_bp < 1000 AS INT)").as("r_symbol"),
        expr("CAST(bullet_bp < 9000 AS INT)").as("r_bullet"),
        expr("CAST(ellipsis_bp < 3000 AS INT)").as("r_ellipsis"),
        expr("CAST(alpha_bp >= 8000 AS INT)").as("r_alpha"),
        expr("CAST(n_stopwords >= 2 AS INT)").as("r_stop"))
      .withColumn("keep",
        expr("""CAST(r_wordcount + r_wordlen + r_symbol + r_bullet
               | + r_ellipsis + r_alpha + r_stop = 7 AS INT)""".stripMargin))
  }

  /** SQL mirror of [[qualityRules]] for the DuckDB oracle. */
  def qualityRulesSql: String = {
    val stopSum = Stopwords.map(w =>
      s"(CASE WHEN (' ' || text || ' ') LIKE '% $w %' THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    s"""WITH c AS (SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS n_words,
       |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS sc,
       |  CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS na,
       |  CAST(length(text) - length(replace(text, '#', ''))
       |    + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS nsym,
       |  CAST(len(string_split(text, chr(10))) AS BIGINT) AS nl,
       |  CAST(len(list_filter(string_split(text, chr(10)),
       |    l -> l LIKE '- %' OR l LIKE '* %')) AS BIGINT) AS nb,
       |  CAST(len(list_filter(string_split(text, chr(10)), l -> l LIKE '%...')) AS BIGINT) AS ne,
       |  CAST($stopSum AS BIGINT) AS n_stopwords
       |  FROM documents),
       |m AS (SELECT doc_id, n_words, sc * 100 // n_words AS word_len_x100,
       |  nsym * 10000 // n_words AS symbol_bp, nb * 10000 // nl AS bullet_bp,
       |  ne * 10000 // nl AS ellipsis_bp, na * 10000 // n_words AS alpha_bp,
       |  n_stopwords FROM c)
       |SELECT doc_id, n_words, word_len_x100, symbol_bp, bullet_bp,
       |  ellipsis_bp, alpha_bp, n_stopwords,
       |  CAST(n_words BETWEEN 50 AND 100000 AS INT) AS r_wordcount,
       |  CAST(word_len_x100 BETWEEN 300 AND 1000 AS INT) AS r_wordlen,
       |  CAST(symbol_bp < 1000 AS INT) AS r_symbol,
       |  CAST(bullet_bp < 9000 AS INT) AS r_bullet,
       |  CAST(ellipsis_bp < 3000 AS INT) AS r_ellipsis,
       |  CAST(alpha_bp >= 8000 AS INT) AS r_alpha,
       |  CAST(n_stopwords >= 2 AS INT) AS r_stop,
       |  CAST(CAST(n_words BETWEEN 50 AND 100000 AS INT)
       |    + CAST(word_len_x100 BETWEEN 300 AND 1000 AS INT)
       |    + CAST(symbol_bp < 1000 AS INT) + CAST(bullet_bp < 9000 AS INT)
       |    + CAST(ellipsis_bp < 3000 AS INT) + CAST(alpha_bp >= 8000 AS INT)
       |    + CAST(n_stopwords >= 2 AS INT) = 7 AS INT) AS keep
       |FROM m""".stripMargin
  }

  /** Character-gram profiles for a few languages (tiny, embedded —
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

  private val langsSorted: Seq[String] = profiles.keys.toSeq.sorted

  /** Per-language score as a SQL fragment over a lowercased text
    * column `tcol`: non-overlapping occurrence counts of every profile
    * gram, summed. `replace`-based counting with integer division is
    * engine-portable and exact — the same expression runs in Spark and
    * in the DuckDB oracle.
    */
  private def scoreSql(lang: String, tcol: String, intDiv: String): String =
    profiles(lang).map { g =>
      val esc = g.replace("'", "''")
      s"((length($tcol) - length(replace($tcol, '$esc', ''))) $intDiv ${g.length})"
    }.mkString("(", " + ", ")")

  /** Predict language per document: max profile score, ties broken
    * alphabetically (CASE evaluated in alphabetical language order).
    * Pure codegen'd built-ins — no UDF — and expressible verbatim in
    * the oracle SQL via [[langIdSql]].
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = df
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("__t"))
      .select(Seq(col("doc_id")) ++
        langsSorted.map(l => expr(scoreSql(l, "__t", "div")).as(s"s_$l")): _*)
      .withColumn("__m", greatest(langsSorted.map(l => col(s"s_$l")): _*))
    val pred = langsSorted.foldRight(lit(null).cast("string")) { (l, rest) =>
      when(col(s"s_$l") === col("__m"), lit(l)).otherwise(rest)
    }
    scored.select(col("doc_id"), pred.as("pred_lang"))
  }

  /** DuckDB oracle reproducing [[langId]] (`//` integer division). */
  def langIdSql: String = {
    val scores = langsSorted.map(l => s"${scoreSql(l, "tt", "//")} AS s_$l").mkString(",\n  ")
    val caseArms = langsSorted.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
    val m = langsSorted.map(l => s"s_$l").mkString("greatest(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, lower(text) AS tt FROM documents),
       |s AS (SELECT doc_id,
       |  $scores
       |  FROM t),
       |sm AS (SELECT *, $m AS m FROM s)
       |SELECT doc_id, CASE $caseArms END AS pred_lang FROM sm""".stripMargin
  }

  /** Character-level Shannon entropy per document, in bits rounded to
    * 4 dp — the classic gibberish/boilerplate signal (near-zero =
    * repeated characters, ≈4.2 = typical English, ≈6+ = random-ish).
    * Computed per row with codegen HOFs only — distinct chars ×
    * per-char count via filter — so the plan is narrow (no
    * char-explode shuffle at any scale; work per row is
    * O(alphabet · n_chars), alphabet-bounded). Identity
    * `H = log2(n) − (Σ c·log2 c)/n` keeps every term a count, so the
    * only float steps are the final log2s — the sum order differs
    * from the oracle's GROUP BY but only at ~1e-15, absorbed by the
    * 4-dp round (the repo's standard double contract). */
  /** RAKE keyword extraction (Rose et al. 2010, the public rapid
    * automatic keyword extraction recipe): candidate phrases are the
    * maximal stopword-free token runs; a word scores
    * degree/frequency (degree = Σ length of the phrases it appears
    * in, frequency = its occurrence count — co-occurring in long
    * phrases beats raw frequency); a phrase scores the sum of its
    * words' scores; each document reports its top phrase. Scores in
    * exact integer basis points (deg·10⁴ div freq, summed) — no
    * float anywhere, so the oracle replays every division exactly.
    *
    * Scale shape: phrase segmentation is a per-doc prefix count
    * (window over ONE document's tokens, bounded by doc length —
    * never cross-doc); word stats are corpus-wide
    * map-side-combined aggregates joined back by word; the top
    * phrase per doc is groupBy-max + join-back (the d18 hot-key
    * shape), not a window over all phrases. */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = Seq("the", "a", "and", "of",
                     "to", "in", "is", "on", "for", "with")): DataFrame = {
    val stop = inList(stopwords)
    val toks = df.select(col(idCol).as("doc_id"),
        posexplode(expr(s"filter(split($textCol, ' '), x -> x != '')")))
      .select(col("doc_id"), col("pos"), col("col").as("w"))
      .withColumn("is_stop", expr(s"array_contains(array($stop), w)"))
      .withColumn("phrase_id", sum(col("is_stop").cast("long")).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(!col("is_stop"))
    // ONE materialized phrase table (graft.Ckpt.cut): every later
    // stage references phrases twice or more, and without the cut each
    // reference re-expands the token explode + segmentation window —
    // the executed plan carried TEN window nodes before this
    val phrases = graft.Ckpt.cut(toks.groupBy("doc_id", "phrase_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)")
          .as("ws"),
        count(lit(1)).as("plen"))
      .withColumn("phrase", expr("array_join(ws, ' ')")))
    // corpus-wide word stats over phrase members (multiplicity kept) —
    // members EXPLODE the materialized phrases, no second token pass
    val members = phrases.select(col("doc_id"), col("phrase_id"), col("plen"),
      explode(col("ws")).as("w"))
    val wordStats = members.groupBy("w")
      .agg(sum("plen").as("deg"), count(lit(1)).as("freq"))
      .withColumn("wscore_bp", expr("deg * 10000 div freq"))
    val scored = members.join(wordStats, Seq("w"))
      .groupBy("doc_id", "phrase_id")
      .agg(sum("wscore_bp").as("score_bp"))
      .join(phrases.select("doc_id", "phrase_id", "phrase"), Seq("doc_id", "phrase_id"))
    // top phrase per doc: groupBy-max + join-back, ties to the
    // lexicographically smallest phrase then smallest phrase_id
    val best = scored.groupBy("doc_id").agg(max("score_bp").as("score_bp"))
    scored.join(best, Seq("doc_id", "score_bp"))
      .groupBy("doc_id", "score_bp")
      .agg(min("phrase").as("top_phrase"))
      .select(col("doc_id"), col("top_phrase"), col("score_bp"))
  }

  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("__ch", split(col("__t"), ""))
      .withColumn("entropy", expr(
        """CASE WHEN length(__t) = 0 THEN CAST(0.0 AS DOUBLE) ELSE
          |round(log2(CAST(length(__t) AS DOUBLE)) - aggregate(
          |  transform(array_distinct(__ch),
          |    c -> CAST(size(filter(__ch, x -> x = c)) AS DOUBLE)),
          |  CAST(0.0 AS DOUBLE), (acc, c) -> acc + c * log2(c))
          |  / CAST(length(__t) AS DOUBLE), 4) END""".stripMargin))
      .select("doc_id", "entropy")

  /** Flesch-Kincaid-style readability per document, fully
    * deterministic: words = non-empty space splits, sentences =
    * non-empty '. ' splits (min 1), syllables = vowel-group runs over
    * the whole text (word boundaries break runs, so the per-word sum
    * equals one regexp pass over the text — no lambda, one codegen'd
    * projection). Grade = 0.39·w/s + 11.8·syl/w − 15.59, rounded 4 dp
    * (the repo's double contract). Narrow plan, no shuffle. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .withColumn("n_words", expr(
        "CAST(size(filter(split(__t, ' '), x -> x <> '')) AS BIGINT)"))
      .withColumn("n_sentences", expr(
        "CAST(greatest(size(filter(split(__t, '\\\\. '), x -> x <> '')), 1) AS BIGINT)"))
      .withColumn("syllables", expr(
        "CAST(length(regexp_replace(lower(__t), '[aeiouy]+', '.')) - " +
          "length(regexp_replace(lower(__t), '[aeiouy]+', '')) AS BIGINT)"))
      .filter(col("n_words") > 0)
      .withColumn("fk_grade", expr(
        "round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences) + " +
          "11.8 * (CAST(syllables AS DOUBLE) / n_words) - 15.59, 4)"))
      .select("doc_id", "n_words", "n_sentences", "syllables", "fk_grade")

  /** Per-document n-gram novelty (the RefinedWeb-style diagnostic):
    * of a document's DISTINCT word `n`-gram shingles, the fraction
    * whose corpus-wide FIRST occurrence (minimum doc id) is this
    * document — integer basis points. Low novelty = the document
    * restates earlier material. Same no-pair-enumeration shape as the
    * substring profile: one shingle-keyed exchange (count-over-
    * partition carries the min), one per-doc rollup. */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 5): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc_id"),
        expr(s"filter(split(${textCol}, ' '), x -> x <> '')").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> concat_ws(' ', slice(toks, i, $n))))")).as("sh"))
    sh.withColumn("first_doc", min("doc_id").over(Window.partitionBy("sh")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_first"))
      .withColumn("novelty_bp", expr("n_first * 10000 div n_shingles"))
  }

  /** Rolling-hash base for [[fingerprints]]. Code points are masked
    * to 7 bits (`c & 0x7F`) on BOTH engines before entering the
    * polynomial, so a k=5-gram never leaves signed-64 range
    * (5·5381⁴·127 ≈ 5.3e17 < 2⁶³) for ANY input — unmasked values
    * would silently wrap Long here while the oracle's checked BIGINT
    * arithmetic diverges. The UDFs iterate CODE POINTS (not UTF-16
    * units), matching SQL `substr`/`length` indexing, so gram
    * positions and values are bit-identical across engines for all
    * text including astral-plane characters.
    */
  val FingerprintBase: Long = 5381L

  /** `text` as an array of Unicode code points — the unit SQL string
    * functions index by. One pass, no boxing. */
  private def codePoints(text: String): Array[Int] = text.codePoints().toArray

  /** Winnowing fingerprints (Schleimer et al., SIGMOD 2003): Karp-
    * Rabin rolling hashes of k-grams, minimum per sliding window of
    * `w`, rightmost-min tiebreak, deduplicated. The standard
    * plagiarism / near-dup sketch. The tight JVM rolling loop (no
    * boxing) computes exactly the polynomial the [[fingerprintSql]]
    * oracle evaluates positionally.
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame = {
    val f = udf { text: String =>
      val cp = if (text == null) Array.empty[Int] else codePoints(text)
      if (cp.length < k) Array.empty[Long]
      else {
        val n = cp.length - k + 1
        val hs = new Array[Long](n)
        val B = FingerprintBase
        var pow = 1L
        var i = 0
        while (i < k - 1) { pow *= B; i += 1 }
        var h = 0L
        i = 0
        while (i < k) { h = h * B + (cp(i) & 0x7F); i += 1 }
        hs(0) = h
        i = 1
        while (i < n) {
          h = (h - (cp(i - 1) & 0x7F) * pow) * B + (cp(i + k - 1) & 0x7F)
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

  /** DuckDB oracle reproducing [[fingerprints]]: the k-gram hash as an
    * explicit positional polynomial (identical values — the rolling
    * recurrence is algebraically the same polynomial and neither side
    * overflows), window minimum via a frame of `w` rows, DISTINCT.
    * The rightmost-min tiebreak affects only which *position* wins,
    * never the emitted hash value, so plain `min` matches the UDF.
    */
  def fingerprintSql(k: Int = 5, w: Int = 4): String = {
    val B = FingerprintBase
    val poly = (0 until k).map { j =>
      val pw = (0 until (k - 1 - j)).foldLeft(1L)((a, _) => a * B)
      s"(CAST(ascii(substr(text, CAST(i AS INT) + $j, 1)) AS BIGINT) % 128) * $pw"
    }.mkString(" + ")
    s"""WITH pos AS (
       |  SELECT doc_id, text, length(text) - ${k - 1} AS n,
       |    unnest(generate_series(1, length(text) - ${k - 1})) AS i
       |  FROM documents WHERE length(text) >= $k),
       |h AS (SELECT doc_id, i, n, $poly AS h FROM pos),
       |wmin AS (SELECT doc_id, i, n,
       |  min(h) OVER (PARTITION BY doc_id ORDER BY i
       |               ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |  FROM h)
       |SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= n - ${w - 1}""".stripMargin
  }

  /** Modulus for the LONG-gram fingerprint variant: 2³¹ − 1 (the
    * house prime, same as Dedup.MinhashP). [[fingerprints]]' plain
    * polynomial only stays in signed-64 range up to k=5
    * (127·5381⁴·5 ≈ 5·10¹⁷); past that the hash must live in a
    * modular ring BOTH engines can evaluate exactly. With mod-P
    * coefficients every SQL-side product is ≤ 127·(P−1) ≈ 2.7·10¹¹
    * and the k-term sum ≤ k·2.7·10¹¹ — overflow-free for any k that
    * fits a document. */
  val FingerprintP: Long = 2147483647L

  /** Winnowing fingerprints over LONG k-grams (k > 5): Karp-Rabin
    * rolling hash in the mod-P ring, minimum per sliding window of
    * `w`, deduplicated. Same contract as [[fingerprints]]; the
    * modular rolling recurrence equals the positional polynomial
    * mod P (ring homomorphism), so [[fingerprintModSql]] reproduces
    * the values bit-for-bit. Shared substrings of length ≥ k+w−1
    * are guaranteed to share a fingerprint (Schleimer et al. 2003) —
    * the scale path for substring-level dedup: sketch size is
    * ~n/w per doc, not n.
    */
  def fingerprintsMod(df: DataFrame, idCol: String, textCol: String,
                      k: Int, w: Int): DataFrame = {
    val f = udf { text: String =>
      val cp = if (text == null) Array.empty[Int] else codePoints(text)
      if (cp.length < k + w - 1) Array.empty[Long]
      else {
        val P = FingerprintP
        val B = FingerprintBase
        val n = cp.length - k + 1
        val hs = new Array[Long](n)
        var pow = 1L
        var i = 0
        while (i < k - 1) { pow = pow * B % P; i += 1 }
        var h = 0L
        i = 0
        while (i < k) { h = (h * B + (cp(i) & 0x7F)) % P; i += 1 }
        hs(0) = h
        i = 1
        while (i < n) {
          val t = Math.floorMod(h - (cp(i - 1) & 0x7F) * pow, P)
          h = (t * B + (cp(i + k - 1) & 0x7F)) % P
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

  /** DuckDB mirror of [[fingerprintsMod]]: positional polynomial with
    * precomputed B^j mod P coefficients, reduced mod P once per gram. */
  def fingerprintModSql(k: Int, w: Int): String = {
    val P = FingerprintP
    val B = FingerprintBase
    val pows = Array.iterate(1L, k)(_ * B % P).reverse // B^(k-1-j) mod P
    val poly = (0 until k).map { j =>
      s"(CAST(ascii(substr(text, CAST(i AS INT) + $j, 1)) AS BIGINT) % 128) * ${pows(j)}"
    }.mkString(" + ")
    s"""WITH pos AS (
       |  SELECT doc_id, text, length(text) - ${k - 1} AS n,
       |    unnest(generate_series(1, length(text) - ${k - 1})) AS i
       |  FROM documents WHERE length(text) >= ${k + w - 1}),
       |h AS (SELECT doc_id, i, n, ($poly) % $P AS h FROM pos),
       |wmin AS (SELECT doc_id, i, n,
       |  min(h) OVER (PARTITION BY doc_id ORDER BY i
       |               ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS fp
       |  FROM h)
       |SELECT DISTINCT doc_id, fp FROM wmin WHERE i <= n - ${w - 1}""".stripMargin
  }

  /** Count–min-sketch heavy hitters — the approximate tier behind
    * [[t6]]'s exact per-group top-k, for when even (group, token)
    * cardinality exceeds memory at 100 TB. The sketch is the ONLY
    * corpus-wide aggregate: `depth`×`width` cells, built with map-side
    * partial aggregation so the shuffle carries at most depth·width
    * rows per partition regardless of corpus size; estimates then come
    * from a broadcast of the (tiny) finished sketch. Hashes follow the
    * house md5-affine convention (Dedup.minhashCoeffs), so the sketch —
    * and therefore every estimate — is bit-reproducible in the DuckDB
    * oracle. CMS guarantees est ≥ true count; ties and ordering are
    * broken by token, so top-k is deterministic on any engine.
    */
  /** The raw depth×width CELL table of the count-min sketch over the
    * whitespace token stream: (j, cell, cnt) — the mergeable (linear)
    * representation. CMS of a union is the cell-wise SUM of the
    * parts' cells, so incremental/streaming maintenance is a
    * grouped sum over at most depth·width rows per part
    * ([[graft.streaming.StreamingOps.cmsSink]]); same md5-affine
    * hash family as [[cmsHeavyHitters]], so stored cells stay
    * bit-reproducible across engines and batches.
    */
  def cmsCells(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame = {
    val (ca, cb) = Dedup.minhashCoeffs(depth)
    val P = Dedup.MinhashP
    df.select(explode(expr(s"filter(split($textCol, ' '), x -> x != '')")).as("tok"))
      .withColumn("h0",
        expr(s"CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT) % $P"))
      .select(posexplode(array((0 until depth).map(j =>
        (lit(ca(j)) * col("h0") + lit(cb(j))) % P % width): _*)).as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
  }

  def cmsHeavyHitters(df: DataFrame, textCol: String,
                      depth: Int, width: Int, k: Int): DataFrame = {
    val (ca, cb) = Dedup.minhashCoeffs(depth)
    val P = Dedup.MinhashP
    def cellCols = array((0 until depth).map(j =>
      (lit(ca(j)) * col("h0") + lit(cb(j))) % P % width): _*)
    val tok = df.select(
      explode(expr(s"filter(split($textCol, ' '), x -> x != '')")).as("tok"))
    val hashed = tok.withColumn("h0",
      expr(s"CAST(conv(substr(md5(tok), 1, 8), 16, 10) AS BIGINT) % $P"))
    val cells = hashed
      .select(posexplode(cellCols).as(Seq("j", "cell")))
      .groupBy("j", "cell").agg(count(lit(1)).as("cnt"))
    hashed.distinct()
      .select(col("tok"), posexplode(cellCols).as(Seq("j", "cell")))
      .join(broadcast(cells), Seq("j", "cell"))
      .groupBy("tok").agg(min("cnt").as("est"))
      .orderBy(col("est").desc, col("tok"))
      .limit(k)
  }

  /** DuckDB mirror of [[cmsHeavyHitters]] over `documents.text`. */
  def cmsHeavyHittersSql(depth: Int, width: Int, k: Int): String = {
    val (ca, cb) = Dedup.minhashCoeffs(depth)
    val P = Dedup.MinhashP
    val coefValues = (0 until depth).map(j => s"(${ca(j)}, ${cb(j)})").mkString(", ")
    // md5 first 8 hex digits parsed positionally into a BIGINT (DuckDB
    // has no conv()) — identical to PipelineQueries.baseHashSql.
    val baseHash = (0 until 8).map { m =>
      s"(strpos('0123456789abcdef', substr(md5(tok), ${m + 1}, 1)) - 1) * ${1L << (4 * (7 - m))}"
    }.mkString("(", " + ", ")")
    s"""WITH tokall AS (SELECT t.tok FROM documents,
       |    unnest(string_split(text, ' ')) AS t(tok) WHERE t.tok <> ''),
       |h AS (SELECT tok, $baseHash % $P AS h0 FROM tokall),
       |coef(a, b) AS (VALUES $coefValues),
       |cells AS (SELECT a, b, ((a * h0 + b) % $P) % $width AS cell,
       |    count(*) AS cnt
       |  FROM h CROSS JOIN coef GROUP BY 1, 2, 3),
       |est AS (SELECT v.tok, min(c.cnt) AS est
       |  FROM (SELECT DISTINCT tok, h0 FROM h) v CROSS JOIN coef
       |  JOIN cells c ON c.a = coef.a AND c.b = coef.b
       |    AND c.cell = ((coef.a * v.h0 + coef.b) % $P) % $width
       |  GROUP BY 1)
       |SELECT tok, CAST(est AS BIGINT) AS est FROM est
       |ORDER BY est DESC, tok LIMIT $k""".stripMargin
  }
}
