package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Ckpt

/** Training-corpus preparation operators: the steps between a raw
  * deduplicated document store and model-ready token sequences —
  * chunking, context-window packing, incremental (batch-over-corpus)
  * dedup, normalized-text dedup, test-set decontamination, and
  * rare-token scoring.
  *
  * Scale posture (the 100-TB contract for each):
  *   - [[chunk]] is narrow — each document expands in place, no
  *     shuffle; output size is input size × (width/stride) overlap
  *     factor, chosen by the caller.
  *   - [[pack]] windows per shard, never globally — parallelism is
  *     the shard count and each shard's running sum is one
  *     partition's sort, the same contract as real pre-tokenized
  *     shard layouts.
  *   - [[incrementalSurvivors]] anti-joins 40-byte digest rows, never
  *     document bodies; the corpus side is distinct-compacted before
  *     the exchange.
  *   - [[decontaminate]] broadcasts the benchmark n-gram set (test
  *     suites are MBs; the corpus is the 100-TB side and is never
  *     shuffled — the join is map-side).
  *   - [[rarityScores]] ranks the vocabulary (bounded, ~10⁷ entries
  *     at web scale — the one global window here is vocab-sized, not
  *     corpus-sized) and broadcast-joins ranks back to the token
  *     stream.
  */
object Corpus {

  private def toks(textCol: String): String =
    s"filter(split($textCol, ' '), x -> x != '')"

  /** Deterministic HTML wrapper around a plain-text corpus — the
    * HTML-shaped documents variant the [[extractText]] tests and
    * oracle run against (the driver testdata ships clean text; a real
    * web corpus arrives as raw HTML, which feeds extractText
    * directly). Scaffolding is nav + h1 + two content paragraphs
    * (the document's words, split at the midpoint) + a link-spam div
    * + footer, so every boilerplate class the classifier must reject
    * is present and the GOOD blocks reconstruct the original text.
    * Pure string/array expressions — replayable in ANSI SQL. */
  def wrapHtml(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), expr(toks(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")))
      .withColumn("__h", greatest(expr("__n div 2"), lit(1)))
      .withColumn("html", expr(
        """concat(
          |'<html><body><nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav>',
          |'<h1>', array_join(slice(__t, 1, 3), ' '), '</h1>',
          |'<p>', array_join(slice(__t, 1, __h), ' '), '</p>',
          |'<p>', array_join(slice(__t, __h + 1, __n), ' '), '</p>',
          |'<div>', array_join(transform(slice(__t, 4, 6), w -> concat('<a href="#">', w, '</a>')), ' '), '</div>',
          |'<footer>copyright <a href="/terms">terms</a> <a href="/privacy">privacy</a></footer></body></html>')"""
          .stripMargin))
      .select(col(idCol), col("html"))

  /** HTML → main-content extraction, the jusText/trafilatura-family
    * text-density recipe as declarative expressions: split the page
    * into blocks at closing block-level tags, strip tags per block,
    * then classify each block on (visible length, LINK DENSITY =
    * anchor-text chars / visible chars, STOPWORD DENSITY) — short,
    * link-heavy, or stopword-free blocks are boilerplate (nav, link
    * farms, footers); the rest concatenate in document order into
    * `main_text`. One narrow projection + one per-doc aggregate: no
    * shuffle beyond the doc_id groupBy, parses nothing in a UDF, and
    * every feature is a codegen'd string expression — at 100 TB the
    * cost is one pass over the raw bytes.
    *
    * Output is integers + strings only (counts, lengths, text), so
    * the oracle compare has no float-boundary risk. */
  def extractText(df: DataFrame, idCol: String, htmlCol: String,
                  minLen: Int = 30, maxLinkDensity: Double = 0.3,
                  minStopDensity: Double = 0.05): DataFrame = {
    val stop = "array('the','a','and','of','to','in','is','on','for','with')"
    df.select(col(idCol).as("doc_id"),
        posexplode(expr(s"split($htmlCol, '</(p|nav|footer|div|h1)>')")))
      .select(col("doc_id"), col("pos").as("bpos"), col("col").as("raw"))
      .withColumn("txt", expr(
        "trim(regexp_replace(regexp_replace(raw, '<[^>]*>', ' '), ' +', ' '))"))
      .withColumn("__lc", expr(
        "aggregate(regexp_extract_all(raw, '<a[^>]*>([^<]*)</a>', 1), 0, (a, x) -> a + length(x))"))
      .withColumn("__tk", expr(s"${toks("txt")}"))
      .withColumn("good",
        length(col("txt")) >= minLen &&
        col("__lc").cast("double") / greatest(length(col("txt")), lit(1)) <= maxLinkDensity &&
        expr(s"size(filter(__tk, x -> array_contains($stop, x)))").cast("double") /
          greatest(expr("size(__tk)"), lit(1)) >= minStopDensity)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(col("good").cast("long")).as("n_good"),
        coalesce(expr(
          "array_join(transform(array_sort(collect_list(CASE WHEN good THEN struct(bpos, txt) END)), x -> x.txt), ' ')"),
          lit("")).as("main_text"))
      .withColumn("main_len", length(col("main_text")).cast("long"))
  }

  /** Fixed-width token chunking with stride: document → overlapping
    * windows of `width` tokens starting every `stride` tokens (the
    * standard context-window slicing step before tokenizer packing).
    * The final partial window is kept (truncated, `n_tokens` < width).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1, "width and stride must be positive")
    df.select(col(idCol).as("doc_id"), expr(toks(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(1, greatest(size(toks), 1), $stride),
           |  i -> struct(array_join(slice(toks, i, $width), ' ') AS txt,
           |              size(slice(toks, i, $width)) AS n))""".stripMargin)))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
        col("col.txt").as("chunk_text"), col("col.n").cast("long").as("n_tokens"))
  }

  /** DuckDB mirror of [[chunk]] over `documents` (same slice
    * semantics: 1-based start, truncating). */
  def chunkSql(width: Int, stride: Int): String =
    s"""SELECT doc_id, CAST((i - 1) // $stride AS BIGINT) AS chunk_id,
       |  array_to_string(s[CAST(i AS INT):CAST(i + ${width - 1} AS INT)], ' ') AS chunk_text,
       |  CAST(len(s[CAST(i AS INT):CAST(i + ${width - 1} AS INT)]) AS BIGINT) AS n_tokens
       |FROM (SELECT doc_id, s, unnest(generate_series(1, greatest(len(s), 1), $stride)) AS i
       |      FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS s
       |            FROM documents))""".stripMargin

  /** Concatenated-stream context-window packing: documents are laid
    * head-to-tail per shard in id order; `bin` is the index of the
    * `budget`-token window containing the document's FIRST token and
    * `bin_offset` its position inside that window. Documents may span
    * bins — the split itself is [[chunk]]'s job downstream; this
    * operator is the assignment that makes the split embarrassingly
    * parallel. */
  def pack(df: DataFrame, idCol: String, textCol: String,
           shardCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be positive")
    // over the RENAMED output columns — the select below rebinds the
    // caller's idCol/shardCol to doc_id/source before the window runs
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(shardCol).as("source"), col(idCol).as("doc_id"),
        expr(s"size(${toks(textCol)})").cast("long").as("n_tokens"))
      .withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"start_tok div $budget").as("bin"),
        expr(s"start_tok % $budget").as("bin_offset"))
  }

  /** Incremental dedup: ids of NEW-batch rows whose content does not
    * already exist in the corpus (`isNew` false side). The anti-join
    * key is the 192-bit (xxhash64, md5) composite — independent hash
    * families, so a silent false drop needs a simultaneous collision
    * in both (P ≈ n²/2¹⁹³); only digests cross the exchange, and the
    * corpus side is collapsed to distinct digests first. This is the
    * batch form of the streaming dedup-within-watermark operator. */
  def incrementalSurvivors(df: DataFrame, idCol: String, contentCol: String,
                           isNew: Column): DataFrame = {
    val keyed = df.select(col(idCol).as("doc_id"),
      xxhash64(col(contentCol)).as("__h1"), md5(col(contentCol)).as("__h2"),
      isNew.as("__is_new"))
    val corpus = keyed.filter(!col("__is_new")).select("__h1", "__h2").distinct()
    keyed.filter(col("__is_new"))
      .join(corpus, Seq("__h1", "__h2"), "left_anti")
      .select("doc_id")
  }

  /** Normalized-text dedup clusters: case-fold, strip non-alphanumerics,
    * collapse whitespace — then cluster exactly on the normal form
    * (the boilerplate-tolerant tier between byte-exact d1 and fuzzy
    * d2–d4). Cluster key is the digest composite of the normal form,
    * so document bodies never cross the exchange. */
  def normalizedClusters(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", ""), " +", " "))
    df.select(col(idCol).as("member_id"),
        xxhash64(norm).as("__h1"), md5(norm).as("__h2"))
      .withColumn("keep_id",
        min(col("member_id")).over(Window.partitionBy("__h1", "__h2")))
      .select("keep_id", "member_id")
  }

  /** Normalization mirror for oracles (DuckDB regexp_replace needs the
    * explicit 'g' flag; Spark's replaces all occurrences by default). */
  val normalizeSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Test-set decontamination (the published n-gram-overlap recipe:
    * drop training documents sharing any word n-gram with an eval
    * benchmark). Returns (doc_id, n_contaminated) for every TRAINING
    * document (`isTest` false) sharing ≥1 distinct n-gram with the
    * test side. The distinct test n-grams are broadcast — the corpus
    * stream is filtered map-side and only matching (doc, gram) pairs
    * reach the counting aggregate. */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
                    isTest: Column, n: Int): DataFrame = {
    require(n >= 1, "n-gram order must be positive")
    val grams = df.select(col(idCol).as("doc_id"), isTest.as("__is_test"),
        expr(toks(textCol)).as("toks"))
      .select(col("doc_id"), col("__is_test"), explode(expr(
        s"""CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(1, size(toks) - ${n - 1}),
           |                 i -> array_join(slice(toks, i, $n), ' '))
           |  ELSE array() END""".stripMargin)).as("gram"))
    val test = grams.filter(col("__is_test")).select("gram").distinct()
    grams.filter(!col("__is_test")).select("doc_id", "gram").distinct()
      .join(broadcast(test), Seq("gram"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
  }

  /** The 100-TB tier of [[decontaminate]]: a BLOOM FILTER of the
    * benchmark n-grams replaces the broadcast gram set — a 10⁹-gram
    * eval suite costs ~1.8 GB of raw strings to broadcast but ~1.7 GB
    * of Bloom bits at fpp=1e-3 scales to ~2 bytes/gram REGARDLESS of
    * gram length, and fpp=1e-2 to ~1.2 bytes (the published
    * big-corpus decontamination setups all probe a sketch, not a
    * set). Guarantees: NO false negatives — every doc [[decontaminate]]
    * flags is flagged here with n_flagged ≥ n_contaminated; false
    * positives add spurious flags at ≤ fpp per distinct corpus gram
    * (spec-bounded). Deterministic: Spark's BloomFilter inserts are
    * bit-ORs, so the filter is a pure function of the gram SET —
    * order- and retry-independent.
    *
    * The probe is a Scala UDF over the broadcast filter — justified
    * like the minhash permutation loop: no builtin expression probes
    * a Bloom sketch, and the UDF is a pure in-memory bit test.
    */
  def decontaminateBloom(df: DataFrame, idCol: String, textCol: String,
                         isTest: Column, n: Int, fpp: Double = 0.001): DataFrame = {
    require(n >= 1, "n-gram order must be positive")
    val grams = df.select(col(idCol).as("doc_id"), isTest.as("__is_test"),
        expr(toks(textCol)).as("toks"))
      .select(col("doc_id"), col("__is_test"), explode(expr(
        s"""CASE WHEN size(toks) >= $n
           |  THEN transform(sequence(1, size(toks) - ${n - 1}),
           |                 i -> array_join(slice(toks, i, $n), ' '))
           |  ELSE array() END""".stripMargin)).as("gram"))
    val test = grams.filter(col("__is_test")).select("gram").distinct()
    val bloom = test.stat.bloomFilter("gram", test.count().max(1L), fpp)
    val bc = df.sparkSession.sparkContext.broadcast(bloom)
    val might = udf((g: String) => g != null && bc.value.mightContainString(g))
    grams.filter(!col("__is_test")).select("doc_id", "gram").distinct()
      .filter(might(col("gram")))
      .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
  }

  /** The composed model-ready export: tokenize → dictionary-encode
    * (token id = frequency rank, the classic vocab ordering) →
    * per-document id sequence in position order → concatenated-stream
    * packing into `budget`-token context windows per shard. One
    * corpus-wide aggregate builds the vocabulary (vocab-sized,
    * broadcast back); the id-sequence assembly is one grouped
    * aggregate per document; packing adds the per-shard window. The
    * id sequence is emitted as a CSV string — the cross-engine-stable
    * surface for the oracle (array columns don't hash portably).
    */
  def tokenizePack(df: DataFrame, idCol: String, textCol: String,
                   shardCol: String, budget: Int): DataFrame = {
    require(budget >= 1, "budget must be positive")
    val tok = df.select(col(shardCol).as("source"), col(idCol).as("doc_id"),
      posexplode(expr(toks(textCol))).as(Seq("pos", "tok")))
    // frequency rank via the Quantiles stats pass — the order
    // (count DESC, token ASC) is unique, so the distributed global
    // rank equals the window dense_rank; no single-task
    // vocabulary-sized sort even when the vocabulary is data-scale
    val vocab = Quantiles.globalRank(
        tok.groupBy("tok").agg(count(lit(1)).as("__cnt")),
        Seq(-col("__cnt"), col("tok")), "rank")
      .select("tok", "rank")
    val seqs = tok.join(broadcast(vocab), Seq("tok"))
      .groupBy("source", "doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(pos, rank))), x -> CAST(x.rank AS STRING)), ',')")
          .as("ids_csv"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    seqs.withColumn("start_tok", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("source"), col("doc_id"),
        expr(s"start_tok div $budget").as("bin"),
        expr(s"start_tok % $budget").as("bin_offset"),
        col("n_tokens"), col("ids_csv"))
  }

  /** Weighted corpus mixing — the sampling-ratio step that turns a
    * raw document store into a training mixture: each stratum (source,
    * language, quality tier…) gets a target weight in basis points
    * (10000 = exactly one epoch). Weight < 10000 downsamples
    * (deterministic Bernoulli on the overflow-masked multiplicative
    * hash — the smp1 family); weight > 10000 UPSAMPLES by repetition:
    * every document emits floor(w/10000) full copies plus one more
    * with probability (w mod 10000)/10000, each tagged with its
    * repetition index `rep` so downstream shuffling can interleave
    * epochs. Narrow plan — each row expands in place (explode over a
    * ≤ ceil(w) sequence), no shuffle; deterministic, so re-runs and
    * retried tasks emit identical mixtures at any scale.
    */
  def mixSources(df: DataFrame, idCol: String, stratumCol: String,
                 weightsBp: Map[String, Long], defaultBp: Long): DataFrame = {
    require((defaultBp +: weightsBp.values.toSeq).forall(_ >= 0), "weights must be >= 0")
    // resolved against the RENAMED stratum column — the select below
    // rebinds the caller's column before the weight case runs
    val wcol = weightsBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp)) {
      case (acc, (k, v)) => when(col("stratum") === k, lit(v)).otherwise(acc)
    }
    df.select(col(idCol).as("doc_id"), col(stratumCol).as("stratum"))
      .withColumn("__w", wcol)
      .withColumn("rep",
        explode(expr("sequence(1, greatest(CAST((__w + 9999) div 10000 AS INT), 1))")))
      .filter(col("rep") * 10000 <= col("__w") ||
        expr("((doc_id % 1000003) * 2654435761 + rep) % 10000 < __w % 10000"))
      .select(col("doc_id"), col("stratum"), col("rep").cast("long").as("rep"))
  }

  /** TOKEN-BUDGET composition — the data-recipe primitive ("this run
    * gets 200B web tokens, 50B code tokens"): per source, admit
    * documents in deterministic md5 order until the source's TOKEN
    * budget fills. A document is admitted iff the tokens admitted
    * before it are still under budget, so the crossing document is
    * taken and overshoot is bounded by one document — the standard
    * fill-then-stop cut. [[temperatureMix]] counts documents; budgets
    * bind on tokens, which is what a training run actually buys.
    * Returns the admitted manifest (doc_id, src, n_tokens,
    * cum_tokens inclusive) — feed it to pack/shard downstream.
    *
    * Scale shape: one cumulative-sum window partitioned BY SOURCE —
    * the corpus's natural parallelism (a recipe has tens of sources,
    * each internally unordered); no global sort, no driver state.
    * A single pathologically dominant source would ride the same
    * bucketed prefix-sum as Quantiles (bucket by hash prefix,
    * prefix-sum bucket totals, sort only the boundary bucket). */
  def tokenBudgetMix(df: DataFrame, idCol: String, textCol: String,
                     srcCol: String, budgets: Map[String, Long],
                     defaultBudget: Long): DataFrame = {
    require((defaultBudget +: budgets.values.toSeq).forall(_ >= 0),
      "budgets must be >= 0")
    val bcol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col("src") === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy("src")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).as("doc_id"), col(srcCol).as("src"),
        size(filter(split(col(textCol), " "), t => t =!= ""))
          .cast("long").as("n_tokens"))
      .withColumn("hk",
        expr("conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)").cast("long"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("__budget", bcol)
      .filter(col("cum_tokens") - col("n_tokens") < col("__budget"))
      .select("doc_id", "src", "n_tokens", "cum_tokens")
  }

  /** Per-document rare-token score: rank the vocabulary by descending
    * corpus frequency (rank 1 = most common; ties broken by token, so
    * the rank is total and engine-independent) and sum the rank over
    * every token INSTANCE in the document. High score = long and/or
    * rare-heavy — the cheap "informativeness" signal used for corpus
    * curation. The rank table is vocabulary-sized and broadcast. */
  def rarityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"),
      explode(expr(toks(textCol))).as("tok"))
    // distributed frequency rank — see tokenizePack's vocabulary note
    val ranks = Quantiles.globalRank(
        tok.groupBy("tok").agg(count(lit(1)).as("__cnt")),
        Seq(-col("__cnt"), col("tok")), "rank")
      .select("tok", "rank")
    tok.join(broadcast(ranks), Seq("tok"))
      .groupBy("doc_id").agg(sum("rank").as("rarity"))
  }

  /** Temperature-based source mixing (the multilingual-LM recipe —
    * sample source s with probability ∝ n_s^α, α=1/2 here: big sources
    * down-weighted, small ones surfaced). Deterministic and
    * integer-exact end to end: weights are ⌊√n_s⌋ (IEEE sqrt is
    * correctly rounded, so the floor is engine-independent), per-source
    * targets are `total · w_s div Σw`, and the selected rows are each
    * source's bottom-`target` documents by md5 order (the smp4
    * coordination-free hash family). Returns the per-source manifest.
    *
    * Scale shape: the weight table is source-cardinality-sized
    * (collected only for the Σw scalar — O(1) driver state); selection
    * is one window partitioned BY SOURCE (the corpus's natural
    * parallelism; a single pathologically dominant source would ride
    * the same bucketed rank as Quantiles). */
  def temperatureMix(df: DataFrame, idCol: String, srcCol: String,
                     total: Long): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(srcCol).as("src"))
    val weights = base.groupBy("src")
      .agg(count(lit(1)).as("n"))
      .withColumn("w", floor(sqrt(col("n"))).cast("long"))
    val sumW = weights.agg(sum("w")).collect()(0).getLong(0)
    val targets = broadcast(
      Ckpt.cutLight(weights.withColumn("target", expr(s"w * $total div $sumW"))))
    base
      .withColumn("hk",
        expr(s"conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)").cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("src").orderBy(col("hk"), col("doc_id"))).cast("long"))
      .join(targets, Seq("src"))
      .filter(col("rn") <= col("target"))
      .groupBy("src")
      .agg(count(lit(1)).as("taken"), min("doc_id").as("min_id"),
        max("doc_id").as("max_id"))
      .join(targets.select("src", "n", "target"), Seq("src"))
      .select(col("src"), col("n"), col("target"), col("taken"),
        col("min_id"), col("max_id"))
  }
}
