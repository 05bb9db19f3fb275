package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines mirroring the batch operators:
  * event-time windowed aggregation with watermark, stateful gap
  * sessionization, and within-watermark dedup. All are
  * `readStream`-agnostic transforms — tests drive them with
  * `MemoryStream`, production with kafka/file sources.
  */
object StreamingOps {

  /** Tumbling event-time window aggregate with a lateness watermark.
    * State is bounded by the watermark: closed windows are emitted and
    * dropped, so this runs indefinitely at constant memory per key.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("wstart"), col(keyCol),
        col("cnt"), col("sum_value"))

  case class Ev(user_id: Long, t: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start: Long, end: Long, n_events: Long,
                     sum_value: Double)

  /** Gap-based sessionization over a stream keyed by user: a session
    * closes when an event arrives more than `gapSeconds` after the
    * previous one (processing-order within the group; pair with
    * watermarked sorting upstream for strict event-time order).
    * Emits closed sessions (Append mode); per-key state is one
    * [[SessionState]] — constant memory per active user.
    */
  def sessionize(events: Dataset[Ev], gapSeconds: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          evs.toSeq.sortBy(e => (e.t)).foreach { e =>
            if (st == null) st = SessionState(e.t, e.t, 1, e.value)
            else if (e.t - st.last > gapSeconds) {
              out += Session(uid, st.start, st.last, st.n, st.sum)
              st = SessionState(e.t, e.t, 1, e.value)
            } else st = SessionState(st.start, e.t, st.n + 1, st.sum + e.value)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  case class TsEv(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Gap sessionization with EVENT-TIME TIMEOUT: unlike
    * [[sessionize]] (which only closes a session when a LATER event
    * from the same user arrives — the last session per user never
    * emits), this registers an event-time timeout at
    * last-event + gap, so the watermark itself flushes idle
    * sessions. The complete-emission contract a production
    * sessionizer needs: every session eventually appears, users who
    * go quiet included; state per user is one open session, freed on
    * timeout.
    */
  def sessionizeWithTimeout(events: Dataset[TsEv], gapSeconds: Long,
                            watermark: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, evs: Iterator[TsEv], state: GroupState[SessionState]) =>
          if (evs.isEmpty && state.hasTimedOut) {
            // watermark passed last+gap: flush and free
            val st = state.get
            state.remove()
            Iterator.single(Session(uid, st.start, st.last, st.n, st.sum))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var st = state.getOption.orNull
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime / 1000L
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.last > gapSeconds) {
                out += Session(uid, st.start, st.last, st.n, st.sum)
                st = SessionState(t, t, 1, e.value)
              } else st = SessionState(st.start, t, st.n + 1, st.sum + e.value)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp((st.last + gapSeconds) * 1000L + 1)
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup on `idCols` within the watermark horizon —
    * duplicate suppression state ages out with the watermark. */
  def dedup(events: DataFrame, tsCol: String, watermark: String,
            idCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(idCols :+ tsCol)

  /** Stream-static enrichment: every micro-batch joins the (small)
    * static dimension via broadcast — no stream-side shuffle, no
    * state; the standard streaming dimension-lookup shape. Spark
    * re-plans the static side per batch, so slowly-changing dims
    * (e.g. a refreshed parquet snapshot) are picked up.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Stream enrichment against a SLOWLY-CHANGING dimension: [[enrich]]
    * captures the dim frame once at plan time, so dimension updates
    * published mid-stream are never seen. This variant re-resolves the
    * dimension INSIDE foreachBatch — each micro-batch re-reads
    * `dimPath` and broadcast-joins against the freshest rows, the
    * standard production pattern for reference data that changes
    * slower than the stream but faster than the job restarts.
    * `sink(enrichedBatch, batchId)` receives each joined batch.
    */
  def enrichRefreshing(stream: DataFrame, dimPath: String, keys: Seq[String])
                      (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        val dim = batch.sparkSession.read.parquet(dimPath)
        sink(batch.join(broadcast(dim), keys), batchId)
        ()
    }

  /** Stream-stream inner join with watermarks on BOTH sides and a
    * time-range condition — the combination Spark needs to bound join
    * state: each side keeps only rows inside its watermark horizon,
    * and rows pair when `cond` holds (key equality + event-time
    * range, e.g. `l.ts BETWEEN r.ts AND r.ts + interval`). Without
    * the range condition the state store grows forever.
    */
  def joinStreams(left: DataFrame, lTsCol: String, lWatermark: String,
                  right: DataFrame, rTsCol: String, rWatermark: String,
                  cond: org.apache.spark.sql.Column): DataFrame =
    left.withWatermark(lTsCol, lWatermark)
      .join(right.withWatermark(rTsCol, rWatermark), cond)

  /** Streaming AS-OF join (q25's batch semantics on live streams —
    * the quote-at-order-time enrichment every trading/telemetry
    * pipeline runs): for each left event, the LATEST right event with
    * the same key at or before the left's event time, within
    * `tolerance`. Two CHAINED stateful operators — the
    * multiple-stateful-operator pattern Structured Streaming supports
    * natively: a watermarked time-interval join bounds the candidate
    * set (join state evicted as the watermark passes the interval),
    * then a watermarked group-by on the left event collapses
    * candidates to the max-event-time right row (ties to the larger
    * value — struct-max, deterministic). Append mode: each enriched
    * left event emits exactly once, when the watermark closes its
    * group. Left events with no right match inside the window emit
    * nothing (inner as-of). Left events IDENTICAL in (time, key)
    * collapse to one output row — the group key is the left event's
    * identity; carry a unique event id in `lKey` when exact
    * multiplicity matters.
    *
    * Scale shape: state per key is the watermark-bounded slice of
    * both streams — tolerance × event rate, independent of stream
    * lifetime; the exchange is the same key-partitioned shuffle the
    * batch as-of uses, applied incrementally.
    */
  def asofJoinStream(left: DataFrame, lTs: String, lKey: String,
                     right: DataFrame, rTs: String, rKey: String, rVal: String,
                     tolerance: String, watermark: String): DataFrame = {
    // alias both sides and qualify every reference: with bare col()
    // refs, a column name shared by the two streams (both called
    // 'ts', same key name — the COMMON case) resolves ambiguously or
    // binds both predicates to one side and silently self-matches
    val l = left.withWatermark(lTs, watermark).as("l")
    val r = right.withWatermark(rTs, watermark).as("r")
    val cond = col(s"l.$lKey") === col(s"r.$rKey") &&
      col(s"r.$rTs") <= col(s"l.$lTs") &&
      col(s"r.$rTs") >= col(s"l.$lTs") - expr(s"INTERVAL $tolerance")
    l.join(r, cond)
      .groupBy(col(s"l.$lTs"), col(s"l.$lKey"))
      .agg(max(struct(col(s"r.$rTs").as("mts"), col(s"r.$rVal").as("mval"))).as("m"))
      .select(col(s"l.$lTs"), col(s"l.$lKey"),
        col("m.mts").as("asof_ts"), col("m.mval").as("asof_value"))
  }

  /** Native session-window streaming aggregation: Spark's
    * `session_window` builds dynamic-gap windows in the state store
    * itself (merging as events arrive, closing when the watermark
    * passes gap past the last event) — the engine-managed
    * counterpart of the hand-rolled [[sessionize]] state machine.
    * Append mode emits each session exactly once, closed; state per
    * key is the set of OPEN sessions only, so this runs indefinitely
    * at watermark-bounded memory. Prefer this when the per-session
    * output is plain aggregates; drop to [[sessionize]] only for
    * custom state transitions the built-in can't express.
    */
  def sessionWindowAgg(events: DataFrame, tsCol: String, keyCol: String,
                       gap: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sstart"),
        col("session_window.end").as("send"),
        col(keyCol), col("n_events"), col("sum_value"))

  /** Sliding (hopping) event-time windows: each event lands in
    * len/slide overlapping windows — the streaming moving-average
    * shape. Same watermark-bounded state contract as
    * [[windowedCounts]]; the multiplication of state is the
    * len/slide factor, chosen by the caller, not data-dependent.
    */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("wstart"), col(keyCol),
        col("cnt"), col("sum_value"))

  /** Exact streaming dedup on `idCols` with state aged out by the
    * watermark but WITHOUT requiring the event-time column in the
    * key: `dropDuplicatesWithinWatermark` keeps one state row per
    * distinct `idCols` value and expires it once the watermark
    * passes the first-seen event time + delay — so a replayed or
    * late clone with a DIFFERENT timestamp is still suppressed
    * (the plain [[dedup]] keyed on id+ts would emit it). The right
    * primitive for at-least-once upstream ingestion.
    */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
                           watermark: String, idCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream LEFT OUTER interval join: same bounded-state
    * contract as [[joinStreams]] (watermarks both sides + an
    * event-time range in `cond`), but unmatched left rows are
    * emitted with nulls once the watermark proves no match can
    * arrive — the streaming form of "impressions without a click".
    * Outer results are therefore delayed by the watermark horizon;
    * that latency is the price of a correct null, not a bug.
    */
  def joinStreamsOuter(left: DataFrame, lTsCol: String, lWatermark: String,
                       right: DataFrame, rTsCol: String, rWatermark: String,
                       cond: org.apache.spark.sql.Column): DataFrame =
    left.withWatermark(lTsCol, lWatermark)
      .join(right.withWatermark(rTsCol, rWatermark), cond, "left_outer")

  /** Streaming CDC apply: each micro-batch is a keyed changeset
    * (latest-wins upsert; a row with `deleteCol` true removes the
    * key) merged into a persistent parquet snapshot — the streaming
    * MERGE counterpart of the batch `Snapshot.applyDiff`. Within a
    * batch the newest `ordCol` wins per key; across batches the
    * store is rewritten with the merged survivors. The store
    * rewrite is full-file here; at cluster scale the same logic
    * rides `Layout.upsertPartitioned` so only touched partitions
    * rewrite. foreachBatch is at-least-once: replaying a batch
    * re-applies the same upserts — idempotent by construction
    * (latest-wins on the same data), so the snapshot converges.
    */
  def cdcMergeSink(changes: DataFrame, keyCols: Seq[String], ordCol: String,
                   deleteCol: String, storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val existing =
          if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            spark.read.parquet(storePath)
              .withColumn(deleteCol, lit(false))
              .withColumn("__old", lit(1))
          else batch.withColumn("__old", lit(1)).limit(0)
        val merged = batch.withColumn("__old", lit(0))
          .unionByName(existing)
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(keyCols.map(col): _*)
              .orderBy(col("__old"), col(ordCol).desc)))
          .filter(col("__rn") === 1 && !col(deleteCol))
          .drop("__rn", "__old", deleteCol)
        // materialize BEFORE the overwrite — the plan reads the very
        // files the write replaces
        merged.localCheckpoint(true).write.mode("overwrite").parquet(storePath)
        ()
    }

  /** Streaming corpus ingestion with dedup against EVERYTHING seen so
    * far — the unbounded-horizon complement of [[dedup]] (whose state
    * ages out with the watermark). Each micro-batch anti-joins its
    * content digests against a persistent digest store (the streaming
    * form of `Corpus.incrementalSurvivors`), collapses within-batch
    * clones to the min id, appends survivors to `outPath` and their
    * digests to `storePath`. The store holds 192-bit digests only —
    * ~40 bytes/document, so a 10¹⁰-document corpus keeps state in
    * ~400 GB of parquet, not in the executor state store.
    * foreachBatch is at-least-once on restart; pair with batch-id
    * idempotent sinks (or overwrite-by-batch partitioning) when the
    * output must be exactly-once.
    */
  def incrementalDedupSink(docs: DataFrame, idCol: String, contentCol: String,
                           storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val keyed = batch.select(col(idCol), col(contentCol),
          xxhash64(col(contentCol)).as("__h1"), md5(col(contentCol)).as("__h2"))
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val seen =
          if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            spark.read.parquet(storePath)
          else keyed.select("__h1", "__h2").limit(0)
        val survivors = keyed
          .join(seen, Seq("__h1", "__h2"), "left_anti")
          .withColumn("__rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("__h1", "__h2").orderBy(idCol)))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint(true) // two sinks below — compute once
        survivors.select(col(idCol), col(contentCol))
          .write.mode("append").parquet(outPath)
        survivors.select("__h1", "__h2").write.mode("append").parquet(storePath)
        ()
    }

  /** Streaming exact-substring SPAN dedup — d18/d20 as a live
    * pipeline: each micro-batch probes the STANDING gram-digest
    * index (16-byte 128-bit keys, the round-8 wire format), writes
    * per-document removal profiles to `outPath`, and appends its own
    * distinct new gram digests to `storePath`. History always wins
    * (d20's contract); work per batch is O(batch chars) probing the
    * index — never a rescan of history text, which this sink never
    * even retains (the store holds DIGESTS only: ~16 bytes per
    * distinct gram, and the full corpus text can be discarded or
    * archived cold).
    *
    * Replay-safe: foreachBatch is at-least-once on restart, and the
    * store append commits independently of the streaming offset
    * commit — so both writes are BATCH-ID-ADDRESSED
    * (`<path>/batch=<id>`, overwritten whole). A replayed batch
    * builds its probe index ONLY from subdirs with batch id < its
    * own, i.e. exactly the pre-batch index: it recomputes the same
    * profiles the first attempt produced (never "everything is a
    * duplicate of my own first attempt") and rewrites its own
    * subdirs byte-equivalent instead of appending second copies —
    * exactly-once output without any external pairing. Readers of
    * `outPath`/`storePath` see a `batch` partition column.
    */
  def spanDedupSink(docs: DataFrame, idCol: String, textCol: String,
                    storePath: String, outPath: String, k: Int = 40)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        spanDedupBatch(batch, batchId, idCol, textCol, storePath, outPath, k)
    }

  /** One micro-batch of [[spanDedupSink]]; package-visible so specs can
    * drive a replay (same batch id twice) without a streaming harness. */
  private[graft] def spanDedupBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String,
      storePath: String, outPath: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val batchGrams = graft.operators.Dedup
      .spanGramOccurrences(batch, idCol, textCol, k)
      .select("g").distinct()
    // probe index = union of STRICTLY-PRIOR batch subdirs; a replayed
    // batch therefore probes exactly the index that existed before its
    // first attempt, not its own first attempt's grams
    val storeRoot = new org.apache.hadoop.fs.Path(storePath)
    val priorDirs =
      if (fs.exists(storeRoot))
        fs.listStatus(storeRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("batch="))
          .filter(_.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.toString)
      else Seq.empty[String]
    val seen =
      if (priorDirs.nonEmpty) spark.read.parquet(priorDirs: _*)
      else batchGrams.limit(0)
    val out = graft.operators.Dedup
      .spanDedupAgainstIndex(seen, batch, idCol, textCol, k)
      .localCheckpoint(true)
    // guard empty writes: a parquet dir holding only _SUCCESS (no
    // part files) breaks schema inference on later reads — an
    // all-short-doc or empty micro-batch would poison the query
    if (!out.isEmpty)
      out.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    // store stays distinct across batches: this batch contributes only
    // digests absent from every prior batch's subdir
    val newGrams = batchGrams.join(seen, Seq("g"), "left_anti")
      .localCheckpoint(true)
    if (!newGrams.isEmpty)
      newGrams.write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    ()
  }

  /** Streaming TOKEN-BUDGET admission — c10's recipe composition as a
    * live pipeline: documents arrive in micro-batches and each source
    * admits until its token budget fills, then drops everything after
    * (the live data-recipe gate: "stop taking web tokens once the run
    * has its 200B"). Admission order is ARRIVAL order across batches
    * (a stream cannot reorder history) and the c10 md5 order within a
    * batch, so a one-batch stream is EXACTLY the batch operator.
    * Standing state is one row per source (tokens admitted so far) —
    * O(sources), not O(docs); a batch's work is one bounded window
    * over the batch plus a broadcast-sized join against the totals.
    *
    * Replay-safe like [[spanDedupSink]]: both writes are
    * batch-id-addressed (`<path>/batch=<id>`, whole-subdir
    * overwrite); a replayed batch reads only strictly-prior totals —
    * exactly the state before its first attempt — and rewrites its
    * subdirs byte-equivalent. Exactly-once without external pairing.
    */
  def budgetAdmitSink(docs: DataFrame, idCol: String, textCol: String,
                      srcCol: String, budgets: Map[String, Long],
                      defaultBudget: Long, storePath: String, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        budgetAdmitBatch(batch, batchId, idCol, textCol, srcCol,
          budgets, defaultBudget, storePath, outPath)
    }

  /** One micro-batch of [[budgetAdmitSink]]; package-visible so specs
    * can drive a replay without a streaming harness. */
  private[graft] def budgetAdmitBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, srcCol: String,
      budgets: Map[String, Long], defaultBudget: Long,
      storePath: String, outPath: String): Unit = {
    val spark = batch.sparkSession
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val storeRoot = new org.apache.hadoop.fs.Path(storePath)
    val priorDirs =
      if (fs.exists(storeRoot))
        fs.listStatus(storeRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("batch="))
          .filter(_.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.toString)
      else Seq.empty[String]
    val prior =
      if (priorDirs.nonEmpty)
        spark.read.parquet(priorDirs: _*)
          .groupBy("src").agg(sum("admitted_tokens").as("prior_tokens"))
      else spark.range(0).select(lit("").as("src"), lit(0L).as("prior_tokens"))
    val bcol = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col("src") === k, lit(v)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("src")
      .orderBy(col("hk"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val admitted = batch
      .select(col(idCol).as("doc_id"), col(srcCol).as("src"),
        size(filter(split(col(textCol), " "), t => t =!= ""))
          .cast("long").as("n_tokens"))
      .withColumn("hk",
        expr("conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)").cast("long"))
      .withColumn("cum", sum("n_tokens").over(w))
      .join(broadcast(prior), Seq("src"), "left")
      .na.fill(0L, Seq("prior_tokens"))
      .withColumn("__budget", bcol)
      .filter(col("prior_tokens") + col("cum") - col("n_tokens") < col("__budget"))
      .select(col("doc_id"), col("src"), col("n_tokens"),
        (col("prior_tokens") + col("cum")).as("cum_tokens"))
      .localCheckpoint(true) // two sinks below — compute once
    if (!admitted.isEmpty)
      admitted.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
    val deltas = admitted.groupBy("src")
      .agg(sum("n_tokens").as("admitted_tokens"))
    if (!deltas.isEmpty)
      deltas.write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    ()
  }

  /** Streaming ANN append sink — s12's frozen-quantizer append as a
    * live pipeline, the vector-store complement of [[spanDedupSink]]:
    * each micro-batch's vectors are assigned to their nearest
    * STANDING cell (coarse quantizer trained on `base` once, frozen —
    * the production append posture; O(batch × nCells) work, zero base
    * touches, no retrain) and landed cell-partitioned under
    * `storePath/batch=<id>` (whole-subdir overwrite: a replayed batch
    * rewrites itself byte-equivalent — exactly-once without external
    * pairing). The live index is base ∪ store; [[readIvfStore]]
    * reconstitutes the appended half for querying through
    * [[graft.operators.Similarity.knnIvfIncremental]], and the
    * cell partition column gives a cell-probing reader file pruning
    * for free.
    */
  def ivfAppendSink(vecs: DataFrame, idCol: String, vecCol: String,
                    base: DataFrame, storePath: String,
                    nCells: Int = 16, lloydIters: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ivfAppendBatch(batch, batchId, idCol, vecCol, base, storePath,
          nCells, lloydIters)
    }

  /** One micro-batch of [[ivfAppendSink]]; package-visible so specs
    * can drive a replay without a streaming harness. */
  private[graft] def ivfAppendBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, base: DataFrame, storePath: String,
      nCells: Int, lloydIters: Int): Unit = {
    val assigned = graft.operators.Similarity
      .assignToStandingCells(base, batch, idCol, vecCol, nCells, lloydIters)
    // empty-batch guard: same poisoned-_SUCCESS-dir rationale as
    // [[spanDedupBatch]]
    if (!assigned.isEmpty)
      assigned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$storePath/batch=$batchId")
    ()
  }

  /** STREAMING BM25 POSTINGS sink (round 12) — the lexical-index
    * analogue of [[ivfAppendSink]]: each micro-batch of documents is
    * scored against FROZEN corpus statistics
    * ([[graft.operators.Retrieval.Bm25Stats]] — the incremental-BM25
    * contract: idf and avgdl pinned to the standing snapshot, exactly
    * [[graft.operators.Retrieval.bm25AppendPostings]]'s arithmetic)
    * and written as a batch-id-addressed posting segment. Replay of a
    * batch id OVERWRITES its own segment only (crash-restart
    * idempotence); per-token caps bind per segment the same way the
    * batch operator caps them — the segment merge at query time is a
    * union, never a re-sort of a hot token's full list. */
  def bm25PostingsSink(docs: DataFrame, idCol: String, textCol: String,
                       stats: graft.operators.Retrieval.Bm25Stats,
                       storePath: String, maxDfPct: Int = 90, cap: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        bm25PostingsBatch(batch, batchId, idCol, textCol, stats,
          storePath, maxDfPct, cap)
    }

  /** One micro-batch of [[bm25PostingsSink]]; package-visible so
    * specs can drive a replay without a streaming harness. */
  private[graft] def bm25PostingsBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String,
      stats: graft.operators.Retrieval.Bm25Stats, storePath: String,
      maxDfPct: Int, cap: Int): Unit = {
    val postings = graft.operators.Retrieval
      .bm25AppendPostings(stats, batch, idCol, textCol, maxDfPct, cap)
    // empty-batch guard: same poisoned-_SUCCESS-dir rationale as
    // [[spanDedupBatch]]
    if (!postings.isEmpty)
      postings.write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    ()
  }

  /** The appended vectors a [[ivfAppendSink]] store currently holds,
    * as `(idCol, vecCol)` — the `batch` argument for a
    * [[graft.operators.Similarity.knnIvfIncremental]] query over
    * base ∪ store. */
  def readIvfStore(spark: SparkSession, storePath: String,
                   idCol: String, vecCol: String): DataFrame =
    spark.read.parquet(storePath)
      .select(col("cid").as(idCol), col("cv").as(vecCol))

  /** [[ivfAppendSink]] re-landed on the TABLE FORMAT (round 10): each
    * micro-batch's cell-assigned vectors become a
    * [[graft.sources.VersionedTable]] APPEND COMMIT — cell-clustered
    * files with per-file `cell` stats — so the streaming vector store
    * gains everything the bespoke batch-subdir convention never had:
    * SNAPSHOT ISOLATION (a query pins a version; concurrent appends
    * can't shift its candidate set mid-query), TIME TRAVEL (query the
    * index as of any committed batch), metadata-only row counts,
    * OPTIMIZE/compaction under OCC, and manifest stats pruning for
    * cell-probing readers (the probed cells' files are selected from
    * ONE metadata read — no partition-dir listing). Exactly-once by
    * the same `#batch` watermark as [[versionedCommitSink]]: a
    * replayed batch sees `batchId <= lastBatchId` and skips —
    * byte-equivalent table either way. */
  def ivfAppendVtSink(vecs: DataFrame, idCol: String, vecCol: String,
                      base: DataFrame, tableRoot: String,
                      nCells: Int = 16, lloydIters: Int = 0)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        ivfAppendVtBatch(batch, batchId, idCol, vecCol, base, tableRoot,
          nCells, lloydIters)
    }

  /** One micro-batch of [[ivfAppendVtSink]]; package-visible so specs
    * can drive a replay without a streaming harness. */
  private[graft] def ivfAppendVtBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String, base: DataFrame, tableRoot: String,
      nCells: Int, lloydIters: Int): Unit = {
    import graft.sources.VersionedTable
    if (batchId <= VersionedTable.lastBatchId(batch.sparkSession, tableRoot))
      return // replayed batch — already committed, skip
    val assigned = graft.operators.Similarity
      .assignToStandingCells(base, batch, idCol, vecCol, nCells, lloydIters)
    if (!assigned.isEmpty) {
      // RANGE-cluster the commit's files by cell — ~one file per cell
      // with a tight [min,max] — so a cell-probing reader prunes to
      // the probed cells' files from the manifest alone (hash
      // partitioning would scatter cells across files and make every
      // per-file range span the whole domain, killing the prune)
      VersionedTable.commit(
        assigned.repartitionByRange(nCells, col("cell"))
          .sortWithinPartitions("cell"),
        tableRoot, mode = "append",
        meta = Map("batch" -> batchId.toString), statsCols = Seq("cell"))
      ()
    }
  }

  /** The appended vectors an [[ivfAppendVtSink]] table holds at the
    * given (or latest) version, as `(idCol, vecCol)` — the `batch`
    * argument for [[graft.operators.Similarity.knnIvfIncremental]].
    * Passing an explicit version is the time-travel query path; the
    * snapshot pin means a concurrent append NEVER shifts this
    * reader's rows. */
  def readIvfVtStore(spark: SparkSession, tableRoot: String,
                     idCol: String, vecCol: String,
                     version: Long = -1L): DataFrame =
    graft.sources.VersionedTable.read(spark, tableRoot, version)
      .select(col("cid").as(idCol), col("cv").as(vecCol))

  /** Follow a [[graft.sources.VersionedTable]] as a STREAM — the
    * table-format streaming-read/CDC posture: each micro-batch
    * compares the table's current version against the highest version
    * already delivered and lands that delta
    * ([[graft.sources.VersionedTable.changesBetween]]: inserts +
    * row-exact DV deletes, `_change_type` tagged) under
    * `outPath/batch=<id>`; the first batch delivers the full snapshot
    * as inserts (the standard starting-version semantics). Progress
    * markers are batch-id-addressed under `outPath/_progress` (hidden
    * from plain readers of `outPath` by the underscore convention),
    * so a crash-replayed batch recomputes against the same
    * pre-batch watermark and overwrites itself — every committed
    * version's changes are delivered EXACTLY ONCE. Driven off the
    * rate source (one tick per poll; the table's commit log is the
    * real clock).
    */
  def followVersionedTable(spark: SparkSession, root: String, outPath: String,
                           rowsPerSecond: Int = 1)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()
      .writeStream.outputMode("append").foreachBatch {
        (_: DataFrame, batchId: Long) =>
          tableFollowBatch(spark, root, outPath, batchId)
      }

  /** One poll of [[followVersionedTable]]; package-visible for replay
    * specs. */
  private[graft] def tableFollowBatch(spark: SparkSession, root: String,
      outPath: String, batchId: Long): Unit = {
    import graft.sources.VersionedTable
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val progressRoot = new org.apache.hadoop.fs.Path(s"$outPath/_progress")
    // watermark = highest version delivered by STRICTLY-PRIOR batches
    val last =
      if (!fs.exists(progressRoot)) 0L
      else {
        val dirs = fs.listStatus(progressRoot).toSeq.map(_.getPath)
          .filter(_.getName.startsWith("batch="))
          .filter(_.getName.stripPrefix("batch=").toLong < batchId)
          .map(_.toString)
        if (dirs.isEmpty) 0L
        else spark.read.parquet(dirs: _*)
          .agg(max(col("v"))).head().getLong(0)
      }
    val cur = VersionedTable.currentVersion(spark, root)
    if (cur > last) {
      val changes =
        if (last == 0L) VersionedTable.read(spark, root, cur)
          .withColumn("_change_type", lit("insert"))
        else VersionedTable.changesBetween(spark, root, last, cur)
      if (!changes.isEmpty)
        changes.write.mode("overwrite").parquet(s"$outPath/batch=$batchId")
      spark.range(1).select(lit(cur).as("v"))
        .write.mode("overwrite").parquet(s"$outPath/_progress/batch=$batchId")
    }
    ()
  }

  /** Exactly-once-by-batch-id file sink: foreachBatch is
    * at-least-once on restart (the last uncommitted batch replays),
    * so every foreachBatch pipeline whose output must not duplicate
    * needs an idempotence layer. This one writes each micro-batch to
    * `outPath/batch_id=<id>` with dynamic partition OVERWRITE — a
    * replayed batch id rewrites its own partition byte-for-byte
    * instead of appending a second copy, and readers of `outPath`
    * see exactly-once data whether or not a restart happened. The
    * check is O(1) metadata, no read of prior output; downstream
    * readers get batch-id partition pruning for free.
    */
  def idempotentBatchSink(docs: DataFrame, outPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        // per-write option, NOT session conf: a session-wide
        // partitionOverwriteMode=dynamic would silently change the
        // truncation semantics of every later overwrite in the session
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        ()
    }

  /** Streaming commits into a [[graft.sources.VersionedTable]] — the
    * exactly-once + snapshot-isolation sink: every micro-batch lands
    * as ONE atomic manifest commit (append mode, `#batch=<id>`
    * metadata), so a reader NEVER sees a half-written batch (it pins
    * the previous manifest until the commit rename lands) and a
    * replayed batch after a crash-restart is skipped by the batch-id
    * watermark in the current manifest — exactly-once output on top
    * of foreachBatch's at-least-once replay, without rewriting any
    * prior data (contrast [[idempotentBatchSink]], which relies on
    * partition overwrite). Batch ids stay monotone because each
    * commit carries the previous manifest forward; since round 15 the
    * `#batch` watermark ALSO carries through non-streaming commits
    * (compact/OPTIMIZE/batch INSERT — commitCore carries it like the
    * clustering table property), so interleaved maintenance no longer
    * resets it. The first-class sink is `writeStream.toTable`
    * ([[org.apache.spark.sql.graftbridge.GraftStreamingWrite]]); this
    * foreachBatch form remains the arbitrary-transform escape hatch.
    */
  def versionedCommitSink(docs: DataFrame, root: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        // round 16: the watermark is keyed PER QUERY like the
        // first-class sink's (`batch.<queryId>`), so a fresh
        // checkpoint (batch ids restarting at 0) appends instead of
        // being muted by a previous query's table-global watermark.
        // foreachBatch runs on the stream-execution thread, where the
        // engine publishes the query id as a local property; absent
        // (unit-test direct calls), fall back to the legacy bare key.
        val qid = Option(batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId"))
          .map(_.replaceAll("[=\\n\\r\\t ]", "-"))
        val key = qid.map(q => s"batch.$q").getOrElse("batch")
        if (batchId > graft.sources.VersionedTable.lastBatchId(
            batch.sparkSession, root, qid.orNull)) {
          graft.sources.VersionedTable.commit(batch, root, mode = "append",
            meta = Map(key -> batchId.toString))
          ()
        } else () // replayed batch — already committed by THIS query, skip
    }

  /** Streaming data-quality monitoring — run an expectation suite
    * ([[graft.operators.Quality]]) over every micro-batch and APPEND
    * the per-rule violations report, tagged with the batch id, to a
    * metrics table. The quality history is itself queryable data
    * (alert on n_violations > 0, trend null rates over time); each
    * batch's audit is a handful of one-pass aggregates over that
    * batch only. Append-only + batch id ⇒ an at-least-once replay is
    * detectable downstream (duplicate batch_id rows) rather than
    * silently double-counted.
    */
  def qualityMonitorSink(docs: DataFrame,
                         checks: DataFrame => Seq[DataFrame],
                         metricsPath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        graft.operators.Quality.audit(checks(batch))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(metricsPath)
        ()
    }

  /** Streaming connected-components maintenance — the incremental
    * graph story: each micro-batch of edges merges into a persistent
    * (node, component) labeling via [[graft.graph.GraphOps
    * .incrementalCC]], whose work is O(batch) + CC over the
    * contracted (component-level) graph — the accumulated edge set is
    * never rescanned. Labels are min-node-id per component, identical
    * to batch CC over every edge ever seen. foreachBatch is
    * at-least-once on restart; re-merging a replayed edge batch is a
    * no-op on the labeling (components already merged stay merged) —
    * the idempotence that makes this sink safe without a batch-id
    * watermark.
    */
  def incrementalCCSink(edges: DataFrame, storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    edges.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // resolve the filesystem FROM the store path (not fs.defaultFS):
        // a local/object-store path on an HDFS-default cluster must
        // probe its own scheme or the store silently re-initializes
        val fs = new org.apache.hadoop.fs.Path(storePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val labels =
          if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            spark.read.parquet(storePath)
          else batch.sparkSession.emptyDataFrame
            .select(lit(0L).as("node"), lit(0L).as("component")).limit(0)
        val updated = graft.graph.GraphOps.incrementalCC(labels, batch)
        // materialize BEFORE the overwrite — the plan reads the very
        // files the write replaces
        updated.localCheckpoint(true).write.mode("overwrite").parquet(storePath)
        ()
    }

  /** Streaming count-min-sketch maintenance — corpus-wide token
    * frequencies over the WHOLE stream history at constant state.
    * CMS is a LINEAR sketch: the sketch of a union is the cell-wise
    * sum of the parts' sketches, so each micro-batch builds its own
    * depth×width cell table ([[graft.operators.TextAnalysis.cmsCells]],
    * md5-affine hashes — bit-reproducible across batches and engines)
    * and merges it into the persistent store with one grouped sum
    * over ≤ 2·depth·width rows. The store answers any-time frequency
    * queries (est = min over rows j of cell[(j, hash_j(tok))], always
    * ≥ the true count) no matter how many tokens have streamed by.
    * foreachBatch is at-least-once on restart; re-merging a replayed
    * batch can only over-count — the CMS upper-bound contract
    * survives.
    */
  def cmsSink(docs: DataFrame, textCol: String, depth: Int, width: Int,
              storePath: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val cells = graft.operators.TextAnalysis.cmsCells(batch, textCol, depth, width)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
            cells.unionByName(spark.read.parquet(storePath))
              .groupBy("j", "cell").agg(sum("cnt").as("cnt"))
          else cells
        // materialize BEFORE the overwrite — the plan reads the very
        // files the write replaces
        merged.localCheckpoint(true).write.mode("overwrite").parquet(storePath)
        ()
    }
}
