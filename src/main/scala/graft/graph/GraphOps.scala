package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Ckpt

/** Overlap-graph construction and reduction operators — the SORA core
  * (BioHPC/SORA; the reference mount is empty, so semantics follow the
  * published string-graph literature: overlap join, Myers' transitive
  * reduction, tip clipping, bubble removal, unitig/chain compression),
  * re-expressed as declarative DataFrame plans instead of the
  * original GraphX/Pregel formulation.
  *
  * All reduction operators take an edge table with `src: long,
  * dst: long` columns. Every step is an equi-join/aggregate on src or
  * dst, so at cluster scale each round is one hash shuffle; iterative
  * loops run through [[iterate]]/[[iterateToFixpoint]] — one shared
  * primitive that cuts lineage per round ([[graft.Ckpt]]: reliable
  * checkpoint when configured, localCheckpoint in local mode) and
  * folds the convergence check into a cheap scan of the just-
  * checkpointed frame (2 Spark jobs per round, never a separate
  * re-derivation join).
  */
object GraphOps {

  // ---------------------------------------------------------------- iteration

  /** Generic bounded iteration with fused convergence: `step` maps the
    * current frame to the next one PLUS an integer `__changed` column
    * (1 where the row differs from the previous round). Each round is
    * ONE job: the convergence sum rides the checkpoint materialization
    * itself as an `observe` metric (`CollectMetrics` accumulates
    * during the same action that writes the checkpoint — no second
    * scan, no second job). If the metric hasn't surfaced within the
    * wait bound (the listener is asynchronous), a fallback scan of the
    * just-checkpointed blocks recovers it — never a wrong answer,
    * at worst the old 2-job round. Stops when no row changed or
    * `maxRounds` is hit. Round N−1's checkpoint storage is released
    * ([[Ckpt.release]]) as soon as round N has materialized, so a
    * long loop holds at most two rounds of state.
    */
  def iterate(init: DataFrame, maxRounds: Int)(step: DataFrame => DataFrame): DataFrame =
    iterateCore(init, maxRounds)(step)._1

  /** Raised by [[iterateCertified]] when the safety cap is hit while
    * rows are still changing — the loud dual of [[iterate]]'s silent
    * bounded stop (whose bound is often SEMANTIC, e.g. bfs depth). */
  final class NotConvergedException(msg: String) extends RuntimeException(msg)

  /** Convergence-CERTIFIED iteration: identical loop to [[iterate]],
    * but `maxRounds` is a pure safety cap, not a semantic bound —
    * hitting it while the fused `__changed` count is still nonzero
    * throws [[NotConvergedException]] instead of returning a silently
    * truncated frame. Use for fixpoint semantics (full reachability /
    * shortest paths / layering) where a 100× diameter must surface as
    * a failure, never as plausible-but-wrong output. Same convention
    * as [[scc]]'s visible `scc = −1` marker, for operators whose
    * output schema has no room for a marker row.
    */
  def iterateCertified(init: DataFrame, maxRounds: Int)(step: DataFrame => DataFrame): DataFrame = {
    val (out, converged) = iterateCore(init, maxRounds)(step)
    if (!converged) throw new NotConvergedException(
      s"iteration still changing after $maxRounds rounds (safety cap); " +
        "raise the cap or use the bounded variant if truncation is intended")
    out
  }

  private def iterateCore(init: DataFrame, maxRounds: Int)
                         (step: DataFrame => DataFrame): (DataFrame, Boolean) = {
    var curCut = Ckpt.cut(init) // the checkpoint leaf itself — release() needs it
    var cur = curCut
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      round += 1
      val obs = org.apache.spark.sql.Observation()
      val nextCut = Ckpt.cut(step(cur)
        .observe(obs, coalesce(sum(col("__changed")), lit(0L)).as("c")))
      val changed = awaitObserved(obs).getOrElse(
        nextCut.agg(coalesce(sum(col("__changed")), lit(0L))).first().getLong(0))
      Ckpt.release(curCut)
      curCut = nextCut
      cur = nextCut.drop("__changed")
      done = changed == 0
    }
    (cur, done)
  }

  /** Poll an [[org.apache.spark.sql.Observation]] whose observed query
    * has already executed eagerly; the completion listener is async,
    * so allow a short grace period before falling back. */
  private def awaitObserved(obs: org.apache.spark.sql.Observation,
                            timeoutMs: Long = 2000): Option[Long] = {
    val deadline = System.nanoTime + timeoutMs * 1000000L
    while (System.nanoTime < deadline) {
      val m = org.apache.spark.sql.graftbridge.ObservationBridge.getOrEmpty(obs)
      if (m.nonEmpty) return Some(m("c") match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
        case other => other.toString.toLong
      })
      Thread.sleep(2)
    }
    None
  }

  /** MONOTONE iteration (r16 optimization round) for relaxation-shaped
    * fixpoints (bfs / sssp / topo layering / min-label): the state is
    * a 2-column (key, value) frame where every `hop` application (a)
    * only ever ADDS keys and (b) moves each key's value monotonically
    * in one direction. Two structural savings over [[iterate]]:
    *
    *  - `stepsPerRound` hops compose lazily into ONE checkpointed job
    *    per round: total relax-join count is unchanged (the
    *    fundamentally required passes), but checkpoint
    *    materializations, convergence checks, and per-job scheduling
    *    shrink by the factor — at 100 TB each avoided checkpoint is a
    *    full pass of the state table to the checkpoint filesystem, and
    *    in the sf0.1 bench the per-round fixed cost dominates the
    *    whole query (measured: g16_sssp ran ~100 jobs of ~60 ms fixed
    *    cost for 17 s of summed task time).
    *  - convergence needs NO per-round changed-join: under (a)+(b) the
    *    state changed iff (row count, Σ value) changed, so both ride
    *    the checkpoint materialization as observe metrics and are
    *    compared against the previous round — the changed-computing
    *    left join (one more exchange per round) disappears. Values
    *    are summed as DECIMAL(38,0): exact, overflow-free at any
    *    scale, so metric equality is a PROOF of convergence, not a
    *    heuristic (the monotonicity argument: a value move strictly
    *    moves the sum; a new key strictly moves the count).
    *
    * `maxSteps` bounds TOTAL hop applications exactly (the final
    * round applies `maxSteps mod stepsPerRound` hops), so bounded
    * semantics like bfs's maxDepth are preserved hop-for-hop.
    * Returns (state, converged).
    */
  private def iterateMonotoneCore(init: DataFrame, maxSteps: Int,
                                  stepsPerRound: Int)
                                 (hop: DataFrame => DataFrame): (DataFrame, Boolean) = {
    val keyCol = init.columns(0)
    val valueCol = init.columns(1)
    // r17 guard (VERDICT r16 what's-wrong #1): the (count, Σ value)
    // convergence proof sums values as DECIMAL(38,0), which is EXACT
    // only for integral/decimal value types. A fractional value column
    // (e.g. a public sssp caller with double weights — the hop's `+ w`
    // widens the integral init) can move a value without moving the
    // per-value-rounded sum, declaring convergence early and returning
    // wrong values. The hop's OUTPUT type is what matters (init is
    // integral even when weights are not), checked plan-only. Such
    // callers fall back to the changed-computing left-join loop: one
    // more exchange per round, but correct for every value type.
    val exactSum = {
      import org.apache.spark.sql.types._
      hop(init).schema(valueCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             _: DecimalType => true
        case _ => false
      }
    }
    if (!exactSum)
      return iterateCore(init.withColumn("__changed", lit(1L)), maxSteps) { c =>
        val cur = c.select(keyCol, valueCol)
        val nxt = hop(cur)
        nxt.join(cur.select(col(keyCol), col(valueCol).as("__pv")),
            Seq(keyCol), "left")
          .withColumn("__changed",
            when(col(valueCol) <=> col("__pv"), 0L).otherwise(1L))
          .drop("__pv")
      }
    def observed(df: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame =
      df.observe(obs, count(lit(1)).as("n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"))
    def metricsOf(obs: org.apache.spark.sql.Observation,
                  cut: DataFrame): (Long, String) =
      awaitObservedPair(obs).getOrElse {
        val r = cut.agg(count(lit(1)),
          sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).first()
        (r.getLong(0), String.valueOf(r.get(1)))
      }
    val obs0 = org.apache.spark.sql.Observation()
    var curCut = Ckpt.cut(observed(init, obs0))
    var prev = metricsOf(obs0, curCut)
    var used = 0
    var done = false
    while (!done && used < maxSteps) {
      val s = math.min(stepsPerRound, maxSteps - used)
      used += s
      var nxt: DataFrame = curCut
      for (_ <- 1 to s) nxt = hop(nxt)
      val obs = org.apache.spark.sql.Observation()
      val nextCut = Ckpt.cut(observed(nxt, obs))
      val cur = metricsOf(obs, nextCut)
      done = cur == prev
      prev = cur
      Ckpt.release(curCut)
      curCut = nextCut
    }
    (curCut, done)
  }

  /** [[awaitObserved]] for the (n, s) metric pair; the decimal sum is
    * normalized to a string so null/scale differences cannot produce
    * a spurious inequality. */
  private def awaitObservedPair(obs: org.apache.spark.sql.Observation,
                                timeoutMs: Long = 2000): Option[(Long, String)] = {
    val deadline = System.nanoTime + timeoutMs * 1000000L
    while (System.nanoTime < deadline) {
      val m = org.apache.spark.sql.graftbridge.ObservationBridge.getOrEmpty(obs)
      if (m.nonEmpty) {
        val n = m("n") match {
          case l: java.lang.Long => l.longValue()
          case i: java.lang.Integer => i.longValue()
          case other => other.toString.toLong
        }
        return Some((n, String.valueOf(m("s"))))
      }
      Thread.sleep(2)
    }
    None
  }

  /** Bounded iteration for monotonically shrinking frames (e.g.
    * repeated pruning): converges when the row count stops moving.
    * The count rides the checkpoint materialization itself as an
    * `observe` metric — the same single-action-per-round structure as
    * [[iterate]]; the fallback count() job only fires if the async
    * metric hasn't surfaced in time (never a wrong answer).
    */
  def iterateToFixpoint(init: DataFrame, maxRounds: Int)(step: DataFrame => DataFrame): DataFrame = {
    def cutCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val cut = Ckpt.cut(df.observe(obs, count(lit(1)).as("c")))
      (cut, awaitObserved(obs).getOrElse(cut.count()))
    }
    var (cur, n) = cutCounted(init)
    var prev = -1L
    var round = 0
    while (n != prev && round < maxRounds) {
      round += 1
      prev = n
      val (next, m) = cutCounted(step(cur))
      n = m
      Ckpt.release(cur)
      cur = next
    }
    cur
  }

  // ------------------------------------------------------------ construction

  /** Overlap-graph construction from reads — the assembler's stage 1,
    * seed-and-extend formulation. Emits an edge (src, dst, overlap)
    * when the `overlap`-length suffix of read `src` equals the
    * same-length prefix of read `dst`, for overlap in
    * [minOverlap, maxOverlap], keeping the maximum overlap per pair.
    *
    * Scale shape (W = maxOverlap − minOverlap + 1, k = minOverlap):
    * the join anchors on the fixed k-length prefix only. The prefix
    * side shuffles ONE row per read (anchor + the (W−1)-char tail
    * needed for verification); the suffix side shuffles W fixed-width
    * rows per read (k-char anchor at each candidate end position + a
    * ≤(W−1)-char tail) — NOT W variable-width strings up to the full
    * read length per side, which is what the naive per-length
    * formulation costs. Verification (the part of the overlap beyond
    * the anchor) is fused into the join condition — tail-vs-tail
    * substring equality on the already-carried columns — so there is
    * no second pass and no extra shuffle; a length-v overlap exists
    * iff its k-anchor matches AND the remaining v−k chars match.
    *
    * Low-complexity anchors (poly-A runs etc.) are capped in-operator:
    * both sides run through [[graft.operators.Dedup.capBuckets]] on
    * the anchor key (`anchorCap` rows per bucket, deterministic
    * smallest-id-first; 0 disables). The window hash-partitions on the
    * join key, so the cap reuses the join's exchange. A capped anchor
    * loses candidate pairs beyond the cap — the standard degenerate-
    * input guard, same recall trade as the LSH bucket caps.
    */
  def overlapEdges(reads: DataFrame, idCol: String, seqCol: String,
                   minOverlap: Int, maxOverlap: Int,
                   anchorCap: Int = 10000): DataFrame = {
    val k = minOverlap
    val r = reads.select(col(idCol).as("id"), col(seqCol).as("seq"))
    val pfxRaw = r.filter(length(col("seq")) >= k)
      .select(col("id"),
        expr(s"substring(seq, 1, $k)").as("anchor"),
        expr(s"substring(seq, ${k + 1}, ${maxOverlap - k})").as("btail"))
    val sfxRaw = r.select(col("id"), col("seq"),
        explode(expr(s"sequence($minOverlap, $maxOverlap)")).as("v"))
      .filter(length(col("seq")) >= col("v"))
      .select(col("id"), col("v"),
        expr(s"substring(seq, length(seq) - v + 1, $k)").as("anchor"),
        expr(s"substring(seq, length(seq) - v + 1 + $k, v - $k)").as("atail"))
    val pfx = graft.operators.Dedup.capBuckets(pfxRaw, Seq("anchor"), "id", anchorCap)
    val sfx = graft.operators.Dedup.capBuckets(
        sfxRaw.withColumn("__ord", col("id") * (maxOverlap + 1) + col("v")),
        Seq("anchor"), "__ord", anchorCap)
      .drop("__ord")
    sfx.as("a").join(pfx.as("b"),
        col("a.anchor") === col("b.anchor") && col("a.id") =!= col("b.id")
          && col("a.atail") === expr(s"substring(b.btail, 1, a.v - $k)"))
      .groupBy(col("a.id").as("src"), col("b.id").as("dst"))
      .agg(max(col("a.v")).as("overlap"))
  }

  /** Double-strand overlap construction — real sequencing reads
    * overlap in both orientations, so each read participates as
    * itself (strand '+') and as its reverse complement (strand '-',
    * via [[graft.sources.SequenceSources.reverseComplement]]). Emits
    * the bidirected overlap graph: (src, src_strand, dst, dst_strand,
    * overlap) whenever the overlap-length suffix of the src
    * orientation equals the same-length prefix of the dst orientation,
    * max overlap per oriented pair, self-pairs (same underlying read,
    * either orientation) excluded. Same seed-and-extend shuffle shape
    * and hot-anchor cap as [[overlapEdges]] — the oriented input is 2
    * rows per read, so every cost bound doubles and nothing else
    * changes.
    */
  def overlapEdgesRC(reads: DataFrame, idCol: String, seqCol: String,
                     minOverlap: Int, maxOverlap: Int,
                     anchorCap: Int = 10000): DataFrame = {
    val k = minOverlap
    val base = reads.select(col(idCol).as("id"), col(seqCol).as("seq"))
    val r = base.select(col("id"), lit("+").as("strand"), col("seq"))
      .union(base.select(col("id"), lit("-").as("strand"),
        graft.sources.SequenceSources.reverseComplement(col("seq"))))
    val pfxRaw = r.filter(length(col("seq")) >= k)
      .select(col("id").as("bid"), col("strand").as("bstrand"),
        expr(s"substring(seq, 1, $k)").as("anchor"),
        expr(s"substring(seq, ${k + 1}, ${maxOverlap - k})").as("btail"),
        (col("id") * 2 + when(col("strand") === "-", 1).otherwise(0)).as("__ord"))
    val sfxRaw = r.select(col("id").as("aid"), col("strand").as("astrand"), col("seq"),
        explode(expr(s"sequence($minOverlap, $maxOverlap)")).as("v"))
      .filter(length(col("seq")) >= col("v"))
      .select(col("aid"), col("astrand"), col("v"),
        expr(s"substring(seq, length(seq) - v + 1, $k)").as("anchor"),
        expr(s"substring(seq, length(seq) - v + 1 + $k, v - $k)").as("atail"),
        ((col("aid") * 2 + when(col("astrand") === "-", 1).otherwise(0))
          * (maxOverlap + 1) + col("v")).as("__ord"))
    val pfx = graft.operators.Dedup.capBuckets(pfxRaw, Seq("anchor"), "__ord", anchorCap)
      .drop("__ord")
    val sfx = graft.operators.Dedup.capBuckets(sfxRaw, Seq("anchor"), "__ord", anchorCap)
      .drop("__ord")
    sfx.as("a").join(pfx.as("b"),
        col("a.anchor") === col("b.anchor") && col("a.aid") =!= col("b.bid")
          && col("a.atail") === expr(s"substring(b.btail, 1, a.v - $k)"))
      .groupBy(col("a.aid").as("src"), col("a.astrand").as("src_strand"),
        col("b.bid").as("dst"), col("b.bstrand").as("dst_strand"))
      .agg(max(col("a.v")).as("overlap"))
  }

  // ---------------------------------------------------------------- topology

  /** Distinct vertices appearing in the edge table. */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()

  /** Per-vertex out/in degree (0 when absent on one side). */
  def degrees(edges: DataFrame): DataFrame = {
    val out = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
    val in = edges.groupBy(col("dst").as("node")).agg(count(lit(1)).as("indeg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        coalesce(col("indeg"), lit(0L)).as("indeg"))
  }

  /** Myers string-graph transitive reduction: drop edge (u,v) when a
    * two-hop path u→w→v exists. One join to enumerate 2-paths, one
    * anti-join to subtract — two shuffles total, no iteration.
    */
  def transitiveReduction(edges: DataFrame): DataFrame = {
    val e = Ckpt.cutLight(edges.select("src", "dst")) // scanned 3×
    val e2 = e.select(col("src").as("mid"), col("dst"))
    val paths = e.select(col("src"), col("dst").as("mid"))
      .join(e2, Seq("mid")).select("src", "dst")
    e.join(paths, Seq("src", "dst"), "left_anti")
  }

  /** One round of dead-end (tip) pruning: drop every edge whose dst
    * has no outgoing edge. See [[tipClip]] for the bounded fixpoint.
    */
  def tipRemoval(edges: DataFrame): DataFrame =
    edges.join(edges.select(col("src").as("dst")).distinct(), Seq("dst"), "left_semi")
      .select("src", "dst") // semi-join reorders join-key first; restore contract order

  /** Tip clipping to (bounded) fixpoint: repeat [[tipRemoval]] until
    * the edge set stops shrinking or `maxDepth` rounds have run —
    * i.e. clip dead-end paths up to `maxDepth` edges deep. The bound
    * is semantic, not just a safety valve: on an acyclic graph the
    * unbounded fixpoint deletes every edge (every path eventually dies),
    * while assemblers only clip *short* dead ends; `maxDepth` is that
    * threshold.
    */
  def tipClip(edges: DataFrame, maxDepth: Int): DataFrame =
    iterateToFixpoint(edges.select("src", "dst"), maxDepth)(tipRemoval)

  /** Simple-bubble detection: (u, a, b, w) with edges u→a→w and
    * u→b→w, a<b, and a,b interior (indeg=outdeg=1) — the
    * error/heterozygosity pattern string-graph assemblers collapse.
    */
  def bubbles(edges: DataFrame): DataFrame = {
    val e = Ckpt.cutLight(edges.select("src", "dst")) // scanned 4×
    // interior = indeg 1 AND outdeg 1: two direct aggregates + an
    // inner join — [[degrees]]' union + full-outer serves absent-side
    // zeros, which a ==1 filter never selects (r16, as in chainLabels)
    val interior = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("c"))
      .filter(col("c") === 1).select("node")
      .join(e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("c"))
        .filter(col("c") === 1).select("node"), Seq("node"), "left_semi")
    val arm = e.select(col("src").as("u"), col("dst").as("m"))
      .join(interior.withColumnRenamed("node", "m"), Seq("m"))
      .join(e.select(col("src").as("m"), col("dst").as("w")), Seq("m"))
    arm.select(col("u"), col("m").as("a"), col("w"))
      .join(arm.select(col("u"), col("m").as("b"), col("w")), Seq("u", "w"))
      .filter(col("a") < col("b"))
      .select("u", "a", "b", "w")
  }

  /** Bubble removal: for every detected bubble keep the smallest-id
    * arm (deterministic survivor) and drop the other arms' edges
    * (u→arm and arm→w). Detection + one anti-join.
    */
  def bubbleRemoval(edges: DataFrame): DataFrame = {
    val e = Ckpt.cutLight(edges.select("src", "dst"))
    val bub = bubbles(e) // (u, a, b, w): b is always a non-minimal arm
    val rm = bub.select(col("u").as("src"), col("b").as("dst"))
      .union(bub.select(col("b").as("src"), col("w").as("dst")))
      .distinct()
    e.join(rm, Seq("src", "dst"), "left_anti")
  }

  /** The composed end-to-end reduction pipeline — the assembler's
    * whole middle stage as one operator: transitive reduction, then
    * tip clipping to the bounded fixpoint, then bubble removal. Feed
    * it [[overlapEdges]] output; run [[unitigs]] /
    * [[unitigSequences]] on the result for the final contigs. Each
    * stage is the operator documented above; composition adds no
    * extra shuffles beyond their own.
    */
  def reducePipeline(edges: DataFrame, tipDepth: Int): DataFrame =
    bubbleRemoval(tipClip(transitiveReduction(edges), tipDepth))

  // ------------------------------------------------------------- compression

  /** Chain labels: for every vertex of every maximal in/out-degree-1
    * chain, its chain head and its distance (in edges) from that head.
    * Pointer jumping — label(v) := label(label(v)), dist(v) := dist(v)
    * + dist(label(v)) — O(log chain-length) rounds, one self-join
    * shuffle each, convergence fused into the round's action.
    */
  def chainLabels(edges: DataFrame): DataFrame = {
    // Restrict to chain edges: src has outdeg 1 and dst has indeg 1.
    // The two degree filters are computed DIRECTLY (one aggregate
    // each) rather than through [[degrees]] — its union + full-outer
    // join exist to serve absent-side zeros, which a ==1 filter can
    // never select, so routing through it cost two extra exchanges
    // per call (r16).
    val out1 = edges.groupBy("src").agg(count(lit(1)).as("c"))
      .filter(col("c") === 1).select("src")
    val in1 = edges.groupBy("dst").agg(count(lit(1)).as("c"))
      .filter(col("c") === 1).select("dst")
    val chain = Ckpt.cut(edges
      .join(out1, Seq("src"), "left_semi")
      .join(in1, Seq("dst"), "left_semi")
      .select("src", "dst"))
    val parent = chain.select(col("dst").as("node"), col("src").as("lbl"), lit(1L).as("dist"))
    val heads = vertices(chain).join(parent.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("lbl"), lit(0L).as("dist"))
    // Two jumps per round: both lookups read the PREVIOUS round's
    // table, so each hop composes (ancestor, distance) pairs exactly;
    // rounds (the dominant cost: checkpoint + scan) nearly halve.
    iterate(heads.union(parent), maxRounds = 64) { labels =>
      val j1 = labels.as("a")
        .join(labels.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"), col("a.lbl").as("old"),
          coalesce(col("b.lbl"), col("a.lbl")).as("l1"),
          (col("a.dist") + coalesce(col("b.dist"), lit(0L))).as("d1"))
      j1.as("c")
        .join(labels.as("d"), col("c.l1") === col("d.node"), "left")
        .select(col("c.node").as("node"),
          coalesce(col("d.lbl"), col("c.l1")).as("lbl"),
          (col("c.d1") + coalesce(col("d.dist"), lit(0L))).as("dist"),
          (coalesce(col("d.lbl"), col("c.l1")) =!= col("c.old")).cast("int").as("__changed"))
    }
  }

  /** Chain (unitig) membership: every chain vertex labeled with its
    * chain head. */
  def unitigs(edges: DataFrame): DataFrame =
    chainLabels(edges).select(col("node"), col("lbl").as("head"))

  /** Unitig sequence emission — the assembler's deliverable: per chain
    * head, the members' sequences concatenated in chain order. `seqs`
    * maps node → sequence; `overlap` > 0 drops that many leading
    * characters from every non-head member (overlap-aware merge for
    * reads that overlap by a fixed length). One aggregate shuffle over
    * the chain labels.
    */
  def unitigSequences(edges: DataFrame, seqs: DataFrame, overlap: Int = 0): DataFrame =
    chainLabels(edges)
      .join(seqs.select(col("node"), col("seq")), Seq("node"))
      .withColumn("part",
        when(col("dist") === 0 || lit(overlap) === 0, col("seq"))
          .otherwise(expr(s"substring(seq, ${overlap + 1})")))
      .groupBy(col("lbl").as("head"))
      .agg(count(lit(1)).as("n_nodes"),
        expr("array_join(transform(array_sort(collect_list(struct(dist, part))), s -> s.part), '')")
          .as("sequence"))

  /** Assembly summary statistics — the assembler's report card:
    * contig count, total/max length, and N50 (the largest length L
    * such that contigs ≥ L cover at least half the assembly).
    *
    * N50 without a global sort: on the per-length totals (one
    * map-side-combine aggregate), a row's descending running sum in
    * the row-framed window form reaches `S≥(v) = Σ len·cnt over
    * lengths ≥ v` exactly at the last row of each tied length, so
    * `N50 = max v with 2·S≥(v) ≥ total` — the distributed suffix sum
    * comes from [[graft.operators.Quantiles.prefixSumByStats]] over
    * the (unique) negated lengths, and the total rides the same
    * one-row aggregate that already feeds the report.
    */
  def assemblyStats(contigs: DataFrame, seqCol: String): DataFrame = {
    val lens = Ckpt.cut(contigs.select(length(col(seqCol)).cast("long").as("len")))
    val byLen = lens.groupBy("len").agg(sum("len").as("lsum"))
    val base = lens.agg(count(lit(1)).as("n_contigs"), sum("len").as("total_len"),
      max("len").as("max_len"))
    val n50 = graft.operators.Quantiles
      .prefixSumByStats(byLen, Seq(-col("len")), col("lsum"), "sge")
      .crossJoin(broadcast(base.select(col("total_len").as("__tot"))))
      .filter(col("sge") * 2 >= col("__tot"))
      .agg(max("len").as("n50"))
    base.crossJoin(n50)
  }

  // ---------------------------------------------------------------- analysis

  /** Connected components over the undirected view of the edge table,
    * by graph CONTRACTION. Per level:
    *
    *  1. every node points at the minimum of itself and its neighbors
    *     (one aggregate) — a forest whose roots are local minima;
    *  2. pointer-double the forest to its roots (label-only
    *     self-joins, no edge table involved — the cheap inner loop);
    *  3. contract: rewrite every edge onto the endpoints' roots, drop
    *     self-loops, dedupe — the edge data itself SHRINKS by at
    *     least half per level (every non-root merges into its root),
    *     unlike label-propagation schemes where the full edge set is
    *     rescanned every round;
    *  4. recurse on the contracted graph, then compose the per-level
    *     mappings top-down.
    *
    * O(log n) levels on any graph (long paths included — min-label
    * propagation needs diameter-many rounds there); the global
    * minimum of a component never points elsewhere, so the final
    * survivor of each component is its minimum id — identical output
    * to the label-propagation formulation. Edge count per level is
    * tracked via an `observe` metric on the contraction's own
    * materialization, so a level costs no separate count job.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // the initial edge count rides the sym cut's own materialization
    // as an observe metric — no separate count() job (r16)
    val obs0 = org.apache.spark.sql.Observation()
    val sym = Ckpt.cut(edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .observe(obs0, count(lit(1)).as("c")))
    var g = sym
    var edgeCount = awaitObserved(obs0).getOrElse(g.count())
    var level = 0
    var mappings = List.empty[DataFrame] // most-contracted level first
    while (edgeCount > 0 && level < 32) {
      level += 1
      val parent = g.groupBy(col("src").as("node")).agg(min("dst").as("nm"))
        .select(col("node"), least(col("node"), col("nm")).as("lbl"))
      def jump(l: DataFrame): DataFrame =
        l.as("a").join(l.as("b"), col("a.lbl") === col("b.node"), "left")
          .select(col("a.node").as("node"),
            coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
      // the FIRST jump rides the iterate's own init materialization
      // (same one job, one round's head start — a height-2 forest now
      // converges in one round instead of two; r16). Jumping from a
      // jumped frame reaches the same roots: a jump only ever moves a
      // label to another valid ancestor label.
      val roots = iterate(jump(parent), maxRounds = 32) { l =>
        l.as("a").join(l.as("b"), col("a.lbl") === col("b.node"), "left")
          .select(col("a.node").as("node"),
            coalesce(col("b.lbl"), col("a.lbl")).as("lbl"),
            (coalesce(col("b.lbl"), col("a.lbl")) =!= col("a.lbl"))
              .cast("int").as("__changed"))
      }
      mappings ::= roots
      val obs = org.apache.spark.sql.Observation()
      val contracted = g
        .join(roots.select(col("node").as("src"), col("lbl").as("rs")), Seq("src"))
        .join(roots.select(col("node").as("dst"), col("lbl").as("rd")), Seq("dst"))
        .select(col("rs").as("src"), col("rd").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val prevG = g
      g = Ckpt.cut(contracted.observe(obs, count(lit(1)).as("c")))
      edgeCount = awaitObserved(obs).getOrElse(g.count())
      if (prevG ne sym) Ckpt.release(prevG)
    }
    if (mappings.isEmpty) return vertices(sym).select(col("node"), col("node").as("component"))
    val ordered = mappings.reverse // level 1 (covers all original nodes) first
    var comp = ordered.head
    for (m <- ordered.tail) {
      comp = comp.as("c").join(m.as("m"), col("c.lbl") === col("m.node"), "left")
        .select(col("c.node").as("node"),
          coalesce(col("m.lbl"), col("c.lbl")).as("lbl"))
    }
    comp.select(col("node"), col("lbl").as("component"))
  }

  /** INCREMENTAL connected components — merge a batch of new edges
    * into an existing (node, component) labeling without rescanning
    * the historical edge set. The contraction insight: existing
    * components are already collapsed, so the update graph is just
    * the new edges rewritten onto component ids (unseen endpoints
    * label themselves) — its size is O(batch), independent of the
    * accumulated graph. Run [[connectedComponents]] on that contracted
    * graph, then compose: a node's new label = cc(oldLabel). Labels
    * stay "minimum original node id in the component" (the min of
    * mins), so the result is IDENTICAL to batch CC over the union of
    * all edges ever seen — IncrementalCCSpec pins that equivalence,
    * and the streaming wrapper
    * [[graft.streaming.StreamingOps.incrementalCCSink]] maintains the
    * labeling under foreachBatch.
    */
  def incrementalCC(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val lbl = Ckpt.cutLight(labels.select(col("node"), col("component")))
    val ends = Ckpt.cutLight(newEdges.select("src", "dst"))
    def toComp(c: String) = lbl.select(col("node").as(c), col("component").as(s"__$c"))
    val contracted = ends
      .join(toComp("src"), Seq("src"), "left")
      .join(toComp("dst"), Seq("dst"), "left")
      .select(coalesce(col("__src"), col("src")).as("src"),
        coalesce(col("__dst"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
    if (contracted.isEmpty) {
      // batch only touches intra-component or unseen-self pairs: the
      // labeling is unchanged except brand-new isolated-edge nodes
      val newNodes = vertices(ends).join(lbl.select("node"), Seq("node"), "left_anti")
      return lbl.unionByName(newNodes.select(col("node"), col("node").as("component")))
    }
    val cc = Ckpt.cut(connectedComponents(contracted)
      .select(col("node").as("rep"), col("component").as("newc")))
    // old nodes: relabel through their component's new label (if merged)
    val relabeled = lbl.join(cc, lbl("component") === cc("rep"), "left")
      .select(lbl("node"), coalesce(col("newc"), lbl("component")).as("component"))
    // new nodes: their "old label" is themselves
    val newNodes = vertices(ends).join(lbl.select("node"), Seq("node"), "left_anti")
    val newLabeled = newNodes.join(cc, newNodes("node") === cc("rep"), "left")
      .select(newNodes("node"), coalesce(col("newc"), newNodes("node")).as("component"))
    relabeled.unionByName(newLabeled)
  }

  /** k-core pruning over the undirected degree view: repeatedly drop
    * edges touching a vertex of degree < k until stable (or
    * `maxRounds`). Each round is one degree aggregate + two
    * semi-joins — the standard distributed peeling; round count is
    * bounded by the peeling depth, not graph size.
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int): DataFrame =
    iterateToFixpoint(edges.select("src", "dst"), maxRounds) { e =>
      val deg = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("node")
      e.join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select("src", "dst")
    }

  /** Synchronous label propagation (Raghavan et al. 2007) over the
    * undirected view, `rounds` fixed rounds: every node adopts the
    * most frequent label among its neighbors, ties broken by MINIMUM
    * label, isolated-in-round nodes keep their own. Fixed round count
    * + deterministic tie-break = identical labels on every engine and
    * every retry (the async/random variants converge faster but are
    * irreproducible — wrong trade for an oracle-gated operator).
    * Each round is one neighbor-label exchange (map-side combinable
    * count) plus a per-node argmax — no global structure, O(E) per
    * round at any scale.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    val und = Ckpt.cutLight(edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = Ckpt.cut(vertices(und).withColumn("lbl", col("node")))
    for (_ <- 1 to rounds) {
      val nbLbl = und.join(labels, und("src") === labels("node"))
        .select(und("dst").as("node"), col("lbl"))
        .groupBy("node", "lbl").agg(count(lit(1)).as("c"))
      // per-node argmax by (c DESC, lbl ASC) as a min-struct AGGREGATE
      // (map-side combinable, no per-partition sort) instead of a
      // row_number window — same total order, same winner (r16).
      // −c cannot overflow: c ≤ degree ≤ n.
      val picked = nbLbl.groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("nl"))
      val next = Ckpt.cut(labels.join(picked, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl")))
      Ckpt.release(labels)
      labels = next
    }
    labels
  }

  /** Maximal independent set by SYNCHRONOUS deterministic Luby
    * rounds — the distributed symmetry-breaking primitive (graph
    * coloring seeds, conflict-free scheduling, landmark selection).
    * Priorities are the 31-bit house hash of the node id composed
    * with the id itself (`hash·2³¹ + node` — unique, so no ties and
    * every engine/retry agrees): each round, every undecided node
    * whose priority beats ALL undecided neighbors joins the set, its
    * neighbors drop out, repeat. Classic Luby bound: O(log n) rounds
    * with high probability under hash priorities; `rounds` is fixed
    * for reproducibility and the caller asserts convergence (no
    * `u` rows) — Mis specs pin independence + maximality. Per round:
    * one join + one aggregate on the undecided frontier, which
    * SHRINKS geometrically — no global sort, no driver state.
    * Output: (node, st) with `i` (in set) / `o` (excluded) / `u`
    * (unconverged — none at the tested scales). */
  def maximalIndependentSet(edges: DataFrame, rounds: Int): DataFrame = {
    // frontier-shaped loop: both the undecided node set AND the edge
    // set restricted to it shrink geometrically, so round k costs
    // O(frontier_k), not O(V + E) — and a converged instance exits
    // early (further rounds would be no-ops; the output is identical
    // to running all `rounds`). The frontier count rides the
    // checkpoint materialization as an observe metric (the [[iterate]]
    // convention — no extra count job per round).
    var e2 = Ckpt.cut(edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct())
    // priorities pack hash·2³¹ + node into one BIGINT; unique and
    // overflow-free ONLY while node ∈ [0, 2³¹) — outside that range
    // the node bleeds into the hash bits (collisions) and the top of
    // the hash range overflows Long. Fail loudly per-row instead of
    // silently breaking the tie-free invariant the operator and its
    // oracle rely on (no extra validation job: the guard rides the
    // same projection).
    var state = Ckpt.cut(vertices(e2)
      .withColumn("pri", expr(
        "CASE WHEN node < 0 OR node >= 2147483648 THEN " +
          "CAST(raise_error(concat('maximalIndependentSet: node id ', " +
          "CAST(node AS STRING), ' outside [0, 2^31) — packed hash*2^31+node " +
          "priorities would collide or overflow')) AS BIGINT) " +
          "ELSE CAST(conv(substr(md5(CAST(node AS STRING)), 1, 8), 16, 10) AS BIGINT) " +
          "* 2147483648 + node END"))
      .withColumn("st", lit("u")))
    // r16 round restructure: ONE state frame (node, pri, st) is
    // checkpointed per round instead of four (ins / decided / nextU /
    // nextE were each their own cut = their own job). The round's
    // decided slice stays a lazy FILTER over that round's
    // materialized leaf (never recomputed, never released), so jobs
    // per round drop from 4 to 2 (state + residual edges). The cost:
    // the local-maxima join is evaluated twice inside the one job
    // (once for the ins flag, once under the neighbor expansion) — a
    // frontier-sized recompute traded for a frontier-sized
    // checkpoint write, neutral at scale, and one fewer scheduling
    // round-trip locally (measured: g23 3.9 s with 56 stage-jobs).
    val parts = Seq.newBuilder[DataFrame]
    var r = 0
    var empty = false
    while (r < rounds && !empty) {
      r += 1
      val undec = state.filter(col("st") === "u").select("node", "pri")
      // every e2 endpoint is undecided by construction, so the
      // strongest-undecided-neighbor aggregate needs no state join
      val mx = e2
        .join(undec.select(col("node").as("dst"), col("pri").as("vpri")), "dst")
        .groupBy("src").agg(max("vpri").as("mx"))
        .select(col("src").as("node"), col("mx"))
      val flagged = undec.join(mx, Seq("node"), "left")
        .withColumn("isin", col("mx").isNull || col("mx") < col("pri"))
      // neighbors of new members — all undecided, since e2 is
      // frontier-restricted; ins ∩ outs = ∅ (two adjacent local
      // maxima would each need the strictly greater priority), and
      // outs ⊆ undec, so one left join attaches the flag
      val outs = e2
        .join(flagged.filter(col("isin")).select(col("node").as("dst")), "dst")
        .select(col("src").as("node")).distinct()
        .withColumn("iso", lit(true))
      val obs = org.apache.spark.sql.Observation()
      val next = Ckpt.cut(flagged.join(outs, Seq("node"), "left")
        .select(col("node"), col("pri"),
          when(col("isin"), "i").when(col("iso"), "o").otherwise("u").as("st"))
        .observe(obs, coalesce(sum((col("st") === "u").cast("long")), lit(0L)).as("c")))
      parts += next.filter(col("st") =!= "u").select("node", "st")
      val left = awaitObserved(obs).getOrElse(
        next.filter(col("st") === "u").count())
      empty = left == 0
      val nextU = next.filter(col("st") === "u")
      val nextE = Ckpt.cut(e2
        .join(nextU.select(col("node").as("src")), "src", "left_semi")
        .join(nextU.select(col("node").as("dst")), "dst", "left_semi"))
      Ckpt.release(e2) // prior state cuts stay: parts filter over them
      state = next
      e2 = nextE
    }
    (parts.result() :+ state.filter(col("st") === "u").select("node")
        .withColumn("st", lit("u")))
      .reduce(_ unionByName _)
      .select("node", "st")
  }

  /** MAXIMAL MATCHING by deterministic synchronous rounds (the
    * Israeli–Itai posture — Luby on the line graph): canonical
    * undirected edges carry a house-hash priority, ordered TOTALLY by
    * (pri DESC, a, b) so both engines break the (astronomically rare)
    * hash ties identically; an edge joins the matching when it is the
    * best incident edge of BOTH endpoints; matched endpoints leave,
    * and the remaining edge set shrinks geometrically (O(log n)
    * rounds w.h.p. on bounded degree). Frontier-shaped like
    * [[maximalIndependentSet]]: per round one node-keyed window over
    * the REMAINING incident lists + two anti-joins, cost
    * O(frontier_k); the remaining-edge count rides the checkpoint as
    * an observe metric and an empty frontier exits early. Output:
    * matched (a, b) pairs — the caller (spec/oracle) certifies
    * convergence and maximality. */
  def maximalMatching(edges: DataFrame, rounds: Int): DataFrame = {
    var rem = Ckpt.cut(edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .withColumn("pri", expr(
        "CAST(conv(substr(md5(concat(CAST(a AS STRING), '_', " +
          "CAST(b AS STRING))), 1, 8), 16, 10) AS BIGINT)")))
    val matched = Seq.newBuilder[DataFrame]
    var r = 0
    var empty = false
    while (r < rounds && !empty) {
      r += 1
      val inc = rem.select(col("a").as("node"), col("a"), col("b"), col("pri"))
        .unionByName(rem.select(col("b").as("node"), col("a"), col("b"), col("pri")))
      // per-node best incident edge by (pri DESC, a, b) as a
      // min-struct aggregate (map-side combinable) instead of a
      // row_number window — same total order, same edge (r16); pri is
      // a 31-bit hash, so −pri cannot overflow
      val best = inc.groupBy("node")
        .agg(min(struct((-col("pri")).as("np"), col("a").as("ba"), col("b").as("bb"))).as("m"))
        .select(col("node"), col("m.ba").as("a"), col("m.bb").as("b"))
      val mt = Ckpt.cutLight(best.groupBy("a", "b")
        .agg(count(lit(1)).as("c")).filter(col("c") === 2).select("a", "b"))
      matched += mt
      val mn = mt.select(col("a").as("node"))
        .unionByName(mt.select(col("b").as("node"))).distinct()
      val obs = org.apache.spark.sql.Observation()
      val nextRem = Ckpt.cut(rem
        .join(mn.select(col("node").as("a")), Seq("a"), "left_anti")
        .join(mn.select(col("node").as("b")), Seq("b"), "left_anti")
        .observe(obs, count(lit(1)).as("c")))
      val left = awaitObserved(obs).getOrElse(nextRem.count())
      Ckpt.release(rem)
      rem = nextRem
      empty = left == 0
    }
    matched.result().reduce(_ unionByName _).select("a", "b")
  }

  /** Graph coloring by peeled MIS rounds (round 12) — the third
    * member of the symmetry-breaking family (MIS g23, matching g24,
    * and the coloring g23's own doc promised). Each round selects
    * exactly [[maximalIndependentSet]]'s per-round independent set —
    * the local priority maxima among still-uncolored nodes — and
    * assigns it color = round index: two adjacent nodes can never
    * both be local maxima (one has the strictly greater packed
    * priority), so every color class is independent and the coloring
    * is proper BY CONSTRUCTION. Unlike MIS, a selected node's
    * neighbors stay in play for the NEXT color, so the loop is one
    * peel per color — frontier-shaped like g23 (the residual node and
    * edge sets shrink every round, the remaining count rides the
    * checkpoint as an observe metric, empty frontier exits early).
    * Rounds needed = the longest strictly-descending priority path,
    * O(log n) w.h.p. under the md5 priorities — at 100 TB the round
    * count, not the graph, prices the coloring. Nodes still uncolored
    * after `maxColors` rounds come back with color = −1 — visible
    * incompleteness (the cap-observability convention), never a
    * silently improper answer. Output: (node, color), colors 1-based.
    */
  def colorByMis(edges: DataFrame, maxColors: Int): DataFrame = {
    var e2 = Ckpt.cut(edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst")).distinct())
    // same packed hash·2³¹+id priorities (and the same [0, 2³¹) node
    // guard) as maximalIndependentSet — g25's color classes are
    // exactly g23's per-round independent sets
    var state = Ckpt.cut(vertices(e2)
      .withColumn("pri", expr(
        "CASE WHEN node < 0 OR node >= 2147483648 THEN " +
          "CAST(raise_error(concat('colorByMis: node id ', " +
          "CAST(node AS STRING), ' outside [0, 2^31) — packed hash*2^31+node " +
          "priorities would collide or overflow')) AS BIGINT) " +
          "ELSE CAST(conv(substr(md5(CAST(node AS STRING)), 1, 8), 16, 10) AS BIGINT) " +
          "* 2147483648 + node END"))
      .withColumn("isin", lit(false)))
    val out = Seq.newBuilder[DataFrame]
    var c = 0
    var empty = false
    // r16 round restructure (see [[maximalIndependentSet]]): one
    // flagged state frame checkpointed per color instead of separate
    // ins / nextU cuts — the color class stays a lazy filter over the
    // round's leaf; jobs per color drop from 3 to 2
    while (c < maxColors && !empty) {
      c += 1
      val undec = state.filter(!col("isin")).select("node", "pri")
      // strongest still-uncolored neighbor; e2 is residual-restricted,
      // so every endpoint is undecided by construction
      val mx = e2
        .join(undec.select(col("node").as("dst"), col("pri").as("vpri")), "dst")
        .groupBy("src").agg(max("vpri").as("mx"))
        .select(col("src").as("node"), col("mx"))
      val obs = org.apache.spark.sql.Observation()
      val next = Ckpt.cut(undec.join(mx, Seq("node"), "left")
        .select(col("node"), col("pri"),
          (col("mx").isNull || col("mx") < col("pri")).as("isin"))
        .observe(obs, coalesce(sum((!col("isin")).cast("long")), lit(0L)).as("c")))
      out += next.filter(col("isin")).select("node").withColumn("color", lit(c.toLong))
      val left = awaitObserved(obs).getOrElse(next.filter(!col("isin")).count())
      val nextU = next.filter(!col("isin"))
      val nextE = Ckpt.cut(e2
        .join(nextU.select(col("node").as("src")), "src", "left_semi")
        .join(nextU.select(col("node").as("dst")), "dst", "left_semi"))
      Ckpt.release(e2) // prior state cuts stay: `out` filters over them
      state = next
      e2 = nextE
      empty = left == 0
    }
    (out.result() :+ state.filter(!col("isin")).select("node")
        .withColumn("color", lit(-1L)))
      .reduce(_ unionByName _).select("node", "color")
  }

  /** Multi-source BFS: minimum hop distance (≤ `maxDepth`) from any
    * seed along directed edges, as a (node, depth) table of reached
    * nodes. Each round relaxes one hop — a hash join on `src` plus a
    * min-aggregate on `node` — and the fused `__changed` count stops
    * the loop as soon as the frontier dies, so sparse seed sets on
    * shallow graphs never pay the full `maxDepth` rounds. `maxDepth`
    * also bounds emitted depths, keeping the round count (and state
    * size) fixed no matter how deep the 100-TB graph really is.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxDepth: Int): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst"))
    iterateMonotoneCore(bfsInit(seeds), maxDepth, RelaxSteps)(bfsHop(e))._1
  }

  /** Edge table prepared for a relaxation loop: HASH-PARTITIONED BY
    * `src` once, under one checkpoint whose LogicalRDD carries the
    * partitioning — every round's frontier join then satisfies its
    * edge-side distribution requirement from the materialized layout
    * (the classic Pregel posture: partition edges once, ship only
    * messages per round). At 100 TB this removes a full edge-table
    * exchange (or broadcast build) from EVERY round; locally the
    * planner may still broadcast the small side, which is free. */
  private def relaxEdges(e: DataFrame): DataFrame =
    Ckpt.cut(e.repartition(col("src")))

  /** [[bfs]] with FULL-reachability semantics: min hop distance from
    * any seed with no depth bound — iterates to the true fixpoint and
    * throws [[NotConvergedException]] if `safetyCap` rounds pass while
    * distances are still relaxing. The certified mode the bounded
    * variant can't provide: at 100× scale a diameter beyond the cap
    * fails loudly instead of silently truncating distances.
    */
  def bfsCertified(edges: DataFrame, seeds: DataFrame, safetyCap: Int = 256): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst"))
    val (out, converged) =
      iterateMonotoneCore(bfsInit(seeds), safetyCap, RelaxSteps)(bfsHop(e))
    if (!converged) throw new NotConvergedException(
      s"iteration still changing after $safetyCap relaxations (safety cap); " +
        "raise the cap or use the bounded variant if truncation is intended")
    out
  }

  /** Relaxation hops composed per checkpointed round in the
    * bfs/sssp/topo family ([[iterateMonotoneCore]]). MEASURED at 1:
    * a relax hop consumes its input twice (merge base + message
    * source), and physical exchange reuse does NOT dedup the two
    * branches across composed hops, so s hops per round re-execute
    * hop k's aggregation 2^(s−k) times — at s = 4, g16_sssp's summed
    * task time went 16.8 s → 42.8 s and wall time REGRESSED 8.5 →
    * 9.9 s despite 100 → 78 jobs. The round win that survives is the
    * metric-based convergence (no changed-join); hop batching does
    * not. */
  private val RelaxSteps = 1

  private def bfsInit(seeds: DataFrame): DataFrame =
    seeds.select(col("node"), lit(0L).as("depth"))

  /** One hop of multi-source BFS min-relaxation: keys only appear,
    * depths only decrease — the [[iterateMonotoneCore]] contract.
    * The edge side is re-projected with fresh aliases per hop so that
    * composed hops (multi-step rounds) never hold two ambiguous
    * references to the same edge attributes. */
  private def bfsHop(e: DataFrame)(cur: DataFrame): DataFrame = {
    val ed = e.select(col("src").as("__hs"), col("dst").as("__hd"))
    cur.select("node", "depth")
      .unionByName(cur.join(ed, cur("node") === col("__hs"))
        .select(col("__hd").as("node"), (col("depth") + 1).as("depth")))
      .groupBy("node").agg(min("depth").as("depth"))
  }

  /** Topological layering of a DAG: `layer(v)` = length of the
    * longest directed path ENDING at v (sources sit at layer 0) —
    * the scheduling/stratification primitive (assembly graphs use it
    * to order contig joins; dataflow DAGs use it for stage waves).
    * The dual of [[bfs]]: max-relaxation instead of min, seeded at
    * every vertex. Each round relaxes one hop (hash join on `src` +
    * max-aggregate); the fused `__changed` count stops as soon as
    * labels stabilize, and `maxDepth` bounds the rounds — on a graph
    * with a cycle the unbounded recursion never terminates, so the
    * bound is the semantic guard, not just a safety valve.
    */
  def topoLayers(edges: DataFrame, maxDepth: Int): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst"))
    iterateMonotoneCore(topoInit(e), maxDepth, RelaxSteps)(topoHop(e))._1
  }

  /** [[topoLayers]] to the certified fixpoint: exact longest-path
    * layers on a DAG of ANY depth, or [[NotConvergedException]] at the
    * safety cap. On a cyclic graph layers relax forever, so the cap
    * doubles as cycle detection — the loud version of the bounded
    * variant's semantic guard.
    */
  def topoLayersCertified(edges: DataFrame, safetyCap: Int = 256): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst"))
    val (out, converged) =
      iterateMonotoneCore(topoInit(e), safetyCap, RelaxSteps)(topoHop(e))
    if (!converged) throw new NotConvergedException(
      s"iteration still changing after $safetyCap relaxations (safety cap); " +
        "raise the cap or use the bounded variant if truncation is intended")
    out
  }

  private def topoInit(e: DataFrame): DataFrame =
    vertices(e).select(col("node"), lit(0L).as("layer"))

  /** One hop of longest-path max-relaxation: the node set is fixed
    * (every vertex is seeded) and layers only increase — the
    * [[iterateMonotoneCore]] contract in the increasing direction.
    * Fresh edge aliases per hop, as in [[bfsHop]]. */
  private def topoHop(e: DataFrame)(cur: DataFrame): DataFrame = {
    val ed = e.select(col("src").as("__hs"), col("dst").as("__hd"))
    cur.select("node", "layer")
      .unionByName(cur.join(ed, cur("node") === col("__hs"))
        .select(col("__hd").as("node"), (col("layer") + 1).as("layer")))
      .groupBy("node").agg(max("layer").as("layer"))
  }

  /** Undirected triangle count (single row `n_triangles`). Canonical
    * a<b<c orientation — each triangle counted exactly once; two hash
    * joins, the standard distributed formulation.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = Ckpt.cut(edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()) // scanned 3×
    val wedge = canon.join(canon.select(col("a").as("b"), col("b").as("c")), Seq("b"))
      .filter(col("a") < col("b") && col("b") < col("c"))
    wedge.join(canon.select(col("a"), col("b").as("c")), Seq("a", "c"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Fixed-iteration PageRank (no dangling-mass redistribution —
    * matches the simple formulation; deterministic given the edge
    * set). Each iteration: one join + one aggregate shuffle.
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val e0 = Ckpt.cutLight(edges.select("src", "dst"))
    val verts = Ckpt.cut(vertices(e0))
    val n = verts.count().toDouble
    // out-degree is iteration-invariant: fold it into the edge table
    // ONCE instead of re-joining it every iteration (one fewer join —
    // and at scale one fewer full-edge-table shuffle — per round; r16)
    val e = Ckpt.cut(e0.join(
      e0.groupBy("src").agg(count(lit(1)).as("outdeg")), Seq("src")))
    var ranks = verts.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node2"), (col("rank") / col("outdeg")).as("c"))
        .groupBy(col("node2").as("node")).agg(sum("c").as("insum"))
      val nr = Ckpt.cut(verts.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("insum"), lit(0.0))).as("rank")))
      Ckpt.release(ranks) // no-op on round 1's non-checkpoint frame
      ranks = nr
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }

  /** PageRank in exact integer micro-units (rank × 10¹²), using only
    * integer division — bit-identical on every ANSI engine, so the
    * result is oracle-verifiable (floating-point rank sums are
    * order-dependent and never hash-stable across engines).
    * rank₀ = R div n;
    * rankᵢ₊₁(v) = (R·15 div 100) div n
    *            + 85·Σ_{u→v}(rankᵢ(u) div outdeg(u)) div 100.
    */
  def pagerankExact(edges: DataFrame, iters: Int): DataFrame = {
    val R = 1000000000000L
    val e0 = Ckpt.cutLight(edges.select("src", "dst"))
    val verts = Ckpt.cut(vertices(e0))
    val n = verts.count()
    // fold the iteration-invariant out-degree into the edge table
    // once — see [[pagerank]]'s note (r16)
    val e = Ckpt.cut(e0.join(
      e0.groupBy("src").agg(count(lit(1)).as("od")), Seq("src")))
    val base = (R * 15L / 100L) / n // Scala Long division == SQL integer div (positive operands)
    var ranks = verts.withColumn("rank_u", lit(R / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("rank_u div od").as("c"))
        .groupBy("node").agg(sum("c").as("insum"))
      val nr = Ckpt.cut(verts.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("coalesce(insum, CAST(0 AS BIGINT)) * 85 div 100")).as("rank_u")))
      Ckpt.release(ranks) // no-op on round 1's non-checkpoint frame
      ranks = nr
    }
    ranks.select("node", "rank_u")
  }

  /** Weighted single-source(-set) shortest paths (Bellman-Ford):
    * minimum distance from any seed along directed weighted edges
    * `(src, dst, w)`. [[bfs]]'s weighted generalization — each round
    * relaxes one hop (hash join on `src` + min-aggregate) and the
    * fused `__changed` count stops the loop at the true fixpoint, so
    * the round count is the hop-diameter of the optimal-path forest,
    * not `maxRounds`. Negative weights are NOT supported (no cycle
    * detection); `maxRounds` is the semantic guard on adversarial
    * graphs, exactly as in [[topoLayers]].
    */
  def sssp(edges: DataFrame, seeds: DataFrame, maxRounds: Int): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst", "w"))
    iterateMonotoneCore(ssspInit(seeds), maxRounds, RelaxSteps)(ssspHop(e))._1
  }

  /** [[sssp]] to the certified Bellman-Ford fixpoint: true shortest
    * distances at any optimal-path hop depth, or
    * [[NotConvergedException]] at the safety cap (which a
    * negative-weight cycle would also hit — loudly, never as a
    * plausible distance table).
    */
  def ssspCertified(edges: DataFrame, seeds: DataFrame, safetyCap: Int = 256): DataFrame = {
    val e = relaxEdges(edges.select("src", "dst", "w"))
    val (out, converged) =
      iterateMonotoneCore(ssspInit(seeds), safetyCap, RelaxSteps)(ssspHop(e))
    if (!converged) throw new NotConvergedException(
      s"iteration still changing after $safetyCap relaxations (safety cap); " +
        "raise the cap or use the bounded variant if truncation is intended")
    out
  }

  private def ssspInit(seeds: DataFrame): DataFrame =
    seeds.select(col("node"), lit(0L).as("dist"))

  /** One Bellman-Ford relaxation: keys only appear, distances only
    * decrease (weights are non-negative by the operator contract) —
    * the [[iterateMonotoneCore]] contract. Fresh edge aliases per
    * hop, as in [[bfsHop]]. */
  private def ssspHop(e: DataFrame)(cur: DataFrame): DataFrame = {
    val ed = e.select(col("src").as("__hs"), col("dst").as("__hd"), col("w").as("__hw"))
    cur.select("node", "dist")
      .unionByName(cur.join(ed, cur("node") === col("__hs"))
        .select(col("__hd").as("node"), (col("dist") + col("__hw")).as("dist")))
      .groupBy("node").agg(min("dist").as("dist"))
  }

  /** Min-label propagation to fixpoint along directed edges: lbl(v) =
    * min over ancestors(v) ∪ {v}. Building block of [[scc]] (forward
    * on the graph, forward on the reversed graph = backward).
    *
    * Each round does one EDGE relax plus one POINTER JUMP
    * (lbl ← min(lbl, lbl(lbl))) — sound because lbl(v) is always an
    * ancestor-or-self, and an ancestor's ancestors are ancestors, so
    * the jump only ever surfaces valid labels. The jump doubles the
    * effective propagation distance per round: a length-L chain or
    * cycle converges in O(log L) rounds instead of L (a 25-hop cycle:
    * ~5 rounds vs 25 — measured directly on g15's fw/bw phases).
    */
  private def minLabelFixpoint(nodes: DataFrame, e: DataFrame,
                               maxRounds: Int): DataFrame = {
    // lbl(v) is always an ancestor-or-self and only ever DECREASES
    // over a fixed node set, so the round rides iterateMonotoneCore:
    // convergence comes from the (count, Σ lbl) observe metrics and
    // the per-round changed-computing left join is gone (one fewer
    // exchange per round; r16).
    iterateMonotoneCore(
        nodes.select(col("node"), col("node").as("lbl")), maxRounds, 1) { cur =>
      val ed = e.select(col("src").as("__hs"), col("dst").as("__hd"))
      val relaxed = cur.select("node", "lbl")
        .unionByName(cur.join(ed, cur("node") === col("__hs"))
          .select(col("__hd").as("node"), col("lbl")))
        .groupBy("node").agg(min("lbl").as("lbl"))
      relaxed.as("m").join(
          relaxed.select(col("node").as("jn"), col("lbl").as("jl")).as("j"),
          col("m.lbl") === col("j.jn"), "left")
        .select(col("m.node").as("node"),
          least(col("m.lbl"), coalesce(col("j.jl"), col("m.lbl"))).as("lbl"))
    }._1
  }

  /** Strongly connected components of a directed graph, labeled by
    * their minimum member: trim + forward/backward min-label peeling
    * (the distributed FW-BW/coloring family — Hong et al. PPoPP'13,
    * Slota et al. IPDPS'14 — with min-label as the pivot rule).
    *
    * Per outer round: (1) TRIM — iteratively drop edges whose source
    * has no incoming edge or whose target has no outgoing edge; every
    * vertex peeled this way provably lies on no cycle, so it settles
    * as a singleton. DAG regions die here in diameter-many cheap
    * rounds, never reaching the expensive phase. (2) On the surviving
    * 1-in-1-out core, f = min-label fixpoint forward and b = the same
    * on the reversed graph; `f(v) = b(v) = p` certifies p reaches v
    * AND v reaches p, i.e. v ∈ SCC(p) — those vertices settle with
    * label p (an SCC's members share f and b, so whole SCCs settle
    * atomically). At least the SCC of each weak component's minimum
    * vertex settles per round, and settled vertices leave the graph.
    *
    * Any vertex still unsettled after `maxOuter` rounds is emitted
    * with scc = −1: visibly wrong under an oracle compare, never
    * silently plausible (the house non-convergence convention).
    */
  def scc(edges: DataFrame, maxOuter: Int = 4, maxInner: Int = 32): DataFrame = {
    var e = Ckpt.cut(edges.select("src", "dst").distinct())
    var active = Ckpt.cut(vertices(e).select("node"))
    var activeCount = active.count()
    var parts = List.empty[DataFrame]
    var outer = 0
    while (activeCount > 0 && outer < maxOuter) {
      outer += 1
      // the semi-join build sides need no pre-distinct (a semi join
      // dedups its build side internally) — dropping the two
      // aggregates removes two exchanges per trim round (r16)
      val core = iterateToFixpoint(e, maxInner) { ed =>
        ed.join(ed.select(col("dst").as("src")), Seq("src"), "left_semi")
          .join(ed.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .select("src", "dst")
      }
      val coreNodes = Ckpt.cut(vertices(core).select("node"))
      // vertices trimmed away lie on no cycle → singleton SCCs.
      // Materialized NOW: `active`'s checkpoint is released at the end
      // of this round, so the part must not stay a lazy view over it.
      parts ::= Ckpt.cut(active.join(coreNodes, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("scc")))
      // forward and backward fixpoints are INDEPENDENT (both read only
      // the checkpointed core) — run them as concurrent driver-side
      // jobs (guide §2.6): each loop's tail tasks back-fill the other
      // loop's idle executors, roughly halving this phase's wall time
      // at any scale. No shared mutable state: Ckpt.cut /
      // CheckpointStats are stateless over distinct frames and each
      // loop owns its Observations.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val fF = Future(minLabelFixpoint(coreNodes, core, maxInner))
      val bF = Future(minLabelFixpoint(coreNodes,
        core.select(col("dst").as("src"), col("src").as("dst")), maxInner))
      val f = Await.result(fF, Duration.Inf)
      val b = Await.result(bF, Duration.Inf)
      val settled = Ckpt.cut(
        f.as("f").join(b.as("b"), col("f.node") === col("b.node"))
          .filter(col("f.lbl") === col("b.lbl"))
          .select(col("f.node").as("node"), col("f.lbl").as("scc")))
      parts ::= settled
      val prevActive = active
      active = Ckpt.cut(coreNodes.join(settled, Seq("node"), "left_anti"))
      activeCount = active.count()
      Ckpt.release(prevActive)
      val prevE = e
      e = Ckpt.cut(
        core.join(settled.select(col("node").as("src")), Seq("src"), "left_anti")
          .join(settled.select(col("node").as("dst")), Seq("dst"), "left_anti"))
      Ckpt.release(prevE)
    }
    val leftover = active.select(col("node"), lit(-1L).as("scc"))
    (leftover :: parts).reduce(_.unionByName(_))
  }

  /** Borůvka minimum spanning forest over a weighted undirected graph
    * (src, dst, w) — the distributed-native MST algorithm (each
    * component picks its lightest outgoing edge simultaneously, so a
    * round is two hash joins + one aggregate, and components at least
    * halve per round → O(log V) rounds; Prim/Kruskal's sequential
    * edge orderings have no shuffle-friendly form). Ties are broken
    * by the TOTAL order (w, a, b): under a total edge order the MSF
    * is unique and no round can select a cycle (a cycle would need
    * two distinct minimal edges between the same components), so the
    * output is deterministic on any engine with no RNG and no
    * sequential dependence.
    *
    * Multi-edges collapse to their min weight up front; each round
    * relabels the ORIGINAL canonical edge list against the current
    * component labels (two joins over E), selects per-component min
    * edges, and merges via [[connectedComponents]] over the selected
    * component graph — a graph with at most one edge per component,
    * geometrically shrinking. Returns the forest as canonical
    * (a < b, w) rows; `|rows| = |V| − |components|`.
    */
  def boruvkaMsf(edges: DataFrame, maxRounds: Int = 32): DataFrame = {
    val canon = Ckpt.cutLight(
      edges.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"), col("w"))
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(min("w").as("w")))
    val empty = canon.filter(lit(false)).select("a", "b", "w")
    var labels = Ckpt.cut(
      vertices(canon.select(col("a").as("src"), col("b").as("dst")))
        .select(col("node"), col("node").as("lbl")))
    var msf = List.empty[DataFrame]
    var round = 0
    var live = true
    while (live && round < maxRounds) {
      round += 1
      val rel = canon
        .join(labels.select(col("node").as("a"), col("lbl").as("ca")), Seq("a"))
        .join(labels.select(col("node").as("b"), col("lbl").as("cb")), Seq("b"))
        .filter(col("ca") =!= col("cb"))
      val inc = rel.select(col("ca").as("comp"), col("w"), col("a"), col("b"),
          col("ca"), col("cb"))
        .unionByName(rel.select(col("cb").as("comp"), col("w"), col("a"), col("b"),
          col("ca"), col("cb")))
      // per-component lightest edge under the (w, a, b) total order;
      // distinct because the one shared min edge is picked from both sides
      val sel = Ckpt.cut(inc.groupBy("comp")
        .agg(min(struct(col("w"), col("a"), col("b"), col("ca"), col("cb"))).as("m"))
        .select(col("m.w").as("w"), col("m.a").as("a"), col("m.b").as("b"),
          col("m.ca").as("ca"), col("m.cb").as("cb"))
        .distinct())
      if (sel.isEmpty) { live = false; Ckpt.release(sel) }
      else {
        msf ::= sel.select("a", "b", "w")
        val merge = connectedComponents(
          sel.select(col("ca").as("src"), col("cb").as("dst")))
        val prev = labels
        labels = Ckpt.cut(labels
          .join(merge.select(col("node").as("lbl"), col("component").as("nl")),
            Seq("lbl"), "left")
          .select(col("node"), coalesce(col("nl"), col("lbl")).as("lbl")))
        Ckpt.release(prev)
      }
    }
    Ckpt.release(labels)
    if (msf.isEmpty) empty else msf.reduce(_.unionByName(_))
  }
}
