package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Overlap-graph reduction operators — the SORA core (BioHPC/SORA;
  * the reference mount is empty, so semantics follow the published
  * string-graph reduction literature: Myers' transitive reduction,
  * tip/dead-end pruning, bubble detection, unitig/chain compression),
  * re-expressed as declarative DataFrame plans instead of the
  * original GraphX/Pregel formulation.
  *
  * All operators take an edge table with `src: long, dst: long`
  * columns. Every step is an equi-join/aggregate on src or dst, so at
  * cluster scale each round is one hash shuffle; iterative loops use
  * `localCheckpoint` to truncate lineage and converge in O(log n)
  * rounds (pointer jumping), not O(diameter).
  */
object GraphOps {

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
    val e = edges.select("src", "dst").localCheckpoint() // scanned 3×
    val e2 = e.select(col("src").as("mid"), col("dst"))
    val paths = e.select(col("src"), col("dst").as("mid"))
      .join(e2, Seq("mid")).select("src", "dst")
    e.join(paths, Seq("src", "dst"), "left_anti")
  }

  /** One round of dead-end (tip) pruning: drop every edge whose dst
    * has no outgoing edge. Iterate for multi-round trimming.
    */
  def tipRemoval(edges: DataFrame): DataFrame =
    edges.join(edges.select(col("src").as("dst")).distinct(), Seq("dst"), "left_semi")

  /** Simple-bubble detection: (u, a, b, w) with edges u→a→w and
    * u→b→w, a<b, and a,b interior (indeg=outdeg=1) — the
    * error/heterozygosity pattern string-graph assemblers collapse.
    */
  def bubbles(edges: DataFrame): DataFrame = {
    val e = edges.select("src", "dst").localCheckpoint() // scanned 4×
    val interior = degrees(e)
      .filter(col("indeg") === 1 && col("outdeg") === 1).select("node")
    val arm = e.select(col("src").as("u"), col("dst").as("m"))
      .join(interior.withColumnRenamed("node", "m"), Seq("m"))
      .join(e.select(col("src").as("m"), col("dst").as("w")), Seq("m"))
    arm.select(col("u"), col("m").as("a"), col("w"))
      .join(arm.select(col("u"), col("m").as("b"), col("w")), Seq("u", "w"))
      .filter(col("a") < col("b"))
      .select("u", "a", "b", "w")
  }

  /** Chain (unitig) compression: label every vertex of every maximal
    * in/out-degree-1 chain with its chain head. Pointer jumping —
    * label(v) := label(label(v)) per round — gives O(log chain-length)
    * rounds; each round is one self-join shuffle.
    */
  def unitigs(edges: DataFrame): DataFrame = {
    // Restrict to chain edges: src has outdeg 1 and dst has indeg 1.
    // Materialize once — the loop below would otherwise re-derive the
    // whole upstream plan (window/joins) on every self-join and
    // convergence check, turning O(log n) rounds into O(rounds × plan).
    val deg = degrees(edges)
    val chain = edges
      .join(deg.filter(col("outdeg") === 1).select(col("node").as("src")), Seq("src"), "left_semi")
      .join(deg.filter(col("indeg") === 1).select(col("node").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst")
      .localCheckpoint()
    val parent = chain.select(col("dst").as("node"), col("src").as("lbl"))
    val heads = vertices(chain).join(parent.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("lbl"))
    var labels = heads.union(parent).localCheckpoint()
    var converged = false
    while (!converged) {
      val jumped = labels.as("a")
        .join(labels.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"), coalesce(col("b.lbl"), col("a.lbl")).as("lbl"))
        .localCheckpoint()
      val changed = jumped.as("n").join(labels.as("o"), Seq("node"))
        .filter(col("n.lbl") =!= col("o.lbl")).limit(1).count()
      labels = jumped
      converged = changed == 0
    }
    labels.select(col("node"), col("lbl").as("head"))
  }

  /** Connected components over the undirected view of the edge table.
    * Min-label propagation fused with pointer jumping — the
    * hash-to-min scheme — converging in O(log diameter) rounds.
    */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // Materialized once: every iteration (and its convergence check)
    // joins against sym — recomputing the upstream derivation per
    // round dominated runtime before this checkpoint.
    val sym = edges.select("src", "dst")
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .localCheckpoint()
    var labels = vertices(sym).select(col("node"), col("node").as("lbl")).localCheckpoint()
    var converged = false
    var iter = 0
    // extra rounds past the fixpoint are idempotent, so the (job-
    // launching) convergence check only runs every other round
    while (!converged && iter < 64) {
      iter += 1
      val nbrMin = sym.join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("node")).agg(min("lbl").as("nlbl"))
      val merged = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"), least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
      val jumped = merged.as("a")
        .join(labels.as("b"), col("a.lbl") === col("b.node"), "left")
        .select(col("a.node").as("node"),
          least(col("a.lbl"), coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"))
        .localCheckpoint()
      if (iter % 2 == 0 || iter >= 62) {
        val changed = jumped.as("n").join(labels.as("o"), Seq("node"))
          .filter(col("n.lbl") =!= col("o.lbl")).limit(1).count()
        converged = changed == 0
      }
      labels = jumped
    }
    labels.select(col("node"), col("lbl").as("component"))
  }

  /** Undirected triangle count (single row `n_triangles`). Canonical
    * a<b<c orientation — each triangle counted exactly once; two hash
    * joins, the standard distributed formulation.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = edges.select(least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint() // scanned 3× by the wedge + closing joins
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
    // Materialize the static inputs once; each iteration joins against
    // them and must not re-derive the upstream edge plan.
    val e = edges.select("src", "dst").localCheckpoint()
    val verts = vertices(e).localCheckpoint()
    val n = verts.count().toDouble
    val outdeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    var ranks = verts.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e.join(ranks, col("src") === col("node"))
        .join(outdeg.withColumnRenamed("node", "src2"), col("src") === col("src2"))
        .select(col("dst").as("node"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("node").agg(sum("c").as("insum"))
      ranks = verts.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) * coalesce(col("insum"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 6).as("rank"))
  }
}
