package graft

import org.apache.spark.sql.functions._

/** Round-4 additions: cohort retention, moving-window anomaly flag,
  * skyline sweep. Each checked against an independent in-test
  * re-derivation (not the DuckDB oracle, which the driver runs
  * separately).
  */
class CohortRetentionSpec extends SparkSpec {

  test("cohort cells count distinct users, weeks_since from first activity") {
    val out = SparkEntry.queries("q49_cohort_retention")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // re-derive naively from the raw table
    val ev = Tables.eventsWithEpoch(spark, sfDir)
      .select(col("user_id"), expr("t div 604800").as("wk"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = ev.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).min }
    val expected = ev.map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .distinct.groupBy(t => (t._1, t._2)).map { case (k, v) => k -> v.size.toLong }
    assert(out == expected)
    // week 0 of every cohort contains the whole cohort by definition
    val sizes = cohort.groupBy(_._2).map { case (w, m) => w -> m.size.toLong }
    sizes.foreach { case (w, n) => assert(out((w, 0L)) == n) }
  }
}

class MovingWindowAnomalySpec extends SparkSpec {

  test("RANGE frame shrinks across calendar gaps; spike test is integral") {
    val rows = SparkEntry.queries("q50_moving_window_anomaly")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { rs =>
      val days = rs.map(_._2)
      rs.foreach { case (_, day, cnt, winSum, winN, hot) =>
        val inWin = rs.filter(r => r._2 >= day - 6 && r._2 <= day)
        assert(winN == inWin.length, s"win_n at day $day")
        assert(winSum == inWin.map(_._3).sum, s"win_sum at day $day")
        assert(hot == (if (cnt * winN > 2 * winSum) 1 else 0))
      }
      assert(days.distinct.length == days.length)
    }
  }
}

class SkylineSpec extends SparkSpec {

  test("sweep output equals the quadratic Pareto definition") {
    val out = SparkEntry.queries("q51_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 400000 && col("o_orderpriority") === "1-URGENT")
      .select(
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = cand.filter { case (d1, c1) =>
      !cand.exists { case (d2, c2) =>
        d2 >= d1 && c2 >= c1 && (d2 > d1 || c2 > c1)
      }
    }
    assert(out == expected)
    assert(out.nonEmpty)
    // skyline is an antichain: strictly increasing price as day falls
    val sorted = out.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq((_, c1), (_, c2)) => assert(c1 > c2)
      case _ =>
    }
  }
}

class FingerprintModSpec extends SparkSpec {
  import spark.implicits._

  private def naive(text: String, k: Int, w: Int): Set[Long] = {
    val P = graft.operators.TextAnalysis.FingerprintP
    val B = graft.operators.TextAnalysis.FingerprintBase
    if (text.length < k + w - 1) Set.empty
    else {
      val hs = text.sliding(k).map(g =>
        g.foldLeft(0L)((h, c) => (h * B + (c & 0x7F)) % P)).toArray
      hs.sliding(w).map(_.min).toSet
    }
  }

  test("mod-P rolling hash equals the positional polynomial; winnowing guarantee holds") {
    val shared = "this exact run of characters is quite long indeed"
    val docs = Seq(
      1L -> s"prefix one $shared suffix alpha",
      2L -> s"a different beginning $shared and ending",
      3L -> "completely unrelated content with zero overlap at all xyzzy")
    val df = docs.toDF("doc_id", "text")
    val fp = graft.operators.TextAnalysis.fingerprintsMod(df, "doc_id", "text", 20, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fp.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    docs.foreach { case (id, text) =>
      assert(byDoc.getOrElse(id, Set.empty) == naive(text, 20, 8), s"doc $id")
    }
    // shared is 50 chars ≥ k+w−1=27 → docs 1 and 2 must collide
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
  }
}

class EditDistanceDedupSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint candidates verified by relative Levenshtein") {
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val docs = Seq(
      1L -> base,
      2L -> base.replace("quick", "quack"),          // 1 edit, ~1.5%
      3L -> base.replace("again and again and again", "never ever at all whatsoever"), // big tail edit
      4L -> "something entirely different that shares no long substring here")
    val out = graft.operators.Dedup.editDistancePairs(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 20, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = out.map(t => (t._1, t._2)).toSet
    assert(pairs.contains((1L, 2L)))
    assert(out.find(t => t._1 == 1L && t._2 == 2L).get._3 == 1L)
    // doc 3 shares a long prefix (candidate) but fails the 20% verify
    assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L)))
    out.foreach { case (a, b, _) => assert(a < b) }
  }

  test("substring profile: unique docs score 0, clones score 10000") {
    val t1 = "every one of these characters appears exactly once in the corpus"
    val t3 = "zz completely disjoint text with its own private characters qqq zz"
    val docs = Seq(1L -> t1, 2L -> t1, 3L -> t3)
    val p = graft.operators.Dedup.substringDupProfile(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 20, w = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(p(1L)._3 == 10000L && p(2L)._3 == 10000L)
    assert(p(3L)._2 == 0L && p(3L)._3 == 0L)
  }
}

class SccSpec extends SparkSpec {
  import spark.implicits._

  test("two cycles joined by a path: cycles settle, bridge nodes are singletons") {
    // cycle A {1,2,3}, bridge 3→10→11→4, cycle B {4,5,6}, tip 20→1.
    // Round 1 can only settle cycle A (cycle B sees A's smaller labels
    // through the bridge, f≠b); cycle B needs the second peel round —
    // this pins the outer loop, not just one fw/bw pass.
    val edges = Seq(
      1L -> 2L, 2L -> 3L, 3L -> 1L,
      3L -> 10L, 10L -> 11L, 11L -> 4L,
      4L -> 5L, 5L -> 6L, 6L -> 4L,
      20L -> 1L).toDF("src", "dst")
    val out = graft.graph.GraphOps.scc(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L,
      10L -> 10L, 11L -> 11L, 20L -> 20L)
    assert(out == expected)
  }

  test("pure DAG: every vertex is its own SCC (all settled by trim)") {
    val edges = Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L).toDF("src", "dst")
    val out = graft.graph.GraphOps.scc(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }
}

class SsspSpec extends SparkSpec {
  import spark.implicits._

  test("weighted relaxation beats hop-optimal paths") {
    // 1→2→3 costs 1+1=2; direct 1→3 costs 5 → weighted picks the
    // 2-hop path where BFS would pick the 1-hop edge.
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 5L),
      (3L, 4L, 2L)).toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val out = graft.graph.GraphOps.sssp(edges, seeds, maxRounds = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 4L))
  }

  test("unreachable vertices are absent; multi-seed takes the min") {
    val edges = Seq((1L, 2L, 3L), (5L, 2L, 1L), (8L, 9L, 1L)).toDF("src", "dst", "w")
    val seeds = Seq(1L, 5L).toDF("node")
    val out = graft.graph.GraphOps.sssp(edges, seeds, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 5L -> 0L, 2L -> 1L))
  }
}

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("mergeAggDeltas: incremental maintenance equals recompute, empty groups vanish") {
    val prevRows = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
    val prev = prevRows.toDF("k", "v")
    val nextRows = Seq((1L, 10L), (1L, 25L), (4L, 9L)) // 20→25 upd, del k=2/k=3, ins k=4
    val prevAgg = prev.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val deltas = Seq(
      (1L, -1L, -20L), (1L, 1L, 25L), // update as del+ins
      (2L, -1L, -5L), (3L, -1L, -7L), // deletes
      (4L, 1L, 9L)).toDF("k", "n", "s")
    val out = graft.operators.Snapshot.mergeAggDeltas(prevAgg, deltas, Seq("k"), "n", Seq("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = nextRows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == recomputed)
    assert(!out.exists(_._1 == 2L)) // zero-count group dropped
  }
}

class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  test("clone payloads pair at hamming 0; unrelated payloads don't pair") {
    val base = ("A" * 40) + ("z" * 40) + ("A" * 40) // strong positional structure
    val other = ("0" * 25) + ("Z" * 95)             // different shape entirely
    val docs = Seq(1L -> base, 2L -> base, 3L -> other)
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = graft.operators.Multimodal.perceptualHashPairs(docs, "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSet == Set((1L, 2L, 0L)))
  }
}

class AsofDirectedPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val lefts = (0 until 300).map(i =>
    (i.toLong, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)) // (lid, key, t)
  private val rights = (0 until 300).map(i =>
    (1000L + i, rng.nextInt(8).toLong, rng.nextInt(1000).toLong)) // (rid, key, rt)

  test("directed(backward, no tolerance) is exactly apply()") {
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("rid", "k", "rt").select("k", "rt", "rid")
    val base = graft.operators.AsofJoin(l, r, "k", "t", "rt")
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val dir = graft.operators.AsofJoin.directed(l, r, "k", "t", "rt",
        forward = false, tolerance = None)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(base == dir)
    assert(base.nonEmpty)
  }

  test("forward matches the naive nearest-following-row definition, tolerance masks") {
    val l = lefts.toDF("lid", "k", "t")
    val r = rights.toDF("rid", "k", "rt").select("k", "rt", "rid")
    val tol = 50L
    val out = graft.operators.AsofJoin.directed(l, r, "k", "t", "rt",
        forward = true, tolerance = Some(tol))
      .select("lid", "rid", "asof_gap")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(x => x._1 -> (x._2, x._3)).toMap
    for ((lid, k, t) <- lefts) {
      val cands = rights.filter(x => x._2 == k && x._3 >= t)
      val expected =
        if (cands.isEmpty) (None, None)
        else {
          // nearest rt; tie-break greatest payload struct (rt, rid)
          val best = cands.minBy(x => (x._3, -x._1))
          if (best._3 - t <= tol) (Some(best._1), Some(best._3 - t)) else (None, None)
        }
      assert(out(lid) == expected, s"left $lid (k=$k,t=$t)")
    }
  }
}

class SsspBfsEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  test("sssp with unit weights equals bfs hop depth on a random graph") {
    val rng = new scala.util.Random(11)
    val edges = (0 until 400).map(_ =>
      (rng.nextInt(120).toLong, rng.nextInt(120).toLong)).filter(e => e._1 != e._2).distinct
    val e = edges.toDF("src", "dst")
    val seeds = Seq(0L, 7L, 63L).toDF("node")
    val viaBfs = graft.graph.GraphOps.bfs(e, seeds, maxDepth = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaSssp = graft.graph.GraphOps.sssp(
        e.withColumn("w", lit(1L)), seeds, maxRounds = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaBfs == viaSssp)
    assert(viaBfs.nonEmpty)
  }
}

class IslandsSpec extends SparkSpec {
  import spark.implicits._

  test("coalesced intervals are disjoint, ordered, and cover every input") {
    val rows = SparkEntry.queries("q54_interval_coalesce")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1) // strict gap
        case _ =>
      }
      rs.foreach { case (_, s, e, n) => assert(e > s && n >= 1) }
    }
    // island event counts add up to the user's distinct interval count
    val iv = Tables.eventsWithEpoch(spark, sfDir)
      .select(col("user_id"), col("t"))
      .filter(col("user_id") < 40).select(col("user_id"), col("t")).distinct()
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = rows.groupBy(_._1).map { case (u, rs) => u -> rs.map(_._4).sum }
    assert(byUser == iv)
  }

  test("streaks match a naive per-user re-derivation") {
    val out = SparkEntry.queries("q55_streaks")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val days = Tables.eventsWithEpoch(spark, sfDir)
      .select(col("user_id"), expr("t div 86400").as("day"))
      .filter(col("user_id") < 100).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    days.groupBy(_._1).foreach { case (u, ds) =>
      val sorted = ds.map(_._2).sorted
      // fold into (start, len) runs of consecutive days
      val runs = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, l) :: tail, d) if d == s + l => (s, l + 1) :: tail
        case (acc, d) => (d, 1L) :: acc
      }
      val best = runs.map { case (s, l) => (l, s) }.sortBy(t => (-t._1, t._2)).head
      assert(out(u) == best, s"user $u")
    }
  }
}

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("credit conserves: exactly 10000 bp per converted purchase") {
    val rows = SparkEntry.queries("q59_attribution")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val totalCredit = rows.map(_._2).sum
    // distinct purchases with >=1 touch in window (union across touch
    // types can overlap, so recount from the raw table)
    val e = Tables.eventsWithEpoch(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("t"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("t").as("pt"))
    val tc = e.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("t").as("tt"))
    val converted = p.join(tc, Seq("user_id"))
      .filter(col("tt") <= col("pt") && col("tt") > col("pt") - 86400L)
      .select("pid").distinct().count()
    assert(totalCredit == 10000L * converted)
  }
}

class PileupWalkSpec extends SparkSpec {
  import spark.implicits._

  test("pileup mass equals total read bases (40 per read)") {
    val rows = SparkEntry.queries("g18_coverage_pileup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mass = rows.map(r => r._2 * r._3).sum
    val nReads = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 40)
      .select(expr("(length(text) - 40) div 25 + 1").as("n"))
      .agg(sum("n")).first().getLong(0)
    assert(mass == 40L * nReads)
    rows.foreach { case (_, depth, np) => assert(depth >= 1 && np >= 1) }
  }

  test("every walk step follows a real edge and the walk is reproducible") {
    val q = SparkEntry.queries("g19_random_walks")
    val out = q(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val again = q(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.sameElements(again.sorted)) // deterministic
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("o_orderdate", "k")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_orderdate"))
      .withColumn("n1", lead("k", 1).over(w)).withColumn("n2", lead("k", 2).over(w))
    val edges = (o.filter(col("n1").isNotNull).select(col("k"), col("n1").as("n")) unionByName
      o.filter(col("n2").isNotNull).select(col("k"), col("n2").as("n")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.groupBy(_._1).values.foreach { steps =>
      val path = steps.sortBy(_._2).map(_._3)
      path.sliding(2).foreach {
        case Array(a, b) => assert(edges.contains((a, b)), s"$a->$b not an edge")
        case _ =>
      }
    }
  }
}

class IncrementalMinhashSpec extends SparkSpec {
  import spark.implicits._

  test("incremental probe equals the full run filtered to batch-touching pairs") {
    val docs = Tables.documents(spark, sfDir)
    val full = graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.95)
      .filter(col("a") % 10 === 0 || col("b") % 10 === 0)
      .select("a", "b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val inc = graft.operators.Dedup.incrementalMinhashPairs(
        existing = docs.filter(col("doc_id") % 10 =!= 0),
        batch = docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", numHashes = 64, bands = 16, threshold = 0.95)
      .as[(Long, Long, Double)].collect().toSet
    assert(inc == full)
    assert(inc.nonEmpty)
  }
}

class Round4PlanSpec extends SparkSpec {

  private def scans(name: String): Int = {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString
    "(?i)scan parquet".r.findAllIn(plan).size
  }

  test("single-exchange rewrites stay single-scan") {
    // q49/g17/g18 were rewritten from aggregate+join-back (2 scans)
    // to one-pass window forms; d14 likewise. Guard the plan shape —
    // a regression here doubles the scan cost silently.
    assert(scans("q49_cohort_retention") == 1)
    assert(scans("g17_read_correction") == 1)
    assert(scans("g18_coverage_pileup") == 1)
    assert(scans("d14_substring_profile") == 1)
    assert(scans("t13_code_prose") == 1)
  }
}

class RandomDataPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(99)

  test("interval coalescing on random intervals equals a naive sweep merge") {
    val iv = (0 until 400).map { _ =>
      val s = rng.nextInt(500).toLong
      (rng.nextInt(6).toLong, s, s + 1 + rng.nextInt(40))
    }.distinct
    val df = iv.toDF("k", "s", "e")
    val wOrd = org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("s", "e")
    val prevMaxEnd = max("e").over(wOrd.rowsBetween(Long.MinValue, -1))
    val out = df
      .withColumn("ni", (col("s") > coalesce(prevMaxEnd, lit(-1L))).cast("long"))
      .withColumn("island", sum("ni").over(wOrd.rowsBetween(Long.MinValue, 0)))
      .groupBy("k", "island").agg(min("s").as("s"), max("e").as("e"))
      .select("k", "s", "e")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive per-key sweep
    val expected = iv.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(identity)
      val merged = sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((cs, ce) :: tail, (s, e)) if s <= ce => (cs, math.max(ce, e)) :: tail
        case (acc, (s, e)) => (s, e) :: acc
      }
      merged.map { case (s, e) => (k, s, e) }
    }.toSet
    assert(out == expected)
  }

  test("mergeAggDeltas equals recompute for random diffs, repeatedly") {
    for (trial <- 1 to 3) {
      val r = new scala.util.Random(trial)
      val prev = (0 until 200).map(_ => (r.nextInt(20).toLong, r.nextInt(100).toLong))
      // random mutation: drop ~1/3, keep ~1/3, modify ~1/3, add new rows
      val kept = prev.zipWithIndex.collect { case (row, i) if i % 3 == 0 => row }
      val modified = prev.zipWithIndex.collect { case ((k, v), i) if i % 3 == 1 => (k, v + 7) }
      val added = (0 until 60).map(_ => (r.nextInt(25).toLong, r.nextInt(100).toLong))
      val next = kept ++ modified ++ added
      val prevAgg = prev.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
      val deltas =
        prev.map { case (k, v) => (k, -1L, -v) }.toDF("k", "n", "s")
          .unionByName(next.map { case (k, v) => (k, 1L, v) }.toDF("k", "n", "s"))
      val out = graft.operators.Snapshot.mergeAggDeltas(prevAgg, deltas, Seq("k"), "n", Seq("s"))
        .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2))).toSet
      val expected = next.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum("v").as("s"))
        .collect().map(r2 => (r2.getLong(0), r2.getLong(1), r2.getLong(2))).toSet
      assert(out == expected, s"trial $trial")
    }
  }

  test("skyline sweep equals the quadratic definition on random points") {
    val pts = (0 until 300).map(_ => (rng.nextInt(60).toLong, rng.nextInt(1000).toLong)).distinct
    val dayMax = pts.toDF("day", "cents").groupBy("day").agg(max("cents").as("cents"))
    val later = org.apache.spark.sql.expressions.Window.orderBy(col("day").desc)
      .rangeBetween(Long.MinValue, -1)
    val out = dayMax.withColumn("ml", max("cents").over(later))
      .filter(col("cents") > coalesce(col("ml"), lit(-1L)))
      .select("day", "cents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = pts.filter { case (d1, c1) =>
      !pts.exists { case (d2, c2) => d2 >= d1 && c2 >= c1 && (d2 > d1 || c2 > c1) }
    }.toSet
    assert(out == expected)
  }
}
