package graft

import graft.graph.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("degrees") {
    val d = GraphOps.degrees(edges((1L, 2L), (1L, 3L), (2L, 3L)))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d(1L) == ((2L, 0L)))
    assert(d(2L) == ((1L, 1L)))
    assert(d(3L) == ((0L, 2L)))
  }

  test("transitive reduction removes the skip edge of a triangle") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L))
    val kept = GraphOps.transitiveReduction(e).as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L), (2L, 3L)))
  }

  test("tip removal drops edges into dead ends") {
    val e = edges((1L, 2L), (2L, 3L), (2L, 4L))
    val kept = GraphOps.tipRemoval(e).select("src", "dst").as[(Long, Long)].collect().toSet
    assert(kept == Set((1L, 2L))) // 3 and 4 have no outgoing edges
  }

  test("bubbles finds the diamond") {
    val e = edges((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val b = GraphOps.bubbles(e).as[(Long, Long, Long, Long)].collect().toSet
    assert(b == Set((1L, 2L, 3L, 4L)))
  }

  test("unitigs compress a chain to its head") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
    val u = GraphOps.unitigs(e).as[(Long, Long)].collect().toMap
    assert(u == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("unitigs exclude branch vertices from chains") {
    // 1→2→3 but 2 also →4: 2 has outdeg 2, so only edges with
    // outdeg-1 src and indeg-1 dst survive as chain edges
    val e = edges((1L, 2L), (2L, 3L), (2L, 4L))
    val u = GraphOps.unitigs(e).as[(Long, Long)].collect().toMap
    assert(u(1L) == 1L && u(2L) == 1L) // 1→2 is a chain edge
    assert(!u.contains(3L) && !u.contains(4L))
  }

  test("connected components across two chains") {
    val e = edges((1L, 2L), (2L, 3L), (10L, 11L))
    val c = GraphOps.connectedComponents(e).as[(Long, Long)].collect().toMap
    assert(c == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("triangle count on two triangles sharing an edge") {
    val e = edges((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    val n = GraphOps.triangleCount(e).as[Long].head()
    assert(n == 2L)
  }

  test("pagerank is deterministic and mass-bounded") {
    val e = edges((1L, 2L), (2L, 3L), (3L, 1L))
    val pr = GraphOps.pagerank(e, iters = 10).as[(Long, Double)].collect().toMap
    // a 3-cycle is symmetric: every vertex converges to 1/3
    assert(pr.values.forall(v => math.abs(v - 1.0 / 3) < 1e-3))
  }
}
