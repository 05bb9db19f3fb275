package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}
import graft.graph.GraphOps

/** SORA-core graph reduction, exercised against DuckDB oracles on
  * graphs derived *deterministically* from the relational test tables:
  *
  *  - chain(+skip) graph: per-customer order chains ordered by
  *    (o_orderdate, o_orderkey); `skip` adds i→i+2 edges, which makes
  *    every skip edge transitively redundant and every (i,i+1,i+2) a
  *    directed triangle.
  *  - diamond graph: consecutive diamonds u→{a,b}→w — the canonical
  *    simple-bubble pattern.
  */
object GraphQueries {

  private def chainEdges(s: SparkSession, d: String, withSkip: Boolean): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "k")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_orderdate"))
      .withColumn("n1", lead("k", 1).over(w))
      .withColumn("n2", lead("k", 2).over(w))
    val e1 = o.filter(col("n1").isNotNull).select(col("k").as("src"), col("n1").as("dst"))
    if (!withSkip) e1
    else e1.union(o.filter(col("n2").isNotNull).select(col("k").as("src"), col("n2").as("dst")))
  }

  /** Shared DuckDB CTE body for the chain(+skip) edge table. */
  private def chainSql(withSkip: Boolean): String = {
    val base = """r AS (SELECT o_orderkey AS k,
      |  lead(o_orderkey,1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS n1,
      |  lead(o_orderkey,2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS n2
      |  FROM orders)""".stripMargin
    val e =
      if (withSkip)
        "e AS (SELECT k AS src, n1 AS dst FROM r WHERE n1 IS NOT NULL UNION ALL SELECT k, n2 FROM r WHERE n2 IS NOT NULL)"
      else
        "e AS (SELECT k AS src, n1 AS dst FROM r WHERE n1 IS NOT NULL)"
    s"$base,\n$e"
  }

  /** Diamond graph: orders row r (0-based, ordered by o_orderkey) emits
    * one edge of diamond j=r/4: u=3j, a=3j+1, b=3j+2, w=3j+3.
    * Note: the global row_number is a test-data derivation device, not
    * an operator — real edge inputs arrive pre-materialized.
    */
  private def diamondEdges(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select("o_orderkey")
      .withColumn("r", (row_number().over(Window.orderBy("o_orderkey")) - 1).cast("long"))
      .select(
        expr("CASE r%4 WHEN 0 THEN 3*(r div 4) WHEN 1 THEN 3*(r div 4) WHEN 2 THEN 3*(r div 4)+1 ELSE 3*(r div 4)+2 END").as("src"),
        expr("CASE r%4 WHEN 0 THEN 3*(r div 4)+1 WHEN 1 THEN 3*(r div 4)+2 ELSE 3*(r div 4)+3 END").as("dst"))

  private val diamondSql =
    """o AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS r FROM orders),
      |e AS (SELECT
      |  CASE r%4 WHEN 0 THEN 3*(r//4) WHEN 1 THEN 3*(r//4) WHEN 2 THEN 3*(r//4)+1 ELSE 3*(r//4)+2 END AS src,
      |  CASE r%4 WHEN 0 THEN 3*(r//4)+1 WHEN 1 THEN 3*(r//4)+2 ELSE 3*(r//4)+3 END AS dst
      |FROM o)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("g1_degrees",
      (s, d) => GraphOps.degrees(chainEdges(s, d, withSkip = true)).orderBy("node"),
      Some(s"""WITH ${chainSql(true)},
              |outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
              |ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS indeg FROM e GROUP BY 1)
              |SELECT coalesce(outd.node, ind.node) AS node,
              |  coalesce(outdeg, 0) AS outdeg, coalesce(indeg, 0) AS indeg
              |FROM outd FULL OUTER JOIN ind ON outd.node = ind.node
              |ORDER BY node""".stripMargin)),

    Q("g2_transitive_reduction",
      (s, d) => GraphOps.transitiveReduction(chainEdges(s, d, withSkip = true))
        .orderBy("src", "dst"),
      Some(s"""WITH ${chainSql(true)},
              |p AS (SELECT e1.src AS src, e2.dst AS dst FROM e e1 JOIN e e2 ON e1.dst = e2.src)
              |SELECT src, dst FROM e
              |WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.src = e.src AND p.dst = e.dst)
              |ORDER BY src, dst""".stripMargin)),

    Q("g3_tip_removal",
      (s, d) => GraphOps.tipRemoval(chainEdges(s, d, withSkip = false))
        .select("src", "dst").orderBy("src", "dst"),
      Some(s"""WITH ${chainSql(false)}
              |SELECT src, dst FROM e
              |WHERE EXISTS (SELECT 1 FROM e e2 WHERE e2.src = e.dst)
              |ORDER BY src, dst""".stripMargin)),

    Q("g4_bubbles",
      (s, d) => GraphOps.bubbles(diamondEdges(s, d)).orderBy("u"),
      Some(s"""WITH $diamondSql,
              |deg AS (
              |  SELECT n.node,
              |    (SELECT count(*) FROM e WHERE e.src = n.node) AS outdeg,
              |    (SELECT count(*) FROM e WHERE e.dst = n.node) AS indeg
              |  FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) n),
              |interior AS (SELECT node FROM deg WHERE indeg = 1 AND outdeg = 1),
              |arm AS (
              |  SELECT e1.src AS u, e1.dst AS m, e2.dst AS w
              |  FROM e e1 JOIN e e2 ON e1.dst = e2.src
              |  WHERE e1.dst IN (SELECT node FROM interior))
              |SELECT x.u AS u, x.m AS a, y.m AS b, x.w AS w
              |FROM arm x JOIN arm y ON x.u = y.u AND x.w = y.w AND x.m < y.m
              |ORDER BY 1, 2, 3, 4""".stripMargin)),

    Q("g5_unitigs",
      (s, d) => GraphOps.unitigs(chainEdges(s, d, withSkip = false)).orderBy("node"),
      Some(s"""WITH RECURSIVE ${chainSql(false)},
              |outd AS (SELECT src, count(*) c FROM e GROUP BY 1),
              |ind AS (SELECT dst, count(*) c FROM e GROUP BY 1),
              |ch AS (SELECT e.src, e.dst FROM e
              |  JOIN outd ON outd.src = e.src AND outd.c = 1
              |  JOIN ind ON ind.dst = e.dst AND ind.c = 1),
              |heads AS (SELECT DISTINCT src AS node FROM ch
              |  WHERE src NOT IN (SELECT dst FROM ch)),
              |walk(node, head) AS (
              |  SELECT node, node FROM heads
              |  UNION ALL
              |  SELECT ch.dst, walk.head FROM walk JOIN ch ON ch.src = walk.node)
              |SELECT node, head FROM walk ORDER BY node""".stripMargin)),

    Q("g6_connected_components",
      (s, d) => GraphOps.connectedComponents(chainEdges(s, d, withSkip = false))
        .orderBy("node"),
      Some(s"""WITH RECURSIVE ${chainSql(false)},
              |e2 AS (SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
              |nodes AS (SELECT DISTINCT a AS node FROM e2),
              |walk(node, lbl) AS (
              |  SELECT node, node FROM nodes
              |  UNION
              |  SELECT e2.b, walk.lbl FROM walk JOIN e2 ON e2.a = walk.node
              |  WHERE walk.lbl < e2.b)
              |SELECT node, min(lbl) AS component FROM walk GROUP BY 1 ORDER BY 1""".stripMargin)),

    Q("g7_triangles",
      (s, d) => GraphOps.triangleCount(chainEdges(s, d, withSkip = true)),
      Some(s"""WITH ${chainSql(true)},
              |c AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b
              |      FROM e WHERE src <> dst)
              |SELECT CAST(count(*) AS BIGINT) AS n_triangles
              |FROM c c1 JOIN c c2 ON c1.b = c2.a JOIN c c3 ON c3.a = c1.a AND c3.b = c2.b""".stripMargin)),

    Q("g8_pagerank",
      (s, d) => GraphOps.pagerank(chainEdges(s, d, withSkip = true), iters = 5)
        .orderBy("node"),
      None),

    Q("g9_kmers",
      (s, d) => Tables.documents(s, d)
        .select(explode(expr(
          "transform(sequence(1, greatest(length(text)-4, 0)), i -> substring(text, i, 5))"))
          .as("kmer"))
        .groupBy("kmer").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 20)
        .orderBy("kmer"),
      Some("""SELECT kmer, CAST(count(*) AS BIGINT) AS cnt FROM (
             |  SELECT substr(text, CAST(i AS INT), 5) AS kmer FROM (
             |    SELECT text, unnest(generate_series(1, greatest(length(text)-4, 0))) AS i
             |    FROM documents))
             |GROUP BY 1 HAVING count(*) >= 20 ORDER BY 1""".stripMargin))
  )
}
