package graft

import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Round-3 additions: double-strand overlap construction and the
  * in-operator hot-anchor guard for degenerate (low-complexity) read
  * sets.
  */
class OverlapRCSpec extends SparkSpec {
  import spark.implicits._

  test("RC overlaps: a read overlapping another's reverse complement is found") {
    // rc(r2) = rc("AACCGGTT") = "AACCGGTT" is NOT what we want; build
    // explicitly: r1 ends with "CCGG"; rc(r2) starts with "CCGG" means
    // r2 ends with rc("CCGG") = "CCGG". Use asymmetric strings:
    // r1 = "AAAATTCCGG" (suffix CCGG), r2 with rc(r2) = "CCGGAAAA..."
    // → r2 = rc("CCGGAAAATT") = "AATTTTCCGG".
    val reads = Seq((2L, "AAAATTCCGG"), (4L, "AATTTTCCGG")).toDF("id", "seq")
    val e = GraphOps.overlapEdgesRC(reads, "id", "seq", 4, 4)
      .as[(Long, String, Long, String, Int)].collect().toSet
    // forward suffix of 2 is "CCGG"; '-' orientation of 4 is
    // rc("AATTTTCCGG") = "CCGGAAAATT", whose prefix is "CCGG" → edge
    // (2,+) → (4,-); and the mirror representation (4,+) → (2,-):
    // suffix of 4 is "CCGG", rc(2) = "CCGGAATTTT" starts with "CCGG".
    assert(e.contains((2L, "+", 4L, "-", 4)))
    assert(e.contains((4L, "+", 2L, "-", 4)))
    // no forward-forward edge: prefix of 4 is "AATT" ≠ "CCGG"
    assert(!e.contains((2L, "+", 4L, "+", 4)))
  }

  test("RC overlaps exclude self-pairs in every orientation combination") {
    // palindromic-ish read: rc("ACGT") = "ACGT" — still no self edges
    val reads = Seq((1L, "ACGTACGT")).toDF("id", "seq")
    assert(GraphOps.overlapEdgesRC(reads, "id", "seq", 4, 4).count() == 0L)
  }

  test("strand-flipped sliding windows reconnect across strands") {
    // windows of one 65-char string, stride 25, width 40 → w0, w1
    // overlap by 15; store w1 as its reverse complement (odd id).
    val text = "ACGTTGCAACGGTTCCAAGGTTTTCCCCGGGGAAAATTTTCCGGTTAACCGGTTAAGGCCTTAAG"
    val w0 = text.substring(0, 40)
    val w1 = text.substring(25, 65)
    def rc(s: String) = s.reverse.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A'; case c => c
    }
    val reads = Seq((0L, w0), (1L, rc(w1))).toDF("id", "seq")
    val e = GraphOps.overlapEdgesRC(reads, "id", "seq", 13, 17)
      .as[(Long, String, Long, String, Int)].collect().toSet
    assert(e.contains((0L, "+", 1L, "-", 15))) // w0 suffix meets rc-strand w1 prefix
    assert(e.contains((1L, "+", 0L, "-", 15))) // the mirror representation
  }
}

class HotAnchorCapSpec extends SparkSpec {
  import spark.implicits._

  test("low-complexity read set: anchor cap bounds candidate pairs") {
    // 200 identical poly-A reads — every anchor identical; uncapped
    // this is 200×199 pairs. Cap 10 keeps ≤10 rows per anchor bucket
    // per side, so the output is bounded by cap², independent of n.
    val reads = (1L to 200L).map(i => (i, "A" * 40)).toDF("id", "seq")
    val capped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 10)
      .count()
    assert(capped > 0L, "cap must not destroy all candidates")
    assert(capped <= 100L, s"anchor cap must bound pairs, got $capped")
  }

  test("anchor cap never binds on diverse reads (same output as uncapped)") {
    // stride-25 windows of a seeded random ACGT string: consecutive
    // windows genuinely overlap by 15, and random 13-mer anchors never
    // collide across windows, so a small cap must not change anything.
    val rng = new scala.util.Random(42)
    val genome = Array.fill(540)("ACGT"(rng.nextInt(4))).mkString
    val reads = (0 to 20).map(i => (i.toLong, genome.substring(i * 25, i * 25 + 40)))
      .toDF("id", "seq")
    val capped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 5)
      .as[(Long, Long, Int)].collect().toSet
    val uncapped = GraphOps.overlapEdges(reads, "id", "seq", 13, 17, anchorCap = 0)
      .as[(Long, Long, Int)].collect().toSet
    assert(capped == uncapped)
    assert(uncapped.size >= 20, "consecutive windows must overlap")
  }
}
