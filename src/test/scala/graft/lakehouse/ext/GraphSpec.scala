package graft.lakehouse.ext

import graft.lakehouse.SparkSuite

/** Fixed-point PageRank: hand-computed values on a 3-path, exact mass
  * conservation up to the documented quantization, and symmetry. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  test("one iteration on the path 1-2-3 matches the hand computation") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 1)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
      .toMap
    // N=3, r0 = 1e12/3 = 333333333333, base = 15e12/300 = 50000000000
    // endpoints get (85 * (r0 div 2)) div 100, the middle gets 85% of 2*r0
    assert(out == Map(
      1L -> 191666666666L,
      2L -> 616666666666L,
      3L -> 191666666666L))
  }

  test("rank mass is conserved up to quantization; symmetric graph gives " +
      "symmetric ranks; determinism across runs") {
    val edges = (for (i <- 1L to 40L) yield (i, i % 40 + 1))
      .toDF("src", "dst") // a 40-cycle: perfectly symmetric
    val out = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
    assert(out.length == 40)
    // every vertex identical on a vertex-transitive graph
    assert(out.map(_._2).distinct.length == 1)
    val total = out.map(_._2).sum
    assert(math.abs(total - Graph.Unit) <= 40L * 100L,
      s"mass drifted: $total vs ${Graph.Unit}")
    val again = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
    assert(again.sortBy(_._1).sameElements(out.sortBy(_._1)))
  }

  test("hub outranks leaves on a star") {
    val edges = (2L to 9L).map(i => (1L, i)).toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("rank_units"))
      .toMap
    assert((2L to 9L).forall(l => ranks(1L) > ranks(l)))
    assert((2L to 9L).map(ranks).distinct.size == 1)
  }
}
