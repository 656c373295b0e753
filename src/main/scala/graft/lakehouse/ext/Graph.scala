package graft.lakehouse.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge lists (the representation that
  * scales: adjacency stays sharded, iterations are joins + partial-agg
  * shuffles, nothing is ever collected). Connected components lives in
  * [[Dedup.connectedComponents]]; this hosts rank-style iteration.
  */
object Graph {

  /** One rank unit = 1e-12 of total rank mass. */
  val Unit: Long = 1000000000000L

  /** Fixed-point PageRank over the UNDIRECTED graph of `edges`:
    * `iterations` rounds of
    * `r'(v) = (100-d)·U/(100·N) + (d · Σ_{u~v} (r(u) div deg(u))) div 100`
    * with every quantity a BIGINT count of 1e-12 rank units and every
    * division a floor division — so the result is bit-identical on ANY
    * engine (plain float PageRank is partition-order-dependent: the
    * contribution sum is an unordered IEEE reduction). The deliberate
    * quantization error is ≤ deg(u) units (~1e-12) per vertex per round —
    * irrelevant for ranking, essential for cross-engine verification.
    *
    * Scale shape: the symmetrized edge list is computed once and
    * persisted; each round is one broadcast-or-shuffle join of ranks onto
    * edges plus one partial-aggregated shuffle on the destination key —
    * O(E) per round, the textbook distributed PageRank plan. Ranks are
    * eagerly localCheckpoint'ed each round so the plan never grows with
    * the iteration count (the same flat-lineage trick as connected
    * components). Output: (v, rank_units, rank). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val sym = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .union(edges.select(col(dstCol).cast("long").as("src"),
        col(srcCol).cast("long").as("dst")))
      .distinct()
      .persist()
    val deg = sym.groupBy(col("src").as("v"))
      .agg(count(lit(1)).as("deg")).persist()
    try {
      val n = deg.count()
      require(n > 0, "empty graph")
      val base = ((100L - dampingPct) * Unit) / (100L * n)
      var ranks = deg.select(col("v"), lit(Unit / n).as("rank_units"))
        .localCheckpoint()
      for (_ <- 1 to iterations) {
        val contrib = ranks.join(deg, "v")
          .select(col("v").as("u"), expr("rank_units div deg").as("c"))
        val incoming = sym.join(contrib, sym("src") === col("u"))
          .groupBy(col("dst").as("v"))
          .agg(sum("c").as("in_units"))
        ranks = deg.select(col("v"))
          .join(incoming, Seq("v"), "left")
          .select(col("v"),
            (lit(base) +
              expr(s"($dampingPct * coalesce(in_units, 0L)) div 100"))
              .as("rank_units"))
          .localCheckpoint() // eager: plans stay flat across iterations
      }
      ranks.withColumn("rank", col("rank_units").cast("double") / Unit)
    } finally { sym.unpersist(); deg.unpersist() }
  }
}
