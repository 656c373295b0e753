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
    // both directions emitted in ONE pass over the input (a union of two
    // projections would evaluate the upstream edge plan twice)
    val sym = edges.select(explode(array(
        struct(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")),
        struct(col(dstCol).cast("long").as("src"),
          col(srcCol).cast("long").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
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
      // the rank/degree frames are O(V); when V is broadcastable each
      // round becomes ONE map-side join over the O(E) edge list + ONE
      // partial-agg shuffle of per-vertex contributions — the edge list
      // itself is never shuffled. Past the vertex cap (billions of
      // vertices at 100 TB) the hint drops out and Spark shuffle-joins
      // on the edge partitioning instead — the textbook fallback.
      val hint: DataFrame => DataFrame =
        if (n <= 10000000L) broadcast(_) else identity
      for (i <- 1 to iterations) {
        val contrib = ranks.join(hint(deg), "v")
          .select(col("v").as("u"), expr("rank_units div deg").as("c"))
        val incoming = sym.join(hint(contrib), sym("src") === col("u"))
          .groupBy(col("dst").as("v"))
          .agg(sum("c").as("in_units"))
        val next = deg.select(col("v"))
          .join(hint(incoming), Seq("v"), "left")
          .select(col("v"),
            (lit(base) +
              expr(s"($dampingPct * coalesce(in_units, 0L)) div 100"))
              .as("rank_units"))
        // flat-lineage trick only when the chain could actually grow deep:
        // every eager checkpoint is a full job, and for a handful of
        // rounds one pipelined plan (persisted edges + reused broadcast
        // exchanges) beats 3-4 materialization barriers
        ranks = if (iterations > 4 && i < iterations) next.localCheckpoint()
          else next
      }
      ranks.withColumn("rank", col("rank_units").cast("double") / Unit)
    } finally { sym.unpersist(); deg.unpersist() }
  }
}
