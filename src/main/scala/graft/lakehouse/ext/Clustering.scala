package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distributed clustering with ENGINE-PORTABLE arithmetic. Float Lloyd
  * k-means is partition-order-dependent twice over (the centroid mean is
  * an unordered IEEE sum; distance ties flip on rounding), so two runs of
  * the same algorithm can legitimately disagree — fine for ANN routing
  * (IVF trains that way, `Similarity.ivfTopK`), fatal for anything that
  * must be reproduced: lineage-audited training-data curation, cross-
  * engine verification, incremental re-clustering diffs. The fixed-point
  * variant here quantizes vectors to integers once and keeps EVERY
  * quantity integral — distances are exact integer sums of squares,
  * centroid updates are floor divisions of integer sums — so any engine
  * (or any partitioning of the same engine) lands on bit-identical
  * centroids and assignments, the same trick as
  * [[Graph.pageRankFixedPoint]]'s 1e-12 rank units.
  */
object Clustering {

  /** Lloyd k-means over an `Array[Float]`/`Array[Double]` column with
    * fully integral state. Vectors quantize to
    * `floor(x · scale) + offset` per dimension (`offset` keeps every
    * value — and thus every centroid sum — nonnegative, so the floor
    * divisions below agree across engines' integer-division
    * conventions; it cancels in distances). Initial centroids are the
    * vectors of the `k` smallest ids — deterministic by construction,
    * the caller pre-shuffles ([[Packing.deterministicShuffle]]) when it
    * wants seeded-random init. Each round: assign every vector to the
    * centroid minimizing the exact integer squared distance (ties to
    * the smallest centroid index), then recompute each centroid
    * dimension as `sum div count`; a cluster that loses every member
    * keeps its previous centroid.
    *
    * 100 TB shape — the MLlib plan with portable arithmetic: centroids
    * are k·dim integers held on the driver between rounds (bounded by
    * construction, the same capped-driver-state pattern as the BPE merge
    * dict) and shipped to executors inside the assign kernel's closure,
    * so assignment is a zero-shuffle map — no join, window, or
    * aggregation. The update step explodes (cluster, dim, value) triples
    * IN-PARTITION and partial-aggregates, so only k·dim cells per
    * partition cross the exchange — the vectors themselves never
    * shuffle, in any round. The quantized corpus is persisted once.
    * Returns (id, cluster, dist) from the FINAL assignment; `dist` is
    * the exact integer squared distance, so the whole trajectory is
    * verifiable from the output. */
  /** Quantize + argmin as COMPILED kernels: Spark's higher-order
    * functions (transform/zip_with/aggregate) interpret their lambda per
    * element, which over vectors × centroids × dims × rounds is the
    * dominant cost; a JVM while-loop does the identical IEEE/integer
    * arithmetic at memory speed (the [[Dedup.portableSimHashKernel]]
    * pattern). Ties go to the first (smallest-index) centroid. */
  private[ext] def quantizeKernel(v: Seq[Double], scale: Long,
      offset: Long): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) {
      out(i) = math.floor(v(i) * scale).toLong + offset
      i += 1
    }
    out
  }

  /** `iterations` fused Lloyd rounds over a (gid, qv) frame — `gid`
    * indexes an independent clustering problem sharing one pass (PQ
    * trains one codebook per subspace; IVF and [[kmeansFixedPoint]] use
    * a single gid 0). Each round is ONE zero-shuffle job: the kernel
    * fuses assignment and the centroid-sum update per partition (argmin
    * against this gid's centroids, then accumulate into running sums),
    * so only |gids|·k rows of (gid, cluster, sums, n) leave each
    * partition — straight to the driver, where the merge is a bounded
    * integer fold. Centroid state between rounds is |gids|·k·dim longs
    * on the driver (the capped-driver-state pattern) riding to
    * executors in the kernel closure. Empty clusters keep their
    * previous centroid; centroid means are truncating integer division
    * (sums nonnegative under the offset contract, so this equals SQL
    * `div`). A vector whose length differs from its gid's centroid
    * dimension surfaces as a driver-side IllegalArgumentException via a
    * sentinel partial — no separate validation job. */
  private[ext] def lloydRoundsGrouped(frame: DataFrame,
      init: Map[Int, IndexedSeq[Seq[Long]]], iterations: Int,
      context: String): Map[Int, IndexedSeq[Seq[Long]]] = {
    require(init.nonEmpty && init.keys.forall(_ >= 0),
      s"$context: init centroids must be keyed by nonnegative gid")
    var cents = init
    val nGids = init.keys.max + 1
    val kMax = init.values.map(_.size).max
    for (_ <- 1 to iterations) {
      val centsLocal: Array[Array[Array[Long]]] =
        Array.tabulate(nGids)(g =>
          cents.get(g).fold(Array.empty[Array[Long]])(_.map(_.toArray).toArray))
      val partials = frame.select(col("gid").cast("int"), col("qv"))
        .mapPartitions { it =>
          val sums = new Array[Array[Long]](nGids * kMax)
          val counts = new Array[Long](nGids * kMax)
          var badGid = -1
          var badLen = -1
          it.foreach { r =>
            val g = r.getInt(0)
            val qv = r.getSeq[Long](1)
            val cs = if (g >= 0 && g < nGids) centsLocal(g)
              else Array.empty[Array[Long]]
            if (cs.isEmpty || qv.length != cs(0).length) {
              badGid = g; badLen = qv.length
            } else {
              var best = Long.MaxValue; var bi = -1; var c = 0
              while (c < cs.length) {
                val cv = cs(c)
                var d = 0L; var i = 0
                while (i < cv.length) {
                  val x = qv(i) - cv(i); d += x * x; i += 1
                }
                if (d < best) { best = d; bi = c }
                c += 1
              }
              val slot = g * kMax + bi
              counts(slot) += 1
              if (sums(slot) == null) sums(slot) = new Array[Long](qv.length)
              val s = sums(slot); var j = 0
              while (j < s.length) { s(j) += qv(j); j += 1 }
            }
          }
          val good = (0 until nGids * kMax).iterator
            .filter(counts(_) > 0)
            .map(slot => (slot / kMax, slot % kMax, sums(slot), counts(slot)))
          if (badLen >= 0)
            good ++ Iterator((badGid, -1, Array(badLen.toLong), 1L))
          else good
        }(Encoders.product[(Int, Int, Array[Long], Long)])
        .collect()
      partials.find(_._2 == -1).foreach { case (g, _, bad, _) =>
        throw new IllegalArgumentException(
          s"$context needs a uniform vector dimension; found length " +
            s"${bad(0)} against centroid dimension " +
            s"${cents.get(g).flatMap(_.headOption).fold(-1)(_.length)}")
      }
      cents = cents.map { case (g, gc) =>
        val dimLen = gc.headOption.fold(0)(_.length)
        val sumAcc = Array.fill(gc.size)(new Array[Long](dimLen))
        val cntAcc = new Array[Long](gc.size)
        partials.foreach { case (pg, c, s, n) =>
          if (pg == g) {
            cntAcc(c) += n
            var j = 0
            while (j < s.length) { sumAcc(c)(j) += s(j); j += 1 }
          }
        }
        g -> gc.indices.map { i =>
          if (cntAcc(i) > 0) sumAcc(i).toSeq.map(_ / cntAcc(i)) else gc(i)
        }
      }
    }
    cents
  }

  private[ext] def argminKernel(qv: Seq[Long],
      cents: Array[Array[Long]]): (Long, Int) = {
    var best = Long.MaxValue
    var bi = -1
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var d = 0L
      var i = 0
      while (i < cv.length) {
        val x = qv(i) - cv(i)
        d += x * x
        i += 1
      }
      if (d < best) { best = d; bi = c }
      c += 1
    }
    (best, bi)
  }

  def kmeansFixedPoint(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iterations: Int = 2, scale: Long = 1024L,
      offset: Long = 1L << 20): DataFrame = {
    require(k >= 1 && iterations >= 1 && scale >= 1 && offset >= 0)
    val quantUdf = udf((v: Seq[Double]) => quantizeKernel(v, scale, offset))
    val q = df.filter(col(vecCol).isNotNull)
      .select(col(idCol),
        quantUdf(col(vecCol).cast("array<double>")).as("qv"))
      .persist()
    try {
      // init: the k smallest ids' vectors — one bounded driver collect
      // (this TakeOrdered also materializes the persist)
      var cents: Seq[Seq[Long]] = q.orderBy(col(idCol)).limit(k)
        .collect().map(_.getSeq[Long](1).toSeq).toSeq
      // raggedness among the init vectors is visible right here — the
      // per-round kernel below catches the rest of the corpus
      if (cents.exists(_.length != cents.head.length))
        throw new IllegalArgumentException(
          s"kmeansFixedPoint needs a uniform vector dimension; found " +
            s"lengths ${cents.map(_.length).min}..${cents.map(_.length).max}" +
            s" in '$vecCol'")

      def assigned(): DataFrame = {
        val centsLocal: Array[Array[Long]] = cents.map(_.toArray).toArray
        val assignUdf = udf((qv: Seq[Long]) => argminKernel(qv, centsLocal))
        q.withColumn("m", assignUdf(col("qv")))
          .select(col(idCol), col("m._2").as("cluster"),
            col("m._1").as("dist"), col("qv"))
      }

      // the rounds run in the fused grouped trainer (ONE zero-shuffle
      // job each; the previous shape posexploded rows·dim cells into a
      // groupBy per round and was the #1 bench line)
      if (cents.nonEmpty)
        cents = lloydRoundsGrouped(
          q.select(lit(0).as("gid"), col("qv")),
          Map(0 -> cents.toIndexedSeq), iterations,
          s"kmeansFixedPoint('$vecCol')")(0)
      assigned().select(col(idCol), col("cluster"), col("dist"))
        .localCheckpoint()
    } finally { q.unpersist(false) }
  }

  /** Greedy k-center coreset (Gonzalez 1985 farthest-point traversal):
    * seed with the smallest id, then k−1 times pick the point FARTHEST
    * from the selected set — the diversity-maximizing data-selection
    * rule (2-approximation of the optimal k-center cover), the
    * subset-picking complement of [[kmeansFixedPoint]]. Fully
    * engine-portable: quantized integer vectors, squared euclidean
    * distances as exact integers (|a|² + |b|² − 2a·b), argmax ties to
    * the smaller id.
    *
    * Scale shape: one pass per round — the running min-distance column
    * updates with a single `least(...)` against the newest center
    * (broadcast as literals), and the argmax is a TakeOrdered(1), never
    * a sort; k driver-held centers, O(k·dim) driver state (the BPE-dict
    * contract). Output: (round, vec_id, dist2) — dist2 is the point's
    * distance to the set selected BEFORE it (0 for the seed). */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int, scale: Long = 1024L): DataFrame = {
    require(k >= 1 && k <= 64 && scale >= 1,
      "kCenterCoreset needs 1 <= k <= 64")
    val spark = df.sparkSession
    val qUdf = udf((v: Seq[Double]) =>
      if (v == null) null
      else {
        val o = new Array[Long](v.length)
        var i = 0
        while (i < v.length) { o(i) = math.floor(v(i) * scale).toLong; i += 1 }
        o
      })
    val base = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("vec_id"),
        qUdf(transform(col(vecCol), x => x.cast("double"))).as("qv"))
      .withColumn("nn", expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))
      .persist()
    try {
      def dist2To(centerNorm: Long) =
        expr(s"nn + ${centerNorm}L - 2 * aggregate(" +
          "zip_with(qv, __c, (a, b) -> a * b), 0L, (acc, x) -> acc + x)")
      val seedRow = base.orderBy("vec_id").limit(1)
        .select("vec_id", "qv", "nn").head()
      var selected = List((1, seedRow.getLong(0), 0L))
      var center = seedRow.getAs[Seq[Long]]("qv").toArray
      var centerNorm = seedRow.getLong(2)
      var cur = base
      for (round <- 2 to k) {
        cur = cur
          .withColumn("__c", array(center.map(lit(_)): _*))
          .withColumn("__d", dist2To(centerNorm))
          .withColumn("mind",
            if (round == 2) col("__d") else least(col("mind"), col("__d")))
          .drop("__c", "__d")
        val next = cur
          .filter(!col("vec_id").isInCollection(selected.map(_._2)))
          .orderBy(col("mind").desc, col("vec_id").asc)
          .limit(1)
          .select("vec_id", "qv", "nn", "mind").head()
        selected = (round, next.getLong(0), next.getAs[Long]("mind")) :: selected
        center = next.getAs[Seq[Long]]("qv").toArray
        centerNorm = next.getLong(2)
      }
      import spark.implicits._
      selected.reverse.toDF("round", "vec_id", "dist2")
    } finally { base.unpersist(false) }
  }

  /** Simplified silhouette (the centroid form — Hruschka et al. 2004)
    * of a seeded-centroid assignment: per point, a = distance to its
    * nearest centroid, b = distance to the second-nearest, and
    * s = (b − a)/max(a, b); reported as the per-cluster mean — the
    * cluster-quality score under SemDeDup/IVF partitioning decisions,
    * at O(n·k) instead of the true silhouette's O(n²). Centroids are
    * the first `nClusters` corpus vectors by id (the ivf seeding
    * convention) — deterministic, no Lloyd rounds, so any engine
    * replays the exact geometry. Squared distances are exact integers
    * over the fixed-point quantization; the two sqrts are
    * correctly-rounded IEEE; each point's s is one pinned chain folded
    * as exact DECIMAL(38,18), and the mean is one final double
    * division.
    *
    * 100 TB shape: centroids are k·dim longs in the kernel closure; the
    * assignment+silhouette is ONE compiled zero-shuffle pass; the only
    * shuffle carries k partial (cluster, sum, count) cells. */
  def simplifiedSilhouette(df: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 8, scale: Long = 1024L,
      offset: Long = 1L << 20): DataFrame = {
    require(nClusters >= 2, "simplifiedSilhouette needs nClusters >= 2")
    val quantUdf = udf((v: Seq[Double]) => quantizeKernel(v, scale, offset))
    val q = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__id"),
        quantUdf(transform(col(vecCol), x => x.cast("double"))).as("qv"))
      .persist()
    try {
      val centsArr: Array[Array[Long]] = q.orderBy("__id").limit(nClusters)
        .select("qv").collect().map(_.getSeq[Long](0).toArray)
      require(centsArr.length == nClusters,
        s"simplifiedSilhouette: corpus has fewer than $nClusters vectors")
      require(centsArr.forall(_.length == centsArr.head.length),
        "simplifiedSilhouette needs a uniform vector dimension")
      val top2Udf = udf((qv: Seq[Long]) => {
        val v = qv.toArray
        var bestD = Long.MaxValue; var bestI = -1; var secD = Long.MaxValue
        var i = 0
        while (i < centsArr.length) {
          val cv = centsArr(i)
          require(cv.length == v.length,
            s"vector dimension ${v.length} != centroid ${cv.length}")
          var d = 0L; var j = 0
          while (j < cv.length) { val x = v(j) - cv(j); d += x * x; j += 1 }
          if (d < bestD) { secD = bestD; bestD = d; bestI = i }
          else if (d < secD) secD = d
          i += 1
        }
        (bestI, bestD, secD)
      })
      val a = sqrt(col("__t._2").cast("double"))
      val b = sqrt(col("__t._3").cast("double"))
      val sil = when(greatest(a, b) > 0.0, (b - a) / greatest(a, b))
        .otherwise(lit(0.0))
      q.withColumn("__t", top2Udf(col("qv")))
        .select(col("__t._1").as("cluster"),
          sil.cast("decimal(38,18)").as("__s"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum("__s").as("__sum"))
        .select(col("cluster"), col("n"),
          (col("__sum").cast("double") / col("n").cast("double"))
            .as("mean_sil"))
        // eager k-row materialization so the quantized corpus cache can
        // be released on exit (the kcenter pattern)
        .localCheckpoint()
    } finally q.unpersist(false)
  }

  /** SemDeDup (Abbas et al. '23, arXiv:2303.09540): semantic
    * deduplication — cluster the embedding space with
    * [[kmeansFixedPoint]], then compare pairs ONLY within a cluster
    * and drop every vector that is near-cosine-identical
    * (cos ≥ tauNum/tauDen) to a kept lower-id vector. The clustering
    * is the whole scale story: pairwise work falls from O(N²) to
    * O(Σ c_i²) ≈ O(N²/k), and k is the operator's knob — at corpus
    * scale you raise k until clusters fit the pair budget. (The paper
    * keeps the member farthest from the centroid; this implementation
    * keeps the SMALLEST id of each near-duplicate group — a
    * deterministic, engine-replayable rule with the same dedup set
    * size.)
    *
    * Every comparison is EXACT integer arithmetic: vectors quantize to
    * floor(x·scale) longs (RAW, no offset — cosine is origin-
    * sensitive; the kmeans offset exists only to keep ITS squared
    * distances positive), and cos ≥ τ evaluates as
    * dot > 0 ∧ dot²·tauDen² ≥ tauNum²·‖u‖²·‖v‖² — cross-multiplied in
    * DECIMAL(38,0), no float, no sqrt — so DuckDB replays the full
    * trajectory (clusters AND verdicts) bit-identically.
    *
    * Plan shape: the kmeans assignment (zero-shuffle rounds), one join
    * to attach quantized vectors, ONE equi-join on the cluster key for
    * the pair stream (never a cartesian), a primitive-long dot kernel,
    * and an anti-join of ids against the dropped set. Output: one row
    * per input vector — `(id, cluster, kept)`. */
  def semDeDup(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4, iterations: Int = 2, tauNum: Long = 995,
      tauDen: Long = 1000, scale: Long = 1024L): DataFrame = {
    require(k >= 1 && tauDen >= 1 && tauNum >= 0 && tauNum <= tauDen &&
      scale >= 1, "semDeDup needs k >= 1 and 0 <= tauNum/tauDen <= 1")
    val assign = kmeansFixedPoint(df, idCol, vecCol, k, iterations,
      scale).select(col(idCol), col("cluster"))
    val rawQuant = udf((v: Seq[Double]) => {
      val out = new Array[Long](v.length)
      var i = 0
      while (i < v.length) { out(i) = math.floor(v(i) * scale).toLong; i += 1 }
      out
    })
    val normOf = udf((q: Array[Long]) => {
      var s = 0L; var i = 0
      while (i < q.length) { s += q(i) * q(i); i += 1 }
      s
    })
    val dotOf = udf((a: Array[Long], b: Array[Long]) => {
      require(a.length == b.length,
        s"semDeDup: ragged vector dimensions ${a.length} != ${b.length}")
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    })
    val withQ = assign.join(
      df.filter(col(vecCol).isNotNull)
        .select(col(idCol),
          rawQuant(col(vecCol).cast("array<double>")).as("cq"))
        .withColumn("nq", normOf(col("cq"))),
      Seq(idCol))
    val l = withQ.select(col("cluster"), col(idCol).as("u"),
      col("cq").as("qu"), col("nq").as("nu"))
    val r = withQ.select(col("cluster"), col(idCol).as("v"),
      col("cq").as("qv"), col("nq").as("nv"))
    val dot = dotOf(col("qu"), col("qv"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("u") < col("v"))
      .withColumn("dot", dot)
      .filter(col("dot") > 0L &&
        col("dot").cast("decimal(38,0)") * col("dot") *
          lit(tauDen * tauDen) >=
        col("nu").cast("decimal(38,0)") * col("nv") *
          lit(tauNum * tauNum))
      .select(col("v").as(idCol)).distinct()
    withQ.select(col(idCol), col("cluster"))
      .join(dropped.withColumn("__d", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(!col("__d"), lit(true)).as("kept"))
  }
}
