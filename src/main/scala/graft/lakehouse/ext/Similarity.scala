package graft.lakehouse.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[cosineTopK]]: exact brute force. The query side is broadcast (it is
  *    small by construction), the corpus is scanned once, and top-k is
  *    taken in two phases — partition-local pre-top-k, then a final merge —
  *    so no single reducer ever sees the whole corpus: the shuffle input is
  *    (#partitions × k × #queries) rows, not (corpus × #queries).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing; only corpus vectors in
  *    the query's bucket (multi-probe: hamming-1 neighborhood) get an exact
  *    cosine — the 100 TB path where even one full scan per query batch is
  *    too much.
  */
object Similarity {

  /** Exact cosine top-k for each query vector.
    * corpus: (idCol, vecCol array<float|double>), queries likewise.
    * Output: (query_id, vec_id, cosine), k rows per query, ties broken by
    * ascending corpus id (deterministic). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", Dedup.cosine(col("cv"), col("qv")))
      .select("query_id", "vec_id", "cosine")

    // phase 1: top-k within each scan partition, genuinely map-side — a
    // bounded heap per (query, partition) inside mapPartitions, so the only
    // Exchange in the plan is the phase-2 merge over (#partitions × k ×
    // #queries) survivor rows. (A window over spark_partition_id() would
    // shuffle every scored row first.) Ordering matches the final ranking
    // (cosine desc, vec_id asc) so boundary ties resolve identically in
    // both phases.
    val rowOrd: Ordering[Row] = new Ordering[Row] {
      private def cmpId(x: Any, y: Any): Int =
        x.asInstanceOf[Comparable[Any]].compareTo(y)
      override def compare(a: Row, b: Row): Int = {
        val c = java.lang.Double.compare(b.getDouble(2), a.getDouble(2))
        if (c != 0) c else cmpId(a.get(1), b.get(1))
      }
    }
    val local = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.Map
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      it.foreach { r =>
        // max-heap on the *reversed* order keeps the worst survivor on top
        val h = heaps.getOrElseUpdate(r.get(0),
          scala.collection.mutable.PriorityQueue.empty[Row](rowOrd))
        if (h.size < k) h.enqueue(r)
        else if (rowOrd.compare(r, h.head) < 0) { h.dequeue(); h.enqueue(r) }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(scored.schema))
    // phase 2: merge the (numPartitions * k) survivors per query
    val wGlobal = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    local.withColumn("rank", row_number().over(wGlobal))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  /** IVF (inverted-file) ANN top-k: k-means partitions the corpus into
    * nLists cells (seeded — deterministic); each query probes its nProbe
    * nearest centroids and exact-scores only those cells. The classic
    * recall/cost dial: nProbe = nLists degenerates to exact search.
    * Centroids are tiny and ride to the executors inside a broadcast UDF;
    * the cell join is a broadcast of (query x probe) rows against the
    * cell-partitioned corpus — corpus shuffles once, on cell id.
    *
    * The k-means fit reads at most `maxFitRows` corpus vectors: centroid
    * quality converges with a bounded sample, so the iterative fit must not
    * rescan a 100 TB corpus per iteration. Corpora at or under the cap fit
    * on every row (sampling changes nothing at test scale); larger corpora
    * fit on a seeded uniform sample and only the single assignment pass
    * touches every row. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nLists: Int = 16, nProbe: Int = 2,
      maxFitRows: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val c = corpus.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
      .withColumn("features", toVec(col("cv")))
    val corpusRows = c.count()
    val fitInput =
      if (corpusRows <= maxFitRows) c
      else c.sample(withReplacement = false,
        maxFitRows.toDouble / corpusRows, seed = 42L)
    // seeded random init: kmeans|| spends ~5 extra distributed rounds
    // picking starting points; with 10 refinement iterations over a bounded
    // sample, random init converges to comparable cells at a fraction of
    // the job count
    val model = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10)
      .setInitMode("random")
      .setFeaturesCol("features").fit(fitInput)
    val cells = model.transform(c)
      .select(col("vec_id"), col("cv"), col("prediction").as("cell"))
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    val probeUdf = udf((q: Seq[Double]) => {
      centroids.zipWithIndex.map { case (ctr, i) =>
        var d = 0.0
        var j = 0
        while (j < math.min(ctr.length, q.length)) {
          val diff = ctr(j) - q(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    })
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
      .withColumn("cell", explode(probeUdf(col("qv"))))
    val scored = cells.join(broadcast(q), "cell")
      .withColumn("cosine", Dedup.cosine(col("cv"), col("qv")))
      .select("query_id", "vec_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }

  /** LSH-bucketed ANN top-k: exact cosine only against corpus vectors whose
    * random-hyperplane signature is within hamming distance 1 of the
    * query's (the query explodes into its probe buckets — numPlanes+1 rows
    * per query — and joins the bucketed corpus on the bucket key). May
    * return fewer than k when a bucket neighborhood is sparse (ANN recall
    * trade-off). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 12, dim: Int = 64): DataFrame = {
    val planes = Dedup.hyperplanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("cv"))
      .withColumn("bucket", Dedup.rhpBucket(col("cv"), planes))
    val probes = (0 until numPlanes).map(i => lit(1 << i)) :+ lit(0)
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
      .withColumn("qbucket", Dedup.rhpBucket(col("qv"), planes))
      .withColumn("flip", explode(array(probes: _*)))
      .withColumn("bucket", expr("int(qbucket) ^ int(flip)"))
      .select("query_id", "qv", "bucket")
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("cosine", Dedup.cosine(col("cv"), col("qv")))
      .select("query_id", "vec_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "vec_id", "rank", "cosine")
  }
}
