package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Fixed-point k-means: hand-computed trajectory, partitioning
  * invariance, blob separation, empty-cluster keep-previous. Cross-engine
  * equality is the q197 oracle's job. */
class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  test("hand-computed 1-D trajectory (k=2, 2 rounds)") {
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(0.1f)),
      (3L, Array(10.0f)), (4L, Array(10.1f))).toDF("id", "v")
    val out = Clustering.kmeansFixedPoint(df, "id", "v",
      k = 2, iterations = 2, scale = 10L, offset = 100L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // quantized: 100, 101, 200, 201; init c=[100],[101];
    // round 1 -> c=[100],[167]; round 2 -> c=[100],[200]
    assert(out == Set((1L, 0, 0L), (2L, 0, 1L), (3L, 1, 0L), (4L, 1, 1L)),
      s"got $out")
  }

  test("bit-identical across partitionings") {
    val base = (0L until 500L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 13 + d * 7) % 101).toFloat / 10f))
    }
    val a = Clustering.kmeansFixedPoint(
      base.toDF("id", "v").repartition(1), "id", "v", k = 5, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val b = Clustering.kmeansFixedPoint(
      base.toDF("id", "v").repartition(13), "id", "v", k = 5, iterations = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(a == b, "partitioning changed the result")
  }

  test("separable blobs separate") {
    // two tight blobs at 0 and 50; init picks ids 0 and 1 (one per blob)
    val df = (0L until 200L).map { i =>
      val center = if (i % 2 == 0) 0f else 50f
      (i, Array(center + (i % 7).toFloat * 0.01f,
        center - (i % 5).toFloat * 0.01f))
    }.toDF("id", "v")
    val out = Clustering.kmeansFixedPoint(df, "id", "v",
      k = 2, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val even = (0L until 200L by 2).map(out).toSet
    val odd = (1L until 200L by 2).map(out).toSet
    assert(even.size == 1 && odd.size == 1 && even != odd,
      s"blobs not separated: even=$even odd=$odd")
  }

  test("a cluster that loses every member keeps its previous centroid") {
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(0.0f)), (3L, Array(100.0f)))
      .toDF("id", "v")
    val out = Clustering.kmeansFixedPoint(df, "id", "v",
      k = 3, iterations = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // ids 1,2 tie to the smaller index 0; cluster 1 (init = id 2's
    // identical vector) goes empty and must survive the rounds
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 2), s"got $out")
  }

  test("ragged vector dimensions fail loudly up front, not deep in a task") {
    val df = Seq(
      (1L, Array(0.0f, 1.0f)), (2L, Array(3.0f))).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      Clustering.kmeansFixedPoint(df, "id", "v", k = 2, iterations = 1)
    }
    assert(e.getMessage.contains("uniform vector dimension"), e.getMessage)
  }

  test("simplifiedSilhouette: hand-computed centroid-form scores on 1-D points") {
    // centroids = first 2 vectors by id: q(0.0)=1048576, q(1.0)=1049600.
    // id3 (0.4 -> 1048985): a=409 (c0), b=615 -> s=206/615.
    // id4 (0.9 -> 1049497): a=103 (c1), b=921 -> s=818/921.
    // seeds score s=1 in their own cluster (a=0).
    val df = Seq(
      (1L, Array(0.0f)), (2L, Array(1.0f)),
      (3L, Array(0.4f)), (4L, Array(0.9f)))
      .toDF("vec_id", "v")
    val got = Clustering.simplifiedSilhouette(df, "vec_id", "v",
        nClusters = 2)
      .orderBy("cluster").collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n"),
        r.getAs[Double]("mean_sil")))
    assert(got.map(x => (x._1, x._2)).toSeq == Seq((0, 2L), (1, 2L)),
      got.mkString(","))
    assert(math.abs(got(0)._3 - (1.0 + 206.0 / 615.0) / 2.0) < 1e-12)
    assert(math.abs(got(1)._3 - (1.0 + 818.0 / 921.0) / 2.0) < 1e-12)
    intercept[IllegalArgumentException] {
      Clustering.simplifiedSilhouette(df, "vec_id", "v", nClusters = 9)
        .collect()
    }
  }

  test("semDeDup: near-parallel vectors collapse to the smallest id; " +
    "orthogonal and cross-cluster pairs survive") {
    // two well-separated blobs (k=2 lands one cluster each); inside
    // blob A, ids 1/2/3 are near-parallel (cos ~ 1) and 4 is orthogonal
    val df = Seq(
      (1L, Array(10.0f, 0.1f)), (2L, Array(20.0f, 0.2f)),
      (3L, Array(30.0f, 0.3f)), (4L, Array(0.1f, 10.0f)),
      (5L, Array(-10.0f, -0.1f)), (6L, Array(-20.0f, -0.2f)))
      .toDF("id", "v")
    val out = Clustering.semDeDup(df, "id", "v", k = 2, iterations = 2,
      tauNum = 99, tauDen = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size == 6)
    // 1 keeps (smallest of its dup group), 2 and 3 drop against it
    assert(out(1L) && !out(2L) && !out(3L), out.toString)
    // orthogonal to the near-dup group — and anti-parallel (dot < 0)
    // to its own cluster's members: kept
    assert(out(4L), out.toString)
    // the negative blob: 5 keeps, 6 drops (parallel to 5, dot > 0)
    assert(out(5L) && !out(6L), out.toString)
  }

  test("semDeDup: threshold boundary is exact integer, anti-parallel " +
    "pairs (dot < 0) never drop, guards refuse bad tau") {
    // cos(u, v) with u=(1,0), v=(1,1) is 1/sqrt(2) ~ 0.7071:
    // tau = 70/100 drops v; tau = 71/100 keeps it — the verdict flips
    // on exact cross-multiplied integers, no float epsilon
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 1.0f)))
      .toDF("id", "v")
    val lo = Clustering.semDeDup(df, "id", "v", k = 1, iterations = 1,
      tauNum = 70, tauDen = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val hi = Clustering.semDeDup(df, "id", "v", k = 1, iterations = 1,
      tauNum = 71, tauDen = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(lo(1L) && !lo(2L), lo.toString)
    assert(hi(1L) && hi(2L), hi.toString)
    // anti-parallel: cos = -1, dot < 0 -> both kept at any tau
    val anti = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(-1.0f, 0.0f)))
      .toDF("id", "v")
    val ka = Clustering.semDeDup(anti, "id", "v", k = 1, iterations = 1,
      tauNum = 0, tauDen = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(ka(1L) && ka(2L), ka.toString)
    intercept[IllegalArgumentException] {
      Clustering.semDeDup(df, "id", "v", tauNum = 1001, tauDen = 1000)
    }
  }
}
