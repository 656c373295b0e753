package graft.lakehouse.ext

import java.nio.file.Files

import graft.lakehouse.{Catalog, LakehouseProps, SparkSuite, TableIO,
  Versioned}
import org.apache.spark.sql.functions._

/** Persisted PQ index: incremental append equals a one-shot rebuild,
  * codebooks freeze, the second batch encodes only itself, and the
  * exact-mode query over the persisted index reproduces brute force. */
class AnnIndexSpec extends SparkSuite {

  lazy val lh: LakehouseProps = {
    val dir = Files.createTempDirectory("annindex_test").toString
    Catalog.registerLocalWorkspace(dir, "ws_ann", "lh_ann").lakehouses.head
  }

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val batch1 = emb.filter(col("vec_id") % 2 === 0)
  private lazy val batch2 = emb.filter(col("vec_id") % 2 =!= 0)

  test("incremental append == one-shot rebuild; codebooks freeze; " +
      "the second batch encodes only itself") {
    val n1 = AnnIndex.buildPqIndex(spark, lh, "ann_t", batch1,
      "vec_id", "embedding")
    assert(n1 == batch1.count())
    val cbDir = Catalog.tablePath(lh, "ann_t_codebooks")
    val idxDir = Catalog.tablePath(lh, "ann_t")
    val cbV = Versioned.latestVersion(cbDir).get
    val idxV0 = Versioned.latestVersion(idxDir).get
    val n2 = AnnIndex.appendPqIndex(spark, lh, "ann_t", batch2,
      "vec_id", "embedding")
    assert(n2 == batch2.count(), "append must report the batch size")
    // the codebooks are FROZEN: the append versions the index table
    // forward exactly once and never touches the codebooks table
    assert(Versioned.latestVersion(cbDir).get == cbV,
      "appendPqIndex must not version the codebooks forward")
    assert(Versioned.latestVersion(idxDir).get == idxV0 + 1)
    // update == rebuild (the q233 shape): encoding everything at once
    // against the same batch-1-trained codebooks yields the identical
    // index — so incremental batches lose nothing vs a full rebuild
    AnnIndex.buildPqIndex(spark, lh, "ann_r", emb, "vec_id", "embedding",
      fit = Some(batch1))
    def contents(name: String) =
      TableIO.selectTable(spark, lh, name).select("vec_id", "code")
        .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toSet
    assert(contents("ann_t") == contents("ann_r"),
      "incrementally-built index differs from the one-shot rebuild")
    // codes are comparable ACROSS batches: batch-2 rows carry codes from
    // the frozen batch-1 codebooks, bit-identical to the rebuild's
    TableIO.dropTable(spark, lh, "ann_r")
  }

  test("exact-mode query over the persisted index == brute force; " +
      "pure-ADC mode ranks by integer distance with a leading self-hit") {
    val queries = emb.filter(col("vec_id") < 3)
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
        k = 5).orderBy("query_id", "rank").collect().toSeq
    val viaIndex = AnnIndex.queryPqIndex(spark, lh, "ann_t", queries,
        "vec_id", "embedding", k = 5, reRank = 1000000)
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaIndex == exact,
      "persisted-index exact mode diverged from brute force")
    val adc = AnnIndex.queryPqIndex(spark, lh, "ann_t", queries,
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    adc.groupBy(_._1).foreach { case (q, rows) =>
      val self = rows.find(_._2 == q)
      assert(self.nonEmpty && self.get._3 == rows.map(_._3).min,
        s"query $q: self-hit not in the leading ADC tie-group")
    }
  }

  test("IVF index: centroids freeze, O(batch) append, incremental == " +
      "rebuild, persisted query == from-scratch portable IVF") {
    val n1 = AnnIndex.buildIvfIndex(spark, lh, "ivf_t", batch1,
      "vec_id", "embedding", nLists = 8)
    assert(n1 == batch1.count())
    val cDir = Catalog.tablePath(lh, "ivf_t_centroids")
    val cV = Versioned.latestVersion(cDir).get
    val n2 = AnnIndex.appendIvfIndex(spark, lh, "ivf_t", batch2,
      "vec_id", "embedding")
    assert(n2 == batch2.count())
    assert(Versioned.latestVersion(cDir).get == cV,
      "appendIvfIndex must not version the centroids forward")
    // incremental == rebuild with the same batch-1-trained centroids
    AnnIndex.buildIvfIndex(spark, lh, "ivf_r", emb, "vec_id", "embedding",
      nLists = 8, fit = Some(batch1))
    def contents(name: String) =
      TableIO.selectTable(spark, lh, name).select("vec_id", "cell")
        .collect().map(r => (r.getLong(0), r.getInt(2 - 1))).toSet
    assert(contents("ivf_t") == contents("ivf_r"),
      "incrementally-built IVF index differs from the one-shot rebuild")
    TableIO.dropTable(spark, lh, "ivf_r")
    // the persisted-index query equals the from-scratch portable IVF
    // trained on the same fit frame
    val queries = emb.filter(col("vec_id") < 3)
    val direct = Similarity.ivfTopKPortable(emb, queries, "vec_id",
        "embedding", k = 5, nLists = 8, nProbe = 3, fit = Some(batch1))
      .orderBy("query_id", "rank").collect().toSeq
    val viaIndex = AnnIndex.queryIvfIndex(spark, lh, "ivf_t", queries,
        "vec_id", "embedding", k = 5, nProbe = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaIndex == direct,
      "persisted IVF query diverged from the from-scratch portable IVF")
  }

  test("querying a never-built index refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      AnnIndex.queryPqIndex(spark, lh, "ann_nope",
        emb.filter(col("vec_id") < 1), "vec_id", "embedding", k = 5)
    }
    assert(e.getMessage.contains("buildPqIndex"), e.getMessage)
  }

  test("deletePqIndex: DV-mode erasure equals a rebuild without the ids, " +
      "codebooks stay frozen") {
    AnnIndex.buildPqIndex(spark, lh, "ann_d", batch1, "vec_id", "embedding")
    AnnIndex.appendPqIndex(spark, lh, "ann_d", batch2, "vec_id", "embedding")
    val cbDir = Catalog.tablePath(lh, "ann_d_codebooks")
    val cbV = Versioned.latestVersion(cbDir).get
    val total = emb.count()
    val erased = emb.filter(col("vec_id") % 3 === 0).count()
    val remaining = AnnIndex.deletePqIndex(spark, lh, "ann_d",
      "vec_id % 3 = 0", deletionVectors = true)
    assert(remaining == total - erased,
      s"expected ${total - erased} survivors, got $remaining")
    assert(Versioned.latestVersion(cbDir).get == cbV,
      "deletePqIndex must not version the codebooks forward")
    // no deleted id is reachable by any query, and exact-mode results
    // equal brute force over the survivors
    val queries = emb.filter(col("vec_id") < 3)
    val got = AnnIndex.queryPqIndex(spark, lh, "ann_d", queries,
        "vec_id", "embedding", k = 8, reRank = 1000000)
      .collect()
    assert(got.forall(_.getAs[Long]("vec_id") % 3 != 0),
      "a deleted vector surfaced in query results")
    AnnIndex.buildPqIndex(spark, lh, "ann_d_ref",
      emb.filter(col("vec_id") % 3 =!= 0), "vec_id", "embedding",
      fit = Some(batch1.filter(col("vec_id") % 3 =!= 0)))
    val ref = AnnIndex.queryPqIndex(spark, lh, "ann_d_ref", queries,
        "vec_id", "embedding", k = 8, reRank = 1000000)
      .collect()
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("rank"))).toSet
    assert(key(got) == key(ref),
      "post-delete exact-mode results differ from the rebuilt index")
  }
}
