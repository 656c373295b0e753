package graft.lakehouse.ext

import graft.lakehouse.SparkSuite
import org.apache.spark.sql.functions._

/** Product-quantization ANN: recall against exact search, rerank
  * improvement, and the exact-degenerate verification mode. */
class PqSpec extends SparkSuite {
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") < 8)

  private def topIds(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }

  private def recall(approx: Map[Long, Set[Long]],
      exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    per.sum / per.size
  }

  private lazy val exactTop =
    topIds(Similarity.cosineTopK(emb, queries, "vec_id", "embedding", k = 10))

  test("pure-ADC recall@10 is substantial (codes are 32x smaller than vectors)") {
    val pq = topIds(Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 10, m = 8))
    val r = recall(pq, exactTop)
    assert(r >= 0.5, s"ADC recall@10 $r — codebooks degenerate?")
  }

  test("exact rescoring of a wide candidate set beats pure ADC") {
    val pure = recall(topIds(Similarity.pqTopK(emb, queries, "vec_id",
      "embedding", k = 10, m = 8)), exactTop)
    val rr = recall(topIds(Similarity.pqTopK(emb, queries, "vec_id",
      "embedding", k = 10, m = 8, reRank = 100)), exactTop)
    assert(rr >= pure, s"rerank recall $rr < pure-ADC recall $pure")
    assert(rr >= 0.9, s"top-100-of-500 rerank recall only $rr")
  }

  test("rerank bound >= corpus degenerates to exact search, bit-for-bit") {
    val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
        k = 10).orderBy("query_id", "rank").collect().toSeq
    val pq = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 10, m = 8, reRank = 1000000)
      .orderBy("query_id", "rank").collect().toSeq
    assert(pq == exact)
  }

  test("encoding is deterministic: two runs rank identically") {
    def run() = Similarity.pqTopK(emb, queries, "vec_id", "embedding",
      k = 5, m = 8).orderBy("query_id", "rank").collect().toSeq
    assert(run() == run())
  }

  test("an over-limit query frame is rejected loudly (the broadcast " +
      "contract), never collected into the driver") {
    val e = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, queries, "vec_id", "embedding",
        k = 5, m = 8, maxQueries = 2L)
    }
    assert(e.getMessage.contains("maxQueries"), e.getMessage)
  }
}
